package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Clusters, Dedup}
import graft.model.Tables

class ClustersSpec extends GraftSpec {
  import spark.implicits._

  test("connected components: chain, triangle, and isolated pair") {
    // Components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val labels = Clusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("clusters adds per-cluster sizes") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Clusters.clusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (7L, 7L, 2L), (9L, 7L, 2L)))
  }

  test("cluster labels agree with the pair graph on fixture near-dups") {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir), 3, 0.6).cache()
    try {
      val labels = Clusters.connectedComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val edges = pairs.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(edges.nonEmpty, "fixture should contain planted near-dups")
      // Every edge's endpoints share a label, and every label is the min id
      // of its member set (canonical component representative).
      edges.foreach { case (a, b) => assert(labels(a) === labels(b), s"edge ($a,$b) split") }
      labels.groupBy(_._2).foreach { case (lbl, members) =>
        assert(lbl === members.keys.min, s"label $lbl is not the min member id")
      }
    } finally {
      // Same canonical plan as SparkEntry.sharedNgramPairs — leaving it
      // cached would turn that persist into a "already cached" no-op and
      // flake CacheLifecycleSpec's persisted-while-in-use assert.
      pairs.unpersist(blocking = true)
    }
  }

  test("deep chain converges (diameter > a few rounds)") {
    val n = 40L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Clusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === n)
    assert(labels.forall(_._2 === 0L))
  }

  test("distributed path (maxDriverEdges = 0) agrees with driver union-find") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    def toMap(maxDriverEdges: Long) =
      Clusters.connectedComponents(pairs, maxDriverEdges = maxDriverEdges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(toMap(0L) === toMap(100000L))
  }

  test("star contraction: diameter-1000 chain converges without raising maxIter") {
    // A chain is the adversarial case for min-label propagation (round
    // count = diameter = 1000 >> maxIter = 50); large-star/small-star
    // contracts it in O(log n) rounds. maxDriverEdges = 0 forces the
    // distributed path.
    val n = 1000L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Clusters.connectedComponents(pairs, maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === n)
    assert(labels.forall(_._2 === 0L), "every chain vertex must label to the min id 0")
  }

  test("star contraction agrees with the min-label oracle on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (0 until 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("id_a", "id_b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val star = toMap(Clusters.connectedComponents(pairs, maxDriverEdges = 0L))
    val oracle = toMap(Clusters.minLabelPropagation(pairs, maxIter = 200))
    assert(star === oracle)
  }

  test("star contraction at 60k-edge scale agrees with driver union-find") {
    // Two orders of magnitude past the other distributed-path fixtures:
    // a 32k-vertex pseudo-random multigraph (fixed LCG constants — no
    // Random seed plumbing) with ~2 edges per vertex, the regime where a
    // giant component emerges. Passing also proves convergence within
    // the default 50 rounds at this scale — non-convergence throws.
    import spark.implicits._
    val n = 32768L
    val edges = spark.range(60000)
      .select(((col("id") * 2654435761L) % n).as("id_a"),
        ((col("id") * 1099087573L + 2531011L) % n).as("id_b"))
    def labels(maxDriverEdges: Long) =
      Clusters.connectedComponents(edges, maxDriverEdges = maxDriverEdges)
        .as[(Long, Long)].collect().toMap
    val star = labels(0L)
    val uf = labels(Long.MaxValue)
    assert(star.nonEmpty && star === uf)
  }

  test("self-loop-only vertices are dropped by BOTH paths (one contract)") {
    // r5 advice: the driver path used to register self-loop vertices
    // while the distributed path dropped them — same input, different
    // output depending only on edge count. Pinned: both treat a vertex
    // whose only pairs are self-loops as a singleton (omitted).
    val pairs = Seq((1L, 2L), (5L, 5L), (2L, 2L)).toDF("id_a", "id_b")
    def toMap(maxDriverEdges: Long) =
      Clusters.connectedComponents(pairs, maxDriverEdges = maxDriverEdges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = Map(1L -> 1L, 2L -> 1L)
    assert(toMap(100000L) === expected, "driver union-find path")
    assert(toMap(0L) === expected, "distributed star-contraction path")
  }

  test("iterative rounds do not leak localCheckpoint blocks") {
    // r5 advice: every round used to pin one full edge-set copy for the
    // life of the session. Contract now: after the result is consumed,
    // at most the fixed-point edge set (1 RDD) stays pinned per call,
    // not O(rounds).
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val n = 200L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    Clusters.connectedComponents(pairs, maxDriverEdges = 0L).count()
    val leakedDistributed = sc.getPersistentRDDs.keySet -- before
    assert(leakedDistributed.size <= 1,
      s"distributed path pinned ${leakedDistributed.size} RDDs (want <=1: the fixed point)")
    val before2 = sc.getPersistentRDDs.keySet
    Clusters.connectedComponents(pairs).count() // driver path
    val leakedDriver = sc.getPersistentRDDs.keySet -- before2
    assert(leakedDriver.isEmpty,
      s"driver path should unpersist its edge checkpoint, left: $leakedDriver")
  }

  test("star contraction handles non-long (string) vertex ids") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val labels = Clusters.connectedComponents(pairs, maxDriverEdges = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(labels === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }
}
