package graft

import org.apache.spark.sql.functions._

import graft.eval.RecallAtK
import graft.model.Tables
import graft.search.{Hnsw, IvfIndex, KnnExact}

class HnswSpec extends GraftSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qemb")).cache()

  test("single graph with exhaustive ef reproduces the exact scan") {
    // ef ≥ n makes the layer-0 beam visit the whole connected graph, so
    // the walk degenerates to exhaustive search — results must match
    // the brute-force oracle exactly, (dist, id)-ordered.
    val n = emb.count().toInt
    val g = Hnsw.topK(spark, queries, emb, 10,
      efSearch = n + 1, numGraphs = 1)
      .select(col("qid"), col("vec_id"), col("rk"))
    val exact = KnnExact.topK(queries, emb, 10)
      .select(col("qid"), col("vec_id"), col("rk"))
    assert(g.exceptAll(exact).isEmpty && exact.exceptAll(g).isEmpty)
  }

  test("deterministic: two builds over the same input agree row-for-row") {
    val a = Hnsw.topK(spark, queries, emb, 10).collect().toSeq
    val b = Hnsw.topK(spark, queries, emb, 10).collect().toSeq
    assert(a.map(_.toSeq) === b.map(_.toSeq))
  }

  test("compactIndex: rebuild from stored vectors equals a fresh build at the target count") {
    // compaction reads the INDEX (stored vectors), not the original
    // collection — yet must produce the identical layout and graphs a
    // fresh build at the target segment count would (ascending-id
    // insertion is the shared discipline). Adjacency equality is the
    // strongest check: same segments, same neighbor lists.
    val idx8 = Hnsw.buildIndex(spark, emb, numGraphs = 8)
    val compacted = Hnsw.compactIndex(spark, idx8, toGraphs = 2)
    val fresh = Hnsw.buildIndex(spark, emb, numGraphs = 2)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(1)
    val cRows = compacted.collect().sortBy(key).map(_.toString)
    val fRows = fresh.collect().sortBy(key).map(_.toString)
    assert(cRows.toSeq === fRows.toSeq)
    assert(compacted.select(col("seg")).distinct().count() === 2)
    // and the compacted index answers searches identically to the
    // 8-segment original at exhaustive ef (both are the exact scan)
    val n = emb.count().toInt
    val a = Hnsw.searchIndex(spark, queries, idx8, 10, efSearch = n + 1, numGraphs = 8)
      .select(col("qid"), col("vec_id"), col("rk"))
    val b = Hnsw.searchIndex(spark, queries, compacted, 10, efSearch = n + 1, numGraphs = 2)
      .select(col("qid"), col("vec_id"), col("rk"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("tombstoned search: dead ids excluded, equals exact over survivors, purge preserves") {
    val dead = (0L until 20L).toSeq
    val qs = emb.filter(col("vec_id") >= 20 && col("vec_id") < 25)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val n = emb.count().toInt
    val idx = Hnsw.buildIndex(spark, emb, numGraphs = 8)
    val res = Hnsw.searchIndexTombstoned(spark, qs, idx, dead, 10, efSearch = n + 1)
      .select(col("qid"), col("vec_id"), col("rk"))
    // exactly the brute-force top-10 over the survivors
    val exact = KnnExact.topK(qs, emb.filter(col("vec_id") >= 20), 10)
      .select(col("qid"), col("vec_id"), col("rk"))
    assert(res.exceptAll(exact).isEmpty && exact.exceptAll(res).isEmpty)
    // the filter genuinely displaced results: unfiltered search at the
    // same ef returns dead ids at this fixture scale
    val unfiltered = Hnsw.searchIndex(spark, qs, idx, 10, efSearch = n + 1)
    assert(unfiltered.filter(col("vec_id") < 20).count() > 0,
      "fixture must make tombstones displace results, or the test proves nothing")
    assert(res.filter(col("vec_id") < 20).count() === 0)
    // purge = compact over the filtered index; same answers, fresh graphs
    val purged = Hnsw.compactIndex(spark,
      idx.filter(!col("vec_id").isin(dead: _*)), toGraphs = 4)
    val after = Hnsw.searchIndex(spark, qs, purged, 10, efSearch = n + 1, numGraphs = 4)
      .select(col("qid"), col("vec_id"), col("rk"))
    assert(after.exceptAll(exact).isEmpty && exact.exceptAll(after).isEmpty)
  }

  test("segment-merged recall@10 vs exact clears the oracle floor") {
    val gt = KnnExact.topK(queries, emb, 10)
    val approx = Hnsw.topK(spark, queries, emb, 10)
    val recalls = RecallAtK.evaluate(gt, approx, Seq(10))
      .select(col("qid"), col("recall_10")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(recalls.size === 5)
    recalls.foreach { case (qid, r) =>
      assert(r >= 0.9, s"recall@10 for qid=$qid was $r (floor 0.9)")
    }
  }

  test("graph unit: self is nearest, ties break on insertion order (= id via buildGraph)") {
    // In-graph ties resolve on node (insertion) index; buildGraph
    // inserts ascending by id, so externally ties break on id — insert
    // through buildGraph exactly as the distributed path does.
    val g = Hnsw.buildGraph(Iterator(
      (7L, Array(1f, 0f)), (3L, Array(1f, 0f)), (1L, Array(0f, 1f))),
      m = 4, efConstruction = 16)
    val top = g.search(Array(1f, 0f), 3, efSearch = 8)
    assert(top.map(_._1) === Seq(3L, 7L, 1L))
    assert(top.head._2 === 0.0)
  }

  test("empty segment yields no candidates instead of failing") {
    val g = new Hnsw.Graph(m = 4, efConstruction = 16)
    assert(g.search(Array(1f, 0f), 3, efSearch = 8).isEmpty)
  }

  test("ivf-routed walk with exhaustive ef equals the exact IVF probe") {
    // per-cell graphs walked with ef >= cell size are exhaustive, so
    // routed-HNSW must reproduce the IVF exact probe row-for-row —
    // the contract ann_hnsw_ivf_routed's closed-form oracle hashes
    val cent = IvfIndex.seedCentroids(emb, 8)
    val n = emb.count().toInt
    val routed = Hnsw.topKRouted(spark, queries, emb, cent, k = 10,
      nprobe = 2, efSearch = n + 1)
      .select(col("qid"), col("vec_id"), col("rk"),
        round(sqrt(col("dist")), 4).as("dist"))
    val ivf = IvfIndex.search(queries, IvfIndex.assign(emb, cent), cent,
      k = 10, nprobe = 2)
      .select(col("qid"), col("vec_id"), col("rk"), round(col("dist"), 4).as("dist"))
    assert(routed.exceptAll(ivf).isEmpty && ivf.exceptAll(routed).isEmpty)
  }

  test("ivf-routed recall tracks the routing, not the walk, at tight ef") {
    // with production-ish ef the walk is approximate INSIDE a cell but
    // the reachable set is still the probed cells — recall must be at
    // least as selective as routing allows and never zero
    val cent = IvfIndex.seedCentroids(emb, 8)
    val gt = KnnExact.topK(queries, emb, 10)
    val routed = Hnsw.topKRouted(spark, queries, emb, cent, k = 10,
      nprobe = 8, efSearch = 128)
    val recalls = RecallAtK.evaluate(gt, routed, Seq(10))
      .select(col("qid"), col("recall_10")).collect()
      .map(r => r.getDouble(1))
    // nprobe = all cells → routing excludes nothing → recall is the
    // walk's own, which clears the same floor as the unrouted path
    recalls.foreach(r => assert(r >= 0.9, s"full-probe routed recall was $r"))
  }

  test("recall holds off-fixture: clustered synthetic vectors") {
    // the fixture is isotropic; graph ANN's hard cases are clustered.
    // Deterministic pseudo-random 1000×16 vectors in 10 loose clusters
    // (base offset by id%10, jitter from Spark's murmur3) — recall@10
    // must clear the same floor as on the fixture.
    val df = spark.range(1000).select(col("id").as("vec_id"))
      .withColumn("embedding", expr(
        "transform(sequence(0, 15), j -> cast((vec_id % 10) * 10.0" +
          " + pmod(hash(vec_id, j), 97) / 97.0 as float))"))
      .cache()
    val q = df.filter(col("vec_id").isin(1L, 101L, 333L, 555L, 777L))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val gt = KnnExact.topK(q, df, 10)
    val approx = Hnsw.topK(spark, q, df, 10)
    val recalls = RecallAtK.evaluate(gt, approx, Seq(10))
      .select(col("recall_10")).collect().map(_.getDouble(0))
    assert(recalls.length === 5)
    recalls.foreach(r => assert(r >= 0.9, s"clustered-data recall was $r"))
  }

  test("recall holds on TIGHT clusters (the heuristic's reason to exist)") {
    // 10 well-separated tight clusters (centers 100 apart, jitter ~1):
    // plain closest-M selection links every node only within its own
    // cluster, backlink pruning then severs the few cross-cluster edges,
    // and layer-0 disconnects — a query's walk gets stuck in the entry
    // point's cluster. The select-neighbors heuristic keeps one diverse
    // link per direction alive, so recall must survive.
    val df = spark.range(1000).select(col("id").as("vec_id"))
      .withColumn("embedding", expr(
        "transform(sequence(0, 15), j -> cast((vec_id % 10) * 100.0" +
          " + pmod(hash(vec_id, j), 97) / 48.5 as float))"))
      .cache()
    val q = df.filter(col("vec_id").isin(1L, 101L, 333L, 555L, 777L))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val gt = KnnExact.topK(q, df, 10)
    val approx = Hnsw.topK(spark, q, df, 10)
    val recalls = RecallAtK.evaluate(gt, approx, Seq(10))
      .select(col("recall_10")).collect().map(_.getDouble(0))
    assert(recalls.length === 5)
    recalls.foreach(r => assert(r >= 0.9, s"tight-cluster recall was $r"))
    df.unpersist()
  }

  test("graph audit: full reachability and degree caps, even on tight clusters") {
    // the audit must report every node reachable on the adversarial
    // tight-cluster corpus (where plain closest-M would disconnect) and
    // degree inside the pruning caps
    val df = spark.range(1000).select(col("id").as("vec_id"))
      .withColumn("embedding", expr(
        "transform(sequence(0, 15), j -> cast((vec_id % 10) * 100.0" +
          " + pmod(hash(vec_id, j), 97) / 48.5 as float))"))
    val idx = Hnsw.buildIndex(spark, df)
    val audit = Hnsw.graphAudit(spark, idx).collect()
    assert(audit.length === 8)
    audit.foreach { r =>
      assert(r.getAs[Long]("n_reachable") === r.getAs[Long]("n_nodes"),
        s"segment ${r.getAs[Int]("seg")} has unreachable nodes")
      assert(r.getAs[Long]("deg0_min") >= 1L)
      assert(r.getAs[Long]("deg0_max") <= 32L)
    }
    assert(audit.map(_.getAs[Long]("n_nodes")).sum === 1000L)
  }

  test("backlink pruning never empties an adjacency list (keepPruned)") {
    // keepPrunedConnections guarantees |pruned list| = cap exactly —
    // build a graph where every insert triggers pruning (all vectors on
    // one tight cluster, maxM0 small) and assert layer-0 degree never
    // drops below min(cap, inserted-1) for early nodes nor hits zero
    val g = new Hnsw.Graph(m = 2, efConstruction = 16)
    (0 until 50).foreach { i =>
      g.insert(i.toLong, Array(i.toFloat / 1000f, 1f))
    }
    // every node must remain reachable: an exhaustive-ef walk from the
    // entry visits the whole component, so it must return all 50
    val seen = g.search(Array(0f, 1f), 50, efSearch = 64).map(_._1).toSet
    assert(seen.size === 50, s"walk reached only ${seen.size}/50 nodes")
  }

  test("mass duplicates: ties resolve to the globally smallest ids") {
    // 200 identical vectors: every distance ties at 0, so the merged
    // top-10 must be exactly ids 0..9 — each segment surfaces its own
    // smallest ids and the (dist, id) merge keeps the global smallest
    val df = spark.range(200).select(col("id").as("vec_id"))
      .withColumn("embedding",
        expr("transform(sequence(0, 7), j -> cast(1.0 as float))"))
    val q = df.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val top = Hnsw.topK(spark, q, df, 10)
      .orderBy("rk").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(top === (0L until 10L))
  }

  test("stored ROUTED index answers identically to query-time routing") {
    // build-once/search-many for the IVF-routed composition: every
    // cell's graph is built once with the same ascending-id insertion
    // the query-time path uses, so results must match row-for-row —
    // including through a cell-partitioned parquet cycle, where the
    // probed-cells filter becomes partition pruning
    val cent = IvfIndex.seedCentroids(emb, 8)
    val oneShot = Hnsw.topKRouted(spark, queries, emb, cent, k = 10, nprobe = 2)
    val idx = Hnsw.buildRoutedIndex(spark, emb, cent)
    val fromIdx = Hnsw.searchRoutedIndex(spark, queries, idx, cent, k = 10, nprobe = 2)
    assert(fromIdx.exceptAll(oneShot).isEmpty && oneShot.exceptAll(fromIdx).isEmpty)

    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_ridx").toString
    try {
      idx.write.mode("overwrite").partitionBy("cell").parquet(dir)
      val stored = spark.read.parquet(dir)
        .withColumn("cell", col("cell").cast("int"))
      val persisted = Hnsw.searchRoutedIndex(spark, queries, stored, cent,
        k = 10, nprobe = 2)
      assert(persisted.exceptAll(oneShot).isEmpty && oneShot.exceptAll(persisted).isEmpty)
      // the probe must PRUNE the partitioned scan: the executed plan's
      // scan reads only the probed cells' partition dirs
      val pruned = Hnsw.searchRoutedIndex(spark, queries, stored, cent,
        k = 10, nprobe = 1)
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      assert(scan.contains("PartitionFilters") || scan.contains("cell IN") ||
        scan.contains("isin"), s"probed-cell filter must reach the scan:\n$scan")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("stored index searches bit-identically to the one-shot path") {
    // build-once / search-many: the exported adjacency rehydrates to
    // the SAME graph (same entry point, same walk), so a search from
    // the stored index must equal topK row-for-row — including through
    // a parquet write/read cycle.
    val idx = Hnsw.buildIndex(spark, emb)
    val oneShot = Hnsw.topK(spark, queries, emb, 10)
    val fromIdx = Hnsw.searchIndex(spark, queries, idx, 10)
    assert(fromIdx.exceptAll(oneShot).isEmpty && oneShot.exceptAll(fromIdx).isEmpty)

    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_idx").toString
    try {
      idx.write.mode("overwrite").parquet(dir)
      val persisted = Hnsw.searchIndex(spark, queries, spark.read.parquet(dir), 10)
      assert(persisted.exceptAll(oneShot).isEmpty && oneShot.exceptAll(persisted).isEmpty)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
