package graft

import graft.model.Tables
import graft.operators.Coreset

class CoresetSpec extends GraftSpec {

  test("k-center greedy: distinct picks, non-increasing radius, deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val picks = Coreset.kcenter(spark, emb, 8)
    assert(picks.length === 8)
    assert(picks.map(_.vecId).distinct.length === 8, "picks must be distinct")
    assert(picks.head.step === 0L && picks.head.radiusFp === 0L)
    assert(picks.head.vecId ===
      emb.agg(org.apache.spark.sql.functions.min("vec_id")).head().getLong(0),
      "seed is the smallest id (the deterministic anchor)")
    val radii = picks.tail.map(_.radiusFp)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"covering radius must be non-increasing: $radii")
    assert(radii.last > 0L, "fixture vectors are distinct — radius stays positive")
    // partitioning must not change the greedy trajectory (fixed-point
    // distances + deterministic argmax tie-break)
    val picks2 = Coreset.kcenter(spark, emb.repartition(13), 8)
    assert(picks2 === picks)
  }

  test("farthest-point property: each pick is outside every earlier pick's ball") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    val picks = Coreset.kcenter(spark, emb, 5)
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    for (i <- 1 until picks.length) {
      val minToPrev = picks.take(i).map(p => d2(vecs(picks(i).vecId), vecs(p.vecId))).min
      assert(math.abs(minToPrev * 1e6 - picks(i).radiusFp) < 2.0,
        "reported radius is the true min distance to earlier picks (micro-units)")
    }
  }
  test("k larger than the collection returns the whole set, no throw") {
    val emb = Tables.embeddings(spark, sfDir).limit(3)
    val picks = Coreset.kcenter(spark, emb, 10)
    assert(picks.length === 3)
    assert(picks.map(_.vecId).distinct.length === 3)
  }

  test("degenerate inputs: k <= 0 and an empty frame both return no picks") {
    val emb = Tables.embeddings(spark, sfDir)
    assert(Coreset.kcenter(spark, emb, 0) === Seq.empty)
    assert(Coreset.kcenter(spark, emb, -3) === Seq.empty)
    val empty = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 0)
    assert(Coreset.kcenter(spark, empty, 5) === Seq.empty)
  }

}
