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

  test("greedi: two-stage structure, determinism, merged ⊆ local picks") {
    val emb = Tables.embeddings(spark, sfDir)
    val (local, merged) = Coreset.greedi(spark, emb, blocks = 2, kLocal = 6, k = 8)
    assert(local.length === 12, "2 blocks × 6 local picks")
    assert(merged.length === 8)
    assert(merged.map(_.vecId).distinct.length === 8)
    // every local pick sits in its id-hash block, trajectories per block
    for (b <- 0 until 2) {
      val blk = local.filter(_.block == b)
      assert(blk.length === 6)
      assert(blk.forall(p => p.vecId % 2 == b), "block = vec_id % blocks")
      assert(blk.head.step === 0L && blk.head.radiusFp === 0L)
      val radii = blk.tail.map(_.radiusFp)
      assert(radii.zip(radii.tail).forall { case (a, c) => c <= a },
        s"block $b radius non-increasing: $radii")
    }
    // merge selects only from the union of local picks
    val union = local.map(_.vecId).toSet
    assert(merged.forall(p => union.contains(p.vecId)))
    // partitioning must not change either trajectory
    val (local2, merged2) =
      Coreset.greedi(spark, emb.repartition(13), blocks = 2, kLocal = 6, k = 8)
    // BlockPick carries an Array (reference equality) — compare fields
    def key(p: Coreset.BlockPick) = (p.block, p.step, p.vecId, p.radiusFp)
    assert(local2.map(key) === local.map(key))
    assert(merged2 === merged)
  }

  test("greedi approximation: merged covering radius within 4× of serial k-center") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    val serial = Coreset.kcenter(spark, emb, 8).map(_.vecId)
    val (_, merged) = Coreset.greedi(spark, emb, blocks = 2, kLocal = 6, k = 8)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    def coverRadius(picks: Seq[Long]): Double = {
      val centers = picks.map(vecs)
      vecs.values.map(v => centers.map(c => d2(v, c)).min).max
    }
    val rs = coverRadius(serial)
    val rg = coverRadius(merged.map(_.vecId))
    assert(rg <= 4.0 * rs + 1e-9,
      s"greedi covering radius $rg must stay within 4× serial $rs")
  }

  test("greedi degenerate: bad block/k params throw, tiny blocks don't") {
    val emb = Tables.embeddings(spark, sfDir)
    intercept[IllegalArgumentException](Coreset.greedi(spark, emb, 0, 6, 8))
    intercept[IllegalArgumentException](Coreset.greedi(spark, emb, 2, 0, 8))
    // kLocal bigger than a block: the block yields its whole slice
    val tiny = emb.limit(3)
    val (local, merged) = Coreset.greedi(spark, tiny, blocks = 2, kLocal = 6, k = 2)
    assert(local.length === 3, "each block yields min(kLocal, |block|) picks")
    assert(merged.length === 2)
  }

  test("degenerate inputs: k <= 0 and an empty frame both return no picks") {
    val emb = Tables.embeddings(spark, sfDir)
    assert(Coreset.kcenter(spark, emb, 0) === Seq.empty)
    assert(Coreset.kcenter(spark, emb, -3) === Seq.empty)
    val empty = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 0)
    assert(Coreset.kcenter(spark, empty, 5) === Seq.empty)
  }

}
