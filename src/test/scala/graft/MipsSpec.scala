package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.search.KnnExact

/** Max-inner-product search: the exact dot-product top-k operator and
  * the Shrivastava & Li (NeurIPS'14) MIPS→L2 reduction — augmented-L2
  * ranking must agree with direct dot ranking exactly, and the HNSW
  * index over augmented vectors must clear the recall floor.
  */
class MipsSpec extends GraftSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("reduction theorem: augmented-L2 ranking equals direct dot ranking") {
    val viaDot = SparkEntry.queries("knn_dot_top10")(spark, sfDir)
      .select("qid", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaL2 = SparkEntry.queries("ann_mips_top10")(spark, sfDir)
      .select("qid", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaDot.nonEmpty && viaDot.size === viaL2.size)
    assert(viaDot === viaL2,
      "ranking by 65-dim augmented L2 must reproduce the dot-descending order")
  }

  test("augmentation: max-norm row gets exactly 0, distances obey the identity") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val dotCol = graft.functions.VectorExpressions.dot(col("embedding"), col("embedding"))
    val m2 = emb.agg(max(dotCol)).head().getDouble(0)
    val aug = emb.select(col("vec_id"), col("embedding"),
      sqrt(lit(m2) - dotCol).as("extra"))
    // the arg-max row's extra element is sqrt(m2 - m2) = 0 exactly —
    // both engines compute the same doubles, so no negative operand
    val minExtra = aug.agg(min(col("extra"))).head().getDouble(0)
    assert(minExtra === 0.0, "the max-norm vector augments with exactly 0")
    assert(!aug.select(col("extra")).collect().exists(r => r.getDouble(0).isNaN),
      "no augmented element is NaN (m2 is the true max)")
    // identity check on one pair: ||q̂ - x̂||² = ||q||² + M² - 2·q·x
    val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0)
    val x = emb.filter(col("vec_id") === 1)
      .select(col("embedding"), sqrt(lit(m2) - dotCol).as("extra")).head()
    val xe = x.getSeq[Float](0)
    val extra = x.getDouble(1)
    val ip = q.zip(xe).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val qn2 = q.map(v => v.toDouble * v.toDouble).sum
    val adist2 = q.zip(xe).map { case (a, b) =>
      val d = a.toDouble - b.toDouble; d * d
    }.sum + extra * extra
    assert(math.abs(adist2 - (qn2 + m2 - 2 * ip)) < 1e-9 * math.max(1.0, adist2),
      "augmented squared distance matches the MIPS reduction identity")
  }

  test("HNSW over augmented vectors clears the MIPS recall floor") {
    val rows = SparkEntry.queries("ann_mips_hnsw")(spark, sfDir).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getBoolean(2)), "recall@10 >= 0.9 for every query")
  }

  test("topKDot: descending inner product, (score, id) tie-break, k rows per query") {
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val res = KnnExact.topKDot(q, emb, 5).collect()
    assert(res.length === 15)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (ipA, ipB) = (a.getDouble(3), b.getDouble(3))
          assert(ipA > ipB || (ipA == ipB && a.getLong(1) < b.getLong(1)),
            "rows must be ordered by (ip desc, vec_id asc)")
        case _ =>
      }
      // a query vector's own row is its nearest-by-dot on this fixture
      // only if its self-dot is maximal — not guaranteed for MIPS
      // (unlike L2 where self-distance 0 always wins); just assert rk 1..5
      assert(sorted.map(_.getInt(2)).toSeq === (1 to 5))
    }
  }
}
