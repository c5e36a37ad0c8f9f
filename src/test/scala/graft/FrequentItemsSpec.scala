package graft

import org.apache.spark.sql.functions._

import graft.operators.FrequentItems

/** Misra-Gries guarantees in the regime the CORRECTNESS row can't reach:
  * m ≪ cardinality on skewed (Zipf) data, where estimates depend on
  * merge order but must respect the error bound.
  */
class FrequentItemsSpec extends GraftSpec {

  /** Zipf-ish stream: item w_i appears floor(2000/i) times, i = 1..200. */
  private def zipf = spark.range(1, 201)
    .select(col("id"), explode(sequence(lit(1L), floor(lit(2000.0) / col("id")).cast("long"))).as("rep"))
    .select(concat(lit("w"), col("id")).as("item"))

  test("approx regime: never overcounts, error within n/(m+1), all heavy items found") {
    val m = 32
    val df = zipf.repartition(7)
    val n = df.count()
    val bound = n.toDouble / (m + 1)
    val est = FrequentItems.sketch(df, "item", m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty && est.size <= m)
    est.foreach { case (k, e) =>
      assert(e <= exact(k), s"$k overcounted: est $e > exact ${exact(k)}")
      assert(exact(k) - e <= bound, s"$k under bound: exact ${exact(k)}, est $e, bound $bound")
    }
    val heavy = exact.filter(_._2 > bound).keySet
    assert(heavy.nonEmpty, "fixture should have heavy items")
    assert(heavy.subsetOf(est.keySet), s"missing heavy items: ${heavy -- est.keySet}")
  }

  test("exact regime: m >= cardinality is exact and partitioning-invariant") {
    val exact = zipf.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 13).foreach { p =>
      val est = FrequentItems.sketch(zipf.repartition(p), "item", 1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est == exact, s"repartition($p): sketch must be exact when m >= |items|")
    }
  }

  test("sketch works under groupBy keys too") {
    val keyed = zipf.withColumn("grp", (length(col("item")) % 2).cast("int"))
    val out = keyed.groupBy("grp").agg(FrequentItems.mgSketch(col("item"), 16).as("mg"))
      .select(col("grp"), explode(col("mg")).as(Seq("item", "n_est")))
    assert(out.count() > 0)
    // per-group sketches only contain items of that group
    val bad = out.filter((length(col("item")) % 2).cast("int") =!= col("grp")).count()
    assert(bad == 0)
  }
}
