package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.DistributedRank

class DistributedRankSpec extends GraftSpec {
  import spark.implicits._

  test("distributed global row_number equals the single-partition window form") {
    val customer = Tables.customer(spark, sfDir).select($"c_custkey", $"c_acctbal")
    val (ranked, n) = DistributedRank.withGlobalRowNumber(
      customer, "c_acctbal", "c_custkey", "rk")
    assert(n === customer.count())
    val w = Window.orderBy($"c_acctbal", $"c_custkey")
    val oracle = customer.withColumn("rk", row_number().over(w).cast("long"))
    assert(ranked.except(oracle).isEmpty && oracle.except(ranked).isEmpty)
  }

  test("distributed rank is exact under heavy value ties across bucket cuts") {
    // only 3 distinct values over 5000 rows: every quantile cut collides,
    // ties MUST stay within one bucket for offsets to stay exact
    val df = (1L to 5000L).map(i => (i, (i % 3).toDouble)).toDF("id", "v")
    val (ranked, n) = DistributedRank.withGlobalRowNumber(df, "v", "id", "rk")
    assert(n === 5000L)
    val w = Window.orderBy($"v", $"id")
    val oracle = df.withColumn("rk", row_number().over(w).cast("long"))
    assert(ranked.except(oracle).isEmpty && oracle.except(ranked).isEmpty)
  }
}
