package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Bucketed co-located joins: pre-partitioning both sides of a
  * recurring join on its key eliminates the per-query shuffle — the
  * storage-layout lever for repeated 100 TB joins (the other levers:
  * broadcast for small dims, AQE for runtime skew).
  */
class BucketingSpec extends GraftSpec {

  test("bucketed tables join without a shuffle exchange") {
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("the declared bucketed-join query cleans up its tables and files") {
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    val df = SparkEntry.queries("join_bucketed_revenue")(spark, sfDir)
    assert(df.count() > 0)
    val after = spark.catalog.listTables().collect().map(_.name).toSet
    assert(after === before, s"tables leaked: ${after -- before}")
  }
}
