package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.operators.AsofJoin

class AsofJoinSpec extends GraftSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("strictPrior picks the greatest strictly-earlier right row per key") {
    val left = Seq((1L, ts(10), "t10"), (1L, ts(20), "t20"), (2L, ts(15), "t15"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(5), 5.0), (1L, ts(12), 12.0), (2L, ts(15), 15.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.strictPrior(left, right, "k", "ts", Seq("v"))
      .orderBy("k", "ts").collect()
    assert(out.map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("asof_v")))) ===
      Array(("t10", Some(5.0)), ("t20", Some(12.0)), ("t15", None)),
      "equal timestamps must NOT match (strict <) and the latest prior must win")
    assert(out(1).getAs[Timestamp]("asof_ts") === ts(12))
  }

  test("left rows with no prior right row keep left-outer null payloads") {
    val left = Seq((7L, ts(1), 1)).toDF("k", "ts", "x")
    val right = Seq((7L, ts(9), 9.0)).toDF("k", "ts", "v")
    val out = AsofJoin.strictPrior(left, right, "k", "ts", Seq("v")).collect()
    assert(out.length === 1 && out(0).isNullAt(out(0).fieldIndex("asof_v")))
  }

  test("a matched row's NULL payload value survives — ignoreNulls must not skip past it") {
    val left = Seq((1L, ts(30), 0)).toDF("k", "ts", "x")
    // latest prior row (t=20) carries a null v; the older t=10 carries 10.0.
    // Correct as-of semantics return the t=20 row (null v), not 10.0.
    val right = Seq(
      Row(1L, ts(10), java.lang.Double.valueOf(10.0)),
      Row(1L, ts(20), null: java.lang.Double))
    val rightSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val rightDf = spark.createDataFrame(spark.sparkContext.parallelize(right), rightSchema)
    val out = AsofJoin.strictPrior(left, rightDf, "k", "ts", Seq("v")).collect()
    assert(out(0).getAs[Timestamp]("asof_ts") === ts(20),
      "must match the latest prior row even when its payload is null")
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")))
  }

  test("keys never cross: a right row on another key is invisible") {
    val left = Seq((1L, ts(10), 0)).toDF("k", "ts", "x")
    val right = Seq((2L, ts(5), 5.0)).toDF("k", "ts", "v")
    val out = AsofJoin.strictPrior(left, right, "k", "ts", Seq("v")).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")))
  }
}
