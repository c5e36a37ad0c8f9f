package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcMerge

class CdcMergeSpec extends GraftSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")

  private def changes(rows: (Long, String, Double, String, Long)*) =
    rows.toDF("k", "s", "v", "_op", "_seq")

  test("update, delete, and insert paths in one batch") {
    val out = CdcMerge.merge(base,
      changes((2L, "B", 21.0, "u", 1L), (3L, "c", 30.0, "d", 1L), (9L, "new", 90.0, "u", 1L)),
      "k").orderBy("k").as[(Long, String, Double)].collect()
    assert(out === Array((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0), (9L, "new", 90.0)))
  }

  test("highest _seq wins: update-after-update and insert-after-delete") {
    val out = CdcMerge.merge(base,
      changes(
        (2L, "first", 0.0, "u", 1L), (2L, "second", 2.0, "u", 5L),
        (3L, "x", 0.0, "d", 1L), (3L, "resurrected", 3.0, "u", 2L),
        (4L, "upserted", 4.0, "u", 1L), (4L, "y", 0.0, "d", 2L)),
      "k").orderBy("k").as[(Long, String, Double)].collect()
    assert(out === Array((1L, "a", 10.0), (2L, "second", 2.0), (3L, "resurrected", 3.0)))
  }

  test("empty change batch is the identity") {
    val out = CdcMerge.merge(base, changes(), "k")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out === base.orderBy("k").as[(Long, String, Double)].collect())
  }

  test("same-seq tie resolves to the upsert (stable, documented)") {
    val out = CdcMerge.merge(base,
      changes((1L, "tied", 1.5, "u", 3L), (1L, "x", 0.0, "d", 3L)), "k")
      .filter($"k" === 1L).as[(Long, String, Double)].collect()
    assert(out === Array((1L, "tied", 1.5)))
  }

  test("streaming twin: last-write-wins emissions materialize the batch merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.CdcChange
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[CdcChange]
    val q = StatefulOps.streamCdcLatest(ms.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("cdc_stream_twin").start()
    try {
      // trigger 1: the base snapshot as seq=-1 upserts, plus wave 1
      ms.addData(
        CdcChange(1L, "a", 10.0, "u", -1L), CdcChange(2L, "b", 20.0, "u", -1L),
        CdcChange(3L, "c", 30.0, "u", -1L), CdcChange(4L, "d", 40.0, "u", -1L),
        CdcChange(2L, "B", 21.0, "u", 1L), CdcChange(3L, "x", 0.0, "d", 1L))
      q.processAllAvailable()
      // trigger 2: wave 2 — re-update, resurrect, fresh insert
      ms.addData(
        CdcChange(2L, "B2", 22.0, "u", 2L), CdcChange(3L, "back", 33.0, "u", 2L),
        CdcChange(9L, "new", 90.0, "u", 2L))
      q.processAllAvailable()
    } finally q.stop()

    // a last-write-wins sink keeps each key's max (seq, op) emission
    val materialized = spark.table("cdc_stream_twin")
      .groupBy($"k")
      .agg(max_by(struct($"op", $"s", $"v"), struct($"seq", $"op")).as("w"))
      .filter($"w.op" === "u")
      .select($"k", $"w.s".as("s"), $"w.v".as("v"))
      .orderBy("k").as[(Long, String, Double)].collect()

    val batch = CdcMerge.merge(base,
      changes(
        (2L, "B", 21.0, "u", 1L), (3L, "x", 0.0, "d", 1L),
        (2L, "B2", 22.0, "u", 2L), (3L, "back", 33.0, "u", 2L),
        (9L, "new", 90.0, "u", 2L)),
      "k").orderBy("k").as[(Long, String, Double)].collect()

    assert(materialized === batch,
      "continuous merge + LWW sink must equal the batch MERGE snapshot")
  }

  test("plan: no join node, exactly one hash exchange (union + max_by)") {
    val p = CdcMerge.merge(base, changes((2L, "B", 21.0, "u", 1L)), "k")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "merge must be union + aggregate, not a join")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      "one shuffle on the merge key; partial max_by must run map-side")
  }

  test("SCD2 history: validity intervals chain per key, current row open-ended") {
    val versions = Seq(
      (1L, "v0", 0.0, "u", -1L), (1L, "v1", 1.0, "u", 1L), (1L, "gone", 0.0, "d", 2L),
      (2L, "only", 9.0, "u", -1L))
      .toDF("k", "s", "v", "_op", "_seq")
    val out = graft.operators.Scd2.history(versions, "k", "_seq")
      .select($"k", $"valid_from", $"valid_to", $"is_current", $"s")
      .orderBy("k", "valid_from")
      .as[(Long, Long, Option[Long], Boolean, String)].collect()
    assert(out === Array(
      (1L, -1L, Some(1L), false, "v0"),
      (1L, 1L, Some(2L), false, "v1"),
      (1L, 2L, None, true, "gone"),
      (2L, -1L, None, true, "only")))
  }

  test("SCD2 plan: the lead window reuses the key exchange (one shuffle)") {
    val versions = Seq((1L, "a", 1.0, "u", 1L)).toDF("k", "s", "v", "_op", "_seq")
    val p = graft.operators.Scd2.history(versions, "k", "_seq")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      "partitioning by key must be shared by the window; a second exchange " +
        "means the window re-shuffled")
    assert(!p.contains("Exchange SinglePartition"),
      "no global-window funnel")
  }
}
