package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.streaming.{EventOps, StatefulOps}

class StatefulOpsSpec extends GraftSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir).cache()

  test("mapGroupsWithState per-user aggregates equal the batch groupBy") {
    val q = StatefulOps.streamUserAggregates(spark, sfDir, "user_aggs")
    q.processAllAvailable()
    q.stop()
    // single input file -> single batch -> one Update row per user
    val stream = spark.table("user_aggs")
      .select($"user_id", $"n_events", round($"sum_value", 4).as("sum_value"))
    val batch = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
    assert(stream.count() === batch.count())
    assert(stream.except(batch).count() === 0)
  }

  test("dropDuplicatesWithinWatermark keeps one row per (user, type)") {
    val q = StatefulOps.streamDedupWithinWatermark(spark, sfDir, "dedup_stream")
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("dedup_stream")
    val batchKeys = events.select($"user_id", $"event_type").distinct()
    assert(stream.count() === batchKeys.count())
    assert(stream.select($"user_id", $"event_type").except(batchKeys).count() === 0)
  }

  test("flatMapGroupsWithState emits exactly the closed sessions") {
    val q = StatefulOps.streamSessionsFlatMap(spark, sfDir, "sessions_fm")
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("sessions_fm")
      .select($"user_id", $"session_start_sec", $"session_end_sec", $"n_events")
    // batch oracle: all sessions minus each user's LAST (still open in state)
    val all = EventOps.sessionize(events, "30 minutes")
      .select($"user_id", $"session_start_sec", $"session_end_sec", $"n_events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_start_sec".desc)
    val expected = all.withColumn("rk", row_number().over(w)).filter($"rk" > 1).drop("rk")
    assert(emitted.count() === expected.count())
    assert(emitted.except(expected).count() === 0 && expected.except(emitted).count() === 0)
  }

  test("stream-stream interval join equals the batch join") {
    val q = StatefulOps.streamClickErrorJoin(spark, sfDir, "click_err")
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("click_err")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("c_ts"))
    val errors = events.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("error_id"), $"ts".as("e_ts"))
    val batch = clicks.join(errors,
        $"user_id" === $"e_user" &&
          $"e_ts" >= $"c_ts" - expr("INTERVAL 10 MINUTES") && $"e_ts" <= $"c_ts")
      .select($"user_id", $"click_id", $"error_id")
    assert(stream.count() === batch.count())
    assert(stream.except(batch).count() === 0 && batch.except(stream).count() === 0)
  }

  test("driver entry point returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("sliding windows: every event lands in width/slide windows") {
    val sliding = EventOps.slidingCounts(events, "30 minutes", "10 minutes")
    assert(sliding.agg(sum($"n")).head().getLong(0) === events.count() * 3)
    // consecutive window starts differ by the slide, not the width
    val starts = sliding.select($"window_start_sec").distinct()
      .orderBy($"window_start_sec").as[Long].collect()
    assert(starts.sliding(2).forall { case Array(a, b) => (b - a) % 600 == 0; case _ => true })
  }
}
