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

  test("sliding windows: every event lands in width/slide windows") {
    val sliding = EventOps.slidingCounts(events, "30 minutes", "10 minutes")
    assert(sliding.agg(sum($"n")).head().getLong(0) === events.count() * 3)
    // consecutive window starts differ by the slide, not the width
    val starts = sliding.select($"window_start_sec").distinct()
      .orderBy($"window_start_sec").as[Long].collect()
    assert(starts.sliding(2).forall { case Array(a, b) => (b - a) % 600 == 0; case _ => true })
  }
}
