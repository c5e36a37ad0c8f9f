package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.streaming.EventOps

class EventOpsSpec extends GraftSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir).cache()

  test("sessions per user are disjoint and ordered, gap respected") {
    val sessions = EventOps.sessionize(events, "30 minutes").collect()
    sessions.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts at/after previous end (gap >= 30min)
          assert(b.getLong(1) >= a.getLong(2))
        case _ =>
      }
    }
    assert(sessions.map(_.getLong(3)).sum === events.count())
  }

  test("tumbling window counts cover all events") {
    val w = EventOps.tumblingCounts(events, "10 minutes")
    assert(w.agg(sum($"n")).head().getLong(0) === events.count())
    // window starts are aligned to 600s
    assert(w.filter($"window_start_sec" % 600 =!= 0).count() === 0)
  }

  test("streaming twin of tumbling counts equals the batch result") {
    val q = EventOps.streamTumblingCounts(spark, sfDir, "stream_out")
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("stream_out")
      .select($"window_start_sec", $"event_type", $"n")
    val batch = EventOps.tumblingCounts(events, "10 minutes")
      .select($"window_start_sec", $"event_type", $"n")
    assert(stream.except(batch).count() === 0 && batch.except(stream).count() === 0)
  }

  test("first event per (user, type) is minimal by (ts, event_id)") {
    val firsts = EventOps.firstEventPerUserType(events)
    val viaWindow = events
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")))
      .filter($"rk" === 1)
      .select($"user_id", $"event_type", $"event_id".as("first_event_id"))
    assert(firsts.select("user_id", "event_type", "first_event_id")
      .except(viaWindow).count() === 0)
  }
}
