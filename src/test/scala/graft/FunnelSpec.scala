package graft

import java.sql.Timestamp

import graft.operators.Funnel

class FunnelSpec extends GraftSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private def us(sec: Long) = sec * 1000000L

  private def run(rows: (Long, String, Long)*) =
    Funnel.funnel(
      rows.map { case (u, t, sec) => (u, t, ts(sec)) }.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect()

  test("full conversion takes the FIRST valid time at each stage") {
    val out = run(
      (1L, "view", 10L), (1L, "view", 5L), (1L, "click", 20L),
      (1L, "click", 8L), (1L, "purchase", 30L))
    // t1 = min view = 5; t2 = min click AFTER 5 = 8 (not 20); t3 = 30
    assert(out === Array((1L, Some(us(5)), Some(us(8)), Some(us(30)), 3L)))
  }

  test("strict order: a stage event before the prior stage does not count") {
    val out = run(
      (2L, "purchase", 1L), (2L, "view", 10L), (2L, "click", 20L))
    // purchase exists but only BEFORE the click → stage 3 not reached
    assert(out === Array((2L, Some(us(10)), Some(us(20)), None, 2L)))
  }

  test("missing middle stage blocks later stages even if their events exist") {
    val out = run((3L, "view", 1L), (3L, "purchase", 50L))
    assert(out === Array((3L, Some(us(1)), None, None, 1L)))
  }

  test("no stage-1 event: reached 0, all stage times null") {
    val out = run((4L, "click", 5L), (4L, "purchase", 9L))
    assert(out === Array((4L, None, None, None, 0L)))
  }

  test("equal timestamps do not satisfy the strictly-after contract") {
    val out = run((5L, "view", 7L), (5L, "click", 7L))
    assert(out === Array((5L, Some(us(7)), None, None, 1L)))
  }

  test("plan: one hash shuffle, no join, no per-event window") {
    val df = Funnel.funnel(
      Seq((1L, "view", ts(1L))).toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Window"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      "funnel must cost exactly one agg shuffle on the user key")
  }
}
