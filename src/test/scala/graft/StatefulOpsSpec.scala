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
    // single input file -> single batch -> one Update row per user, plus
    // possibly an identical re-emission when idle-key expiry flushes the
    // final aggregate in the trailing no-data batch -> distinct
    val stream = spark.table("user_aggs")
      .select($"user_id", $"n_events", round($"sum_value", 4).as("sum_value"))
      .distinct()
    val batch = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
    assert(stream.count() === batch.count())
    assert(stream.except(batch).count() === 0)
  }

  test("transformWithState per-user stats equal the batch groupBy (Spark 4 state API)") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StatefulOps.streamUserStatsTws(spark, sfDir, "user_stats_tws")
      q.processAllAvailable()
      q.stop()
      // Update-mode emissions are monotone in n_events → final = max
      val stream = spark.table("user_stats_tws")
        .groupBy($"user_id")
        .agg(max_by(struct($"n_events", $"sum_value"), $"n_events").as("w"))
        .select($"user_id", $"w.n_events".as("n_events"),
          round($"w.sum_value", 4).as("sum_value"))
      val batch = events.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
      assert(stream.count() === batch.count())
      assert(stream.except(batch).count() === 0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState ListState+MapState activity profile equals the batch groupBy") {
    withRocksDb {
      val q = StatefulOps.streamUserActivityTws(spark, sfDir, "user_activity_tws")
      q.processAllAvailable()
      // plan pin: the v2 stateful operator must actually be
      // TransformWithStateExec (not a fallback to the v1 operator)
      val baos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(baos)) { q.explain() }
      assert(baos.toString.contains("TransformWithState"),
        s"expected TransformWithStateExec in the streaming plan:\n${baos.toString.take(2000)}")
      q.stop()
      // Update-mode emissions are monotone in n_events → final = max
      val stream = spark.table("user_activity_tws")
        .groupBy($"user_id")
        .agg(max_by(struct($"n_events", $"n_types", $"n_purchases", $"sum_purchases"),
          $"n_events").as("w"))
        .select($"user_id", $"w.n_events".as("n_events"), $"w.n_types".as("n_types"),
          $"w.n_purchases".as("n_purchases"),
          round($"w.sum_purchases", 4).as("sum_purchases"))
      val batch = events.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"event_type").as("n_types"),
          count(when($"event_type" === "purchase", 1)).as("n_purchases"),
          round(coalesce(sum(when($"event_type" === "purchase", $"value")), lit(0.0)), 4)
            .as("sum_purchases"))
      assert(stream.count() === batch.count())
      assert(stream.except(batch).count() === 0 && batch.except(stream).count() === 0)
    }
  }

  test("transformWithState event-time timers flush idle keys and clear their state") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, Long)]
      val src = ms.toDF().toDF("user_id", "ts_sec")
        .withColumn("ts", timestamp_seconds($"ts_sec"))
      val q = StatefulOps.streamIdleFlushTws(src, "idle_flush_tws",
        watermark = "10 minutes", idleMs = 60L * 60 * 1000)
      val t0 = 1700000000L
      ms.addData((1L, t0), (1L, t0 + 60), (2L, t0))
      q.processAllAvailable()
      // nothing can have expired yet: watermark is still at batch-1 max - 10 min
      assert(spark.table("idle_flush_tws").count() === 0)
      // a much-later event pushes the watermark past user 1/2's
      // last-seen + 1h timers; user 99's own timer stays in the future
      ms.addData((99L, t0 + 5 * 3600))
      q.processAllAvailable()
      q.stop()
      val flushed = spark.table("idle_flush_tws")
        .select($"user_id", $"n_events").as[(Long, Long)].collect().toMap
      assert(flushed === Map(1L -> 2L, 2L -> 1L),
        s"users 1 and 2 must flush exactly once with their full counts, got $flushed")
    }
  }

  test("timer expiry set at each watermark crossing equals a batch-computed oracle") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val idleMs = 3600L * 1000
      val delayMs = 600L * 1000
      val base = 1700000000000L
      // 40 keys with staggered last-seen times, all inside a 45-minute
      // span: the first batch's watermark (max ts − 10 min) sits below
      // every timer (last + 1 h), so nothing may fire early.
      val fed = for {
        u <- 1L to 40L
        i <- 0L until (u % 5 + 1)
      } yield (u, base + u * 60000L + i * 10000L)
      val ms = MemoryStream[(Long, Long)]
      val src = ms.toDF().toDF("user_id", "ts_ms")
        .withColumn("ts", timestamp_millis($"ts_ms"))
      val q = StatefulOps.streamIdleFlushTws(src, "idle_flush_oracle",
        watermark = "10 minutes", idleMs = idleMs)
      try {
        ms.addData(fed: _*)
        q.processAllAvailable()
        assert(spark.table("idle_flush_oracle").count() === 0,
          "no timer may fire before the watermark crosses it")

        // THE batch oracle frame: per-key event count and timer
        // (last-seen + idle) from the exact rows fed to the stream.
        val oracle = fed.toDF("user_id", "ts_ms").groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            (max($"ts_ms") + idleMs).as("expired_at_ms"))
        val timers = oracle.select($"expired_at_ms").as[Long].collect().sorted
        // a watermark strictly between two adjacent timers: exactly the
        // keys at-or-below it must flush, never one more or one fewer
        val tA = timers(timers.length / 2 - 1)
        val tB = timers(timers.length / 2)
        assert(tB - tA >= 2, "fixture spacing guarantees a gap")
        val wm1 = tA + (tB - tA) / 2
        ms.addData((9001L, wm1 + delayMs)) // fresh key; sets watermark = wm1
        q.processAllAvailable()
        val emitted1 = spark.table("idle_flush_oracle")
          .select($"user_id", $"n_events", $"expired_at_ms")
        val want1 = oracle.filter($"expired_at_ms" <= wm1)
        assert(emitted1.count() === want1.count(),
          s"watermark $wm1 must flush exactly the ${want1.count()} keys whose timers it crossed")
        assert(emitted1.except(want1).isEmpty && want1.except(emitted1).isEmpty)

        // push the watermark past every remaining timer (including the
        // first pusher's own): the full oracle set must now have fired,
        // each key exactly once, at exactly its registered expiry.
        ms.addData((9002L, wm1 + delayMs + 100L * 86400000L))
        q.processAllAvailable()
        val wantAll = oracle.unionByName(
          Seq((9001L, 1L, wm1 + delayMs + idleMs))
            .toDF("user_id", "n_events", "expired_at_ms"))
        val emittedAll = spark.table("idle_flush_oracle")
          .select($"user_id", $"n_events", $"expired_at_ms")
        assert(emittedAll.count() === wantAll.count(), "each key flushes exactly once")
        assert(emittedAll.except(wantAll).isEmpty && wantAll.except(emittedAll).isEmpty)
      } finally q.stop()
    }
  }

  test("transformWithState lowers to TransformWithStateExec (streaming plan pin)") {
    withRocksDb {
      val q = StatefulOps.streamUserStatsTws(spark, sfDir, "tws_plan_pin")
      try {
        q.processAllAvailable()
        val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan.toString
        assert(exec.contains("TransformWithState"),
          "expected the v2 stateful operator node in the executed micro-batch plan")
        // the stateful exchange must be the keyed hash partitioning the
        // state store requires — state rows live with their key forever
        assert(exec.contains("REQUIRED_BY_STATEFUL_OPERATOR"),
          "the key exchange must be the stateful operator's required distribution")
      } finally q.stop()
    }
  }

  test("streaming funnel: final per-user emission equals the batch funnel") {
    val stages = Seq("view", "click", "purchase")
    val q = StatefulOps.streamFunnel(spark, sfDir, "funnel_stream", stages)
    q.processAllAvailable()
    q.stop()
    // emissions are monotone in reached → the max-reached row per user
    // is the final state (what a last-write-wins sink keeps)
    val stream = spark.table("funnel_stream")
      .groupBy($"user_id")
      .agg(max_by(struct($"reached", $"times"), $"reached").as("w"))
      .select($"user_id", $"w.reached".as("reached"),
        get($"w.times", lit(0)).as("t1"),
        get($"w.times", lit(1)).as("t2"),
        get($"w.times", lit(2)).as("t3"))
    val batch = graft.operators.Funnel.funnel(
      events, "user_id", "event_type", "ts", stages)
      .filter($"reached" > 0) // the stream never emits a 0-stage user
      .select($"user_id", $"reached", $"t1", $"t2", $"t3")
    assert(stream.count() === batch.count())
    assert(stream.except(batch).count() === 0 && batch.except(stream).count() === 0)
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

  test("flatMapGroupsWithState emits closed + watermark-expired sessions") {
    val q = StatefulOps.streamSessionsFlatMap(spark, sfDir, "sessions_fm")
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("sessions_fm")
      .select($"user_id", $"session_start_sec", $"session_end_sec", $"n_events")
    // Exact micros-level batch oracle: a session is emitted if a later
    // event closed it (every non-last session), or if the final watermark
    // (max event ms - 30 min delay) passed its event-time timeout
    // (last event ms + gap) in the trailing no-data batch.
    val gapUs = 30L * 60 * 1000000
    val gapMs = 30L * 60 * 1000
    val gapSec = 30L * 60
    val ev = events.select($"user_id", unix_micros($"ts").as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us")
    val sess = ev
      .withColumn("prev", lag($"ts_us", 1).over(w))
      .withColumn("new_sess", when($"prev".isNull || $"ts_us" - $"prev" >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum($"new_sess").over(w))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts_us").as("start_us"), max($"ts_us").as("last_us"), count(lit(1)).as("n_events"))
    val wmMs = ev.agg(max($"ts_us")).head().getLong(0) / 1000L - 30L * 60 * 1000
    val lastSid = sess.groupBy($"user_id").agg(max($"sid").as("max_sid"))
    val expected = sess.join(lastSid, "user_id")
      .filter($"sid" < $"max_sid" || expr("last_us div 1000") + gapMs < wmMs)
      .select($"user_id",
        expr("start_us div 1000000").as("session_start_sec"),
        (expr("last_us div 1000000") + gapSec).as("session_end_sec"),
        $"n_events")
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

  test("stream-static enrichment equals the batch LEFT join") {
    // dim deliberately misses ~1/3 of the keys: the stream side is a
    // LEFT join, so unmatched events must survive with a null segment —
    // a dim covering every key (the old test) couldn't catch a
    // regression to inner-join semantics.
    val dim = events.select($"user_id").distinct()
      .filter(pmod($"user_id", lit(3)) =!= 2)
      .withColumn("segment", pmod($"user_id", lit(3)))
    val q = StatefulOps.streamEnrichWithDim(spark, sfDir, dim, "user_id", "enriched")
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("enriched").select($"event_id", $"user_id", $"segment")
    val batch = events.join(dim, Seq("user_id"), "left")
      .select($"event_id", $"user_id", $"segment")
    assert(stream.count() === batch.count())
    assert(stream.filter($"segment".isNull).count() > 0)
    assert(stream.except(batch).count() === 0 && batch.except(stream).count() === 0)
  }

  test("streaming as-of enrichment equals the batch events_asof query") {
    val q = StatefulOps.streamAsofViews(spark, sfDir, "asof_views")
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("asof_views")
    val batch = SparkEntry.queries("events_asof")(spark, sfDir)
    assert(stream.count() === batch.count() && batch.count() > 0)
    assert(stream.except(batch).count() === 0 && batch.except(stream).count() === 0,
      "single-batch streaming as-of must reproduce the batch union+window result " +
        "row-for-row, including the strict-tie and max-event-id contracts")
  }

  test("driver entry point returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: oracle keys exactly match query keys") {
    // a typo'd oracle key would surface as a silent no-output FAIL in
    // the driver's correctness gate — pin the invariant here instead
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
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
