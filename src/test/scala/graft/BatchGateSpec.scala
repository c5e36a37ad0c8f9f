package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.Row

/** The batch-ANN cost-gate opt-in window under concurrency (r19 ADVICE
  * high + verdict #4). Six `ann_planner_*_multi` queries open the
  * session-global conf gate `spark.graft.ann.batchRewrite.minScanBytes`
  * around their own plan+execute; Verify and Bench run queries 4-way
  * concurrently on ONE shared session, so before `withBatchGate`'s lock
  * the windows could interleave — a sibling's restore landing mid-plan
  * declines its rewrite (a spurious rewrite_fired=false in GRADED
  * parquet), and crossed save/restore pairs could leak "0" into every
  * later plan. This spec drives the real query closures from competing
  * threads — each thread's window holds gate=0 while the others sit at
  * the session default, i.e. concurrent planning under OPPOSITE gate
  * values — and pins that (a) every row of every run still carries
  * rewrite_fired=true, and (b) the session conf always comes back to
  * its pre-query value, whether that value was absent or an explicit
  * sentinel.
  */
class BatchGateSpec extends GraftSpec {

  private val gate = "spark.graft.ann.batchRewrite.minScanBytes"
  // Driven from the PRODUCTION set (r20 ADVICE: a hand-copied list had
  // drifted to 4 of the 6 gate-mutating queries, leaving two windows
  // untested under contention) — the spec cannot fall behind SparkEntry.
  private val names = SparkEntry.gateMutatingQueries.toSeq.sorted

  private def runConcurrently(): Unit = {
    // the shared test session has no GraftSession extensions — install
    // the ANN rule for the duration (the PlannerPinSpec pattern)
    spark.experimental.extraOptimizations = Seq(graft.plans.AnnIndexRewrite)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 2).flatMap(_ => names).map { n =>
        pool.submit(new Callable[(String, Array[Row])] {
          def call(): (String, Array[Row]) =
            (n, SparkEntry.queries(n)(spark, sfDir).collect())
        })
      }
      futures.foreach { f =>
        val (n, rows) = f.get(10, TimeUnit.MINUTES)
        assert(rows.nonEmpty, s"$n: produced rows")
        assert(rows.forall(_.getAs[Boolean]("rewrite_fired")),
          s"$n: every row pins rewrite_fired=true under concurrent gate windows")
      }
    } finally {
      pool.shutdownNow()
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("concurrent batch planner queries all pin; an UNSET gate stays unset") {
    spark.conf.unset(gate)
    runConcurrently()
    assert(spark.conf.getOption(gate).isEmpty,
      "every opt-in window restored the absent gate (no leaked \"0\")")
  }

  test("concurrent batch planner queries all pin; a SET gate is restored verbatim") {
    val sentinel = "123456789"
    spark.conf.set(gate, sentinel)
    try {
      runConcurrently()
      assert(spark.conf.get(gate) === sentinel,
        "interleaved save/restore must not cross: the sentinel survives")
    } finally spark.conf.unset(gate)
  }
}
