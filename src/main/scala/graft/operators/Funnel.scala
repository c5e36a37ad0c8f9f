package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how far each user progresses through a
  * required event sequence (e.g. view → click → purchase), where each
  * stage must occur STRICTLY AFTER the previous stage's first
  * completion — the product-analytics operator behind conversion
  * dashboards (Amplitude/Mixpanel funnels, ClickHouse windowFunnel).
  *
  * Semantics: t1 = min ts of stage-1 events; t_k = min ts of stage-k
  * events with ts > t_{k-1}. `reached` = number of stages completed.
  * Strict ordering (not mere presence) is the point: a purchase before
  * the first view does not convert.
  *
  * Shape: one filter+pivot-style conditional aggregation per user —
  * a SINGLE hash shuffle on user_id, no self-joins, no windows over
  * the event table (the k-stage recurrence folds inside one aggregate
  * because min-over-threshold composes: t_k needs only t_{k-1} and the
  * per-user sorted stage-k times, and we keep ALL stage times per user
  * as two tiny aggregated arrays, never re-scanning events). State per
  * user = its own stage event times only; at 100 TB this is the same
  * agg-shuffle budget as a groupBy count.
  */
object Funnel {

  /** Per-user funnel over `stages` (event_type values, in order).
    * Returns (user, t1..tk as epoch-micros, reached).
    *
    * Implementation: conditional `min` can't express "min after a
    * computed threshold" in one builtin agg, so each user aggregates
    * its per-stage sorted time arrays (collect_list + array_sort —
    * bounded by that user's own stage events), then a literal fold
    * across the k stages picks t_k = first element > t_{k-1}. The fold
    * is k filter() calls over tiny arrays — codegen'd, no UDF.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      array_sort(collect_list(when(col(typeCol) === st, unix_micros(col(tsCol)))))
        .as(s"ts_$i")
    }
    val agged = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol))
      .agg(perStage.head, perStage.tail: _*)
    // fold: t_0 = first stage-0 time; t_k = first stage-k time > t_{k-1}
    val ts = stages.indices.foldLeft(Seq.empty[org.apache.spark.sql.Column]) { (acc, i) =>
      val prior = acc.lastOption
      val candidates = prior match {
        case None => col(s"ts_$i")
        case Some(p) => filter(col(s"ts_$i"), x => x > p)
      }
      // get() (not element_at): out-of-range must be null, not an ANSI
      // error — an empty candidate list means "stage not reached"
      acc :+ get(candidates, lit(0))
    }
    val named = ts.zipWithIndex.map { case (c, i) => c.as(s"t${i + 1}") }
    val reached = ts.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _).cast("long").as("reached")
    agged.select((col(userCol) +: named :+ reached): _*)
  }
}
