package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items sketch as a typed Aggregator.
  *
  * The scale path for "what are the heavy tokens/urls/users" questions
  * where a full `groupBy(item).count` would shuffle a corpus-sized key
  * space: the summary is O(m) per partition, merges associatively
  * (Agarwal et al., "Mergeability of Summaries", PODS'12 — MG summaries
  * merge with no error inflation), and guarantees
  *
  *   - est(x) ≤ true(x)                      (never overcounts)
  *   - true(x) − est(x) ≤ n/(m+1)            (n = stream length)
  *   - every x with true(x) > n/(m+1) is present in the summary.
  *
  * When m ≥ |distinct items| no decrement ever fires and the sketch is
  * EXACT and partitioning-invariant — that regime is what the
  * token_heavy_hitters CORRECTNESS row pins against DuckDB; the
  * approximate regime (m ≪ cardinality, merge-order-dependent estimates
  * but bound-respecting) is asserted on synthetic Zipf data in
  * FrequentItemsSpec.
  */
object FrequentItems {

  /** MG summary aggregator with capacity m. Buffer is a mutable map of
    * item → counter; decrement-all is amortized O(1) per update.
    */
  final class MisraGries(m: Int) extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
    def zero: mutable.Map[String, Long] = mutable.Map.empty

    def reduce(buf: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < m => buf.update(item, 1L)
        case None =>
          // decrement every counter; drop zeros (the classic MG step)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c == 0) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
      buf
    }

    def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      if (a.size > m) {
        // subtract the (m+1)-th largest count from all; drop ≤ 0
        val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(m)
        val dead = mutable.ArrayBuffer.empty[String]
        a.keysIterator.foreach { k =>
          val c = a(k) - cut
          if (c <= 0) dead += k else a.update(k, c)
        }
        dead.foreach(a.remove)
      }
      a
    }

    def finish(buf: mutable.Map[String, Long]): Map[String, Long] = buf.toMap
    def bufferEncoder: Encoder[mutable.Map[String, Long]] = Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** The sketch as a Column aggregate (usable under groupBy too). */
  def mgSketch(itemCol: Column, m: Int): Column = udaf(new MisraGries(m)).apply(itemCol)

  /** Global sketch of `df(itemCol)` exploded to (item, n_est) rows. */
  def sketch(df: DataFrame, itemCol: String, m: Int): DataFrame =
    df.agg(mgSketch(col(itemCol), m).as("mg"))
      .select(explode(col("mg")).as(Seq("item", "n_est")))
}
