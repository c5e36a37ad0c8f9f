package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-projection LSH for L2 — the engine-portable ANN
  * variant: projection signs are ±1 derived from SplitMix64 of the
  * (table, dim) index, so the entire index — buckets included — is a
  * pure function of the data, reproducible in any engine (the DuckDB
  * oracle re-derives it; MLlib's [[LshIndex]] is seeded but its RNG
  * stream is JVM-internal, hence rows-only checks).
  *
  * Family: h_t(v) = floor(<v, r_t> / w) with r_t ∈ {±1}^d. Rademacher
  * projections concentrate like gaussians (Achlioptas 2003, "Database-
  * friendly random projections" — the standard sparse/sign JL variant),
  * and a power-of-two w keeps the division exact in IEEE, so bucket
  * boundaries cannot diverge between engines.
  *
  * Scale shape: bucketing is a narrow per-row projection (codegen'd
  * left-deep add chain, no shuffle); search joins the tiny bucketized
  * query side to the bucketized collection on (table, bucket) — an
  * equi-join, never a cross join — then ranks candidates exactly.
  */
object RpLsh {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** ±1 sign of projection table `t`, dimension `i` (0-based). */
  def sign(t: Int, i: Int): Double =
    if ((splitmix64(t * 1000003L + i) & 1L) == 0L) 1.0 else -1.0

  /** All signs of table `t` for a `dim`-dimensional space. */
  def signs(t: Int, dim: Int): Seq[Double] = (0 until dim).map(sign(t, _))

  /** <v, r_t> as a codegen'd left-deep sum — identical op order to a
    * sequential fold (and to DuckDB's list_sum), so both engines see the
    * same double.
    */
  def projection(vec: Column, t: Int, dim: Int): Column =
    (0 until dim).map { i =>
      element_at(vec, i + 1).cast("double") * lit(sign(t, i))
    }.reduce(_ + _)

  /** One row per (id, table, bucket). `w` MUST be a power of two so the
    * division is exact (bucket parity across engines).
    */
  def bucketize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      numTables: Int,
      dim: Int,
      w: Double): DataFrame = {
    require(w > 0 && (math.log(w) / math.log(2)).isWhole, s"w must be a power of two, got $w")
    val tb = array((0 until numTables).map { t =>
      struct(lit(t).as("t"), floor(projection(col(vecCol), t, dim) / lit(w)).cast("long").as("bkt"))
    }: _*)
    df.select(col(idCol), col(vecCol), explode(tb).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.t").as("t"), col("tb.bkt").as("bkt"))
  }

  /** ANN top-k: bucket-join candidates on (table, bucket), dedupe, exact
    * L2 rank with (dist, id) tie-break. Queries with fewer than k
    * candidates return fewer rows (the reference behaves the same when a
    * collection holds < k docs).
    */
  def topK(
      queries: DataFrame, // (qid, qemb)
      collection: DataFrame, // (idCol, embCol)
      k: Int,
      numTables: Int,
      dim: Int,
      w: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val qb = bucketize(queries, "qid", "qemb", numTables, dim, w)
    val cb = bucketize(collection, idCol, embCol, numTables, dim, w)
    val cand = broadcast(qb).join(cb, Seq("t", "bkt"))
      .select(col("qid"), col("qemb"), col(idCol), col(embCol))
      .dropDuplicates("qid", idCol)
    val wK = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col(idCol).asc)
    cand
      .withColumn("dist", sqrt(graft.functions.VectorExpressions.l2Sq(col("qemb"), col(embCol))))
      .withColumn("rk", row_number().over(wK))
      .filter(col("rk") <= k)
      .select(col("qid"), col(idCol), col("rk").cast("long").as("rk"),
        round(col("dist"), 4).as("dist"))
  }
}
