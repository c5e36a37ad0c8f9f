package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S2: the manifest-driven row-wise fetch pipeline
  * (download_arxiv.py:37-91), re-expressed with the side effect isolated
  * behind a pluggable fetcher:
  *
  * - F2: drop NaN/blank ids (dl:41-43);
  * - C6: strip the arXiv version suffix (`2301.12345v2` → `2301.12345`,
  *   dl:56);
  * - J4: skip already-downloaded ids via anti-join against a listing
  *   (dl:50-52's per-row existence check, done set-at-a-time);
  * - per-row error capture instead of abort (dl:70-88): a failed fetch
  *   becomes a status row, never a failed job — Spark task retries cover
  *   transient faults, the status table covers permanent ones;
  * - A8: success/skip/error tallies from the status table.
  *
  * No HTTP client ships in this environment (zero egress), so the
  * fetcher is a function parameter; tests inject a deterministic stub.
  * The reference's 0.5s politeness sleep (dl:91) is a per-partition
  * rate limit here — at 1000 executors a per-row global sleep would be
  * the bottleneck AND hammer the server; per-partition pacing bounds
  * cluster-wide request rate by (partitions × 1/interval).
  */
object ManifestIngest {

  final case class FetchResult(id: String, status: String, bytes: Int, error: String)

  /** F2 + C6: valid, version-stripped ids. */
  def cleanManifest(manifest: DataFrame, idCol: String = "arxiv_id"): DataFrame =
    manifest
      .filter(col(idCol).isNotNull && length(trim(col(idCol))) > 0)
      .select(regexp_extract(trim(col(idCol)), "^([^v]+)", 1).as("id"))
      .distinct()

  /** J4: manifest ids minus already-fetched ids. */
  def pendingDownloads(cleaned: DataFrame, existing: DataFrame): DataFrame =
    cleaned.join(existing, Seq("id"), "left_anti")

  /** Row-wise fetch with per-row error capture and per-partition pacing. */
  def fetchAll(
      spark: SparkSession,
      pending: DataFrame,
      fetch: String => Array[Byte],
      perRowDelayMs: Long = 0L): Dataset[FetchResult] = {
    import spark.implicits._
    pending.select(col("id")).as[String].mapPartitions { ids =>
      ids.map { id =>
        if (perRowDelayMs > 0) Thread.sleep(perRowDelayMs)
        try {
          val payload = fetch(id)
          FetchResult(id, "ok", payload.length, "")
        } catch {
          case e: Throwable => FetchResult(id, "error", 0, String.valueOf(e.getMessage))
        }
      }
    }
  }

  /** A8: status tallies + capped error samples (dl:31-34, 102-105). */
  def fetchStats(results: DataFrame): DataFrame =
    results
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n"),
        slice(sort_array(collect_list(when(col("error") =!= "", col("id")))), 1, 10)
          .as("sample_failed_ids"))
      .orderBy("status")
}
