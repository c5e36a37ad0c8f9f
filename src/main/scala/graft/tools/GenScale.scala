package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress fixture generator + exponent probe (round-14 verdict
  * item 3): every 100 TB claim in this repo rests on plan shape plus
  * sf0.1 measurements, so synthesize one order of magnitude more data
  * (sf1 = 10 × sf0.1) and MEASURE wall-vs-scale exponents for the
  * flagship families. A hidden superlinear term (an accidental n² join,
  * a driver-side collect that grows with n) shows up as exponent ≫ 1.
  *
  * Scaling discipline — copies must preserve the STATISTICS the
  * algorithms' costs depend on, not just row counts:
  * - documents: copy i > 0 renames every word (`w` → `wxi`, one regex
  *   pass), so each copy carries its own vocabulary. Shingle/posting
  *   distributions per copy are identical to the original and
  *   cross-copy Jaccard is 0 — duplicate DENSITY stays constant. A
  *   verbatim copy would make every doc 10-way duplicated and grow the
  *   candidate-pair count ~45× — a data-property change masquerading
  *   as algorithmic superlinearity.
  * - embeddings: copy i > 0 adds a deterministic per-copy offset vector
  *   (±0.1 per dim) — ids/geometry per copy preserved, cross-copy ties
  *   broken.
  *
  * Usage: runMain graft.tools.GenScale [srcDir] [outDir] [factor] [q...]
  * Prints a markdown table of (t_src, t_out, exponent) per query for
  * docs/CURVES.md. Fixed per-job overhead at these sizes biases the
  * exponent DOWN (t includes ~constant scheduling cost), so exponents
  * meaningfully above 1 are the red flag, not values below it.
  */
object GenScale {

  /** Flagship families per the round-13 verdict: exact kNN, inverted-
    * index near-dup, distributed connected components, segment-built
    * HNSW, winnowed span dedup.
    */
  private val defaultQueries = Seq(
    "knn_exact_multi", "dedup_ngram_jaccard", "dedup_clusters_distributed",
    "ann_hnsw_recall", "corpus_dup_spans")

  def generate(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nEmb = emb.agg(max("vec_id")).head().getLong(0) + 1
    val nDoc = docs.agg(max("doc_id")).head().getLong(0) + 1

    def offsetVec(copy: Int) = array((0 until 64).map { d =>
      lit((((copy * 1000003 + d * 7919) % 97) - 48) / 480.0f)
    }: _*)

    val embScaled = (0 until factor).map { i =>
      if (i == 0) emb
      else emb.select(
        (col("vec_id") + lit(i * nEmb)).as("vec_id"),
        zip_with(col("embedding"), offsetVec(i), (x, o) => x + o)
          .cast("array<float>").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

    val docScaled = (0 until factor).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i * nDoc)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

    embScaled.repartition(8).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/embeddings.parquet")
    docScaled.repartition(8).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/documents.parquet")
    println(s"[genscale] wrote $outDir: embeddings ${nEmb * factor}, documents ${nDoc * factor}")
  }

  /** Scale lineitem for the agg_planner_* fact-table rows: copies
    * offset l_orderkey (key uniqueness preserved; every other column
    * verbatim keeps group cardinalities and min/max profiles intact —
    * what the MV build and re-aggregation costs depend on).
    */
  def generateLineitem(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val nOk = li.agg(max("l_orderkey")).head().getLong(0) + 1
    val scaled = (0 until factor).map { i =>
      if (i == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + lit(i * nOk))
    }.reduce(_ unionByName _)
    scaled.repartition(8).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/lineitem.parquet")
    println(s"[genscale] wrote $outDir/lineitem.parquet (${factor}x)")
    // orders scales with the SAME orderkey offset base (max l_orderkey
    // == max o_orderkey on TPC-H — every order has lineitems), so the
    // scaled join stays aligned copy-for-copy
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    val ordScaled = (0 until factor).map { i =>
      if (i == 0) ord
      else ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * nOk))
    }.reduce(_ unionByName _)
    ordScaled.repartition(8).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/orders.parquet")
    println(s"[genscale] wrote $outDir/orders.parquet (${factor}x)")
    // customer rides along UNSCALED: the scaled orders copies carry
    // o_custkey verbatim, so the orders → customer FK still verifies,
    // and dim-key uniqueness is scale-independent (the fk_planner rows
    // need sharedFkConstraints to register against this dir)
    spark.read.parquet(s"$srcDir/customer.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/customer.parquet")
    println(s"[genscale] copied $outDir/customer.parquet (1x — dim claims are scale-free)")
  }

  private def time(spark: SparkSession, name: String, dir: String, runs: Int = 2): Double = {
    def once(): Double = {
      // Shared caches (e.g. the n-gram pair list) are cleared BEFORE
      // every measured run: the exponent must price the query's own
      // cache build at each scale, not a warm cache read (first run of
      // this probe timed dedup_ngram_jaccard at 0.18 s — pure cache hit).
      graft.SparkEntry.clearCaches()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm (JIT/codegen per plan shape)
    (1 to runs).map(_ => once()).min
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("target/scale/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val queries = if (args.length > 3) args.drop(3).toSeq else defaultQueries
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.builder("graft-genscale", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    graft.functions.HashedShingles.ensureRegistered(spark)
    graft.functions.TextExpressions.ensureRegistered(spark)

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/documents.parquet")))
      generate(spark, srcDir, outDir, factor)
    // pk_planner: pk_planner_distinct/_count_distinct read the shared
    // FK-constraint fixtures (orders + customer, written by
    // generateLineitem), so they need the same trigger (r19 ADVICE).
    val liFamilies =
      Seq("agg_planner", "fk_planner", "pk_planner", "sql_planner", "agg_stream")
    if (queries.exists(q => liFamilies.exists(q.startsWith)) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/lineitem.parquet")))
      generateLineitem(spark, srcDir, outDir, factor)

    println(s"| query | t(sf0.1) s | t(sf1) s | exponent |")
    println(s"|---|---|---|---|")
    val rows = queries.map { q =>
      val t1 = time(spark, q, srcDir)
      graft.SparkEntry.clearCaches()
      val tN = time(spark, q, outDir)
      graft.SparkEntry.clearCaches()
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"| $q | $t1%.2f | $tN%.2f | $exp%.2f |")
      (q, t1, tN, exp)
    }
    val bad = rows.filter(_._4 > 1.3)
    if (bad.nonEmpty)
      println(s"[genscale] SUPERLINEAR (exp > 1.3): ${bad.map(_._1).mkString(", ")}")
    else println("[genscale] all exponents <= 1.3 — no hidden superlinear term")
    spark.stop()
  }
}
