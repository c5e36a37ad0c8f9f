package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextExpressions, VectorExpressions}
import graft.model.Tables

/** The SQL front door: fixture tables as temp views + `spark.sql`
  * producing the same results as the DataFrame API, with the graft
  * native expressions callable from SQL (registered either through
  * [[GraftExtensions]] at session build or ensureRegistered at runtime).
  */
class SqlSurfaceSpec extends GraftSpec {
  import spark.implicits._

  test("spark.sql over temp views equals the DataFrame form") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("li")
    val sql = spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE) AS qty
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val df = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum($"l_quantity".cast("decimal(14,2)")), 2).cast("double").as("qty"))
      .orderBy($"l_returnflag")
    assert(sql.collect().toSeq === df.collect().toSeq)
  }

  test("graft native functions are SQL-callable") {
    VectorExpressions.ensureRegistered(spark)
    TextExpressions.ensureRegistered(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      "SELECT vec_id, round(sqrt(graft_l2sq(embedding, embedding)), 4) AS z FROM emb ORDER BY vec_id LIMIT 5")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql.forall(_._2 == 0.0))
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_v")
    val lang = spark.sql(
      "SELECT graft_lang_id(text) AS lang, count(*) AS n FROM docs_v GROUP BY 1")
    assert(lang.count() > 0)
    val viaDf = graft.textual.TextAnalysis.langId($"text")
    val dfCounts = Tables.documents(spark, sfDir).select(viaDf.as("lang"))
      .groupBy($"lang").count()
    assert(lang.withColumnRenamed("n", "count").except(dfCounts).count() === 0)
  }

  test("graft_bloom_contains is SQL-callable with hex-literal sketch bytes") {
    graft.functions.BloomExpressions.ensureRegistered(spark)
    val bf = Seq(42L, 7L).toDF("id").stat.bloomFilter("id", 2L, 0.01)
    val hex = graft.functions.BloomExpressions.serialize(bf)
      .map(b => f"$b%02X").mkString
    val out = spark.sql(
      s"SELECT graft_bloom_contains(42L, X'$hex') AS hit42, " +
        s"graft_bloom_contains(424242L, X'$hex') AS hitMiss")
      .collect()(0)
    assert(out.getBoolean(0) === true, "inserted key must probe true via SQL")
    // 424242 may be a false positive in principle, but at fpp 0.01 with
    // 2 keys the sketch is large enough that this is deterministic-safe
    assert(out.getBoolean(1) === false)
  }
}
