package graft

import org.apache.spark.sql.functions._

import graft.operators.SafeTransform

class SafeTransformSpec extends GraftSpec {
  import spark.implicits._

  test("fallible transform: failures become casualties, survivors keep going") {
    val df = Seq((1L, "ok-a"), (2L, "boom"), (3L, "ok-b"), (4L, "boom")).toDF("id", "payload")
    val f: String => String = {
      case "boom" => throw new RuntimeException("decode error")
      case s      => s.toUpperCase
    }
    val (survivors, casualties) = SafeTransform.applyWithCasualties[String, String](
      df, "id", "payload", "decoded", f)
    assert(survivors.select($"id", $"decoded").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "OK-A"), (3L, "OK-B")))
    assert(casualties.as[Long].collect().toSet === Set(2L, 4L))
  }

  test("SQL surface: graft functions callable from spark.sql after registration") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    graft.functions.TextExpressions.ensureRegistered(spark)
    graft.functions.HashedShingles.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_l2sq(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(4.0 AS FLOAT), CAST(6.0 AS FLOAT))) AS d,
        |       graft_lang_id('the cat of the house') AS lang,
        |       size(graft_shingles('a b c d', 3)) AS n_shingles,
        |       graft_simhash64('hello world') AS sig""".stripMargin).head()
    assert(r.getDouble(0) === 25.0)
    assert(r.getString(1) === "en")
    assert(r.getInt(2) === 2)
    // deterministic signature
    assert(r.getLong(3) === spark.sql("SELECT graft_simhash64('hello world')").head().getLong(0))
  }

  test("approx_count_distinct stays within 5% of exact on fixture data") {
    val events = graft.model.Tables.events(spark, sfDir)
    val exact = events.select(count_distinct($"user_id")).head().getLong(0)
    val approx = events.select(approx_count_distinct($"user_id")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
