package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.index.CollectionCatalog
import graft.textual.TextAnalysis

class TextAnalysisSpec extends GraftSpec {
  import spark.implicits._

  test("rolling hash matches hand-computed polynomial") {
    // "ab": ((0*31+97)*31+98) % p = 3105
    val v = Seq("ab").toDF("t").select(TextFunctions.rollingHash($"t")).head().getLong(0)
    assert(v === 3105L)
  }

  test("word shingles: fewer than n tokens yields empty, duplicates collapse") {
    val df = Seq("a b", "a b c a b c a b c").toDF("t")
      .select(TextFunctions.wordShingles($"t", 3).as("sh"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0).isEmpty)
    // 7 positions but only 3 distinct shingles (a b c / b c a / c a b)
    assert(rows(1).getSeq[String](0).toSet === Set("a b c", "b c a", "c a b"))
  }

  test("quality score stays in [0,1]; empty text scores deterministically") {
    val df = TextAnalysis.qualityFeatures(
      Seq((1L, "plain healthy words in a sentence"), (2L, "!!! ??? ###"), (3L, "x")).toDF("doc_id", "text"),
      "text")
    val scores = df.select($"quality_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("langId picks the stopword-dominant language, und for no hits") {
    graft.functions.TextExpressions.ensureRegistered(spark)
    val df = Seq("the cat of the house and the dog", "der hund und die katze ist da",
      "zzz qqq www").toDF("text")
      .select(TextAnalysis.langId($"text").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "de", "und"))
    // native expression and pure-built-in form agree on real data
    val docs = graft.model.Tables.documents(spark, sfDir)
    val diff = docs.select(TextAnalysis.langId($"text").as("a"), TextAnalysis.langIdHof($"text").as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff === 0L)
  }

  test("token counts: bpe-ish regex counts symbols separately") {
    val df = Seq("hello world42 a-b!").toDF("text")
    val r = graft.textual.TextAnalysis.tokenCounts(df, "text").head()
    assert(r.getLong(1) === 3L) // ws tokens
    // hello | world | 42 | a | - | b | !
    assert(r.getLong(2) === 7L)
  }

  test("repetition signals: template spam scores high, varied text low") {
    graft.functions.TextExpressions.ensureRegistered(spark)
    val df = Seq(
      (1L, "buy now buy now buy now buy now"), // one bigram repeated
      (2L, "the quick brown fox jumps over dogs")) // all bigrams unique
    .toDF("doc_id", "text")
    val out = graft.textual.TextAnalysis.repetitionSignals(df, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1: 7 bigrams, "buy now" ×4 + "now buy" ×3 — all duplicated.
    assert(out(1L) === ((7L, 0.5714, 1.0)))
    // doc 2: 6 bigrams, all distinct.
    assert(out(2L) === ((6L, 0.1667, 0.0)))
    // single-token doc has no bigrams -> omitted (oracle contract)
    val one = graft.textual.TextAnalysis.repetitionSignals(
      Seq((9L, "solo")).toDF("doc_id", "text"), "text")
    assert(one.count() === 0)
  }

  test("pii masking: rule order keeps emails whole, digits fall through") {
    val df = Seq(
      "call 12-345-678-9012 or mail a.b+c@ex-1.org id 77",
      "no pii here").toDF("t")
    val out = df.select(graft.textual.Redaction.maskPii($"t")).as[String].collect()
    assert(out(0) === "call [PHONE] or mail [EMAIL] id [NUM]")
    assert(out(1) === "no pii here")
    // masking is idempotent: a masked string has no maskable runs left
    val twice = df.select(graft.textual.Redaction.maskPii(
      graft.textual.Redaction.maskPii($"t"))).as[String].collect()
    assert(twice.toSeq === out.toSeq)
  }

  test("collection name format/parse round-trip") {
    val df = Seq((3L, 3000L)).toDF("i", "p")
      .select(CollectionCatalog.collectionName($"i", $"p").as("name"))
      .select($"name", CollectionCatalog.parsePages($"name").as("pages"))
    val r = df.head()
    assert(r.getString(0) === "collection_0003_3000pages")
    assert(r.getLong(1) === 3000L)
    // invalid name -> null (the reference's try/except semantics)
    val bad = Seq("garbage").toDF("name").select(CollectionCatalog.parsePages($"name")).head()
    assert(bad.isNullAt(0))
  }

  test("prefix views are monotone: view(n) subset of view(n+step)") {
    val base = CollectionCatalog.seqFromId(
      graft.model.Tables.documents(spark, sfDir), "doc_id")
    val v1 = CollectionCatalog.prefixView(base, 100)
    val v2 = CollectionCatalog.prefixView(base, 200)
    assert(v1.count() === 100)
    assert(v2.count() === 200)
    assert(v1.select("doc_id").except(v2.select("doc_id")).count() === 0)
  }
}
