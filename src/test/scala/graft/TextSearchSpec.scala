package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.search.TextSearch

/** Keyword + hybrid retrieval invariants (the exact scores are
  * oracle-checked by search_bm25 / search_vsm_cosine / search_hybrid_rrf;
  * these are the structural properties the hash compare can't express).
  */
class TextSearchSpec extends GraftSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)
  private def queries = Seq(
    ("q1", "hash join merge"),
    ("q2", "slow scan filter")).toDF("query_id", "query_text")

  test("bm25: every hit contains at least one query term, ranks are dense from 1") {
    val hits = TextSearch.bm25(docs, "doc_id", "text", queries, 10)
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .collect()
    assert(hits.nonEmpty)
    val qterms = Map("q1" -> Set("hash", "join", "merge"), "q2" -> Set("slow", "scan", "filter"))
    hits.foreach { r =>
      val terms = r.getAs[String]("text").trim.split("\\s+").toSet
      assert(terms.intersect(qterms(r.getAs[String]("query_id"))).nonEmpty,
        s"hit without any query term: $r")
    }
    val byQ = hits.groupBy(_.getAs[String]("query_id"))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("bm25: a term absent from the corpus contributes nothing (no NaN, no rows)") {
    val ghost = Seq(("g", "zzzunseen")).toDF("query_id", "query_text")
    assert(TextSearch.bm25(docs, "doc_id", "text", ghost, 10).count() == 0)
    // Mixed query: ghost term must not change the ranking of the real terms.
    val mixed = Seq(("m", "hash join zzzunseen")).toDF("query_id", "query_text")
    val real = Seq(("m", "hash join")).toDF("query_id", "query_text")
    val a = TextSearch.bm25(docs, "doc_id", "text", mixed, 10)
      .select("doc_id", "rk").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = TextSearch.bm25(docs, "doc_id", "text", real, 10)
      .select("doc_id", "rk").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("vsm cosine: scores are within [0, 1] and self-query of a doc's own text ranks it first") {
    val scores = TextSearch.vsmCosine(docs, "doc_id", "text", queries, 10)
      .select(min(col("score")), max(col("score"))).head()
    assert(scores.getDouble(0) >= 0.0 && scores.getDouble(1) <= 1.0 + 1e-9)
    // Query with the full text of doc 3: that doc must rank first (its
    // score is not exactly 1 — query terms weigh idf once, the doc tf·idf).
    val d3 = docs.filter(col("doc_id") === 3).select("text").head().getString(0)
    val self = Seq(("self", d3)).toDF("query_id", "query_text")
    val top = TextSearch.vsmCosine(docs, "doc_id", "text", self, 1).head()
    assert(top.getAs[Long]("doc_id") == 3L, s"self-query should retrieve itself first, got $top")
  }

  test("hybrid rrf: candidate sets of the two scorers coincide; fusion keeps their union") {
    // a cap far past any candidate-set size stands in for the full ranking
    val b = TextSearch.bm25(docs, "doc_id", "text", queries, 1000000)
      .select("query_id", "doc_id")
    val v = TextSearch.vsmCosine(docs, "doc_id", "text", queries, 1000000)
      .select("query_id", "doc_id")
    assert(b.exceptAll(v).isEmpty && v.exceptAll(b).isEmpty,
      "BM25 and VSM must rank the same candidate set (docs sharing >=1 term)")
    val fused = TextSearch.hybridRrf(docs, "doc_id", "text", queries, 10)
    // rrf is maximized by the doc ranked best under both scorers; a doc
    // ranked 1st by both must be the fused 1st.
    val both1 = TextSearch.bm25(docs, "doc_id", "text", queries, 1)
      .join(TextSearch.vsmCosine(docs, "doc_id", "text", queries, 1), Seq("query_id", "doc_id"))
      .select("query_id", "doc_id")
    val fused1 = fused.filter(col("rk") === 1).select("query_id", "doc_id")
    assert(both1.exceptAll(fused1).isEmpty,
      "a doc that is rank-1 under both scorers must be fused rank-1")
  }

  test("capped RRF (candMult=100) fuses to exactly the full-ranking top-10") {
    // The scale contract: ranking each scorer only to k' = 100·k (so
    // WindowGroupLimit applies) must not change the fused top-k — a doc
    // outside both top-k' lists cannot outscore one inside (its rrf is
    // < 2/(60+k')), and the fixtures have no adversarial interleaving
    // past rank 1000. Capped and effectively-uncapped fusion must agree
    // on every output column.
    val capped = TextSearch.hybridRrf(docs, "doc_id", "text", queries, 10, candMult = 100)
    val full = TextSearch.hybridRrf(docs, "doc_id", "text", queries, 10, candMult = 1000000)
    assert(capped.exceptAll(full).isEmpty && full.exceptAll(capped).isEmpty,
      "capped RRF must reproduce the full-ranking fused top-10 on the fixtures")
  }

  test("bundled FromParts scorers are row-identical to the unbundled paths") {
    // SparkEntry serves vsm/rrf from pre-materialized doc-side frames;
    // this differential pins that the split introduced no arithmetic
    // or ordering drift against the original single-call formulation.
    val (post, stats) = TextSearch.buildIndex(docs, "doc_id", "text")
    val (vIdf, weighted, docNorm) = TextSearch.vsmDocSide(post, stats)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"doc_id", $"rk").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val vsmA = rows(TextSearch.vsmCosineFrom(post, stats, queries, 10))
    val vsmB = rows(TextSearch.vsmCosineFromParts(vIdf, weighted, docNorm, queries, 10))
    assert(vsmA === vsmB)
    val bmA = rows(TextSearch.bm25From(post, stats, queries, 10))
    val bmB = rows(TextSearch.bm25FromIdf(post, TextSearch.bm25Idf(post, stats), queries, 10))
    assert(bmA === bmB)
    val rrfA = rows(TextSearch.hybridRrfFrom(post, stats, queries, 10))
    val rrfB = rows(TextSearch.hybridRrfFromParts(post,
      TextSearch.bm25Idf(post, stats), vIdf, weighted, docNorm, queries, 10))
    assert(rrfA === rrfB)
  }
}
