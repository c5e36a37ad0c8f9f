package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomExpressions

class BloomDenylistSpec extends GraftSpec {
  import spark.implicits._

  test("no false negatives: every inserted key probes true (codegen path)") {
    val deny = (0L until 500L).map(_ * 7L).toDF("id")
    val bf = deny.stat.bloomFilter("id", 500L, 0.03)
    val bytes = BloomExpressions.serialize(bf)
    BloomExpressions.ensureRegistered(spark)
    val missed = deny.filter(!BloomExpressions.mightContain($"id", bytes)).count()
    assert(missed === 0L, "a Bloom filter must never report an inserted key absent")
  }

  test("fpp holds roughly: non-members mostly probe false") {
    val deny = (0L until 1000L).toDF("id")
    val bf = deny.stat.bloomFilter("id", 1000L, 0.03)
    val bytes = BloomExpressions.serialize(bf)
    val nonMembers = (1000000L until 1010000L).toDF("id")
    val falsePos = nonMembers
      .filter(BloomExpressions.mightContain($"id", bytes)).count()
    // 10k probes at fpp 0.03 → expect ~300; 3x headroom kills flake risk
    assert(falsePos < 1000L, s"false-positive rate implausibly high: $falsePos/10000")
  }

  test("null keys probe null (three-valued logic preserved)") {
    BloomExpressions.ensureRegistered(spark)
    val bf = Seq(1L).toDF("id").stat.bloomFilter("id", 1L, 0.03)
    val bytes = BloomExpressions.serialize(bf)
    val out = Seq(Some(1L), None).toDF("id")
      .select(BloomExpressions.mightContain($"id", bytes).as("hit")).collect()
    assert(out(0).getBoolean(0) === true && out(1).isNullAt(0))
  }

  test("prefilter + exact verify equals the plain anti-join on the fixture") {
    val docs = graft.model.Tables.documents(spark, sfDir)
    val deny = docs.filter($"doc_id" % 3 === 0).select($"doc_id")
    val bf = deny.stat.bloomFilter("doc_id", 1000L, 0.03)
    val bytes = BloomExpressions.serialize(bf)
    val flagged = docs.withColumn("maybe",
      BloomExpressions.mightContain($"doc_id", bytes))
    val viaBloom = flagged.filter(!$"maybe").select($"doc_id")
      .unionByName(flagged.filter($"maybe").join(deny, Seq("doc_id"), "left_anti")
        .select($"doc_id"))
    val exact = docs.join(deny, Seq("doc_id"), "left_anti").select($"doc_id")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty,
      "the bloom path must be result-invisible: exactly the anti-join output")
  }

  test("the sketch prunes: clean rows skip the verify join entirely") {
    val docs = graft.model.Tables.documents(spark, sfDir)
    val deny = docs.filter($"doc_id" % 10 === 0).select($"doc_id")
    val nDeny = deny.count()
    val bf = deny.stat.bloomFilter("doc_id", math.max(nDeny, 1L), 0.03)
    val bytes = BloomExpressions.serialize(bf)
    val nFlagged = docs
      .filter(BloomExpressions.mightContain($"doc_id", bytes)).count()
    val nDocs = docs.count()
    assert(nFlagged >= nDeny, "all true members must be flagged")
    assert(nFlagged < nDocs,
      "the prefilter must exclude some rows, or the verify join sees the whole corpus")
  }
}
