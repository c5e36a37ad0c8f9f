package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.model.Tables

/** Product-quantization invariants (the defining properties of ADC —
  * assignment/search behavior is oracle-checked in embedding_pq_codes /
  * ann_pq_top10; these pin the algebra that makes them correct).
  *
  * Measured context (not asserted — data-dependent): with the demo
  * 10-code × 4-block seed codebook, ADC recall@10 vs exact is 0.3 at
  * sf0.01. A production IVF-PQ trains 256 k-means codes per block;
  * the plumbing is identical.
  */
class PqSpec extends GraftSpec {
  import spark.implicits._

  private val B = 4
  private val W = 16

  private def subBlocks(c: org.apache.spark.sql.Column) =
    array((0 until B).map(b => slice(c, b * W + 1, W)): _*)

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private lazy val codebook: DataFrame = {
    VectorExpressions.ensureRegistered(spark)
    val seeds = emb.groupBy($"label").agg(min($"vec_id").as("seed_id"))
    emb.select($"vec_id".as("seed_id"), $"embedding")
      .join(broadcast(seeds), Seq("seed_id"))
      .select($"label".cast("long").as("code"),
        posexplode(subBlocks($"embedding")).as(Seq("block", "csub")))
  }

  private lazy val codes: DataFrame =
    emb.select($"vec_id",
      posexplode(subBlocks($"embedding")).as(Seq("block", "sub")))
      .join(broadcast(codebook), Seq("block"))
      .select($"vec_id", $"block", $"code",
        VectorExpressions.l2Sq($"sub", $"csub").as("d2"))
      .groupBy($"vec_id", $"block")
      .agg(min(struct($"d2", $"code")).as("m"))
      .select($"vec_id", $"block", $"m.code".as("code"), $"m.d2".as("d2"))

  test("seed vectors quantize to themselves with zero distortion") {
    val seeds = emb.groupBy($"label").agg(min($"vec_id").as("vec_id"))
      .select($"vec_id", $"label".cast("long").as("label"))
    val seedCodes = codes.join(seeds, Seq("vec_id"))
    val offDiag = seedCodes.filter($"code" =!= $"label" || $"d2" =!= 0.0).count()
    assert(offDiag === 0L,
      "a codebook vector's own blocks must be its nearest codes at distance 0")
  }

  test("ADC distance IS the exact distance to the reconstructed vector") {
    // reconstruct each vector from its codes, then check that the
    // blockwise ADC sum equals l2sq(query, reconstruction) exactly
    // (same additions, same order — this is what makes lookup tables
    // a *distance*, not a heuristic)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qemb"))
    val recon = codes
      .join(broadcast(codebook), Seq("block", "code"))
      .groupBy($"vec_id")
      .agg(array_sort(collect_list(struct($"block", $"csub"))).as("parts"))
      .select($"vec_id", flatten(transform($"parts", p => p.getField("csub"))).as("remb"))
    val qd = codebook.crossJoin(broadcast(q))
      .select($"block", $"code",
        VectorExpressions.l2Sq(element_at(subBlocks($"qemb"), $"block" + 1), $"csub").as("qd2"))
    val adc = codes.join(broadcast(qd), Seq("block", "code"))
      .groupBy($"vec_id").agg(sum($"qd2").as("adc_d2"))
    val direct = recon.crossJoin(broadcast(q))
      .select($"vec_id", VectorExpressions.l2Sq($"qemb", $"remb").as("direct_d2"))
    val mismatches = adc.join(direct, Seq("vec_id"))
      .filter(abs($"adc_d2" - $"direct_d2") > 1e-9).count()
    assert(mismatches === 0L)
  }

  test("Lloyd training cuts seed-codebook distortion >20% and never regresses") {
    val (_, d) = graft.search.Pq.train(spark, emb, m = 16, w = 4, k = 64, iters = 3)
    val start = d.head.values.sum
    val end = d.last.values.sum
    assert(end <= 0.8 * start,
      s"3 Lloyd iterations should cut distortion well past 20%: $start -> $end")
    d.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.values.sum <= a.values.sum + 1e-6,
          "per-iteration distortion must be non-increasing (Lloyd invariant)")
      case _ => ()
    }
  }

  test("trained codebook is identical across two training runs (fixed-point determinism)") {
    val (cb1, _) = graft.search.Pq.train(spark, emb, m = 16, w = 4, k = 64, iters = 2)
    val (cb2, _) = graft.search.Pq.train(spark, emb, m = 16, w = 4, k = 64, iters = 2)
    assert(cb1 === cb2,
      "fixed-point Lloyd must produce bit-identical codebooks on every run")
  }

  test("trained-PQ ADC + exact re-rank reaches recall@10 >= 0.9 (vs 0.3 untrained)") {
    val pq = SparkEntry.queries("ann_pq_top10")(spark, sfDir)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qemb"))
    val exact = emb.crossJoin(broadcast(q))
      .select($"vec_id", VectorExpressions.l2Sq($"embedding", $"qemb").as("d2"))
      .orderBy($"d2", $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (pq & exact).size / 10.0
    assert(recall >= 0.9, s"trained-PQ re-rank recall@10 = $recall, expected >= 0.9")
  }

  test("codes compress 64 floats to 4 small ints: every code fits a byte") {
    val bad = codes.filter($"code" < 0 || $"code" > 255).count()
    assert(bad === 0L)
    assert(codes.groupBy($"vec_id").count().filter($"count" =!= B).count() === 0L,
      "every vector must carry exactly one code per block")
  }
}
