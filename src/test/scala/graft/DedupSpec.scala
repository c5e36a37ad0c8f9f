package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.model.Tables

class DedupSpec extends GraftSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  test("exact dedup keeps the lowest id per duplicated text") {
    val df = Seq((1L, "a b c"), (5L, "a b c"), (3L, " a b c "), (7L, "x y")).toDF("doc_id", "text")
    val kept = Dedup.exact(df).collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // trim-normalized: ids 1,5,3 collapse to kept_id=1 with 3 dupes
    assert(kept.toSeq === Seq((1L, 3L), (7L, 1L)))
  }

  test("minhash LSH finds exactly the all-pairs jaccard result (full recall)") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minHash(docs, 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact)
  }

  test("identical docs have identical simhash (hamming 0) and near-dups are close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words entirely unrelated content zebra xylophone")).toDF("doc_id", "text")
    val pairs = Dedup.simHash(df, maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) === 1L && r.getLong(1) === 2L && r.getInt(2) === 0))
    assert(!pairs.exists(r => r.getLong(1) === 3L))
  }

  test("embedding cosine near-dup pairs are symmetric-free (a < b) and above threshold") {
    val emb = Tables.embeddings(spark, sfDir)
    val pairs = Dedup.embeddingCosinePairs(emb, 0.4).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.4))
  }

  test("cosine LSH banding finds exactly the all-pairs result and prunes candidates") {
    // same planted input as the declared dedup_embedding_cosine query:
    // fixture vectors + perturbed copies at cosine ≈ 0.992
    val base = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val pert = array((0 until 64).map(i => lit(graft.search.RpLsh.sign(9999, i) / 64.0)): _*)
    val planted = base.unionByName(base.select(
      ($"vec_id" + lit(1000000L)).as("vec_id"),
      zip_with($"embedding", pert, (x, p) => x + p).cast("array<float>").as("embedding")))
    val exact = Dedup.embeddingCosinePairs(planted, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val banded = Dedup.cosineLshPairs(planted, 0.9, bands = 20, bitsPerBand = 16, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "planted input should contain near-dup pairs")
    assert(banded === exact)
    // the point of banding: candidate pairs ≪ all pairs
    val n = planted.count()
    val cands = Dedup.cosineLshCandidates(planted, 20, 16, 64).count()
    assert(cands * 10 < n * (n - 1) / 2,
      s"banding should prune: $cands candidates vs ${n * (n - 1) / 2} pairs")
  }

  test("incremental dedup equals the all-pairs result restricted to new×old") {
    val cut = 30L
    val thr = 0.3
    val inc = Dedup.ngramJaccardAgainst(
        docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut), 3, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // all-pairs emits id_a < id_b; normalize cross-boundary pairs to
    // (new = high side, old = low side) for comparison
    val cross = Dedup.ngramJaccardPairs(docs, 3, thr)
      .filter(($"id_a" < cut) =!= ($"id_b" < cut))
      .collect().map { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        if (a >= cut) (a, b, j) else (b, a, j)
      }.toSet
    assert(inc === cross)
    assert(inc.nonEmpty, "fixture should contain cross-boundary near-dups at this threshold")
  }

  test("overlap coefficient catches subset duplicates that jaccard misses") {
    val small = "alpha beta gamma delta epsilon"
    val big = small + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val df = Seq((1L, small), (2L, big), (3L, "totally unrelated words here now")).toDF("doc_id", "text")
    val ov = Dedup.overlapPairs(df, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every 3-shingle of doc 1 appears in doc 2 → overlap = 1.0
    assert(ov.toSeq === Seq((1L, 2L, 1.0)))
    // ...while jaccard on the same pair is far below any dedup threshold
    val jac = Dedup.ngramJaccardPairs(df, 3, 0.5).collect()
    assert(!jac.exists(r => r.getLong(0) === 1L && r.getLong(1) === 2L))
  }

  test("jaccard pair outputs are deterministic across runs") {
    val r1 = Dedup.ngramJaccardPairs(docs, 3, 0.6).collect().toSeq
    val r2 = Dedup.ngramJaccardPairs(docs, 3, 0.6).collect().toSeq
    assert(r1.toSet === r2.toSet)
  }

  test("semantic dedup drops exactly the all-pairs duplicates, cell-confined") {
    val base = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val pert = array((0 until 64).map(i => lit(graft.search.RpLsh.sign(9999, i) / 64.0)): _*)
    val planted = base.unionByName(base.select(
      ($"vec_id" + lit(1000000L)).as("vec_id"),
      zip_with($"embedding", pert, (x, p) => x + p).cast("array<float>").as("embedding")))

    val sem = Dedup.semanticDedup(planted, numSeeds = 10, threshold = 0.7)
    val semDrops = sem.collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    // ground truth: unrestricted all-pairs at the same threshold,
    // keep-lowest-id → drop (id_b, min id_a).
    val exactDrops = Dedup.embeddingCosinePairs(planted, 0.7)
      .groupBy($"id_b").agg(min($"id_a").as("dup_of"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDrops.nonEmpty, "planted input should contain semantic dups")

    // cell confinement NEVER invents a drop (precision 1.0)...
    assert(semDrops.subsetOf(exactDrops))
    // ...and recovers the large majority: a twin is only lost when its
    // original sits close enough to a cell boundary that the ±1/64
    // perturbation flips its nearest seed (~10% of isotropic fixture
    // vectors; measured 0.898 at sf0.001). Real corpora dedup at much
    // larger k where verbatim copies co-assign — this measures the
    // tradeoff honestly rather than tuning it away.
    val recall = semDrops.size.toDouble / exactDrops.size
    assert(recall >= 0.8, s"cell-confined recall $recall")

    // the recovered dups are exactly twin pairs
    assert(semDrops.forall { case (v, d) => v === d + 1000000L })

    // the seed expansion is a broadcast BNLJ, the pair stage an
    // equi-join on the cell — never a cartesian
    val plan = sem.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)

    // 2-probe assignment recovers every boundary-flipped twin: both
    // members of a flipped pair probe the same two cells, so the pair
    // co-occurs somewhere — full recall at probes²× candidate cost
    val multi = Dedup.semanticDedupMultiProbe(planted, 10, 0.7, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semDrops.subsetOf(multi))
    assert(multi === exactDrops, s"multi-probe recall ${multi.size.toDouble / exactDrops.size}")
  }

  test("stop-shingle cap only removes pairs, never admits new ones") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.6)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no-op cap: identical result
    val uncapped = Dedup.ngramJaccardPairs(docs, 3, 0.6, maxDocFrequency = 1000000L)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === exact)
    // aggressive cap: conservative (subset) — Jaccard can only drop
    val capped = Dedup.ngramJaccardPairs(docs, 3, 0.6, maxDocFrequency = 2L)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exact))
  }

  test("dHash: brightness-shift invariant, downscale-stable, banded join pigeonhole-exact") {
    import graft.multimodal.Multimodal
    def grays(seed: Long): Array[Int] =
      Array.tabulate(72)(i => ((seed * 37 + (i / 9) * 13 + (i % 9) * 29) % 180 + 30).toInt)
    val imgs = (0L until 30L).map { id =>
      val g = grays(id / 3)
      val v = (id % 3).toInt
      if (v > 0) g(v * 11 + 3) = math.min(255, g(v * 11 + 3) + v * 23)
      (id, Multimodal.grayPngBytes(9, 8, g))
    }
    // brightness shift: same hash (gradient signs unchanged)
    val base = grays(7L)
    val shifted = base.map(v => math.min(255, v + 10))
    // 2×2 pixel duplication: box average reproduces the 9×8 grid exactly
    val doubled = Array.tabulate(18 * 16) { i =>
      val (y, x) = (i / 18, i % 18)
      base((y / 2) * 9 + x / 2)
    }
    val probes = Seq((100L, Multimodal.grayPngBytes(9, 8, base)),
      (101L, Multimodal.grayPngBytes(9, 8, shifted)),
      (102L, Multimodal.grayPngBytes(18, 16, doubled)),
      (103L, "not an image".getBytes("UTF-8")))
    val hs = Multimodal.dHash64(spark, (imgs ++ probes).toDF("id", "payload")).collect()
    val byId = hs.map(h => h.id -> h).toMap
    assert(byId(100L).is_image && byId(100L).dhash === byId(101L).dhash)
    assert(byId(100L).dhash === byId(102L).dhash)
    assert(!byId(103L).is_image)
    // banded candidates == exhaustive all-pairs at maxHamming <= 7
    val hdf = Multimodal.dHash64(spark, imgs.toDF("id", "payload"))
      .filter($"is_image").select($"id", $"dhash")
    val banded = Dedup.dhashPairs(hdf, maxHamming = 6)
      .select($"id_a", $"id_b", $"hamming".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = hdf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val exhaustive = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d.toLong)).toSet
    assert(banded === exhaustive)
    assert(banded.nonEmpty, "fixture must actually produce near-dup pairs")
  }
}
