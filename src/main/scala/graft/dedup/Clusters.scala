package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assignment: connected components over a near-dup
  * pair list — the step that turns any pairwise dedup output (n-gram
  * Jaccard, MinHash, SimHash, embedding-cosine) into "keep one document
  * per duplicate cluster", which is what a training-data pipeline
  * actually needs. The reference stops at pairwise distances
  * (chromadb_acc_experiment.py:508-537 ranks neighbors but never groups
  * them); clustering is the natural completion of that surface.
  *
  * Algorithm: iterative min-label propagation on the undirected pair
  * graph. Each vertex starts labeled with its own id; each round every
  * vertex takes the min of its own and its neighbors' labels; converged
  * when a round changes nothing. Round count = component diameter, and
  * near-dup components are shallow (variants of one source document), so
  * a handful of rounds suffice. Each round is shuffle equi-joins +
  * a hash aggregation on vertex id — no driver-side graph state, no
  * collect, so the edge list can be arbitrarily larger than any single
  * machine. Labels only ever decrease, so convergence is monotone and
  * the `label < prev` change test is exact.
  *
  * Scale notes: `localCheckpoint` truncates the per-round lineage growth
  * (on a multi-executor cluster prefer `Dataset.checkpoint` with a
  * reliable checkpoint dir — localCheckpoint pins blocks to executors
  * and does not survive executor loss). For adversarially deep graphs
  * (long chains) the classic fix is the large-star/small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14), which converges in O(log n) rounds; dedup graphs
  * don't need it.
  */
object Clusters {

  /** Per-vertex component labels: (id, label) with label = min vertex id
    * reachable in the pair graph. Only vertices that appear in at least
    * one pair are returned (singletons are trivially their own cluster).
    */
  def connectedComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 50,
      maxDriverEdges: Long = 100000): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint()
    // Hybrid: a near-dup edge list is usually TINY relative to the corpus
    // (it's the output of a high-threshold filter), so below the cutoff
    // solve it with driver union-find — zero iterative jobs. The
    // distributed min-label loop below remains the path for graphs that
    // don't fit one machine; the threshold is on EDGES (already
    // aggregated data), never on corpus rows. Long ids only — anything
    // else stays distributed.
    val longIds = edges.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    // Bounded probe: limit(max+1) short-circuits once max+1 rows exist,
    // so a graph far above the cutoff pays a capped scan, not a full
    // materializing count.
    val probeLimit = math.min(maxDriverEdges + 1, Int.MaxValue.toLong).toInt
    if (longIds && edges.limit(probeLimit).count() <= maxDriverEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val out = parent.keys.toSeq.sorted.map(v => (v, find(v)))
      return out.toDF("id", "label")
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
        .groupBy("src").agg(min("dst_label").as("nbr_label"))
        .withColumnRenamed("src", "id")
      // Lazy checkpoint: the convergence probe below is the round's one
      // materializing action — an eager checkpoint would run a second
      // job per round for nothing.
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
      converged = next
        .join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") < col("prev"))
        .isEmpty
      labels = next
      iter += 1
    }
    // A graph whose diameter exceeds maxIter would otherwise return
    // silently WRONG labels — and a wrong drop list deletes documents.
    // Fail loudly; callers with adversarially deep graphs should raise
    // maxIter or switch to large-star/small-star.
    if (!converged) {
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          "(component diameter exceeds maxIter); labels would be incorrect")
    }
    labels
  }

  /** Cluster view: (doc_id, cluster_id, cluster_size) for every document
    * that has at least one near-duplicate.
    */
  def clusters(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val labels = connectedComponents(pairs, idA, idB)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }
}
