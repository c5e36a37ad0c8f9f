package graft.search

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HNSW graph ANN (Malkov & Yashunin, TPAMI'18) — the index family the
  * reference actually queries (chromadb builds HNSW implicitly at
  * `create_collections.py:260-268` and tunes it via ef/space kwargs;
  * queried at `chromadb_speed_experiment.py:473-477`). The suite's
  * LSH/IVF/PQ rows cover the contract with measured recall; this closes
  * the remaining qualitative gap with a real navigable-small-world
  * graph walk.
  *
  * Spark-first shape — the SEGMENT model (how Lucene/Elasticsearch ship
  * graph ANN on clusters): the collection is hash-partitioned into
  * `numGraphs` segments, each partition builds its own in-memory HNSW
  * in ONE `mapPartitions` pass (embarrassingly parallel, zero shuffle
  * of vectors beyond the one partitioning exchange), every segment
  * answers each broadcast query from its local graph, and the global
  * answer is a per-query top-k over the `numGraphs · k` candidate rows
  * (WindowGroupLimit — shuffle volume O(numGraphs · k · |Q|), never
  * O(N)). At 100 TB: segments are the parallelism unit, graph build
  * cost is linear-ish per segment (each insert touches ~efConstruction
  * nodes), query fan-out is one tiny task per segment, and the merge
  * is the same top-k heap every other search family uses. For truly
  * extreme segment counts the IVF router in front (probe a subset of
  * segments) is the standard composition — both pieces exist here.
  *
  * DETERMINISM (the suite's oracle discipline): layer assignment is a
  * SplitMix64 hash of the vector id (no RNG state), insertion order is
  * the segment's ids sorted ascending, neighbor selection and search
  * order break distance ties on id — so the graph, and therefore the
  * result set, is a pure function of the partitioned input.
  */
object Hnsw {

  /** In-memory HNSW over one segment's vectors. Single-threaded build;
    * distances are double-accumulated L2² over float components (same
    * arithmetic as the codegen'd floatvecl2sq used by the exact path).
    */
  final class Graph(m: Int, efConstruction: Int) {
    private val mL = 1.0 / math.log(m.toDouble)
    private val maxM0 = 2 * m
    private val ids = mutable.ArrayBuffer.empty[Long]
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    // neighbors(node)(layer) = ArrayBuffer[node index]
    private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private var entry: Int = -1
    private var entryLevel: Int = -1

    def size: Int = ids.length

    // widen BEFORE subtracting — the exact op sequence of the codegen'd
    // FloatVecL2Sq, so graph distances are bit-identical to the exact
    // path's (and to the oracle's l2Sql² via the same left fold)
    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }

    /** SplitMix64 of the id → dyadic uniform in (0,1) → geometric-ish
      * layer. No RNG state: the same id always lands on the same layer.
      */
    private def levelOf(id: Long): Int = {
      var z = id + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      val u = ((z >>> 11).toDouble + 1.0) / 9007199254740993.0 // (0,1)
      math.min((-math.log(u) * mL).toInt, 31)
    }

    /** Beam search within one layer from `entries`; returns up to `ef`
      * (dist, node) pairs, nearest first, ties on node id.
      */
    private def searchLayer(q: Array[Float], entries: Seq[Int], ef: Int,
        layer: Int): mutable.ArrayBuffer[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
      val visited = mutable.HashSet.empty[Int]
      // candidates: nearest-first; results: farthest-first (bounded ef)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](ord)
      entries.foreach { e =>
        if (visited.add(e)) {
          val d = dist(q, vecs(e))
          cand.enqueue((d, e)); res.enqueue((d, e))
        }
      }
      while (res.size > ef) res.dequeue()
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.size >= ef && dc > res.head._1) { cand.clear() }
        else {
          val nbrs = neighbors(c)(layer)
          var i = 0
          while (i < nbrs.length) {
            val nb = nbrs(i)
            if (visited.add(nb)) {
              val d = dist(q, vecs(nb))
              if (res.size < ef || d < res.head._1 ||
                  (d == res.head._1 && nb < res.head._2)) {
                cand.enqueue((d, nb)); res.enqueue((d, nb))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      val out = mutable.ArrayBuffer.empty[(Double, Int)]
      while (res.nonEmpty) out += res.dequeue()
      out.sortInPlace()(ord)
      out
    }

    /** Select up to `cap` neighbors for `base` from `candidates`
      * ((dist-to-base, node) pairs, ascending) — the select-neighbors
      * HEURISTIC of the HNSW paper (Alg. 4, hnswlib's default, i.e. the
      * reference's actual index discipline), not plain closest-M: scan
      * nearest-first and keep a candidate only if it is closer to
      * `base` than to every already-kept neighbor (diverse directions —
      * the property that keeps clustered data reachable), then, as
      * keepPrunedConnections, fill the remaining slots with the closest
      * discarded candidates. The fill guarantees the result size is
      * min(cap, |candidates|), so backlink pruning can never empty a
      * node's adjacency and layer-0 reachability survives clustered
      * inserts. Deterministic: candidates arrive (dist, id)-sorted and
      * the scan never reorders.
      */
    private def selectNeighbors(base: Array[Float],
        candidates: collection.Seq[(Double, Int)],
        cap: Int): mutable.ArrayBuffer[Int] = {
      val kept = mutable.ArrayBuffer.empty[Int]
      val discarded = mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < candidates.length && kept.length < cap) {
        val (d, c) = candidates(i)
        if (kept.forall(r => d < dist(vecs(c), vecs(r)))) kept += c
        else discarded += c
        i += 1
      }
      var j = 0
      while (kept.length < cap && j < discarded.length) {
        kept += discarded(j); j += 1
      }
      kept
    }

    /** Insert; `id` must be new. Standard descend-then-connect with
      * heuristic neighbor selection and Mmax pruning (both via
      * [[selectNeighbors]]).
      */
    def insert(id: Long, vec: Array[Float]): Unit = {
      val node = ids.length
      val level = levelOf(id)
      ids += id
      vecs += vec
      neighbors += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = node; entryLevel = level; return }
      var ep = Seq(entry)
      var l = entryLevel
      while (l > level) {
        ep = Seq(searchLayer(vec, ep, 1, math.min(l, entryLevel)).head._2)
        l -= 1
      }
      var layer = math.min(level, entryLevel)
      while (layer >= 0) {
        val found = searchLayer(vec, ep, efConstruction, layer)
        val cap = if (layer == 0) maxM0 else m
        val chosen = selectNeighbors(vec, found, m)
        chosen.foreach { nb =>
          neighbors(node)(layer) += nb
          val back = neighbors(nb)(layer)
          back += node
          if (back.length > cap) {
            // prune with the same heuristic (bounded degree keeps search
            // O(ef · M); keepPrunedConnections keeps |back| = cap, so no
            // node ever loses its whole backlink set)
            val v = vecs(nb)
            val cands = back.map(x => (dist(v, vecs(x)), x)).sortInPlace()(
              Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
            val kept = selectNeighbors(v, cands, cap)
            back.clear(); back ++= kept
          }
        }
        ep = found.map(_._2).toSeq
        layer -= 1
      }
      if (level > entryLevel) { entry = node; entryLevel = level }
    }

    /** Top-k (id, L2² dist), nearest first, ties on id. */
    def search(q: Array[Float], k: Int, efSearch: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      var ep = Seq(entry)
      var l = entryLevel
      while (l > 0) { ep = Seq(searchLayer(q, ep, 1, l).head._2); l -= 1 }
      searchLayer(q, ep, math.max(efSearch, k), 0)
        .take(k).map { case (d, n) => (ids(n), d) }.toSeq
    }

    /** Export the adjacency with neighbor INDICES mapped to external
      * ids — the storable form of the graph (one row per node).
      */
    def export: Iterator[(Long, Array[Float], Array[Array[Long]])] =
      ids.indices.iterator.map { n =>
        (ids(n), vecs(n), neighbors(n).map(_.map(ids(_)).toArray))
      }

    /** Load a previously exported adjacency verbatim (no re-build).
      * Rows are indexed in ascending-id order — the same order
      * [[buildGraph]] inserts in — and the entry point is re-derived
      * exactly as the builder left it: the smallest id among max-level
      * nodes (the builder only advances the entry on a STRICTLY higher
      * level, so with ascending insertion that is the first max-level
      * node). A loaded graph therefore answers every query identically
      * to the graph it was exported from (pinned in HnswSpec).
      */
    private[Hnsw] def loadAdjacency(
        rows: Array[(Long, Array[Float], Array[Array[Long]])]): Unit = {
      require(ids.isEmpty, "loadAdjacency requires an empty graph")
      val sorted = rows.sortBy(_._1)
      val indexOf = sorted.iterator.map(_._1).zipWithIndex.toMap
      sorted.foreach { case (id, vec, nbrs) =>
        ids += id
        vecs += vec
        neighbors += nbrs.map(layer =>
          mutable.ArrayBuffer.from(layer.map(indexOf)))
      }
      if (sorted.nonEmpty) {
        entryLevel = neighbors.iterator.map(_.length - 1).max
        entry = neighbors.indexWhere(_.length - 1 == entryLevel)
      }
    }
  }

  /** Rehydrate a stored segment graph. */
  def graphFromAdjacency(rows: Array[(Long, Array[Float], Array[Array[Long]])],
      m: Int, efConstruction: Int): Graph = {
    val g = new Graph(m, efConstruction)
    g.loadAdjacency(rows)
    g
  }

  /** Build one graph per segment from sorted (id, vec) rows. */
  def buildGraph(rows: Iterator[(Long, Array[Float])], m: Int,
      efConstruction: Int): Graph = {
    val g = new Graph(m, efConstruction)
    rows.toArray.sortBy(_._1).foreach { case (id, v) => g.insert(id, v) }
    g
  }

  /** Distributed top-k: per-segment HNSW search + global top-k merge.
    * Output (qid, vec_id, rk, dist) — the exact-path schema, dist = L2².
    */
  def topK(
      spark: SparkSession,
      queries: DataFrame,
      collection: DataFrame,
      k: Int,
      m: Int = 16,
      efConstruction: Int = 100,
      efSearch: Int = 128,
      numGraphs: Int = 8,
      qidCol: String = "qid",
      qEmbCol: String = "qemb",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    // queries are point-lookup-bounded frames (suite invariant); the
    // collect is O(|Q| · dim), parameter-bounded like the PQ codebooks
    val qArr = queries.select(col(qidCol), col(qEmbCol)).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qArr)
    val candidates = collection.select(col(idCol), col(embCol))
      .repartition(numGraphs, col(idCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val g = buildGraph(it, m, efConstruction)
        qB.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k, efSearch).map { case (id, d) => (qid, id, d) }
        }
      }
      .toDF(qidCol, idCol, "dist")
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist").asc, col(idCol).asc)
    candidates
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("rk"), col("dist"))
  }

  /** IVF-ROUTED HNSW — the composition for extreme segment counts,
    * where fanning every query out to every segment stops scaling:
    * segments are IVF CELLS (vectors grouped by nearest centroid, not
    * id hash), each cell carries its own graph, and a query walks only
    * its `nprobe` nearest cells' graphs. Query fan-out drops from
    * O(#segments) tasks to O(nprobe); the routing decision is the same
    * tiny query×centroid ranking every IVF operator here uses. The
    * recall knob factorizes: nprobe bounds which cells are reachable
    * (the IVF term — `ann_ivf_top5`'s measured tradeoff), efSearch
    * bounds the walk within a cell (the HNSW term). At 100 TB this is
    * the production shape: thousands of cell graphs, each
    * memory-resident on some executor, O(nprobe) of them touched per
    * query.
    */
  /** Per-query probed cells + query vectors, both parameter-bounded
    * (|Q| · nprobe routing pairs, |Q| vectors) — the shared routing
    * step of [[topKRouted]] / [[searchRoutedIndex]]. The centroid
    * ranking is the same tiny query×centroid cross every IVF operator
    * here uses.
    */
  private def routeQueries(
      spark: SparkSession,
      queries: DataFrame,
      centroids: DataFrame,
      nprobe: Int,
      qidCol: String,
      qEmbCol: String): (Map[Int, Array[Long]], Map[Long, Array[Float]]) = {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val probeW = Window.partitionBy(col(qidCol))
      .orderBy(col("cdist").asc, col("cid").asc)
    val routes = broadcast(queries)
      .crossJoin(broadcast(centroids))
      .withColumn("cdist",
        graft.functions.VectorFunctions.l2Fast(col(qEmbCol), col("cemb")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= nprobe)
      .select(col(qidCol), col("cid"))
      .as[(Long, Int)].collect()
    val routesByCell = routes.groupBy(_._2).map { case (c, qs) => c -> qs.map(_._1).sorted }
    val qMap = queries.select(col(qidCol), col(qEmbCol)).as[(Long, Array[Float])]
      .collect().toMap
    (routesByCell, qMap)
  }

  def topKRouted(
      spark: SparkSession,
      queries: DataFrame,
      collection: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int = 2,
      m: Int = 16,
      efConstruction: Int = 100,
      efSearch: Int = 128,
      qidCol: String = "qid",
      qEmbCol: String = "qemb",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val (routesByCell, qMap) =
      routeQueries(spark, queries, centroids, nprobe, qidCol, qEmbCol)
    val rB = spark.sparkContext.broadcast(routesByCell)
    val qB = spark.sparkContext.broadcast(qMap)
    val candidates = IvfIndex.assign(collection, centroids, idCol, embCol)
      .repartition(col("cell"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        it.toArray.groupBy(_._3).iterator.flatMap { case (cell, rows) =>
          // cells no query probes are never graphed — the router prunes
          // build work too when the index is query-driven; a stored
          // variant would graph every cell once at build time
          rB.value.get(cell).iterator.flatMap { qids =>
            val g = buildGraph(
              rows.iterator.map { case (id, v, _) => (id, v) }, m, efConstruction)
            qids.iterator.flatMap { qid =>
              g.search(qB.value(qid), k, efSearch).map { case (id, d) => (qid, id, d) }
            }
          }
        }
      }
      .toDF(qidCol, idCol, "dist")
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist").asc, col(idCol).asc)
    candidates
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("rk"), col("dist"))
  }

  /** Build the STORABLE routed index: every IVF cell's graph built ONCE
    * — (cell, vec_id, embedding, nbrs) rows, the cell-keyed twin of
    * [[buildIndex]]. Written to a parquet table partitioned by `cell`,
    * a probe touches only its nprobe cells' files (partition pruning —
    * the same scan-elision `ann_ivf_top5` measures), and graph build
    * cost is paid once per corpus version instead of once per query
    * burst ([[topKRouted]] builds probed cells at query time, the right
    * trade only when the query set is tiny and ad hoc).
    */
  def buildRoutedIndex(
      spark: SparkSession,
      collection: DataFrame,
      centroids: DataFrame,
      m: Int = 16,
      efConstruction: Int = 100,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    IvfIndex.assign(collection, centroids, idCol, embCol)
      .repartition(col("cell"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        it.toArray.groupBy(_._3).iterator.flatMap { case (cell, rows) =>
          buildGraph(rows.iterator.map { case (id, v, _) => (id, v) },
            m, efConstruction).export
            .map { case (id, vec, nbrs) => (cell, id, vec, nbrs) }
        }
      }
      .toDF("cell", idCol, embCol, "nbrs")
  }

  /** Search a stored routed index: route (tiny broadcast ranking), PRUNE
    * the index scan to the probed cells (`cell IN (...)` reaches the
    * scan — on a cell-partitioned table that is partition pruning, the
    * unprobed ~(1 − nprobe/numCells) of the index is never read),
    * rehydrate each probed cell's graph verbatim, walk, merge top-k.
    * Per-cell graphs are built with the same ascending-id insertion as
    * [[topKRouted]]'s query-time build, so the two paths answer
    * IDENTICALLY (spec-pinned) — the build-once/search-many split
    * changes cost, never results.
    */
  def searchRoutedIndex(
      spark: SparkSession,
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int = 2,
      m: Int = 16,
      efConstruction: Int = 100,
      efSearch: Int = 128,
      qidCol: String = "qid",
      qEmbCol: String = "qemb",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val (routesByCell, qMap) =
      routeQueries(spark, queries, centroids, nprobe, qidCol, qEmbCol)
    val rB = spark.sparkContext.broadcast(routesByCell)
    val qB = spark.sparkContext.broadcast(qMap)
    val probed = routesByCell.keys.toSeq.sorted
    val candidates = index
      .filter(col("cell").isin(probed: _*))
      .select(col("cell"), col(idCol), col(embCol), col("nbrs"))
      .repartition(col("cell"))
      .as[(Int, Long, Array[Float], Array[Array[Long]])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (cell, rows) =>
          rB.value.get(cell).iterator.flatMap { qids =>
            val g = graphFromAdjacency(
              rows.map { case (_, id, v, nb) => (id, v, nb) }, m, efConstruction)
            qids.iterator.flatMap { qid =>
              g.search(qB.value(qid), k, efSearch).map { case (id, d) => (qid, id, d) }
            }
          }
        }
      }
      .toDF(qidCol, idCol, "dist")
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist").asc, col(idCol).asc)
    candidates
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("rk"), col("dist"))
  }

  /** Build the STORABLE index: one row per node — (seg, vec_id,
    * embedding, nbrs: per-layer neighbor id lists). Write it to a
    * parquet table partitioned by `seg` and the graph build cost is
    * paid once per corpus version (the reference's PersistentClient
    * discipline; same build-once/search-many split as IvfAdc.Index) —
    * at 100 TB this is the difference between an index and a per-query
    * rebuild.
    */
  def buildIndex(
      spark: SparkSession,
      collection: DataFrame,
      m: Int = 16,
      efConstruction: Int = 100,
      numGraphs: Int = 8,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    collection.select(col(idCol), col(embCol))
      .repartition(numGraphs, col(idCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val seg = org.apache.spark.TaskContext.getPartitionId()
        buildGraph(it, m, efConstruction).export
          .map { case (id, vec, nbrs) => (seg, id, vec, nbrs) }
      }
      .toDF("seg", idCol, embCol, "nbrs")
  }

  /** Per-segment STRUCTURAL audit of a stored index — the operational
    * check a vector store runs after builds/appends: is every node
    * reachable from the segment's entry point (the select-neighbors
    * heuristic's guarantee on clustered data — an unreachable node is
    * silently invisible to every search), and is layer-0 degree inside
    * its contract (≥ 1 when the segment has ≥ 2 nodes — backlink
    * pruning keeps min(cap, candidates) links; ≤ 2·m, the Mmax cap)?
    * One row per segment, computed in the same one-pass-per-segment
    * shape as the search itself.
    */
  def graphAudit(
      spark: SparkSession,
      index: DataFrame,
      numGraphs: Int = 8,
      segCol: String = "seg",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    index.select(col(segCol), col(idCol), col(embCol), col("nbrs"))
      .repartition(numGraphs, col(segCol))
      .as[(Int, Long, Array[Float], Array[Array[Long]])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.map { case (seg, rows) =>
          val nbrs: Map[Long, Array[Array[Long]]] =
            rows.map { case (_, id, _, nb) => id -> nb }.toMap
          val n = rows.length
          // the entry point the loader derives: smallest id among
          // max-level nodes (rows rehydrate in ascending-id order)
          val maxLevel = nbrs.valuesIterator.map(_.length - 1).max
          val entry = nbrs.iterator
            .filter { case (_, nb) => nb.length - 1 == maxLevel }
            .map(_._1).min
          val seen = mutable.HashSet[Long](entry)
          val queue = mutable.ArrayDeque[Long](entry)
          while (queue.nonEmpty) {
            val c = queue.removeHead()
            nbrs(c).iterator.flatten.foreach { nb =>
              if (seen.add(nb)) queue.append(nb)
            }
          }
          val deg0 = rows.map { case (_, _, _, nb) => nb(0).length }
          (seg, n.toLong, seen.size.toLong, deg0.min.toLong, deg0.max.toLong)
        }
      }
      .toDF(segCol, "n_nodes", "n_reachable", "deg0_min", "deg0_max")
  }

  /** Search a stored index: one exchange on `seg` co-locates each
    * segment's rows, the graph rehydrates verbatim (no re-build — the
    * loaded walk is bit-identical to the built one), every segment
    * answers the broadcast queries, global top-k merges. Output schema
    * matches [[topK]].
    */
  /** SEGMENT COMPACTION — the Lucene-merge-shaped maintenance op: many
    * small segments (the natural product of incremental appends) into
    * fewer big ones. HNSW adjacency is NOT mergeable — a graph is a
    * function of its full point set — so compaction re-inserts the
    * STORED vectors into `toGraphs` fresh graphs, exactly the rebuild
    * real stores do on merge. Re-insertion uses the same ascending-id
    * order as every build path here, so the compacted index answers
    * searches identically to a fresh [[buildIndex]] at the new segment
    * count (spec-pinned); fewer segments = fewer per-query graph walks,
    * the fan-out term of search cost, at the price of one bounded
    * rebuild pass — amortized across every later query.
    */
  def compactIndex(
      spark: SparkSession,
      index: DataFrame,
      toGraphs: Int,
      m: Int = 16,
      efConstruction: Int = 100,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    buildIndex(spark, index.select(col(idCol), col(embCol)), m, efConstruction,
      toGraphs, idCol, embCol)

  /** TOMBSTONE-aware stored-index search — the DELETE story for a graph
    * index: an HNSW node cannot be cheaply unlinked (its neighbors'
    * connectivity routes THROUGH it), so real stores keep deleted ids
    * in the graphs as tombstones, filter them from results, and purge
    * on the next compaction. The per-segment walk over-fetches by the
    * tombstone count, so k live results survive filtering whenever k
    * live vectors exist; the tombstone set is broadcast and stays
    * bounded by design (deletes accumulate only between compactions —
    * [[compactIndex]] over the filtered index rebuilds without them,
    * resetting the over-fetch cost to zero).
    */
  def searchIndexTombstoned(
      spark: SparkSession,
      queries: DataFrame,
      index: DataFrame,
      tombstones: Seq[Long],
      k: Int,
      m: Int = 16,
      efConstruction: Int = 100,
      efSearch: Int = 128,
      numGraphs: Int = 8,
      qidCol: String = "qid",
      qEmbCol: String = "qemb",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val qArr = queries.select(col(qidCol), col(qEmbCol)).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qArr)
    val tombB = spark.sparkContext.broadcast(tombstones.toSet)
    val fetch = k + tombstones.size
    val candidates = index.select(col("seg"), col(idCol), col(embCol), col("nbrs"))
      .repartition(numGraphs, col("seg"))
      .as[(Int, Long, Array[Float], Array[Array[Long]])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (_, rows) =>
          val g = graphFromAdjacency(
            rows.map { case (_, id, v, nb) => (id, v, nb) }, m, efConstruction)
          val tomb = tombB.value
          qB.value.iterator.flatMap { case (qid, qv) =>
            g.search(qv, fetch, math.max(efSearch, fetch))
              .filterNot { case (id, _) => tomb.contains(id) }
              .map { case (id, d) => (qid, id, d) }
          }
        }
      }
      .toDF(qidCol, idCol, "dist")
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist").asc, col(idCol).asc)
    candidates
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("rk"), col("dist"))
  }

  def searchIndex(
      spark: SparkSession,
      queries: DataFrame,
      index: DataFrame,
      k: Int,
      m: Int = 16,
      efConstruction: Int = 100,
      efSearch: Int = 128,
      numGraphs: Int = 8,
      qidCol: String = "qid",
      qEmbCol: String = "qemb",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val qArr = queries.select(col(qidCol), col(qEmbCol)).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qArr)
    val candidates = index.select(col("seg"), col(idCol), col(embCol), col("nbrs"))
      .repartition(numGraphs, col("seg"))
      .as[(Int, Long, Array[Float], Array[Array[Long]])]
      .mapPartitions { it =>
        // hash partitioning may co-locate several segments — group and
        // rehydrate each one separately (graphs never merge)
        it.toArray.groupBy(_._1).iterator.flatMap { case (_, rows) =>
          val g = graphFromAdjacency(
            rows.map { case (_, id, v, nb) => (id, v, nb) }, m, efConstruction)
          qB.value.iterator.flatMap { case (qid, qv) =>
            g.search(qv, k, efSearch).map { case (id, d) => (qid, id, d) }
          }
        }
      }
      .toDF(qidCol, idCol, "dist")
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist").asc, col(idCol).asc)
    candidates
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("rk"), col("dist"))
  }
}
