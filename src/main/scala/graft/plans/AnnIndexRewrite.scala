package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.FloatVecL2Sq

/** Planner-chosen ANN (SURVEY §4's "not built-in as a planner choice"
  * gap): a session registry of fitted vector indexes plus an optimizer
  * rule that rewrites the canonical exact-kNN plan shape
  *
  * {{{ Limit k → Sort(graft_l2sq(<literal query vector>, emb) ASC) → Project → Scan }}}
  *
  * into an index-accelerated plan — the user writes the declarative
  * distance-orderBy-limit query and the PLANNER decides to use the
  * index, exactly how a B-tree turns ORDER BY ts LIMIT 10 into an index
  * scan in a relational optimizer. The reference makes this choice in
  * client code (exact scan vs collection.query); here it is a plan
  * property.
  *
  * Rewrite shape: the scan side is semi-joined with the stored-index
  * probe's candidate ids ([[graft.search.Hnsw.searchRoutedIndex]] —
  * route, prune to nprobe cells, walk, merge), and the ORIGINAL
  * Sort+Limit re-rank the k·overfetch candidates exactly:
  *
  * {{{ Limit k → Sort(dist ASC) → Project → (Scan ⋉ indexProbe(qv)) }}}
  *
  * - At 100 TB the Sort's input shrinks from n rows to k·overfetch
  *   rows; the probe itself reads only the probed cells of the
  *   cell-partitioned index table (partition pruning).
  * - Results are IDENTICAL to the exact plan whenever the probe's
  *   candidate set contains the true top-k (guaranteed at exhaustive
  *   nprobe/efSearch, the registration used by the oracle-checked
  *   query; at approximate settings this is the standard ANN
  *   recall trade, chosen at registration time, per index).
  * - No registered index for the scanned path (or the rule disabled
  *   via `spark.graft.ann.rewrite`) → no match → Catalyst's own
  *   TakeOrderedAndProject exact path. Fallback is the EXACT plan,
  *   never a broken probe.
  *
  * The match is deliberately strict — the Project must sit DIRECTLY on
  * the scan (any Filter in between changes filtered-kNN semantics,
  * where candidate pruning before the filter loses recall; those
  * queries keep the exact plan) — and the strictness doubles as the
  * idempotence guard: after the rewrite the Project's child is a Join,
  * so the pattern can never re-fire on its own output.
  *
  * Known limitation, by design: a `cache()`d source table is
  * substituted with an InMemoryRelation before optimization, which
  * hides the scan's path — such plans keep the exact path (correct,
  * just unaccelerated). Registration is per source path, so per
  * (table, index) pair.
  */
object AnnIndexRewrite extends Rule[LogicalPlan] {

  /** A fitted index over one source table: the stored routed-HNSW
    * adjacency (cell, id, embedding, nbrs — [[graft.search.Hnsw.buildRoutedIndex]]),
    * its centroids, and the search knobs frozen at registration.
    * `overfetch` widens the candidate set the exact re-rank sees
    * (ties at the k-th boundary, future filtered variants).
    */
  final case class IndexSpec(
      index: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      nprobe: Int = 2,
      efSearch: Int = 128,
      overfetch: Int = 2,
      indexPath: Option[String] = None)

  /** Fitted indexes keyed by normalized source path (the scan's root
    * path URI path component). Registration is session-lived, like a
    * temp view.
    */
  private val registry = TrieMap.empty[String, IndexSpec]

  def normalize(path: String): String =
    new org.apache.hadoop.fs.Path(path).toUri.getPath

  def register(sourcePath: String, spec: IndexSpec): Unit =
    registry.put(normalize(sourcePath), spec)

  def unregister(sourcePath: String): Unit = registry.remove(normalize(sourcePath))

  def clear(): Unit = registry.clear()

  /** Count of rewrites applied in this JVM — observability for specs
    * and operators (a registered index that never fires is a config
    * bug, not a silent fallback).
    */
  val fired = new java.util.concurrent.atomic.AtomicLong(0)

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.ann.rewrite", "true").toBoolean

  /** The scan's registered spec, if any. V1 parquet path only — that is
    * what `spark.read.parquet` yields under the default
    * `spark.sql.sources.useV1SourceList`.
    */
  private def specOf(leaf: LogicalPlan): Option[IndexSpec] = leaf match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption.flatMap { p =>
          val key = p.toUri.getPath
          registry.get(key).flatMap { spec =>
            // a registration outlives its owning session only as a bug:
            // handing a stopped session's DataFrame to a live query
            // would fail at execution. Self-heal by dropping it — the
            // query falls back to the exact plan (the rule's contract).
            if (spec.index.sparkSession.sparkContext.isStopped) {
              registry.remove(key); None
            } else Some(spec)
          }
        }
      case _ => None
    }
    case _ => None
  }

  /** Resolve the first sort key to the expression it names (through the
    * Project's aliases), then destructure the literal-vs-column L2
    * pattern.
    */
  private def queryVectorOf(
      key: Expression,
      projList: Seq[NamedExpression]): Option[(Array[Float], AttributeReference)] = {
    val resolved = key match {
      case a: AttributeReference =>
        projList.collectFirst { case al: Alias if al.exprId == a.exprId => al.child }
      case e => Some(e)
    }
    resolved.flatMap {
      case FloatVecL2Sq(Literal(arr: ArrayData, ArrayType(FloatType, _)), a: AttributeReference) =>
        Some((arr.toFloatArray(), a))
      case FloatVecL2Sq(a: AttributeReference, Literal(arr: ArrayData, ArrayType(FloatType, _))) =>
        Some((arr.toFloatArray(), a))
      case _ => None
    }
  }

  /** Rewrite one `Sort(dist ASC) → Project → Scan` subtree (already
    * known to sit under a Limit k) into
    * `Sort(dist ASC) → Project → (Scan ⋉ probe)`, or None if the shape
    * / registration / sort key doesn't qualify.
    */
  private def rewriteSort(srt: Sort, k: Int,
      guard: IndexSpec => Boolean): Option[Sort] =
    try rewriteSortUnsafe(srt, k, guard)
    catch {
      // The planner contract: a failed ACCELERATION attempt (corrupt
      // index files, a mid-flight dropped registration, an unexpected
      // literal shape) must never fail the QUERY — log and keep the
      // exact plan.
      case e: Exception =>
        logWarning(s"graft ANN rewrite failed; keeping the exact plan: ${e.getMessage}")
        None
    }

  private def rewriteSortUnsafe(srt: Sort, k: Int,
      guard: IndexSpec => Boolean): Option[Sort] = srt match {
    case Sort(SortOrder(key, Ascending, _, _) +: _, true,
        p @ Project(projList, leaf), _) =>
      specOf(leaf).filter(guard).flatMap { spec =>
        (queryVectorOf(key, projList), leaf.output.find(_.name == spec.idCol)) match {
          case (Some((qv, embAttr)), Some(leftId))
              if leaf.outputSet.contains(embAttr) && embAttr.name == spec.embCol =>
            val spark = spec.index.sparkSession
            import spark.implicits._
            // exprId hygiene for MULTIPLE patterns in one query: a
            // path-backed spec splices a FRESH read per rewrite (fresh
            // relation attrs every time); a DataFrame-backed spec can
            // only be spliced once per plan — if its attrs are already
            // in the tree, this match keeps the exact plan (never
            // wrong, only unaccelerated).
            val idx = spec.indexPath.map(spark.read.parquet(_)).getOrElse(spec.index)
            val probe = graft.search.Hnsw.searchRoutedIndex(
              spark, Seq((0L, qv)).toDF("qid", "qemb"),
              idx, spec.centroids,
              k = math.max(k, 1) * math.max(spec.overfetch, 1),
              nprobe = spec.nprobe, efSearch = spec.efSearch,
              idCol = spec.idCol, embCol = spec.embCol)
              .select(spec.idCol)
            val right = EliminateSubqueryAliases(probe.queryExecution.analyzed)
            val join = Join(leaf, right, LeftSemi,
              Some(EqualTo(leftId, right.output.head)), JoinHint.NONE)
            fired.incrementAndGet()
            logInfo(s"graft ANN rewrite: Sort+Limit($k) over " +
              s"${spec.idCol}-indexed scan → semi-join with stored-index probe")
            Some(srt.copy(child = p.copy(child = join)))
          case _ => None
        }
      }
    case _ => None
  }

  /** A DataFrame-backed spec's index attrs, for the spliced-once guard
    * (a path-backed spec reads fresh attrs per splice and needs none).
    */
  private def dfSpecAttrs(): org.apache.spark.sql.catalyst.expressions.AttributeSet = {
    val specs = registry.values.filter(_.indexPath.isEmpty)
    specs.foldLeft(org.apache.spark.sql.catalyst.expressions.AttributeSet.empty) {
      (acc, sp) => acc ++ sp.index.queryExecution.analyzed.outputSet
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || registry.isEmpty) return plan
    // exprId hygiene: a DataFrame-backed spec holds ONE analyzed index
    // subtree, so splicing it twice into one plan would duplicate its
    // exprIds (attribute-binding corruption). If its attrs are already
    // anywhere in this plan, further matches keep the exact path.
    // Path-backed specs are immune — each splice reads fresh.
    var dfSpliced = plan.collectLeaves()
      .exists(l => l.outputSet.intersect(dfSpecAttrs()).nonEmpty)
    def guardDf(spec: IndexSpec): Boolean =
      spec.indexPath.isDefined || { val ok = !dfSpliced; if (ok) dfSpliced = true; ok }
    plan.transformDown {
      // the analyzed shape: Limit directly over the Sort
      case gl @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_, srt: Sort)) =>
        rewriteSort(srt, k, guardDf)
          .map(ns => gl.copy(child = ll.copy(child = ns)))
          .getOrElse(gl)
      // after projection pushdown the optimizer moves row-preserving
      // projections below the Limit: Limit → Project → Sort. The Limit
      // still takes the Sort's top rows (a deterministic Project drops
      // no rows and reorders nothing), so the same rewrite applies.
      case gl @ GlobalLimit(IntegerLiteral(k),
          ll @ LocalLimit(_, mid @ Project(midList, srt: Sort)))
          if midList.forall(_.deterministic) =>
        rewriteSort(srt, k, guardDf)
          .map(ns => gl.copy(child = ll.copy(child = mid.copy(child = ns))))
          .getOrElse(gl)
    }
  }
}
