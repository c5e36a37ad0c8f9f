package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor — the scale path for
  * similarity search: partition the collection into Voronoi cells around
  * centroids; a query probes only the `nprobe` nearest cells.
  *
  * At 100 TB the assignment becomes the *physical partitioning* of the
  * stored table (write partitioned by cell id), so a probe is partition
  * pruning — the scan reads nprobe/k of the data. Here centroids are
  * deterministic (seed rows) so the whole operator is reproducible and
  * oracle-checkable in SQL, unlike LSH/HNSW.
  */
object IvfIndex {

  /** Cell assignment: nearest centroid per row (ties → lowest cid).
    * Centroids are tiny → broadcast; argmin via min_by on (dist, cid).
    */
  def assign(
      collection: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      cidCol: String = "cid",
      cEmbCol: String = "cemb"): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(collection.sparkSession)
    collection
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", l2Fast(col(embCol), col(cEmbCol)))
      .groupBy(col(idCol))
      .agg(
        min(struct(col("cdist"), col(cidCol))).as("best"),
        first(col(embCol)).as(embCol))
      .select(col(idCol), col(embCol), col("best").getField(cidCol).as("cell"))
  }

  /** IVF search: rank centroids per query, probe the nprobe nearest
    * cells, exact top-k within the probed subset.
    */
  def search(
      queries: DataFrame,
      assigned: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      qidCol: String = "qid",
      qEmbCol: String = "qemb",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      cidCol: String = "cid",
      cEmbCol: String = "cemb"): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val wC = Window.partitionBy(col(qidCol)).orderBy(col("cdist").asc, col(cidCol).asc)
    val probes = broadcast(queries)
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", l2Fast(col(qEmbCol), col(cEmbCol)))
      .withColumn("crk", row_number().over(wC))
      .filter(col("crk") <= nprobe)
      .select(col(qidCol), col(qEmbCol), col(cidCol).as("cell"))
    // equi-join on cell — at scale this is partition pruning, not a shuffle
    // of the collection (cell count << row count; probe side broadcast).
    val wK = Window.partitionBy(col(qidCol)).orderBy(col("dist").asc, col(idCol).asc)
    broadcast(probes)
      .join(assigned, Seq("cell"))
      .withColumn("dist", l2Fast(col(qEmbCol), col(embCol)))
      .withColumn("rk", row_number().over(wK))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("rk"), round(col("dist"), 4).as("dist"))
  }

  /** Persist the assignment as a cell-partitioned parquet table. At
    * scale this IS the index: a probe of nprobe cells becomes parquet
    * partition pruning — the scan reads nprobe/numCells of the data and
    * never touches the rest.
    */
  def writePartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Search against the partitioned index with DYNAMIC partition
    * pruning: the probe frame (queries × centroids — tiny, broadcast) is
    * equi-joined to the cell-partitioned scan on the partition column,
    * and Catalyst's PartitionPruning rule reuses the broadcast as a
    * runtime partition filter on the scan — only probed cells are read,
    * with NO separate driver job enumerating cell ids first (pre-r8 this
    * collected the probe cells and pushed a static `isin`: one extra
    * job per search and the dominant ~430ms fixed term in the probe
    * latency curve at small n — docs/CURVES.md). SearchSpec pins
    * `dynamicpruning` in the scan's PartitionFilters so a Catalyst
    * regression can't silently fall back to a full scan.
    */
  def searchPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val wC = Window.partitionBy(col("qid")).orderBy(col("cdist").asc, col("cid").asc)
    val probes = queries
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", l2Fast(col("qemb"), col("cemb")))
      .withColumn("crk", row_number().over(wC))
      .filter(col("crk") <= nprobe)
      .select(col("qid"), col("qemb"), col("cid").as("cell"))
    val index = spark.read.parquet(indexPath)
    val wK = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id").asc)
    broadcast(probes)
      .join(index, Seq("cell"))
      .withColumn("dist", l2Fast(col("qemb"), col("embedding")))
      .withColumn("rk", row_number().over(wK))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("rk"), round(col("dist"), 4).as("dist"))
  }

  /** Deterministic seed centroids: the first k rows by id (a real system
    * would k-means; seeded selection keeps the operator oracle-equal).
    */
  def seedCentroids(
      collection: DataFrame,
      numCells: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    collection
      .filter(col(idCol) < numCells)
      .select(col(idCol).cast("int").as("cid"), col(embCol).as("cemb"))

  /** Trained centroids via MLlib KMeans (fixed seed → deterministic).
    * Better-balanced cells than seeded selection — the production path;
    * not SQL-oracle-able (KMeans|| init is engine-specific), so covered
    * by recall-floor tests instead.
    */
  def kmeansCentroids(
      collection: DataFrame,
      numCells: Int,
      embCol: String = "embedding",
      seed: Long = 42L,
      maxIter: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val spark = collection.sparkSession
    val withVec = collection.select(array_to_vector(col(embCol)).as("__vec"))
    val model = new KMeans()
      .setK(numCells).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("__vec")
      .fit(withVec)
    val rows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    import spark.implicits._
    rows.toSeq.toDF("cid", "cemb")
  }
}
