package graft.query

import graft.functions.cosine_sim
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the second scale path for similarity
  * search next to [[AnnIndex]]'s LSH: k-means coarse centroids over
  * L2-normalized vectors, index rows stored parquet-partitioned BY CELL,
  * queries probe only their `nProbe` nearest cells.
  *
  * 100 TB shape: the build is one KMeans fit (sampled, seed-fixed) + one
  * assignment pass + a partitioned write; a query batch touches
  * `nProbe / nCentroids` of the index files — the partition filter on
  * `centroid_id` prunes whole directories at the source, which is the
  * property LSH bucketing cannot give a columnar store. Recall is
  * probabilistic (a neighbor in an unprobed cell is missed); returned
  * similarities are exact.
  */
object IvfIndex {

  case class Params(
      nCentroids: Int = 16,
      maxIter: Int = 20,
      seed: Long = 42L)

  /** Fit centroids, assign every vector, persist model + cells
    * (parquet partitioned by centroid_id).
    */
  def build(
      df: DataFrame,
      idCol: String,
      embCol: String,
      outPath: String,
      params: Params = Params()): KMeansModel = {
    val prep = AnnIndex.prepared(df, idCol, embCol)
    val model = new KMeans()
      .setK(params.nCentroids)
      .setMaxIter(params.maxIter)
      .setSeed(params.seed)
      .setFeaturesCol("features")
      .setPredictionCol("centroid_id")
      .fit(prep)
    model.write.overwrite().save(s"$outPath/model")
    model.transform(prep)
      .select(col(idCol), col(embCol), col("centroid_id"))
      .write.partitionBy("centroid_id").mode("overwrite")
      .parquet(s"$outPath/cells")
    model
  }

  /** Batch top-k against a built IVF index: rank centroids per query
    * (tiny broadcast cross join), probe the top-`nProbe` cells via a
    * join on the partition column (dynamic partition pruning skips the
    * rest of the index), verify with exact cosine, window top-k.
    */
  def queryTopK(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      threshold: Double,
      nProbe: Int = 4): DataFrame = {
    val model = KMeansModel.load(s"$indexPath/model")
    import spark.implicits._
    val centersDf = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("centroid_id", "center")

    // Probe ranking MUST use the assignment metric: cells were assigned
    // by Euclidean distance of the NORMALIZED vector to the centroid
    // (centroids are means of unit vectors, so their norms differ and
    // cosine ranking would probe different cells than assignment used,
    // systematically missing neighbors the index contains).
    val qNorm = graft.query.AnnIndex.prepared(
        queries.select(col(queryIdCol), col(queryVecCol).as("__qv")), queryIdCol, "__qv")
      .select(col(queryIdCol), col("__qv").as(queryVecCol),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .cast("array<float>").as("__qnorm"))
    val wCent = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cdist").asc, col("centroid_id").asc)
    val probes = qNorm.crossJoin(centersDf)
      .withColumn("cdist", graft.functions.l2_dist_sq(col("__qnorm"), col("center")))
      .withColumn("crank", row_number().over(wCent))
      .filter(col("crank") <= nProbe)
      .select(col(queryIdCol), col(queryVecCol), col("centroid_id"))

    val cells = spark.read.parquet(s"$indexPath/cells")
    val wTop = Window.partitionBy(col(queryIdCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    cells.join(broadcast(probes), "centroid_id")
      .withColumn("sim", cosine_sim(col(embCol), col(queryVecCol)))
      .filter(col("sim") > threshold)
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("sim"), col("rn"))
  }
}
