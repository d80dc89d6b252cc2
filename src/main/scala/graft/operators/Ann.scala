package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TsFunctions

/** Approximate / exact nearest-neighbor search over embedding columns.
  *
  * - brute: crossJoin(broadcast(queries)) + window top-k. The baseline and
  *   the verifier for the approximate paths.
  * - IVF: coarse k-means centroids (trained on a driver sample), every
  *   vector assigned to its cell once; queries probe the nprobe nearest
  *   cells only, so the scan cost drops by ~nlist/nprobe. The cell
  *   assignment is an equi-join key — at 100TB this is the difference
  *   between a full-table scan per query batch and a partition-pruned one.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query. */
  def bruteTopK(candidates: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries.select(
        col(idCol).as("query_id"), col(vecCol).as("qv"))))
      .select(col("query_id"), col(idCol).as("cand_id"),
        TsFunctions.cosineSim(col("qv"), col(vecCol)).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Train nlist coarse centroids on a driver-side sample (euclidean
    * k-means via the TimeSeriesKMeans estimator — embeddings are just
    * equal-length series). */
  def trainCoarse(df: DataFrame, nlist: Int, seed: Long = 0L,
                  idCol: String = "vec_id", vecCol: String = "v"): Array[Array[Double]] = {
    val model = new graft.ml.TimeSeriesKMeans(k = nlist, metric = "euclidean",
      maxIter = 10, seed = seed)
      .fit(df.select(col(idCol).as("series_id"), col(vecCol).as("values")))
    model.centroids
  }

  /** Assign each vector to its nearest coarse cell: one broadcast pass. */
  def ivfAssign(df: DataFrame, centroids: Array[Array[Double]],
                idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    graft.ml.TimeSeriesKMeans.assign(
      df.select(col(idCol).as("series_id"), col(vecCol).as("values")),
      centroids, "euclidean", 0.0)
      .select(col("series_id").as(idCol), col("cluster").as("cell"))
  }

  /** IVF search: probe the nprobe nearest cells per query. Returns the
    * same schema as bruteTopK. Recall < 1 by construction; verified ≥
    * threshold against brute in tests. */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, k: Int,
              centroids: Array[Array[Double]], nprobe: Int,
              idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val cells = ivfAssign(candidates, centroids, idCol, vecCol)
    val cands = candidates.join(cells, idCol)
    // nprobe nearest cells per query (tiny: nlist × nQueries on driver-side broadcast)
    val qCells = graft.ml.TimeSeriesKMeans.assign(
      queries.select(col(idCol).as("series_id"), col(vecCol).as("values")),
      centroids, "euclidean", 0.0) // nearest cell only
    val spark = candidates.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    import spark.implicits._
    val probeUdf = udf((q: scala.collection.Seq[Double]) => {
      val cs = bc.value
      cs.indices.map(i => (i, graft.kernels.Kernels.euclidean(
          cs(i).map(Array(_)), q.map(Array(_)).toArray)))
        .sortBy(_._2).take(nprobe).map(_._1).toArray
    })
    val qProbes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(probeUdf(col("qv"))))
    val scored = cands.join(qProbes, "cell")
      .select(col("query_id"), col(idCol).as("cand_id"),
        TsFunctions.cosineSim(col("qv"), col(vecCol)).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
