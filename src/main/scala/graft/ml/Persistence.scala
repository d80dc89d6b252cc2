package graft.ml

import org.apache.spark.sql.SparkSession

/** Model persistence — the {hyper_params, model_params} split of the
  * reference (`/root/reference/tslearn/bases/bases.py:63-286`) mapped to
  * Spark-style storage: JSON metadata + Parquet arrays. */
object Persistence {

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def saveKMeans(spark: SparkSession, model: TimeSeriesKMeans#Model,
                 hyper: Map[String, String], path: String): Unit = {
    import spark.implicits._
    val meta = hyper.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", s""","inertia": ${model.inertia}}""")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$path/metadata.json"), meta)
    model.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids.parquet")
  }

  def loadKMeansCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids.parquet")
      .orderBy("cluster").select("centroid").as[Array[Double]].collect()
  }

  def loadMetadata(path: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(s"$path/metadata.json"))
}
