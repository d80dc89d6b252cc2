package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLP classifier on flattened series — semantics of
  * `/root/reference/tslearn/neural_network/neural_network.py:9-168`
  * (flatten `(n, sz, d)` → `(n, sz·d)` then delegate), mapped to MLlib's
  * MultilayerPerceptronClassifier. Equal-length input required. */
object TimeSeriesMLP {

  private val toVec = udf((a: scala.collection.Seq[Double]) =>
    org.apache.spark.ml.linalg.Vectors.dense(a.toArray))

  case class Model(mlp: org.apache.spark.ml.classification.MultilayerPerceptronClassificationModel,
                   labels: Array[String]) {
    def predict(df: DataFrame): DataFrame = {
      val labelMap = labels
      val toLabel = udf((i: Double) => labelMap(i.toInt))
      mlp.transform(df.withColumn("features", toVec(col("values"))))
        .select(col("series_id"), toLabel(col("prediction")).as("label"))
    }
  }

  def fit(df: DataFrame, hidden: Seq[Int] = Seq(32), maxIter: Int = 100,
          seed: Long = 0L): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val sz = df.select(size(col("values"))).as[Int].head()
    val labels = df.select(col("label").cast("string")).distinct().as[String].collect().sorted
    val labelIdx = labels.zipWithIndex.toMap
    val toIdx = udf((l: String) => labelIdx(l).toDouble)
    val prepared = df
      .withColumn("features", toVec(col("values")))
      .withColumn("label_idx", toIdx(col("label").cast("string")))
    val mlp = new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
      .setLayers((Seq(sz) ++ hidden ++ Seq(labels.length)).toArray)
      .setFeaturesCol("features").setLabelCol("label_idx")
      .setMaxIter(maxIter).setSeed(seed)
      .fit(prepared)
    Model(mlp, labels)
  }
}
