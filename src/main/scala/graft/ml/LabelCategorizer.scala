package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Indicator-label ↔ categorical transformer — semantics of
  * `/root/reference/tslearn/utils/utils.py:528-636` (LabelCategorizer):
  * fit collects the sorted distinct labels into forward/backward maps;
  * transform one-hot-encodes (single column when binary and
  * `singleColumnIfBinary`); inverseTransform maps back.
  *
  * Spark-first: fit is one distinct aggregation; transform/inverse are
  * column expressions over the broadcast label table. */
class LabelCategorizer(val singleColumnIfBinary: Boolean = false) extends Serializable {

  case class Model(backwardMatch: Array[String], singleColumn: Boolean) extends Serializable {
    def forwardMatch: Map[String, Int] = backwardMatch.zipWithIndex.toMap

    /** label column → one-hot ARRAY<DOUBLE> column `y_onehot`. */
    def transform(df: DataFrame, labelCol: String = "label"): DataFrame = {
      val fm = forwardMatch
      val nC = backwardMatch.length
      val single = singleColumn && nC == 2
      val f = udf((l: String) => {
        val i = fm(l)
        if (single) Array(if (i == 0) 1.0 else 0.0)
        else Array.tabulate(nC)(c => if (c == i) 1.0 else 0.0)
      })
      df.withColumn("y_onehot", f(col(labelCol).cast("string")))
    }

    /** one-hot column → original label column `label_orig`. */
    def inverseTransform(df: DataFrame, onehotCol: String = "y_onehot"): DataFrame = {
      val bm = backwardMatch
      val single = singleColumn && bm.length == 2
      val f = udf((v: scala.collection.Seq[Double]) =>
        if (single) (if (v.head > 0.5) bm(0) else bm(1))
        else bm(v.zipWithIndex.maxBy(_._1)._2))
      df.withColumn("label_orig", f(col(onehotCol)))
    }
  }

  def fit(df: DataFrame, labelCol: String = "label"): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val labels = df.select(col(labelCol).cast("string")).distinct()
      .as[String].collect().sorted
    Model(labels, singleColumnIfBinary)
  }
}
