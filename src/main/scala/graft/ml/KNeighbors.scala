package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Cdist

/** k-NN time-series classifier / regressor — semantics of
  * `/root/reference/tslearn/neighbors/neighbors.py:19-717` (brute-force
  * only, like the reference's `algorithm='brute'`).
  *
  * Spark plan (SURVEY §3.1): `probes.crossJoin(broadcast(train))` → metric
  * kernel → window top-k → grouped vote. One broadcast, one shuffle.
  * Weights: "uniform" or "distance" (1/d, matching `neighbors.py:362-372`).
  */
object KNeighbors {

  /** Classify: train must have (series_id, values, label). */
  def classify(probes: DataFrame, train: DataFrame, k: Int,
               metric: (Column, Column) => Column,
               weights: String = "uniform"): DataFrame = {
    val nn = Cdist.knn(probes, train, k, metric)
      .join(train.select(col("series_id").as("neighbor_id"), col("label")), "neighbor_id")
    val w = weights match {
      case "distance" => when(col("dist") === 0, lit(1e12)).otherwise(lit(1.0) / col("dist"))
      case _ => lit(1.0)
    }
    nn.groupBy(col("probe_id"), col("label"))
      .agg(sum(w).as("votes"))
      .groupBy("probe_id")
      // deterministic tie-break: highest votes, then smallest label
      .agg(min_by(col("label"), struct((-col("votes")).as("nv"), col("label"))).as("label"))
  }

  /** Regress: train must have (series_id, values, y DOUBLE). */
  def regress(probes: DataFrame, train: DataFrame, k: Int,
              metric: (Column, Column) => Column,
              weights: String = "uniform"): DataFrame = {
    val nn = Cdist.knn(probes, train, k, metric)
      .join(train.select(col("series_id").as("neighbor_id"), col("y")), "neighbor_id")
    weights match {
      case "distance" =>
        val w = when(col("dist") === 0, lit(1e12)).otherwise(lit(1.0) / col("dist"))
        nn.groupBy("probe_id").agg((sum(col("y") * w) / sum(w)).as("y_pred"))
      case _ =>
        nn.groupBy("probe_id").agg(avg("y").as("y_pred"))
    }
  }
}
