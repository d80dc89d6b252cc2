package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TsFunctions

/** All-pairs metric θ-join machinery — the reference's only join shape
  * (`/root/reference/tslearn/metrics/utils.py:8-85`, SURVEY §2.4).
  *
  * Scale design: the pair space is the product of the two inputs; the
  * small side (centroids, probes, shapelets — almost always ≪ the data)
  * is broadcast so NO shuffle of the big side happens. Self-joins compute
  * the upper triangle only (`a.id <= b.id`) and mirror, halving kernel
  * work exactly like `_cdist_generic`'s k=0/1 triangle optimization.
  */
object Cdist {

  /** Cross distance: every row of `left` × every row of `right`, distance
    * via `metric(leftSeries, rightSeries)`. `right` is broadcast — callers
    * put the smaller side there. Output: (left_id, right_id, dist). */
  def cross(left: DataFrame, right: DataFrame, metric: (Column, Column) => Column,
            seriesCol: String = "values"): DataFrame = {
    val l = left.select(col("series_id").as("left_id"), col(seriesCol).as("lv"))
    val r = right.select(col("series_id").as("right_id"), col(seriesCol).as("rv"))
    l.crossJoin(broadcast(r))
      .select(col("left_id"), col("right_id"), metric(col("lv"), col("rv")).as("dist"))
  }

  /** Symmetric self cross-distance, upper-triangle + mirror. The triangle
    * join halves the O(n²) kernel evaluations; the mirror is a cheap
    * column swap union (no recompute). Diagonal dist is 0 for true
    * metrics; pass computeDiagonal=false to skip it (as `compute_diagonal`
    * does). */
  def selfCross(ds: DataFrame, metric: (Column, Column) => Column,
                seriesCol: String = "values", computeDiagonal: Boolean = true): DataFrame = {
    val l = ds.select(col("series_id").as("left_id"), col(seriesCol).as("lv"))
    val r = ds.select(col("series_id").as("right_id"), col(seriesCol).as("rv"))
    val upper = l.crossJoin(broadcast(r))
      .where(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"), metric(col("lv"), col("rv")).as("dist"))
    val mirrored = upper.select(col("right_id").as("left_id"), col("left_id").as("right_id"), col("dist"))
    val diag =
      if (computeDiagonal)
        ds.select(col("series_id").as("left_id"), col("series_id").as("right_id"), lit(0.0).as("dist"))
      else ds.sparkSession.emptyDataFrame
        .select(lit(0L).as("left_id"), lit(0L).as("right_id"), lit(0.0).as("dist")).limit(0)
    upper.unionAll(mirrored).unionAll(diag)
  }

  /** Normalized soft-DTW cross-distance:
    * D(x,y) − ½(D(x,x) + D(y,y)) — `cdist_soft_dtw_normalized`
    * (`softdtw_variants.py:451-605`). The self-distances are computed
    * once per side and joined back (the reference's diagonal reuse). */
  def softDtwNormalized(left: DataFrame, right: DataFrame, gamma: Double,
                        seriesCol: String = "values"): DataFrame = {
    import graft.functions.TsFunctions
    val lSelf = left.select(col("series_id").as("left_id"),
      col(seriesCol).as("lv"),
      TsFunctions.softDtwUdf(col(seriesCol), col(seriesCol), lit(gamma)).as("l_self"))
    val rSelf = right.select(col("series_id").as("right_id"),
      col(seriesCol).as("rv"),
      TsFunctions.softDtwUdf(col(seriesCol), col(seriesCol), lit(gamma)).as("r_self"))
    lSelf.crossJoin(broadcast(rSelf))
      .select(col("left_id"), col("right_id"),
        (TsFunctions.softDtwUdf(col("lv"), col("rv"), lit(gamma))
          - (col("l_self") + col("r_self")) / 2).as("dist"))
  }

  /** k-NN: for each probe, the k nearest train series under `metric` —
    * `neighbors/neighbors.py:81-169`. crossJoin(broadcast(train)) + window
    * top-k; ties broken by train id for determinism. */
  def knn(probes: DataFrame, train: DataFrame, k: Int,
          metric: (Column, Column) => Column, seriesCol: String = "values"): DataFrame = {
    val d = cross(probes, train, metric, seriesCol)
    val w = Window.partitionBy(col("left_id")).orderBy(col("dist").asc, col("right_id").asc)
    d.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("left_id").as("probe_id"), col("rank"), col("right_id").as("neighbor_id"), col("dist"))
  }

  /** DTW k-NN with LB_Keogh pre-pruning (equal-length series required for
    * the bound) — the reference's lower-bound optimization
    * (`dtw_variants.py:1224-1296`) as a pre-join filter: the cheap O(n)
    * bound prunes candidates before the O(n²) DTW runs. `factor` keeps
    * k·factor candidates per probe by LB before the exact metric. */
  def knnDtwPruned(probes: DataFrame, train: DataFrame, k: Int, radius: Int,
                   factor: Int = 4, seriesCol: String = "values"): DataFrame = {
    val l = probes.select(col("series_id").as("left_id"), col(seriesCol).as("lv"))
    // envelope precomputed ONCE per train series (O(n·r) each), so the
    // per-pair bound is a cheap O(n) band check — computing the envelope
    // inside the pair loop costs train_count× more at no benefit
    val r = train.select(col("series_id").as("right_id"), col(seriesCol).as("rv"),
      TsFunctions.envelopeUdf(col(seriesCol), lit(radius)).as("env"))
    val pairs = l.crossJoin(broadcast(r))
      .withColumn("lb", graft.functions.NativeExpressions.lbKeoghNative(
        col("lv"), col("env._1"), col("env._2")))
      .drop("env")
    val wLb = Window.partitionBy(col("left_id")).orderBy(col("lb").asc, col("right_id").asc)
    val candidates = pairs.withColumn("lb_rank", row_number().over(wLb))
      .where(col("lb_rank") <= k * factor)
    val exact = candidates.withColumn("dist",
      graft.functions.NativeExpressions.dtwNative(col("lv"), col("rv"), radius))
    val w = Window.partitionBy(col("left_id")).orderBy(col("dist").asc, col("right_id").asc)
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("left_id").as("probe_id"), col("rank"), col("right_id").as("neighbor_id"), col("dist"))
  }
}
