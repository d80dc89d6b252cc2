package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Cdist
import graft.functions.TsFunctions

/** Kernel k-means with a GAK (or any precomputed) kernel — semantics of
  * `/root/reference/tslearn/clustering/kmeans.py:136-457`.
  *
  * The gram is materialized once as a pairs DataFrame (i, j, k_ij) —
  * at scale this is the expensive O(n²) self-join, done triangle+mirror.
  * Each iteration computes, per sample i and cluster c, the kernel-trick
  * distance  K_ii − 2·Σ_{j∈c} K_ij/|c| + Σ_{j,l∈c} K_jl/|c|²
  * (`_compute_dist`, `kmeans.py:390-405`) via two grouped aggregations —
  * no per-pair recomputation of the kernel.
  */
class KernelKMeans(val k: Int, val maxIter: Int = 10, val tol: Double = 1e-6,
                   val sigma: Double = 1.0, val seed: Long = 0L) extends Serializable {

  /** Fit on (series_id, values); returns assignments (series_id, cluster). */
  def fit(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // gram: normalized GAK so diag = 1
    val gram = Cdist.selfCross(df,
      (a, b) => TsFunctions.gakUdf(a, b, lit(sigma)), computeDiagonal = false)
      .union(df.select(col("series_id").as("left_id"), col("series_id").as("right_id"),
        lit(1.0).as("dist")))
      .withColumnRenamed("dist", "k_ij")
      .cache()

    // deterministic random init labels
    var labels = df.select(col("series_id"),
      pmod(xxhash64(col("series_id"), lit(seed)), lit(k)).cast("int").as("cluster"))
      .cache()
    var prevInertia = Double.PositiveInfinity
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val withC = gram.join(labels.select(col("series_id").as("right_id"), col("cluster")), "right_id")
      // term2(i, c) = Σ_{j in c} K_ij / |c|
      val sums = withC.groupBy(col("left_id"), col("cluster"))
        .agg(sum("k_ij").as("s"), count(lit(1)).as("cnt"))
      // term3(c) = Σ_{j,l in c} K_jl / |c|^2 : aggregate over pairs both in c
      val bothIn = gram
        .join(labels.select(col("series_id").as("left_id"), col("cluster").as("lc")), "left_id")
        .join(labels.select(col("series_id").as("right_id"), col("cluster").as("rc")), "right_id")
        .where(col("lc") === col("rc"))
        .groupBy(col("lc").as("cluster"))
        .agg(sum("k_ij").as("s3"), countDistinct("left_id").as("csz"))
      val dists = sums.join(broadcast(bothIn), "cluster")
        .select(col("left_id"), col("cluster"),
          (lit(1.0) - lit(2.0) * col("s") / col("cnt") + col("s3") / (col("csz") * col("csz"))).as("d2"))
      val newLabels = dists
        .groupBy(col("left_id").as("series_id"))
        .agg(min_by(col("cluster"), struct(col("d2"), col("cluster"))).as("cluster"))
        .cache()
      val inertia = dists.groupBy("left_id").agg(min("d2").as("d2"))
        .agg(sum("d2")).head().getDouble(0)
      newLabels.count()
      labels.unpersist()
      labels = newLabels
      if (prevInertia - inertia < tol) done = true
      prevInertia = inertia
      iter += 1
    }
    gram.unpersist()
    labels
  }
}
