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
                   val sigma: Double = 1.0, val seed: Long = 0L,
                   val blocks: Int = 0,
                   val init: String = "random",
                   // kernel: "gak" (reference default, sigma-parameterized)
                   // or "rbf" (exp(-gamma*||x-y||^2), the sklearn
                   // pairwise-kernel route of kmeans.py kernel_params;
                   // equal lengths required). rbf's gram is a pure
                   // codegen'd zip_with/aggregate expression - no UDF.
                   val kernel: String = "gak",
                   val gamma: Double = 1.0) extends Serializable {

  require(Seq("gak", "rbf").contains(kernel), s"bad kernel $kernel")

  /** Pairwise kernel as a Column expression (the gram build). */
  private def kernelExpr(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    kernel match {
      case "rbf" => exp(lit(-gamma) * aggregate(
        zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
      case _ => TsFunctions.gakUdf(a, b, lit(sigma))
    }

  /** The same kernel as a driver-side scalar (Model.predict path). */
  private[ml] def kernelScalar(x: Array[Double], y: Array[Double]): Double =
    kernel match {
      case "rbf" =>
        var ssd = 0.0
        var t = 0
        while (t < x.length) { val d = x(t) - y(t); ssd += d * d; t += 1 }
        math.exp(-gamma * ssd)
      case _ => graft.kernels.Kernels.gak(
        graft.kernels.Kernels.uni(x), graft.kernels.Kernels.uni(y), sigma)
    }

  /** New-point assignment: kernel-trick distance to each fitted cluster
    * using the stored training series/labels (`kmeans.py:407-457`
    * predict). `term3` is the fit-time within-cluster constant.
    *
    * CEILING: kernel-trick predict is inherently O(n_train) GAK kernels
    * PER PROBE ROW against the broadcast training set — the reference
    * has the same shape, and unlike kNN there is no index to prune with
    * (every train row contributes to its cluster's mean kernel). The
    * broadcast is n_train·sz doubles and each probe costs n_train·sz²
    * kernel work, so `maxTrainRows` guards the two ways this blows up
    * at scale (driver/executor OOM on the broadcast; per-row walls in
    * minutes). Past the guard the right tool is a parametric model —
    * TimeSeriesSVC.fitNystrom's landmark feature map is the documented
    * escape hatch (m landmarks instead of n_train). */
  case class Model(assignments: Array[(Long, Array[Double], Int)],
                   term3: Map[Int, Double], inertia: Double) extends Serializable {
    def predict(df: DataFrame, maxTrainRows: Int = 100000): DataFrame = {
      require(assignments.length <= maxTrainRows,
        s"KernelKMeans.predict carries the FULL ${assignments.length}-row " +
          s"training set into every task and runs O(n_train) GAK kernels per " +
          s"probe row (> maxTrainRows=$maxTrainRows). Subsample the training " +
          s"set, or switch to a landmark/Nystrom model " +
          s"(TimeSeriesSVC.fitNystrom) for predict at this scale.")
      val spark = df.sparkSession
      val t3 = term3
      val bc = spark.sparkContext.broadcast(assignments)
      val kf = kernelScalar _
      val f = udf((v: scala.collection.Seq[Double]) => {
        val x = v.toArray
        val sums = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
        val counts = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
        bc.value.foreach { case (_, tv, c) =>
          sums(c) += kf(x, tv)
          counts(c) += 1
        }
        t3.keys.toSeq.sorted.map { c =>
          (c, 1.0 - 2.0 * sums(c) / math.max(1, counts(c)) + t3(c))
        }.minBy { case (c, d) => (d, c) }._1
      })
      df.select(col("series_id"), f(col("values")).as("cluster"))
    }
  }

  /** Fit on (series_id, values); returns assignments (series_id, cluster). */
  def fit(df: DataFrame): DataFrame = fitInternal(df)._1.select("series_id", "cluster")

  /** Fit and return the final assignment WITH its kernel-trick distance
    * (series_id, cluster, d2) — the trace-oracle surface: with
    * init="mod" and tol=−∞ the whole fit is a deterministic
    * fixed-iteration replay (the ts_kernel_kmeans driver row). */
  def fitAssign(df: DataFrame): DataFrame = fitInternal(df)._1

  /** Fit and keep the predict-capable model (training series + labels +
    * per-cluster constants). needModel=true is the only caller of the
    * term3 collect and the final inertia — fit/fitAssign skip both. */
  def fitModel(df: DataFrame): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val (labels0, term3, inertia) = fitInternal(df, needModel = true)
    val labels = labels0.select("series_id", "cluster")
    val assigned = df.select(col("series_id").cast("long"), col("values").cast("array<double>"))
      .join(labels, "series_id")
      .as[(Long, Array[Double], Int)].collect()
    Model(assigned, term3, inertia)
  }

  private def fitInternal(df: DataFrame,
                          needModel: Boolean = false): (DataFrame, Map[Int, Double], Double) = {
    val spark = df.sparkSession
    // gram: normalized GAK so diag = 1. blocks > 0 switches to the
    // block-partitioned pair join — no broadcast of the full relation, so
    // the gram family is no longer capped at broadcast-sized inputs.
    val pairs =
      if (blocks > 0)
        Cdist.selfCrossBlocked(df, kernelExpr, blocks, computeDiagonal = false)
      else
        Cdist.selfCross(df, kernelExpr, computeDiagonal = false)
    // localCheckpoint, not cache: the gram feeds two join branches in
    // EVERY iteration — a cache substitutes the scan but leaves the full
    // lineage in each round's analyzed plan (re-planned per iteration,
    // the measured fixed cost of iterative local-mode loops)
    val gram = pairs
      .union(df.select(col("series_id").as("left_id"), col("series_id").as("right_id"),
        lit(1.0).as("dist")))
      .withColumnRenamed("dist", "k_ij")
      .localCheckpoint()

    // deterministic init labels: "random" = seeded hash; "mod" =
    // series_id % k — the SQL-replayable trace-oracle mode (the
    // KShape init="first" analogue)
    val initLabel =
      if (init == "mod") pmod(col("series_id"), lit(k)).cast("int")
      else pmod(xxhash64(col("series_id"), lit(seed)), lit(k)).cast("int")
    var labels = df.select(col("series_id"), initLabel.as("cluster"))
      .cache()
    var prevInertia = Double.PositiveInfinity
    var lastInertia = Double.PositiveInfinity
    var term3Map: Map[Int, Double] = Map.empty
    var iter = 0
    var done = false
    // tol = −∞ (the fixed-iteration trace mode every driver query runs)
    // can never early-stop: prev − inertia < −∞ is false for ALL doubles
    // (including NaN), so the per-iteration inertia reduce is a dead job
    // — skip it and, when the caller needs the model, compute the final
    // inertia once after the loop (guide §1.2: remove passes that
    // compute things thrown away).
    val needInertia = tol > Double.NegativeInfinity
    while (iter < maxIter && !done) {
      val withC = gram.join(labels.select(col("series_id").as("right_id"), col("cluster")), "right_id")
      // term2(i, c) = Σ_{j in c} K_ij / |c| — checkpointed because BOTH
      // the term3 derivation and the distance projection below read it
      // (without the checkpoint the gram-join-groupBy subtree runs twice
      // per iteration, one per consumer)
      val sums = withC.groupBy(col("left_id"), col("cluster"))
        .agg(sum("k_ij").as("s"), count(lit(1)).as("cnt"))
        .localCheckpoint()
      // term3(c) = Σ_{j,l in c} K_jl / |c|² — derived from `sums`
      // instead of re-joining the gram: Σ_{i∈c} term2sum(i, c) is the
      // same pair sum (each (j,l) with both in c counted once), so the
      // SECOND full gram scan + two joins per iteration collapse into a
      // broadcast-sized aggregation over the (n·k)-row sums relation
      // (guide §2.4: remove shuffles outright). cnt already equals |c|
      // on the rows where i ∈ c.
      val bothIn = sums
        .join(labels.select(col("series_id").as("left_id"), col("cluster").as("lc")), "left_id")
        .where(col("cluster") === col("lc"))
        .groupBy(col("cluster"))
        .agg(sum("s").as("s3"), count(lit(1)).as("csz"))
      val dists = sums.join(broadcast(bothIn), "cluster")
        .select(col("left_id"), col("cluster"),
          (lit(1.0) - lit(2.0) * col("s") / col("cnt") + col("s3") / (col("csz") * col("csz"))).as("d2"))
      // eager localCheckpoint: materializes AND truncates lineage, so
      // iteration r+1's plan starts from a leaf instead of replaying r
      // rounds of analysis
      val newLabels = dists
        .groupBy(col("left_id").as("series_id"))
        .agg(min_by(col("cluster"), struct(col("d2"), col("cluster"))).as("cluster"),
          min("d2").as("d2"))
        .localCheckpoint()
      labels.unpersist()
      labels = newLabels
      if (needInertia) {
        // inertia = Σ min-d2, read off the already-checkpointed
        // assignment frame (one cheap leaf scan)
        val inertia = newLabels.agg(sum("d2")).head().getDouble(0)
        lastInertia = inertia
        if (prevInertia - inertia < tol) done = true
        prevInertia = inertia
      }
      iter += 1
    }
    if (needModel) {
      if (!needInertia)
        lastInertia = labels.agg(sum("d2")).head().getDouble(0)
      // within-cluster constant of the FINAL labels (predict-time term3).
      // |c| comes from the n-row labels relation, NOT a countDistinct over
      // the n²-scale within-cluster gram rows (countDistinct forced an
      // expand + two-phase dedup over the pair relation; the member count
      // is the same integer — every member owns its diagonal row).
      val csz = labels.groupBy(col("cluster")).agg(count(lit(1)).as("csz"))
      term3Map = gram
        .join(labels.select(col("series_id").as("left_id"), col("cluster").as("lc")), "left_id")
        .join(labels.select(col("series_id").as("right_id"), col("cluster").as("rc")), "right_id")
        .where(col("lc") === col("rc"))
        .groupBy(col("lc").as("cluster"))
        .agg(sum("k_ij").as("s3"))
        .join(broadcast(csz), "cluster")
        .select(col("cluster"), (col("s3") / (col("csz") * col("csz"))).as("t3"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    gram.unpersist()
    (labels, term3Map, lastInertia)
  }
}
