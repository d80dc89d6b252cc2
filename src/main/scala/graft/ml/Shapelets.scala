package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Shapelet transform + classifier — semantics of
  * `/root/reference/tslearn/shapelets/shapelets.py:212-887`, Spark-first:
  *
  *  - shapelet → feature = min over positions of ‖patch − shapelet‖²/len
  *    (the `LocalSquaredDistanceLayer` + `GlobalMinPooling1D` pair,
  *    `shapelets.py:115-155,28-55`) — computed as ONE kernel call per row
  *    over the broadcast shapelet set, no per-(row,shapelet) join.
  *  - shapelet init = k-means over sampled segments
  *    (`shapelets.py:78-109`); sizes from the Grabocka heuristic
  *    (`:158-209`).
  *  - classification head = MLlib LogisticRegression on the transform
  *    features (replaces the Keras logistic head; the end-to-end gradient
  *    refinement of shapelet positions is documented future work,
  *    SURVEY §7.4).
  */
object Shapelets {

  /** Grabocka-heuristic shapelet sizes: l ≈ 0.15·sz, a few scales —
    * `shapelets.py:158-209` simplified to its published shape. */
  def suggestSizes(sz: Int, nScales: Int = 2): Seq[Int] =
    (1 to nScales).map(s => math.max(2, (0.15 * s * sz).toInt)).distinct

  /** Sample candidate segments and k-means them into shapelets (driver
    * side on a bounded sample — shapelet sets are small by design). */
  def initShapelets(df: DataFrame, sizes: Seq[Int], perSize: Int,
                    seed: Long = 0L, seriesCol: String = "values"): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    // seeded whole-dataset sample, not .take — take(200) reads the first
    // partition only, so sorted/partitioned input biases the shapelet pool
    val ds = df.select(col(seriesCol).cast("array<double>")).as[Array[Double]]
    val sampled = ds.sample(withReplacement = false, 0.2, seed).take(200)
    val sample = if (sampled.length >= 50) sampled else ds.take(200)
    val rng = new scala.util.Random(seed)
    sizes.flatMap { sz =>
      val segs = for {
        s <- sample.toSeq if s.length >= sz
        _ <- 1 to 4
      } yield {
        val start = rng.nextInt(s.length - sz + 1)
        java.util.Arrays.copyOfRange(s, start, start + sz)
      }
      // tiny local k-means to pick perSize representative segments
      kmeansLocal(segs.toArray, perSize, rng)
    }.toArray
  }

  private def kmeansLocal(xs: Array[Array[Double]], k: Int, rng: scala.util.Random,
                          iters: Int = 10): Array[Array[Double]] = {
    if (xs.isEmpty) return Array.empty
    var centers = Array.tabulate(math.min(k, xs.length))(i => xs(rng.nextInt(xs.length)).clone())
    for (_ <- 1 to iters) {
      val assign = xs.map(x => centers.indices.minBy(c => sqDist(centers(c), x)))
      centers = centers.indices.map { c =>
        val members = xs.indices.filter(assign(_) == c)
        if (members.isEmpty) xs(rng.nextInt(xs.length)).clone()
        else {
          val out = new Array[Double](centers(c).length)
          members.foreach(m => xs(m).indices.foreach(i => out(i) += xs(m)(i)))
          out.map(_ / members.length)
        }
      }.toArray
    }
    centers
  }

  @inline private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Sliding min normalized squared distance of one shapelet within a
    * series (`shapelets.py:115-155` semantics). */
  def minDist(series: Array[Double], shapelet: Array[Double]): Double = {
    val m = shapelet.length
    if (series.length < m) return Double.PositiveInfinity
    var best = Double.PositiveInfinity
    var pos = 0
    while (pos <= series.length - m) {
      var s = 0.0; var i = 0
      while (i < m) { val d = series(pos + i) - shapelet(i); s += d * d; i += 1 }
      if (s < best) best = s
      pos += 1
    }
    best / m
  }

  /** Position of the best match (`locate`, `shapelets.py:560-585`). */
  def locate(series: Array[Double], shapelet: Array[Double]): Int = {
    val m = shapelet.length
    var best = Double.PositiveInfinity; var bestPos = 0
    var pos = 0
    while (pos <= series.length - m) {
      var s = 0.0; var i = 0
      while (i < m) { val d = series(pos + i) - shapelet(i); s += d * d; i += 1 }
      if (s < best) { best = s; bestPos = pos }
      pos += 1
    }
    bestPos
  }

  /** Shapelet-transform a series DataFrame: one feature column per
    * shapelet (single UDF call per row over the broadcast shapelet set). */
  def transform(df: DataFrame, shapelets: Array[Array[Double]],
                seriesCol: String = "values"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(shapelets)
    val f = udf((s: scala.collection.Seq[Double]) => {
      val arr = s.toArray
      bc.value.map(sh => minDist(arr, sh))
    })
    df.withColumn("shapelet_features", f(col(seriesCol)))
  }

  case class Model(shapelets: Array[Array[Double]],
                   lr: org.apache.spark.ml.classification.LogisticRegressionModel,
                   labels: Array[String]) {
    def predict(df: DataFrame, seriesCol: String = "values"): DataFrame = {
      val feats = transform(df, shapelets, seriesCol)
      val assembled = feats.withColumn("features",
        arrayToVectorUdf(col("shapelet_features")))
      val out = lr.transform(assembled)
      val labelMap = labels
      val toLabel = udf((i: Double) => labelMap(i.toInt))
      out.select(col("series_id"), toLabel(col("prediction")).as("label"))
    }
  }

  private val arrayToVectorUdf = udf((a: scala.collection.Seq[Double]) =>
    org.apache.spark.ml.linalg.Vectors.dense(a.toArray))

  /** Fit: init shapelets, transform, logistic head. Input needs
    * (series_id, values, label STRING). */
  def fit(df: DataFrame, perSize: Int = 4, seed: Long = 0L): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val sz = df.select(size(col("values"))).as[Int].head()
    val shapelets = initShapelets(df, suggestSizes(sz), perSize, seed)
    val labels = df.select(col("label").cast("string")).distinct()
      .as[String].collect().sorted
    val labelIdx = labels.zipWithIndex.toMap
    val toIdx = udf((l: String) => labelIdx(l).toDouble)
    // LR runs ~50 treeAggregate jobs over the tiny feature table; size
    // partitions to the data (~10k rows each) so iteration cost is the
    // aggregation, not empty-task scheduling (32 near-empty tasks × 50
    // iterations dominated ts_shapelet_classify's bench time)
    val n = df.count()
    val nPart = math.max(1, math.min(spark.sparkContext.defaultParallelism, n / 10000).toInt)
    val feats = transform(df, shapelets)
      .withColumn("features", arrayToVectorUdf(col("shapelet_features")))
      .withColumn("label_idx", toIdx(col("label").cast("string")))
      .select("series_id", "features", "label_idx")
      .repartition(nPart).cache()
    feats.count()
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label_idx")
      .setMaxIter(50).setRegParam(0.01)
      .fit(feats)
    feats.unpersist()
    Model(shapelets, lr, labels)
  }
}
