package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TsFunctions

/** Variable-length integration suite — the engine-side mirror of the
  * reference's `tslearn/tests/test_variablelength.py:1-94`: ragged
  * datasets through kNN (dtw / softdtw), SVM (gak), kernel k-means and
  * dtw k-means end to end. Ragged series are NATIVE here (arrays of
  * different sizes per row, no NaN padding — SURVEY §1.3), and the
  * VARIABLE_LENGTH_METRICS contract (`metrics/__init__.py:29`) is
  * enforced the other way too: equal-length-only metrics reject ragged
  * input (`kmeans.py:559-562`). */
class VariableLengthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Two well-separated classes of RAGGED series (lengths 10..19):
    * class 0 = slow sine, class 1 = offset cosine. */
  private lazy val ragged: DataFrame = {
    val rng = new scala.util.Random(7)
    val rows = (0 until 24).map { i =>
      val cls = i % 2
      val sz = 10 + rng.nextInt(10)
      val vs = Array.tabulate(sz)(t =>
        if (cls == 0) math.sin(t * 0.4) + 0.05 * rng.nextGaussian()
        else 2.0 + math.cos(t * 0.4) + 0.05 * rng.nextGaussian())
      (i.toLong, vs, s"c$cls")
    }
    rows.toDF("series_id", "values", "label").cache()
  }

  test("ragged fixture really is ragged") {
    val sizes = ragged.select(size(col("values"))).as[Int].collect().toSet
    assert(sizes.size > 1, s"fixture must have multiple lengths, got $sizes")
  }

  test("LB-pruned kNN routes reject ragged input loudly (dtw_variants.py:1248-1251)") {
    import graft.operators.Cdist
    // a silently-wrong LB on sz1 != sz2 would prune true neighbors; the
    // contract is an error that names the ragged-capable route
    def messageChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val eBroadcast = intercept[Exception] {
      Cdist.knnDtwPruned(ragged, ragged, k = 2, radius = 3).collect()
    }
    assert(messageChain(eBroadcast).contains("knnDtwRagged"), messageChain(eBroadcast))
    val eBlocked = intercept[Exception] {
      Cdist.knnDtwPruned(ragged, ragged, k = 2, radius = 3,
        maxIndexRows = 0, blocks = 3).collect()
    }
    assert(messageChain(eBlocked).contains("knnDtwRagged"), messageChain(eBlocked))
  }

  test("knnDtwRagged == exact window kNN on ragged input; blocked route identical") {
    import graft.operators.Cdist
    val exact = Cdist.knn(ragged, ragged, k = 3, (a, b) => TsFunctions.dtwUdf(a, b))
      .select("probe_id", "rank", "neighbor_id", "dist")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val got = Cdist.knnDtwRagged(ragged, ragged, k = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.length == exact.length)
    exact.zip(got).foreach { case (e, g) =>
      assert(e._1 == g._1 && e._2 == g._2 && e._3 == g._3, s"hit mismatch $e vs $g")
      assert(math.abs(e._4 - g._4) < 1e-12, s"dist mismatch $e vs $g")
    }
    for (blocks <- Seq(1, 3, 5)) {
      val blocked = Cdist.knnDtwRaggedBlocked(ragged, ragged, k = 3,
          radius = -1, blocks = blocks)
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(blocked.length == exact.length, s"blocks=$blocks row count")
      exact.zip(blocked).foreach { case (e, g) =>
        assert(e._1 == g._1 && e._2 == g._2 && e._3 == g._3,
          s"blocks=$blocks hit mismatch $e vs $g")
        assert(math.abs(e._4 - g._4) < 1e-12, s"blocks=$blocks dist mismatch $e vs $g")
      }
    }
    // the dispatch itself: past maxIndexRows the ragged route must not
    // broadcast the train relation
    val guarded = Cdist.knnDtwRagged(ragged, ragged, k = 3, maxIndexRows = 5)
    assert(!guarded.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
  }

  test("kNN-DTW classifies ragged series (test_variablelength kNN leg)") {
    Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column](
      (a, b) => TsFunctions.dtwUdf(a, b),
      (a, b) => TsFunctions.softDtwUdf(a, b, lit(1.0))
    ).foreach { metric =>
      val pred = graft.ml.KNeighbors.classify(
        ragged.where(col("series_id") < 8),
        ragged.where(col("series_id") >= 8), k = 3, metric)
      val acc = pred.join(ragged.select(col("series_id"), col("label").as("y")),
          pred("probe_id") === col("series_id"))
        .select(avg(when(col("label") === col("y"), 1.0).otherwise(0.0)))
        .head().getDouble(0)
      assert(acc == 1.0, s"ragged kNN accuracy $acc")
    }
  }

  test("GAK SVC fits and predicts ragged series (SVM leg)") {
    val m = graft.ml.TimeSeriesSVC.fit(ragged, c = 1.0, sigma = 2.0)
    val pred = graft.ml.TimeSeriesSVC.predict(m, ragged, ragged)
    val acc = pred.join(ragged.select(col("series_id"), col("label").as("y")), "series_id")
      .select(avg(when(col("label") === col("y"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.9, s"ragged GAK SVC train accuracy $acc")
  }

  test("kernel k-means and DTW k-means cluster ragged series (clustering leg)") {
    val unlabeled = ragged.drop("label")
    val kk = new graft.ml.KernelKMeans(k = 2, maxIter = 6, sigma = 2.0, seed = 1)
      .fit(unlabeled)
    assert(kk.select("cluster").distinct().count() == 2)
    val km = new graft.ml.TimeSeriesKMeans(k = 2, metric = "dtw", maxIter = 4,
      barycenterMaxIter = 3, seed = 1).fit(unlabeled)
    val assigned = km.predict(unlabeled)
    assert(assigned.count() == 24)
    assert(assigned.select("cluster").distinct().count() == 2)
    // clusters must separate the two generating processes perfectly
    val purity = assigned
      .join(ragged.select(col("series_id"), col("label")), "series_id")
      .groupBy("cluster").agg(countDistinct("label").as("nl"))
      .select(max("nl")).head().getLong(0)
    assert(purity == 1L, "each DTW k-means cluster should be label-pure")
  }

  test("equal-length-only metrics reject ragged input (kmeans.py:559-562)") {
    val e = intercept[Exception] {
      ragged.select(TsFunctions.euclideanUdf(col("values"),
        reverse(slice(col("values"), 1, 5)))).collect()
    }
    assert(e.getMessage.contains("equal-size") ||
      e.getCause != null && e.getCause.getMessage.contains("equal-size"))
  }
}
