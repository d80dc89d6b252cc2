package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TsFunctions
import graft.model.TSModel

/** VERDICT r11 stretch 9 — A/B of the §7.4 partition-local DBA shortcut
  * inside the dtw-metric k-means fit: the distributed update runs
  * barycenterMaxIter aggregation rounds per Lloyd iteration (the
  * iterative-job floor dominates at small/medium clusters); the local
  * route is one shuffle + a local DBA loop per cluster. Same fit
  * everything else; wall + max centroid divergence reported.
  *
  * Usage: runMain graft.tools.DbaProbe <sfDir> [k lloydIters dbaIters repeat]
  */
object DbaProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 4
    val lloyd = if (args.length > 2) args(2).toInt else 3
    val dbaIters = if (args.length > 3) args(3).toInt else 10
    val repeat = if (args.length > 4) args(4).toInt else 2

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TsFunctions.register(spark)
    import spark.implicits._

    val series = TSModel.eventsToSeries(spark, dir)
      .select(col("series_id"),
        TsFunctions.resampleZnormUdf(col("values"), lit(16)).as("values"))
      .as[(Long, Array[Double])].cache()
    val n = series.count()
    System.err.println(s"[dbaprobe] $dir series=$n k=$k lloyd=$lloyd dbaIters=$dbaIters")

    def fit(local: Boolean): (Array[Array[Double]], Double) = {
      var best = Double.PositiveInfinity
      var cents: Array[Array[Double]] = null
      (1 to repeat).foreach { r =>
        val t0 = System.nanoTime()
        val m = new graft.ml.TimeSeriesKMeans(k = k, metric = "dtw",
          maxIter = lloyd, tol = Double.NegativeInfinity, init = "first",
          barycenterMaxIter = dbaIters, localDba = local).fit(series.toDF())
        val w = (System.nanoTime() - t0) / 1e9
        best = math.min(best, w)
        cents = m.centroids
        System.err.println(f"[dbaprobe] local=$local run $r: $w%.2f s")
      }
      (cents, best)
    }
    val (cDist, wDist) = fit(local = false)
    val (cLoc, wLoc) = fit(local = true)
    val div = cDist.zip(cLoc).map { case (a, b) =>
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max }.max
    println(f"""{"probe":"dba","n":$n,"k":$k,"lloyd":$lloyd,"dba_iters":$dbaIters,"wall_distributed":$wDist%.2f,"wall_local":$wLoc%.2f,"max_centroid_divergence":$div%.3g}""")
    spark.stop()
  }
}
