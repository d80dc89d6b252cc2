package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TsFunctions
import graft.model.TSModel

/** Dev-only stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TsFunctions.register(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val series = TSModel.eventsToSeries(spark, sfDir)
      .select(col("series_id"),
        TsFunctions.resampleZnormUdf(col("values"), lit(32)).as("values"))
      .cache()
    time("series materialize")(series.count())

    val k = 4; val radius = 4; val factor = 4
    val l = series.select(col("series_id").as("left_id"), col("values").as("lv"))
    val r = series.select(col("series_id").as("right_id"), col("values").as("rv"),
      TsFunctions.envelopeUdf(col("values"), lit(radius)).as("env"))
    val pairsSlim = l.crossJoin(broadcast(r))
      .select(col("left_id"), col("right_id"),
        graft.functions.NativeExpressions.lbKeoghNative(
          col("lv"), col("env._1"), col("env._2")).as("lb"))
    time("lb pass only")(pairsSlim.count())
    val candidates = graft.operators.TopK.byKey(pairsSlim, k * factor, "left_id", "right_id", "lb")
      .select("left_id", "right_id")
    time("lb + topk agg")(candidates.count())
    val full = graft.operators.Cdist.knnDtwPruned(series, series, k, radius, factor)
    time("full knnDtwPruned")(full.count())
    time("full again (warm)")(full.count())

    val raw = TSModel.eventsToSeries(spark, sfDir)
      .select(col("series_id"), TsFunctions.resampleUdf(col("values"), lit(32)).as("values"))
      .cache()
    raw.count()
    for (i <- 1 to 3) {
      time(s"series build warm #$i")(TSModel.eventsToSeries(spark, sfDir)
        .select(col("series_id"),
          TsFunctions.resampleZnormUdf(col("values"), lit(32)).as("values"))
        .count())
    }
    time("knn query total")(graft.SparkEntry.queries("knn_dtw_users")(spark, sfDir).count())
    time("ucr_trace_1nn")(graft.SparkEntry.queries("ucr_trace_1nn")(spark, sfDir).count())
    time("ucr_trace_1nn again")(graft.SparkEntry.queries("ucr_trace_1nn")(spark, sfDir).count())
    locally {
      val (train, test) = graft.sources.Datasets.CachedDatasets
        .loadDataset(spark, "Trace", "/root/repo/data/cached")
      time("trace load+count")(train.count() + test.count())
      val scored = test.select(col("series_id"), col("values").as("qv"))
        .crossJoin(broadcast(train.select(col("series_id").as("train_id"),
          col("label").as("pred"), col("values").as("tv"))))
        .select(col("series_id"), col("train_id"), col("pred"),
          TsFunctions.euclideanUdf(col("qv"), col("tv")).as("d"))
      time("trace scored only")(scored.count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("series_id").orderBy(col("d").asc, col("train_id").asc)
      time("trace scored+window")(
        scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1).count())
      time("trace scored+argmin-agg")(
        scored.groupBy("series_id")
          .agg(min(struct(col("d"), col("train_id"), col("pred"))).getField("pred").as("pred"))
          .count())
    }
    time("doc_simhash_pairs")(graft.SparkEntry.queries("doc_simhash_pairs")(spark, sfDir).count())
    time("doc_simhash_pairs again")(graft.SparkEntry.queries("doc_simhash_pairs")(spark, sfDir).count())
    locally {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      time("cosine dedup broadcast")(
        graft.operators.Dedup.embeddingCosine(e, threshold = 0.4).count())
      time("cosine dedup blocked8")(
        graft.operators.Dedup.embeddingCosineBlocked(e, threshold = 0.4, blocks = 8).count())
    }
    spark.stop()
  }
}
