package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TsFunctions
import graft.model.TSModel
import graft.operators.Cdist

/** Scratch profiling main (dev aid, not part of the driver contract). */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    time("emb read+count") {
      spark.read.parquet(s"$dir/embeddings.parquet").count()
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val queries = e.where(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cands = e.where(col("vec_id") >= 10).select(col("vec_id").as("cand_id"), col("v").as("cv"))
    val scored = cands.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cand_id"), TsFunctions.cosineSim(col("qv"), col("cv")).as("cos"))
    time("emb scored count") { scored.count() }
    time("emb scored count again") { scored.count() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    val topk = scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
    time("emb topk count") { topk.count() }

    val series = time("events->series build") {
      val s = TSModel.eventsToSeries(spark, dir)
        .select(col("series_id"),
          TsFunctions.tsZNorm(TsFunctions.resampleUdf(col("values"), lit(32))).as("values"))
      s.cache().count()
      s
    }
    time("knn pruned") {
      Cdist.knnDtwPruned(series, series, k = 4, radius = 4).count()
    }
    time("knn exact") {
      Cdist.knn(series, series, 4, (a, b) => TsFunctions.dtwSakoeUdf(a, b, lit(4))).count()
    }
    spark.stop()
  }
}
