package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf-scale readiness probe (VERDICT r5 item 9): the engine has only
  * ever been measured on ≤17 MB of input, so "would survive 100 TB" was
  * design-argued, never observed. This tool replicates the sf0.1 tables
  * `factor`× with id-shifting (disjoint user/doc/vec id spaces per copy,
  * so series counts and corpus sizes really grow) into a scratch dir,
  * then times a probe set of queries at each factor and prints one JSON
  * line per factor. A query whose wall grows super-linearly in the
  * factor is a scale bug — that is exactly the regression this probe
  * exists to catch (e.g. an accidental all-pairs join shows up as 4×
  * data → 16× wall).
  *
  * Usage: runMain graft.tools.ScaleProbe <srcSfDir> <scratchDir> <factors csv> [queries...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scratch = if (args.length > 1) args(1) else "/tmp/graft_scaleprobe"
    val factors = (if (args.length > 2) args(2) else "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val defaultQueries = Seq(
      // LLM-pipeline family (scales in corpus size)
      "doc_dedup_exact", "doc_minhash_pairs", "doc_simhash",
      "doc_dedup_clusters", "doc_quality", "doc_lang_id", "doc_fingerprint",
      "doc_sample_stratified", "doc_tokens_bpe", "doc_repetition",
      // embedding family (scales in vector count)
      "emb_knn_cosine", "emb_ann_ivf", "emb_dedup_cosine", "emb_kmeans_assign",
      // time-series family (scales in series count)
      "ts_znorm", "ts_hourly", "ts_sessionize", "ts_resample",
      "knn_dtw_users", "ts_kmeans_iter")
    val queries = if (args.length > 3) args.drop(3).toSeq else defaultQueries

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Replicate df `factor`× shifting `idCols` into disjoint ranges.
      * The shift constant is a power of ten above the source max id so
      * copies never collide and ids stay readable when debugging. */
    def replicate(df: DataFrame, factor: Int, idCols: Seq[String]): DataFrame = {
      if (factor <= 1) df
      else {
        val shifts = idCols.map { c =>
          val mx = df.agg(max(col(c))).head().getLong(0)
          c -> math.pow(10, math.ceil(math.log10(mx + 2))).toLong
        }.toMap
        (0 until factor).map { k =>
          shifts.foldLeft(df) { case (d, (c, base)) =>
            d.withColumn(c, col(c) + lit(k * base))
          }
        }.reduce(_ union _)
      }
    }

    factors.foreach { f =>
      val dir = s"$scratch/f$f"
      val events = spark.read.parquet(s"$src/events.parquet")
      replicate(events, f, Seq("user_id"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val docs = spark.read.parquet(s"$src/documents.parquet")
      replicate(docs, f, Seq("doc_id"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      replicate(emb, f, Seq("vec_id"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // TPC-H side tables pass through unscaled (q* not in the probe set)
      Seq("lineitem", "orders", "customer", "nation", "part", "region",
        "supplier").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }

      val results = queries.map { name =>
        // op_* pseudo-queries probe an OPERATOR at full scaled input —
        // for surfaces whose driver query pins a tiny id subset for the
        // oracle (the gram family) and therefore cannot grow with f.
        val fn: (SparkSession, String) => DataFrame = name match {
          case "op_kernel_kmeans" => (sp, d) => {
            val series = graft.model.TSModel.eventsToSeries(sp, d)
              .select(col("series_id"),
                graft.functions.TsFunctions.resampleZnormUdf(
                  col("values"), lit(16)).as("values"))
              .localCheckpoint()
            new graft.ml.KernelKMeans(k = 3, maxIter = 4,
              tol = Double.NegativeInfinity, sigma = 1.0, init = "mod",
              blocks = 16).fitAssign(series)
          }
          case n => graft.SparkEntry.queries(n)
        }
        val t0 = System.nanoTime()
        val n = scala.util.Try(fn(spark, dir).count()).getOrElse(-1L)
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[probe] f=$f $name%-24s $sec%8.2f s  rows=$n")
        name -> sec
      }
      val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val load = scala.util.Try(java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble)
        .getOrElse(-1.0)
      println(s"""{"probe_factor":$f,"total":${results.map(_._2).sum},"queries":$qs,"loadavg":$load}""")
    }
    spark.stop()
  }
}
