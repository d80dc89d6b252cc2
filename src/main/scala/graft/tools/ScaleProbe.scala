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
  *
  * SPARK_GRAFT_SKEW=zipf switches the documents table from uniform
  * replication to an ADVERSARIAL corpus (VERDICT r9 item 3): one domain
  * owns 50 % of all docs (stresses sourceCap's salted two-window pass),
  * a single hot 3-shingle appears in 30 % of docs (stresses the df-cap
  * on the inverted-index pipelines), and 20 % of docs collapse into
  * exact 64-cliques (quadratic true-pair mass — stresses bucket caps
  * and span dedup). The salted/capped designs were built precisely for
  * this shape and had never been measured against it.
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

    // min-of-N repeats per query (default 2): single-shot walls on this
    // host carry 2-8x warm-up/GC/external-load noise (r10: a f=4 run
    // measured 7x slower than the same query at f=16); the min over warm
    // repeats is the usable scaling signal. SPARK_GRAFT_PROBE_REUSE=1
    // skips re-writing a scratch dir that already exists.
    val probeRepeat = math.max(1, scala.util.Try(
      sys.env.get("SPARK_GRAFT_PROBE_REPEAT").map(_.toInt)).toOption.flatten.getOrElse(2))
    val reuse = sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1")
    factors.foreach { f =>
      val dir = s"$scratch/f$f"
      if (reuse && java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/documents.parquet"))) ()
      else {
      val events = spark.read.parquet(s"$src/events.parquet")
      replicate(events, f, Seq("user_id"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val docsRep = replicate(docs, f, Seq("doc_id"))
      val docsOut =
        if (sys.env.get("SPARK_GRAFT_SKEW").contains("zipf")) {
          // bucket by doc_id so the adversarial shares survive any factor:
          // 50 % hot domain, 30 % hot shingle, 20 % exact 64-cliques
          // (clique id = doc_id div 320: two clique docs per 10-block).
          val bucket = pmod(col("doc_id"), lit(10))
          val clique = call_function("div", col("doc_id"), lit(320L))
          val cliqueText = concat_ws(" ", transform(sequence(lit(0), lit(49)),
            i => concat(lit("tok"), pmod(hash(clique * 53 + i), lit(1000)))))
          docsRep
            .withColumn("source",
              when(pmod(col("doc_id"), lit(2)) === 0, lit("hot.example.com"))
                .otherwise(col("source")))
            .withColumn("text",
              when(bucket < 3, concat(col("text"), lit(" zyx hot shingle")))
                .when(bucket.between(3, 4), cliqueText)
                .otherwise(col("text")))
            .withColumn("n_chars", length(col("text")))
        } else docsRep
      docsOut.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      replicate(emb, f, Seq("vec_id"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // TPC-H side tables pass through unscaled (q* not in the probe set)
      Seq("lineitem", "orders", "customer", "nation", "part", "region",
        "supplier").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
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
          // sketch-then-verify containment A/B twin of doc_containment_pairs
          // (same threshold/k/maxDf; exact path stays the oracle)
          case "op_containment_sketched" => (sp, d) =>
            graft.operators.Dedup.containmentPairsSketched(
              graft.model.TSModel.documents(sp, d), threshold = 0.6)
          case n => graft.SparkEntry.queries(n)
        }
        var best = Double.PositiveInfinity
        var n = -1L
        (1 to probeRepeat).foreach { _ =>
          val t0 = System.nanoTime()
          n = scala.util.Try(fn(spark, dir).count()).getOrElse(-1L)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        System.err.println(f"[probe] f=$f $name%-24s $best%8.2f s  rows=$n")
        name -> best
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
