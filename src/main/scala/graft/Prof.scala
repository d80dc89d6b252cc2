package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    import org.apache.spark.sql.expressions.Window

    def jacV(variant: String) = {
      val maxDf = 100
      val d = docs.select(col("doc_id"), split(col("text"), " ").as("words"))
        .where(size(col("words")) >= 3) // mirror doc_jaccard_pairs' short-doc guard
      val shArr = array_distinct(transform(sequence(lit(0), size(col("words")) - 3),
        i => array_join(slice(col("words"), i + 1, lit(3)), " ")))
      variant match {
        case "orig" =>
          val shingles = d.select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("words")) - 3),
              i => array_join(slice(col("words"), i + 1, lit(3)), " "))).as("sh"))
            .distinct()
            .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
            .where(col("df") <= maxDf)
            .select(col("doc_id"), col("sh"))
          val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
          val a = shingles.select(col("doc_id").as("doc_a"), col("sh"))
          val b = shingles.select(col("doc_id").as("doc_b"), col("sh"))
          val inter = a.join(b, "sh").where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
          inter
            .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
            .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
            .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
            .where(col("jac") >= 0.5)
            .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
        case "twowin" =>
          val shingles = d.select(col("doc_id"), shArr.as("shs"))
            .select(col("doc_id"), explode(col("shs")).as("sh"))
            .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
            .where(col("df") <= maxDf)
            .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
            .select(col("doc_id"), col("sh"), col("sz"))
          val a = shingles.select(col("doc_id").as("doc_a"), col("sh"), col("sz").as("sz_a"))
          val b = shingles.select(col("doc_id").as("doc_b"), col("sh"), col("sz").as("sz_b"))
          a.join(b, "sh").where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(count(lit(1)).as("inter"), first("sz_a").as("sz_a"), first("sz_b").as("sz_b"))
            .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
            .where(col("jac") >= 0.5)
            .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
        case "anti" =>
          // df-cap via broadcast ANTI join against the (tiny) hot-shingle
          // list instead of a window over the full shingle stream: no
          // full sort, and the hot list is a few hundred rows at most.
          val ex = d.select(col("doc_id"), explode(shArr).as("sh"))
          val hot = ex.groupBy("sh").agg(count(lit(1)).as("df"))
            .where(col("df") > maxDf).select("sh")
          val shingles = ex.join(broadcast(hot), Seq("sh"), "left_anti")
          val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
          val a = shingles.select(col("doc_id").as("doc_a"), col("sh"))
          val b = shingles.select(col("doc_id").as("doc_b"), col("sh"))
          val inter = a.join(b, "sh").where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
          inter
            .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
            .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
            .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
            .where(col("jac") >= 0.5)
            .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
        case "cache" =>
          // adist + persist the capped shingle stream: the self-join
          // references it twice and sizes a third time.
          val shingles = d.select(col("doc_id"), shArr.as("shs"))
            .select(col("doc_id"), explode(col("shs")).as("sh"))
            .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
            .where(col("df") <= maxDf)
            .select(col("doc_id"), col("sh"))
            .persist()
          val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
          val a = shingles.select(col("doc_id").as("doc_a"), col("sh"))
          val b = shingles.select(col("doc_id").as("doc_b"), col("sh"))
          val inter = a.join(b, "sh").where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
          val out = inter
            .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
            .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
            .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
            .where(col("jac") >= 0.5)
            .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
          out
        case "ckraw" =>
          // production round-6 shape, but the raw stream is checkpointed
          // BEFORE dfCapped so shingle generation runs once (dfCapped
          // consumes its input twice: hot-set groupBy + anti-join).
          val ex = d.select(col("doc_id"), explode(shArr).as("sh")).localCheckpoint()
          val shingles = graft.operators.Dedup.dfCapped(ex, maxDf)
            .select(col("doc_id"), col("sh"))
          val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
          val a = shingles.select(col("doc_id").as("doc_a"), col("sh"))
          val b = shingles.select(col("doc_id").as("doc_b"), col("sh"))
          val inter = a.join(b, "sh").where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
          inter
            .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
            .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
            .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
            .where(col("jac") >= 0.5)
            .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
        case "prod" =>
          // exactly the shipping doc_jaccard_pairs shape (capped stream
          // checkpointed, raw evaluated twice inside dfCapped)
          val raw = d.select(col("doc_id"), explode(shArr).as("sh"))
          val shingles = graft.operators.Dedup.dfCapped(raw, maxDf)
            .select(col("doc_id"), col("sh"))
            .localCheckpoint()
          val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
          val a = shingles.select(col("doc_id").as("doc_a"), col("sh"))
          val b = shingles.select(col("doc_id").as("doc_b"), col("sh"))
          val inter = a.join(b, "sh").where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
          inter
            .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
            .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
            .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
            .where(col("jac") >= 0.5)
            .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
        case "adist" =>
          val shingles = d.select(col("doc_id"), shArr.as("shs"))
            .select(col("doc_id"), explode(col("shs")).as("sh"))
            .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
            .where(col("df") <= maxDf)
            .select(col("doc_id"), col("sh"))
          val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
          val a = shingles.select(col("doc_id").as("doc_a"), col("sh"))
          val b = shingles.select(col("doc_id").as("doc_b"), col("sh"))
          val inter = a.join(b, "sh").where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
          inter
            .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
            .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
            .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
            .where(col("jac") >= 0.5)
            .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
      }
    }

    if (args.contains("cc")) {
      // stage-by-stage profile of the doc_dedup_clusters pipeline
      (1 to 2).foreach { round =>
        println(s"[prof] === cc round $round ===")
        val pairs = graft.operators.Dedup.minhashLsh(
          docs.select(col("doc_id"), col("text")), threshold = 0.35, portable = true)
        time("minhash pairs count")(pairs.count())
        val comps = time("connected components")(
          graft.operators.Dedup.connectedComponents(pairs))
        time("final left join")(
          docs.select(col("doc_id")).join(comps, Seq("doc_id"), "left").count())
      }
    } else if (args.contains("cos")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      emb.count()
      (1 to 2).foreach { round =>
        println(s"[prof] === cos round $round ===")
        import graft.functions.TsFunctions
        val e = emb.select(col("vec_id"),
          TsFunctions.l2NormalizeUdf(transform(col("embedding"), x => x.cast("double"))).as("v"))
          .localCheckpoint(eager = false)
        time("normalize+checkpoint")(e.count())
        val parallelism = spark.sparkContext.defaultParallelism
        val out = e.repartition(parallelism).alias("a")
          .join(broadcast(e.select(col("vec_id").as("vec_b"), col("v").as("vb"))).alias("b"),
            col("vec_id") < col("vec_b"))
          .select(col("vec_id").as("vec_a"), col("vec_b"),
            graft.functions.NativeExpressions.dotNative(col("v"), col("vb")).as("cos"))
          .where(col("cos") >= 0.85)
        time("pair join")(out.count())
      }
    } else {
      val variants = if (args.nonEmpty) args.toSeq else Seq("adist", "cache")
      (1 to 2).foreach { round =>
        println(s"[prof] === round $round ===")
        variants.foreach { v =>
          time(s"jaccard $v")(jacV(v).count())
        }
      }
    }
    spark.stop()
  }
}
