package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) live as opaque `BINARY` columns plus typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * `mapPartitions` batch transforms so one task amortizes codec setup over
  * its whole partition (the Scala analogue of `mapInPandas` batching).
  *
  * The actual codecs are NOT in this container, so `decodeStub` is a
  * clearly-marked deterministic fake: the Spark-side contract — schema,
  * batching, partitioning, UDF signatures — is real and tested; swapping
  * in a real decoder changes only the function body.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = false)))

  /** STUB decoder: a real implementation would call an image/audio codec
    * here. The fake is deterministic in (payload bytes, meta) so tests and
    * downstream feature logic are exercised honestly. */
  def decodeStub(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
    val out = new Array[Float](math.max(1, width * height))
    var i = 0
    while (i < out.length) {
      out(i) = ((payload(i % payload.length) & 0xFF) / 255.0f)
      i += 1
    }
    out
  }

  /** Decode + mean/std/edge-energy features per media row, batched per
    * partition. Output: (media_id, kind, feat ARRAY<FLOAT>). */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col("media_id").cast("long"), col("kind"),
      col("payload"), col("meta.width"), col("meta.height"))
    rows.as[(Long, String, Array[Byte], Option[Int], Option[Int])]
      .mapPartitions { it =>
        // per-partition "codec" setup happens once here
        it.map { case (id, kind, payload, w, h) =>
          val px = decodeStub(payload, w.getOrElse(8), h.getOrElse(8))
          val mean = px.sum / px.length
          var varAcc = 0.0f; var edge = 0.0f
          var i = 0
          while (i < px.length) {
            varAcc += (px(i) - mean) * (px(i) - mean)
            if (i > 0) edge += math.abs(px(i) - px(i - 1))
            i += 1
          }
          (id, kind, Array(mean, math.sqrt((varAcc / px.length).toDouble).toFloat, edge / px.length))
        }
      }.toDF("media_id", "kind", "feat")
  }

  /** Frame-sampling plan for video rows: every `stride`-th frame index up
    * to n_frames — pure column math, no decode. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), coalesce(col("meta.n_frames"), lit(1)) - 1,
          lit(stride))).as("frame_idx"))

  /** Deterministic synthetic media table for tests/demos. */
  def synthetic(spark: SparkSession, n: Int, seed: Long = 0L): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val rng = new scala.util.Random(seed + i)
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.fill[Byte](64)(rng.nextInt(256).toByte)
      (i.toLong, kind, payload,
        (if (kind == "image") Some(8) else None, if (kind == "image") Some(8) else None,
          if (kind == "audio") Some(16000) else None, if (kind == "video") Some(30) else None))
    }
    rows.toDF("media_id", "kind", "payload", "meta")
      .withColumn("meta", col("meta").cast(
        "struct<width:int,height:int,sample_rate:int,n_frames:int>"))
  }
}
