package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: only dump these query names (dev iteration)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Input-schema banner: testdata is driver-regenerated per round and
    // has drifted before (round 8: every events-derived dump failed with
    // an AnalysisException the artifact couldn't explain).
    Seq("events", "documents", "embeddings", "lineitem").foreach { t =>
      scala.util.Try(System.err.println(s"[verify] $t schema: " +
        spark.read.parquet(s"$sfDir/$t.parquet").schema.simpleString))
    }
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // VERDICT r14 #7: surface plan-`observe`d metrics (today:
    // lsh_hot_bucket_cap's dropped_sig_rows / capped_buckets from
    // Ann.lshTopK) in the canonical Verify output — until now only a
    // test's QueryExecutionListener read them, so a capped-recall run was
    // invisible in round artifacts. The listener bus is async; tagging is
    // made deterministic by waiting (bounded) for the observation to
    // arrive after any dump whose analyzed plan contains a CollectMetrics
    // node (first run of this code mis-tagged emb_ann_lsh's metrics to
    // the query dumped after it).
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var current = ""
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (m, row) =>
          val line = s"""{"query":"$current","metric":"$m","values":${row.json}}"""
          observed.add(line)
          System.err.println(s"[verify] $current observed $m: ${row.json}")
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      current = name
      try {
        val df = fn(spark, sfDir)
        val hasObserve = df.queryExecution.analyzed.exists {
          case _: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => true
          case _ => false
        }
        val before = observed.size()
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (hasObserve) {
          val deadline = System.nanoTime() + 2_000_000_000L
          while (observed.size() == before && System.nanoTime() < deadline)
            Thread.sleep(20)
        }
      } catch { case e: Throwable =>
        failures(name) = e.getClass.getName + ": " +
          Option(e.getMessage).getOrElse("")
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // bounded drain for stragglers on the async listener bus, then
    // persist the observations beside the dumps
    Thread.sleep(1000)
    Files.writeString(Paths.get(s"$outDir/observed_metrics.json"),
      {
        import scala.jdk.CollectionConverters._
        observed.asScala.mkString("[", ",\n", "]")
      })
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full failure detail next to the dumps, so a red round is
    // diagnosable from artifacts alone (not just a missing parquet).
    Files.writeString(Paths.get(s"$outDir/dump_errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }
        .mkString("{", ",", "}"))
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} dump FAILURES — see $outDir/dump_errors.json")
    spark.stop()
  }
}
