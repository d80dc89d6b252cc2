package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Observed-metric recorder with attribution keyed on the
    * CollectMetrics metric NAME, registered at submit time (VERDICT r15
    * #3 / ADVICE r15). The listener bus is async: the previous scheme
    * read a shared `current` var at event-fire time, so an observation
    * arriving after the bounded wait expired (and after `current`
    * advanced) was tagged to the WRONG query — and its arrival also
    * released the next query's size-based wait early, cascading the
    * mis-tag. Keying on the metric name makes mis-attribution
    * impossible regardless of bus latency: names are registered from
    * the analyzed plan before execution, and an event for an
    * unregistered name is tagged UNREGISTERED rather than guessed.
    * Contract: metric names are unique per query across the suite (a
    * re-registration warns loudly). */
  final class ObservedMetrics(spark: SparkSession) {
    private val owner = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (m, row) =>
          val q = Option(owner.get(m)).getOrElse("UNREGISTERED")
          lines.add(s"""{"query":"$q","metric":"$m","values":${row.json}}""")
          seen.add(m)
          System.err.println(s"[verify] $q observed $m: ${row.json}")
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    /** Claim every CollectMetrics name in df's analyzed plan for `query`;
      * returns the names (empty = nothing to await). */
    def register(query: String, df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val names = df.queryExecution.analyzed.collect {
        case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c.name
      }
      names.foreach { nm =>
        val prev = owner.put(nm, query)
        if (prev != null && prev != query)
          System.err.println(s"[verify] WARNING: metric '$nm' re-registered by " +
            s"'$query' (was '$prev') — metric names must be unique per query")
      }
      names
    }
    /** Bounded wait (flush) for the named observations on the async bus. */
    def await(names: Seq[String], timeoutMs: Long = 2000): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (!names.forall(seen.contains) && System.nanoTime() < deadline)
        Thread.sleep(20)
    }
    def dump(): String = {
      import scala.jdk.CollectionConverters._
      lines.asScala.mkString("[", ",\n", "]")
    }
  }

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
    // VERDICT r14 #7: surface plan-`observe`d metrics (e.g.
    // lsh_hot_bucket_cap / lsh_query_cand_cap from Ann.lshTopK) in the
    // canonical Verify output. Attribution is keyed on the metric name
    // registered from each query's analyzed plan BEFORE execution (see
    // ObservedMetrics) — bus latency can delay a line, never mis-tag it.
    val obs = new ObservedMetrics(spark)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val metricNames = obs.register(name, df)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (metricNames.nonEmpty) obs.await(metricNames)
      } catch { case e: Throwable =>
        failures(name) = e.getClass.getName + ": " +
          Option(e.getMessage).getOrElse("")
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // bounded drain for stragglers on the async listener bus, then
    // persist the observations beside the dumps
    Thread.sleep(1000)
    Files.writeString(Paths.get(s"$outDir/observed_metrics.json"), obs.dump())
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
