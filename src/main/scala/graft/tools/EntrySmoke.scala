package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    // deliberately NO nanosAsLong in the builder - driver-like session
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    spark.stop()
  }
}
