package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: dump formatted plans of representative queries to check
  * pushdown, pruning, and join strategies (SURVEY §4.2 checklist). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_top_parts", "ts_znorm", "emb_knn_cosine", "doc_jaccard_pairs")
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
