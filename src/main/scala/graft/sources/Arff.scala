package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal UCR/UEA ARFF reader — semantics of `_load_arff_uea`
  * (`/root/reference/tslearn/utils/utils.py:637-688`):
  *
  *  - univariate layout: numeric attributes t1..tsz + a class attribute;
  *    one series per @data row, label = last field.
  *  - multivariate layout: a `relational` attribute whose value is a
  *    quoted block with one channel per inner line, plus a class
  *    attribute: `'v,v,v\nw,w,w',label`.
  *
  * Implemented over `spark.read.text` + column expressions (header lines
  * are filtered out; the tiny header itself is parsed on the driver).
  * Output schema: (series_id LONG, ts ARRAY<ARRAY<DOUBLE>>, label STRING).
  */
object Arff {

  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    // header (small): collect only lines until @data for driver-side parse
    val header = raw.where(lower(trim(col("value"))).startsWith("@"))
      .collect().map(_.getString(0).trim)
    val isRelational = header.exists(h =>
      h.toLowerCase.startsWith("@attribute") && h.toLowerCase.contains("relational"))
    val data = raw
      .where(!lower(trim(col("value"))).startsWith("@"))
      .where(!trim(col("value")).startsWith("%"))
      .where(length(trim(col("value"))) > 0)
      .withColumn("series_id", monotonically_increasing_id())

    if (isRelational) {
      // '<channel lines separated by \n>',label  — channels comma-separated
      val body = regexp_extract(col("value"), "'(.*)'", 1)
      val label = trim(regexp_extract(col("value"), "'.*'\\s*,\\s*(.+)$", 1))
      val dims = transform(split(body, "\\\\n"),
        ch => transform(split(ch, ","), v => v.cast("double")))
      data.withColumn("dims", dims)
        .withColumn("label", label)
        .select(col("series_id"),
          expr("transform(sequence(0, size(dims[0]) - 1), t -> transform(dims, d -> d[t]))")
            .as("ts"), col("label"))
    } else {
      val parts = split(col("value"), ",")
      val label = trim(element_at(parts, -1))
      val values = slice(parts, lit(1), size(parts) - 1)
      data.select(col("series_id"),
        transform(values, v => array(v.cast("double"))).as("ts"),
        label.as("label"))
    }
  }
}
