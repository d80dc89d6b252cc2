package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.TSModel

class ModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("text codec round-trips a multivariate series (utils.py:219-353)") {
    val dir = java.nio.file.Files.createTempDirectory("tscodec").toString
    val df = Seq(
      (0L, Array(Array(1.0, 10.0), Array(2.0, 20.0), Array(3.0, 30.0))),
      (1L, Array(Array(4.5, 45.0), Array(5.5, 55.0)))
    ).toDF("series_id", "ts")
    // write dim-major lines, then load back and compare time-major arrays
    df.select(TSModel.formatSeriesLine(
        expr("transform(sequence(0, size(ts[0]) - 1), d -> transform(ts, t -> t[d]))"))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$dir/out")
    def collectTs(d: org.apache.spark.sql.DataFrame): Set[Seq[Seq[Double]]] =
      d.select("ts").collect()
        .map(_.getSeq[scala.collection.Seq[Double]](0).map(_.toSeq).toSeq).toSet
    assert(collectTs(TSModel.loadTimeSeriesTxt(spark, s"$dir/out")) == collectTs(df))
  }

  test("random walks are seed-stable and have expected shape") {
    val a = TSModel.randomWalks(spark, 5, 16, 2, seed = 9).collect()
    val b = TSModel.randomWalks(spark, 5, 16, 2, seed = 9).collect()
    assert(a.length == 5)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("random walk blobs: same-blob series correlate more than cross-blob") {
    import graft.kernels.Kernels
    val df = TSModel.randomWalkBlobs(spark, nPerBlob = 4, sz = 32, d = 1,
      nBlobs = 2, noise = 0.1, seed = 3)
    val rows = df.orderBy("series_id").collect()
      .map(r => r.getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray)
    val intra = Kernels.euclidean(rows(0), rows(1))
    val inter = Kernels.euclidean(rows(0), rows(6))
    assert(intra < inter, s"intra $intra should be < inter $inter")
  }

  test("MLP classifier learns separated blobs") {
    val rng = new scala.util.Random(8)
    val rows = (0 until 40).map { i =>
      val blob = i / 20
      (i.toLong, Array.tabulate(16)(t =>
        (if (blob == 0) 1.0 else -1.0) * (t % 5) + rng.nextGaussian() * 0.1), blob.toString)
    }
    val df = rows.toDF("series_id", "values", "label")
    val model = graft.ml.TimeSeriesMLP.fit(df, hidden = Seq(8), maxIter = 60, seed = 1)
    val pred = model.predict(df)
      .join(df.select(col("series_id"), col("label").as("truth")), "series_id")
    val acc = pred.where(col("label") === col("truth")).count().toDouble / 40
    assert(acc >= 0.95, s"MLP accuracy $acc")
  }
}
