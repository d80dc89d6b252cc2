package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Kernels
import graft.operators.MatrixProfileDist

class MatrixProfileDistSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("distributed single-series MP equals the local kernel exactly") {
    val rng = new scala.util.Random(13)
    val ts = Array.tabulate(500)(t => math.sin(t * 0.17) + 0.2 * rng.nextGaussian())
    val m = 16
    val local = Kernels.matrixProfile(ts, m)
    // small blockSize forces multi-block + cross-block diagonals
    val dist = MatrixProfileDist.matrixProfile(spark, ts, m, blockSize = 64)
      .as[(Int, Double)].collect().sortBy(_._1)
    assert(dist.length == local.length)
    dist.foreach { case (i, v) =>
      assert(math.abs(v - local(i)) < 1e-8, s"i=$i: $v vs ${local(i)}")
    }
  }

  test("tiled no-broadcast MP equals the local kernel on a distributed series") {
    val rng = new scala.util.Random(29)
    // length chosen so the tail tile is partial and several tile pairs
    // are adjacent (band-excluded corners exercised)
    val ts = Array.tabulate(777)(t => math.cos(t * 0.11) + 0.3 * rng.nextGaussian())
    val m = 24
    val local = Kernels.matrixProfile(ts, m)
    val seriesDf = spark.createDataset(ts.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }).toDF("idx", "v")
      .repartition(4) // the series genuinely lives on multiple partitions
    val tiled = MatrixProfileDist.matrixProfileTiled(spark, seriesDf, m, blockSize = 100)
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(tiled.length == local.length,
      s"row count ${tiled.length} vs ${local.length}")
    tiled.foreach { case (i, v) =>
      assert(math.abs(v - local(i.toInt)) < 1e-8, s"i=$i: $v vs ${local(i.toInt)}")
    }
  }

  test("rolling-update numerical drift stays tiny on long constant-plus-noise input") {
    val rng = new scala.util.Random(5)
    val ts = Array.tabulate(3000)(t => 100.0 + 0.01 * rng.nextGaussian() +
      (if (t % 500 == 250) 5.0 else 0.0))
    val m = 32
    val local = Kernels.matrixProfile(ts, m)
    val dist = MatrixProfileDist.matrixProfile(spark, ts, m, blockSize = 512)
      .as[(Int, Double)].collect().sortBy(_._1)
    dist.foreach { case (i, v) =>
      assert(math.abs(v - local(i)) < 1e-6, s"i=$i: $v vs ${local(i)}")
    }
  }
}
