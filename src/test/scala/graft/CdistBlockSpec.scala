package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TsFunctions
import graft.operators.Cdist

/** The block-partitioned selfCross fallback must be a drop-in replacement
  * for the broadcast triangle join: identical pair set, identical
  * distances, and no BroadcastExchange of the full relation in its plan. */
class CdistBlockSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def mkSeries(n: Int, sz: Int) = {
    val rng = new scala.util.Random(42)
    (0 until n).map(i => (i.toLong, Array.fill(sz)(rng.nextGaussian())))
      .toDF("series_id", "values")
  }

  test("selfCrossBlocked matches selfCross exactly (with and without diagonal)") {
    val ds = mkSeries(37, 16).cache()
    for (diag <- Seq(true, false); blocks <- Seq(1, 4, 7)) {
      val base = Cdist.selfCross(ds, (a, b) => TsFunctions.dtwUdf(a, b),
          computeDiagonal = diag)
        .as[(Long, Long, Double)].collect().sorted
      val blocked = Cdist.selfCrossBlocked(ds, (a, b) => TsFunctions.dtwUdf(a, b),
          blocks, computeDiagonal = diag)
        .as[(Long, Long, Double)].collect().sorted
      assert(blocked.length == base.length, s"diag=$diag blocks=$blocks row count")
      base.zip(blocked).foreach { case (e, g) =>
        assert(e._1 == g._1 && e._2 == g._2, s"pair mismatch $e vs $g")
        assert(math.abs(e._3 - g._3) < 1e-12, s"dist mismatch $e vs $g")
      }
    }
  }

  test("selfCrossBlocked plan has no BroadcastExchange of the input relation") {
    val ds = mkSeries(20, 8)
    val plan = Cdist.selfCrossBlocked(ds, (a, b) => TsFunctions.dtwUdf(a, b), 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"), s"unexpected broadcast in:\n$plan")
  }

  test("knnDtwPruned slim-shuffle rewrite returns the same neighbors as exact knn") {
    val ds = mkSeries(30, 16).cache()
    val exact = Cdist.knn(ds, ds, k = 3, (a, b) => TsFunctions.dtwUdf(a, b))
      .select("probe_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    // factor large enough that LB pruning is lossless on this tiny set
    val pruned = Cdist.knnDtwPruned(ds, ds, k = 3, radius = 16, factor = 10)
      .select("probe_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(pruned == exact)
  }

  test("knnDtwBlocked matches the broadcast-index path exactly") {
    val train = mkSeries(61, 16).cache()
    val probes = mkSeries(9, 16)
    // tight factor so LB pruning actually bites (candidate set < train)
    for (blocks <- Seq(1, 4, 7)) {
      val base = Cdist.knnDtwPruned(probes, train, k = 3, radius = 4, factor = 2)
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val blocked = Cdist.knnDtwBlocked(probes, train, k = 3, radius = 4,
          factor = 2, blocks = blocks)
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(blocked.length == base.length, s"blocks=$blocks row count")
      base.zip(blocked).foreach { case (e, g) =>
        assert(e._1 == g._1 && e._2 == g._2 && e._3 == g._3, s"hit mismatch $e vs $g")
        assert(math.abs(e._4 - g._4) < 1e-12, s"dist mismatch $e vs $g")
      }
    }
  }

  test("knnDtwPruned guard dispatches to the blocked path past maxIndexRows") {
    val train = mkSeries(40, 12).cache()
    val probes = mkSeries(6, 12)
    val guarded = Cdist.knnDtwPruned(probes, train, k = 2, radius = 3,
      factor = 2, maxIndexRows = 10, blocks = 4)
    // past the ceiling the plan must not broadcast the train relation
    val plan = guarded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"), s"unexpected broadcast in:\n$plan")
    val base = Cdist.knnDtwPruned(probes, train, k = 2, radius = 3, factor = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val got = guarded.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(base.sameElements(got) || base.zip(got).forall { case (e, g) =>
      e._1 == g._1 && e._2 == g._2 && e._3 == g._3 && math.abs(e._4 - g._4) < 1e-12
    })
  }
}
