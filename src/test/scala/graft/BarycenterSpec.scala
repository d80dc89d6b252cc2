package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{Barycenters, Kernels}
import graft.kernels.Kernels.uni

class BarycenterSpec extends AnyFunSuite {
  def approx(a: Double, b: Double, tol: Double): Boolean = math.abs(a - b) <= tol

  test("euclidean barycenter golden (euclidean.py doctest)") {
    val b = Barycenters.euclidean(Seq(uni(1, 2, 3, 4), uni(1, 2, 4, 5)))
    assert(b.map(_(0)).toSeq == Seq(1.0, 2.0, 3.5, 4.5))
  }

  test("euclidean barycenter handles ragged input") {
    val b = Barycenters.euclidean(Seq(uni(1, 2, 3), uni(3, 4)))
    assert(b.map(_(0)).toSeq == Seq(2.0, 3.0, 3.0))
  }

  test("DBA golden (dba.py:451-481): [[1,2,3,4],[1,2,4,5]] -> [1,2,3.5,4.5]") {
    val b = Barycenters.dba(Seq(uni(1, 2, 3, 4), uni(1, 2, 4, 5)), maxIter = 5)
    val got = b.map(_(0))
    val exp = Seq(1.0, 2.0, 3.5, 4.5)
    got.zip(exp).foreach { case (g, e) => assert(approx(g, e, 1e-9), s"$g vs $e") }
  }

  test("DBA with barycenter_size=3 returns 3 timesteps") {
    val b = Barycenters.dba(Seq(uni(1, 2, 3, 4), uni(1, 2, 4, 5)), barycenterSize = 3, maxIter = 5)
    assert(b.length == 3)
  }

  test("DBA on ragged input converges and reduces cost vs init") {
    val series = Seq(uni(0, 1, 2, 3, 4), uni(0, 1, 2, 4), uni(1, 2, 3, 4, 5, 5))
    val b = Barycenters.dba(series, maxIter = 10)
    val cost = series.map(s => { val d = Kernels.dtw(b, s); d * d }).sum / 3
    val eu = Kernels.resample(Barycenters.euclidean(series), b.length)
    val costEu = series.map(s => { val d = Kernels.dtw(eu, s); d * d }).sum / 3
    assert(cost <= costEu + 1e-9)
  }

  test("softdtw barycenter golden (softdtw.py:71-84)") {
    val b = Barycenters.softDtw(Seq(uni(1, 2, 3, 4), uni(1, 2, 4, 5)), gamma = 1.0, maxIter = 50)
    val exp = Seq(1.25161574, 2.03821705, 3.5101956, 4.36140605)
    b.map(_(0)).zip(exp).foreach { case (g, e) =>
      assert(approx(g, e, 0.05), s"$g vs $e")
    }
  }
}
