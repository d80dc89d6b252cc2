package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.kernels.{Advanced, Kernels, Mask, Sax}
import graft.kernels.Kernels.uni

/** ScalaCheck property tests for the metric invariants the reference's
  * test suite asserts (SURVEY §5: symmetry, LB ≤ exact, L-DTW ≥ DTW,
  * MINDIST ≤ euclidean), over ragged random series. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic forAll over a ScalaCheck Gen (no scalatestplus bridge
    * in the offline cache). */
  def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
  def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(t => f(t._1, t._2))

  val series: Gen[Array[Double]] = for {
    n <- Gen.choose(2, 24)
    vs <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
  } yield vs.toArray

  val eqLenPair: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(4, 24)
    a <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
    b <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
  } yield (a.toArray, b.toArray)

  test("dtw is symmetric and non-negative; d(x,x) = 0") {
    forAll(series, series) { (a, b) =>
      val d1 = Kernels.dtw(uni(a.toIndexedSeq: _*), uni(b.toIndexedSeq: _*))
      val d2 = Kernels.dtw(uni(b.toIndexedSeq: _*), uni(a.toIndexedSeq: _*))
      assert(math.abs(d1 - d2) < 1e-9 && d1 >= 0)
      assert(Kernels.dtw(uni(a.toIndexedSeq: _*), uni(a.toIndexedSeq: _*)) == 0.0)
    }
  }

  test("dtw <= euclidean on equal-length series") {
    forAll(eqLenPair) { case (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      assert(Kernels.dtw(ua, ub) <= Kernels.euclidean(ua, ub) + 1e-9)
    }
  }

  test("banded dtw decreases as radius grows") {
    forAll(eqLenPair) { case (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      val n = a.length
      val d1 = Kernels.dtw(ua, ub, Mask.sakoeChiba(n, n, 1))
      val d3 = Kernels.dtw(ua, ub, Mask.sakoeChiba(n, n, 3))
      val dFree = Kernels.dtw(ua, ub)
      assert(d3 <= d1 + 1e-9 && dFree <= d3 + 1e-9)
    }
  }

  test("lb_keogh lower-bounds banded dtw") {
    forAll(Gen.zip(eqLenPair, Gen.choose(1, 4))) { case ((a, b), r) =>
      val lb = Kernels.lbKeogh(a, b, r)
      val d = Kernels.dtw(uni(a.toIndexedSeq: _*), uni(b.toIndexedSeq: _*),
        Mask.sakoeChiba(a.length, b.length, r))
      assert(lb <= d + 1e-9)
    }
  }

  test("L-DTW >= DTW and decreases as L grows") {
    forAll(eqLenPair) { case (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      val n = a.length
      val free = Kernels.dtw(ua, ub)
      val tight = Advanced.dtwLimitedWarpingLength(ua, ub, n)
      val loose = Advanced.dtwLimitedWarpingLength(ua, ub, 2 * n)
      assert(tight >= loose - 1e-9 && loose >= free - 1e-9)
    }
  }

  test("gak in (0, 1]; symmetric") {
    forAll(eqLenPair) { case (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      val k = Kernels.gak(ua, ub, sigma = 5.0)
      assert(k > 0 && k <= 1.0 + 1e-9)
      assert(math.abs(k - Kernels.gak(ub, ua, 5.0)) < 1e-9)
    }
  }

  test("soft-dtw <= dtw^2 and decreases with gamma") {
    forAll(eqLenPair) { case (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      val d2 = { val d = Kernels.dtw(ua, ub); d * d }
      val s1 = Kernels.softDtw(ua, ub, 0.1)
      val s2 = Kernels.softDtw(ua, ub, 1.0)
      assert(s1 <= d2 + 1e-6 && s2 <= s1 + 1e-6)
    }
  }

  test("lcss in [0, 1]; 1 for identical series") {
    forAll(series, series) { (a, b) =>
      val l = Kernels.lcss(uni(a.toIndexedSeq: _*), uni(b.toIndexedSeq: _*), eps = 1.0)
      assert(l >= 0 && l <= 1.0)
      assert(Kernels.lcss(uni(a.toIndexedSeq: _*), uni(a.toIndexedSeq: _*), eps = 0.0) == 1.0)
    }
  }

  test("sax mindist lower-bounds euclidean on z-normed input") {
    forAll(Gen.choose(8, 32).flatMap(n =>
      Gen.zip(Gen.listOfN(n, Gen.choose(-5.0, 5.0)), Gen.listOfN(n, Gen.choose(-5.0, 5.0))))) {
      case (la, lb) =>
        val za = Kernels.scaleMeanVariance(uni(la.toIndexedSeq: _*))
        val zb = Kernels.scaleMeanVariance(uni(lb.toIndexedSeq: _*))
        val n = la.length
        val nSeg = math.max(1, n / 4)
        val md = Sax.mindist(Sax.sax(za, nSeg, 8), Sax.sax(zb, nSeg, 8), 8, n)
        assert(md <= Kernels.euclidean(za, zb) + 1e-9)
    }
  }

  test("resample to same size is identity; preserves endpoints") {
    forAll(series) { a =>
      val ua = uni(a.toIndexedSeq: _*)
      val same = Kernels.resample(ua, a.length)
      assert(same.map(_(0)).sameElements(a))
      val r = Kernels.resample(ua, 7)
      assert(math.abs(r.head(0) - a.head) < 1e-9 && math.abs(r.last(0) - a.last) < 1e-9)
    }
  }

  test("ncc bounded by 1 in magnitude at matching shift for scaled copies") {
    forAll(series, Gen.choose(0.5, 3.0)) { (a: Array[Double], k: Double) =>
      val ua = uni(a.toIndexedSeq: _*)
      val ub = uni(a.map(_ * k).toIndexedSeq: _*)
      val m = graft.kernels.Ncc.maxNcc(ua, ub)
      assert(m <= 1.0 + 1e-9 && m >= 0.999 - 1e-6) // scaled copy correlates ~1
    }
  }

  test("lcss_path score equals score-only lcss; path pairs are in-range and increasing") {
    forAll(series, series) { (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      val (path, sim) = Advanced.lcssPath(ua, ub, eps = 1.5)
      assert(sim == Kernels.lcss(ua, ub, eps = 1.5), "path/score-only disagree")
      assert(path.length == math.round(sim * math.min(a.length, b.length)).toInt)
      path.foreach { case (i, j) =>
        assert(i >= 0 && i < a.length && j >= 0 && j < b.length)
        assert(math.sqrt(Kernels.localSqDist(ua(i), ub(j))) <= 1.5, "non-matching pair on path")
      }
      // strictly increasing in both coordinates (LCSS paths are matchings)
      path.sliding(2).foreach {
        case Array((i0, j0), (i1, j1)) => assert(i1 > i0 && j1 > j0)
        case _ =>
      }
    }
  }

  test("L-DTW path reproduces its score and respects the length cap") {
    forAll(eqLenPair) { case (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      val cap = a.length + b.length / 2
      val (path, score) = Advanced.dtwLimitedWarpingLengthPath(ua, ub, cap)
      assert(path.length <= cap)
      val cost = path.map { case (i, j) => Kernels.localSqDist(ua(i), ub(j)) }.sum
      assert(math.abs(math.sqrt(cost) - score) < 1e-9)
      assert(math.abs(score - Advanced.dtwLimitedWarpingLength(ua, ub, cap)) < 1e-12)
    }
  }

  test("1d-SAX distance: zero on self, symmetric, scales with segment count") {
    forAll(eqLenPair) { case (a, b) =>
      val n = (a.length / 4) * 4
      if (n >= 8) {
        val ua = uni(a.take(n).toIndexedSeq: _*); val ub = uni(b.take(n).toIndexedSeq: _*)
        val s1 = Sax.oneDSax(ua, 4, 4, 4, sigmaL = 1.0)
        val s2 = Sax.oneDSax(ub, 4, 4, 4, sigmaL = 1.0)
        assert(Sax.dist1dSax(s1, s1, 4, 4, 1.0, n) == 0.0)
        val d12 = Sax.dist1dSax(s1, s2, 4, 4, 1.0, n)
        val d21 = Sax.dist1dSax(s2, s1, 4, 4, 1.0, n)
        assert(math.abs(d12 - d21) < 1e-12 && d12 >= 0)
      }
    }
  }

  test("soft-DTW alignment rows carry positive mass and value matches softDtw") {
    forAll(eqLenPair) { case (a, b) =>
      val ua = uni(a.toIndexedSeq: _*); val ub = uni(b.toIndexedSeq: _*)
      val (e, v) = Kernels.softDtwAlignment(ua, ub, gamma = 1.0)
      assert(math.abs(v - Kernels.softDtw(ua, ub, 1.0)) < 1e-9)
      // every query timestep is softly aligned somewhere
      e.foreach(row => assert(row.sum > 1e-12))
    }
  }

  test("native dot/cosine/euclidean are BIT-identical to their reference folds") {
    // the oracle hashes depend on this: the native expressions replaced
    // UDF/HOF forms under the claim of identical left-fold order, so the
    // equality here must be ==, not isclose
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.functions.NativeOps
    forAll(eqLenPair) { case (a, b) =>
      val (ad, bd) = (ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val dotRef = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      assert(NativeOps.dot(ad, bd) == dotRef)
      val na = a.foldLeft(0.0)((acc, x) => acc + x * x)
      val nb = b.foldLeft(0.0)((acc, x) => acc + x * x)
      assert(NativeOps.cosine(ad, bd) == dotRef / (math.sqrt(na) * math.sqrt(nb)))
      assert(NativeOps.euclidean(ad, bd) ==
        Kernels.euclidean(uni(a.toIndexedSeq: _*), uni(b.toIndexedSeq: _*)))
    }
  }
}
