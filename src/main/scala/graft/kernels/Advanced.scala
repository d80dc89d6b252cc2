package graft.kernels

/** Remaining alignment kernels: L-DTW, DTW over an arbitrary local metric,
  * and Canonical Time Warping. Citations into `/root/reference/tslearn/`.
  */
object Advanced {
  import Kernels.TS

  /** DTW under a path-length cap L — `dtw_variants.py:468-743`.
    * The reference's per-cell dict DP is re-expressed as a rolling
    * layer-per-step DP: O(L·n·m) time, O(n·m) space (the dict version is
    * O(n·m·L) space). Returns √(min cost over paths with ≤ L steps). */
  def dtwLimitedWarpingLength(s1: TS, s2: TS, maxLength: Int): Double = {
    val n = s1.length; val m = s2.length
    require(maxLength >= math.max(n, m),
      s"max_length $maxLength < max(sz1, sz2) = ${math.max(n, m)}: no admissible path")
    val Inf = Double.PositiveInfinity
    var prev = Array.fill(n, m)(Inf)
    var cur = Array.fill(n, m)(Inf)
    prev(0)(0) = Kernels.localSqDist(s1(0), s2(0)) // layer s=0 (1 cell)
    var best = if (n == 1 && m == 1) prev(0)(0) else Inf
    var s = 1
    while (s < maxLength) {
      var i = 0
      while (i < n) {
        java.util.Arrays.fill(cur(i), Inf)
        i += 1
      }
      i = 0
      while (i < n) {
        var j = 0
        while (j < m) {
          // unreachable cells stay Inf in prev, so reachability is
          // implicit in the min over predecessors
          var p = Inf
          if (i > 0) { if (prev(i - 1)(j) < p) p = prev(i - 1)(j) }
          if (j > 0) { if (prev(i)(j - 1) < p) p = prev(i)(j - 1) }
          if (i > 0 && j > 0) { if (prev(i - 1)(j - 1) < p) p = prev(i - 1)(j - 1) }
          if (p != Inf) cur(i)(j) = p + Kernels.localSqDist(s1(i), s2(j))
          j += 1
        }
        i += 1
      }
      if (cur(n - 1)(m - 1) < best) best = cur(n - 1)(m - 1)
      val t = prev; prev = cur; cur = t
      s += 1
    }
    math.sqrt(best)
  }

  /** DTW accumulated matrix over an arbitrary local distance —
    * `dtw_path_from_metric` (`dtw_variants.py:201-381`). */
  def dtwPathFromMetric(s1: TS, s2: TS,
                        local: (Array[Double], Array[Double]) => Double): (Array[(Int, Int)], Double) = {
    val l1 = s1.length; val l2 = s2.length
    val cum = Array.fill(l1 + 1, l2 + 1)(Double.PositiveInfinity)
    cum(0)(0) = 0.0
    var i = 1
    while (i <= l1) {
      var j = 1
      while (j <= l2) {
        var m = cum(i - 1)(j)
        if (cum(i)(j - 1) < m) m = cum(i)(j - 1)
        if (cum(i - 1)(j - 1) < m) m = cum(i - 1)(j - 1)
        cum(i)(j) = local(s1(i - 1), s2(j - 1)) + m
        j += 1
      }
      i += 1
    }
    // backtrack (same tie rules as dtwPath)
    var pi = l1; var pj = l2
    val path = scala.collection.mutable.ArrayBuffer((pi - 1, pj - 1))
    while (pi > 1 || pj > 1) {
      if (pi == 1) pj -= 1
      else if (pj == 1) pi -= 1
      else {
        val diag = cum(pi - 1)(pj - 1); val up = cum(pi - 1)(pj); val left = cum(pi)(pj - 1)
        if (diag <= up && diag <= left) { pi -= 1; pj -= 1 }
        else if (up <= left) pi -= 1
        else pj -= 1
      }
      path += ((pi - 1, pj - 1))
    }
    (path.reverse.toArray, cum(l1)(l2)) // note: raw accumulated cost, not sqrt
  }

  /** Minimal CCA via the standard generalized-eigen formulation
    * (regularized), replacing sklearn's CCA in CTW — returns projections
    * (components per input). Public-textbook algorithm. */
  private def ccaProject(x: Array[Array[Double]], y: Array[Array[Double]], nComp: Int):
      (Array[Array[Double]], Array[Array[Double]]) = {
    import breeze.linalg._
    val xm = DenseMatrix(x: _*)
    val ym = DenseMatrix(y: _*)
    def center(m: DenseMatrix[Double]): DenseMatrix[Double] = {
      val mu = breeze.stats.mean(m(::, *)).t
      m(*, ::) - mu
    }
    val xc = center(xm); val yc = center(ym)
    val n = xc.rows.toDouble
    val reg = 1e-8
    val sxx = (xc.t * xc) / n + DenseMatrix.eye[Double](xc.cols) * reg
    val syy = (yc.t * yc) / n + DenseMatrix.eye[Double](yc.cols) * reg
    val sxy = (xc.t * yc) / n
    val m1 = inv(sxx) * sxy * inv(syy) * sxy.t
    val es = eig(m1)
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).map(_._2).take(nComp)
    val wx = DenseMatrix.horzcat(order.map(i => es.eigenvectors(::, i).toDenseMatrix.t): _*)
    // wy from wx: Syy^-1 Syx wx (up to scale)
    val wy = inv(syy) * sxy.t * wx
    val px = xc * wx
    val py = yc * wy
    // normalize projection variance to 1 per component (sklearn-style scale)
    def norm(mm: DenseMatrix[Double]): DenseMatrix[Double] = {
      val out = mm.copy
      for (c <- 0 until mm.cols) {
        val sd = breeze.stats.stddev(mm(::, c))
        if (sd > 1e-12) out(::, c) :/= sd
      }
      out
    }
    val pxn = norm(px); val pyn = norm(py)
    (Array.tabulate(xc.rows)(r => Array.tabulate(nComp)(c => pxn(r, c))),
      Array.tabulate(yc.rows)(r => Array.tabulate(nComp)(c => pyn(r, c))))
  }

  /** Canonical Time Warping — `ctw.py:39-364`. Alternates CCA feature
    * registration and DTW alignment until the path reaches a fixpoint.
    * NOTE: the reference's convergence test compares the path with itself
    * (`ctw.py:168-169`) and therefore always stops after one CCA round;
    * we implement the *intended* fixpoint (previous vs current path) per
    * SURVEY §7.4 and document the deviation here. */
  def ctwPath(s1: TS, s2: TS, maxIter: Int = 100, nComponents: Int = -1):
      (Array[(Int, Int)], Double) = {
    val nc = if (nComponents > 0) nComponents else math.min(s1(0).length, s2(0).length)
    def truncate(s: TS): TS = s.map(_.take(nc))
    var (path, score) = Kernels.dtwPath(truncate(s1), truncate(s2))
    var it = 0
    var converged = false
    while (it < maxIter - 1 && !converged) {
      // warp both series along the current path, fit CCA on aligned rows
      val ax = path.map { case (i, _) => s1(i) }
      val ay = path.map { case (_, j) => s2(j) }
      val (px, py) = try ccaProject(ax, ay, nc) catch { case _: Throwable => return (path, score) }
      // project the full (unwarped) series through the same alignment by
      // re-fitting on full series via the aligned CCA basis approximation:
      // use projections of the aligned rows indexed back to originals
      val s1p: TS = {
        val acc = Array.fill(s1.length)(new Array[Double](nc))
        val cnt = new Array[Int](s1.length)
        path.indices.foreach { k => val i = path(k)._1; acc(i) = px(k); cnt(i) += 1 }
        acc
      }
      val s2p: TS = {
        val acc = Array.fill(s2.length)(new Array[Double](nc))
        path.indices.foreach { k => val j = path(k)._2; acc(j) = py(k) }
        acc
      }
      val (newPath, newScore) = Kernels.dtwPath(s1p, s2p)
      if (newPath.sameElements(path)) converged = true
      path = newPath
      score = newScore
      it += 1
    }
    (path, score)
  }

  def ctw(s1: TS, s2: TS, maxIter: Int = 100): Double = ctwPath(s1, s2, maxIter)._2
}
