package graft.kernels

/** FFT-based normalized cross-correlation — semantics of
  * `/root/reference/tslearn/metrics/cycc.pyx:16-96` (KShape inner loop),
  * O(sz·log sz) per pair via power-of-two radix-2 FFT.
  */
object Ncc {

  /** In-place iterative radix-2 FFT (Cooley-Tukey). `re`/`im` length must
    * be a power of two. invert=true → inverse transform (scaled by 1/n). */
  def fft(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "fft size must be a power of two")
    // bit reversal
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (invert) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var k = 0
      while (k < n) {
        var cwr = 1.0; var cwi = 0.0
        var l = 0
        while (l < len / 2) {
          val ur = re(k + l); val ui = im(k + l)
          val vr = re(k + l + len / 2) * cwr - im(k + l + len / 2) * cwi
          val vi = re(k + l + len / 2) * cwi + im(k + l + len / 2) * cwr
          re(k + l) = ur + vr; im(k + l) = ui + vi
          re(k + l + len / 2) = ur - vr; im(k + l + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          l += 1
        }
        k += len
      }
      len <<= 1
    }
    if (invert) {
      var t = 0
      while (t < n) { re(t) /= n; im(t) /= n; t += 1 }
    }
  }

  private def nextPow2(x: Int): Int = {
    var p = 1
    while (p < x) p <<= 1
    p
  }

  private def frobNorm(ts: Kernels.TS): Double = {
    var s = 0.0; var i = 0
    while (i < ts.length) {
      var k = 0
      while (k < ts(i).length) { s += ts(i)(k) * ts(i)(k); k += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Cross-correlation of equal-length multivariate series at every shift,
    * summed over dims, normalized by ‖s1‖·‖s2‖ — `cycc.pyx:16-41`.
    * Returns array of length 2·sz−1 (shifts −(sz−1) … +(sz−1)). */
  def normalizedCc(s1: Kernels.TS, s2: Kernels.TS): Array[Double] = {
    val sz = s1.length
    val d = s1(0).length
    val denomRaw = frobNorm(s1) * frobNorm(s2)
    val denom = if (denomRaw == 0.0) 1.0 else denomRaw
    val fftSz = nextPow2(2 * sz - 1)
    val acc = new Array[Double](fftSz)
    var k = 0
    while (k < d) {
      val re1 = new Array[Double](fftSz); val im1 = new Array[Double](fftSz)
      val re2 = new Array[Double](fftSz); val im2 = new Array[Double](fftSz)
      var t = 0
      while (t < sz) { re1(t) = s1(t)(k); re2(t) = s2(t)(k); t += 1 }
      fft(re1, im1, invert = false)
      fft(re2, im2, invert = false)
      // multiply re1 by conj(re2)
      var f = 0
      while (f < fftSz) {
        val rr = re1(f) * re2(f) + im1(f) * im2(f)
        val ii = im1(f) * re2(f) - re1(f) * im2(f)
        re1(f) = rr; im1(f) = ii
        f += 1
      }
      fft(re1, im1, invert = true)
      f = 0
      while (f < fftSz) { acc(f) += re1(f); f += 1 }
      k += 1
    }
    // reorder: negative shifts (tail) then non-negative shifts (head)
    val out = new Array[Double](2 * sz - 1)
    var i = 0
    while (i < sz - 1) { out(i) = acc(fftSz - (sz - 1) + i) / denom; i += 1 }
    i = 0
    while (i < sz) { out(sz - 1 + i) = acc(i) / denom; i += 1 }
    out
  }

  /** max over shifts of NCC — the KShape / SBD distance core
    * (`cycc.pyx:44-68`): dist = 1 − max NCC. */
  def maxNcc(s1: Kernels.TS, s2: Kernels.TS): Double = {
    val cc = normalizedCc(s1, s2)
    var m = Double.NegativeInfinity
    var i = 0
    while (i < cc.length) { if (cc(i) > m) m = cc(i); i += 1 }
    m
  }

  def sbd(s1: Kernels.TS, s2: Kernels.TS): Double = 1.0 - maxNcc(s1, s2)

  /** Shift s2 to best-align with reference s1 (SBD alignment), used by
    * KShape shape extraction — `cycc.pyx:71-96`. */
  def shiftToAlign(ref: Kernels.TS, other: Kernels.TS): Kernels.TS = {
    val cc = normalizedCc(ref, other)
    var best = 0; var i = 1
    while (i < cc.length) { if (cc(i) > cc(best)) best = i; i += 1 }
    val shift = best - (ref.length - 1)
    val sz = other.length
    val d = other(0).length
    val out = Array.fill(sz)(new Array[Double](d))
    var t = 0
    while (t < sz) {
      val src = t - shift
      if (src >= 0 && src < sz) out(t) = other(src)
      t += 1
    }
    out
  }
}
