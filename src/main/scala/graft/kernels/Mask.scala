package graft.kernels

/** Global path constraints for alignment DPs, represented as per-row
  * inclusive column bounds `[jLo(i), jHi(i)]` instead of a materialized
  * (sz1, sz2) mask matrix — this turns the reference's O(sz1*sz2) mask
  * allocation (`/root/reference/tslearn/metrics/dtw_variants.py:906-1057`)
  * into O(sz1) index arithmetic and lets the DP skip pruned cells.
  */
final case class Bounds(jLo: Array[Int], jHi: Array[Int]) {
  @inline def lo(i: Int): Int = jLo(i)
  @inline def hi(i: Int): Int = jHi(i)
}

object Mask {
  /** Unconstrained: every cell admissible. */
  def none(sz1: Int, sz2: Int): Bounds =
    Bounds(Array.fill(sz1)(0), Array.fill(sz1)(sz2 - 1))

  /** Sakoe-Chiba band. Semantics match
    * `dtw_variants.py:906-955` (band hugs the rectangle diagonal for
    * unequal lengths): for sz1<=sz2 the admissible j for row i are
    * [i-radius, i+(sz2-sz1+radius)]; transposed when sz1>sz2.
    */
  def sakoeChiba(sz1: Int, sz2: Int, radius: Int): Bounds = {
    val jLo = new Array[Int](sz1)
    val jHi = new Array[Int](sz1)
    if (sz1 <= sz2) {
      val width = sz2 - sz1 + radius
      var i = 0
      while (i < sz1) {
        jLo(i) = math.max(0, i - radius)
        jHi(i) = math.min(sz2 - 1, i + width)
        i += 1
      }
    } else {
      val width = sz1 - sz2 + radius
      var i = 0
      while (i < sz1) {
        jLo(i) = math.max(0, i - width)
        jHi(i) = math.min(sz2 - 1, i + radius)
        i += 1
      }
    }
    Bounds(jLo, jHi)
  }

  /** Itakura parallelogram. Column-wise bounds per
    * `dtw_variants.py:958-1012` (incl. the reference's round-to-2-decimals
    * then ceil/floor quirk, reproduced for value parity), converted to
    * per-row bounds. Returns rows with lo>hi when the slope is unfeasible.
    */
  def itakura(sz1: Int, sz2: Int, maxSlope: Double = 2.0): Bounds = {
    // round-half-even to 2 decimals, as numpy.round does
    def r2(x: Double): Double = math.rint(x * 100.0) / 100.0
    val minS = (1.0 / maxSlope) * (sz1.toDouble / sz2)
    val maxS = maxSlope * (sz1.toDouble / sz2)
    val lb = new Array[Int](sz2) // first admissible row in column j
    val ub = new Array[Int](sz2) // one past last admissible row
    var j = 0
    while (j < sz2) {
      val lb0 = minS * j
      val lb1 = (sz1 - 1) - maxS * (sz2 - 1) + maxS * j
      lb(j) = math.ceil(math.max(r2(lb0), r2(lb1))).toInt
      val ub0 = maxS * j
      val ub1 = (sz1 - 1) - minS * (sz2 - 1) + minS * j
      ub(j) = math.floor(math.min(r2(ub0), r2(ub1)) + 1).toInt
      j += 1
    }
    val jLo = Array.fill(sz1)(Int.MaxValue)
    val jHi = Array.fill(sz1)(Int.MinValue)
    j = 0
    while (j < sz2) {
      var i = math.max(0, lb(j))
      val end = math.min(sz1, ub(j))
      while (i < end) {
        if (j < jLo(i)) jLo(i) = j
        if (j > jHi(i)) jHi(i) = j
        i += 1
      }
      j += 1
    }
    var i = 0
    while (i < sz1) { if (jLo(i) == Int.MaxValue) { jLo(i) = 1; jHi(i) = 0 }; i += 1 }
    Bounds(jLo, jHi)
  }

  /** Dispatch mirroring `compute_mask` (`dtw_variants.py:1060-1127`).
    * constraint: 0 = none, 1 = itakura, 2 = sakoe_chiba. When constraint
    * is 0 but a radius/slope is given, that constraint is inferred.
    */
  def compute(sz1: Int, sz2: Int, constraint: Int,
              sakoeChibaRadius: Int = -1, itakuraMaxSlope: Double = -1.0): Bounds = {
    if (constraint == 2 || (constraint == 0 && sakoeChibaRadius >= 0))
      sakoeChiba(sz1, sz2, if (sakoeChibaRadius >= 0) sakoeChibaRadius else 1)
    else if (constraint == 1 || (constraint == 0 && itakuraMaxSlope > 0))
      itakura(sz1, sz2, if (itakuraMaxSlope > 0) itakuraMaxSlope else 2.0)
    else none(sz1, sz2)
  }
}
