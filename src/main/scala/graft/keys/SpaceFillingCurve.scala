package graft.keys

/**
 * Pure bit-math cores for Z-order (Morton) and Hilbert clustering keys.
 *
 * The reference only enumerates a generalized Hilbert ("gilbert") curve
 * index->(x,y) (reference: cursor/src/main/java/cursors/tbd/Gilbert.kt:25-94)
 * and declares an abstract `Hilbert` ordering marker
 * (cursor/src/main/java/cursors/context/Ordering.kt:105). Clustering a table
 * needs the inverse direction — coords -> curve position — so this implements
 * the classic n-dimensional Hilbert transform (J. Skilling, "Programming the
 * Hilbert curve", AIP Conf. Proc. 707, 2004: public-domain algorithm shape)
 * plus plain bit interleaving for Z-order.
 *
 * All functions are total, allocation-light, and deterministic — they back
 * Catalyst expressions that MUST be deterministic for resumable maintenance.
 */
object SpaceFillingCurve {

  /** Interleave the low `bits` bits of each dim: bit j of dim i lands at
   * position j*n + i (dim 0 = least significant within a bit-group).
   * Total bits (bits*n) must be <= 63. */
  def zOrder(dims: Array[Long], bits: Int): Long = {
    val n = dims.length
    require(bits * n <= 63, s"zorder: $bits bits x $n dims > 63")
    var out = 0L
    var j = 0
    while (j < bits) {
      var i = 0
      while (i < n) {
        out |= ((dims(i) >>> j) & 1L) << (j * n + i)
        i += 1
      }
      j += 1
    }
    out
  }

  /** Hilbert index of point `dims` (each in [0, 2^bits)); bits*n <= 63.
   * Skilling's AxestoTranspose followed by bit interleave (MSB-first). */
  def hilbert(dims: Array[Long], bits: Int): Long = {
    val n = dims.length
    require(bits * n <= 63, s"hilbert: $bits bits x $n dims > 63")
    val x = new Array[Long](n)
    System.arraycopy(dims, 0, x, 0, n)
    axesToTranspose(x, bits)
    // interleave transposed form: bit q of x(i) -> index bit (q*n + (n-1-i))
    var out = 0L
    var q = bits - 1
    var pos = bits * n - 1
    while (q >= 0) {
      var i = 0
      while (i < n) {
        out |= ((x(i) >>> q) & 1L) << pos
        pos -= 1
        i += 1
      }
      q -= 1
    }
    out
  }

  /** Inverse: Hilbert index -> coords (used by property tests / adjacency
   * verification, the analog of the reference curve enumerating positions). */
  def hilbertInverse(index: Long, n: Int, bits: Int): Array[Long] = {
    val x = new Array[Long](n)
    var pos = bits * n - 1
    var q = bits - 1
    while (q >= 0) {
      var i = 0
      while (i < n) {
        x(i) |= ((index >>> pos) & 1L) << q
        pos -= 1
        i += 1
      }
      q -= 1
    }
    transposeToAxes(x, bits)
    x
  }

  /** Skilling: in-place axes -> transpose form. */
  private[keys] def axesToTranspose(x: Array[Long], b: Int): Unit = {
    val n = x.length
    val m = 1L << (b - 1)
    // Inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
  }

  /** Skilling: in-place transpose form -> axes. */
  private[keys] def transposeToAxes(x: Array[Long], b: Int): Unit = {
    val n = x.length
    val big = 2L << (b - 1)
    // Gray decode by H ^ (H/2)
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // Undo excess work
    var q = 2L
    while (q != big) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
  }

  /** Clamp a signed long into [0, 2^bits): negatives -> 0, overflow -> max.
   * Used to normalize raw column values (sr_hz, dur_ms, hashed clip_id)
   * into curve space. */
  def clampToBits(v: Long, bits: Int): Long = {
    val max = (1L << bits) - 1
    if (v < 0) 0L else if (v > max) max else v
  }

  /** Clamp each dim then Z-order interleave. MUTATES `dims` (callers from
   * generated code pass a scratch array). Java-static via forwarder —
   * called from whole-stage-codegen'd expressions. */
  def zOrderClamped(dims: Array[Long], bits: Int): Long = {
    var i = 0
    while (i < dims.length) { dims(i) = clampToBits(dims(i), bits); i += 1 }
    zOrder(dims, bits)
  }

  /** Clamp each dim then Hilbert transform. MUTATES `dims`. */
  def hilbertClamped(dims: Array[Long], bits: Int): Long = {
    var i = 0
    while (i < dims.length) { dims(i) = clampToBits(dims(i), bits); i += 1 }
    hilbert(dims, bits)
  }
}
