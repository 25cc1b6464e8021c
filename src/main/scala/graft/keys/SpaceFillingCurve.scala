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

  // ---- generalized Hilbert ("gilbert") over an ARBITRARY w×h rectangle ----
  // The power-of-2 Skilling transform above covers hypercubes; the
  // reference's aspiration is a curve over any rectangle (reference:
  // cursor/src/main/java/cursors/tbd/Gilbert.kt:14-94). This is the public
  // generalized-Hilbert recursion (J. Červený's "gilbert": split the long
  // axis, recurse with rotated/negated frames, force even splits so subcurve
  // orientations compose) — implemented both generatively (gilbertMap, for
  // verification) and as an O(log wh) per-point descent (gilbertXY2D, the
  // per-row key function).

  private def sgn(v: Long): Long = java.lang.Long.signum(v)

  /** Children of a non-terminal block, in curve order. Block = origin cell
   * (x,y), major vector (ax,ay), minor vector (bx,by), first index d0; one
   * component of each vector is always 0 (axis-aligned frames). */
  private def split(x: Long, y: Long, ax: Long, ay: Long, bx: Long, by: Long,
                    d0: Long): Array[Array[Long]] = {
    val w = math.abs(ax + ay); val h = math.abs(bx + by)
    val dax = sgn(ax); val day = sgn(ay); val dbx = sgn(bx); val dby = sgn(by)
    var ax2 = ax / 2; var ay2 = ay / 2
    var bx2 = bx / 2; var by2 = by / 2
    var w2 = math.abs(ax2 + ay2); var h2 = math.abs(bx2 + by2)
    if (2 * w > 3 * h) {
      if (w2 % 2 == 1 && w > 2) { ax2 += dax; ay2 += day; w2 += 1 }
      Array(
        Array(x, y, ax2, ay2, bx, by, d0),
        Array(x + ax2, y + ay2, ax - ax2, ay - ay2, bx, by, d0 + w2 * h))
    } else {
      if (h2 % 2 == 1 && h > 2) { bx2 += dbx; by2 += dby; h2 += 1 }
      Array(
        Array(x, y, bx2, by2, ax2, ay2, d0),
        Array(x + bx2, y + by2, ax, ay, bx - bx2, by - by2, d0 + w2 * h2),
        Array(x + (ax - dax) + (bx2 - dbx), y + (ay - day) + (by2 - dby),
          -bx2, -by2, -(ax - ax2), -(ay - ay2), d0 + w2 * h2 + w * (h - h2)))
    }
  }

  /** Does block `b` cover cell (px,py)? Axis-aligned, so bounds are the
   * origin cell and the far corner cell. */
  private def covers(b: Array[Long], px: Long, py: Long): Boolean = {
    val fx = b(0) + b(2) + b(4) - sgn(b(2)) - sgn(b(4))
    val fy = b(1) + b(3) + b(5) - sgn(b(3)) - sgn(b(5))
    px >= math.min(b(0), fx) && px <= math.max(b(0), fx) &&
      py >= math.min(b(1), fy) && py <= math.max(b(1), fy)
  }

  /** Curve index of cell (px,py) in the w×h rectangle: descend the block
   * recursion, O(log wh) splits, no enumeration. */
  def gilbertXY2D(w: Int, h: Int, px: Int, py: Int): Long = {
    require(w > 0 && h > 0 && px >= 0 && px < w && py >= 0 && py < h,
      s"gilbert: point ($px,$py) outside ${w}x$h")
    var b = Array(0L, 0L, w.toLong, 0L, 0L, h.toLong, 0L)
    while (true) {
      val bw = math.abs(b(2) + b(3)); val bh = math.abs(b(4) + b(5))
      if (bh == 1) return b(6) + sgn(b(2)) * (px - b(0)) + sgn(b(3)) * (py - b(1))
      if (bw == 1) return b(6) + sgn(b(4)) * (px - b(0)) + sgn(b(5)) * (py - b(1))
      val ch = split(b(0), b(1), b(2), b(3), b(4), b(5), b(6))
      b = ch.find(covers(_, px, py)).getOrElse(
        throw new IllegalStateException("gilbert split lost the point"))
    }
    -1L // unreachable
  }

  /** Enumerate the full w×h curve as cell -> index (driver/test-side:
   * the generative form the descent must agree with). */
  def gilbertMap(w: Int, h: Int): collection.mutable.HashMap[(Int, Int), Long] = {
    val out = collection.mutable.HashMap[(Int, Int), Long]()
    def go(b: Array[Long]): Unit = {
      val bw = math.abs(b(2) + b(3)); val bh = math.abs(b(4) + b(5))
      if (bh == 1) {
        var i = 0L
        while (i < bw) {
          out(((b(0) + sgn(b(2)) * i).toInt, (b(1) + sgn(b(3)) * i).toInt)) = b(6) + i
          i += 1
        }
      } else if (bw == 1) {
        var i = 0L
        while (i < bh) {
          out(((b(0) + sgn(b(4)) * i).toInt, (b(1) + sgn(b(5)) * i).toInt)) = b(6) + i
          i += 1
        }
      } else split(b(0), b(1), b(2), b(3), b(4), b(5), b(6)).foreach(go)
    }
    go(Array(0L, 0L, w.toLong, 0L, 0L, h.toLong, 0L))
    out
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
