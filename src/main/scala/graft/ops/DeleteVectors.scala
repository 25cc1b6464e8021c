package graft.ops

/**
 * Deletion-vector payloads: a POSITION mask for one data file packed as a
 * plain little-endian bitset (bit `pos` set = row `pos` deleted) — the
 * Iceberg v3 deletion-vector idea re-expressed minimally. A delete file of
 * `(file_path, dv: binary)` carries ONE row per masked data file instead of
 * one row per masked data row, so the read-side anti-join input and the
 * mask storage stop growing with deleted-row count.
 *
 * Format: the bitset words of `[0, maxPos]`, 8 bytes per 64 rows, no
 * header. A bit beyond the array is "not deleted" by construction, so the
 * vector for a prefix of the file stays valid as the file's row count
 * grows (it can't — files are immutable — but the property keeps
 * `contains` total). Packing is refused above [[MaxPackPos]] (a sparse
 * mask near the end of a giant file would pay the dense-bitset size);
 * such files keep the `(file_path, pos)` pair form.
 */
object DeleteVectors {

  /** Largest row index a dense bitset may carry: 2^26 rows = 8 MiB/file. */
  val MaxPackPos: Long = (1L << 26) - 1

  def encode(positions: Seq[Long]): Array[Byte] = {
    require(positions.nonEmpty, "empty deletion vector")
    val maxPos = positions.max
    require(maxPos <= MaxPackPos && positions.forall(_ >= 0),
      s"positions out of packable range [0, $MaxPackPos]")
    val bytes = new Array[Byte](((maxPos >> 3) + 1).toInt)
    positions.foreach { p =>
      bytes((p >> 3).toInt) = (bytes((p >> 3).toInt) | (1 << (p & 7).toInt)).toByte
    }
    bytes
  }

  def contains(dv: Array[Byte], pos: Long): Boolean = {
    if (dv == null || pos < 0) return false
    val byteIdx = pos >> 3
    if (byteIdx >= dv.length) return false
    (dv(byteIdx.toInt) & (1 << (pos & 7).toInt)) != 0
  }

  /** All set positions — CDC key resolution and re-packing read this. */
  def expand(dv: Array[Byte]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var i = 0
    while (i < dv.length) {
      val b = dv(i) & 0xff
      if (b != 0) {
        var j = 0
        while (j < 8) {
          if ((b & (1 << j)) != 0) out += (i.toLong << 3) + j
          j += 1
        }
      }
      i += 1
    }
    out.result()
  }
}
