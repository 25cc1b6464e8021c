package graft.table

/**
 * Layout-quality metrics from manifest stats alone (zero data IO) — the
 * observability side of the cluster rewrite: a range probe on column `c`
 * must open every file whose [min,max] interval contains the probe point,
 * so the average interval-stabbing depth IS the expected files-per-probe.
 * 1.0 = perfectly disjoint zonemaps (each point hits one file); N = the
 * column is useless for pruning (every file spans the space). Iceberg
 * exposes the same idea as its clustering "overlap" metrics.
 */
object Layout {

  final case class OverlapReport(
      column: String,
      files: Int,
      filesWithStats: Int,
      avgDepth: Double,
      maxDepth: Int) {
    def pretty: String =
      f"$column: files=$files avgOverlapDepth=$avgDepth%.2f maxDepth=$maxDepth"
  }

  /**
   * Interval-stabbing depth over the files' [min,max] ranges for a NUMERIC
   * stats column, measured exactly by a sweep over interval endpoints:
   * avgDepth = the average (over files) number of files overlapping a
   * file's own range midpoint-free lower endpoint — i.e. how many files a
   * probe landing at each range start must open. Files without usable
   * stats are excluded (and reported).
   */
  def overlapDepth(entries: Seq[DataFile], column: String): OverlapReport = {
    val ranges = entries.flatMap { e =>
      for (lo <- e.statLong(column, lower = true);
           hi <- e.statLong(column, lower = false)) yield (lo, hi)
    }
    if (ranges.isEmpty) return OverlapReport(column, entries.size, 0, 0.0, 0)
    // depth at probe point p = |{(lo,hi) : lo <= p <= hi}|; probe at every
    // range's lower endpoint (the stabbing set's critical points)
    val los = ranges.map(_._1).sorted.toArray
    val his = ranges.map(_._2).sorted.toArray
    def countLe(a: Array[Long], v: Long): Int = {
      // upper-bound binary search: #elements <= v
      var lo = 0; var hi = a.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (a(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo
    }
    val depths = ranges.map { case (p, _) =>
      // started (lo <= p) minus already ended (hi < p, integer stats)
      countLe(los, p) - countLe(his, p - 1)
    }
    OverlapReport(column, entries.size, ranges.size,
      depths.sum.toDouble / depths.size, depths.max)
  }
}
