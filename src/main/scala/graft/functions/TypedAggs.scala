package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/**
 * Typed Aggregator surface — the Spark form of the reference's binary
 * reducers fed to group/Sigma (cursor/src/main/java/cursors/Clusters.kt:61-88,
 * cursors/macros/Operators.kt:13-24).
 */
object TypedAggs {

  /** Null-as-zero sum — the exact semantics of the reference's `floatSum`
   * (cursor/src/main/java/cursors/io/IOMemento.kt:110-129), which folds null
   * cells as 0 instead of propagating null. Long domain (cents). */
  object NullAsZeroSum extends Aggregator[java.lang.Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: java.lang.Long): Long =
      b + (if (a == null) 0L else a.longValue())
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** (count, sum, sumSq) in one pass -> population variance; the
   * one-pass-fold shape of the reference's featureRange. Exact arithmetic
   * with LOUD overflow: `a*a` and the running sums go through
   * multiplyExact/addExact, so a domain too wide for the Long accumulator
   * (|value| above ~3e9, or enough rows to push sumSq past 2^63) throws
   * ArithmeticException instead of wrapping into silent garbage variance —
   * callers with such domains should pre-scale (q39 aggregates whole
   * dollars for exactly this reason). */
  object VarianceOfCents extends Aggregator[java.lang.Long, (Long, Long, Long), Double] {
    override def zero: (Long, Long, Long) = (0L, 0L, 0L)
    override def reduce(b: (Long, Long, Long), a: java.lang.Long): (Long, Long, Long) =
      if (a == null) b
      else (b._1 + 1, Math.addExact(b._2, a.longValue()),
        Math.addExact(b._3, Math.multiplyExact(a.longValue(), a.longValue())))
    override def merge(x: (Long, Long, Long), y: (Long, Long, Long)): (Long, Long, Long) =
      (x._1 + y._1, Math.addExact(x._2, y._2), Math.addExact(x._3, y._3))
    override def finish(r: (Long, Long, Long)): Double =
      if (r._1 == 0) 0.0
      else {
        val mean = r._2.toDouble / r._1
        r._3.toDouble / r._1 - mean * mean
      }
    override def bufferEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
