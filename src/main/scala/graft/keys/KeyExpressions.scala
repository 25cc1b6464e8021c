package graft.keys

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native Catalyst expressions for the clustering keys (north_star:
 * "Z-order and Hilbert-curve clustering on (clip_id, sr_hz, dur_ms) via
 * bit-interleaved key construction in Catalyst expressions").
 *
 * Both expressions:
 *  - take N LongType children (the Column helpers below cast/hash raw
 *    columns into curve space first),
 *  - clamp each dim into [0, 2^bitsPerDim),
 *  - are deterministic and null-tolerant (null dim -> 0), which keeps
 *    maintenance jobs resumable (a re-run maps every row to the same file),
 *  - participate in whole-stage codegen via real doGenCode (the pure cores in
 *    [[SpaceFillingCurve]] are reachable as Java statics through Scala's
 *    object static forwarders).
 */
abstract class CurveKeyExpression extends Expression {
  def bitsPerDim: Int
  /** Name of the static method on graft.keys.SpaceFillingCurve to call. */
  protected def staticMethod: String
  protected def compute(dims: Array[Long]): Long

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least one child")
    else if (bitsPerDim * children.size > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: bitsPerDim=$bitsPerDim x ${children.size} dims exceeds 63 bits")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName children must all be LONG")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val dims = new Array[Long](children.size)
    var i = 0
    while (i < dims.length) {
      val v = children(i).eval(input)
      dims(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    compute(dims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("dims")
    val evals = children.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |$arr[$i] = ${e.isNull} ? 0L : ${e.value};
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long[] $arr = new long[${children.size}];
        |$fill
        |long ${ev.value} = graft.keys.SpaceFillingCurve.$staticMethod($arr, $bitsPerDim);
      """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

/** Bit-interleaved Morton key over N long dims. */
case class ZOrderKey(children: Seq[Expression], bitsPerDim: Int) extends CurveKeyExpression {
  override def prettyName: String = "zorder_key"
  override protected def staticMethod: String = "zOrderClamped"
  override protected def compute(dims: Array[Long]): Long =
    SpaceFillingCurve.zOrderClamped(dims, bitsPerDim)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** N-dim Hilbert curve key (Skilling transform) over N long dims. */
case class HilbertKey(children: Seq[Expression], bitsPerDim: Int) extends CurveKeyExpression {
  override def prettyName: String = "hilbert_key"
  override protected def staticMethod: String = "hilbertClamped"
  override protected def compute(dims: Array[Long]): Long =
    SpaceFillingCurve.hilbertClamped(dims, bitsPerDim)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object Keys {
  /** Hash-normalize a column into unsigned `bits`-wide curve space: the
   * top `bits` of xxhash64 (uniform spread — the MD4-bucket idea of the
   * reference, cursor/src/main/java/cursors/Clusters.kt:132-140). Range
   * columns skip this and keep their natural order (range locality). */
  def curveDim(c: Column, bits: Int): Column =
    shiftrightunsigned(xxhash64(c), 64 - bits)

  private def toLongDims(bitsPerDim: Int, hashCols: Seq[Column], rangeCols: Seq[Column]): Seq[Expression] = {
    val hashed = hashCols.map(curveDim(_, bitsPerDim))
    val ranged = rangeCols.map(_.cast(LongType))
    (hashed ++ ranged).map(ExpressionUtils.expression)
  }

  /** Z-order key Column: `hashCols` are hash-normalized (e.g. clip_id),
   * `rangeCols` keep natural order (e.g. sr_hz, dur_ms). */
  def zorderKey(bitsPerDim: Int, hashCols: Seq[Column], rangeCols: Seq[Column]): Column =
    ExpressionUtils.column(ZOrderKey(toLongDims(bitsPerDim, hashCols, rangeCols), bitsPerDim))

  /** Hilbert key Column, same normalization contract as [[zorderKey]]. */
  def hilbertKey(bitsPerDim: Int, hashCols: Seq[Column], rangeCols: Seq[Column]): Column =
    ExpressionUtils.column(HilbertKey(toLongDims(bitsPerDim, hashCols, rangeCols), bitsPerDim))

  /** The canonical clip-table clustering key per north_star:
   * (clip_id hashed, sr_hz, dur_ms), 21 bits/dim = 63 bits total. */
  def clipZOrderKey(clipId: Column, srHz: Column, durMs: Column): Column =
    zorderKey(21, Seq(clipId), Seq(srHz, durMs))

  def clipHilbertKey(clipId: Column, srHz: Column, durMs: Column): Column =
    hilbertKey(21, Seq(clipId), Seq(srHz, durMs))

  /** Salt column for skew handling: deterministic bucket in [0, buckets). */
  def salt(c: Column, buckets: Int): Column = pmod(xxhash64(c), lit(buckets.toLong))

  /** Register `zorder_key` / `hilbert_key` for SQL use. A bitsPerDim arg is
   * not supported in SQL form: each call uses floor(63 / #args) bits per
   * dimension (31 for 2 args, 21 for 3 — the same totals the Scala-side
   * clip keys use). More than 31 dimensions is refused: bitsPerDim would
   * hit 1-0 bits and the key would silently stop discriminating. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    def bits(n: Int): Int = {
      require(n >= 1 && n <= 31,
        s"curve key: $n dims unsupported (63-bit budget -> 2+ bits/dim needs <= 31)")
      63 / n
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key", exprs => ZOrderKey(exprs, bits(exprs.size)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_key", exprs => HilbertKey(exprs, bits(exprs.size)), "built-in")
  }
}
