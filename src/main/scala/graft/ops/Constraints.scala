package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative write-time data-quality gates: a batch must satisfy every
 * constraint before [[Append.run]] will commit it — the schema-on-write half
 * the reference's type mementos imply (ISAMCursor.kt type/coord contracts)
 * plus the row-level checks a training-data pipeline needs (no null keys, no
 * out-of-range rates, no duplicate clip ids).
 *
 * All row-level constraints evaluate in ONE aggregate pass over the batch
 * (each contributes a violation-count aggregate); `Unique` rides the same
 * pass as `count - countDistinct`. Cost at scale: one extra scan of the
 * incoming batch (not the table), before any file is written.
 */
sealed trait Constraint {
  def name: String
  /** Aggregate expression counting this constraint's violating rows. */
  def violationCount: Column
}

object Constraint {
  /** Column must be non-null (and non-empty for strings/binary if strict). */
  final case class NotNull(column: String) extends Constraint {
    val name = s"not_null($column)"
    def violationCount: Column = sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  final case class InRange(column: String, lo: Long, hi: Long) extends Constraint {
    val name = s"in_range($column,$lo,$hi)"
    def violationCount: Column = sum(
      when(col(column).isNull || col(column) < lo || col(column) > hi, 1L)
        .otherwise(0L))
  }

  final case class OneOf(column: String, values: Seq[String]) extends Constraint {
    val name = s"one_of($column)"
    def violationCount: Column = sum(
      when(col(column).isin(values: _*), 0L).otherwise(1L))
  }

  /** Non-null values of `column` must be unique within the batch. */
  final case class Unique(column: String) extends Constraint {
    val name = s"unique($column)"
    def violationCount: Column = count(col(column)) - countDistinct(col(column))
  }

  /** Generic SQL predicate that every row must satisfy. */
  final case class Check(label: String, predicateSql: String) extends Constraint {
    val name = s"check($label)"
    def violationCount: Column = sum(
      when(coalesce(expr(predicateSql), lit(false)), 0L).otherwise(1L))
  }

  /** Canonical gates for the clip table. */
  val clipDefaults: Seq[Constraint] = Seq(
    NotNull("clip_id"), Unique("clip_id"),
    InRange("sr_hz", 8000, 48000), InRange("dur_ms", 1, 10 * 60 * 1000),
    OneOf("codec", Seq("pcm16le", "ulaw", "pcm8")),
    Check("payload_nonempty", "length(bytes) > 0"))
}

final case class Violation(constraint: String, rows: Long)

final class ConstraintViolationException(val violations: Seq[Violation])
  extends RuntimeException(
    "constraint violations: " +
      violations.map(v => s"${v.constraint}=${v.rows}").mkString(", "))

object Constraints {

  /** One aggregate pass; returns only the violated constraints. */
  def check(df: DataFrame, cs: Seq[Constraint]): Seq[Violation] = {
    if (cs.isEmpty) return Seq.empty
    val aggs = cs.zipWithIndex.map { case (c, i) =>
      coalesce(c.violationCount, lit(0L)).as(s"v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cs.zipWithIndex
      .map { case (c, i) => Violation(c.name, row.getAs[Long](s"v$i")) }
      .filter(_.rows > 0)
  }

  /** Throw (with the full per-constraint report) on any violation. */
  def enforce(df: DataFrame, cs: Seq[Constraint]): Unit = {
    val bad = check(df, cs)
    if (bad.nonEmpty) throw new ConstraintViolationException(bad)
  }
}
