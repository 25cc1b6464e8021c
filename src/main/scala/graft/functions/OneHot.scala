package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Generic one-hot encoder with DummySpec drop semantics — the re-expression
 * of the reference's category scan + dummy-variable emitter
 * (cursor/src/main/java/cursors/Categories.kt:33-77,
 * vector-like/src/main/java/vec/ml/DummySpec.kt:6-8): distinct-scan the
 * column, synthesize one indicator per surviving category (sorted for
 * determinism), with drop-first / drop-last / drop-named rules for the
 * reference-dummy encoding that avoids collinearity.
 *
 * The distinct scan collects ONLY the category values to the driver —
 * bounded by category cardinality, which for a one-hot encoding is small by
 * construction (an unbounded-cardinality one-hot is malformed regardless of
 * engine). `maxCategories` guards against misuse on high-cardinality columns.
 */
object OneHot {

  sealed trait Drop
  case object DropNone extends Drop
  case object DropFirst extends Drop
  case object DropLast extends Drop
  final case class DropNamed(value: String) extends Drop

  def sanitize(v: String): String = v.replaceAll("[^A-Za-z0-9_]", "_")

  /** Distinct categories of `column`, sorted, after applying `drop`. */
  def categories(df: DataFrame, column: String, drop: Drop = DropNone,
                 maxCategories: Int = 1000): Seq[String] = {
    val vals = df.select(col(column).cast("string")).na.drop()
      .distinct().limit(maxCategories + 1)
      .collect().map(_.getString(0)).sorted.toSeq
    require(vals.size <= maxCategories,
      s"one-hot on '$column': > $maxCategories distinct values — not a categorical column")
    drop match {
      case DropNone      => vals
      case DropFirst     => vals.drop(1)
      case DropLast      => vals.dropRight(1)
      case DropNamed(v)  => vals.filterNot(_ == v)
    }
  }

  /**
   * Append `<column>_<value>` 0/1 indicator columns for each surviving
   * category. Indicators are plain `when` expressions — codegen'd, map-only,
   * no shuffle beyond the one distinct scan at plan time. All indicators are
   * emitted in ONE `select`: a per-category `withColumn` fold would nest one
   * Project per category, making analysis time quadratic in cardinality
   * (1000 categories = a 1000-deep plan).
   */
  def encode(df: DataFrame, column: String, drop: Drop = DropNone,
             maxCategories: Int = 1000): DataFrame = {
    val cats = categories(df, column, drop, maxCategories)
    // sanitize can collide ("a-b" and "a_b" both -> "a_b"): colliding names
    // get a stable ordinal suffix so the frame never carries two columns of
    // one name (an ambiguous-reference trap for every later select)
    val names = {
      val raw = cats.map(v => s"${column}_${sanitize(v)}")
      val dup = raw.groupBy(identity).filter(_._2.size > 1).keySet
      raw.zipWithIndex.map { case (n, i) => if (dup(n)) s"${n}_$i" else n }
    }
    val indicators = cats.zip(names).map { case (v, n) =>
      when(col(column).cast("string") === v, 1).otherwise(0).as(n)
    }
    df.select(col("*") +: indicators: _*)
  }
}
