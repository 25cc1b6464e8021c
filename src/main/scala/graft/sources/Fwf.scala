package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/**
 * Fixed-width text source/sink — the Spark re-expression of the reference's
 * mmap'd FWF front door (cursor/src/main/java/cursors/context/
 * Ordering.kt:73-81 fixed-width RowMajor coords, context/Medium.kt:68-113
 * record-boundary mapping; fixture cursor/src/test/resources/caven4.fwf).
 *
 * Instead of an mmap cursor, the file is read line-wise by `spark.read.text`
 * (splittable, distributed) and each declared field becomes a substring
 * projection + cast — all codegen'd Column expressions, no UDF. Writing pads
 * with `rpad`/`lpad` so a round-trip is exact for fixed-point data.
 */
object Fwf {

  /** One fixed-width field: 1-based start, width, Spark type to cast to.
   * `leftAlign` controls write-side padding (strings left, numbers right). */
  final case class Field(name: String, start: Int, width: Int, dataType: DataType,
                         leftAlign: Boolean = false)

  /** Read a fixed-width text file into a DataFrame per the declared layout. */
  def read(spark: SparkSession, path: String, fields: Seq[Field]): DataFrame = {
    val cols = fields.map { f =>
      trim(substring(col("value"), f.start, f.width)).cast(f.dataType).as(f.name)
    }
    spark.read.text(path).select(cols: _*)
  }

  /** Write `df` as fixed-width text (columns in `fields` order). A value
   * WIDER than its declared field fails the job: Spark's lpad/rpad TRUNCATE
   * over-width strings, which would silently corrupt the data (keep a
   * most-significant-digit prefix of a number) instead of round-tripping. */
  def write(df: DataFrame, path: String, fields: Seq[Field]): Unit = {
    val line = concat(fields.map { f =>
      val s = col(f.name).cast("string")
      val guarded = when(length(s) > f.width,
        raise_error(concat(
          lit(s"fwf: value wider than field '${f.name}' (${f.width}): "), s)))
        .otherwise(s)
      if (f.leftAlign) rpad(guarded, f.width, " ") else lpad(guarded, f.width, " ")
    }: _*)
    df.select(line.as("value")).write.mode("overwrite").text(path)
  }
}
