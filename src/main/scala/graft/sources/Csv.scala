package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StructType}

/**
 * CSV sink/source helpers beyond plain `df.write.csv`, covering the
 * reference's zero-elision write behavior (io/WriteCSV.kt:17-67: numeric
 * zero cells are written as empty fields to shrink sparse output).
 */
object Csv {

  /** Write CSV with numeric zeros elided to empty fields (header kept).
   * Numeric NULLs are REJECTED: an elided zero and a null would both land
   * as the empty field, so [[readZeroElided]]'s fill would resurrect the
   * null AS a zero — silent data change on round-trip. (The reference's
   * WriteCSV elides zero cells only; its cursors have no null numerics.) */
  def writeZeroElided(df: DataFrame, path: String): Unit = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType =>
          when(col(f.name).isNull,
            raise_error(lit(s"csv zero-elision: null in numeric column " +
              s"'${f.name}' would round-trip as 0 — fill or drop first")))
            .when(col(f.name) === 0, lit(""))
            .otherwise(col(f.name).cast("string")).as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
      .write.mode("overwrite").option("header", "true")
      .option("emptyValue", "") // write true empty fields, not quoted ""
      .csv(path)
  }

  /** Read a zero-elided CSV back: empty numeric fields -> 0. */
  def readZeroElided(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read.option("header", "true").schema(schema).csv(path)
    val numeric = schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }
    raw.na.fill(0, numeric.toIndexedSeq)
  }
}
