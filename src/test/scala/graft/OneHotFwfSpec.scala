package graft

import java.nio.file.Files

import graft.functions.OneHot
import graft.sources.Fwf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

class OneHotFwfSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fruits = Seq(
    (1, "apple"), (2, "banana"), (3, "cherry"), (4, "banana"), (5, "apple"))
    .toDF("id", "fruit")

  test("one-hot distinct-scans categories and emits sorted indicators") {
    val enc = OneHot.encode(fruits, "fruit")
    assert(enc.columns.toSeq ===
      Seq("id", "fruit", "fruit_apple", "fruit_banana", "fruit_cherry"))
    val r = enc.orderBy("id").collect()
    assert(r.map(_.getInt(2)).toSeq === Seq(1, 0, 0, 0, 1)) // apple
    assert(r.map(_.getInt(3)).toSeq === Seq(0, 1, 0, 1, 0)) // banana
    assert(r.map(_.getInt(4)).toSeq === Seq(0, 0, 1, 0, 0)) // cherry
  }

  test("DummySpec drop rules: first, last, named") {
    assert(OneHot.encode(fruits, "fruit", OneHot.DropFirst).columns
      .count(_.startsWith("fruit_")) === 2)
    assert(OneHot.encode(fruits, "fruit", OneHot.DropLast).columns.toSeq
      .filter(_.startsWith("fruit_")) === Seq("fruit_apple", "fruit_banana"))
    assert(OneHot.encode(fruits, "fruit", OneHot.DropNamed("banana")).columns
      .toSeq.filter(_.startsWith("fruit_")) ===
      Seq("fruit_apple", "fruit_cherry"))
  }

  test("one-hot adapts to NEW categories without code changes") {
    val more = fruits.union(Seq((6, "durian")).toDF("id", "fruit"))
    val enc = OneHot.encode(more, "fruit")
    assert(enc.columns.contains("fruit_durian"))
    assert(enc.filter(col("fruit_durian") === 1).count() === 1)
  }

  test("one-hot refuses unbounded-cardinality columns") {
    val wide = spark.range(0, 50).select(col("id"),
      concat(lit("v"), col("id")).as("c"))
    intercept[IllegalArgumentException] {
      OneHot.encode(wide, "c", maxCategories = 10)
    }
  }

  test("FWF golden fixture: caven4-shaped fixed-width layout parses exactly") {
    // reference-shaped fixture (cursor/src/test/resources/caven4.fwf is a
    // fixed-width table of numeric + string fields); layout declared as
    // (coords, types, names) like the reference's Ordering coords
    val dir = Files.createTempDirectory("graft-fwf-golden-").toString
    val lines = Seq(
      "   123 7 AB   2.5",
      "  4567 9 CD  13.0",
      "     8 0 EF   0.1")
    Files.write(java.nio.file.Paths.get(dir, "caven4-shaped.fwf"),
      lines.mkString("\n").getBytes)
    val fields = Seq(
      Fwf.Field("k", 1, 6, LongType),
      Fwf.Field("small", 7, 2, IntegerType),
      Fwf.Field("tag", 9, 3, StringType, leftAlign = true),
      Fwf.Field("x", 12, 6, org.apache.spark.sql.types.DoubleType))
    val df = Fwf.read(spark, dir, fields).orderBy("k")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(8L, 123L, 4567L))
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 7, 9))
    assert(rows.map(_.getString(2)).toSeq === Seq("EF", "AB", "CD"))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.1, 2.5, 13.0))
  }

  test("CSV zero-elision round-trip (reference WriteCSV behavior)") {
    val dir = Files.createTempDirectory("graft-csv-ze-").toString
    val src = Seq((1L, 0, "a"), (2L, 5, "b"), (0L, 7, "c"))
      .toDF("k", "v", "tag")
    graft.sources.Csv.writeZeroElided(src, dir)
    // zeros really are elided in the raw text
    val raw = spark.read.text(dir).collect().map(_.getString(0)).toSet
    assert(raw.contains("1,,a") && raw.contains(",7,c"), raw.toString)
    val back = graft.sources.Csv.readZeroElided(spark, dir, src.schema)
    assert(back.orderBy("tag").collect().toSeq ===
      src.orderBy("tag").collect().toSeq)
  }

  test("FWF write -> read round-trip is exact") {
    val dir = Files.createTempDirectory("graft-fwf-rt-").toString
    val fields = Seq(
      Fwf.Field("id", 1, 8, LongType),
      Fwf.Field("name", 9, 10, StringType, leftAlign = true),
      Fwf.Field("qty", 19, 5, IntegerType))
    val src = Seq((1L, "alpha", 10), (22L, "beta", 0), (333L, "gamma_x", 99999))
      .toDF("id", "name", "qty")
    Fwf.write(src, dir, fields)
    val back = Fwf.read(spark, dir, fields)
    assert(back.orderBy("id").collect().toSeq ===
      src.orderBy("id").collect().toSeq)
  }

  test("FWF write fails loudly on over-width values instead of truncating") {
    val dir = Files.createTempDirectory("graft-fwf-wide-").toString
    val fields = Seq(Fwf.Field("amount", 1, 5, LongType))
    val e = intercept[Exception] {
      Fwf.write(Seq(123456L).toDF("amount"), dir, fields)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("wider than field")),
      s"want the width error, got $e")
  }

  test("CSV zero-elision refuses null numerics (would round-trip as 0)") {
    val dir = Files.createTempDirectory("graft-csv-null-").toString
    val src = Seq((Some(1L), "a"), (None, "b")).toDF("v", "tag")
    val e = intercept[Exception] {
      graft.sources.Csv.writeZeroElided(src, dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("zero-elision")),
      s"want the null-numeric error, got $e")
  }

  test("one-hot disambiguates sanitize-colliding categories") {
    val df = Seq("a-b", "a_b", "c").toDF("k")
    val enc = graft.functions.OneHot.encode(df, "k")
    val names = enc.columns.filter(_.startsWith("k_"))
    assert(names.distinct.length == names.length, s"duplicate columns: ${names.toSeq}")
    assert(names.length == 3)
    // each row still gets exactly one hot indicator
    import org.apache.spark.sql.functions._
    val hot = enc.select(names.map(col).reduce(_ + _).as("s"))
      .agg(min("s"), max("s")).head()
    assert(hot.getInt(0) == 1 && hot.getInt(1) == 1)
  }
}
