package graft

import graft.keys.{Keys, SpaceFillingCurve => SFC}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurveSpec extends AnyFunSuite {

  test("zorder interleaves bits correctly (hand-computed goldens)") {
    // x=0b11, y=0b00 -> bits of x at even positions: 0b0101 = 5
    assert(SFC.zOrder(Array(3L, 0L), 2) === 5L)
    // x=0, y=0b11 -> odd positions: 0b1010 = 10
    assert(SFC.zOrder(Array(0L, 3L), 2) === 10L)
    assert(SFC.zOrder(Array(3L, 3L), 2) === 15L)
    // 3 dims, 1 bit each: (1,0,1) -> dim0 bit at pos0, dim2 at pos2 -> 0b101
    assert(SFC.zOrder(Array(1L, 0L, 1L), 1) === 5L)
  }

  test("zorder is a bijection on the 2-D 8-bit grid") {
    val seen = new java.util.HashSet[Long]()
    for (x <- 0 until 16; y <- 0 until 16)
      assert(seen.add(SFC.zOrder(Array(x.toLong, y.toLong), 4)))
    assert(seen.size === 256)
  }

  test("zorder is monotone on single-dimension sweeps") {
    // FIXTURES.md §2.6: monotonicity of interleave on single-dim sweeps
    for (bits <- Seq(4, 8); dim <- 0 until 3) {
      var prev = -1L
      for (v <- 0 until (1 << bits)) {
        val dims = Array(0L, 0L, 0L)
        dims(dim) = v.toLong
        val z = SFC.zOrder(dims, bits)
        assert(z > prev, s"not monotone at dim=$dim v=$v")
        prev = z
      }
    }
  }

  test("hilbert is a bijection covering 0..4^b-1 (2-D, b=1..5)") {
    for (b <- 1 to 5) {
      val n = 1 << b
      val seen = new java.util.HashSet[Long]()
      for (x <- 0 until n; y <- 0 until n) {
        val h = SFC.hilbert(Array(x.toLong, y.toLong), b)
        assert(h >= 0 && h < n.toLong * n, s"out of range: $h")
        assert(seen.add(h), s"collision at ($x,$y) b=$b")
      }
      assert(seen.size === n * n)
    }
  }

  test("hilbert consecutive indexes are manhattan-distance-1 neighbors (2-D)") {
    // the reference's gilbert invariant (GilbertKtTest.kt:17-30) — true
    // Hilbert is even tighter: distance exactly 1
    for (b <- 1 to 5) {
      val total = 1L << (2 * b)
      var prev = SFC.hilbertInverse(0L, 2, b)
      for (i <- 1L until total) {
        val cur = SFC.hilbertInverse(i, 2, b)
        val d = math.abs(cur(0) - prev(0)) + math.abs(cur(1) - prev(1))
        assert(d === 1L, s"b=$b i=$i jump=$d")
        prev = cur
      }
    }
  }

  test("hilbert 3-D round-trip: coords -> index -> coords (seeded sample)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt(256).toLong
      val y = rnd.nextInt(256).toLong
      val z = rnd.nextInt(256).toLong
      val idx = SFC.hilbert(Array(x, y, z), 8)
      val back = SFC.hilbertInverse(idx, 3, 8)
      assert(back.toSeq === Seq(x, y, z))
    }
  }

  test("hilbert consecutive indexes are distance-1 in 3-D too") {
    val b = 3
    val total = 1L << (3 * b)
    var prev = SFC.hilbertInverse(0L, 3, b)
    for (i <- 1L until total) {
      val cur = SFC.hilbertInverse(i, 3, b)
      val d = (0 until 3).map(k => math.abs(cur(k) - prev(k))).sum
      assert(d === 1L, s"i=$i jump=$d")
      prev = cur
    }
  }

  test("clamping: negatives -> 0, overflow -> max") {
    assert(SFC.clampToBits(-5L, 8) === 0L)
    assert(SFC.clampToBits(300L, 8) === 255L)
    assert(SFC.zOrderClamped(Array(-1L, 999999L), 8) ===
      SFC.zOrder(Array(0L, 255L), 8))
  }

  test("Catalyst expressions agree with the pure cores and survive codegen") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.range(0, 1000).select(
      (col("id") % 256).as("a"),
      ((col("id") * 7) % 256).as("b"))
    val got = df.select(
      col("a"), col("b"),
      graft.keys.Keys.zorderKey(8, Seq.empty, Seq(col("a"), col("b"))).as("z"),
      graft.keys.Keys.hilbertKey(8, Seq.empty, Seq(col("a"), col("b"))).as("h"))
      .collect()
    got.foreach { r =>
      val dims = Array(r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === SFC.zOrder(dims.clone(), 8))
      assert(r.getLong(3) === SFC.hilbert(dims.clone(), 8))
    }
  }

  test("SQL registration works: zorder_key / hilbert_key callable from SQL") {
    val spark = TestSpark.spark
    Keys.registerSql(spark)
    val r = spark.sql(
      "SELECT zorder_key(3L, 0L) AS z, hilbert_key(1L, 1L) AS h").collect()(0)
    // 2 dims -> 31 bits/dim in SQL form; low bits interleave the same
    assert(r.getLong(0) === SFC.zOrder(Array(3L, 0L), 31))
    assert(r.getLong(1) === SFC.hilbert(Array(1L, 1L), 31))
  }

  test("clip key spreads the dur_ms=100 hot key across the range") {
    // 20% of rows share dur_ms=100 (FIXTURES skew injection); interleaved
    // clip_id hash bits must spread them over many distinct key values
    val spark = TestSpark.spark
    import spark.implicits._
    val hot = (0 until 1000).map(i => (f"clip_$i%012d", 16000, 100)).toDF(
      "clip_id", "sr_hz", "dur_ms")
    val distinctKeys = hot.select(
      Keys.clipZOrderKey(col("clip_id"), col("sr_hz"), col("dur_ms")).as("k"))
      .distinct().count()
    assert(distinctKeys > 900, s"hot key not spread: $distinctKeys")
  }

  test("gilbert covers ARBITRARY rectangles: bijective, adjacent, descent == generative") {
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 2), (2, 3), (5, 3), (3, 5), (7, 7),
      (16, 12), (1, 9), (13, 1), (127, 33), (200, 150))) {
      val m = graft.keys.SpaceFillingCurve.gilbertMap(w, h)
      assert(m.size === w * h, s"${w}x$h not covering")
      val ds = m.values.toSeq.sorted
      assert(ds === (0L until w.toLong * h).toSeq, s"${w}x$h not bijective")
      val inv = m.map(_.swap)
      (1L until w.toLong * h).foreach { d =>
        val (x0, y0) = inv(d - 1); val (x1, y1) = inv(d)
        assert(math.abs(x0 - x1) + math.abs(y0 - y1) === 1,
          s"${w}x$h step $d not adjacent")
      }
      // per-point descent must agree with the generative enumeration
      m.foreach { case ((x, y), d) =>
        assert(graft.keys.SpaceFillingCurve.gilbertXY2D(w, h, x, y) === d,
          s"${w}x$h descent($x,$y)")
      }
    }
  }
}
