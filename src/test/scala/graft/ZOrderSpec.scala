package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder2
import graft.functions.ZOrder2.zorder2

class ZOrderSpec extends SparkSpec {

  test("interleave: bit i of x at 2i, bit i of y at 2i+1; known vectors") {
    assert(ZOrder2.interleave(0L, 0L) == 0L)
    assert(ZOrder2.interleave(1L, 0L) == 1L)
    assert(ZOrder2.interleave(0L, 1L) == 2L)
    assert(ZOrder2.interleave(1L, 1L) == 3L)
    assert(ZOrder2.interleave(0x7FFFFFFFL, 0L) == 0x1555555555555555L)
    assert(ZOrder2.interleave(0L, 0x7FFFFFFFL) == 0x2AAAAAAAAAAAAAAAL)
    assert(ZOrder2.interleave(0x7FFFFFFFL, 0x7FFFFFFFL) == 0x3FFFFFFFFFFFFFFFL)
    // bit-by-bit against a reference loop on random-ish values
    for (x <- Seq(5L, 123456789L, 0x12345678L); y <- Seq(9L, 987654321L)) {
      var expect = 0L
      for (i <- 0 until 31) {
        expect |= ((x >> i) & 1L) << (2 * i)
        expect |= ((y >> i) & 1L) << (2 * i + 1)
      }
      assert(ZOrder2.interleave(x, y) == expect, s"($x, $y)")
    }
  }

  test("out-of-range dimensions throw instead of wrapping") {
    intercept[IllegalArgumentException] { ZOrder2.interleave(-1L, 0L) }
    intercept[IllegalArgumentException] { ZOrder2.interleave(0L, 1L << 31) }
  }

  test("column + SQL surfaces agree with the static function") {
    val s = spark
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val df = Seq((3L, 5L), (100L, 200L)).toDF("x", "y")
    val viaCol = df.select(zorder2(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(viaCol.toSeq == Seq(ZOrder2.interleave(3L, 5L), ZOrder2.interleave(100L, 200L)))
    df.createOrReplaceTempView("zin")
    val viaSql = s.sql("SELECT zorder2(x, y) FROM zin").collect().map(_.getLong(0))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("locality: z-cell bounding boxes are tighter than hash-bucket boxes") {
    val s = spark
    import s.implicits._
    // a 64×64 grid of points, one per cell
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    // 16 z-cells (top 4 bits of the 12-bit z-value) vs 16 hash buckets
    def boxArea(cellCol: org.apache.spark.sql.Column): Double = {
      val boxes = pts.withColumn("cell", cellCol)
        .groupBy("cell")
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
        .collect()
      boxes.map(r => (r.getLong(1) + 1.0) * (r.getLong(2) + 1.0)).sum / boxes.length
    }
    val zArea = boxArea(shiftright(zorder2(col("x"), col("y")), 8))
    val hashArea = boxArea(pmod(hash(col("x"), col("y")), lit(16)).cast("long"))
    // each z-cell is a 16×16 quadrant (area 256); hash buckets span the
    // whole grid (area ≈ 64×64) — the min/max-pruning win in one number
    assert(zArea <= 300.0, s"z-cell area $zArea")
    assert(hashArea >= 2000.0, s"hash-bucket area $hashArea")
  }
}
