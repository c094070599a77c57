package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {

  private def ptsOf(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("x", "y")
  }

  /** O(n²) reference dominance filter over distinct points. */
  private def naive(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet
  }

  test("skyline2D: hand case with ties and duplicates") {
    //   (5,1) and (1,5) are frontier corners, (3,3) a frontier middle,
    //   (3,1)/(2,2) dominated, (5,1) duplicated -> cnt 2
    val got = Skyline.skyline2D(
        ptsOf((5L, 1L), (5L, 1L), (1L, 5L), (3L, 3L), (3L, 1L), (2L, 2L)),
        "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 1L, 2L), (1L, 5L, 1L), (3L, 3L, 1L)))
  }

  test("skyline2D matches the naive dominance filter on random data, any bucket count") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val want = naive(pts)
    Seq(1, 7, 64).foreach { b =>
      val got = Skyline.skyline2D(ptsOf(pts: _*), "x", "y", buckets = b)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"buckets=$b")
    }
  }

  test("skyline2D: null-dimension rows are excluded explicitly, frontier unchanged") {
    val s = spark
    import s.implicits._
    val pts = Seq[(Option[Long], Option[Long])](
      (Some(5L), Some(1L)), (Some(1L), Some(5L)), (Some(2L), Some(1L)),
      (None, Some(9L)), (Some(9L), None), (None, None))
      .toDF("x", "y")
    val got = Skyline.skyline2D(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 1L, 1L), (1L, 5L, 1L)))
  }

  test("skyline2D: a totally-ordered chain keeps only its maximum") {
    val got = Skyline.skyline2D(
        ptsOf((1L, 1L), (2L, 2L), (3L, 3L)), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 3L)))
  }
}
