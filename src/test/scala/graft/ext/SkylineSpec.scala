package graft.ext

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def fr(pts: Seq[(Long, Long, String)]) =
    Skyline.frontier(pts.toDF("x", "y", "tag"), "x", "y")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet

  test("frontier: hand-computed 2-D skyline") {
    val pts = Seq((1L, 5L, "a"), (3L, 3L, "b"), (5L, 1L, "c"),
      (2L, 2L, "d"), (4L, 4L, "e"))
    // (3,3) and (2,2) are dominated by (4,4)
    assert(fr(pts) === Set((1L, 5L), (4L, 4L), (5L, 1L)))
  }

  test("frontier: equal-x points — higher y wins, lower y is dominated") {
    assert(fr(Seq((5L, 1L, "a"), (5L, 3L, "b"), (1L, 9L, "c")))
      === Set((5L, 3L), (1L, 9L)))
  }

  test("frontier: duplicate points are both returned (neither dominates)") {
    val out = Skyline.frontier(
      Seq((4L, 4L, "a"), (4L, 4L, "b"), (1L, 1L, "z")).toDF("x", "y", "tag"),
      "x", "y").collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("tag")).toSet === Set("a", "b"))
  }

  test("frontier: single point and monotone chain degenerate correctly") {
    assert(fr(Seq((7L, 7L, "a"))) === Set((7L, 7L)))
    // strictly increasing chain: only the max survives
    assert(fr(Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c")))
      === Set((3L, 3L)))
    // anti-chain: everything survives
    assert(fr(Seq((1L, 3L, "a"), (2L, 2L, "b"), (3L, 1L, "c")))
      === Set((1L, 3L), (2L, 2L), (3L, 1L)))
  }

  test("frontier: no member is dominated; every non-member is (random check)") {
    val pts = (0 until 200).map(i =>
      (((i * 37) % 101).toLong, ((i * 53) % 97).toLong, s"p$i"))
    val sky = fr(pts)
    val all = pts.map(p => (p._1, p._2)).toSet
    def dominated(p: (Long, Long)) = all.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))
    sky.foreach(p => assert(!dominated(p), s"frontier member $p is dominated"))
    all.diff(sky).foreach(p => assert(dominated(p), s"non-member $p undominated"))
  }
}
