package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def points = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 10:59:59")),  // inclusive upper bound
    (3L, "u1", ts("2024-01-01 12:30:00")),  // in no interval
    (4L, "u2", ts("2024-01-01 10:30:00"))   // right user, right time, other key
  ).toDF("id", "user", "t")

  private def intervals = Seq(
    ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:59:59"), "w1"),
    ("u1", ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00"), "w2"), // overlaps w1
    ("u3", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "w3")  // unused key
  ).toDF("user", "s", "e", "tag")

  private def matches(binWidth: Long) =
    RangeJoin.binned(points, intervals, Seq("user"), "t", "s", "e", binWidth)
      .select("id", "tag").as[(Long, String)].collect().toSet

  test("one-to-many semantics: all containing intervals, bounds inclusive") {
    val got = matches(3600L)
    assert(got === Set((1L, "w1"), (2L, "w1"), (2L, "w2")))
  }

  test("bin width cannot change the result (only the plan)") {
    val w1 = matches(3600L)
    // tiny bins: intervals explode to many rows; huge bins: everything
    // lands in one bin — results identical either way
    assert(matches(60L) === w1)
    assert(matches(86400L) === w1)
    assert(matches(7L) === w1) // non-divisor width
  }

  test("agrees with the naive BETWEEN join on random-ish data") {
    val ps = (0 until 200).map(i =>
      (i.toLong, s"u${i % 5}", ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00")))
      .toDF("id", "user", "t")
    val is = (0 until 50).map(i =>
      (s"u${i % 5}", ts(f"2024-01-01 ${(i * 3) % 24}%02d:00:00"),
        ts(f"2024-01-01 ${(i * 3) % 24}%02d:45:00"), s"w$i"))
      .toDF("user", "s", "e", "tag")
    val binned = RangeJoin.binned(ps, is, Seq("user"), "t", "s", "e", 1800L)
      .select("id", "tag").as[(Long, String)].collect().toSet
    val naive = ps.join(is, Seq("user"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("id", "tag").as[(Long, String)].collect().toSet
    assert(binned === naive)
    assert(naive.nonEmpty, "test data produced no matches — not a real check")
  }

  test("null and inverted bounds never match; null ts drops") {
    val ps = Seq((1L, "u1", ts("2024-01-01 10:30:00")),
      (2L, "u1", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "user", "t")
    val is = Seq(
      ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "ok"),
      ("u1", null.asInstanceOf[java.sql.Timestamp], ts("2024-01-01 11:00:00"), "null-start"),
      ("u1", ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00"), "inverted"))
      .toDF("user", "s", "e", "tag")
    val got = RangeJoin.binned(ps, is, Seq("user"), "t", "s", "e", 3600L)
      .select("id", "tag").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "ok")))
  }

  test("colliding column names are rejected up front") {
    intercept[IllegalArgumentException] {
      RangeJoin.binned(points, intervals.withColumnRenamed("tag", "t"),
        Seq("user"), "t", "s", "e")
    }
  }
}
