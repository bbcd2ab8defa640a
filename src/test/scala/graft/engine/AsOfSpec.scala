package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 100L, "p1"),
    (2L, "u1", 205L, "p2"),
    (3L, "u1", 300L, "p3"),
    (4L, "u2", 50L, "p4")   // u2 has no prior right row
  ).toDF("id", "user", "t", "tag")

  private def right = Seq(
    ("u1", 100L, "r@100"),  // equal ts → visible (<= semantics)
    ("u1", 200L, "r@200"),
    ("u3", 10L, "r-unused")
  ).toDF("user", "t", "rval")

  test("backward as-of join picks the latest right row at-or-before") {
    val out = AsOf.asofBackward(left, right, Seq("user"), "t", "t", Seq("rval"))
      .select("id", "rval", "t_matched").collect()
      .map(r => r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(out(1L) === ("r@100", 100L)) // equal ts matches
    assert(out(2L) === ("r@200", 200L)) // latest preceding
    assert(out(3L) === ("r@200", 200L)) // carried forward
    assert(out(4L) === (null, -1L))     // left join: no match → nulls
  }

  test("tolerance nulls out matches that are too old") {
    val out = AsOf.asofBackward(left, right, Seq("user"), "t", "t",
      Seq("rval"), tolerance = Some(lit(50L)))
      .select("id", "rval").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "r@100")  // age 0 ≤ 50
    assert(out(2L) === "r@200")  // age 5 ≤ 50
    assert(out(3L) === null)     // age 100 > 50 → nulled
  }

  test("row count is exactly the left side's (left-join semantics)") {
    val out = AsOf.asofBackward(left, right, Seq("user"), "t", "t", Seq("rval"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("id", "user", "t", "tag", "rval", "t_matched"))
  }

  test("null keys never match (right nulls dropped, left nulls preserved)") {
    val l = Seq((1L, Some("u1"), 100L), (2L, None, 100L))
      .toDF("id", "user", "t")
    val r = Seq((Some("u1"), 50L, "r1"), (None, 40L, "r-null"))
      .toDF("user", "t", "rval")
    val out = AsOf.asofBackward(l, r, Seq("user"), "t", "t", Seq("rval"))
      .select("id", "rval").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1)))
      .toMap
    assert(out(1L) === "r1")
    assert(out(2L) === null) // null-key left row preserved, unmatched
    assert(out.size === 2)
  }

  test("null right timestamps never match (and never leak payload)") {
    // a null rightTs sorts FIRST in the sweep's nulls-first window
    // order — without the explicit filter its payload would be
    // carried into every early left row with ts_matched null
    val r = Seq(
      (Some("u1"), Option.empty[Long], "r-nullts"),
      (Some("u1"), Some(200L), "r@200"))
      .toDF("user", "t", "rval")
    val out = AsOf.asofBackward(left, r, Seq("user"), "t", "t", Seq("rval"))
      .select("id", "rval", "t_matched").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) null else x.getString(1),
         if (x.isNullAt(2)) -1L else x.getLong(2)))
      .toMap
    assert(out(1L) === (null, -1L))     // t=100: only the null-ts row precedes → no match
    assert(out(2L) === ("r@200", 200L))
    assert(out(3L) === ("r@200", 200L))
    // agreement with the native operator on the same input (long keys
    // — the native fast path's contract)
    val keyed = udf((u: String) => u.drop(1).toLong)
    val lLong = left.withColumn("user", keyed(col("user")))
    val rLong = r.withColumn("user", keyed(col("user")))
    val native = graft.plans.AsOfJoinNative.asofBackward(lLong, rLong,
      on = "user", leftTs = "t", rightTs = "t", rightPayload = Seq("rval"))
      .select("id", "rval").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1)))
      .toMap
    assert(native(1L) === null && native(2L) === "r@200")
  }

  test("colliding payload names are rejected up front") {
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, right.withColumnRenamed("rval", "tag"),
        Seq("user"), "t", "t", Seq("tag"))
    }
  }

  private def nearest(l: org.apache.spark.sql.DataFrame,
                      r: org.apache.spark.sql.DataFrame) =
    AsOf.asofNearest(l, r, Seq("user"), "t", "t", Seq("rval"))
      .select("id", "rval", "t_matched", "direction").collect()
      .map(x => x.getLong(0) -> ((if (x.isNullAt(1)) null else x.getString(1)),
        if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) null else x.getString(3))).toMap

  test("asofNearest: picks the closer side; equal distance → backward") {
    val l = Seq((1L, "u1", 100L, "x"), (2L, "u1", 190L, "x"),
      (3L, "u1", 240L, "x")).toDF("id", "user", "t", "tag")
    val r = Seq(("u1", 80L, "r@80"), ("u1", 200L, "r@200"),
      ("u1", 280L, "r@280")).toDF("user", "t", "rval")
    val out = nearest(l, r)
    assert(out(1L) === (("r@80", 80L, "backward")))   // 20 back vs 100 fwd
    assert(out(2L) === (("r@200", 200L, "forward")))  // 110 back vs 10 fwd
    assert(out(3L) === (("r@200", 200L, "backward"))) // 40 back == 40 fwd → back
  }

  test("asofNearest: one-sided timelines and misses") {
    val l = Seq((1L, "u1", 50L, "x"), (2L, "u2", 50L, "x"),
      (3L, "u3", 50L, "x")).toDF("id", "user", "t", "tag")
    val r = Seq(("u1", 90L, "r@90"),   // only a forward match
      ("u2", 10L, "r@10")              // only a backward match
    ).toDF("user", "t", "rval")
    val out = nearest(l, r)
    assert(out(1L) === (("r@90", 90L, "forward")))
    assert(out(2L) === (("r@10", 10L, "backward")))
    assert(out(3L) === ((null, -1L, null)))           // no match at all
  }

  test("asofNearest: coincident right row resolves backward") {
    val l = Seq((1L, "u1", 100L, "x")).toDF("id", "user", "t", "tag")
    val r = Seq(("u1", 100L, "r@100")).toDF("user", "t", "rval")
    assert(nearest(l, r)(1L) === (("r@100", 100L, "backward")))
  }
}
