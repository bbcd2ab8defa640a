package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"),
        if (r.isNullAt(r.fieldIndex("valid_to"))) None
        else Some(r.getAs[Long]("valid_to")))
    }.toSet

  test("scd2: closed, opened, changed-pair, carried — all four shapes") {
    val o = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val n = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val out = rows(Scd.scd2(o, n, Seq("k"), Seq("v"), fromV = 1, toV = 2))
    assert(out === Set(
      (1L, "a", 1L, Some(2L)),  // deleted → closed
      (2L, "b", 1L, None),      // unchanged → carried, still current
      (3L, "c", 1L, Some(2L)),  // changed → old closed...
      (3L, "C", 2L, None),      // ...new opened
      (4L, "d", 2L, None)       // inserted → opened
    ))
  }

  test("pitLookup: stamp routes to the right version, closed members " +
    "null out, current rows match open-ended") {
    val o = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val n = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val dim = Scd.scd2(o, n, Seq("k"), Seq("v"), fromV = 1, toV = 2)
    val facts = Seq(
      (10L, 1L, 1L), (11L, 1L, 2L),  // k=1 closed at 2: v then NULL
      (12L, 3L, 1L), (13L, 3L, 2L),  // k=3 changed: "c" then "C"
      (14L, 4L, 1L), (15L, 4L, 2L),  // k=4 opened at 2: NULL then "d"
      (16L, 9L, 1L)                  // unknown key: NULL
    ).toDF("fid", "k", "asof_v")
    val out = Scd.pitLookup(facts, dim, Seq("k"), "asof_v").collect()
      .map(r => r.getAs[Long]("fid") ->
        (Option(r.getAs[String]("v")),
          if (r.isNullAt(r.fieldIndex("valid_from"))) None
          else Some(r.getAs[Long]("valid_from")))).toMap
    assert(out(10L) === ((Some("a"), Some(1L))))
    assert(out(11L) === ((None, None)))        // closed before the stamp
    assert(out(12L) === ((Some("c"), Some(1L))))
    assert(out(13L) === ((Some("C"), Some(2L))))
    assert(out(14L) === ((None, None)))        // not yet opened
    assert(out(15L) === ((Some("d"), Some(2L))))
    assert(out(16L) === ((None, None)))
    // exactly one row per fact — disjoint intervals can't fan out
    assert(out.size === 7)
  }

  test("pitLookup: fact/dim value-column name clash fails fast instead " +
    "of emitting duplicate output columns") {
    val o = Seq((1L, "a")).toDF("k", "v")
    val dim = Scd.scd2(o, o, Seq("k"), Seq("v"), fromV = 1, toV = 2)
    // fact already carries `v` — the lookup would duplicate it
    val facts = Seq((10L, 1L, 1L, "fact-v")).toDF("fid", "k", "asof_v", "v")
    val ex = intercept[IllegalArgumentException] {
      Scd.pitLookup(facts, dim, Seq("k"), "asof_v")
    }
    assert(ex.getMessage.contains("clash"))
    // same guard for the validity-from column leaking into facts
    val facts2 = Seq((10L, 1L, 1L, 9L)).toDF("fid", "k", "asof_v", "valid_from")
    assert(intercept[IllegalArgumentException] {
      Scd.pitLookup(facts2, dim, Seq("k"), "asof_v")
    }.getMessage.contains("valid_from"))
  }

  test("scd2: null values compare null-safely (null → null is carried)") {
    val o = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("k", "v")
    val n = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val out = rows(Scd.scd2(o, n, Seq("k"), Seq("v"), 1, 2))
    assert(out.contains((1L, null, 1L, None)))      // null == null: carried
    assert(out.contains((2L, "x", 1L, Some(2L))))   // x → null: changed
    assert(out.contains((2L, null, 2L, None)))
  }

  test("mergeUpsert: update replaces, delete drops, insert appends") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (9L, "z", "I"))
      .toDF("k", "v", "op")
    val out = Scd.mergeUpsert(target, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "B", 9L -> "z"))
  }

  test("mergeUpsert: insert on an existing key upserts; unknown op fails loudly") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val out = Scd.mergeUpsert(target,
        Seq((1L, "A2", "I")).toDF("k", "v", "op"), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "A2"))
    val e = intercept[Exception] {
      Scd.mergeUpsert(target,
        Seq((1L, "x", "Q")).toDF("k", "v", "op"), Seq("k")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mergeUpsert")))
  }

  test("mergeUpsert: two non-D rows for one key are rejected loudly") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[Exception] {
      Scd.mergeUpsert(target,
        Seq((1L, "x", "I"), (1L, "y", "U")).toDF("k", "v", "op"),
        Seq("k")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("multiple non-D rows")))
    // a D plus one non-D for the same key is a legal replace
    val ok = Scd.mergeUpsert(target,
        Seq((1L, "x", "D"), (1L, "y", "U")).toDF("k", "v", "op"), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ok === Map(1L -> "y"))
  }

  test("scd2: null-keyed rows are dropped, not phantom-closed") {
    val oldSnap = Seq((Option(1L), "a"), (Option.empty[Long], "junk"))
      .toDF("k", "v")
    val newSnap = Seq((Option(1L), "a"), (Option.empty[Long], "junk2"))
      .toDF("k", "v")
    val out = Scd.scd2(oldSnap, newSnap, Seq("k"), Seq("v"), 1, 2).collect()
    // only the carried real row survives; no phantom closed/opened
    // pair from the null-keyed rows
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getString(1) === "a")
    assert(out.head.isNullAt(out.head.fieldIndex("valid_to")))
  }
}
