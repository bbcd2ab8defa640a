package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private def wide = Seq(
    ("#T", "BC", 10.0, 11.0, 12.0),
    ("#1", "BC", 1.0, 2.0, 3.0),
    ("#1", "North", 4.0, 5.0, 6.0)
  ).toDF("noc", "geo", "2024", "2025", "2026")

  test("unpivotByPrefix melts only the year columns") {
    val long = Reshape.unpivotByPrefix(wide, "2")
    assert(long.columns.toSeq === Seq("noc", "geo", "year", "value"))
    assert(long.count() === 9)
    val r = long.filter($"noc" === "#1" && $"geo" === "BC" && $"year" === "2025")
      .select("value").as[Double].head()
    assert(r === 2.0)
  }

  test("pivotExplicit(unpivot(df)) is the identity (with pinned column order)") {
    val long = Reshape.unpivotByPrefix(wide, "2")
    val back = Reshape.pivotExplicit(long, Seq("noc", "geo"), "year",
      Seq("2024", "2025", "2026"))
    assert(back.columns.toSeq === Seq("noc", "geo", "2024", "2025", "2026"))
    val orig = wide.orderBy("noc", "geo").collect().map(_.toSeq)
    val got = back.orderBy("noc", "geo").collect().map(_.toSeq)
    assert(got.toSeq === orig.toSeq)
  }

  test("pivot column order follows the explicit list, not sort order") {
    val long = Reshape.unpivotByPrefix(wide, "2")
    val back = Reshape.pivotExplicit(long, Seq("noc", "geo"), "year",
      Seq("2026", "2024", "2025"))
    assert(back.columns.toSeq === Seq("noc", "geo", "2026", "2024", "2025"))
  }

  test("separate splits at the FIRST separator only (:336 semantics)") {
    val df = Seq("10011: Senior managers: finance", "20012: Plain").toDF("NOC")
    val out = Reshape.separate(df, "NOC", ("code", "desc"), ": ")
      .select("code", "desc").as[(String, String)].collect().toMap
    assert(out("10011") === "Senior managers: finance")
    assert(out("20012") === "Plain")
  }

  test("separate works when the first target name REUSES the source name (:336)") {
    // regression: chained withColumn clobbered NOC before the second
    // extraction, nulling every Description
    val df = Seq(("10011: Senior managers", "c1")).toDF("NOC", "cluster")
    val out = Reshape.separate(df, "NOC", ("NOC", "Description"), ": ")
    assert(out.columns.toSeq === Seq("NOC", "Description", "cluster"))
    val r = out.head()
    assert(r.getString(0) === "10011" && r.getString(1) === "Senior managers")
  }

  test("separate without the separator yields null second part (tidyr NA)") {
    val df = Seq("no-sep-here").toDF("NOC")
    val r = Reshape.separate(df, "NOC", ("NOC", "Description"), ": ").head()
    assert(r.getString(0) === "no-sep-here" && r.isNullAt(1))
  }

  test("splitByKey returns sorted keys, each slice filtered") {
    val parts = Reshape.splitByKey(wide, "geo")
    assert(parts.map(_._1) === Seq("BC", "North"))
    assert(parts.toMap.apply("North").count() === 1)
  }

  test("splitByKey drops null keys instead of NPEing") {
    val df = Seq((Some("BC"), 1.0), (None, 2.0)).toDF("geo", "v")
    val parts = Reshape.splitByKey(df, "geo")
    assert(parts.map(_._1) === Seq("BC"))
  }

  test("relocateAfter / relocateToEnd compute the reference column orders") {
    val df = Seq((1, 2, 3, 4)).toDF("a", "b", "c", "d")
    assert(Reshape.relocateAfter(df, Seq("d"), "a").columns.toSeq
      === Seq("a", "d", "b", "c"))
    assert(Reshape.relocateToEnd(df, Seq("b")).columns.toSeq
      === Seq("a", "c", "d", "b"))
  }
}
