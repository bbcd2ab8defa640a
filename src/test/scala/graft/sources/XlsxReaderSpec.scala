package graft.sources

import graft.SparkSpec
import graft.sinks.Xlsx
import java.nio.file.Files

class XlsxReaderSpec extends SparkSpec {
  import spark.implicits._

  private def tmpXlsx(name: String): java.io.File =
    Files.createTempDirectory("xlsxr").resolve(name).toFile

  test("round-trips the sink's own output: values, types, sheet names") {
    val df = Seq(
      ("a & <b>", 1.5, 10L, true),
      ("plain", -2.25, -3L, false))
      .toDF("name", "dbl", "lng", "flag")
    val f = tmpXlsx("rt.xlsx")
    Xlsx.write(Seq(Xlsx.Sheet("data", df), Xlsx.Sheet("other", df.limit(1))), f)

    assert(XlsxReader.sheetNames(f.getPath) === Seq("data", "other"))
    val back = XlsxReader.readXlsx(spark, f.getPath, sheet = Some("data"))
    assert(back.columns.toSeq === Seq("name", "dbl", "lng", "flag"))
    val rows = back.orderBy("lng").collect()
    assert(rows.length === 2)
    // XML escaping survived the round trip
    assert(rows(1).getString(0) === "a & <b>")
    assert(rows(1).getDouble(1) === 1.5)
    // whole numbers come back as longs (readxl-style guessing)
    assert(rows(1).getLong(2) === 10L)
    assert(rows(1).getBoolean(3) === true)
  }

  test("read_excel contract: skip preamble rows, NA token, type guessing") {
    // simulate the reference's Excel inputs (skip = 3, na = "x"):
    // writer header + 2 preamble lines, then the real header + data
    val raw = Seq(
      ("report generated", null, null),
      ("fiscal 2024", null, null),
      ("NOC", "Region", "Value"),
      ("#11100", "North", "42"),
      ("#11101", "South", "x"),     // NA token
      ("#11102", "East", "7"))
      .toDF("c1", "c2", "c3")
    val f = tmpXlsx("skip.xlsx")
    Xlsx.write(Seq(Xlsx.Sheet("Sheet 1", raw)), f)

    val df = XlsxReader.readXlsx(spark, f.getPath, skip = 3, na = "x")
    assert(df.columns.toSeq === Seq("NOC", "Region", "Value"))
    val rows = df.orderBy("NOC").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "#11100")
    // the "x" cell became null; column stays string (values are text)
    assert(rows(1).isNullAt(2))
    assert(rows(0).getString(2) === "42")
  }

  test("numeric columns infer long vs double; blanks stay null") {
    val df = Seq((1.0, 1.5), (2.0, 2.5)).toDF("ints", "dbls")
    val f = tmpXlsx("types.xlsx")
    Xlsx.write(Seq(Xlsx.Sheet("s", df)), f)
    val back = XlsxReader.readXlsx(spark, f.getPath)
    assert(back.schema("ints").dataType.typeName === "long")
    assert(back.schema("dbls").dataType.typeName === "double")
  }

  test("missing sheet name raises with the available roster") {
    val f = tmpXlsx("miss.xlsx")
    Xlsx.write(Seq(Xlsx.Sheet("only", Seq((1, 2)).toDF("a", "b"))), f)
    val e = intercept[RuntimeException] {
      XlsxReader.readSheet(f.getPath, Some("nope"))
    }
    assert(e.getMessage.contains("only"))
  }

  test("colIndex decodes A1-style references") {
    assert(XlsxReader.colIndex("A1") === 0)
    assert(XlsxReader.colIndex("Z9") === 25)
    assert(XlsxReader.colIndex("AA10") === 26)
    assert(XlsxReader.colIndex("BC7") === 54)
  }
}
