package graft.engine

import graft.SparkSpec
import java.nio.file.Files

/** Pins SURVEY.md §2.1: preamble skip (S1/S3), NA token, and
  * remove_empty (S4) semantics.
  */
class IngestSpec extends SparkSpec {

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("ingest").toFile
    val f = new java.io.File(dir, "employment.csv")
    val w = new java.io.PrintWriter(f)
    w.println("Export from 4castviewer")
    w.println("generated 2024-01-01")
    w.println("")
    w.println("NOC,Description,Income,Empty")
    w.println("#T,All occupations,100.5,")
    w.println("#10011,Senior managers,x,")
    w.println(",,,")
    w.close()
    f.getAbsolutePath
  }

  test("readCsv skips the 3-line preamble and honors the NA token") {
    val df = Ingest.readCsv(spark, writeFixture(), skip = 3, nullValue = "x")
    assert(df.columns.toSeq === Seq("NOC", "Description", "Income", "Empty"))
    assert(df.count() === 3)
    val rows = df.collect()
    val mgr = rows.find(r => r.getAs[String]("NOC") == "#10011").get
    assert(mgr.isNullAt(mgr.fieldIndex("Income"))) // "x" → null
  }

  test("removeEmpty drops all-null rows AND all-null columns") {
    val df = Ingest.readCsv(spark, writeFixture(), skip = 3, nullValue = "x")
    val cleaned = Ingest.removeEmpty(df)
    assert(cleaned.count() === 2)                 // ,,,  row dropped
    assert(cleaned.columns.toSeq === Seq("NOC", "Description", "Income"))
  }

  test("multi-file glob: the preamble is skipped in EVERY file") {
    val dir = Files.createTempDirectory("multi").toFile
    for (i <- 1 to 3) {
      val w = new java.io.PrintWriter(new java.io.File(dir, s"part$i.csv"))
      w.println("preamble 1"); w.println("preamble 2"); w.println("")
      w.println("NOC,Value")
      w.println(s"#$i,${i * 10}")
      w.close()
    }
    val df = Ingest.readCsv(spark, s"$dir/part*.csv", skip = 3)
    assert(df.count() === 3) // one data row per file, zero preamble leakage
    assert(df.columns.toSeq === Seq("NOC", "Value"))
  }

  test("resolveFiles glob discovery (reference :93-95)") {
    val dir = Files.createTempDirectory("glob").toFile
    new java.io.PrintWriter(new java.io.File(dir, "Occupational Characteristics 2024.csv")) {
      println("NOC"); close()
    }
    new java.io.PrintWriter(new java.io.File(dir, "other.csv")) { println("x"); close() }
    val found = Ingest.resolveFiles(spark, s"$dir/*Occupational Characteristics*")
    assert(found.size === 1 && found.head.contains("Occupational Characteristics"))
  }
}
