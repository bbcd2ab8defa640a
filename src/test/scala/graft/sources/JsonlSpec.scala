package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("documents round-trip through gzipped JSONL losslessly") {
    val docs = Tables.load(spark, sf001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    Jsonl.write(docs, dir, compression = "gzip")
    // gzip really applied
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")) // skip .crc sidecars
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")))
    val back = Jsonl.read(spark, dir, docs.schema)
    val parts2 = Jsonl.partition(back)
    try {
      assert(parts2.bad.count() === 0)
      val want = docs.orderBy("doc_id").collect().map(_.toSeq)
      val got = parts2.clean.select(docs.columns.map(col): _*)
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) => assert(g === w) }
    } finally parts2.release()
  }

  test("malformed lines are quarantined whole, clean rows unaffected") {
    val docs = Tables.load(spark, sf001, "documents").limit(10)
    val dir = java.nio.file.Files.createTempDirectory("jsonlbad").toString
    Jsonl.write(docs, dir, compression = "none")
    // append a file with two garbage lines and one good row
    val goodLine = """{"doc_id": 99999, "text": "injected but valid"}"""
    val garbage = Seq("{truncated", "not json at all", goodLine)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-extra.json"),
      garbage.mkString("\n").getBytes("UTF-8"))
    val parts = Jsonl.partition(Jsonl.read(spark, dir, docs.schema))
    try {
      assert(parts.bad.count() === 2)
      // quarantined lines survive verbatim
      val badLines = parts.bad.as[String].collect().toSet
      assert(badLines === Set("{truncated", "not json at all"))
      // the valid injected row parses with nulls for absent columns
      assert(parts.clean.count() === docs.count() + 1)
      val injected = parts.clean.filter($"doc_id" === 99999L).collect()
      assert(injected.length === 1 &&
        injected.head.getAs[String]("text") === "injected but valid")
      // original rows intact
      assert(parts.clean.filter($"doc_id" =!= 99999L).count() === docs.count())
    } finally parts.release()
  }
}
