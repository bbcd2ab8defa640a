package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusSinkSpec extends SparkSpec {
  import spark.implicits._

  test("partition layout, file-size bound, in-file sort, exact round-trip") {
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("corpus_sink").toString
    CorpusSink.writeCorpus(docs, dir, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"), maxRecordsPerFile = 7L)

    // directory keys per language
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs === langs.map(l => s"lang=$l"))

    // every data file respects the record bound
    val files = subdirs.toSeq.flatMap(d =>
      new java.io.File(dir, d).listFiles().filter(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 7L, s"${f.getName} has $n rows > maxRecordsPerFile")
    }

    // rows are sorted by doc_id INSIDE each file (row-group stats
    // prunable) — and the whole corpus round-trips exactly
    files.take(5).foreach { f =>
      val ids = spark.read.parquet(f.getPath).select("doc_id").as[Long].collect()
      assert(ids.toSeq === ids.sorted.toSeq, s"${f.getName} not sorted")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    assert(back.select("doc_id", "text").except(docs.select("doc_id", "text")).isEmpty)

    // partition pruning reaches the scan
    val pruned = back.filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no pruning:\n$plan")
  }
}
