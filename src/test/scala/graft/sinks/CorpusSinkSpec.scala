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

  test("salt spreads one partition value over tasksPerPartition writers") {
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("corpus_salt").toString
    // large maxRecordsPerFile: any file split must come from the salt,
    // not from the record bound. AQE size-coalescing is disabled for
    // the write: at test scale ALL slices fit one advisory-sized
    // partition so AQE merges them back (correct at scale — there the
    // slices are GBs each and stay separate tasks); the salt's effect
    // is only observable with coalescing off.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      CorpusSink.writeCorpus(docs, dir, partitionCols = Seq("lang"),
        sortCols = Seq("doc_id"), maxRecordsPerFile = 1000000L,
        tasksPerPartition = 8)
    } finally spark.conf.set(coalesceKey, saved)

    // two (lang, salt) combos can hash into the SAME shuffle partition
    // (one writer task → one file), so the file count is the number of
    // distinct shuffle partitions hit — between 2 and 8 here, never 1
    // (8 combos collapsing into one of 32 partitions would defeat the
    // point of the salt; deterministic hash, so this is a fixed fact
    // of the shipped data, not a flake)
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val heavy = perLang.maxBy(_._2)._1
    val files = new java.io.File(dir, s"lang=$heavy").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2 && files.length <= 8,
      s"lang=$heavy written by ${files.length} tasks, expected 2..8")

    // per-file sort by doc_id survives the salt (stats pruning intact)
    files.foreach { f =>
      val ids = spark.read.parquet(f.getPath).select("doc_id").as[Long].collect()
      assert(ids.toSeq === ids.sorted.toSeq, s"${f.getName} not sorted")
    }
    // exact round-trip
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    assert(back.select("doc_id", "text").except(docs.select("doc_id", "text")).isEmpty)
  }
}
