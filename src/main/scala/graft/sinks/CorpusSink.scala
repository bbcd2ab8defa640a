package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, hash, pmod, lit}

/** Corpus-layout parquet writer — the data-plane sink a training-data
  * pipeline ends in (the report sinks live in `Xlsx`/`Archive`).
  *
  * Three 100 TB concerns, handled declaratively so the cluster does
  * the work:
  *  - **partition layout**: `partitionBy` columns become directory
  *    keys (lang=en/...), so downstream reads prune whole subtrees
  *    (`PartitionFilters` at the scan);
  *  - **file sizing**: `maxRecordsPerFile` bounds every output file —
  *    no 100 GB monoliths, no coordinator-side compaction pass;
  *  - **write parallelism vs small files**: rows are repartitioned by
  *    the partition keys PLUS a bounded salt (hash of `sortCols` mod
  *    `tasksPerPartition`), so each directory is written by up to
  *    `tasksPerPartition` tasks instead of exactly one. Keying on the
  *    partition values alone caps parallelism at the number of
  *    distinct values — at corpus scale one task would sort and write
  *    terabytes for lang=en — while a plain round-robin repartition
  *    has every task write a sliver of every directory (the
  *    small-files explosion). The salt bounds files per directory at
  *    `tasksPerPartition × ceil(rows/maxRecordsPerFile)` while
  *    spreading the heavy partitions over the cluster;
  *  - **in-file order**: sorted within tasks by `sortCols`, so column
  *    stats (min/max per row group) make id-range predicates
  *    prunable. The salt is hash-of-sortCols, so sibling files cover
  *    interleaved id ranges — stats pruning still works per file.
  */
object CorpusSink {

  def writeCorpus(df: DataFrame, path: String,
                  partitionCols: Seq[String] = Seq("lang"),
                  sortCols: Seq[String] = Seq("doc_id"),
                  maxRecordsPerFile: Long = 1000000L,
                  tasksPerPartition: Int = 8): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(tasksPerPartition >= 1, s"tasksPerPartition must be >= 1: $tasksPerPartition")
    val salt = pmod(hash(sortCols.map(col): _*), lit(tasksPerPartition))
    df.withColumn("_write_salt", salt)
      .repartition((partitionCols.map(col) :+ col("_write_salt")): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .drop("_write_salt")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
