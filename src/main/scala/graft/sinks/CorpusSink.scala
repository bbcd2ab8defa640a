package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
  *  - **locality**: rows are repartitioned BY the partition keys
  *    (each task writes into one directory instead of every task
  *    writing a sliver of every directory — the small-files explosion)
  *    and sorted within partitions by `sortCols`, so column stats
  *    (min/max per row group) make id-range predicates prunable.
  */
object CorpusSink {

  def writeCorpus(df: DataFrame, path: String,
                  partitionCols: Seq[String] = Seq("lang"),
                  sortCols: Seq[String] = Seq("doc_id"),
                  maxRecordsPerFile: Long = 1000000L): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
