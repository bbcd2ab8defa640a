package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical access to the driver-generated parquet tables
  * (TESTDATA.md). All operators read through here so that partition
  * sizing and scan options are controlled in one place — at 100 TB the
  * same call sites switch to a partitioned/bucketed lakehouse layout
  * without touching query code.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's
      // vectorized reader. Read nanos as long, then truncate to the
      // engine's native microsecond TimestampType (identical to what
      // DuckDB does when it reads TIMESTAMP_NS).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
