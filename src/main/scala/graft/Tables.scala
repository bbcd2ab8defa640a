package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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
      // events.ts has drifted across driver generations: TIMESTAMP(NANOS)
      // (read as long nanos via nanosAsLong), now TIMESTAMP(MICROS)
      // isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Normalize whatever
      // we find to the session-TZ TimestampType (sessions run UTC, so the
      // NTZ cast is byte-identical micros — same wall-clock DuckDB sees).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Schema-adaptive `ts` normalization shared by the batch and
    * streaming event read paths (see Streaming.readEvents): long
    * nanos → truncate to micros; TIMESTAMP_NTZ → session-TZ timestamp;
    * TimestampType → pass through. Anything else fails loudly with the
    * observed type rather than producing silently-wrong windows.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType    => df
    case other: DataType =>
      throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected LONG (nanos), TIMESTAMP_NTZ or TIMESTAMP")
  }
}
