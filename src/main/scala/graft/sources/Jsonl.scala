package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** JSONL corpus ingest/egress — the interchange format LLM data
  * pipelines actually ship (one JSON object per line; gzip/zstd
  * per-file compression; schema known up front). Built directly on
  * Spark's distributed json source: splittable reads, predicate/
  * column pruning, and per-record error isolation all come from the
  * engine, not custom code.
  *
  * Failure semantics are the operator's contract: real corpora carry
  * truncated lines and encoding garbage, and a 100 TB ingest that
  * aborts on record 10¹² is useless. `readDocs` runs PERMISSIVE with
  * an explicit corrupt-record column: well-formed rows parse as
  * schema'd columns, malformed lines land whole in `_corrupt` for
  * quarantine — count them, sample them, never lose them silently.
  */
object Jsonl {

  val CorruptCol = "_corrupt"

  /** Write a DataFrame as JSONL, one part per partition;
    * `compression` = "gzip" | "none" (parquet-style codecs).
    */
  def write(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Read JSONL with an enforced schema + corrupt-record capture.
    * Returns rows where EITHER the schema columns are populated
    * (parsed) or `_corrupt` holds the raw offending line.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** A permissive read split into clean rows and quarantined raw
    * lines, plus ownership of the backing cache: Spark requires
    * caching the parsed frame before filtering on the corrupt column
    * (the parser may otherwise prune the referenced raw-record
    * field), and that cache pins the whole shard until released —
    * call `release()` once both sides are consumed, or every
    * ingested shard leaks one corpus-sized cache entry.
    */
  final case class Partitioned(clean: DataFrame, bad: DataFrame,
                               private val backing: DataFrame) {
    def release(): Unit = { backing.unpersist(); () }
  }

  def partition(parsed: DataFrame): Partitioned = {
    val cached = parsed.cache()
    Partitioned(
      clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol),
      bad = cached.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)),
      backing = cached)
  }
}
