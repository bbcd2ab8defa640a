package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The transforms are written against plain DataFrames so the SAME
  * code serves batch (DuckDB-oracle-checked via q22/q23) and
  * streaming (readStream → writeStream, checked by StreamingSpec with
  * a memory sink). That symmetry is the point of Structured
  * Streaming: the plan, not the source, defines the semantics.
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded
  * per (window, key); session windows hold one open session per key;
  * `flatMapGroupsWithState` is the arbitrary-state escape hatch with
  * explicit timeouts so state can't grow unboundedly.
  */
object Streaming {

  /** events schema with ts as LONG NANOS, as the raw parquet stores it
    * (Spark's TimestampType is micros — see Tables.load).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming read of an events directory/file; normalizes ns → µs
    * timestamps exactly like the batch path.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file streaming source wants a DIRECTORY; a single-file path
    // becomes parent dir + glob filter
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(rawSchema)
    val src =
      if (f.isFile) reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
      else reader.parquet(path)
    src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling-window aggregate (the streaming form of q22): counts and
    * exact decimal sums per (hour, event_type), 10-minute watermark
    * for late data.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))

  /** Session windows per user: a session closes after `gap` of
    * inactivity. Works identically in batch (q23 oracle) and
    * streaming.
    */
  def sessionize(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("total"))

  /** Streaming variant with watermark (required for append-mode
    * session aggregation).
    */
  def sessionizeStream(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    sessionize(events.withWatermark("ts", "10 minutes"), gap)

  /** Stream-stream interval join: each purchase joined to the same
    * user's signups within `lookback` before it. Both sides carry
    * watermarks + the time-range predicate, which is what lets Spark
    * BOUND the join state (rows older than watermark+lookback are
    * evicted) — without them a stream-stream join's state grows
    * forever. Works identically on batch frames (StreamingSpec pins
    * the equivalence).
    */
  def purchaseSignupJoin(events: DataFrame, lookback: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    val s = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    p.join(s,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
        col("s_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_ts"), col("s_ts"), col("value"))
  }

  // ——— arbitrary stateful processing ———

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserState(n: Long, total: Double)
  final case class UserSnapshot(user_id: Long, n: Long, total: Double)

  /** Per-user running totals via mapGroupsWithState — the custom-state
    * path for logic window aggregates can't express. ProcessingTime
    * timeout evicts idle users' state.
    */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](GroupStateTimeout.ProcessingTimeTimeout) {
        (user, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val (n, total) = rows.foldLeft((prev.n, prev.total)) {
            case ((c, s), e) => (c + 1, s + e.value)
          }
          state.update(UserState(n, total))
          state.setTimeoutDuration("1 hour")
          UserSnapshot(user, n, total)
      }
  }

  /** Streaming exact dedup — the streaming twin of
    * `Dedup.exactGroups`: drop any event whose dedup key was already
    * seen within the watermark horizon. State is one entry per
    * distinct key INSIDE the horizon only (`
    * dropDuplicatesWithinWatermark` evicts keys older than the
    * watermark), so state is bounded by key arrival rate × horizon —
    * the only formulation that survives an unbounded stream. With
    * `keyCols` = a content fingerprint this is streaming content
    * dedup; with the event id it is exactly-once re-delivery
    * protection.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts", horizon: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming INCREMENTAL near-dup dedup: each arriving micro-batch
    * is treated as a shard and deduped against the persisted LSH
    * index with the batch operator (`Dedup.dedupAgainstIndex`) inside
    * `foreachBatch` — the standard seam for batch-only logic
    * (multi-join + aggregation) on a stream. Admitted (non-duplicate)
    * docs are handed to `sink`, which in production appends them to
    * the corpus store (and, on an index-epoch boundary, to the index
    * itself). State lives in the persisted index, not the stream —
    * bounded by corpus size, not stream length.
    */
  def incrementalDedupStream(newDocs: DataFrame, index: Dedup.LshIndex,
                             sink: (DataFrame, Long) => Unit,
                             n: Int = 3, k: Int = 32, bands: Int = 8,
                             minJaccard: Double = 0.5): StreamingQuery = {
    val q = newDocs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val pairs = Dedup.dedupAgainstIndex(batch, index, n, k, bands, minJaccard)
        sink(Dedup.applyIncrementalDedup(batch, pairs), id)
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Drive a streaming DataFrame to completion against a named memory
    * sink (test/local harness; a real deployment writes Parquet/Kafka).
    */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
