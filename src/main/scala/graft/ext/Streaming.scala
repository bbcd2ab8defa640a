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

  /** Streaming read of an events directory/file. The file streaming
    * source needs an explicit schema, but hardcoding one is how the
    * round-8 silent corruption happened (the driver regenerated the
    * data with a different physical ts type). So: probe the parquet
    * footer once with a batch read (driver-side, cheap), hand the
    * observed schema to the streaming source, and normalize `ts`
    * through the SAME function as the batch path (Tables.normalizeEventTs)
    * so batch and streaming can never diverge again.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val observed: StructType = spark.read.parquet(path).schema
    // the file streaming source wants a DIRECTORY; a single-file path
    // becomes parent dir + glob filter
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(observed)
    val src =
      if (f.isFile) reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
      else reader.parquet(path)
    graft.Tables.normalizeEventTs(src)
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

  /** Stream-static enrichment + hourly rollup: broadcast-join a
    * static dimension onto the event stream — the canonical "attach
    * user/customer attributes at ingest" shape — then tumbling-hour
    * counts and exact decimal sums per dimension attribute. The
    * static side re-broadcasts into every micro-batch (no stream
    * state beyond the window aggregate itself; an updated dim table
    * is picked up on the next batch read), and the watermark bounds
    * window state exactly as in [[hourlyAgg]]. At 100 TB/day rates
    * the dim stays broadcast-sized by definition (it's a dimension);
    * a fact-sized right side belongs in a stream-stream join
    * (q204's watermark-bounded interval join) instead.
    */
  def enrichedHourly(events: DataFrame, dim: DataFrame, joinKey: String,
                     attrCol: String): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), Seq(joinKey))
      .groupBy(window(col("ts"), "1 hour").as("w"), col(attrCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col(attrCol), col("n"), col("total"))

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

  /** LEFT-OUTER twin of [[purchaseSignupJoin]]: every purchase emits —
    * matched rows as the signups arrive, UNMATCHED ones with a NULL
    * `s_ts` once the watermark proves no matching signup can still
    * come (the interval condition bounds the wait: a purchase's
    * matches all have `s_ts <= p_ts`, so the row finalizes when the
    * signup-side watermark passes `p_ts`). This is the state
    * LIFECYCLE surface of stream-stream joins: null emission is
    * driven by watermark-expired state eviction, not by data.
    *
    * On a FINITE replay the tail of the stream never expires on its
    * own — the watermark stops at max(event time) − delay. Stage the
    * source through [[stageEventsWithSentinel]] so a far-future
    * sentinel (filtered out of the result by its user_id = −1)
    * advances both sides' watermarks past every real row, making the
    * bounded replay emit exactly the batch LEFT JOIN.
    */
  def purchaseSignupJoinLeftOuter(events: DataFrame,
                                  lookback: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    val s = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    p.join(s,
        col("user_id") === col("s_user") &&
          col("s_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
          col("s_ts") <= col("p_ts"),
        "left_outer")
      .select(col("user_id"), col("p_ts"), col("s_ts"), col("value"))
    // NOTE: consumers using a staged sentinel must drop user_id < 0
    // AFTER the sink, not here — a filter in the streaming plan gets
    // pushed below the watermark operators by Catalyst, and the
    // sentinel then never advances the watermark (measured: exactly
    // that pushdown showed up as PushedFilters on the scan).
  }

  /** Stage an events parquet into a temp directory with a FAR-FUTURE
    * watermark-advancer sentinel appended: one purchase and one
    * signup for user −1 at max(ts) + 30 days. The original file is
    * symlinked (no copy); the sentinel is a 2-row parquet written
    * with the SOURCE's observed schema (ts keeps its physical type,
    * so the schema-probing streaming read stays uniform). Sentinel
    * rows carry user_id = −1 — downstream operators filter them; the
    * sentinels' own state never finalizes (the watermark stops 10 min
    * short of them) and is discarded when the query stops.
    */
  def stageEventsWithSentinel(spark: SparkSession, eventsPath: String): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_sentinel_events")
    dir.toFile.deleteOnExit()
    val src = Paths.get(eventsPath).toAbsolutePath
    if (Files.isDirectory(src)) {
      val listing = Files.list(src)
      try {
        val it = listing.iterator()
        while (it.hasNext) {
          val f = it.next()
          if (f.getFileName.toString.endsWith(".parquet"))
            Files.createSymbolicLink(dir.resolve("a_" + f.getFileName), f)
        }
      } finally listing.close()
    } else {
      Files.createSymbolicLink(dir.resolve("a_events.parquet"), src)
    }
    val ev = spark.read.parquet(eventsPath)
    // an empty source would build an empty sentinel frame — the
    // watermark then never advances and the left-outer replay
    // SILENTLY emits no finalized unmatched rows; fail loudly instead
    require(!ev.isEmpty,
      s"stageEventsWithSentinel: empty events source at $eventsPath — " +
        "the watermark sentinel needs at least one row to derive from")
    val far = ev.agg(max(col("ts")).as("_mx"))
      .select((col("_mx") + expr("INTERVAL 30 DAYS")).as("_far"))
    def sentinel(eventType: String) = ev.limit(1).crossJoin(far)
      .select(ev.columns.map {
        case "ts" => col("_far").cast(ev.schema("ts").dataType).as("ts")
        case "user_id" => lit(-1L).cast(ev.schema("user_id").dataType).as("user_id")
        case "event_type" => lit(eventType).as("event_type")
        case "event_id" => lit(-1L).cast(ev.schema("event_id").dataType).as("event_id")
        case "value" => lit(0.0).cast(ev.schema("value").dataType).as("value")
        case c => col(c)
      }.toIndexedSeq: _*)
    // write to a scratch dir, then move the single part file in as a
    // plain file — the staged dir must contain only parquet FILES so
    // the streaming source's listing never depends on recursion rules
    val scratch = Files.createTempDirectory("graft_sentinel_write")
    sentinel("purchase").unionByName(sentinel("signup"))
      .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val partListing = Files.list(scratch)
    var moved = false
    try {
      val part = partListing.iterator()
      while (part.hasNext) {
        val f = part.next()
        if (f.getFileName.toString.endsWith(".parquet")) {
          Files.move(f, dir.resolve("z_sentinel.parquet"))
          moved = true
        }
      }
    } finally partListing.close()
    require(moved, s"stageEventsWithSentinel: no part file written in $scratch")
    // the scratch dir's leftovers (_SUCCESS, .crc) are session trash —
    // delete now; the staged dir itself is removed at JVM exit
    def rmTree(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rmTree)
      f.delete()
    }
    rmTree(scratch.toFile)
    val staged = Files.list(dir)
    try staged.iterator().forEachRemaining(p => p.toFile.deleteOnExit())
    finally staged.close()
    dir.toString
  }

  // ——— arbitrary stateful processing ———

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserState(n: Long, total: Double)
  final case class UserSnapshot(user_id: Long, n: Long, total: Double)

  /** Per-user running totals via mapGroupsWithState — the custom-state
    * path for logic window aggregates can't express. With
    * `idleTimeout` set (the default), a ProcessingTime timeout evicts
    * idle users' state — the unbounded-stream posture. Pass None for
    * bounded replays (Trigger.AvailableNow): a pending processing-time
    * timer keeps the available-now drain alive until it fires, so a
    * finite replay with a 1-hour eviction would spin for an hour.
    */
  def runningTotals(events: Dataset[UserEvent],
                    idleTimeout: Option[String] = Some("1 hour")): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    val timeoutKind = idleTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](timeoutKind)(
        runningTotalsFn(idleTimeout))
  }

  /** The state-transition function behind `runningTotals`, extracted
    * so the timeout branch is unit-testable via `TestGroupState`
    * (a ProcessingTime timeout can't be forced deterministically
    * through a real stream). A timed-out invocation arrives with NO
    * rows: the state (and its timer) must be removed — updating and
    * re-arming here would keep every idle user's state forever and
    * re-emit its snapshot once per timeout. `mapGroupsWithState`
    * requires a return value, so eviction emits the state once as a
    * final snapshot; it can't recur because the timer dies with the
    * state.
    */
  private[ext] def runningTotalsFn(idleTimeout: Option[String])(
      user: Long, rows: Iterator[UserEvent],
      state: GroupState[UserState]): UserSnapshot = {
    if (state.hasTimedOut) {
      val last = state.getOption.getOrElse(UserState(0L, 0.0))
      state.remove()
      UserSnapshot(user, last.n, last.total)
    } else {
      val prev = state.getOption.getOrElse(UserState(0L, 0.0))
      val (n, total) = rows.foldLeft((prev.n, prev.total)) {
        case ((c, s), e) => (c + 1, s + e.value)
      }
      state.update(UserState(n, total))
      idleTimeout.foreach(state.setTimeoutDuration)
      UserSnapshot(user, n, total)
    }
  }

  final case class TtlEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class TtlState(n: Long, cents: Long, lastMicros: Long)
  final case class TtlSnapshot(user_id: Long, n: Long, total_cents: Long,
                               evicted: Boolean)

  /** Per-user running totals with an EVENT-TIME state TTL — the
    * state-lifecycle law [[runningTotals]]' processing-time timeout
    * can't pin deterministically: a user whose last event is more
    * than `ttl` of EVENT time behind the watermark has its state
    * evicted, emitting one final tombstone snapshot
    * (`evicted = true`) and freeing the key's storage. Deterministic
    * by construction (driven by data timestamps, not wall clock), so
    * the eviction law is testable with a replayed stream.
    *
    * Scale: state is one 24-byte triple per ACTIVE user — the TTL is
    * what makes "active" a bounded set on an unbounded stream.
    */
  def runningTotalsEventTtl(events: Dataset[TtlEvent], ttl: String = "1 hour",
                            watermarkDelay: String = "0 seconds"): Dataset[TtlSnapshot] = {
    import events.sparkSession.implicits._
    val ttlMillis = gapToMicros(ttl) / 1000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[TtlState, TtlSnapshot](
        GroupStateTimeout.EventTimeTimeout) { (user, rows, state) =>
        if (state.hasTimedOut) {
          val last = state.getOption.getOrElse(TtlState(0L, 0L, 0L))
          state.remove() // eviction — the timer dies with the state
          TtlSnapshot(user, last.n, last.cents, evicted = true)
        } else {
          val prev = state.getOption.getOrElse(TtlState(0L, 0L, 0L))
          var n = prev.n; var cents = prev.cents; var lastM = prev.lastMicros
          rows.foreach { e =>
            n += 1; cents += toCents(e.value)
            val m = micros(e.ts); if (m > lastM) lastM = m
          }
          state.update(TtlState(n, cents, lastM))
          // state lives until the watermark passes lastEvent + ttl
          state.setTimeoutTimestamp(lastM / 1000L + ttlMillis)
          TtlSnapshot(user, n, cents, evicted = false)
        }
      }
  }

  /** Exactly-once parquet sink for `foreachBatch`: epoch-marker
    * transactional commit. Structured Streaming guarantees foreachBatch
    * AT-LEAST-once with a STABLE batchId per epoch — exactly-once is
    * the sink's job, and the standard recipe is (1) write the batch
    * under a batch-scoped path with overwrite (a torn retry rewrites
    * cleanly), then (2) drop a commit marker; a retry of an
    * already-committed epoch sees the marker and no-ops. `read` maps
    * only committed batch directories, so a torn write is never
    * visible.
    */
  final class IdempotentParquetSink(outDir: String)
      extends ((DataFrame, Long) => Unit) with Serializable {
    private def marker(batchId: Long) =
      new java.io.File(outDir, s"_committed_$batchId")
    private def dataDir(batchId: Long) =
      new java.io.File(outDir, s"batch_$batchId")

    def apply(df: DataFrame, batchId: Long): Unit = {
      new java.io.File(outDir).mkdirs()
      if (marker(batchId).exists()) return // committed epoch: retry no-ops
      df.write.mode("overwrite").parquet(dataDir(batchId).toString)
      require(marker(batchId).createNewFile(),
        s"IdempotentParquetSink: could not commit batch $batchId")
    }

    /** All COMMITTED batches (torn uncommitted writes are invisible). */
    def read(spark: SparkSession): DataFrame = {
      val committed = Option(new java.io.File(outDir).listFiles()).toSeq.flatten
        .filter(f => f.getName.startsWith("_committed_"))
        .map(f => dataDir(f.getName.stripPrefix("_committed_").toLong).toString)
      require(committed.nonEmpty, s"IdempotentParquetSink: no committed batches in $outDir")
      spark.read.parquet(committed: _*)
    }
  }

  // ——— stateful sessionization (flatMapGroupsWithState) ———
  //
  // session_window (above) is the declarative form; this is the
  // arbitrary-state form — the escape hatch for session logic the
  // built-in window can't express (per-session custom payloads,
  // conditional splits, early emission). Batch and streaming share
  // ONE merge core (`insertIntoSessions`), so the streaming operator
  // provably computes the q23-oracle-verified batch semantics:
  // a session closes when the next event is >= gap after the last
  // (q23's island test; session_window's exclusive end).

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** One not-yet-closed session: [startMicros, lastMicros] plus the
    * running count and cent-exact total (q22/q23's DECIMAL(18,2)
    * money contract — accumulating raw doubles would drift off the
    * oracle hash).
    */
  final case class Sess(startMicros: Long, lastMicros: Long, n: Long, cents: Long)

  final case class SessionRow(user_id: Long, session_start: String,
                              session_end: String, n_events: Long, total: Double)

  private def toCents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  /** Insert one event into an ordered, disjoint session list. The
    * event extends a neighbor when strictly closer than `gap` (>= gap
    * starts a new session — q23 semantics), and can BRIDGE its two
    * neighbors into one (the out-of-order case: a late event landing
    * between two sessions that sit < 2·gap apart). At most two
    * sessions merge per insert, so the list stays ordered + disjoint.
    */
  private[ext] def insertIntoSessions(sessions: List[Sess], tsMicros: Long,
                                      cents: Long, gapMicros: Long): List[Sess] = {
    val (before, after) = sessions.span(_.startMicros <= tsMicros)
    val joinPrev = before.lastOption.exists(p => tsMicros - p.lastMicros < gapMicros)
    val joinNext = after.headOption.exists(nx => nx.startMicros - tsMicros < gapMicros)
    (joinPrev, joinNext) match {
      case (true, true) =>
        val p = before.last; val nx = after.head
        before.init ::: Sess(p.startMicros, math.max(p.lastMicros, nx.lastMicros),
          p.n + nx.n + 1, p.cents + nx.cents + cents) :: after.tail
      case (true, false) =>
        val p = before.last
        before.init ::: Sess(p.startMicros, math.max(p.lastMicros, tsMicros),
          p.n + 1, p.cents + cents) :: after
      case (false, true) =>
        val nx = after.head
        before ::: Sess(tsMicros, nx.lastMicros, nx.n + 1, nx.cents + cents) :: after.tail
      case (false, false) =>
        before ::: Sess(tsMicros, tsMicros, 1, cents) :: after
    }
  }

  private def renderSession(user: Long, s: Sess, gapMicros: Long): SessionRow = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    def str(micros: Long) = fmt.format(java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
    SessionRow(user, str(s.startMicros), str(s.lastMicros + gapMicros),
      s.n, s.cents / 100.0)
  }

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  /** Batch twin: every group's events fold through the SAME insert
    * core, all sessions emitted. Output matches `sessionize` (and the
    * q23 oracle) row-for-row — pinned by the q92 battery entry.
    */
  def sessionizeStatefulBatch(events: Dataset[SessEvent],
                              gap: String = "5 minutes"): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    val gapMicros = gapToMicros(gap)
    events.groupByKey(_.user_id).flatMapGroups { (user, it) =>
      val done = it.foldLeft(List.empty[Sess]) { (acc, e) =>
        insertIntoSessions(acc, micros(e.ts), toCents(e.value), gapMicros)
      }
      done.map(renderSession(user, _, gapMicros))
    }
  }

  /** Same interval grammar as session_window accepts for the common
    * units — the stateful twins must not have a narrower gap grammar
    * than the declarative form they are pinned against.
    */
  private def gapToMicros(gap: String): Long = {
    val m = "(\\d+)\\s+(second|minute|hour|day)s?".r
    gap.trim match {
      case m(n, unit) =>
        val per = unit match {
          case "second" => 1000000L
          case "minute" => 60L * 1000000L
          case "hour" => 3600L * 1000000L
          case "day" => 86400L * 1000000L
        }
        n.toLong * per
      case other => throw new IllegalArgumentException(
        s"gap '$other' (want 'N seconds|minutes|hours|days')")
    }
  }

  /** Streaming form: state = the user's open session list; each
    * invocation folds the new (possibly out-of-order) events through
    * the shared insert core, then emits every session that the
    * watermark has sealed — no future event can extend OR bridge a
    * session once watermark >= last + gap, because any later event's
    * ts >= watermark starts (or joins) a strictly later session.
    * Event-time timeout flushes groups that stop receiving data.
    * State per key = open sessions only, bounded by gap/watermark —
    * the only formulation that survives an unbounded stream.
    */
  def sessionizeStateful(events: Dataset[SessEvent], gap: String = "5 minutes",
                         watermark: String = "10 minutes"): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    val gapMicros = gapToMicros(gap)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Sess], SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[List[Sess]]) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(Nil)) { (acc, e) =>
            insertIntoSessions(acc, micros(e.ts), toCents(e.value), gapMicros)
          }
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(_.lastMicros + gapMicros <= wmMicros)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // wake this group when the watermark passes its earliest
            // possible close point, even if no more events arrive
            state.setTimeoutTimestamp(
              open.map(_.lastMicros + gapMicros).min / 1000L + 1L)
          }
          closed.map(renderSession(user, _, gapMicros)).iterator
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
    *
    * `checkpointDir` makes the query RESUMABLE: offsets commit after
    * each `foreachBatch` returns, so a restarted query (same
    * checkpoint, same source) replays only batches whose commit never
    * landed — the sink must be idempotent per batchId (the standard
    * foreachBatch contract; StreamingSpec pins the clean-stop case:
    * zero re-delivery). Without it the query is fire-and-forget.
    */
  def incrementalDedupStream(newDocs: DataFrame, index: Dedup.LshIndex,
                             sink: (DataFrame, Long) => Unit,
                             n: Int = 3, k: Int = 32, bands: Int = 8,
                             minJaccard: Double = 0.5,
                             checkpointDir: Option[String] = None): StreamingQuery = {
    val w0 = newDocs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val pairs = Dedup.dedupAgainstIndex(batch, index, n, k, bands, minJaccard)
        sink(Dedup.applyIncrementalDedup(batch, pairs), id)
      }
    val q = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
      .start()
    q.processAllAvailable()
    q
  }

  /** Drive a streaming DataFrame to completion against a named memory
    * sink (test/local harness; a real deployment writes Parquet/Kafka).
    */
  /** Streaming read of any parquet file/directory with the observed
    * footer schema (the file streaming source refuses to infer) —
    * the generic sibling of [[readEvents]], minus the ts normalizer,
    * for non-event tables (documents, dimension snapshots).
    */
  def readParquetStream(spark: SparkSession, path: String): DataFrame = {
    val observed: StructType = spark.read.parquet(path).schema
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(observed)
    if (f.isFile) reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
    else reader.parquet(path)
  }

  // ——— streaming per-domain frequency cap ———

  final case class CapDoc(source: String)
  final case class CapAudit(domain: String, n_seen: Long, n_admitted: Long,
                            n_rejected: Long)

  /** Streaming enforcement of the per-domain frequency cap (q312's
    * C4/Dolma policy, applied INCREMENTALLY as docs arrive): per
    * domain, a single Long counter in `mapGroupsWithState` tracks
    * docs seen so far; admissions stop at `cap`, and every
    * micro-batch emits the domain's updated audit row (Update mode —
    * the memory/console sink shows the running ledger; a production
    * sink upserts by domain key). The admitted COUNT is
    * arrival-order-free — min(seen, cap) — so the final audit equals
    * the batch policy's exactly, which is what makes the streaming
    * form oracle-checkable; WHICH docs were admitted is
    * arrival-order-dependent by design (a stream cannot retro-drop).
    *
    * State: one Long per domain — bounded by the domain dictionary,
    * not the stream; no timeout needed (a cap is forever).
    */
  def domainCapStream(docs: Dataset[CapDoc], cap: Int): Dataset[CapAudit] = {
    require(cap >= 1, s"domainCapStream: cap >= 1, got $cap")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState[Long, CapAudit](GroupStateTimeout.NoTimeout) {
        (domain, rows, state) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          val admitted = math.min(total, cap.toLong)
          CapAudit(domain, total, admitted, total - admitted)
      }
  }

  final case class EvalSample(task_id: Long, correct: Boolean)
  final case class EvalLedger(task_id: Long, n_samples: Long,
                              n_correct: Long)

  /** Incremental eval ingestion — per-task (n_samples, n_correct)
    * counters as two Longs of mapGroupsWithState state, upserted per
    * micro-batch. Both counters are monotone SUMS, so the final
    * ledger is arrival-order-free and equals the batch aggregate —
    * the oracle the stream must land on. pass@k itself is computed
    * AFTER ingestion on the final ledger
    * ([[Evals.passAtKOnCounts]]), never inside the stream: the
    * formula isn't incremental, the counters are.
    *
    * State: two Longs per task — bounded by the task dictionary, not
    * the sample stream; no timeout (an eval ledger is forever).
    */
  def evalLedgerStream(samples: Dataset[EvalSample]): Dataset[EvalLedger] = {
    import samples.sparkSession.implicits._
    samples.groupByKey(_.task_id)
      .mapGroupsWithState[(Long, Long), EvalLedger](
        GroupStateTimeout.NoTimeout) { (task, rows, state) =>
        var (n, c) = state.getOption.getOrElse((0L, 0L))
        rows.foreach { r => n += 1; if (r.correct) c += 1 }
        state.update((n, c))
        EvalLedger(task, n, c)
      }
  }

  final case class PairedOutcome(task_id: Long, a: Boolean, b: Boolean)
  final case class McNemarLedger(shard: Long, n_pairs: Long,
                                 n_concordant: Long, b_a_only: Long,
                                 b_b_only: Long)

  /** STREAMING McNemar ledger — incremental discordant-pair counters
    * for two systems' paired outcomes, the streaming twin of
    * [[graft.ext.Evals.mcNemar]] (the q348 pass@k-ledger pattern):
    * state is four monotone counters per SHARD (task_id mod
    * `shards` — bounded state regardless of task cardinality; the
    * four counters are associative sums, so any sharding yields the
    * same statistic), each micro-batch folds its pairs in and emits
    * the shard's refreshed ledger row (Update mode — read back at
    * max per shard, sum shards, finish with
    * [[graft.ext.Evals.mcNemarOnCounts]]).
    */
  def mcNemarLedgerStream(pairs: Dataset[PairedOutcome],
                          shards: Int = 64): Dataset[McNemarLedger] = {
    import pairs.sparkSession.implicits._
    require(shards >= 1, s"mcNemarLedgerStream: shards >= 1, $shards")
    pairs.groupByKey(p => math.floorMod(p.task_id, shards.toLong))
      .mapGroupsWithState[(Long, Long, Long, Long), McNemarLedger](
        GroupStateTimeout.NoTimeout) { (shard, rows, state) =>
        var (n, c, ao, bo) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
        rows.foreach { r =>
          n += 1
          if (r.a == r.b) c += 1
          else if (r.a) ao += 1
          else bo += 1
        }
        state.update((n, c, ao, bo))
        McNemarLedger(shard, n, c, ao, bo)
      }
  }

  final case class LoggedPlay(task_id: Long, pb: Double, pt: Double,
                              r: Double)
  final case class IpsLedger(shard: Long, n_total: Long,
                             n_samples: Long, sw: Long, swr: Long,
                             sw2: Long)

  /** STREAMING IPS ledger — incremental off-policy weight moments,
    * the streaming twin of [[graft.ext.Evals.ipsOffPolicy]] (the
    * q380 sharded-counter pattern): per shard the counters
    * (n_total, n_samples, Σ⌊1e6·w⌉, Σ⌊1e6·w·r⌉, Σ⌊1e6·w²⌉), each
    * example quantized with the SAME HALF_UP 1e-6 rule as the batch
    * operator (BigDecimal HALF_UP — Spark's round), so summing the
    * final shard rows and finishing with
    * [[graft.ext.Evals.ipsOnCounts]] reproduces the batch estimates
    * exactly. Plays with a non-positive or non-finite behavior
    * probability, or a non-finite target probability or reward,
    * count into n_total only (dropped) — the identical
    * finite-and-positive rule as the batch operator, so the twins
    * drop the same rows. Contract: the input stream is NULL-free
    * (filter before `.as[LoggedPlay]` — the case class fields are
    * primitive).
    *
    * READBACK: take the LAST row per shard by argmax on n_total
    * (e.g. `max(struct(n_total, …))` — n_total strictly increases
    * with every emitted shard row), NOT a per-counter max: n_total,
    * n_samples, sw and sw2 are monotone (w > 0), but swr adds
    * ⌊1e6·w·r⌉ which is NEGATIVE for negative rewards — a legitimate
    * IPS input — so max-of-each-counter would silently reconstruct a
    * wrong ledger there.
    */
  def ipsLedgerStream(plays: Dataset[LoggedPlay],
                      shards: Int = 64): Dataset[IpsLedger] = {
    import plays.sparkSession.implicits._
    require(shards >= 1, s"ipsLedgerStream: shards >= 1, $shards")
    def q6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    plays.groupByKey(p => math.floorMod(p.task_id, shards.toLong))
      .mapGroupsWithState[(Long, Long, Long, Long, Long), IpsLedger](
        GroupStateTimeout.NoTimeout) { (shard, rows, state) =>
        var (nt, ns, sw, swr, sw2) =
          state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L))
        rows.foreach { p =>
          nt += 1
          // finite-and-positive: the batch twin's exact drop rule
          // (NaN pb already fails the Scala >, unlike Spark SQL's
          // NaN-is-greatest ordering; ±Inf and NaN pt/r would feed
          // q6 garbage, so they drop on both sides identically)
          if (java.lang.Double.isFinite(p.pb) && p.pb > 0.0 &&
              java.lang.Double.isFinite(p.pt) &&
              java.lang.Double.isFinite(p.r)) {
            ns += 1
            val w = p.pt / p.pb
            sw += q6(1e6 * w)
            swr += q6(1e6 * w * p.r)
            sw2 += q6(1e6 * w * w)
          }
        }
        state.update((nt, ns, sw, swr, sw2))
        IpsLedger(shard, nt, ns, sw, swr, sw2)
      }
  }

  final case class PairedScore(task_id: Long, a: Double, b: Double)
  final case class ConfSeqLedger(shard: Long, n_segs: Long, sqd: Long,
                                 sqd2: Long)

  /** STREAMING anytime-valid test ledger — incremental quantized
    * delta moments for [[graft.ext.Evals.confSeqTest]]'s time-uniform
    * confidence sequence (the q385 sharded-counter pattern): per
    * shard the counters (n_segs, Σ⌊1e6·d⌉, Σ⌊1e6·d²⌉) with d = a−b,
    * each quantized with the SAME HALF_UP 1e-6 rule as the batch
    * operator, so summing the final shard rows and finishing with
    * [[graft.ext.Evals.seqTestOnCounts]] reproduces the batch
    * statistic exactly. THIS is the pairing the confidence sequence
    * exists for: the interval is simultaneously valid over all n, so
    * reading the ledger at ANY moment — including stopping the
    * moment it rejects — keeps the α guarantee, with no per-arrival
    * history needed beyond the three counters. Non-finite scores
    * drop (the batch [[graft.ext.Evals.finite]] rule); the input
    * stream is NULL-free by the case-class contract.
    *
    * READBACK: last row per shard by argmax on the strictly monotone
    * n_segs (the ipsLedgerStream contract — sqd is a SIGNED sum and
    * decreases under negative deltas; per-counter max would
    * reconstruct a wrong ledger).
    */
  def confSeqLedgerStream(segs: Dataset[PairedScore],
                          shards: Int = 64): Dataset[ConfSeqLedger] = {
    import segs.sparkSession.implicits._
    require(shards >= 1, s"confSeqLedgerStream: shards >= 1, $shards")
    def q6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    segs.groupByKey(p => math.floorMod(p.task_id, shards.toLong))
      .mapGroupsWithState[(Long, Long, Long), ConfSeqLedger](
        GroupStateTimeout.NoTimeout) { (shard, rows, state) =>
        var (n, sd, sd2) = state.getOption.getOrElse((0L, 0L, 0L))
        rows.foreach { p =>
          val d = p.a - p.b
          if (java.lang.Double.isFinite(d)) {
            n += 1
            sd += q6(1e6 * d)
            sd2 += q6(1e6 * d * d)
          }
        }
        state.update((n, sd, sd2))
        ConfSeqLedger(shard, n, sd, sd2)
      }
  }

  final case class EloBattle(league: Long, seq: Long, winner: Long,
                             loser: Long)
  final case class EloArenaState(n_battles: Long,
                                 players: Map[Long, (Long, Long, Long)])
  final case class EloRating(league: Long, n_battles: Long, model_id: Long,
                             wins: Long, n_games: Long, rating_micro: Long)

  /** STREAMING Elo arena — sequential per-battle rating updates as
    * they arrive, keyed by league in `flatMapGroupsWithState`: state
    * is the league's (player → rating, wins, games) map plus a
    * monotone battle counter; each micro-batch folds its battles in
    * (seq, winner, loser) order through the SAME
    * [[graft.ext.Preference.eloDelta]] update as the batch fold and
    * emits the league's full refreshed roster stamped with the
    * counter (Update mode — read the ledger back at max n_battles
    * per league).
    *
    * Order sensitivity is the POINT of Elo, so unlike the q348
    * pass@k counters this stream is NOT arrival-order-free: it
    * equals [[graft.ext.Preference.eloFold]] exactly when batches
    * arrive in seq order and each batch's battles are internally
    * unordered (the stream sorts within the batch) — the
    * event-time-ordered-ingestion contract a rating feed already
    * satisfies; the StreamingSpec law pins single-batch and
    * split-in-order parity with the batch fold.
    *
    * State: one bounded roster map per league (players, not
    * battles); no timeout — an arena ledger is forever.
    */
  def eloRatingStream(battles: Dataset[EloBattle],
                      kMicro: Long = 32000000L,
                      startMicro: Long = 1500000000L,
                      floorMicro: Long = 100000000L): Dataset[EloRating] = {
    import battles.sparkSession.implicits._
    battles.groupByKey(_.league)
      .flatMapGroupsWithState[EloArenaState, EloRating](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (league, rows, state) =>
          val st = state.getOption.getOrElse(EloArenaState(0L, Map.empty))
          var n = st.n_battles
          var m = st.players
          rows.toSeq.sortBy(b => (b.seq, b.winner, b.loser)).foreach { b =>
            val (rw, ww, gw) = m.getOrElse(b.winner, (startMicro, 0L, 0L))
            val (rl, wl, gl) = m.getOrElse(b.loser, (startMicro, 0L, 0L))
            val d = Preference.eloDelta(rw, rl, kMicro)
            m = m
              .updated(b.winner, (rw + d, ww + 1L, gw + 1L))
              .updated(b.loser,
                (math.max(rl - d, floorMicro), wl, gl + 1L))
            n += 1
          }
          state.update(EloArenaState(n, m))
          m.iterator.map { case (p, (r, w, g)) =>
            EloRating(league, n, p, w, g, r)
          }
      }
  }

  /** Streaming MERGE-INTO maintenance — the production pattern for
    * keeping a keyed mirror current from a change stream: every
    * micro-batch is compacted to last-writer-per-key (ts, then
    * event_id — a PARTITIONED window over the batch only), guarded
    * against stale replays with the MERGE-WHEN-NEWER condition
    * (source (ts, event_id) must beat the target's), and applied via
    * [[graft.engine.Scd.mergeUpsert]]. The maintained target is
    * ledger-checkpointed per batch (lineage cut — without it batch N
    * replans N merges). Out-of-order and duplicate DELIVERY both
    * collapse to the same final table as one batch compaction of the
    * whole feed — that equivalence is the oracle check and the
    * StreamingSpec multi-batch law.
    *
    * In production the target is a table-format MERGE (the
    * newer-than guard becomes the WHEN MATCHED condition); here it
    * is the pure-DataFrame twin so the semantics are oracle-exact.
    */
  def upsertMaintenanceStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import org.apache.spark.sql.expressions.Window
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("value", DoubleType)))
    var target = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val q = events.select("user_id", "ts", "event_id", "value").writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val compact = batch.select("user_id", "ts", "event_id", "value")
          .withColumn("_rk", row_number().over(w))
          .filter(col("_rk") === 1).drop("_rk")
        val newer = compact.join(target.select(col("user_id"),
            col("ts").as("_tts"), col("event_id").as("_tid")),
            Seq("user_id"), "left")
          .filter(col("_tts").isNull || col("ts") > col("_tts") ||
            (col("ts") === col("_tts") && col("event_id") > col("_tid")))
          .drop("_tts", "_tid")
        target = graft.engine.TrackedCache.trackedLocalCheckpoint(
          graft.engine.Scd.mergeUpsert(target,
            newer.withColumn("op", lit("I")), Seq("user_id")))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    target
  }

  /** Streaming ANN lookup — the online-retrieval backfill shape: a
    * stream of query vectors is answered per micro-batch against a
    * STATIC embedding corpus with the batch ANN operator
    * ([[Similarity.annTopKBatch]]: banded-LSH candidates → exact
    * rescore → per-query top-k) inside `foreachBatch` — the standard
    * seam for join+window logic on a stream. Per-query results are
    * independent, so the streamed answer set equals the one-shot
    * batch answer whatever the batching — the oracle check. The
    * result ledger is ledger-checkpointed per batch (lineage cut).
    */
  def annLookupStream(queryStream: DataFrame, corpus: DataFrame, k: Int,
                      bands: Int, r: Int): DataFrame = {
    var out: DataFrame = null
    val q = queryStream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val res = Similarity.annTopKBatch(corpus, batch, k, bands, r)
        out = graft.engine.TrackedCache.trackedLocalCheckpoint(
          if (out == null) res else out.unionByName(res))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    if (out == null) {
      // zero micro-batches: return an EMPTY frame with the real
      // output schema (qid/vec_id/cos_sim…), not emptyDataFrame's
      // zero columns — downstream column references must still bind.
      val spark = corpus.sparkSession
      val noQueries = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        queryStream.schema)
      Similarity.annTopKBatch(corpus, noQueries, k, bands, r)
    } else out
  }

  /** NOTE: the memory sink is NOT fault-tolerant and refuses
    * checkpoint recovery — for a resumable ledger run use a
    * foreachBatch sink with a fixed checkpointLocation (the
    * StreamingSpec restart laws show the shape). */
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

  /** Ordered event funnel: for each user, the timestamp at which each
    * step of `steps` was first reached, where step k counts only
    * STRICTLY AFTER step k−1's timestamp (first matching event).
    * Returns (user, t0…t{n−1} as epoch-micros — null where the funnel
    * stalled, stage = steps completed).
    *
    * Spark-first shape: ONE shuffle (groupBy user, collect + sort the
    * thin (ts, type) pairs) and a linear fold over the sorted array —
    * not the naive n-stage chain of aggregate+join rounds, which
    * shuffles the events table once per step. The fold's when-chain
    * is built per-step at plan time, so it stays a single codegen'd
    * expression for any `steps` length. Per-user state is that user's
    * event list — the same per-key bound as any sessionizer.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             maxGap: Option[String] = None,
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    val n = steps.length
    // conversion window: step k counts only within maxGap of step k−1
    val gapMicros: Option[Long] = maxGap.map(g =>
      org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(g)) match {
        case iv =>
          require(iv.months == 0, s"funnel maxGap must be day-time: $g")
          iv.days * 86400000000L + iv.microseconds
      })
    def stepF(acc: org.apache.spark.sql.Column, k: Int) = acc.getField(s"t$k")
    def setStep(acc: org.apache.spark.sql.Column, k: Int,
                t: org.apache.spark.sql.Column) =
      struct((0 until n).map(i =>
        (if (i == k) t else stepF(acc, i)).as(s"t$i")): _*)
    val evs = array_sort(collect_list(
      struct(unix_micros(col(tsCol)).as("t"), col(typeCol).as("ty"))))
    val zero = struct((0 until n).map(i =>
      lit(null).cast("long").as(s"t$i")): _*)
    val folded = aggregate(col("_evs"), zero, (acc, e) => {
      // at most one branch can match: the first k with t{k} unset
      val cases = (0 until n).map { k =>
        val ready =
          if (k == 0) stepF(acc, 0).isNull
          else {
            val after = stepF(acc, k).isNull && stepF(acc, k - 1).isNotNull &&
              e.getField("t") > stepF(acc, k - 1)
            gapMicros.fold(after)(g =>
              after && e.getField("t") <= stepF(acc, k - 1) + g)
          }
        (ready && e.getField("ty") === steps(k), setStep(acc, k, e.getField("t")))
      }
      cases.foldRight(acc) { case ((cond, out), els) => when(cond, out).otherwise(els) }
    })
    val stage = (0 until n).map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    // only funnel-relevant events reach the shuffle and the per-user
    // state — the fold ignores other types by construction. Output
    // contract: one row per user with ≥1 STEP-TYPE event (a user
    // with only unrelated events has no funnel row — callers wanting
    // the full user universe left-join this result).
    events.filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(evs.as("_evs"))
      .select(col(userCol), folded.as("_st"))
      .select(col(userCol) +: (0 until n).map(i => col(s"_st.t$i").as(s"t$i")): _*)
      .withColumn("stage", stage)
  }

  /** Per-key rate-limit audit over tumbling hours: every event whose
    * within-(user, hour) arrival sequence exceeds `maxPerHour` is
    * flagged with its sequence number — the ingestion-hygiene cap
    * (bot/abuse traffic, runaway producers) applied as a batch
    * operator. Sequence order is (ts, event id) — a total order, so
    * the flag set is deterministic under any partitioning.
    *
    * ONE shuffle (the per-(user, hour) window); per-key state is the
    * hour's event count. The streaming twin is a count in
    * mapGroupsWithState keyed the same way.
    */
  /** Per-user inter-arrival statistics: gap count plus exact
    * interpolated median/p95 of the gaps between consecutive events,
    * in seconds — the activity-cadence profile (bot detection: robotic
    * cadence has near-zero gap variance; churn: gaps stretch).
    *
    * Gaps are computed from MICROSECOND integers via a per-user lag
    * window (one user-keyed shuffle); percentiles are NEAREST-RANK
    * (the ceil(q·n)-th smallest gap) — pure integer selection, so the
    * result is exact in any engine. Interpolated percentiles were
    * measured 1 ulp apart between engines at these magnitudes
    * (~1.7e11 µs — ulp ≈ 3e-5 > any rounding granularity), which is
    * why the interpolating form is NOT used here. At 100 TB swap in
    * `approx_percentile` — same trade as every monitoring op here.
    */
  def interArrivalStats(events: DataFrame, userCol: String = "user_id",
                        tsCol: String = "ts",
                        idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val gaps = events
      .withColumn("_prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("_prev").isNotNull)
      .withColumn("_gap", unix_micros(col(tsCol)) - col("_prev"))
    val byGap = Window.partitionBy(userCol).orderBy(col("_gap"), col(idCol))
    gaps
      .withColumn("_rn", row_number().over(byGap).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(userCol)))
      .groupBy(userCol).agg(
        max("_n").as("n_gaps"),
        max(when(col("_rn") === ceil(lit(0.5) * col("_n")), col("_gap")))
          .as("median_gap_us"),
        max(when(col("_rn") === ceil(lit(0.95) * col("_n")), col("_gap")))
          .as("p95_gap_us"))
  }

  /** Deterministic A/B experiment readout: users hash-split 50/50 by
    * the md5 coin (the q123 split machinery), "converted" = has at
    * least `minEvents` `convType` events; reports per-arm rates, absolute
    * lift, and the two-proportion pooled z-statistic. Every input to
    * the statistic is an exact integer count, so the one-row result
    * is engine-identical; the experiment is REPLAYABLE — the same
    * users land in the same arms forever.
    *
    * Two user-keyed aggregations; nothing driver-side.
    */
  def abLift(events: DataFrame, convType: String = "purchase",
             minEvents: Long = 1,
             userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    val users = events.groupBy(col(userCol).as("u"))
      .agg(when(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
        >= minEvents, 1L).otherwise(0L).as("conv"))
      .withColumn("arm",
        when(conv(substring(md5(col("u").cast("string")), 1, 15), 16, 10)
          .cast("double") / lit(1152921504606846976.0) < 0.5, "A")
          .otherwise("B"))
    val counts = users.groupBy().agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("conv_b"))
    val pA = col("conv_a").cast("double") / col("n_a")
    val pB = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    counts.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(pA, 6).as("rate_a"), round(pB, 6).as("rate_b"),
      round(pB - pA, 6).as("lift"),
      // a degenerate experiment (0% or 100% pooled conversion) has no
      // finite z — answer null, not a division error
      when(pooled > 0 && pooled < 1,
        round((pB - pA) / sqrt(pooled * (lit(1.0) - pooled)
          * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)).as("z"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next | prev) estimated from lag pairs under the
    * (ts, id) total order — the behavioral fingerprint behind funnel
    * design and bot detection (bots have near-deterministic rows).
    * Integer pair counts; probabilities are single divisions.
    * One user-keyed window shuffle + one pair-count shuffle.
    */
  /** Last-touch marketing attribution: each purchase's value is
    * credited to the user's most recent PRECEDING non-purchase event
    * type within `lookback` — the standard conversion-credit readout.
    *
    * The "most recent preceding" pick is a window max of
    * `struct(micros, event_id, type)` over non-purchase rows only
    * (struct ordering = lexicographic, so the latest (ts, id) wins
    * deterministically; conditional null rows are ignored by max).
    * The lookback is applied AFTER the pick: if the latest preceding
    * touch is stale, every earlier one is staler — so post-filtering
    * is exact, and the frame never needs a range bound. Values
    * accumulate in cents (exact integers); purchases with no live
    * touch credit 'none'.
    *
    * Two shuffles: the per-user ordered window and the final
    * per-type aggregation.
    */
  def lastTouchAttribution(events: DataFrame, convType: String = "purchase",
                           lookback: String = "7 days",
                           userCol: String = "user_id", tsCol: String = "ts",
                           typeCol: String = "event_type",
                           valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lookbackMicros = gapToMicros(lookback)
    val w = Window.partitionBy(userCol)
      .orderBy(unix_micros(col(tsCol)), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_touch", max(
        when(col(typeCol) =!= convType,
          struct(col("_us").as("us"), col("event_id").as("eid"),
            col(typeCol).as("ty")))).over(w))
    touched.filter(col(typeCol) === convType)
      .withColumn("_ty",
        when(col("_touch").isNotNull &&
          col("_us") - col("_touch.us") <= lookbackMicros,
          col("_touch.ty")).otherwise(lit("none")))
      .groupBy(col("_ty").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(toCentsCol(col(valueCol))).as("_cents"))
      .select(col("touch_type"), col("n_conversions"),
        round(col("_cents").cast("double") / 100, 2).as("attributed_value"))
      .orderBy("touch_type")
  }

  private def toCentsCol(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(v.cast("double") * 100).cast("long")

  /** RFM segmentation — the classic recency/frequency/monetary
    * customer scoring over conversion events. Per user: recency =
    * whole days from last conversion to observation end (integer),
    * frequency = conversion count, monetary = cents (exact). Scores
    * are quintiles (ntile) per dimension with user-id tie-break —
    * recency quintiles are taken on ASCENDING days-since so score 5
    * is "most recent", matching the marketing convention; f/m
    * quintiles are descending so 5 = best.
    *
    * Scores are assigned by `Ranks.ntileExact` — bit-identical to
    * the three `ntile(5) OVER (ORDER BY …, user_id)` windows, but
    * each one's ordered window runs over that measure's VALUE
    * DICTIONARY (days / counts / cents — tiny), with the per-value
    * tie-break rank partitioned by value. No single-reducer sort of
    * the user frame at any scale. Scores are LongType (oracle window
    * parity).
    */
  def rfm(events: DataFrame, convType: String = "purchase",
          userCol: String = "user_id", tsCol: String = "ts",
          typeCol: String = "event_type", valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = events.filter(col(typeCol) === convType)
    val horizon = conv.agg(max(unix_micros(col(tsCol))).as("obs_end"))
    val perUser = conv
      .groupBy(col(userCol).as("user_id"))
      .agg(max(unix_micros(col(tsCol))).as("_last"),
        count(lit(1)).as("frequency"),
        sum(round(col(valueCol).cast("double") * 100).cast("long")).as("_cents"))
      .crossJoin(broadcast(horizon))
      .select(col("user_id"),
        floor((col("obs_end") - col("_last")).cast("double") / 86400000000.0)
          .cast("long").as("recency_days"),
        col("frequency"), col("_cents"))
    val scored = Seq(("recency_days", true, "r_score"),
        ("frequency", false, "f_score"), ("_cents", false, "m_score"))
      .foldLeft(perUser) { case (acc, (v, desc, o)) =>
        graft.engine.Ranks.ntileExact(acc, 5, v, "user_id",
          valueDesc = desc, out = o)
      }
    scored
      .select(col("user_id"), col("recency_days"), col("frequency"),
        round(col("_cents").cast("double") / 100, 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"))
      .orderBy("user_id")
  }

  /** Daily-activity streaks per user (gaps-and-islands): consecutive
    * active DAYS collapse to islands via the classic `epoch_day −
    * row_number` constant — two window-free integer subtractions and
    * two aggregations, no self-join. Returns per user: active-day
    * count, number of streaks, and the longest streak — the
    * engagement-consistency readout.
    *
    * Shape: distinct (user, day) is the only corpus-sized shuffle;
    * the rank window partitions per user (parallel); islands and the
    * final rollup are user-keyed aggregations.
    */
  def activityStreaks(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
      .withColumn("dn", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val w = Window.partitionBy("user_id").orderBy("dn")
    val islands = ud
      .withColumn("isl", col("dn") - row_number().over(w))
      .groupBy("user_id", "isl").agg(count(lit(1)).as("len"))
    islands.groupBy("user_id")
      .agg(sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"))
      .orderBy("user_id")
  }

  /** DAU / trailing-7-day WAU / stickiness per day. Sliding DISTINCT
    * counts have no direct window form; the scalable shape is
    * contribution fan-out: each distinct (user, day) activity row
    * covers days d…d+6, so WAU(d) is a plain distinct count per
    * covered day — bounded 7× fan-out of the THIN (user, day) pair
    * stream, never a per-day re-scan. Days outside the observed
    * activity range are clipped so every emitted day has a real DAU.
    * stickiness = DAU/WAU, one exact division.
    */
  def dauWau(events: DataFrame, userCol: String = "user_id",
             tsCol: String = "ts"): DataFrame = {
    val ud = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(countDistinct("u").as("dau"))
    val wau = ud
      .select(col("u"), explode(sequence(lit(0), lit(6))).as("off"),
        col("day"))
      .select(col("u"), date_add(col("day"), col("off")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type", tsCol: String = "ts",
                       idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val rows = pairs.groupBy("prev_type").agg(sum("n").as("row_n"))
    pairs.join(broadcast(rows), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("row_n"), 6).as("p"))
  }

  /** Two-step transition probabilities P² — "where will this user be
    * two events from now": P²(i,j) = Σ_k P(i,k)·P(k,j) over the SAME
    * per-user (ts, event_id)-ordered pair counts as
    * [[transitionMatrix]]. Each product term is quantized to 1e9
    * units from exact BIGINT counts and summed exactly (the battery's
    * standard float-determinism pattern), so the matrix square is
    * engine-reproducible without materializing any per-user state.
    *
    * Scale: the transition dictionary is |types|² rows no matter the
    * event count — the squaring join and aggregation run on that
    * dictionary, so the only row-scale work is q156's single
    * window+count pass. `n_paths` counts the distinct middle states
    * carrying mass (a sanity check: sparse chains have few paths).
    */
  def transitionMatrix2(events: DataFrame, userCol: String = "user_id",
                        typeCol: String = "event_type", tsCol: String = "ts",
                        idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("i"), col(typeCol).as("j"))
      .agg(count(lit(1)).as("n"))
    val rows = pairs.groupBy("i").agg(sum("n").as("row_n"))
    val p = pairs.join(broadcast(rows), "i")
      .select(col("i"), col("j"), col("n"), col("row_n"))
    val a = p.select(col("i"), col("j").as("k"),
      col("n").as("na"), col("row_n").as("ra"))
    val b = p.select(col("i").as("k"), col("j"),
      col("n").as("nb"), col("row_n").as("rb"))
    a.join(b, Seq("k"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n_paths"),
        sum(round((col("na").cast("double") / col("ra")) *
          (col("nb").cast("double") / col("rb")) * lit(1e9)).cast("long"))
          .as("p2_u"))
      .select(col("i").as("prev_type"), col("j").as("next2_type"),
        col("n_paths"), (col("p2_u").cast("double") / 1e9).as("p2"))
      .orderBy("prev_type", "next2_type")
  }

  /** Streaming feed-freshness: the latest event time per type as a
    * Complete-mode max aggregate — the live half of
    * [[Profile.freshnessAudit]] (a max is the cheapest possible
    * streaming state: one timestamp per key, no windows, no
    * watermark needed in Complete mode). Formatted to the engine-
    * portable second string the batch oracle emits.
    */
  def freshness(events: DataFrame,
                typeCol: String = "event_type",
                tsCol: String = "ts"): DataFrame =
    events.groupBy(col(typeCol))
      .agg(max(col(tsCol)).as("last_ts"))
      .select(col(typeCol),
        date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss").as("last_seen"))

  /** Cohort LTV curves: users keyed by their FIRST-activity epoch
    * week; each (cohort_week, weeks_since) cell reports the active
    * users and exact-cents revenue, plus the running cumulative
    * revenue and the per-user LTV (cum cents / cohort size) — the
    * money view of q147's retention matrix. Integer weeks and exact
    * cents everywhere; the only double is the final rounded LTV.
    *
    * Scale: a user-keyed min (first activity), one broadcast back
    * onto the (user, week) rollup, a cell rollup, and a cumulative
    * window over weeks_since partitioned by cohort — the window runs
    * on the cohort×week dictionary.
    */
  def cohortLtv(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events
      .select(col(userCol).as("u"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
          .as("_day"),
        round(col(valueCol) * 100).cast("long").as("cents"))
      .select(col("u"), expr("_day div 7L").as("week"), col("cents"))
    val first = base.groupBy("u").agg(min("week").as("cohort_week"))
    val sized = first.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    val cells = base.join(first, "u")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week"))
        .as("weeks_since"))
      .agg(countDistinct("u").as("active_users"),
        sum("cents").as("rev_cents"))
    val w = Window.partitionBy("cohort_week").orderBy("weeks_since")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(broadcast(sized), "cohort_week")
      .withColumn("cum_cents", sum("rev_cents").over(w))
      .select(col("cohort_week"), col("weeks_since"), col("cohort_size"),
        col("active_users"), col("rev_cents"), col("cum_cents"),
        round(col("cum_cents").cast("double") / col("cohort_size") / 100.0,
          6).as("ltv_per_user"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** Point-in-time feature extraction — the feature-store backfill
    * join: for every anchor event (default: each purchase), count
    * the SAME user's events of each type in the `lookbackHours`
    * window strictly BEFORE the anchor (never at or after — the
    * leakage rule point-in-time correctness exists to enforce).
    * Output is one training row per anchor: identifiers, the label
    * value in exact cents, and one bounded-history count per type.
    *
    * Scale: an equi-join on the user key with the time bound as a
    * join-range filter — at 100 TB you additionally bucket both
    * sides by coarse time so a year of history never joins against
    * one day of anchors; the per-anchor cost is the user's events
    * inside the window, not their lifetime. Anchors with silent
    * histories survive via the left join.
    */
  def pitFeatures(events: DataFrame, targetType: String = "purchase",
                  lookbackHours: Int = 24,
                  types: Seq[String] =
                    Seq("click", "error", "purchase", "signup", "view"),
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts", idCol: String = "event_id",
                  valueCol: String = "value"): DataFrame = {
    require(lookbackHours >= 1, s"pitFeatures: lookbackHours >= 1")
    require(types.nonEmpty, "pitFeatures: need at least one feature type")
    val lookbackUs = lookbackHours.toLong * 3600L * 1000000L
    val anchors = events.filter(col(typeCol) === targetType)
      .select(col(idCol).as("anchor_id"), col(userCol).as("u"),
        unix_micros(col(tsCol)).as("a_us"),
        round(col(valueCol) * 100).cast("long").as("label_cents"))
    val hist = events.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("h_us"), col(typeCol).as("h_type"))
    val joined = anchors.join(hist,
      anchors("u") === hist("u") &&
        col("h_us") >= col("a_us") - lit(lookbackUs) &&
        col("h_us") < col("a_us"),
      "left")
    val aggs = types.map(t =>
      sum(when(col("h_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    joined.groupBy(col("anchor_id"), anchors("u").as("user_id"),
        col("a_us"), col("label_cents"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("a_us")
      .orderBy("anchor_id")
  }

  /** Cohort retention matrix: users grouped by their FIRST-activity
    * day; each (cohort_day, day_offset) cell counts distinct users of
    * that cohort active `day_offset` days later — the standard
    * engagement decay view, and for a data pipeline the
    * "does a source keep producing" view when keyed by source.
    *
    * Three shuffles, all user- or day-keyed: first-day min, distinct
    * (user, day) activity, and the cell count. Everything is
    * integer/date arithmetic — engine-exact.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val first = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val activity = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    activity.join(first, "u")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort"))
        .cast("long").as("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"))
  }

  case class RateEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  case class RateFlag(event_id: Long, user_id: Long, hour: String, seq: Long)

  /** Streaming twin of `rateLimitFlags`: per-(user, hour) counters in
    * flatMapGroupsWithState, flagging each event past the quota AS IT
    * ARRIVES. State per live key is ONE counter, evicted by
    * event-time timeout once the watermark passes the hour's end —
    * bounded by (active users × watermark horizon), the only shape
    * that survives an unbounded stream. Equals the batch operator
    * under in-order delivery (the replay/backfill contract;
    * StreamingSpec law) — a late event is sequenced by ARRIVAL within
    * its hour's counter, which is precisely what an online limiter
    * enforces.
    */
  def rateLimitStateful(events: Dataset[RateEvent], maxPerHour: Int,
                        watermark: String = "2 hours"): Dataset[RateFlag] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, micros(e.ts) / 3600000000L))
      .flatMapGroupsWithState[Long, RateFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((user, hourIdx), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.getOrElse(0L)
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            // built here, not captured: DateTimeFormatter is not
            // serializable
            val fmt = java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:00:00")
              .withZone(java.time.ZoneOffset.UTC)
            val hourStr = fmt.format(
              java.time.Instant.ofEpochMilli(hourIdx * 3600000L))
            val flagged = sorted.zipWithIndex.collect {
              case (e, i) if before + i + 1 > maxPerHour =>
                RateFlag(e.event_id, user, hourStr, before + i + 1)
            }
            state.update(before + sorted.size)
            // evict once the watermark passes this hour's end
            state.setTimeoutTimestamp((hourIdx + 1) * 3600000L)
            flagged.iterator
          }
      }
  }

  /** Top session paths — the most common event-type journeys per
    * session ("view>view>purchase"), the path-mining readout on top
    * of the q23 gaps-and-islands sessionization. Within-session
    * order is pinned by (ts, event_id), so the path string is
    * deterministic; session boundaries are the same ts−lag ≥ gap
    * rule the sessionize oracle uses. One user-keyed window pass,
    * one session aggregation, one path count + TakeOrdered.
    */
  def topSessionPaths(events: DataFrame, gapMinutes: Int = 5,
                      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapMinutes >= 1 && k >= 1, "topSessionPaths: gap/k must be >= 1")
    val wUser = Window.partitionBy("user_id").orderBy("ts")
    val m = events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("_lagm", unix_micros(lag("ts", 1).over(wUser)))
      .withColumn("_new", when(col("_lagm").isNull ||
        unix_micros(col("ts")) - col("_lagm") >= gapMinutes * 60000000L, 1)
        .otherwise(0))
      .withColumn("_sid", sum("_new").over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    m.groupBy("user_id", "_sid")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(k)
  }

  /** Peak concurrent sessions per day — the capacity-planning readout
    * ("how many users were on AT ONCE at the worst moment?") that a
    * plain per-day count can't answer. Sessions are the q23
    * gaps-and-islands islands; each is active over the half-open
    * interval [first event, last event + gap) — the same end rule
    * `session_window` uses. The classic sweep: +1 at each start, −1 at
    * each end, running sum, take the max.
    *
    * Scale design: a single global ordered sweep would serialize into
    * one task, so each session interval is first CLIPPED at day
    * boundaries (a session spans at most a handful of days at any
    * sane gap; the `sequence` fan-out is bounded by its day count).
    * The sweep then partitions BY DAY — embarrassingly parallel — and
    * a session alive at midnight is carried into the next day as a
    * +1 at 00:00 by its clip. Ties are ordered (t, delta) with −1 < +1,
    * so back-to-back sessions at the same microsecond don't double
    * count: ends settle before starts, in BOTH engines.
    */
  def peakConcurrency(events: DataFrame, gapMinutes: Int = 5,
                      userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapMinutes >= 1, "peakConcurrency: gapMinutes must be >= 1")
    val gapMicros = gapMinutes * 60000000L
    val dayMicros = 86400000000L
    val wUser = Window.partitionBy(userCol).orderBy(tsCol)
    val sess = events
      .withColumn("_lagm", unix_micros(lag(col(tsCol), 1).over(wUser)))
      .withColumn("_new", when(col("_lagm").isNull ||
        unix_micros(col(tsCol)) - col("_lagm") >= gapMicros, 1).otherwise(0))
      .withColumn("_sid", sum("_new").over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_sid"))
      .agg(min(unix_micros(col(tsCol))).as("lo"),
        (max(unix_micros(col(tsCol))) + gapMicros).as("hi"))
    // clip each [lo, hi) at day boundaries; fan-out = days spanned
    val clipped = sess
      .withColumn("day", explode(sequence(
        (col("lo") / dayMicros).cast("long"),
        ((col("hi") - 1) / dayMicros).cast("long"))))
      .select(col("day"),
        greatest(col("lo"), col("day") * dayMicros).as("cs"),
        least(col("hi"), (col("day") + 1) * dayMicros).as("ce"))
    val sweep = clipped.select(col("day"), col("cs").as("t"), lit(1).as("d"))
      .unionAll(clipped.select(col("day"), col("ce").as("t"),
        lit(-1).as("d")))
    val wDay = Window.partitionBy("day").orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweep.withColumn("run", sum("d").over(wDay))
      .groupBy("day")
      .agg(sum(when(col("d") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_sessions"),
        max("run").cast("long").as("peak"))
      .orderBy("day")
  }

  def rateLimitFlags(events: DataFrame, maxPerHour: Int,
                     userCol: String = "user_id", tsCol: String = "ts",
                     idCol: String = "event_id"): DataFrame = {
    require(maxPerHour >= 1, "rateLimitFlags: maxPerHour must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol), date_trunc("hour", col(tsCol)))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("seq", row_number().over(w).cast("long"))
      .filter(col("seq") > maxPerHour)
      .select(col(idCol), col(userCol),
        date_format(date_trunc("hour", col(tsCol)), "yyyy-MM-dd HH:00:00")
          .as("hour"),
        col("seq"))
  }
}
