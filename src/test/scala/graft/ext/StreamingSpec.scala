package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Streaming transforms must agree with their batch forms — the same
  * plan run through readStream/writeStream produces the same rows.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsPath = s"$sf001/events.parquet"

  test("streaming hourly agg matches the batch aggregation exactly") {
    val stream = Streaming.readEvents(spark, eventsPath)
    val q = Streaming.runToMemory(
      Streaming.hourlyAgg(stream), "hourly_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val got = spark.sql("SELECT * FROM hourly_out")
        .orderBy("hour", "event_type").collect()
      val want = Streaming.hourlyAgg(Tables.load(spark, sf001, "events"))
        .orderBy("hour", "event_type").collect()
      // watermark in append mode may hold back the final window(s);
      // everything emitted must match the batch result exactly
      assert(got.nonEmpty, "streaming query emitted nothing")
      val wantMap = want.map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
      got.foreach { r =>
        assert(wantMap((r.getString(0), r.getString(1))) === r.toSeq)
      }
    } finally q.stop()
  }

  test("hourlyAgg equals the q22 date_trunc formulation (oracle tie)") {
    // window("1 hour") and date_trunc("hour") must bucket identically —
    // this pins the streaming aggregate to the ORACLE-VERIFIED q22
    // shape, closing the batch-equivalence chain:
    // streaming hourlyAgg == batch hourlyAgg == q22 oracle
    val ev = Tables.load(spark, sf001, "events")
    val a = Streaming.hourlyAgg(ev)
      .orderBy("hour", "event_type").collect().map(_.toSeq)
    val b = ev
      .withColumn("hour",
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("enrichedHourly: stream-static join matches the batch form; unmatched keys drop") {
    // dim covers only EVEN user_ids — the inner join must drop odd
    // users' events identically in batch and stream
    val dim = Tables.load(spark, sf001, "events")
      .select(col("user_id")).distinct()
      .where(col("user_id") % 2 === 0)
      .withColumn("segment", concat(lit("g"), (col("user_id") % 3).cast("string")))
    val stream = Streaming.readEvents(spark, eventsPath)
    val q = Streaming.runToMemory(
      Streaming.enrichedHourly(stream, dim, "user_id", "segment"),
      "enrich_out", org.apache.spark.sql.streaming.OutputMode.Complete)
    try {
      val got = spark.sql("SELECT * FROM enrich_out")
        .orderBy("hour", "segment").collect().map(_.toSeq)
      val want = Streaming.enrichedHourly(
          Tables.load(spark, sf001, "events"), dim, "user_id", "segment")
        .orderBy("hour", "segment").collect().map(_.toSeq)
      assert(got.length === want.length)
      got.zip(want).foreach { case (x, y) => assert(x === y) }
      // and unmatched keys really were dropped, not nulled
      val odd = Tables.load(spark, sf001, "events")
        .where(col("user_id") % 2 === 1).count()
      val total = Tables.load(spark, sf001, "events").count()
      val kept = spark.sql("SELECT SUM(n) FROM enrich_out").head().getLong(0)
      assert(kept === total - odd)
    } finally q.stop()
  }

  test("streaming dedup: one survivor per duplicated key, none lost") {
    // duplicate every event (same id, same ts) through a re-delivery:
    // the deduped stream must emit each event_id exactly once
    val dir = java.nio.file.Files.createTempDirectory("dupstream").toFile
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(eventsPath)
    raw.union(raw).coalesce(1).write.mode("overwrite")
      .parquet(dir.getPath)
    val stream = Streaming.readEvents(spark, dir.getPath)
    val q = Streaming.runToMemory(
      Streaming.dedupStream(stream, Seq("event_id")), "dedup_out")
    try {
      val got = spark.sql("SELECT event_id FROM dedup_out")
        .groupBy("event_id").count().collect()
      val nEvents = raw.count()
      assert(got.length.toLong === nEvents, "every event id survives once")
      assert(got.forall(_.getLong(1) === 1L), "no id emitted twice")
    } finally q.stop()
  }

  test("batch sessionize: session boundaries respect the gap") {
    val sessions = Streaming.sessionize(Tables.load(spark, sf001, "events"), "5 minutes")
    val perUser = sessions.groupBy("user_id").agg(
      count(lit(1)).as("n_sessions"), sum("n_events").as("n_total"))
    val events = Tables.load(spark, sf001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    // every event lands in exactly one session
    val joined = perUser.join(events, "user_id")
      .filter(col("n_total") =!= col("n_events"))
    assert(joined.count() === 0)
    // sessions per user are non-overlapping in time
    val s = sessions.filter(col("user_id") === sessions.select("user_id").head().getLong(0))
      .orderBy("session_start").collect()
    s.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("session_end") <= b.getAs[String]("session_start"))
      case _ =>
    }
  }

  test("stream-stream interval join matches its batch form") {
    val batch = Streaming.purchaseSignupJoin(
      Tables.load(spark, sf001, "events"), "1 hour")
    val stream = Streaming.purchaseSignupJoin(
      Streaming.readEvents(spark, eventsPath), "1 hour")
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(stream, "ss_join")
    try {
      val got = spark.sql("SELECT COUNT(*) FROM ss_join").head().getLong(0)
      val want = batch.count()
      // append mode may withhold rows newer than the watermark; all
      // emitted rows must exist in the batch result
      assert(got > 0 && got <= want)
      val gotRows = spark.sql("SELECT user_id, p_ts, s_ts FROM ss_join")
        .collect().map(_.toSeq).toSet
      val wantRows = batch.select("user_id", "p_ts", "s_ts")
        .collect().map(_.toSeq).toSet
      assert(gotRows.subsetOf(wantRows))
    } finally q.stop()
  }

  test("streaming incremental dedup matches the batch shard-vs-index result") {
    // corpus → persisted-style index; the near-dup shard arrives as a
    // STREAM (file source, one shard); admitted docs must equal the
    // batch operator's admit set
    val docs = Tables.load(spark, sf001, "documents")
    val shard = docs.filter($"doc_id" % 10 === 7)
    val corpus = docs.filter($"doc_id" % 10 =!= 7)
    val index = Dedup.buildLshIndex(corpus, n = 3, k = 32, bands = 8)

    val shardDir = java.nio.file.Files.createTempDirectory("shardstream").toString
    shard.coalesce(1).write.mode("overwrite").parquet(shardDir)
    val stream = spark.readStream.schema(shard.schema).parquet(shardDir)
    assert(stream.isStreaming)

    val admitted = scala.collection.mutable.Set.empty[Long]
    val q = Streaming.incrementalDedupStream(stream, index,
      (kept, _) => admitted ++= kept.select("doc_id").as[Long].collect())
    try {
      val batchPairs = Dedup.dedupAgainstIndex(shard, index, n = 3, k = 32,
        bands = 8, minJaccard = 0.5)
      val want = Dedup.applyIncrementalDedup(shard, batchPairs)
        .select("doc_id").as[Long].collect().toSet
      assert(admitted.toSet === want)
      // and something was actually deduped (planted cross-split dups)
      assert(admitted.size < shard.count())
    } finally q.stop()
  }

  /** Write the events table as `chunks` time-ordered parquet files
    * with BOUNDED DISORDER: the last `lateK` events (by ts) of each
    * chunk are delivered one file LATE. File mtimes are pinned
    * ascending so the file source (maxFilesPerTrigger=1) replays them
    * as distinct micro-batches in order — each moved row then arrives
    * a micro-batch after its time-neighbors, intermixed with strictly
    * later data, but always ABOVE the watermark (it carries the
    * chunk's largest timestamps, and the watermark trails the
    * delivered max by the 10-minute horizon), so nothing may be
    * dropped and streaming must equal batch exactly on sealed
    * windows. Moving the chunk TAIL (not a fixed boundary window)
    * makes the late count density-independent — this events table
    * averages one event per 43 minutes, so any fixed few-minute
    * boundary window would usually be empty. Returns
    * (streamDir, batchFrame, nLate).
    */
  private def writeOutOfOrderChunks(chunks: Int = 3, lateK: Int = 5):
      (String, org.apache.spark.sql.DataFrame, Long) = {
    val ev = Tables.load(spark, sf001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val (t0, t1) = {
      val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val span = (t1 - t0) / chunks + 1
    val byTsDesc = org.apache.spark.sql.expressions.Window
      .partitionBy("_chunk").orderBy(col("ts").desc)
    val tagged = ev
      .withColumn("_chunk", ((unix_micros(col("ts")) - t0) / span).cast("int"))
      .withColumn("_late",
        col("_chunk") < chunks - 1 && row_number().over(byTsDesc) <= lateK)
      .withColumn("_file", col("_chunk") + when(col("_late"), 1).otherwise(0))
      .cache()
    val nLate = tagged.filter(col("_late")).count()
    val dir = java.nio.file.Files.createTempDirectory("oochunks").toFile
    (0 until chunks).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory(s"chunk$i").toString
      tagged.filter(col("_file") === i)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    (dir.getPath, ev, nLate)
  }

  private def readChunkStream(dir: String, batch: org.apache.spark.sql.DataFrame) =
    spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  test("hourly agg under out-of-order multi-batch delivery: nothing dropped") {
    val (dir, batch, nLate) = writeOutOfOrderChunks()
    assert(nLate > 0, "test setup must actually deliver late rows")
    val stream = readChunkStream(dir, batch)
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(Streaming.hourlyAgg(stream), "oo_hourly",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val got = spark.sql("SELECT * FROM oo_hourly").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
      val want = Streaming.hourlyAgg(batch).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
      assert(got.nonEmpty)
      // every emitted window matches batch EXACTLY — late rows within
      // the watermark horizon were aggregated, not dropped (a dropped
      // row shows up as a count/total mismatch)
      got.foreach { case (k, row) => assert(want(k) === row, s"window $k") }
      // and emission is near-complete: only windows the final
      // watermark never sealed may be withheld
      assert(got.size >= want.size - 2,
        s"only ${got.size}/${want.size} windows emitted")
    } finally q.stop()
  }

  test("stateful sessionize: batch twin equals the declarative session_window form") {
    val ev = Tables.load(spark, sf001, "events")
      .select($"user_id", $"ts", $"value").as[Streaming.SessEvent]
    val got = Streaming.sessionizeStatefulBatch(ev, "5 minutes").toDF()
      .orderBy("user_id", "session_start").collect().map(_.toSeq)
    val want = Streaming.sessionize(Tables.load(spark, sf001, "events"), "5 minutes")
      .orderBy("user_id", "session_start").collect().map(_.toSeq)
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("stateful sessionize stream under out-of-order delivery matches batch") {
    val (dir, batch, nLate) = writeOutOfOrderChunks()
    assert(nLate > 0)
    val stream = readChunkStream(dir, batch)
      .select($"user_id", $"ts", $"value").as[Streaming.SessEvent]
    val q = Streaming.runToMemory(
      Streaming.sessionizeStateful(stream, "5 minutes", "10 minutes").toDF(),
      "oo_sessions",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val got = spark.sql("SELECT * FROM oo_sessions").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.toSeq).toMap
      val want = Streaming.sessionize(batch, "5 minutes").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.toSeq).toMap
      assert(got.nonEmpty, "no sessions emitted")
      // two-sided on the sealed region: every emitted session is a
      // batch session verbatim (same end, count, cent-exact total) —
      // a late row mis-merged or dropped breaks this —
      got.foreach { case (k, row) => assert(want(k) === row, s"session $k") }
      // — and every batch session sealed by the final watermark was
      // emitted (watermark = max ts − 10 min; sessions end at
      // last + 5 min, so only sessions in the last ~15 min may wait)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      val maxTs = batch.agg(max(unix_micros($"ts"))).head().getLong(0)
      val cutoff = fmt.format(java.time.Instant.ofEpochSecond(
        maxTs / 1000000L - 16 * 60))
      val sealedSessions = want.filter { case ((_, _), row) =>
        row(2).asInstanceOf[String] < cutoff
      }
      sealedSessions.keys.foreach(k =>
        assert(got.contains(k), s"sealed session $k not emitted"))
      assert(sealedSessions.nonEmpty)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals on a real multi-batch stream") {
    val (dir, batch, _) = writeOutOfOrderChunks()
    val stream = readChunkStream(dir, batch)
      .select($"user_id", $"event_type", $"value").as[Streaming.UserEvent]
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(
      Streaming.runningTotals(stream, idleTimeout = None).toDF(),
      "oo_totals", org.apache.spark.sql.streaming.OutputMode.Update)
    try {
      // update mode emits one snapshot per (user, micro-batch); the
      // snapshot with the highest n is the final state — it must equal
      // the all-data batch aggregate, proving state carried across
      // micro-batches
      val finals = spark.sql("SELECT * FROM oo_totals").collect()
        .groupBy(_.getLong(0))
        .map { case (u, rows) => u -> rows.maxBy(_.getLong(1)) }
      val want = batch.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(finals.keySet === want.keySet)
      finals.foreach { case (u, s) =>
        assert(s.getLong(1) === want(u).getAs[Long]("n"), s"user $u count")
        assert(math.abs(s.getDouble(2) - want(u).getAs[Double]("total")) < 1e-6,
          s"user $u total")
      }
    } finally q.stop()
  }

  test("mapGroupsWithState running totals match a plain aggregation") {
    val ds = Tables.load(spark, sf001, "events")
      .select($"user_id", $"event_type", $"value")
      .as[Streaming.UserEvent]
    val got = Streaming.runningTotals(ds).collect()
      .map(s => s.user_id -> s).toMap
    val want = Tables.load(spark, sf001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("total"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (u, s) =>
      assert(s.n === want(u).getAs[Long]("n"))
      assert(math.abs(s.total - want(u).getAs[Double]("total")) < 1e-6)
    }
  }

  test("runningTotals evicts state on ProcessingTime timeout") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // a timed-out invocation: existing state, no rows
    val timedOut = TestGroupState.create[Streaming.UserState](
      Optional.of(Streaming.UserState(3L, 7.5)),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], true)
    val out = Streaming.runningTotalsFn(Some("1 hour"))(
      42L, Iterator.empty, timedOut)
    assert(out === Streaming.UserSnapshot(42L, 3L, 7.5),
      "eviction must emit the state once as a final snapshot")
    assert(timedOut.isRemoved, "timed-out state must be removed")
    assert(!timedOut.getTimeoutTimestampMs.isPresent,
      "eviction must not re-arm the timeout")

    // the live path still updates and arms the timer
    val live = TestGroupState.create[Streaming.UserState](
      Optional.of(Streaming.UserState(3L, 7.5)),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], false)
    val out2 = Streaming.runningTotalsFn(Some("1 hour"))(
      42L, Iterator(Streaming.UserEvent(42L, "purchase", 2.5)), live)
    assert(out2 === Streaming.UserSnapshot(42L, 4L, 10.0))
    assert(live.isUpdated && !live.isRemoved)
    assert(live.getTimeoutTimestampMs.isPresent,
      "live path must re-arm the idle timeout")
  }

  test("funnel: strict ordering, first-anchor semantics, gap window") {
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      // user 1: full funnel in order
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: click BEFORE the first view → doesn't count; later
      // click does; no purchase
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(7), "click"),
      // user 3: purchase before click → stage stalls at click
      (3L, ts(0), "view"), (3L, ts(1), "purchase"), (3L, ts(2), "click"),
      // user 4: click outside the 10-minute gap window
      (4L, ts(0), "view"), (4L, ts(30), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Streaming.funnel(ev, Seq("view", "click", "purchase"),
      maxGap = Some("10 minutes"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("stage"),
          (0 to 2).map(i => Option(r.get(r.fieldIndex(s"t$i")))).toSeq)).toMap
    assert(out(1L)._1 === 3L)
    assert(out(2L)._1 === 2L)          // the pre-view click is ignored
    assert(out(3L)._1 === 2L)          // purchase must follow click
    assert(out(4L)._1 === 1L)          // gap window binds
    // user 2's click timestamp is the LATER one (strictly after view)
    assert(out(2L)._2(1).get.asInstanceOf[Long] ===
      ts(7).getTime * 1000L)
  }

  test("funnel: single shuffle plan (one aggregate, no join)") {
    import java.sql.Timestamp
    val ev = Seq((1L, new Timestamp(0L), "view")).toDF("user_id", "ts", "event_type")
    val plan = Streaming.funnel(ev, Seq("view", "click"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }

  test("rateLimitFlags: quota per user-hour, hour boundaries reset the count") {
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      (10L, 1L, t(0)), (11L, 1L, t(5)), (12L, 1L, t(10)), (13L, 1L, t(15)),
      (14L, 1L, t(70)),                   // next hour: count resets
      (20L, 2L, t(0)), (21L, 2L, t(1))    // under quota
    ).toDF("event_id", "user_id", "ts")
    val flagged = Streaming.rateLimitFlags(ev, maxPerHour = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // user 1, hour 0: events 12 (seq 3) and 13 (seq 4) exceed quota 2
    assert(flagged.toSet === Set((12L, 3L), (13L, 4L)))
  }

  test("abLift: arms partition users; degenerate experiment answers null z") {
    import java.sql.Timestamp
    val ev = (1L to 40L).flatMap { u =>
      val t = new Timestamp(u * 1000L)
      Seq((u, "view", t)) ++
        (if (u % 3 == 0) Seq((u, "purchase", t)) else Nil)
    }.toDF("user_id", "event_type", "ts")
    val r = graft.ext.Streaming.abLift(ev, convType = "purchase").head()
    val (na, nb) = (r.getLong(0), r.getLong(2))
    assert(na + nb === 40L)
    assert(r.getLong(1) + r.getLong(3) === 13L) // 13 users with u % 3 == 0
    assert(r.getAs[Double]("lift") ===
      graft.ext.Streaming.abLift(ev, convType = "purchase").head()
        .getAs[Double]("lift")) // hash arms → replayable
    // every user "converts" on view → pooled rate 1.0 → z must be null
    val degen = graft.ext.Streaming.abLift(ev, convType = "view").head()
    assert(degen.isNullAt(degen.fieldIndex("z")))
  }

  test("transitionMatrix: hand sequence counts and row-normalized probs") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    // user 1: A B A B → A→B ×2, B→A ×1; user 2: A C → A→C ×1
    val ev = Seq(
      (1L, 1L, "A", t(0)), (2L, 1L, "B", t(1)),
      (3L, 1L, "A", t(2)), (4L, 1L, "B", t(3)),
      (5L, 2L, "A", t(0)), (6L, 2L, "C", t(1)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val m = graft.ext.Streaming.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("p"))).toMap
    assert(m(("A", "B")) === ((2L, 0.666667))) // round(2/3, 6)
    assert(m(("A", "C"))._1 === 1L)
    assert(m(("B", "A")) === ((1L, 1.0)))
    assert(m.size === 3)
  }

  test("transitionMatrix2: matrix square of the hand chain, quantized terms") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    // same chain as above: P(A,B)=2/3, P(A,C)=1/3, P(B,A)=1
    // P²(A,A) = P(A,B)·P(B,A) = 2/3; P²(B,B) = P(B,A)·P(A,B) = 2/3;
    // P²(B,C) = 1·1/3; P²(A,·) has no path through C (absorbing)
    val ev = Seq(
      (1L, 1L, "A", t(0)), (2L, 1L, "B", t(1)),
      (3L, 1L, "A", t(2)), (4L, 1L, "B", t(3)),
      (5L, 2L, "A", t(0)), (6L, 2L, "C", t(1)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val m = graft.ext.Streaming.transitionMatrix2(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("p2"))).toMap
    assert(m.keySet === Set(("A", "A"), ("B", "B"), ("B", "C")))
    assert(math.abs(m(("A", "A"))._2 - 2.0 / 3) < 1e-6)
    assert(m(("A", "A"))._1 === 1L) // one middle state (B)
    assert(math.abs(m(("B", "B"))._2 - 2.0 / 3) < 1e-6)
    assert(math.abs(m(("B", "C"))._2 - 1.0 / 3) < 1e-6)
  }

  test("freshness: batch twin reports the exact latest second per type") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, "a", new Timestamp(1000L)), (2L, "a", new Timestamp(61000L)),
      (3L, "b", new Timestamp(2000L)))
      .toDF("event_id", "event_type", "ts")
    val out = graft.ext.Streaming.freshness(ev).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") === "1970-01-01 00:01:01")
    assert(out("b") === "1970-01-01 00:00:02")
  }

  test("cohortLtv: hand cohort accumulates exact cents and per-user LTV") {
    import java.sql.Timestamp
    def t(week: Int) = new Timestamp(week.toLong * 7 * 86400000L)
    // cohort week0 = {a, b}; a spends 1.00 (w0) + 2.00 (w1); b 0.50 (w0)
    val ev = Seq(
      (1L, "a", t(0), 1.0), (2L, "a", t(1), 2.0), (3L, "b", t(0), 0.5))
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.ext.Streaming.cohortLtv(ev).collect()
      .map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("weeks_since")) -> r).toMap
    assert(out.keySet === Set((0L, 0L), (0L, 1L)))
    val w0 = out((0L, 0L))
    assert(w0.getAs[Long]("cohort_size") === 2L)
    assert(w0.getAs[Long]("active_users") === 2L)
    assert(w0.getAs[Long]("rev_cents") === 150L)
    assert(w0.getAs[Double]("ltv_per_user") === 0.75)
    val w1 = out((0L, 1L))
    assert(w1.getAs[Long]("active_users") === 1L)
    assert(w1.getAs[Long]("cum_cents") === 350L)
    assert(w1.getAs[Double]("ltv_per_user") === 1.75)
  }

  test("pitFeatures: strict 24h lookback, same-time excluded, empty history zeros") {
    import java.sql.Timestamp
    def t(hour: Long) = new Timestamp(hour * 3600 * 1000L)
    val ev = Seq(
      (1L, 1L, "click", t(99), 0.0),     // 1h before anchor → counted
      (2L, 1L, "click", t(75), 0.0),     // 25h before → outside window
      (3L, 1L, "view", t(100), 0.0),     // same instant → NOT counted
      (4L, 1L, "purchase", t(100), 9.5), // the anchor
      (5L, 1L, "signup", t(77), 0.0),    // 23h before → counted
      (6L, 2L, "purchase", t(0), 3.0))   // anchor with no history
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = graft.ext.Streaming.pitFeatures(ev).collect()
      .map(r => r.getAs[Long]("anchor_id") -> r).toMap
    assert(out.keySet === Set(4L, 6L))
    val a = out(4L)
    assert(a.getAs[Long]("label_cents") === 950L)
    assert(a.getAs[Long]("n_click") === 1L)
    assert(a.getAs[Long]("n_signup") === 1L)
    assert(a.getAs[Long]("n_view") === 0L)
    assert(a.getAs[Long]("n_purchase") === 0L) // anchor itself excluded
    val b = out(6L)
    assert(b.getAs[Long]("label_cents") === 300L)
    assert(Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
      .forall(c => b.getAs[Long](c) === 0L))
  }

  test("transitionMatrix2: two-hop mass from a state sums to ≤ 1") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val ev = (0 until 40).map { i =>
      (i.toLong, (i % 4).toLong, Seq("A", "B", "C")(i % 3), t(i.toLong))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val rowsSum = graft.ext.Streaming.transitionMatrix2(ev).collect()
      .groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getAs[Double]("p2")).sum }
    rowsSum.foreach(s => assert(s <= 1.0 + 1e-6 && s > 0.0, s.toString))
  }

  test("interArrivalStats: nearest-rank median/p95 over hand gaps") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    // user 1 gaps: [10 s, 10 s, 80 s]; user 2: single event → no gaps
    val ev = Seq(
      (1L, 1L, t(0)), (2L, 1L, t(10)), (3L, 1L, t(20)), (4L, 1L, t(100)),
      (5L, 2L, t(0)))
      .toDF("event_id", "user_id", "ts")
    val r = graft.ext.Streaming.interArrivalStats(ev).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) === 3L)
    // median = ceil(0.5·3) = 2nd smallest = 10 s; p95 = ceil(2.85) = 3rd = 80 s
    assert(r(1L).getLong(2) === 10000000L)
    assert(r(1L).getLong(3) === 80000000L)
    assert(!r.contains(2L))
  }

  test("cohortRetention: hand-checked matrix, repeat same-day activity collapses") {
    import java.sql.Timestamp
    def d(day: Int, hour: Int = 1) =
      new Timestamp((day * 86400L + hour * 3600L) * 1000L)
    val ev = Seq(
      (1L, d(0)), (1L, d(0, 5)), (1L, d(1)), (1L, d(3)),  // cohort day0
      (2L, d(0)), (2L, d(1)),                             // cohort day0
      (3L, d(1)), (3L, d(2))                              // cohort day1
    ).toDF("user_id", "ts")
    val m = graft.ext.Streaming.cohortRetention(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m(("1970-01-01", 0L)) === 2L) // users 1 and 2 (dup hours collapse)
    assert(m(("1970-01-01", 1L)) === 2L)
    assert(m(("1970-01-01", 3L)) === 1L)
    assert(m(("1970-01-02", 0L)) === 1L)
    assert(m(("1970-01-02", 1L)) === 1L)
    assert(m.size === 5)
  }

  test("streaming rate limit equals the batch audit under in-order delivery") {
    // lateK = 0 → chronological chunks (the replay/backfill contract)
    val (dir, batch, _) = writeOutOfOrderChunks(lateK = 0)
    val stream = readChunkStream(dir, batch)
      .select($"event_id", $"user_id", $"ts").as[Streaming.RateEvent]
    val q = Streaming.runToMemory(
      Streaming.rateLimitStateful(stream, maxPerHour = 1).toDF(),
      "rate_flags",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
      val got = spark.sql("SELECT * FROM rate_flags").collect().map(key).toSet
      val want = Streaming.rateLimitFlags(batch, maxPerHour = 1)
        .collect().map(key).toSet
      assert(want.nonEmpty, "fixture produced no over-quota events")
      assert(got === want)
    } finally q.stop()
  }

  test("volumeSpikes: flags the planted burst hour, flat series is silent") {
    import java.sql.Timestamp
    // 24 hourly buckets of 6 events; hour 12 carries 30 (5× the MA)
    val ev = (0 until 24).flatMap { h =>
      val n = if (h == 12) 30 else 6
      (0 until n).map(i => ("a", new Timestamp((h * 3600L + i) * 1000L)))
    }.toDF("event_type", "ts")
    val spikes = graft.ext.Profile.volumeSpikes(ev, "event_type", "ts")
      .collect()
    assert(spikes.length === 1)
    assert(spikes.head.getAs[Long]("n") === 30L)
    assert(spikes.head.getAs[String]("hour").endsWith("12:00:00"))
    val flat = (0 until 24).flatMap(h =>
      (0 until 6).map(i => ("a", new Timestamp((h * 3600L + i) * 1000L))))
      .toDF("event_type", "ts")
    assert(graft.ext.Profile.volumeSpikes(flat, "event_type", "ts").isEmpty)
  }

  test("lastTouchAttribution: credits latest in-window touch, staleness → none") {
    import java.sql.Timestamp
    def ts(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-05-$day%02d $hour%02d:00:00")
    val ev = Seq(
      // u1: view then click then purchase → click credited
      (1L, 10L, ts(1, 9), "view", 0.0),
      (2L, 10L, ts(1, 10), "click", 0.0),
      (3L, 10L, ts(1, 11), "purchase", 25.5),
      // u2: click 8 days before purchase → stale → none
      (4L, 20L, ts(1, 9), "click", 0.0),
      (5L, 20L, ts(9, 10), "purchase", 10.0),
      // u3: purchase with no preceding events at all → none
      (6L, 30L, ts(2, 9), "purchase", 4.5),
      // u4: two purchases after one view → both credited to view
      (7L, 40L, ts(3, 9), "view", 0.0),
      (8L, 40L, ts(3, 10), "purchase", 1.0),
      (9L, 40L, ts(3, 11), "purchase", 2.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.ext.Streaming.lastTouchAttribution(ev, "purchase", "7 days")
      .collect().map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_conversions"), r.getAs[Double]("attributed_value")))
      .toMap
    assert(out("click") === ((1L, 25.5)))
    assert(out("none") === ((2L, 14.5)))
    assert(out("view") === ((2L, 3.0)))
    // every purchase is attributed exactly once
    assert(out.values.map(_._1).sum === 5L)
  }

  test("rfm: hand-ranked users get the expected quintiles; cents exact") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-06-$day%02d 12:00:00")
    // user u: last purchase day = u*5, frequency = u, spend = u*10.10
    val ev = (1L to 5L).flatMap { u =>
      (1L to u).map(k =>
        (u * 100 + k, u, ts((u * 5).toInt), "purchase", 10.10))
    } :+ ((999L, 3L, ts(1), "view", 500.0)) // non-purchase: ignored
    val out = graft.ext.Streaming.rfm(
        ev.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.size === 5)
    // user 5: most recent, most frequent, biggest spender → (5,5,5)
    val u5 = out(5L)
    assert(u5.getAs[Long]("r_score") === 5L &&
      u5.getAs[Long]("f_score") === 5L && u5.getAs[Long]("m_score") === 5L)
    val u1 = out(1L)
    assert(u1.getAs[Long]("r_score") === 1L &&
      u1.getAs[Long]("f_score") === 1L && u1.getAs[Long]("m_score") === 1L)
    // cents-exact monetary: 3 purchases of 10.10 = 30.30 exactly
    assert(out(3L).getAs[Double]("monetary") === 30.30)
    // recency is whole days from obs end (user 5's last = obs end)
    assert(u5.getAs[Long]("recency_days") === 0L)
    assert(u1.getAs[Long]("recency_days") === 20L)
  }

  test("activityStreaks: hand islands — gaps split, repeats collapse") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int = 9) =
      Timestamp.valueOf(f"2024-08-$day%02d $h%02d:00:00")
    // u1: days 1,2,3, 5,6, 9 → streaks (3,2,1); two events on day 2
    // must not double-count; u2: single day
    val ev = (Seq(1, 2, 2, 3, 5, 6, 9).map(d => (1L, ts(d))) :+
      ((1L, ts(2, 15))) :+ ((2L, ts(4)))).toDF("user_id", "ts")
    val out = graft.ext.Streaming.activityStreaks(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getAs[Long]("n_active_days") === 6L)
    assert(u1.getAs[Long]("n_streaks") === 3L)
    assert(u1.getAs[Long]("longest_streak") === 3L)
    val u2 = out(2L)
    assert(u2.getAs[Long]("n_active_days") === 1L &&
      u2.getAs[Long]("longest_streak") === 1L)
  }

  test("dauWau: hand coverage — WAU counts trailing-7-day distinct users") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-08-$day%02d 09:00:00")
    // u1 active day 1; u2 active day 5; u3 active days 1 and 5
    val ev = Seq((1L, ts(1)), (2L, ts(5)), (3L, ts(1)), (3L, ts(5)))
      .toDF("user_id", "ts")
    val out = graft.ext.Streaming.dauWau(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    // only observed-activity days are emitted
    assert(out.keySet === Set("2024-08-01", "2024-08-05"))
    val d1 = out("2024-08-01")
    assert(d1.getAs[Long]("dau") === 2L && d1.getAs[Long]("wau") === 2L)
    assert(d1.getAs[Double]("stickiness") === 1.0)
    // day 5's trailing week covers day 1's users too → WAU = 3
    val d5 = out("2024-08-05")
    assert(d5.getAs[Long]("dau") === 2L && d5.getAs[Long]("wau") === 3L)
  }

  test("streaming DAU (dedup + Complete count) equals the batch distinct count") {
    val stream = Streaming.readEvents(spark, eventsPath)
      .select(col("user_id"), to_date(col("ts")).as("_day"))
      .dropDuplicates("user_id", "_day")
      .groupBy("_day").agg(count(lit(1)).as("dau"))
    val q = Streaming.runToMemory(stream, "spec_dau",
      org.apache.spark.sql.streaming.OutputMode.Complete)
    try {
      val got = spark.table("spec_dau").collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val want = Tables.load(spark, sf001, "events")
        .groupBy(to_date(col("ts")).as("_day"))
        .agg(countDistinct("user_id").as("dau"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("topSessionPaths: gap splits sessions; order pinned by (ts, event_id)") {
    import java.sql.Timestamp
    def at(min: Int, sec: Int = 0) =
      Timestamp.valueOf(f"2024-05-01 09:$min%02d:$sec%02d")
    val ev = Seq(
      // u1 session 1: view > click (1 min apart)
      (1L, 1L, at(0), "view", 0.0), (2L, 1L, at(1), "click", 0.0),
      // ≥5 min gap → u1 session 2: purchase alone
      (3L, 1L, at(7), "purchase", 1.0),
      // u2: same-second events ordered by event_id: a(4) before b(5)
      (5L, 2L, at(0), "b_second", 0.0), (4L, 2L, at(0), "a_first", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.ext.Streaming.topSessionPaths(ev, gapMinutes = 5, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("view>click" -> 1L, "purchase" -> 1L,
      "a_first>b_second" -> 1L))
  }

  test("lastTouchAttribution: same-timestamp tie resolves by event_id order") {
    import java.sql.Timestamp
    def t0 = Timestamp.valueOf("2024-05-01 09:00:00")
    val ev = Seq(
      (1L, 1L, t0, "view", 0.0),
      (2L, 1L, t0, "click", 0.0),   // same ts, larger id → the latest touch
      (3L, 1L, t0, "purchase", 8.0) // same ts, preceding ids are touches
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.ext.Streaming.lastTouchAttribution(ev, "purchase", "7 days")
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("touch_type") === "click")
  }

  test("peakConcurrency: overlap counts, disjoint doesn't, ends settle first") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s"2024-05-01 $s")
    // u1: 09:00–09:02 (+5 min gap → active to 09:07)
    // u2: 09:04 single event      → active 09:04–09:09 (overlaps u1)
    // u3: 09:30 single event      → active 09:30–09:35 (disjoint)
    // u4: 09:09:00 single event   → starts EXACTLY when u2 ends:
    //     the −1 settles before the +1, so peak stays 2, not 3
    val ev = Seq(
      (1L, t("09:00:00")), (1L, t("09:02:00")),
      (2L, t("09:04:00")),
      (3L, t("09:30:00")),
      (4L, t("09:09:00"))
    ).toDF("user_id", "ts")
    val out = Streaming.peakConcurrency(ev).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_sessions") === 4L)
    assert(out.head.getAs[Long]("peak") === 2L)
  }

  test("peakConcurrency: a session alive at midnight counts in both days") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-05-01 23:58:00")), // active to 00:03
      (2L, Timestamp.valueOf("2024-05-02 00:01:00"))  // overlaps it on day 2
    ).toDF("user_id", "ts")
    val out = Streaming.peakConcurrency(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val day1 = 19844L // 2024-05-01 epoch days (UTC session timezone)
    assert(out.toSeq === Seq((day1, 1L, 1L), (day1 + 1, 2L, 2L)))
  }

  test("runningTotalsEventTtl: event-time TTL evicts idle state, emits ONE tombstone") {
    import java.sql.Timestamp
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    // chunk 0: user 1 (last event min 10 → TTL timer at min 70);
    // chunk 1: user 2 at min 180 advances the watermark past the timer;
    // chunk 2: forces the batch in which the timeout deterministically
    // fires (eviction law must not depend on a trailing no-data batch)
    val chunks = Seq(
      Seq((1L, ts(0), 1.00), (1L, ts(10), 2.50)),
      Seq((2L, ts(180), 5.00)),
      Seq((2L, ts(181), 0.25)))
    val dir = java.nio.file.Files.createTempDirectory("ttlchunks").toFile
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"ttl$i").toString
      rows.toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"c_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val schema = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getPath)
      .as[Streaming.TtlEvent]
    val q = Streaming.runToMemory(
      Streaming.runningTotalsEventTtl(stream, ttl = "1 hour").toDF(),
      "ttl_totals", org.apache.spark.sql.streaming.OutputMode.Update)
    try {
      val rows = spark.table("ttl_totals").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      // exactly one eviction, carrying user 1's final exact totals
      assert(rows.filter(_._4).toSeq === Seq((1L, 2L, 350L, true)))
      // user 2 lives on with both events accumulated
      assert(rows.filter(r => r._1 == 2L && !r._4).map(_._3).max === 525L)
      // and the state store actually shrank to the one live key
      val lastState = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators(0)
      assert(lastState.numRowsTotal === 1L,
        s"state rows after eviction: ${lastState.numRowsTotal}")
    } finally q.stop()
  }

  test("streaming manifest accumulates across micro-batches to the batch fingerprint") {
    // XOR multiset hashing is incremental BY CONSTRUCTION — pin it on
    // a real multi-batch replay: 3 file chunks, maxFilesPerTrigger=1,
    // Complete-mode agg; the final digests must equal the one-shot
    // batch manifest exactly
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("manifchunks").toFile
    for (i <- 0 until 3) {
      val tmp = java.nio.file.Files.createTempDirectory(s"mc$i").toString
      docs.filter(col("doc_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getPath)
    val agg = stream.select(
        pmod(col("doc_id"), lit(16L)).as("shard"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          md5(col("text")))), 1, 15), 16, 10).cast("long").as("leaf"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(leaf)").as("digest"))
    val q = Streaming.runToMemory(agg, "manif_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete)
    try {
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "expected >= 3 data micro-batches")
      val got = spark.table("manif_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = graft.ext.Corpus.fingerprintManifest(docs, shards = 16)
        .filter(col("shard") >= 0).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === want)
    } finally q.stop()
  }

  test("IdempotentParquetSink: exactly-once under epoch retries and torn writes") {
    val (dir, batch, _) = writeOutOfOrderChunks()
    val out = java.nio.file.Files.createTempDirectory("idemsink").toString
    val sink = new Streaming.IdempotentParquetSink(out)
    val q = readChunkStream(dir, batch).writeStream
      .foreachBatch(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val n0 = sink.read(spark).count()
    assert(n0 === batch.count(), "committed batches must cover the stream")
    val nBatches = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("_committed_"))
    assert(nBatches >= 3, s"expected >= 3 epochs, got $nBatches")
    // AT-LEAST-once retry of a COMMITTED epoch (same batchId, even
    // different data): the marker makes it a no-op — no duplicates
    sink.apply(batch.limit(3), 0L)
    assert(sink.read(spark).count() === n0, "retry of committed epoch duplicated rows")
    // torn write: epoch 0's marker lost mid-failure — the retry
    // overwrites the partial data and commits cleanly, still exactly once
    val b0 = spark.read.parquet(s"$out/batch_0").localCheckpoint(true)
    assert(!new java.io.File(out, "_committed_0").exists() ||
      new java.io.File(out, "_committed_0").delete())
    sink.apply(b0, 0L)
    assert(new java.io.File(out, "_committed_0").exists(), "recommit marker missing")
    assert(sink.read(spark).count() === n0, "torn-write recovery changed totals")
  }

  test("watermark drop law across restart: the checkpoint-persisted " +
    "watermark drops a beyond-horizon late row, and the state store " +
    "reports it (numRowsDroppedByWatermark)") {
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // run 1: a full hour of on-time data; run 2 (restart from the
    // checkpoint): one row two hours older than the delivered max —
    // far beyond the 10-minute horizon — plus an on-time row.
    // Two RUNS, not two files: within a single AvailableNow run the
    // file source pre-plans every micro-batch against the START
    // watermark, so an intra-run late file is NOT dropped (measured);
    // the durable guarantee is the committed watermark in the offset
    // log, which is exactly what a restart replays — and what this
    // law pins.
    val b1 = (0 until 12).map(i =>
      (i.toLong, t(i * 5L + 120), 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val b2 = Seq(
      (100L, t(0), 2L, "view", 5.0),        // LATE: watermark ≈ max−10min
      (101L, t(180), 3L, "purchase", 2.0))  // on-time
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("wmdrop").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("wmdropckpt").toString
    def deliver(b: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"wmb$i").toString
      b.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, f"b_$i%02d.parquet").toPath)
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): (Long, Long) = {
      val q = Streaming.dedupStream(
          spark.readStream.schema(b1.schema).parquet(dir.getPath),
          Seq("event_id"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("event_id").as[Long].collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      val dropped = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      val updated = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsUpdated).sum
      q.stop()
      (dropped, updated)
    }
    deliver(b1, 0)
    val (d1, u1) = run()
    assert(d1 === 0L && u1 === 12L, s"run 1: dropped=$d1 updated=$u1")
    deliver(b2, 1)
    val (d2, u2) = run()
    assert(d2 === 1L,
      s"state store must report exactly the one late row, got $d2")
    assert(u2 === 1L, "only the on-time row may touch state")
    assert(!seen.contains(100L),
      "the beyond-watermark row leaked past the dedup operator")
    assert(seen.sorted === ((0L until 12L) :+ 101L),
      s"got ${seen.sorted.mkString(",")}")
  }

  test("incrementalDedupStream restart-from-checkpoint: a cleanly " +
    "stopped query resumes with ZERO re-delivery (exactly-once)") {
    val docs = Tables.load(spark, sf001, "documents")
    val shard = docs.filter($"doc_id" % 10 === 7)
    val corpus = docs.filter($"doc_id" % 10 =!= 7)
    val index = Dedup.buildLshIndex(corpus, n = 3, k = 32, bands = 8)
    // the shard arrives as TWO files; a fixed checkpoint dir makes
    // the query resumable across restarts
    val half1 = shard.filter($"doc_id" % 20 === 7)
    val half2 = shard.filter($"doc_id" % 20 === 17)
    val srcDir = java.nio.file.Files.createTempDirectory("ckptsrc").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("ckptloc").toString
    def deliver(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"ckb$i").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(srcDir, f"s_$i%02d.parquet").toPath)
    }
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def start() = Streaming.incrementalDedupStream(
      spark.readStream.schema(shard.schema).parquet(srcDir.getPath), index,
      (kept, id) => emitted.synchronized {
        emitted += ((id, kept.select("doc_id").as[Long].collect().toSet))
      },
      checkpointDir = Some(ckpt))
    // run 1: only half1 exists; clean stop after processAllAvailable
    deliver(half1, 0)
    val q1 = start(); q1.stop()
    val afterRun1 = emitted.toVector
    assert(afterRun1.flatMap(_._2).nonEmpty, "run 1 admitted nothing")
    // run 2 (the restart): half2 arrives; the committed first batch
    // must NOT replay — only new data flows through the callback
    deliver(half2, 1)
    val q2 = start(); q2.stop()
    val run2 = emitted.toVector.drop(afterRun1.size)
    val run1Ids = afterRun1.flatMap(_._2).toSet
    assert(run2.nonEmpty, "restart processed nothing")
    assert(run2.flatMap(_._2).toSet.intersect(run1Ids).isEmpty,
      "restart re-delivered rows from the committed batch")
    // end-to-end exactly-once: the union across both runs equals the
    // one-shot batch dedup of the whole shard
    val batchPairs = Dedup.dedupAgainstIndex(shard, index, n = 3, k = 32,
      bands = 8, minJaccard = 0.5)
    val want = Dedup.applyIncrementalDedup(shard, batchPairs)
      .select("doc_id").as[Long].collect().toSet
    assert(emitted.flatMap(_._2).toSet === want,
      "union across restart must equal the batch admit set exactly once")
  }

  test("annLookupStream: chunked multi-batch query delivery equals " +
    "the one-shot batch answer") {
    val e = graft.Tables.load(spark, sf001, "embeddings")
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // stage the roster as two files → two micro-batches
    val dir = java.nio.file.Files.createTempDirectory("annstream").toFile
    Seq(queries.filter(col("qid") % 100 === 0),
        queries.filter(col("qid") % 100 =!= 0)).zipWithIndex.foreach {
      case (part, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"annq$i").toString
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
        java.nio.file.Files.copy(f.toPath, dest.toPath)
        dest.setLastModified(1000000000000L + i * 60000L)
    }
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getPath)
    assert(stream.isStreaming)
    val got = Streaming.annLookupStream(stream, e, k = 5, bands = 4, r = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.ext.Similarity
      .annTopKBatch(e, queries, k = 5, bands = 4, r = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want && got.nonEmpty)
    graft.engine.TrackedCache.release()
  }

  test("annLookupStream: a query stream with zero batches yields an " +
    "EMPTY result with the real output schema, not zero columns") {
    val e = graft.Tables.load(spark, sf001, "embeddings")
    val emptyDir = java.nio.file.Files.createTempDirectory("annq_none")
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val stream = spark.readStream.schema(qSchema).parquet(emptyDir.toString)
    val got = Streaming.annLookupStream(stream, e, k = 5, bands = 4, r = 8)
    assert(got.count() === 0L)
    // downstream column references (q330's orderBy) must still bind
    assert(got.columns.contains("qid") && got.columns.contains("vec_id") &&
      got.columns.contains("cos_sim"))
    assert(got.orderBy("qid", "vec_id").count() === 0L)
    graft.engine.TrackedCache.release()
  }

  test("upsertMaintenanceStream: out-of-order multi-batch delivery " +
    "converges to the one-shot last-writer compaction") {
    // the staged chunks deliberately deliver some rows LATE (a later
    // file carries earlier timestamps) — the MERGE-WHEN-NEWER guard
    // must refuse those stale writes
    val (dir, batch, nLate) = writeOutOfOrderChunks()
    assert(nLate > 0)
    val stream = readChunkStream(dir, batch)
    val got = Streaming.upsertMaintenanceStream(stream)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val want = batch.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got === want)
    graft.engine.TrackedCache.release()
  }

  test("domainCapStream: cap straddles a micro-batch boundary; final " +
    "ledger equals the batch policy") {
    import spark.implicits._
    // domain A: 5 docs split 3 + 2 across files; cap 4 ⇒ batch 1
    // admits 3, batch 2 admits only 1 more. Domain B: 2 docs in the
    // first file, under the cap throughout.
    val dir = java.nio.file.Files.createTempDirectory("capstream").toFile
    val files = Seq(
      Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 10L), ("B", 11L)),
      Seq(("A", 4L), ("A", 5L)))
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"capchunk$i").toString
      rows.toDF("source", "doc_id").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getPath)
      .select(col("source")).as[Streaming.CapDoc]
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(
      Streaming.domainCapStream(stream, cap = 4).toDF(), "cap_stream",
      org.apache.spark.sql.streaming.OutputMode.Update)
    q.stop()
    val updates = spark.table("cap_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the running ledger shows the straddle: A appears once per batch
    assert(updates.toSet === Set(
      ("A", 3L, 3L, 0L), ("A", 5L, 4L, 1L), ("B", 2L, 2L, 0L)))
    // final ledger (max per domain) equals the batch policy min(n, cap)
    val fin = updates.groupBy(_._1).map { case (d, rs) =>
      d -> rs.maxBy(_._2) }.toMap
    assert(fin("A") === (("A", 5L, 4L, 1L)))
    assert(fin("B") === (("B", 2L, 2L, 0L)))
  }

  test("evalLedgerStream: counters straddle a micro-batch boundary and " +
    "the final ledger equals the batch aggregate in any arrival order") {
    import spark.implicits._
    // task 0: 4 samples (2 correct) split 3 + 1; task 1: 2 samples in
    // the second file only
    val dir = java.nio.file.Files.createTempDirectory("evalstream").toFile
    val files = Seq(
      Seq((0L, true), (0L, false), (0L, false)),
      Seq((0L, true), (1L, true), (1L, true)))
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"evchunk$i").toString
      rows.toDF("task_id", "correct").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("task_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("correct",
          org.apache.spark.sql.types.BooleanType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getPath)
      .as[Streaming.EvalSample]
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(
      Streaming.evalLedgerStream(stream).toDF(), "eval_stream",
      org.apache.spark.sql.streaming.OutputMode.Update)
    q.stop()
    val updates = spark.table("eval_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // running ledger shows the straddle; final = batch aggregate
    assert(updates.toSet === Set((0L, 3L, 1L), (0L, 4L, 2L), (1L, 2L, 2L)))
    // pass@k on the final ledger matches the all-at-once batch answer
    val ledger = spark.table("eval_stream").groupBy("task_id")
      .agg(max("n_samples").as("n_samples"),
        max("n_correct").as("n_correct"))
    val streamed = Evals.passAtKOnCounts(ledger, "task_id").collect().toSeq
    val batch = Evals.passAtK(
      files.flatten.toDF("task_id", "correct"), "task_id", "correct")
      .collect().toSeq
    assert(streamed === batch)
  }

  test("mcNemarLedgerStream: per-shard counters straddle micro-batches " +
    "and the summed final ledger equals the batch mcNemar exactly") {
    import spark.implicits._
    // 2 shards (task % 2), pairs split across two files so shard-0
    // counters straddle the batch boundary
    val dir = java.nio.file.Files.createTempDirectory("mnstream").toFile
    val files = Seq(
      Seq((0L, true, false), (1L, true, true), (2L, true, false)),
      Seq((0L, false, true), (3L, false, false), (4L, true, false),
        (2L, true, true)))
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"mnchunk$i").toString
      rows.toDF("task_id", "a", "b").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("task_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.BooleanType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getPath)
      .as[Streaming.PairedOutcome]
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(
      Streaming.mcNemarLedgerStream(stream, shards = 2).toDF(),
      "mn_stream", org.apache.spark.sql.streaming.OutputMode.Update)
    q.stop()
    val ledger = spark.table("mn_stream").groupBy("shard")
      .agg(max("n_pairs").as("n_pairs"),
        max("n_concordant").as("n_concordant"),
        max("b_a_only").as("b_a_only"),
        max("b_b_only").as("b_b_only"))
    // shard 0 (tasks 0, 2, 4): 5 pairs, 1 concordant (2nd file's
    // task-2 repeat), 3 a-only, 1 b-only; shard 1 (tasks 1, 3):
    // 2 pairs, both concordant
    val byShard = ledger.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byShard(0L) === ((5L, 1L, 3L, 1L)) &&
      byShard(1L) === ((2L, 2L, 0L, 0L)))
    val streamed = Evals.mcNemarOnCounts(ledger).collect().toSeq
    val batch = Evals.mcNemar(
      files.flatten.toDF("task_id", "a", "b"), "task_id", "a", "b")
      .collect().toSeq
    assert(streamed === batch)
  }

  test("ipsLedgerStream: quantized weight moments straddle " +
    "micro-batches, a NEGATIVE later-batch reward makes swr " +
    "non-monotone (argmax readback, not per-counter max), and the " +
    "finished estimates equal the batch ipsOffPolicy exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ipsstream").toFile
    // shard straddle on task 0; a dropped (pb = 0) play in file 2;
    // task 1's NEGATIVE reward arrives in the LATER batch, so shard
    // 1's swr DECREASES across emitted rows — a per-counter max
    // would resurrect the earlier, larger swr (the bug the argmax
    // readback contract exists to prevent)
    val files = Seq(
      Seq((0L, 0.25, 0.5, 1.0), (3L, 0.1, 0.9, 0.75)),
      Seq((0L, 0.8, 0.4, 0.5), (2L, 0.0, 0.5, 1.0),
        (1L, 0.5, 0.25, -1.0)))
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"ipschunk$i").toString
      rows.toDF("task_id", "pb", "pt", "r").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("task_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pb",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("pt",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getPath)
      .as[Streaming.LoggedPlay]
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(
      Streaming.ipsLedgerStream(stream, shards = 2).toDF(),
      "ips_stream", org.apache.spark.sql.streaming.OutputMode.Update)
    q.stop()
    // last row per shard by argmax on the strictly monotone n_total
    val ledger = spark.table("ips_stream").groupBy("shard")
      .agg(max(struct(col("n_total"), col("n_samples"), col("sw"),
        col("swr"), col("sw2"))).as("_m"))
      .select(col("shard"), col("_m.n_total").as("n_total"),
        col("_m.n_samples").as("n_samples"), col("_m.sw").as("sw"),
        col("_m.swr").as("swr"), col("_m.sw2").as("sw2"))
    // the non-monotone counter is real in this fixture: shard 1's
    // final swr is LOWER than its max-over-emitted-rows swr
    val shard1 = spark.table("ips_stream").filter(col("shard") === 1L)
      .select("n_total", "swr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(shard1.last._2 < shard1.map(_._2).max,
      s"fixture must exercise a decreasing swr, got ${shard1.toSeq}")
    val streamed = Evals.ipsOnCounts(ledger).collect().toSeq
    val batch = Evals.ipsOffPolicy(
      files.flatten.toDF("t", "pb", "pt", "r"), "t", "pb", "pt", "r")
      .collect().toSeq
    graft.engine.TrackedCache.release()
    assert(streamed === batch)
    // the dropped play is visible: 5 total, 4 scored
    assert(streamed.head.getAs[Long]("n_samples") === 4L &&
      streamed.head.getAs[Long]("n_dropped") === 1L)
  }

  test("confSeqLedgerStream: quantized delta moments straddle " +
    "micro-batches, a negative later-batch delta makes sqd " +
    "non-monotone (argmax readback), and the finished confidence " +
    "sequence equals the batch confSeqTest exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csstream").toFile
    // shard straddle on task 0; task 1's NEGATIVE delta arrives in
    // the LATER batch so shard 1's sqd decreases across emitted rows
    val files = Seq(
      Seq((0L, 0.9, 0.4), (3L, 0.8, 0.1)),
      Seq((0L, 0.6, 0.5), (1L, 0.1, 0.9)))
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"cschunk$i").toString
      rows.toDF("task_id", "a", "b").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("task_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getPath)
      .as[Streaming.PairedScore]
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(
      Streaming.confSeqLedgerStream(stream, shards = 2).toDF(),
      "cs_stream", org.apache.spark.sql.streaming.OutputMode.Update)
    q.stop()
    // last row per shard by argmax on the strictly monotone n_segs
    val ledger = spark.table("cs_stream").groupBy("shard")
      .agg(max(struct(col("n_segs"), col("sqd"), col("sqd2")))
        .as("_m"))
      .select(col("_m.n_segs").as("n_segs"), col("_m.sqd").as("sqd"),
        col("_m.sqd2").as("sqd2"))
    // the non-monotone counter is real: shard 1's final sqd is lower
    // than its max-over-emitted-rows sqd
    val shard1 = spark.table("cs_stream").filter(col("shard") === 1L)
      .select("n_segs", "sqd").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(shard1.last._2 < shard1.map(_._2).max,
      s"fixture must exercise a decreasing sqd, got ${shard1.toSeq}")
    val streamed = Evals.seqTestOnCounts(ledger, alpha = 0.05,
      scale = 1.0).collect().toSeq
    val batch = Evals.confSeqTest(
      files.flatten.toDF("t", "a", "b"), "t", "a", "b", alpha = 0.05,
      scale = 1.0).collect().toSeq
    graft.engine.TrackedCache.release()
    assert(streamed === batch)
    assert(streamed.head.getAs[Long]("n_segs") === 4L)
  }

  test("confSeqLedgerStream restart-from-checkpoint: ledger state " +
    "survives a clean stop and CONTINUES counting — the anytime-valid " +
    "readout stays correct across restarts") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("csrsrc").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("csrckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("task_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.DoubleType)))
    def deliver(rows: Seq[(Long, Double, Double)], i: Int): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"csr$i").toString
      rows.toDF("task_id", "a", "b").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(srcDir, f"s_$i%02d.parquet").toPath)
    }
    // the memory sink refuses checkpoint recovery (not
    // fault-tolerant) — collect each run's ledger rows through a
    // foreachBatch sink, the recoverable pattern the dedup restart
    // law established
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)] // shard, n_segs, sqd, sqd2
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .parquet(srcDir.getPath).as[Streaming.PairedScore]
      val q = Streaming.confSeqLedgerStream(stream, shards = 2).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted.synchronized {
            emitted ++= df.select("shard", "n_segs", "sqd", "sqd2")
              .collect().map(r => (r.getLong(0), r.getLong(1),
                r.getLong(2), r.getLong(3)))
          }
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    // run 1: shard 0 (task 0) and shard 1 (tasks 1, 3)
    val file1 = Seq((0L, 0.9, 0.4), (1L, 0.3, 0.1), (3L, 0.8, 0.1))
    deliver(file1, 0)
    run()
    val r1 = emitted.toVector.map(r => r._1 -> r._2).toMap
    assert(r1 === Map(0L -> 1L, 1L -> 2L),
      s"run 1 ledger: ${emitted.toVector}")
    val run1Rows = emitted.toVector
    // run 2 (restart, same checkpoint): only shard-0 tasks arrive.
    // The committed batch must NOT replay, shard 1 must NOT re-emit,
    // and shard 0's counter must CONTINUE from the restored state
    // (n_segs = 3, not 2) — a from-zero restart would silently halve
    // every anytime-valid interval read after a failover.
    val file2 = Seq((0L, 0.6, 0.5), (2L, 0.1, 0.9))
    deliver(file2, 1)
    run()
    val run2Rows = emitted.toVector.drop(run1Rows.size)
    val r2 = run2Rows.map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(r2.keySet === Set(0L),
      s"run 2 must emit only shard 0: $run2Rows")
    assert(r2(0L)._1 === 3L,
      s"restored state must continue counting: $run2Rows")
    // finish: run-2 rows + run-1 rows for shards run 2 didn't touch
    // reproduce the one-shot batch statistic exactly
    val ledger = (run2Rows ++ run1Rows.filter(_._1 == 1L))
      .toDF("shard", "n_segs", "sqd", "sqd2")
      .select("n_segs", "sqd", "sqd2")
    val streamed = Evals.seqTestOnCounts(ledger).collect().toSeq
    val batch = Evals.confSeqTest(
      (file1 ++ file2).toDF("t", "a", "b"), "t", "a", "b")
      .collect().toSeq
    graft.engine.TrackedCache.release()
    assert(streamed === batch,
      "post-restart ledger must land on the batch statistic")
  }

  test("eloRatingStream: seq-ordered ingestion split across micro-batches " +
    "lands exactly on the batch fold; rating state straddles batches") {
    import spark.implicits._
    // 2 leagues; battles deliberately ordered so later results depend
    // on earlier ratings (order sensitivity is what the law checks)
    val battles = Seq(
      (0L, 1L, 0L, 1L), (0L, 2L, 0L, 2L), (0L, 3L, 1L, 2L),
      (1L, 1L, 3L, 0L), (1L, 2L, 0L, 3L), (1L, 3L, 3L, 0L),
      (0L, 4L, 2L, 0L), (0L, 5L, 0L, 1L),
      (1L, 4L, 3L, 1L), (1L, 5L, 1L, 3L))
    // two files split at seq 3/4 — the ingestion contract: batches
    // arrive in seq order, rows within a batch arrive unordered
    val dir = java.nio.file.Files.createTempDirectory("elostream").toFile
    val files = Seq(battles.filter(_._2 <= 3L).reverse,
      battles.filter(_._2 >= 4L).reverse)
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"elochunk$i").toString
      rows.toDF("league", "seq", "winner", "loser").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1000000000000L + i * 60000L)
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq("league", "seq",
        "winner", "loser").map(n => org.apache.spark.sql.types.StructField(
        n, org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getPath)
      .as[Streaming.EloBattle]
    assert(stream.isStreaming)
    val q = Streaming.runToMemory(
      Streaming.eloRatingStream(stream).toDF(), "elo_stream",
      org.apache.spark.sql.streaming.OutputMode.Update)
    q.stop()
    val updates = spark.table("elo_stream")
    // the running ledger must show BOTH batch stamps for league 0
    // (3 then 5 battles) — proof the state straddled the boundary
    assert(updates.filter(col("league") === 0L)
      .select("n_battles").distinct().collect().map(_.getLong(0)).sorted
      === Array(3L, 5L))
    val rows = updates.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val finalLedger = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val last = rs.map(_._2).max
      rs.filter(_._2 == last)
    }.map { case (lg, _, mid, w, g, rm) =>
      org.apache.spark.sql.Row(lg, mid, w, g,
        math.rint(rm.toDouble / 1e6 * 1e6) / 1e6)
    }.sortBy(r => (r.getLong(0), r.getLong(1)))
    val batch = graft.ext.Preference.eloFold(
      battles.toDF("league", "seq", "winner", "loser"))
      .collect().toSeq
    assert(finalLedger === batch,
      s"stream:\n${finalLedger.mkString("\n")}\nbatch:\n${
        batch.mkString("\n")}")
  }
}
