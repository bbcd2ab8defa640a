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

  test("streaming dedup: one survivor per duplicated key, none lost") {
    // duplicate every event (same id, same ts) through a re-delivery:
    // the deduped stream must emit each event_id exactly once
    val dir = java.nio.file.Files.createTempDirectory("dupstream").toFile
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read
      .schema(Streaming.rawSchema)
      .parquet(eventsPath)
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
}
