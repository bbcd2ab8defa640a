package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task attribution under the Bench session
  * config — the dev-loop answer to "is this query scheduling-floor
  * bound (many tiny jobs) or compute bound (few heavy stages)?".
  * For each named query it runs the Bench.measure noop-sink action
  * with a listener attached and prints one line:
  *
  *   PROBE <name> wall=<s> jobs=N stages=N tasks=N taskTime=<s> gc=<s>
  *
  * wall >> taskTime/cores with a high job count = per-action
  * scheduling floor (batch the actions); taskTime ≈ wall·cores = real
  * compute (optimize the operators). Construction-time actions
  * (iterative loops, streaming runs) are included — the listener is
  * attached BEFORE the query function is invoked.
  *
  * Usage: runMain graft.tools.JobProbe <qname> [qname...]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHE_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench warmups, so first-query numbers aren't JIT noise
    spark.range(2000000).selectExpr("sum(id * 2)", "count(distinct id % 7)").collect()
    val warm = java.nio.file.Files.createTempDirectory("probe_warm").toString
    spark.range(3).toDF("id").write.mode("overwrite").parquet(warm)
    spark.read.parquet(warm).agg(org.apache.spark.sql.functions.sum("id")).collect()
    locally {
      val e = spark.range(320)
        .selectExpr("id % 40 AS src", "(id * 7 + 3) % 40 AS dst")
      for (_ <- 1 to 3) {
        graft.Bench.measure(graft.ext.Graph.pageRank(e.toDF(), iterations = 10))
        graft.engine.TrackedCache.release()
      }
    }
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    val deserMs = new AtomicLong(0L)
    val cpuMs = new AtomicLong(0L)
    // per-stage task-time rollup keyed by stage id, with the stage
    // name (callsite) — GRAFT_PROBE_STAGES=N prints the top N
    val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val topStages = sys.env.get("GRAFT_PROBE_STAGES").map(_.toInt).getOrElse(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageTime.merge(s.stageInfo.stageId,
          (s.stageInfo.name.take(120), 0L, 0),
          (a, b) => (if (b._1.nonEmpty) b._1 else a._1, a._2 + b._2, a._3 + b._3))
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskTimeMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
          cpuMs.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
          stageTime.merge(t.stageId,
            ("", t.taskMetrics.executorRunTime, 1),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
      }
    })
    for (name <- args) {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0L); gcMs.set(0L); deserMs.set(0L); cpuMs.set(0L)
      stageTime.clear()
      val (secs, err) = graft.Bench.measure(
        graft.SparkEntry.queries(name)(spark, sfDir))
      if (topStages > 0) {
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val top = stageTime.asScala.toSeq.sortBy(-_._2._2).take(topStages)
        top.foreach { case (sid, (sname, ms, n)) =>
          println(f"  STAGE $name sid=$sid tasks=$n taskTime=${ms / 1e3}%.2f $sname")
        }
      }
      // let straggler listener events drain before reading counters
      Thread.sleep(300)
      println(f"PROBE $name wall=$secs%.2f jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} " +
        f"taskTime=${taskTimeMs.get / 1e3}%.2f cpu=${cpuMs.get / 1e3}%.2f " +
        f"deser=${deserMs.get / 1e3}%.2f gc=${gcMs.get / 1e3}%.2f " +
        err.map(e => s"ERR=$e").getOrElse(""))
      graft.engine.TrackedCache.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
