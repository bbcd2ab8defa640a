package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench a single named query repeatedly under the same session
  * config as Bench — the dev-loop tool for diagnosing one query's
  * time without paying for the whole battery.
  *
  * Usage: runMain graft.tools.BenchOne <qname> [sfDir] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHE_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("GRAFT_FILE_IMPL",
          "org.apache.hadoop.fs.LocalFileSystem"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)", "count(distinct id % 7)").collect()
    val warm = java.nio.file.Files.createTempDirectory("bench_warm").toString
    spark.range(3).toDF("id").write.mode("overwrite").parquet(warm)
    spark.read.parquet(warm).agg(org.apache.spark.sql.functions.sum("id")).collect()
    val fn = graft.SparkEntry.queries(name)
    // SPARK_GRAFT_CLEARCACHE=1 → drop all cached relations between reps,
    // isolating JIT warmup from CacheManager plan-match reuse (persisted
    // frames a query leaks are plan-matched by later identical subtrees)
    val clearCache = sys.env.get("SPARK_GRAFT_CLEARCACHE").contains("1")
    // GRAFT_STACK_SAMPLER=1: sample executor-task threads every 200 ms
    // during the measure and print a frame histogram afterwards — the
    // in-process substitute for jstack (guide §7.3) when the runner
    // swallows SIGQUIT. Top-of-stack frames of RUNNABLE/WAITING task
    // threads tell you what tasks block on.
    val sampler = sys.env.get("GRAFT_STACK_SAMPLER").contains("1")
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    if (sampler) {
      val t = new Thread(() => {
        while (true) {
          if (sampling) {
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
              if (th.getName.startsWith("Executor task launch") && st.nonEmpty) {
                val frame = st.iterator
                  .map(f => s"${f.getClassName}.${f.getMethodName}")
                  .find(f => !f.startsWith("java.") && !f.startsWith("jdk.") &&
                    !f.startsWith("sun."))
                  .getOrElse(s"${st.head.getClassName}.${st.head.getMethodName}")
                hist.merge(s"${th.getState} $frame", 1, (a, b) => a + b)
              }
            }
          }
          Thread.sleep(200)
        }
      })
      t.setDaemon(true)
      t.start()
    }
    (1 to reps).foreach { i =>
      if (clearCache) spark.catalog.clearCache()
      sampling = true
      val (secs, err) = graft.Bench.measure(fn(spark, sfDir))
      sampling = false
      println(f"BENCHONE $name rep=$i $secs%.3f s ${err.getOrElse("")}")
    }
    if (sampler) {
      import scala.jdk.CollectionConverters._
      hist.asScala.toSeq.sortBy(-_._2.intValue).take(25).foreach {
        case (k, n) => println(s"  SAMPLE $n $k")
      }
    }
    spark.stop()
  }
}
