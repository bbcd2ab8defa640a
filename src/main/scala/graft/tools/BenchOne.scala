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
      .config("spark.ui.enabled", "false")
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
    (1 to reps).foreach { i =>
      if (clearCache) spark.catalog.clearCache()
      val (secs, err) = graft.Bench.measure(fn(spark, sfDir))
      println(f"BENCHONE $name rep=$i $secs%.3f s ${err.getOrElse("")}")
    }
    spark.stop()
  }
}
