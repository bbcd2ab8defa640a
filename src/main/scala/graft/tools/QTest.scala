package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for local iteration: edit, `sbt "runMain
  * graft.tools.QTest"`, inspect plans/results. Kept neutral between
  * investigations.
  */
object QTest {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    // warmups as in Bench
    spark.range(2000000).selectExpr("sum(id * 2)", "count(distinct id % 7)").collect()
    locally {
      val e = spark.range(320)
        .selectExpr("id % 40 AS src", "(id * 7 + 3) % 40 AS dst")
      for (_ <- 1 to 3) {
        graft.Bench.measure(graft.ext.Graph.pageRank(e.toDF(), iterations = 10))
        graft.engine.TrackedCache.release()
      }
    }
    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"QT $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val li = graft.Tables.load(spark, dir, "lineitem")
    val edges = li.select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    for (rep <- 1 to 2) {
      timeIt(s"rep$rep adj build+count") {
        val adj = graft.ext.Graph.undirectedAdjacency(edges)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        adj.count()
        adj.unpersist(true)
      }
      timeIt(s"rep$rep pageRank iters=1") {
        graft.Bench.measure(graft.ext.Graph.pageRank(edges, iterations = 1))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      timeIt(s"rep$rep pageRank iters=3") {
        graft.Bench.measure(graft.ext.Graph.pageRank(edges, iterations = 3))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      timeIt(s"rep$rep pageRank iters=10") {
        graft.Bench.measure(graft.ext.Graph.pageRank(edges, iterations = 10))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
