package graft.tools

import org.apache.spark.sql.SparkSession

/** Print per-query BroadcastNestedLoopJoin / CartesianProduct counts
  * from the executed plan string — the dev-loop feeder for
  * ScaleSpec's per-entry pin caps (measure, document, then pin).
  *
  * Usage: runMain graft.tools.PinProbe <qname> [qname...]
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      val cart = "CartesianProduct".r.findAllIn(p).size
      println(s"PIN $name bnlj=$bnlj cartesian=$cart")
      graft.engine.TrackedCache.release()
    }
    spark.stop()
  }
}
