package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for local iteration: edit, `sbt "runMain
  * graft.tools.QTest"`, inspect plans/results. Kept neutral between
  * investigations.
  */
object QTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q26_sql_frontend")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    // post-execution: AQE final plan
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
