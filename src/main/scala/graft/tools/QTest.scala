package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

object QTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value").as("signup_value"))
    val df = graft.plans.AsOfJoinNative.asofBackward(purchases, signups,
      "user_id", "ts", "ts", Seq("signup_value"))
      .select(col("event_id"), col("user_id"), col("value"), col("signup_value"),
        date_format(col("ts_matched"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
      .orderBy("event_id")
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.toString.take(2500))
    try {
      df.coalesce(1).write.mode("overwrite").parquet("/tmp/q46_native")
      println("WRITE OK rows=" + spark.read.parquet("/tmp/q46_native").count())
    } catch { case e: Throwable => println("WRITE FAILED: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
