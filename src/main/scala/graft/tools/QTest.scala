package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Streaming

/** Scratch main for local iteration on a single query. */
object QTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // drive: streaming hourly agg over the real events file
    val stream = Streaming.readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    println(s"isStreaming=${stream.isStreaming}")
    val q = Streaming.runToMemory(Streaming.hourlyAgg(stream), "hr")
    val out = spark.sql("SELECT * FROM hr ORDER BY hour, event_type")
    out.show(6, truncate = false)
    println(s"STREAM-ROWS ${out.count()}")
    q.stop()

    // probe: sessionize in streaming mode with watermark
    val stream2 = Streaming.readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val q2 = Streaming.runToMemory(Streaming.sessionizeStream(stream2), "sess")
    println(s"SESS-ROWS ${spark.sql("SELECT * FROM sess").count()}")
    q2.stop()

    spark.stop()
  }
}
