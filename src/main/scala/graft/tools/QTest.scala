package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.ext.Similarity

object QTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    // does DotProduct stay inside whole-stage codegen?
    val plan = SparkEntry.queries("q41_embedding_neardup")(spark, dir)
      .queryExecution.executedPlan.toString
    println("WSCG spans: " + "\\*\\(\\d+\\)".r.findAllIn(plan).size)
    println("dotproduct in plan: " + plan.toLowerCase.contains("dotproduct"))
    println(plan.split("\n").filter(_.toLowerCase.contains("dotproduct")).take(2).mkString("\n"))

    // null vector through the library boundary
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val nullQ = Seq((0L)).toDF("x").select(lit(null).cast("array<float>").as("qv"))
    val out = Similarity.knnBruteForce(emb, nullQ, k = 3)
    println("null-query rows: " + out.count())
    out.show(3)
    spark.stop()
  }
}
