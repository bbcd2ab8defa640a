package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Skew

object QTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // pathological skew: 1M rows, 95% on one key
    val skewed = spark.range(1000000)
      .select((when(pmod($"id", lit(100)) < 95, "HOT").otherwise(concat(lit("k"), pmod($"id", lit(100))))).as("key"),
        $"id", lit("1.00").cast("decimal(18,2)").as("v"))
    val direct = skewed.groupBy("key").agg(sum($"v").as("s"))
      .orderBy("key").collect()
    val salted = Skew.saltedSum(skewed, Seq("key"), "v", saltSrc = $"id", n = 32)
      .orderBy("key").collect()
    val eq = direct.map(r => (r.getString(0), r.getDecimal(1))).sameElements(
             salted.map(r => (r.getString(0), r.getDecimal(1))))
    println(s"SKEW-PROBE 1M rows, 95% hot key: direct==salted -> $eq; hot=" +
      direct.find(_.getString(0) == "HOT").get.getDecimal(1))
    spark.stop()
  }
}
