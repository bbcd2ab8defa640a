package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch main for local iteration on a single query. */
object QTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def c = Tables.load(spark, dir, "customer")
    def n = Tables.load(spark, dir, "nation")
    def r = Tables.load(spark, dir, "region")
    def attempt(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      try { f.collect(); println(s"OK   $tag") }
      catch { case e: Throwable => println(s"FAIL $tag: ${e.getMessage.take(100)}") }

    attempt("no-broadcast qualified") {
      val (cc, nn, rr) = (c, n, r)
      cc.join(nn, cc("c_nationkey") === nn("n_nationkey"))
        .join(rr, nn("n_regionkey") === rr("r_regionkey"))
        .rollup("r_name", "n_name").agg(count(lit(1)).as("n_cust"))
    }
    attempt("using-columns") {
      val cc = c.withColumnRenamed("c_nationkey", "n_nationkey")
      val nn = n
      val rr = r
      cc.join(nn, Seq("n_nationkey"))
        .join(rr, nn("n_regionkey") === rr("r_regionkey"))
        .rollup("r_name", "n_name").agg(count(lit(1)).as("n_cust"))
    }
    attempt("conf-disabled") {
      spark.conf.set("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
      val out = c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .rollup("r_name", "n_name").agg(count(lit(1)).as("n_cust"))
      out
    }
    attempt("plain-rollup-no-join") {
      n.rollup("n_regionkey", "n_name").agg(count(lit(1)).as("n_cust"))
    }
    attempt("join-then-rollup-unqualified") {
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .rollup("n_name").agg(count(lit(1)).as("n_cust"))
    }
    spark.stop()
  }
}
