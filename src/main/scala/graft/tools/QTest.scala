package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for local iteration: edit, `sbt "runMain
  * graft.tools.QTest"`, inspect plans/results. Kept neutral between
  * investigations. (r18 used it to bisect pageRank's cost into
  * adjacency-build vs per-iteration marginals — the reading behind
  * the psEdges pre-distinct; see OPTIMIZATION_r18.md.)
  */
object QTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    df.show(10, truncate = false)
    spark.stop()
  }
}
