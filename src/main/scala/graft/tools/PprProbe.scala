package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop probe for q214's cost attribution (not part of the
  * driver contract; run via `runMain graft.tools.PprProbe`).
  */
object PprProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("ppr-probe").getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.Tables.load(spark, dir, "lineitem")
    val edges = li.select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    t("adjacency build+count") {
      graft.ext.Graph.undirectedAdjacency(edges).count()
    }
    val seeds = graft.Tables.load(spark, dir, "supplier")
      .filter(col("s_nationkey") === 3)
      .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"))
    t("ppr 3 iters") {
      graft.ext.Graph.personalizedPageRank(edges, seeds, 3)
        .orderBy(desc("rank")).limit(20).collect()
    }
    t("pagerank 3 iters") {
      graft.ext.Graph.pageRank(edges, iterations = 3)
        .orderBy(desc("rank")).limit(20).collect()
    }
  }
}
