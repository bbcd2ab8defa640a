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
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"QT $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    // phase split of q58: pair generation vs CC loop
    val pairs = graft.ext.Dedup.minhashVerifiedPairs(docs, n = 3, k = 32,
      bands = 8, minJaccard = 0.5).select("id_a", "id_b")
    time("pairs-count")(println(pairs.count()))
    val cached = pairs.cache()
    time("pairs-cache")(cached.count())
    time("cc-on-cached")(
      println(graft.ext.Dedup.nearDupClusters(cached).count()))
    time("cc-on-uncached")(
      println(graft.ext.Dedup.nearDupClusters(pairs).count()))
    spark.stop()
  }
}
