package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min laws: one-sided estimates for EVERY token under any
  * partitioning, byte-identical blobs regardless of merge order
  * (element-wise add commutes), and the width error bound at the
  * documented 3·e·N/width margin.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish corpus: ~46k tokens, ~1.2k distinct
  private def zipfDf = {
    val rows = for {
      j <- 0 until 1200
      reps = 40000 / ((j + 1) * (j + 1)) + 1
      _ <- 0 until reps
    } yield s"t$j"
    rows.toDF("tok")
  }

  private def blob(parts: Int, depth: Int = 5, width: Int = 1024): Array[Byte] =
    zipfDf.repartition(parts)
      .agg(CountMin.cmsAgg($"tok", depth, width))
      .head().getAs[Array[Byte]](0)

  test("estimates never undercount, any partitioning") {
    for (parts <- Seq(1, 7, 32)) {
      val b = blob(parts)
      val bad = zipfDf.groupBy("tok").count()
        .filter(CountMin.cmsEstimate(lit(b), $"tok") < $"count")
        .count()
      assert(bad === 0L, s"undercount at parts=$parts")
    }
  }

  test("merge order cannot change the sketch (add is order-free)") {
    assert(java.util.Arrays.equals(blob(1), blob(32)))
  }

  test("width bound: every estimate within true + 3eN/width") {
    val b = blob(8)
    val n = zipfDf.count()
    val bound = math.ceil(3.0 * math.E * n / 1024).toLong
    val bad = zipfDf.groupBy("tok").count()
      .filter(CountMin.cmsEstimate(lit(b), $"tok") > $"count" + bound)
      .count()
    assert(bad === 0L)
  }

  test("unseen tokens usually estimate near zero (collisions only)") {
    val b = blob(8)
    val est = Seq("never-seen-token").toDF("tok")
      .select(CountMin.cmsEstimate(lit(b), $"tok")).head().getLong(0)
    val n = zipfDf.count()
    assert(est <= math.ceil(3.0 * math.E * n / 1024).toLong)
  }

  test("SQL surface: graft_cms_agg + graft_cms_estimate round-trip") {
    graft.GraftFunctions.register(spark)
    zipfDf.createOrReplaceTempView("cms_toks")
    val r = spark.sql(
      """WITH s AS (SELECT graft_cms_agg(tok, 5, 1024) AS blob FROM cms_toks)
        |SELECT graft_cms_estimate(s.blob, 't0') AS est FROM s""".stripMargin)
      .head().getLong(0)
    val exact = zipfDf.filter($"tok" === "t0").count()
    assert(r >= exact)
  }
}
