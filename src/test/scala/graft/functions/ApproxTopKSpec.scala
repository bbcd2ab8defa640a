package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries laws: one-sided estimates, the n/(k+1) error bound,
  * and guaranteed containment of true heavy hitters — under any
  * partitioning (merge order may change ESTIMATES, never the
  * guarantees).
  */
class ApproxTopKSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: token t_j appears ~ N/(j+1) times → few heavy items,
  // long light tail; 100k rows, ~1.2k distinct
  private def zipfDf = {
    val rows = for {
      j <- 0 until 1200
      reps = 100000 / ((j + 1) * (j + 1)) + 1
      _ <- 0 until reps
    } yield s"t$j"
    rows.toDF("tok")
  }

  private def summaries(parts: Int, k: Int): Map[String, Long] = {
    val arr = zipfDf.repartition(parts)
      .agg(ApproxTopK.approxTopK($"tok", k).as("mg"))
      .head().getSeq[Row](0)
    arr.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("containment + one-sided error bound, any partitioning") {
    val truth = zipfDf.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val k = 32
    val slack = n / (k + 1) + 1
    for (parts <- Seq(1, 7, 32)) {
      val mg = summaries(parts, k)
      assert(mg.size <= k)
      mg.foreach { case (t, est) =>
        val f = truth(t)
        assert(est <= f, s"parts=$parts $t est=$est > true=$f")
        assert(est >= f - slack, s"parts=$parts $t est=$est < ${f - slack}")
      }
      // every true heavy hitter (f > n/(k+1)) must be present
      truth.filter(_._2 > slack).keys.foreach { t =>
        assert(mg.contains(t), s"parts=$parts missing heavy hitter $t")
      }
    }
  }

  test("grouped heavy hitters: per-group state, per-group guarantees") {
    val df = zipfDf.withColumn("g", (length($"tok") % 2).cast("int"))
    val out = df.groupBy("g").agg(ApproxTopK.approxTopK($"tok", 16).as("mg"))
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      val mg = r.getSeq[Row](1)
      assert(mg.nonEmpty && mg.size <= 16)
      // output is sorted (est desc, tok)
      val ests = mg.map(_.getLong(1))
      assert(ests === ests.sorted.reverse)
    }
  }

  test("serialization round-trips tokens beyond the 64KB modified-UTF-8 cap") {
    // writeUTF would throw UTFDataFormatException here (one 70k-char
    // token — a base64 blob / minified-JS line is a realistic input)
    val agg = ApproxTopK.MisraGries(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = agg.createAggregationBuffer()
    val big = "b" * 70000
    buf.update(big, 3L); buf.update("small", 1L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
  }

  test("non-string input fails at analysis, not inside executor tasks") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(5).agg(ApproxTopK.approxTopK($"id", 3)).collect()
    }
    assert(e.getMessage.contains("approx_top_k requires a string column"))
  }

  test("fewer distinct values than k: exact counts, no compression") {
    val df = Seq("a", "a", "b", "a", "c", "b").toDF("tok")
    val mg = df.agg(ApproxTopK.approxTopK($"tok", 10).as("mg"))
      .head().getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
