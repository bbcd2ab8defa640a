package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sf001, "embeddings")
  private def qv = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))

  test("brute-force knn: the query vector itself ranks first with cos 1.0") {
    val top = Similarity.knnBruteForce(emb, qv, k = 5).collect()
    assert(top.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-6)
    val sims = top.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims === sims.sorted.reverse) // descending
  }

  test("ANN bucket search returns a subset of the brute-force ordering") {
    val brute = Similarity.knnBruteForce(emb, qv, k = 100).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    val ann = Similarity.annTopK(emb, qv, k = 10, nPlanes = 6).collect()
    assert(ann.nonEmpty)
    // every ANN hit carries its true cosine (same arithmetic)
    ann.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      brute.get(id).foreach(c => assert(math.abs(c - r.getAs[Double]("cos_sim")) < 1e-6))
    }
    // self-match must be in its own bucket
    assert(ann.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("IVF: probing more cells monotonically recovers brute-force recall") {
    val cents = Similarity.centroidsByLabel(emb)
    assert(cents.nonEmpty && cents.head._2.size === 64)
    val brute = Similarity.knnBruteForce(emb, qv, k = 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    def recall(p: Int) = {
      val ivf = Similarity.ivfTopK(emb, qv, k = 10, cents, nProbes = p)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      ivf.intersect(brute).size
    }
    val rAll = recall(cents.size)    // probing every cell == brute force
    assert(rAll === 10)
    val r1 = recall(1)
    assert(r1 >= 1)                  // self-cell at least finds the query
    assert(recall(3) >= r1)          // more probes, never less recall
  }

  test("int8 quantization round-trips with small cosine drift") {
    val (q, s) = Similarity.quantizeInt8(col("embedding"))
    val rt = emb.withColumn("q", q).withColumn("s", s)
      .withColumn("deq", Similarity.dequantizeInt8(col("q"), col("s")))
      .withColumn("drift",
        lit(1.0) - Similarity.cosine(col("embedding"), col("deq")))
    val maxDrift = rt.agg(max(col("drift"))).head().getDouble(0)
    assert(maxDrift < 1e-2, s"max cosine drift $maxDrift")
    // bytes really are int8
    val qRow = rt.select("q").head().getSeq[Byte](0)
    assert(qRow.forall(b => b >= -127 && b <= 127))
  }

  test("cosineNearDupPairs is symmetric-free (a < b) and thresholded") {
    val pairs = Similarity.cosineNearDupPairs(emb.limit(50), threshold = 0.3)
      .collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos_sim") >= 0.3)
    }
  }
}
