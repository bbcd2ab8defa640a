package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {

  import spark.implicits._

  private def emb = Tables.load(spark, sf001, "embeddings")

  private lazy val cb = Quantization.trainPqCodebooks(emb, m = 8, kCodes = 16, iters = 3)

  test("m must divide the vector dimension") {
    intercept[IllegalArgumentException] {
      Quantization.trainPqCodebooks(emb, m = 7)
    }
  }

  test("codebooks: full (sub, code) grid, centroids in-subspace-sized") {
    assert(cb.size === 8 * 16)
    assert(cb.map(c => (c._1, c._2)).toSet ===
      (for (s <- 0 until 8; c <- 0 until 16) yield (s, c)).toSet)
    assert(cb.forall(_._3.length === 8))
  }

  test("training reduces reconstruction error vs the seed codebook") {
    val seedOnly = Quantization.trainPqCodebooks(emb, m = 8, kCodes = 16, iters = 0)
    def sse(codebook: Quantization.Codebooks): Double =
      Quantization.pqEncode(emb, codebook)
        .agg(sum("recon_sse")).head().getDouble(0)
    val before = sse(seedOnly)
    val after = sse(cb)
    assert(after < before,
      s"Lloyd's iterations must not increase total SSE ($after >= $before)")
  }

  test("codes: m entries per vector, every code within [0, k)") {
    val codes = Quantization.pqEncode(emb, cb)
    val bad = codes.filter(size($"codes") =!= 8 ||
      exists($"codes", c => c < 0 || c >= 16)).count()
    assert(bad === 0L)
    assert(codes.count() === 500L)
  }

  test("ADC distance IS the distance to the reconstruction (exact law) " +
    "and obeys the triangle bound around the true distance") {
    // adist(q, x) = ‖q − decode(codes(x))‖² by construction; therefore
    // |‖q−x‖ − √adist| ≤ √recon_sse(x) (triangle inequality). On
    // near-uniform random embeddings recall@k is not a stable law —
    // the quantization-error bound is the real ADC contract.
    val enc = Quantization.pqEncode(emb, cb)
    val query = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val adcAll = Quantization.pqAdcTopK(
      enc.select("vec_id", "codes"), query, cb, k = 500)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adist")).toMap
    // exact per-row true distance and reconstruction error
    val qArr = array(query.map(x => lit(x.toDouble)): _*)
    val truth = emb.select($"vec_id",
      aggregate(zip_with($"embedding", qArr, (a, b) => {
        val d = a.cast("double") - b
        d * d
      }), lit(0.0), (acc, x) => acc + x).as("d2"))
      .join(enc.select($"vec_id", $"recon_sse"), "vec_id")
      .collect()
    assert(truth.length === 500)
    truth.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val trueDist = math.sqrt(r.getAs[Double]("d2"))
      val adcDist = math.sqrt(adcAll(id))
      val slack = math.sqrt(r.getAs[Double]("recon_sse")) + 1e-4
      assert(math.abs(trueDist - adcDist) <= slack,
        s"vec $id: |${trueDist} - ${adcDist}| > $slack")
    }
    // the self-match reconstructs closest to its own query
    val adcTop = Quantization.pqAdcTopK(
      enc.select("vec_id", "codes"), query, cb, k = 3)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(adcTop.contains(0L), s"self-match not in ADC top-3: ${adcTop.toSeq}")
  }

  test("ADC scan is map-only: no exchange anywhere in the plan") {
    val codes = Quantization.pqEncode(emb, cb).select("vec_id", "codes")
      .localCheckpoint()
    val query = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val plan = Quantization.pqAdcTopK(codes, query, cb, k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("sqQuantError: per-dim error bounded by range/510; endpoints exact") {
    val errs = Quantization.sqQuantError(emb).collect()
    // worst per-dim range on this fixture, from the param table
    val mm = Quantization.sqMinMax(emb).collect()
    val worst = mm.map(r => r.getDouble(1) - r.getDouble(2)).map(math.abs).max
    val bound = worst / 510.0 + 1e-9 // half a quantization step
    assert(errs.forall(_.getAs[Double]("max_abs_err") <= bound),
      s"max err ${errs.map(_.getAs[Double]("max_abs_err")).max} vs bound $bound")
    assert(errs.forall(r => r.getAs[Double]("mean_abs_err")
      <= r.getAs[Double]("max_abs_err")))
  }

  test("quantRankFidelity: tau laws — exact at high levels, degrades, bounded") {
    val fine = Quantization.quantRankFidelity(emb, queryId = 0L, k = 10,
      levels = 65535).head()
    // 16-bit codes: near-perfect order (rounded-cosine TIES at the
    // 6-dp boundary may still swap — tau stays high, not exactly 1)
    val tauFine = fine.getAs[Double]("tau")
    assert(tauFine >= 0.9, s"16-bit tau $tauFine")
    val coarse = Quantization.quantRankFidelity(emb, queryId = 0L, k = 10,
      levels = 3).head()
    val c = coarse.getAs[Long]("concordant")
    val d = coarse.getAs[Long]("discordant")
    assert(c + d === 45L) // every pair decided (row_number — no rank ties)
    val tau = coarse.getAs[Double]("tau")
    assert(tau >= -1.0 && tau <= 1.0)
    assert(tau <= tauFine,
      "2-bit quantization cannot out-rank 16-bit on the same query")
  }

  test("quantRankFidelity rejects a missing query id") {
    val e = intercept[IllegalArgumentException] {
      Quantization.quantRankFidelity(emb, queryId = -999L, k = 5)
    }
    assert(e.getMessage.contains("-999"))
  }

  test("sqQuantError: constant dimension quantizes with zero error") {
    val const = Seq(
      (1L, Seq(1.5f, 0.0f)), (2L, Seq(1.5f, 2.0f)), (3L, Seq(1.5f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = Quantization.sqQuantError(const).collect()
      .map(x => x.getLong(0) -> x).toMap
    // dim 1 constant → code 0, dequant = vmin, error 0; dim 2 values
    // sit exactly on the range endpoints (codes 0 and 255)
    assert(r.values.forall(_.getAs[Double]("max_abs_err") === 0.0))
  }
}
