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
    val ann = Similarity.annTopK(emb, qv, k = 10, bands = 4, r = 8).collect()
    assert(ann.nonEmpty)
    // every ANN hit carries its true cosine (same arithmetic)
    ann.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      brute.get(id).foreach(c => assert(math.abs(c - r.getAs[Double]("cos_sim")) < 1e-6))
    }
    // self-match must be in its own bucket
    assert(ann.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("multi-band candidate pairs strictly contain any single band's (OR recall)") {
    val multi = Similarity.annCandidatePairs(emb, threshold = 0.3, bands = 4, r = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val single = Similarity.annCandidatePairs(emb, threshold = 0.3, bands = 1, r = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // band 0 of the 4-band run IS the single-band run → superset
    assert(single.subsetOf(multi),
      s"single-band found ${(single -- multi).size} pairs the multi-band run missed")
    assert(multi.size >= single.size)
  }

  test("multi-band ANN recall on planted near-dups (cos ≈ 0.99)") {
    // the driver corpus has no true near-dups (max pair cosine 0.51),
    // which is BELOW the regime 16-bit hyperplane bands target — so
    // plant them: each original vector gets a slightly perturbed copy
    // at id+10000 (deterministic seed → reproducible recall)
    val rnd = new scala.util.Random(42)
    val rows = emb.select($"vec_id", $"embedding").collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1))
    }
    val planted = rows.map { case (id, v) =>
      (id + 10000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }
    val corpus = (rows.toSeq ++ planted.toSeq).toDF("vec_id", "embedding")
    val truePairs = rows.map { case (id, _) => (id, id + 10000L) }.toSet
    val ann = Similarity.annCandidatePairs(corpus, threshold = 0.95,
      bands = 4, r = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val found = ann.intersect(truePairs)
    val recall = found.size.toDouble / truePairs.size
    // precision exact by construction: every reported pair really has
    // cos ≥ 0.95
    val brute = Similarity.cosineNearDupPairs(corpus, threshold = 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(ann.subsetOf(brute))
    assert(recall >= 0.80, f"multi-band recall $recall%.3f below 0.80 floor")
    // and strictly better than one band alone (the OR construction)
    val single = Similarity.annCandidatePairs(corpus, threshold = 0.95,
      bands = 1, r = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(single.intersect(truePairs).size <= found.size)
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

  test("k-means IVF: trained centroids beat-or-match full-probe recall contract") {
    val cents = Similarity.kmeansCentroids(emb, kCells = 8, iters = 3)
    assert(cents.size === 8 && cents.head._2.size === 64)
    val brute = Similarity.knnBruteForce(emb, qv, k = 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    def recall(p: Int) = Similarity.ivfTopK(emb, qv, k = 10, cents, nProbes = p)
      .collect().map(_.getAs[Long]("vec_id")).toSet.intersect(brute).size
    assert(recall(8) === 10)         // all cells probed == brute force
    assert(recall(2) >= 5)           // fixed-probe recall floor (empirical, deterministic)
    assert(recall(4) >= recall(2))   // monotone in probes
    // training moved the centroids off their seed vectors
    val seeds = emb.select($"vec_id".cast("string").as("_id"), $"embedding")
      .orderBy(md5($"_id"), $"_id").limit(8).collect()
      .map(_.getSeq[Float](1))
    assert(cents.map(_._2).toSet != seeds.toSet)
  }

  test("broadcast-join IVF assignment equals the literal-argmin form") {
    val cents = Similarity.kmeansCentroids(emb, kCells = 8, iters = 3)
    val literal = Similarity.ivfAssign(emb, cents)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val joined = Similarity.ivfAssignJoin(emb, cents)
      .as[(Long, Int)].collect().toMap
    assert(joined.size === literal.size)
    literal.foreach { case (id, cell) => assert(joined(id) === cell, s"vec $id") }
    // and the join form's plan actually broadcasts the centroid table
    val plan = Similarity.ivfAssignJoin(emb, cents).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  test("annTopKBatch: per-query self-match, brute-subset, single-query agreement") {
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = Similarity.annTopKBatch(emb, queries, k = 5, bands = 4, r = 8)
      .collect()
    val qids = queries.select("qid").as[Long].collect().toSet
    val byQ = got.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet === qids, "every query produced results")
    byQ.foreach { case (qid, rows) =>
      assert(rows.length <= 5)
      // identical signature → the query always buckets with itself
      val self = rows.find(_.getAs[Long]("vec_id") === qid)
      assert(self.isDefined, s"query $qid missing its self-match")
      assert(math.abs(self.get.getAs[Double]("cos_sim") - 1.0) < 1e-6)
      // scores descend (window-ranked)
      val sims = rows.map(_.getAs[Double]("cos_sim")).toSeq.sorted.reverse
      assert(rows.sortBy(r => (-r.getAs[Double]("cos_sim"), r.getAs[Long]("vec_id")))
        .map(_.getAs[Double]("cos_sim")).toSeq === sims)
    }
    // agreement with the single-query operator: for qid 0 both ANN
    // forms share banding, candidates, and scoring
    val single = Similarity.annTopK(emb, qv, k = 5, bands = 4, r = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSet
    val batch0 = byQ(0L)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSet
    assert(batch0 === single)
    // plan: the candidate step is a real equi-join on (band, bucket),
    // never a cartesian product
    val plan = Similarity.annTopKBatch(emb, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucket join must be an equi-join")
  }

  test("large-k IVF: join assignment parity at k=256; join-path k-means trains") {
    // 256 cells × 64 dims is past the point where the literal argmin
    // tree is the right plan (k·dim literals in one expression); the
    // broadcast-join form must assign EVERY vector to the same cell
    val rnd = new scala.util.Random(7)
    val cents256 = (0 until 256).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val literal = Similarity.ivfAssign(emb, cents256)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val joined = Similarity.ivfAssignJoin(emb, cents256)
      .as[(Long, Int)].collect().toMap
    assert(joined.size === literal.size)
    literal.foreach { case (id, cell) => assert(joined(id) === cell, s"vec $id") }
    // auto-selection: above the threshold kmeansCentroids trains via
    // the join path and still returns a full, moved centroid set
    val trained = Similarity.kmeansCentroids(emb, kCells = 200, iters = 2,
      joinThreshold = 128)
    assert(trained.size === 200 && trained.head._2.size === 64)
    // strategy-independence: join-forced and literal-forced training
    // produce identical centroids (assignments are bit-identical)
    val viaJoin = Similarity.kmeansCentroids(emb, kCells = 16, iters = 2,
      assignViaJoin = Some(true))
    val viaLiteral = Similarity.kmeansCentroids(emb, kCells = 16, iters = 2,
      assignViaJoin = Some(false))
    assert(viaJoin === viaLiteral)
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

  test("int8 quantization: all-zero vector quantizes to zeros, no NaN cast") {
    val (q, s) = Similarity.quantizeInt8(col("embedding"))
    val row = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
      .select(q.as("q"), s.as("s")).head()
    assert(row.getSeq[Byte](0).forall(_ === 0.toByte))
    // the clamped scale survives the float round-trip as a positive value
    assert(row.getFloat(1) > 0.0f)
  }

  test("semanticNearDupPairs: exactly the within-cell brute pairs; cap law") {
    val e = emb
    val cents = Similarity.kmeansCentroids(e, kCells = 8, iters = 3)
    val sem = Similarity.semanticNearDupPairs(e, cents, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosineNearDupPairs(e, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(brute))
    // within-cell EXACTNESS: brute pairs restricted to co-assigned
    // vectors == the semantic result (the only loss is cell splits)
    val cellOf = Similarity.ivfAssign(e, cents)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val bruteSameCell = brute.filter { case (a, b) => cellOf(a) == cellOf(b) }
    assert(sem === bruteSameCell)
    // planted near-dups in the testdata are tight (cos ≥ 0.99) →
    // co-located by any sane quantizer; require high recall on them
    val tight = Similarity.cosineNearDupPairs(e, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    if (tight.nonEmpty) {
      val got = sem.intersect(tight).size.toDouble / tight.size
      assert(got >= 0.9, s"planted recall $got")
    }
    // hot-cell guard: cap 1 leaves no comparable pairs
    assert(Similarity.semanticNearDupPairs(e, cents, 0.4,
      maxCell = Some(1L)).count() === 0L)
  }

  test("cosineNearDupPairs refuses inputs beyond its size guard") {
    // the operator is O(n²) by construction — the guard must throw
    // BEFORE launching the cartesian job, and the message must route
    // callers to the scale paths
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(emb, threshold = 0.5, maxRows = 10L)
    }
    assert(e.getMessage.contains("annCandidatePairs"))
    assert(e.getMessage.contains("semanticNearDupPairs"))
    // and under the guard the operator still works
    assert(Similarity.cosineNearDupPairs(emb.limit(20), threshold = 0.0)
      .count() > 0)
  }

  test("cosineNearDupPairs is symmetric-free (a < b) and thresholded") {
    val pairs = Similarity.cosineNearDupPairs(emb.limit(50), threshold = 0.3)
      .collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos_sim") >= 0.3)
    }
  }

  test("retrievalMetrics: recall and reciprocal rank by hand") {
    // q1: truth {10,11}, retrieved ranks: 20(1), 10(2), 30(3) → hit 10
    // at rank 2 → recall 1/2, rr 1/2. q2: no hits → 0, 0.
    val retrieved = Seq(
      (1L, 20L, 0.9), (1L, 10L, 0.8), (1L, 30L, 0.7),
      (2L, 40L, 0.9), (2L, 41L, 0.8)
    ).toDF("qid", "vec_id", "cos_sim")
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 99L)).toDF("qid", "vec_id")
    val m = Similarity.retrievalMetrics(retrieved, truth).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_truth"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("recall"),
        r.getAs[Double]("rr"))).toMap
    assert(m(1L) === ((2L, 1L, 0.5, 0.5)))
    assert(m(2L) === ((1L, 0L, 0.0, 0.0)))
  }

  test("labelOutliers: zero-norm vector gets null cosine, ranks last, never flagged") {
    val vecs = Seq(
      (0L, Seq(1f, 0f), 7), (1L, Seq(0.9f, 0.1f), 7),
      (2L, Seq(-1f, 0f), 7), (3L, Seq(0f, 0f), 7)  // zero vector
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelOutliers(vecs, bottomK = 1)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(r.fieldIndex("cos_centroid"))), r.getAs[Long]("rk"),
          r.getAs[Boolean]("is_outlier"))).toMap
    assert(out(3L)._1.isEmpty)               // no cosine exists
    assert(out(3L)._2 === 4L)                // nulls rank LAST
    assert(!out(3L)._3)                      // and never flagged
    // the real outlier (opposite direction) takes the slot
    assert(out(2L)._3)
  }

  test("projectRandom: linear, deterministic, map-only") {
    val a = Seq(1f, 2f, 3f, 4f)
    val b = Seq(0.5f, -1f, 0f, 2f)
    val sumAb = a.zip(b).map { case (x, y) => x + y }
    val vecs = Seq((0L, a), (1L, b), (2L, sumAb)).toDF("vec_id", "embedding")
    val proj = Similarity.projectRandom(vecs, outDim = 6, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // linearity: P(a + b) = P(a) + P(b) (up to float-sum rounding)
    proj(0L).zip(proj(1L)).zip(proj(2L)).foreach { case ((pa, pb), pab) =>
      assert(math.abs(pa + pb - pab) < 1e-5)
    }
    // deterministic family: a second call gives identical doubles
    val again = Similarity.projectRandom(vecs, outDim = 6, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again === proj)
    // no shuffle anywhere
    val plan = Similarity.projectRandom(vecs, outDim = 6, dim = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("projectRandom: JL norm preservation in expectation (×√(out/12))") {
    // for U[-0.5,0.5) components, E‖Pv‖² = outDim/12 · ‖v‖² — the
    // mean norm_ratio over the corpus should sit near √(16/12)
    val projected = Similarity.projectRandom(emb, outDim = 16)
      .join(emb.select($"vec_id",
        Similarity.dot($"embedding", $"embedding").as("v2")), "vec_id")
      .select((aggregate(transform($"proj", x => x * x),
        lit(0.0), (acc, x) => acc + x) / $"v2").as("r2"))
    val meanR2 = projected.agg(avg("r2")).head().getDouble(0)
    val expected = 16.0 / 12.0
    assert(math.abs(meanR2 - expected) / expected < 0.25,
      s"mean ‖Pv‖²/‖v‖² = $meanR2, expected ≈ $expected")
  }

  test("rbo: identical rankings → 1−p^k; disjoint → 0; prefix beats suffix") {
    def ranking(qid: Long, ids: Seq[Long], rankCol: String) =
      ids.zipWithIndex.map { case (id, i) => (qid, id, i + 1) }
        .toDF("qid", "vec_id", rankCol)
    val a = ranking(1L, 1L to 10L, "rank_a")
    val same = Similarity.rbo(a, ranking(1L, 1L to 10L, "rank_b"), k = 10).head()
    // overlap@d = d ⇒ RBO = (1−p)·Σ p^(d−1) = 1 − p^k
    assert(math.abs(same.getAs[Double]("rbo") - (1.0 - math.pow(0.9, 10))) < 1e-5)
    assert(same.getAs[Long]("n_common") === 10L)

    val disj = Similarity.rbo(a, ranking(1L, 11L to 20L, "rank_b"), k = 10).head()
    assert(disj.getAs[Double]("rbo") === 0.0)
    assert(disj.getAs[Long]("n_common") === 0L)

    // agreement at the TOP is worth more than the same agreement at
    // the bottom: share ranks 1-5 vs share ranks 6-10
    val top = Similarity.rbo(a,
      ranking(1L, (1L to 5L) ++ (16L to 20L), "rank_b"), k = 10).head()
    val bottom = Similarity.rbo(a,
      ranking(1L, (11L to 15L) ++ (6L to 10L), "rank_b"), k = 10).head()
    assert(top.getAs[Double]("rbo") > bottom.getAs[Double]("rbo"))
  }

  test("hubness: histogram counts every vector once; planted hub dominates") {
    // 20 unit-ish vectors on two axes + one "hub" near the centroid
    // of everything: the hub must out-occur any other vector.
    val rows = (0L until 20L).map { i =>
      val v = new Array[Float](4)
      v(if (i % 2 == 0) 0 else 1) = 1.0f
      v(2) = (i % 7).toFloat / 100f
      (i, v)
    } :+ ((20L, Array(0.5f, 0.5f, 0.02f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val hist = Similarity.hubness(df, k = 3, sampleMod = 2).collect()
      .map(r => r.getAs[Long]("k_occurrence") -> r.getAs[Long]("n_vecs")).toMap
    assert(hist.values.sum === 21L) // every vector lands in exactly one bin
    // per-vector occurrence counts to find the hub's count
    val maxOcc = hist.keys.max
    assert(maxOcc > 3, s"expected a dominant hub, histogram: $hist")
  }

  test("hubness: occurrence mass equals queries × k when n is ample") {
    val hist = Similarity.hubness(emb, k = 5, sampleMod = 10).collect()
    val mass = hist.map(r =>
      r.getAs[Long]("k_occurrence") * r.getAs[Long]("n_vecs")).sum
    val nQueries = emb.filter($"vec_id" % 10 === 0).count()
    assert(mass === nQueries * 5)
  }

  test("rrfFuse: a vector top-ranked by BOTH metrics is the fused winner") {
    val out = Similarity.rrfFuse(emb, qv, k = 10).collect()
    // vec 0 IS the query: cosine 1.0 and l2 0.0 → rank 1 on both
    assert(out.head.getAs[Long]("vec_id") === 0L)
    assert(out.head.getAs[Long]("rank_cos") === 1L)
    assert(out.head.getAs[Long]("rank_l2") === 1L)
    // fused order is non-increasing in rrf_pico
    val picos = out.map(_.getAs[Long]("rrf_pico")).toSeq
    assert(picos === picos.sorted.reverse)
  }

  test("rrfFuse: balanced ranks beat a cos win with a bad l2 rank") {
    // v1: cos rank 1, l2 rank 3 → 1/61 + 1/63
    // v3: cos rank 2, l2 rank 1 → 1/62 + 1/61  (wins)
    // v2: cos rank 3, l2 rank 2 → 1/63 + 1/62
    val q = Seq(Tuple1(Array(10.0f, 0.0f))).toDF("qv")
    val df = Seq(
      (1L, Array(20.0f, 0.1f)),   // near-collinear but far → cos 1st, l2 3rd
      (2L, Array(10.0f, 3.0f)),   // cos 3rd, l2 2nd
      (3L, Array(9.0f, 0.5f))     // l2-closest, cos 2nd
    ).toDF("vec_id", "embedding")
    val out = Similarity.rrfFuse(df, q, k = 3).collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("rank_cos"), r.getAs[Long]("rank_l2"))).toMap
    assert(byId(1L) === ((1L, 3L)) && byId(3L) === ((2L, 1L)) &&
      byId(2L) === ((3L, 2L)), s"construction drifted: $byId")
    assert(out.head.getAs[Long]("vec_id") === 3L)
  }

  private def retrDF(rows: (Long, Long, Double)*) =
    rows.toDF("qid", "vec_id", "cos_sim")

  test("ndcgAtK: ideal-order retrieval scores exactly 1") {
    val graded = Seq((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1))
      .toDF("qid", "vec_id", "grade")
    val retr = retrDF((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))
    val out = Similarity.ndcgAtK(retr, graded, k = 10).collect().head
    assert(out.getAs[Long]("n_hit") === 3L)
    assert(out.getAs[Double]("ndcg") === 1.0)
  }

  test("ndcgAtK: hand-computed inversion; zero-overlap query → 0 on spine") {
    // grades 3@rank2, 2@rank1 → dcg = 2·w1 + 3·w2; idcg = 3·w1 + 2·w2
    val graded = Seq((1L, 10L, 3), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("qid", "vec_id", "grade")
    val retr = retrDF((1L, 11L, 0.9), (1L, 10L, 0.8), (2L, 99L, 0.5))
    val w = Similarity.ndcgWeights(10).toMap
    val expected = math.rint(1e6 * (2.0 * w(1) + 3 * w(2)) /
      (3.0 * w(1) + 2 * w(2))) / 1e6
    val out = Similarity.ndcgAtK(retr, graded, k = 10).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("ndcg")).toMap
    assert(out(1L) === expected)
    assert(out(2L) === 0.0)
  }

  test("ndcgAtK: truncation at k ignores deeper grades") {
    val graded = (10L to 20L).map(i => (1L, i, 1)).toDF("qid", "vec_id", "grade")
    // retrieve item 20 at rank 1 with k = 1: dcg = w1, idcg(k=1) = w1
    val out = Similarity.ndcgAtK(retrDF((1L, 20L, 0.9)), graded, k = 1)
      .collect().head
    assert(out.getAs[Double]("ndcg") === 1.0)
  }

  test("ndcgCurve: agrees with ndcgAtK at each cutoff; mean at k=1 ideal") {
    val graded = Seq((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1),
      (2L, 20L, 2), (2L, 21L, 1)).toDF("qid", "vec_id", "grade")
    val retr = retrDF((1L, 11L, 0.9), (1L, 10L, 0.8), (1L, 12L, 0.7),
      (2L, 21L, 0.9), (2L, 20L, 0.8))
    val curve = Similarity.ndcgCurve(retr, graded, ks = Seq(1, 5, 10))
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    for (k <- Seq(1, 5, 10)) {
      val single = Similarity.ndcgAtK(retr, graded, k = k).collect()
        .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("ndcg")).toMap
      for (q <- Seq(1L, 2L))
        assert(curve(q).getAs[Double](s"ndcg_at_$k") === single(q),
          s"curve/single drift at k=$k qid=$q")
    }
  }

  test("ndcgCurve monotonicity: relevance-ordered swap never increases ndcg") {
    // base ranking ordered by grade (3,2,1,1) — the ideal; then every
    // adjacent swap that puts a lower grade earlier must not increase
    // ndcg at ANY cutoff
    val graded = Seq((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1), (1L, 13L, 1))
      .toDF("qid", "vec_id", "grade")
    val ids = Seq(10L, 11L, 12L, 13L)
    def scoresFor(order: Seq[Long]) =
      retrDF(order.zipWithIndex.map { case (id, i) =>
        (1L, id, 0.9 - 0.1 * i) }: _*)
    def ndcgs(order: Seq[Long]): Map[Int, Double] =
      Seq(1, 5, 10).map { k =>
        k -> Similarity.ndcgCurve(scoresFor(order), graded, Seq(1, 5, 10))
          .collect().head.getAs[Double](s"ndcg_at_$k")
      }.toMap
    val base = ndcgs(ids)
    assert(Seq(1, 5, 10).forall(k => base(k) === 1.0), s"ideal != 1: $base")
    for (i <- 0 until 3) {
      val swapped = ids.updated(i, ids(i + 1)).updated(i + 1, ids(i))
      val after = ndcgs(swapped)
      for (k <- Seq(1, 5, 10))
        assert(after(k) <= base(k) + 1e-9,
          s"swap at $i increased ndcg_at_$k: ${base(k)} -> ${after(k)}")
    }
    // and a non-adjacent relevance-ordered swap (rank 1 <-> rank 4)
    val far = ndcgs(Seq(13L, 11L, 12L, 10L))
    for (k <- Seq(1, 5, 10))
      assert(far(k) <= base(k) + 1e-9, s"far swap increased ndcg_at_$k")
  }

  test("averagePrecisionAtK: hand-computed AP with a miss interleaved") {
    // truth {a,b}; retrieved a(hit,p=1/1), x(miss), b(hit,p=2/3)
    // AP = (1 + 2/3) / 2 = 0.833333
    val truth = Seq((1L, 10L), (1L, 11L)).toDF("qid", "vec_id")
    val retr = retrDF((1L, 10L, 0.9), (1L, 99L, 0.8), (1L, 11L, 0.7))
    val out = Similarity.averagePrecisionAtK(retr, truth, k = 10)
      .collect().head
    assert(out.getAs[Long]("n_truth") === 2L)
    assert(out.getAs[Long]("n_hit") === 2L)
    assert(out.getAs[Double]("ap") === 0.833333)
  }

  test("averagePrecisionAtK: perfect prefix → 1; no hits → 0") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("qid", "vec_id")
    val retr = retrDF((1L, 10L, 0.9), (1L, 11L, 0.8), (2L, 99L, 0.9))
    val out = Similarity.averagePrecisionAtK(retr, truth, k = 10).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("ap")).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
  }

  test("ivfRecallCurve: recall monotone in nprobe and exactly 1.0 " +
    "when every cell is probed") {
    import spark.implicits._
    // two tight clusters on opposite axes; query rides cluster 1
    val e = ((0 until 12).map(i => (i.toLong,
        Array(1.0f + i * 0.01f, 0.1f * (i % 3)))) ++
      (12 until 24).map(i => (i.toLong,
        Array(0.1f * (i % 3), 1.0f + i * 0.01f))))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(e, kCells = 2, iters = 4)
    val queries = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val out = Similarity.ivfRecallCurve(e, queries, k = 5, cents,
      probes = Seq(1, 2)).collect()
      .map(r => r.getAs[Int]("nprobe") -> r.getAs[Double]("mean_recall"))
      .toMap
    // probing every cell IS brute force
    assert(out(2) === 1.0)
    assert(out(1) <= out(2))
    // the near cluster holds all true neighbors here → already perfect
    assert(out(1) === 1.0)
  }

  test("mrrAtK: first-hit reciprocal, zero on a whiff, depth cutoff") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("qid", "vec_id")
    // q1: miss, hit@2 → rr 0.5; q2: hit@1 → 1.0; q3: no hits → 0
    val retr = retrDF((1L, 99L, 0.9), (1L, 10L, 0.8), (1L, 11L, 0.7),
      (2L, 20L, 0.9), (3L, 98L, 0.9))
    val out = Similarity.mrrAtK(retr, truth, k = 10).collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("first_hit_rank"), r.getAs[Double]("rr"))).toMap
    assert(out(1L) === ((2L, 0.5)))
    assert(out(2L) === ((1L, 1.0)))
    assert(out(3L) === ((0L, 0.0)))
    // depth cutoff: the only hit sits at rank 3 but k=2 → whiff
    val shallow = Similarity.mrrAtK(
      retrDF((1L, 97L, 0.9), (1L, 96L, 0.8), (1L, 10L, 0.7)),
      Seq((1L, 10L)).toDF("qid", "vec_id"), k = 2).collect().head
    assert(shallow.getAs[Long]("first_hit_rank") === 0L)
    assert(shallow.getAs[Double]("rr") === 0.0)
  }

  test("dimensionStats: hand-computed mean/var/zero-rate per dim") {
    // dim1: 1, 3 → mean 2, var 1; dim2: 0, 0 → dead dim
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.dimensionStats(df).collect()
      .map(r => r.getAs[Long]("dim") -> r).toMap
    assert(out(1L).getAs[Double]("mean") === 2.0)
    assert(out(1L).getAs[Double]("variance") === 1.0)
    assert(out(1L).getAs[Double]("zero_rate") === 0.0)
    assert(out(1L).getAs[Double]("min_v") === 1.0)
    assert(out(1L).getAs[Double]("max_v") === 3.0)
    assert(out(2L).getAs[Double]("variance") === 0.0)
    assert(out(2L).getAs[Double]("zero_rate") === 1.0)
  }

  test("dimensionStats: bit-identical under repartitioning") {
    val df = (1L to 200L).map(i =>
        (i, Array.tabulate(4)(d => ((i * (d + 3)) % 17).toFloat / 7f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.dimensionStats(df).collect().toSeq
    val b = Similarity.dimensionStats(df.repartition(7)).collect().toSeq
    assert(a === b)
  }

  test("pcaTopComponent: planted dominant axis recovered with positive sign") {
    // variance lives almost entirely on dim 1 (values ±2), with tiny
    // noise on dim 3 — the top component must load ≈±1 on dim 1 and
    // ≈0 elsewhere; the all-positive start pins the sign convention
    val rng = new scala.util.Random(7)
    val df = (1 to 400).map { i =>
      val main = if (i % 2 == 0) 2.0f else -2.0f
      val noise = (rng.nextFloat() - 0.5f) * 0.01f
      (i.toLong, Array.tabulate(4)(d =>
        if (d == 0) main else if (d == 2) noise else 0.0f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pcaTopComponent(df, dim = 4, iterations = 2)
      .collect().map(r => r.getAs[Long]("dim") -> r).toMap
    assert(out.size === 4)
    val loadings = (1L to 4L).map(d => out(d).getAs[Double]("loading"))
    // L1-normalized: |loadings| sum to 1 within micro quantization
    assert(math.abs(loadings.map(math.abs).sum - 1.0) < 1e-5)
    assert(math.abs(loadings.head) > 0.99, s"dim1 loading ${loadings.head}")
    assert(loadings.tail.forall(l => math.abs(l) < 0.01))
    // lambda proxy ≈ variance of the dominant axis (4.0) under the
    // near-one-hot loading
    val lam = out(1L).getAs[Double]("lambda_l1")
    assert(lam > 3.5 && lam < 4.5, s"lambda_l1 $lam")
  }

  test("pcaTopComponent: bit-identical under repartitioning") {
    val df = (1L to 300L).map(i =>
        (i, Array.tabulate(4)(d => ((i * (d + 3)) % 17).toFloat / 7f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.pcaTopComponent(df, dim = 4).collect().toSeq
    val b = Similarity.pcaTopComponent(df.repartition(7), dim = 4)
      .collect().toSeq
    assert(a === b)
  }
  test("daviesBouldin: two hand clusters give exact scatter and ratio") {
    // A: (0,0),(0,2) → centroid (0,1), mean dist 1; B: (10,0),(10,2)
    // → centroid (10,1), mean dist 1; d(A,B) = 10 → R = (1+1)/10 = 0.2
    val rows = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 2f), 0),
      (3L, Array(10f, 0f), 1), (4L, Array(10f, 2f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.daviesBouldin(rows).collect()
      .map(r => r.getAs[String]("label") -> r).toMap
    assert(out.keySet === Set("0", "1"))
    out.foreach { case (lab, r) =>
      assert(r.getAs[Long]("n_members") === 2L)
      assert(math.abs(r.getAs[Double]("scatter") - 1.0) < 1e-6, r.toString)
      assert(math.abs(r.getAs[Double]("r_max") - 0.2) < 1e-6, r.toString)
      assert(r.getAs[String]("worst_label") === (if (lab == "0") "1" else "0"))
    }
  }

  test("daviesBouldin: overlapping clusters score worse than separated ones") {
    def cluster(label: Int, cx: Float) = (0 until 8).map(i =>
      ((label * 100 + i).toLong,
        Array(cx + (i % 4) * 0.5f, (i / 4) * 0.5f), label))
    val apart = (cluster(0, 0f) ++ cluster(1, 50f))
      .toDF("vec_id", "embedding", "label")
    val close = (cluster(0, 0f) ++ cluster(1, 1f))
      .toDF("vec_id", "embedding", "label")
    val rApart = Similarity.daviesBouldin(apart).collect()
      .map(_.getAs[Double]("r_max")).max
    val rClose = Similarity.daviesBouldin(close).collect()
      .map(_.getAs[Double]("r_max")).max
    assert(rClose > rApart * 10, s"close=$rClose apart=$rApart")
  }
  test("embeddingDrift: planted dimension shift, constant dim stays null") {
    // dim1: even half {0,2} vs odd half {10,12} → means 1 vs 11,
    // pooled std √2... ss each = 2, pooled = √((2+2)/2) = √2;
    // shift = −10/√2. dim2 constant 5 both halves → gap 0, NULL shift
    val rows = Seq(
      (0L, Array(0f, 5f)), (2L, Array(2f, 5f)),
      (1L, Array(10f, 5f)), (3L, Array(12f, 5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingDrift(rows).collect()
      .map(r => r.getAs[Long]("i") -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Double]("mean_a") === 1.0)
    assert(d1.getAs[Double]("mean_b") === 11.0)
    assert(d1.getAs[Double]("abs_gap") === 10.0)
    assert(math.abs(d1.getAs[Double]("std_shift") -
      (-10.0 / math.sqrt(2))) < 1e-5)
    val d2 = out(2L)
    assert(d2.getAs[Double]("abs_gap") === 0.0)
    assert(d2.isNullAt(d2.fieldIndex("std_shift"))) // zero variance
  }

  test("calinskiHarabasz: hand clusters ~50, separation beats mixing, degenerates null") {
    import spark.implicits._
    val sep = Seq((0L, Array(0.0f), 0), (1L, Array(0.2f), 0),
                  (2L, Array(1.0f), 1), (3L, Array(1.2f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.calinskiHarabasz(sep).head()
    assert(r.getAs[Long]("n_points") === 4L)
    assert(r.getAs[Long]("n_clusters") === 2L)
    assert(math.abs(r.getAs[Double]("between_ss") - 1.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("within_ss") - 0.04) < 1e-4)
    assert(math.abs(r.getAs[Double]("ch_index") - 50.0) < 1e-2)
    // shuffled labels on the same points score far lower
    val mixed = Seq((0L, Array(0.0f), 0), (1L, Array(0.2f), 1),
                    (2L, Array(1.0f), 0), (3L, Array(1.2f), 1))
      .toDF("vec_id", "embedding", "label")
    val m = Similarity.calinskiHarabasz(mixed).head()
    assert(m.getAs[Double]("ch_index") < 1.0)
    // one label -> K < 2 -> NULL index, not an error
    val one = Seq((0L, Array(0.0f), 0), (1L, Array(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val o = Similarity.calinskiHarabasz(one).head()
    assert(o.isNullAt(o.fieldIndex("ch_index")))
  }

  test("mmrRerank: diversity overrules raw relevance; λ=1 degenerates " +
    "to top-k; short pools stop early") {
    // candidate 10 ≈ candidate 11 (near-identical directions);
    // candidate 12 is orthogonal-ish with lower relevance. Plain
    // relevance ranks (10, 11, 12); MMR must pick 12 second.
    val cands = Seq(
      (0L, 10L, Array(1.0f, 0.0f, 0.0f), 0.99),
      (0L, 11L, Array(0.999f, 0.045f, 0.0f), 0.98),
      (0L, 12L, Array(0.0f, 1.0f, 0.0f), 0.60))
      .toDF("qid", "vec_id", "embedding", "rel")
    val picked = Similarity.mmrRerank(cands, k = 3, lam = 0.7)
      .select("rank", "vec_id").as[(Int, Long)].collect().toMap
    assert(picked === Map(1 -> 10L, 2 -> 12L, 3 -> 11L))
    // λ=1: the diversity term vanishes — MMR IS relevance order
    val pure = Similarity.mmrRerank(cands, k = 3, lam = 1.0)
      .select("rank", "vec_id").as[(Int, Long)].collect().toMap
    assert(pure === Map(1 -> 10L, 2 -> 11L, 3 -> 12L))
    // a pool smaller than k yields exactly |pool| rows, no nulls
    val short = Seq((0L, 10L, Array(1.0f, 0.0f, 0.0f), 0.9))
      .toDF("qid", "vec_id", "embedding", "rel")
    assert(Similarity.mmrRerank(short, k = 3, lam = 0.7).count() === 1L)
    // per-query independence: a second query reranks on its own pool
    val two = cands.unionByName(Seq(
      (1L, 20L, Array(0.0f, 0.0f, 1.0f), 0.8),
      (1L, 21L, Array(0.0f, 1.0f, 0.0f), 0.7))
      .toDF("qid", "vec_id", "embedding", "rel"))
    val byQ = Similarity.mmrRerank(two, k = 2, lam = 0.7)
      .select("qid", "rank", "vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(byQ(0L) === Map(1 -> 10L, 2 -> 12L))
    assert(byQ(1L) === Map(1 -> 20L, 2 -> 21L))
  }

  test("bitextMarginMine: reciprocal-top1 only, margin cancels hubness, " +
    "refusal guard") {
    import spark.implicits._
    // planted parallel corpus: a_i aligns with b_i (near-identical
    // directions); b9 is a HUB pointing halfway at everything
    val a = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val b = Seq(
      (10L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (11L, Array(0.1f, 0.9f, 0.0f, 0.0f)),
      (12L, Array(0.0f, 0.1f, 0.9f, 0.0f)),
      (19L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.bitextMarginMine(a, b, kNeighbors = 2).collect()
    val pairs = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the planted alignment is mined; the hub is nobody's partner
    assert(pairs === Map(0L -> 10L, 1L -> 11L, 2L -> 12L))
    // margins clear 1 (cos far above each side's neighborhood mean)
    out.foreach(r => assert(r.getAs[Double]("margin") > 1.0, r.toString))
    // reciprocity law re-checked from first principles: each mined
    // pair is mutual top-1 under the same rounded-cos ordering
    val cosAB = for {
      ar <- a.collect(); br <- b.collect()
    } yield {
      val av = ar.getSeq[Float](1); val bv = br.getSeq[Float](1)
      val d = av.zip(bv).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(av.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(bv.map(x => x.toDouble * x).sum)
      (ar.getLong(0), br.getLong(0),
        BigDecimal(d / (na * nb)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    pairs.foreach { case (q, v) =>
      val best = cosAB.filter(_._1 == q).maxBy(t => (t._3, -t._2))._2
      val bestRev = cosAB.filter(_._2 == v).maxBy(t => (t._3, -t._1))._1
      assert(best === v && bestRev === q, s"($q,$v) not reciprocal")
    }
    // guard: refuses an unbounded pair space
    intercept[IllegalArgumentException] {
      Similarity.bitextMarginMine(a, b, kNeighbors = 2, maxPairs = 5L)
    }
    graft.engine.TrackedCache.release()
  }

  test("hardNegatives: negatives never share the query label, ranks are " +
    "contiguous, singleton-label queries drop, margin is pos-neg") {
    import spark.implicits._
    // label 0: query 0 + positive 1 (close); label 1: a CLOSER
    // different-label vector 2 (the hard negative) + far vector 3;
    // label 9: singleton query 4 (no positive → drops out)
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.8f, 0.6f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f, 0.0f), 1),
      (3L, Array(0.0f, 0.0f, 1.0f), 1),
      (4L, Array(0.0f, 1.0f, 0.0f), 9)).toDF("vec_id", "embedding", "label")
    val qs = e.filter(col("vec_id").isin(0L, 4L))
    val out = Similarity.hardNegatives(e, qs, k = 2).collect()
    // singleton-label query 4 dropped
    assert(out.map(_.getLong(0)).toSet === Set(0L))
    val rows = out.sortBy(_.getAs[Int]("neg_rank"))
    assert(rows.map(_.getAs[Int]("neg_rank")).toSeq === Seq(1, 2))
    // hardest negative is the planted near-collinear wrong-label vec 2
    assert(rows.head.getAs[Long]("neg_id") === 2L)
    assert(rows.head.getAs[Long]("pos_id") === 1L)
    // vec 2 is closer to the query than the positive → negative margin
    assert(rows.head.getAs[Double]("margin") < 0.0)
    // margin arithmetic
    rows.foreach { r =>
      assert(r.getAs[Double]("margin") ===
        BigDecimal(r.getAs[Double]("pos_cos") - r.getAs[Double]("neg_cos"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // negatives carry a different label by construction: the only
      // same-label candidate (vec 1) is the positive, never a negative
      assert(r.getAs[Long]("neg_id") !== 1L)
    }
  }

  test("nnLabelEval: planted clusters classify correctly, a lone " +
    "class misclassifies, and the query never matches itself") {
    // two tight clusters (labels 0, 1) + one isolated vector (label 9)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f, 0f)
    val corpus = Seq(
      (0L, v(1, 0), 0), (1L, v(0.99, 0.01), 0), (2L, v(0.98, 0.02), 0),
      (10L, v(0, 1), 1), (11L, v(0.01, 0.99), 1), (12L, v(0.02, 0.98), 1),
      (20L, v(0.7, 0.7), 9)
    ).toDF("vec_id", "embedding", "label")
    val queries = corpus.select($"vec_id".as("qid"),
      $"embedding".as("qv"), $"label".as("q_label"))
    val out = Similarity.nnLabelEval(corpus, queries).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    assert(out.size === 7)
    out.values.foreach(r =>
      assert(r.getAs[Long]("nn_id") !== r.getAs[Long]("qid")))
    Seq(0L, 1L, 2L, 10L, 11L, 12L).foreach { q =>
      assert(out(q).getAs[Long]("correct") === 1L, s"qid $q")
    }
    // the lone label-9 vector's nearest neighbor is some cluster
    // member — never its own class
    assert(out(20L).getAs[Long]("correct") === 0L)
  }

  test("knnShapley: matches the brute Jia et al. recurrence, the " +
    "efficiency property holds per query, and same-label neighbors " +
    "outvalue cross-label ones") {
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    // two planted clusters + queries drawn from both
    val corpus = Seq(
      (0L, v(1, 0), 0L), (1L, v(0.99, 0.01), 0L),
      (2L, v(0.98, 0.02), 0L), (3L, v(0.97, 0.05), 0L),
      (10L, v(0, 1), 1L), (11L, v(0.01, 0.99), 1L),
      (12L, v(0.02, 0.98), 1L), (13L, v(0.05, 0.97), 1L))
    val qIds = Seq(0L, 10L)
    val k = 2
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) =>
        x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def brute(q: (Long, Array[Float], Long)): Map[Long, Double] = {
      val sorted = corpus.filter(_._1 != q._1)
        .map(c => (c._1, cos6(c._2, q._2), c._3))
        .sortBy(t => (-t._2, t._1))
      val n = sorted.size
      val m = sorted.map(t => if (t._3 == q._3) 1.0 else 0.0)
      val s = new Array[Double](n)
      s(n - 1) = m(n - 1) / n
      for (i <- n - 2 to 0 by -1)
        s(i) = s(i + 1) + (m(i) - m(i + 1)) / k *
          math.min(k, i + 1).toDouble / (i + 1)
      // efficiency: the values sum to the full-set K-NN utility
      val util = m.take(k).sum / k
      assert(math.abs(s.sum - util) < 1e-12, "efficiency property")
      sorted.zipWithIndex.map { case ((id, _, _), i) => id -> s(i) }
        .toMap
    }
    val refMaps = qIds.map(q => brute(corpus.find(_._1 == q).get))
    val refMean = corpus.map(_._1).map { id =>
      val vals = refMaps.flatMap(_.get(id))
      id -> vals.sum / vals.size
    }.toMap
    val queries = corpus.filter(c => qIds.contains(c._1))
      .toDF("qid", "qv", "q_label")
    val out = Similarity.knnShapley(
      corpus.toDF("vec_id", "embedding", "label"), queries, k = k)
      .collect()
    graft.engine.TrackedCache.release()
    val got = out.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Double]("mean_shapley")).toMap
    assert(got.keySet === corpus.map(_._1).toSet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - refMean(id)) < 2e-6, s"vec $id")
    }
    // curation signal: cluster members (same label as a query, near
    // it) carry the value; the far cross-label cluster contributes
    // less to each query — per-label mean value is higher within
    val mean0 = Seq(1L, 2L, 3L).map(got).sum / 3
    val mean1 = Seq(11L, 12L, 13L).map(got).sum / 3
    assert(mean0 > 0 && mean1 > 0) // both clusters serve their query
    // the roster bound is ENFORCED, not advisory: cost is Q·N, so an
    // oversized query roster is refused like cosineNearDupPairs
    val err = intercept[IllegalArgumentException] {
      Similarity.knnShapley(corpus.toDF("vec_id", "embedding", "label"),
        queries, k = k, maxQueries = 1L)
    }
    assert(err.getMessage.contains("maxQueries"))
  }

  test("bertScore: shuffled-identical token sets score exactly 1, " +
    "orthogonal pairs score 0, asymmetric subsets split P/R, NULL " +
    "and one-sided rows drop") {
    def v(x: Double, y: Double, z: Double) =
      Array(x.toFloat, y.toFloat, z.toFloat)
    def run(c: org.apache.spark.sql.DataFrame,
            r: org.apache.spark.sql.DataFrame) = {
      val out = Similarity.bertScore(c, r).collect()
      graft.engine.TrackedCache.release()
      out.map(x => x.getAs[Long]("pair_id") -> x).toMap
    }
    // pair 0: same 3 tokens, REF side shuffled ⇒ P = R = F = 1
    // pair 1: cand tokens ⊥ ref tokens ⇒ all cosines 0 ⇒ F NULL-den=0
    //          guard: P = R = 0, denominator 0 ⇒ f_score NULL
    // pair 2: cand = {a}, ref = {a, b⊥a} ⇒ P = 1, R = ½, F = ⅔
    val a = v(1, 0, 0); val b = v(0, 1, 0); val cz = v(0, 0, 1)
    val cand = Seq(
      (0L, 0L, a), (0L, 1L, b), (0L, 2L, cz),
      (1L, 0L, a), (1L, 1L, b),
      (2L, 0L, a)
    ).toDF("pair_id", "tok_id", "vec")
    val ref = Seq(
      (0L, 0L, cz), (0L, 1L, a), (0L, 2L, b), // shuffled order
      (1L, 0L, cz), (1L, 1L, cz),
      (2L, 0L, a), (2L, 1L, b)
    ).toDF("pair_id", "tok_id", "vec")
    val out = run(cand, ref)
    assert(out(0L).getAs[Double]("p_score") === 1.0 &&
      out(0L).getAs[Double]("r_score") === 1.0 &&
      out(0L).getAs[Double]("f_score") === 1.0)
    assert(out(1L).getAs[Double]("p_score") === 0.0 &&
      out(1L).getAs[Double]("r_score") === 0.0 &&
      out(1L).isNullAt(out(1L).fieldIndex("f_score")))
    assert(out(2L).getAs[Double]("p_score") === 1.0 &&
      out(2L).getAs[Double]("r_score") === 0.5 &&
      math.abs(out(2L).getAs[Double]("f_score") - 2.0 / 3) < 1e-6)

    // NULL vec and pair-only-on-one-side rows disappear
    val candN = Seq((0L, Some(0L), Some(a)), (0L, Some(1L), None),
      (7L, Some(0L), Some(a))).toDF("pair_id", "tok_id", "vec")
    val refN = Seq((0L, Some(0L), Some(a)))
      .toDF("pair_id", "tok_id", "vec")
    val outN = run(candN, refN)
    assert(outN.keySet === Set(0L) &&
      outN(0L).getAs[Long]("n_cand") === 1L)
  }

  test("clusterTvDistance: identical sets score 0, disjoint modes " +
    "score 1, and TV is symmetric") {
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val codebook = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f)))
    val a = Seq((0L, v(1, 0)), (1L, v(0.99, 0.01)), (2L, v(0.98, 0.01)))
      .toDF("vec_id", "embedding")
    val b = Seq((10L, v(0, 1)), (11L, v(0.01, 0.99)))
      .toDF("vec_id", "embedding")
    def tv(x: org.apache.spark.sql.DataFrame,
           y: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.clusterTvDistance(x, y, codebook).collect()
      graft.engine.TrackedCache.release()
      r.head.getAs[Double]("tv")
    }
    assert(tv(a, a) === 0.0)
    assert(tv(a, b) === 1.0) // all of A in cell 0, all of B in cell 1
    assert(tv(a, b) === tv(b, a))
    // mixed: A = 3 in cell 0; C = 1+1 across cells ⇒
    // TV = ½(|1−0.5| + |0−0.5|) = 0.5
    val c = Seq((20L, v(1, 0)), (21L, v(0, 1))).toDF("vec_id", "embedding")
    assert(tv(a, c) === 0.5)
    // per-cell bookkeeping: counts land on the spine, zero-filled
    val cells = Similarity.clusterTvDistance(a, b, codebook).collect()
      .map(r => r.getAs[Int]("cell") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toMap
    graft.engine.TrackedCache.release()
    assert(cells(0) === ((3L, 0L)) && cells(1) === ((0L, 2L)))
  }
}
