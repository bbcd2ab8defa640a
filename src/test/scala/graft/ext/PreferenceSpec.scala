package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def roster(rows: (Long, Long, Long)*) =
    rows.toDF("prompt_id", "doc_id", "q")

  test("pairwiseVotes: noiseMod=0 is the pure quality order — higher " +
    "quality always wins, ties break toward the smaller id") {
    val r = roster((0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 20L))
    val v = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "s", noiseMod = 0).collect()
      .map(x => (x.getLong(1), x.getLong(2))).toSet
    // 2 beats 1 (20>10), 3 beats 1 (20>10), 2 beats 3 (tie, smaller id)
    assert(v === Set((2L, 1L), (3L, 1L), (2L, 3L)))
  }

  test("audit: a transitive prompt has zero cycles, consistency 1, and " +
    "the Copeland winner is the quality maximum") {
    val r = roster((0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L), (0L, 4L, 40L))
    val v = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "s", noiseMod = 0)
    val a = Preference.audit(r, v, "prompt_id", "doc_id").head()
    assert(a.getLong(1) === 4L)          // n_resp
    assert(a.getLong(2) === 6L)          // n_pairs
    assert(a.getLong(3) === 0L)          // n_cycles
    assert(a.getDouble(4) === 1.0)       // consistency
    assert(a.getLong(5) === 4L)          // best_id
    assert(a.getLong(6) === 3L)          // best_wins
    graft.engine.TrackedCache.release()
  }

  test("audit: a planted 3-cycle is counted exactly once and zeroes the " +
    "consistency of its prompt only") {
    // prompt 0: 1>2, 2>3, 3>1 (cycle); prompt 1: transitive pair
    val votes = Seq((0L, 1L, 2L), (0L, 2L, 3L), (0L, 3L, 1L),
      (1L, 9L, 8L)).toDF("prompt_id", "winner", "loser")
    val r = roster((0L, 1L, 0L), (0L, 2L, 0L), (0L, 3L, 0L),
      (1L, 8L, 0L), (1L, 9L, 0L))
    val out = Preference.audit(r, votes, "prompt_id", "doc_id").collect()
    val p0 = out.find(_.getLong(0) == 0L).get
    assert(p0.getLong(3) === 1L, "exactly one directed 3-cycle")
    assert(p0.getDouble(4) === 0.0, "1 cycle / 1 triad → consistency 0")
    // cycle → every response has exactly 1 win; tie toward smallest id
    assert(p0.getLong(5) === 1L && p0.getLong(6) === 1L)
    val p1 = out.find(_.getLong(0) == 1L).get
    assert(p1.getLong(3) === 0L)
    assert(p1.isNullAt(4), "fewer than 3 responses → consistency NULL")
    assert(p1.getLong(5) === 9L && p1.getLong(6) === 1L)
    graft.engine.TrackedCache.release()
  }

  test("audit: win mass per prompt equals the pair count, and a " +
    "single-response prompt surfaces with zero pairs") {
    val r = roster((0L, 1L, 5L), (0L, 2L, 6L), (0L, 3L, 7L), (1L, 4L, 1L))
    val v = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "z", noiseMod = 3)
    val winMass = v.groupBy("prompt_id").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val out = Preference.audit(r, v, "prompt_id", "doc_id").collect()
    for (row <- out)
      assert(row.getLong(2) === winMass.getOrElse(row.getLong(0), 0L),
        s"n_pairs mismatch for prompt ${row.getLong(0)}")
    val lone = out.find(_.getLong(0) == 1L).get
    assert(lone.getLong(1) === 1L && lone.getLong(2) === 0L &&
      lone.getLong(3) === 0L && lone.isNullAt(4))
    assert(lone.getLong(5) === 4L && lone.getLong(6) === 0L,
      "a lone response is its own Copeland winner with zero wins")
    graft.engine.TrackedCache.release()
  }

  test("bradleyTerry: a noiseless transitive prompt fits strengths in " +
    "quality order, mean-1-normalized, with every response finite") {
    val r = roster((0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L), (0L, 4L, 40L))
    val v = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "s", noiseMod = 0)
    val out = Preference.bradleyTerry(r, v, "prompt_id", "doc_id")
      .collect().sortBy(_.getLong(1))
    // strength strictly increases with quality; ranks invert it
    val s = out.map(_.getDouble(4))
    assert(s.sliding(2).forall(p => p(0) < p(1)), s.mkString(","))
    assert(out.map(_.getLong(5)).toSeq === Seq(4L, 3L, 2L, 1L))
    // λ=1 smoothing: even the all-loss response has positive strength
    assert(s.head > 0.0)
    // Σπ = k renormalization → mean strength 1 (integer micro-units,
    // so the sum is k to within k rounding ulps)
    assert(math.abs(s.sum - 4.0) < 1e-4, s.sum.toString)
    graft.engine.TrackedCache.release()
  }

  test("bradleyTerry: cycle noise shrinks the top-vs-bottom strength " +
    "margin relative to the clean transitive fit") {
    val r = roster((0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L), (0L, 4L, 40L))
    def margin(votes: org.apache.spark.sql.DataFrame): Double = {
      val out = Preference.bradleyTerry(r, votes, "prompt_id", "doc_id")
        .collect().map(_.getDouble(4))
      graft.engine.TrackedCache.release()
      out.max - out.min
    }
    val clean = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "s", noiseMod = 0)
    // flip the extreme comparison: the weakest response now beats the
    // strongest, planting a 4-cycle (1>4>3>2>1 direction on that edge)
    val noisy = clean
      .withColumn("_flip", col("winner") === 4L && col("loser") === 1L)
      .select(col("prompt_id"),
        when(col("_flip"), col("loser")).otherwise(col("winner"))
          .as("winner"),
        when(col("_flip"), col("winner")).otherwise(col("loser"))
          .as("loser"))
    assert(margin(noisy) < margin(clean),
      "an intransitive flip must compress the fitted strength spread")
  }

  test("bradleyTerry: strengths are deterministic under repartition and " +
    "exactly replayed by scalar MM arithmetic (integer micro-units)") {
    val r = roster((0L, 1L, 3L), (0L, 2L, 7L), (0L, 3L, 11L),
      (1L, 8L, 1L), (1L, 9L, 2L))
    val v = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "bt", noiseMod = 3).cache()
    def run(df: org.apache.spark.sql.DataFrame) = {
      val out = Preference.bradleyTerry(df, v, "prompt_id", "doc_id",
        iterations = 3).collect().toSeq
      graft.engine.TrackedCache.release()
      out
    }
    val a = run(r)
    assert(a === run(r.repartition(5)))
    // scalar replay for one prompt: same λ=1-smoothed MM recursion on
    // Long micro-units (rounding before every sum, Σπ=k renorm)
    val votes = v.filter(col("prompt_id") === 0L).collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    val ids = Seq(1L, 2L, 3L)
    val k = ids.size
    val m = scala.collection.mutable.Map[(Long, Long), Long]()
    for (i <- ids; j <- ids if i < j)
      m((i, j)) = 2L * votes.count(wl => Set(wl._1, wl._2) == Set(i, j)) + 2L
    val aWins = ids.map(i => i -> (2L * votes.count(_._1 == i) + k - 1L)).toMap
    var p = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val d = ids.map { i =>
        i -> ids.filter(_ != i).map { j =>
          val key = if (i < j) (i, j) else (j, i)
          math.round(1e12 * m(key) / (p(i) + p(j)).toDouble)
        }.sum
      }.toMap
      val raw = ids.map(i =>
        i -> math.round(aWins(i).toDouble * 1e12 / d(i))).toMap
      val tot = raw.values.sum
      p = ids.map(i =>
        i -> math.round(raw(i).toDouble * k * 1000000L / tot)).toMap
    }
    val got = a.filter(_.getLong(0) == 0L)
      .map(x => x.getLong(1) -> x.getDouble(4)).toMap
    for (i <- ids)
      assert(got(i) === p(i).toDouble / 1e6, s"rid $i")
  }

  test("bradleyTerry: prompts are independent — a two-prompt fit " +
    "equals each prompt fit alone") {
    val r = roster((0L, 1L, 3L), (0L, 2L, 9L), (0L, 3L, 5L),
      (7L, 20L, 2L), (7L, 21L, 8L))
    val v = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "ind", noiseMod = 4).cache()
    def fit(df: org.apache.spark.sql.DataFrame,
            votes: org.apache.spark.sql.DataFrame) = {
      val out = Preference.bradleyTerry(df, votes, "prompt_id", "doc_id",
        iterations = 3).collect().toSeq
      graft.engine.TrackedCache.release()
      out
    }
    val joint = fit(r, v)
    val solo = Seq(0L, 7L).flatMap { p =>
      fit(r.filter(col("prompt_id") === p),
        v.filter(col("prompt_id") === p))
    }
    assert(joint.sortBy(x => (x.getLong(0), x.getLong(1))) ===
      solo.sortBy(x => (x.getLong(0), x.getLong(1))))
  }

  test("dpoPairs: chosen/rejected are the rank extremes, the margin " +
    "gate and the k>=2 gate both drop prompts, micro-exact margins") {
    // prompt 0: clean order 3 > 2 > 1; prompt 1: lone response
    val r = roster((0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L),
      (1L, 9L, 1L))
    val v = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "s", noiseMod = 0)
    val fit = Preference.bradleyTerry(r, v, "prompt_id", "doc_id")
    val out = Preference.dpoPairs(fit, minMargin = 0.25).collect()
    assert(out.length === 1, "the lone-response prompt must drop")
    val p = out.head
    assert(p.getLong(0) === 0L)
    assert(p.getLong(1) === 3L && p.getLong(2) === 1L) // chosen, rejected
    assert(p.getLong(3) > p.getLong(4)) // chosen_wins > rejected_wins
    // margin replays from the fit's own strengths on the micro grid
    val s = fit.collect().map(x => x.getLong(1) -> x.getDouble(4)).toMap
    assert(p.getDouble(5) ===
      (math.round(s(3L) * 1e6) - math.round(s(1L) * 1e6)) / 1e6)
    graft.engine.TrackedCache.release()
    // an impossible margin drops every prompt
    val none = Preference.dpoPairs(
      Preference.bradleyTerry(r, v, "prompt_id", "doc_id"),
      minMargin = 1e9)
    assert(none.count() === 0L)
    graft.engine.TrackedCache.release()
  }

  test("voteCovariateBias: noiseless votes give rate 1.0 in every " +
    "bucket, planted upsets lower exactly their gap bucket, and " +
    "equal-covariate votes are excluded") {
    val r = roster((0L, 1L, 100L), (0L, 2L, 250L), (0L, 3L, 250L),
      (0L, 4L, 1600L))
    val clean = Preference.pairwiseVotes(r, "prompt_id", "doc_id", "q",
      seed = "s", noiseMod = 0)
    val out = Preference.voteCovariateBias(r, clean, "prompt_id",
      "doc_id", "q", bucketWidth = 100L, maxBucket = 10L).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(3))).toMap
    // gaps: |250-100|=150 → b1 (×2), |1600-100|=1500 → b10 (capped),
    // |1600-250|=1350 → b10 (×2); the 250-vs-250 vote is excluded
    assert(out === Map(1L -> ((2L, 1.0)), 10L -> ((3L, 1.0))))
    // flip one bucket-1 vote: only bucket 1's rate drops, to 1/2
    val flipped = clean
      .withColumn("_f", col("winner") === 2L && col("loser") === 1L)
      .select(col("prompt_id"),
        when(col("_f"), col("loser")).otherwise(col("winner")).as("winner"),
        when(col("_f"), col("winner")).otherwise(col("loser")).as("loser"))
    val out2 = Preference.voteCovariateBias(r, flipped, "prompt_id",
      "doc_id", "q", bucketWidth = 100L, maxBucket = 10L).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(3))).toMap
    assert(out2 === Map(1L -> ((2L, 0.5)), 10L -> ((3L, 1.0))))
  }

  test("audit is deterministic under repartition (md5 coin, no " +
    "partition-order dependence)") {
    val base = (0L until 40L).map(i => (i / 5, i, (i * 37) % 11)).toDF(
      "prompt_id", "doc_id", "q")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val v = Preference.pairwiseVotes(df, "prompt_id", "doc_id", "q",
        seed = "rep", noiseMod = 4)
      val out = Preference.audit(df, v, "prompt_id", "doc_id").collect().toSeq
      graft.engine.TrackedCache.release()
      out
    }
    assert(run(base) === run(base.repartition(7)))
  }

  test("wilsonLeaderboard: hand-computed intervals, [0,1] bounds, " +
    "interval contains the point estimate, p=1 pins hi at exactly 1") {
    // model 0: 7-3 vs model 1; model 2: 3-0 vs model 3
    val votes = (Seq.fill(7)((0L, 1L)) ++ Seq.fill(3)((1L, 0L)) ++
      Seq.fill(3)((2L, 3L))).toDF("winner", "loser")
    val out = Preference.wilsonLeaderboard(votes).collect()
      .map(r => r.getAs[Long]("model_id") -> r).toMap
    assert(out(0L).getAs[Long]("wins") === 7L &&
      out(0L).getAs[Long]("n_games") === 10L)
    // python-mirrored reference values (z² = 3.8416)
    assert(out(0L).getAs[Double]("wilson_lo") === 0.396773)
    assert(out(0L).getAs[Double]("wilson_hi") === 0.892211)
    assert(out(2L).getAs[Double]("wilson_lo") === 0.438494)
    assert(out(2L).getAs[Double]("wilson_hi") === 1.0) // algebraic at p̂=1
    assert(out(3L).getAs[Double]("wilson_lo") === 0.0) // algebraic at p̂=0
    out.values.foreach { r =>
      val (lo, rate, hi) = (r.getAs[Double]("wilson_lo"),
        r.getAs[Double]("win_rate"), r.getAs[Double]("wilson_hi"))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= rate && rate <= hi)
    }
  }

  test("wilsonLeaderboard: pessimistic rank — a 3-0 newcomer ranks " +
    "below a 70-30 veteran despite the higher raw win rate") {
    val votes = (Seq.fill(70)((0L, 9L)) ++ Seq.fill(30)((9L, 0L)) ++
      Seq.fill(3)((1L, 9L))).toDF("winner", "loser")
    val out = Preference.wilsonLeaderboard(votes).collect()
      .map(r => r.getAs[Long]("model_id") ->
        (r.getAs[Double]("win_rate"), r.getAs[Long]("pess_rank"))).toMap
    assert(out(1L)._1 === 1.0 && out(0L)._1 === 0.7) // raw rates
    assert(out(0L)._2 === 1L && out(1L)._2 === 2L)   // lo-bound order
  }

  test("stratifiedWinRate: a verbosity-penalized model recovers to " +
    "0.5 adjusted while its raw rate reads 0.25") {
    // model 0 wins every EQUAL-length battle (stratum 0, rate 1.0)
    // but loses every battle it is 20 shorter in (stratum −2, rate 0)
    val votes = (
      Seq.fill(2)((0L, 1L, 30L, 30L)) ++      // 0 beats 1 at equal len
      Seq.fill(6)((1L, 0L, 40L, 20L))          // 1 beats 0 via length
    ).toDF("winner", "loser", "winner_len", "loser_len")
    val out = Preference.stratifiedWinRate(votes).collect()
      .map(r => r.getAs[Long]("model_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_games") === 8L)
    assert(out(0L).getAs[Double]("win_rate") === 0.25)
    assert(out(0L).getAs[Long]("n_strata") === 2L)
    assert(out(0L).getAs[Double]("adj_win_rate") === 0.5) // (1 + 0)/2
    assert(out(1L).getAs[Double]("win_rate") === 0.75)
    assert(out(1L).getAs[Double]("adj_win_rate") === 0.5)
  }

  test("stratifiedWinRate: bucket clamp at ±maxAbsBucket, and " +
    "determinism under repartition") {
    // a ±200 length gap still lands in the ±2 buckets
    val votes = Seq((0L, 1L, 300L, 100L), (1L, 0L, 300L, 100L))
      .toDF("winner", "loser", "winner_len", "loser_len")
    val out = Preference.stratifiedWinRate(votes).collect()
      .map(r => r.getAs[Long]("model_id") -> r).toMap
    // each model: one win at +2, one loss at −2 ⇒ two strata, 0.5 adj
    assert(out(0L).getAs[Long]("n_strata") === 2L)
    assert(out(0L).getAs[Double]("adj_win_rate") === 0.5)

    val big = (0L until 64L).map(i =>
      (i % 5, (i + 1) % 5, (i * 7) % 60 + 10, (i * 11) % 60 + 10))
      .filter(t => t._1 != t._2)
      .toDF("winner", "loser", "winner_len", "loser_len")
    def run(d: org.apache.spark.sql.DataFrame) =
      Preference.stratifiedWinRate(d).collect().toSeq
    assert(run(big) === run(big.repartition(7)))
  }

  test("wilsonLeaderboard/stratifiedWinRate: NULL-sided votes are " +
    "dropped, never split into phantom leaderboard rows") {
    val votes = Seq((Some(0L), Some(1L)), (Some(0L), None),
        (None, Some(1L)))
      .toDF("winner", "loser")
    val wl = Preference.wilsonLeaderboard(votes).collect()
    assert(wl.map(_.getAs[Long]("model_id")).toSet === Set(0L, 1L))
    assert(wl.map(_.getAs[Long]("n_games")).sum === 2L)
    val sv = Seq((Some(0L), Some(1L), Some(10L), Some(10L)),
        (Some(0L), Some(1L), None, Some(10L)))
      .toDF("winner", "loser", "winner_len", "loser_len")
    val sw = Preference.stratifiedWinRate(sv).collect()
    assert(sw.map(_.getAs[Long]("n_games")).sum === 2L) // one battle
  }
}
