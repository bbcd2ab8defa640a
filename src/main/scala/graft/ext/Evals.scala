package graft.ext

import graft.engine.TrackedCache.Trackable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation-suite operators over SAMPLED model outputs — the
  * reductions an LLM eval harness runs after generation: unbiased
  * pass@k, best-of-n expected-reward curves, and group-relative
  * advantage normalization. All of them reduce bounded per-task /
  * per-prompt rosters, so every formula below is exact integer
  * combinatorics followed by ONE double division — engine-portable
  * by construction (no accumulation-order-dependent float sums).
  *
  * Reference behavior: the bcgov/lmo_data_catalog pipeline has no
  * eval stage (01_source_me.R is an annual reporting script); these
  * are scale extensions in the training-data-pipeline family the
  * survey's §2.10 extension track covers.
  */
object Evals {

  /** TRUE iff the double column is a finite number — NULL-dropping
    * when used as a filter (NaN/NULL propagate to NULL, which a
    * WHERE drops). Needed because Spark SQL orders NaN ABOVE every
    * double, so `col > 0.0` alone would PASS a NaN — the opposite of
    * the Scala primitive comparison the streaming twins apply. */
  private[ext] def finite(c: Column): Column =
    !isnan(c) && abs(c) < lit(Double.PositiveInfinity)

  /** Unbiased pass@k (Chen et al., "Evaluating Large Language Models
    * Trained on Code", 2021, eq. 1): with n samples per task of
    * which c are correct, pass@k = 1 − C(n−c, k)/C(n, k). Computed
    * in the reference implementation's overflow-stable form — the
    * LEFT-FOLD product of per-term double ratios
    * Π_{i<k} (n−c−i)/(n−i) — numerator terms clamp at 0 (if n−c < k
    * some factor is 0 ⇒ C(n−c,k) = 0 ⇒ pass@k = 1), round 6. The
    * integer falling-factorial products would wrap signed 64-bit at
    * k=8 once n ≳ 236 (and Chen et al. sample n=200+); per-factor
    * division keeps every intermediate ≤ 1 and, folded in the same
    * order by Spark and the oracle, is bit-identical across engines.
    * k > n is undefined and reports NULL rather than a biased number.
    *
    * Output: one row per task — (task, n_samples, n_correct,
    * pass_at_<k> for each requested k).
    *
    * Scale shape: ONE task-keyed count/sum aggregate; the
    * combinatorics are per-row column arithmetic on the aggregate.
    */
  def passAtK(samples: DataFrame, taskCol: String, correctCol: String,
              ks: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame =
    passAtKOnCounts(
      samples.groupBy(col(taskCol))
        .agg(count(lit(1)).as("n_samples"),
          sum(when(col(correctCol), 1L).otherwise(0L)).as("n_correct")),
      taskCol, ks)

  /** The pass@k formula on an already-aggregated (task, n_samples,
    * n_correct) ledger — the entry point for incrementally maintained
    * counters (the streaming eval-ingestion path, q348). */
  def passAtKOnCounts(counts: DataFrame, taskCol: String,
                      ks: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"passAtK: ks must be >= 1, got $ks")
    val passCols = ks.map { k =>
      val prod = (0 until k).map(i =>
        greatest(col("n_samples") - col("n_correct") - i, lit(0L))
          .cast("double") / (col("n_samples") - i).cast("double"))
        .reduce(_ * _)
      when(col("n_samples") >= k, round(lit(1.0) - prod, 6))
        .as(s"pass_at_$k")
    }
    counts.select(col(taskCol) +: col("n_samples") +: col("n_correct") +:
        passCols: _*)
      .orderBy(taskCol)
  }

  /** C(i, n) for literal n as exact integer column arithmetic: the
    * product of n consecutive integers is divisible by n!, and both
    * fit comfortably in the double-exact range for roster-sized i,
    * so the divide-then-truncate is exact. */
  private def choose(i: Column, n: Int): Column = {
    val fact = (1 to n).product
    val prod = (0 until n).map(j => i - j).reduce(_ * _)
    when(i >= n, (prod.cast("double") / fact).cast("long"))
      .otherwise(0L)
  }

  /** Best-of-n expected-reward curve (the BoN scaling diagnostic a
    * reward-model pipeline plots before picking its sampling budget):
    * for each prompt with roster rewards x_(1) ≤ … ≤ x_(k), the
    * EXACT expectation of max over a uniformly random n-subset via
    * the order-statistics identity
    *   E[max_n] = Σ_i x_(i) · (C(i,n) − C(i−1,n)) / C(k,n)
    * — tie-safe (equal rewards contribute equally wherever the sort
    * places them), all-integer numerators, one division per n.
    * n=1 degenerates to the mean and n=k to the max, which the spec
    * pins as internal laws.
    *
    * Rewards must be INTEGER-VALUED (they are compared and summed on
    * the long grid; a fractional reward would silently truncate).
    * NULL-reward/-id/-prompt rows are dropped before ranking — a NULL
    * contributes nothing to any order statistic, and letting it take
    * a rank would inflate k while adding zero to every weighted sum.
    *
    * Output: one row per prompt — (prompt, k, best, e_max_<n>…);
    * e_max_<n> is NULL when n > k.
    *
    * Scale shape: the only window is the per-prompt rank over
    * bounded rosters (the bt_rank class); then one prompt-keyed
    * aggregate.
    */
  def bonCurve(responses: DataFrame, promptCol: String, idCol: String,
               rewardCol: String, ns: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1),
      s"bonCurve: ns must be >= 1, got $ns")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(promptCol)
      .orderBy(col("_x"), col(idCol))
    val ranked = responses
      .filter(col(promptCol).isNotNull && col(idCol).isNotNull &&
        col(rewardCol).isNotNull)
      .select(col(promptCol), col(idCol),
        col(rewardCol).cast("long").as("_x"))
      .withColumn("_i", row_number().over(w).cast("long"))
    val sums = ns.map { n =>
      sum(col("_x") * (choose(col("_i"), n) - choose(col("_i") - 1, n)))
        .as(s"_s$n")
    }
    ranked.groupBy(col(promptCol))
      .agg(count(lit(1)).as("k"),
        (max("_x").as("best") +: sums): _*)
      .select(col(promptCol) +: col("k") +: col("best") +: ns.map { n =>
        when(col("k") >= n,
          round(col(s"_s$n").cast("double") /
            choose(col("k"), n).cast("double"), 6)).as(s"e_max_$n")
      }: _*)
      .orderBy(promptCol)
  }

  /** B-cubed clustering evaluation (Bagga & Baldwin 1998; the
    * standard extrinsic metric for dedup / entity-resolution cluster
    * quality, and the one Amigó et al. 2009 show satisfies all four
    * clustering-metric constraints): per-item precision =
    * |cluster ∩ class| / |cluster| and recall = |cluster ∩ class| /
    * |class|, averaged over items — which reduces to sums of
    * n_cg²/|c| and n_cg²/|g| over the (cluster, class) contingency
    * table. Each term is quantized to a 1e-9 BIGINT before the sum
    * (the IPF/q331 discipline: integer additions are
    * order-independent, so the oracle replays exactly); one double
    * division at the end. F1 computed from the raw quantized sums in
    * a single mirrored expression, not from re-rounded P/R.
    *
    * Output: one row — (n_items, n_clusters, n_classes,
    * bcubed_precision, bcubed_recall, bcubed_f1).
    *
    * Scale shape: the contingency table is one (cluster, class)
    * aggregate; its marginals are dictionary-sized rollups joined
    * back by key. Nothing row-scale after the first aggregate.
    */
  def bcubed(assign: DataFrame, idCol: String, clusterCol: String,
             goldCol: String): DataFrame = {
    val a = assign.select(col(idCol), col(clusterCol).as("_c"),
      col(goldCol).as("_g"))
    val cg = a.groupBy("_c", "_g").agg(count(lit(1)).as("_n"))
    val cs = cg.groupBy("_c").agg(sum("_n").as("_nc"))
    val gs = cg.groupBy("_g").agg(sum("_n").as("_ng"))
    val terms = cg.join(cs, "_c").join(gs, "_g")
      .select(col("_n"),
        round(lit(1e9) * col("_n") * col("_n") / col("_nc"))
          .cast("long").as("_tp"),
        round(lit(1e9) * col("_n") * col("_n") / col("_ng"))
          .cast("long").as("_tr"))
    terms
      .agg(sum("_n").cast("long").as("n_items"),
        sum("_tp").as("_sp"), sum("_tr").as("_sr"))
      .crossJoin(broadcast(
        cs.agg(count(lit(1)).cast("long").as("n_clusters"))))
      .crossJoin(broadcast(
        gs.agg(count(lit(1)).cast("long").as("n_classes"))))
      .select(col("n_items"), col("n_clusters"), col("n_classes"),
        round(col("_sp").cast("double") / 1e9 / col("n_items"), 6)
          .as("bcubed_precision"),
        round(col("_sr").cast("double") / 1e9 / col("n_items"), 6)
          .as("bcubed_recall"),
        when(col("_sp") + col("_sr") > 0L,
          round(lit(2.0) * col("_sp") * col("_sr") /
            (col("_sp") + col("_sr")) / (col("n_items") * lit(1e9)), 6))
          .as("bcubed_f1"))
  }

  /** Self-consistency report (Wang et al., "Self-Consistency Improves
    * Chain of Thought Reasoning", 2023): per task, the MAJORITY
    * answer over n sampled answers (ties toward the smaller answer —
    * encoded as a min-struct over (−count, answer), so no window at
    * all), whether the majority matches gold, and the single-sample
    * accuracy it is compared against. All counting; the one division
    * is rounded.
    *
    * Scale shape: one (task, answer) aggregate + one task rollup via
    * min-struct; no windows, no joins beyond gold (carried through
    * the aggregate — gold is constant per task).
    */
  def selfConsistency(samples: DataFrame, taskCol: String,
                      answerCol: String, goldCol: String): DataFrame = {
    val perAnswer = samples
      .select(col(taskCol), col(answerCol).cast("long").as("_a"),
        col(goldCol).cast("long").as("_g"))
      .groupBy(col(taskCol), col("_a"))
      .agg(count(lit(1)).as("_c"), max("_g").as("_g"))
    perAnswer.groupBy(col(taskCol))
      .agg(sum("_c").as("n_samples"), max("_g").as("gold"),
        sum(when(col("_a") === col("_g"), col("_c")).otherwise(0L))
          .as("n_correct"),
        min(struct((-col("_c")).as("_nc"), col("_a"))).as("_m"))
      .select(col(taskCol), col("n_samples"), col("gold"),
        col("n_correct"),
        round(col("n_correct").cast("double") / col("n_samples"), 6)
          .as("single_acc"),
        col("_m._a").as("majority_answer"),
        (col("_m._a") === col("gold")).cast("long").as("majority_correct"))
      .orderBy(taskCol)
  }

  /** Group-relative advantage normalization (the GRPO estimator of
    * Shao et al., "DeepSeekMath", 2024: advantage = per-prompt
    * z-score of the reward). Exactness: with integer rewards, the
    * population z-score rewrites as
    *   (n·r − Σr) / √(n·Σr² − (Σr)²)
    * — integer numerator, integer radicand, ONE sqrt and ONE
    * division, so both engines produce the identical double. NULL
    * when the roster is constant (zero variance) or a singleton.
    *
    * Scale shape: one prompt-keyed aggregate + one prompt-keyed
    * equi-join back to the rows; no windows at all.
    */
  def grpoAdvantages(responses: DataFrame, promptCol: String,
                     idCol: String, rewardCol: String): DataFrame = {
    val r = col(rewardCol).cast("long")
    val base = responses.select(col(promptCol), col(idCol), r.as("_r"))
    val g = base.groupBy(col(promptCol))
      .agg(count(lit(1)).as("n_resp"), sum("_r").as("_s"),
        sum(col("_r") * col("_r")).as("_ss"))
      .withColumn("_var_num",
        col("n_resp") * col("_ss") - col("_s") * col("_s"))
    base.join(g, Seq(promptCol))
      .select(col(promptCol), col(idCol), col("_r").as("reward"),
        col("n_resp"),
        when(col("_var_num") > 0L,
          round((col("n_resp") * col("_r") - col("_s")).cast("double") /
            sqrt(col("_var_num").cast("double")), 6)).as("advantage"))
      .orderBy(promptCol, idCol)
  }

  /** One MM round of Dawid–Skene annotator weighting (Dawid & Skene
    * 1979, the simplified accuracy-weighted form of Karger, Oh &
    * Shah 2011): a crowdsourced label table is aggregated in three
    * exact steps —
    *
    *  1. unweighted per-item majority (ties → smallest label),
    *  2. per-annotator accuracy AGAINST that majority, held as an
    *     exact 1e-6-quantized BIGINT weight,
    *  3. accuracy-weighted re-vote (same tie rule) — low-quality
    *     annotators lose influence without ever being dropped.
    *
    * All counting + integer weight sums; ties resolve through
    * min-label (no argmax exists to tie-break differently
    * cross-engine). One round is the standard lightweight form; the
    * fixpoint iteration adds rounds of the same two aggregates.
    *
    * Output: one row per item — n_votes, majority_label,
    * weighted_label, changed (BIGINT 0/1).
    *
    * Scale shape: aggregates keyed by (item, label) / annotator /
    * item and equi-joins on those same keys; the annotator weight
    * table is dictionary-scale. No windows, no collects.
    */
  /** Per-item majority label with the min-label tie rule over a
    * normalized (_i, _a, _l) ledger — shared by [[dawidSkeneRound]]
    * and [[annotatorConfusion]]. Tie-free: the winner is min(label)
    * among labels attaining the max count. */
  private def majorityByItem(l: DataFrame): DataFrame = {
    val cnt = l.groupBy("_i", "_l").agg(count(lit(1)).as("_c"))
    cnt.join(cnt.groupBy("_i").agg(max(col("_c")).as("_mx")), Seq("_i"))
      .filter(col("_c") === col("_mx"))
      .groupBy("_i").agg(min(col("_l")).as("_maj"))
  }

  def dawidSkeneRound(labels: DataFrame, itemCol: String = "item_id",
                      annotatorCol: String = "annotator_id",
                      labelCol: String = "label"): DataFrame = {
    // the label ledger feeds four consumers — materialize once.
    // NULL item/annotator/label rows carry no vote and would form
    // null-keyed phantom groups (the bonCurve NULL lesson) — filter.
    val l = labels.select(col(itemCol).as("_i"),
      col(annotatorCol).as("_a"), col(labelCol).as("_l"))
      .filter(col("_i").isNotNull && col("_a").isNotNull &&
        col("_l").isNotNull)
      .trackedPersist()
    val maj = majorityByItem(l)
    val weights = l.join(maj, Seq("_i"))
      .groupBy("_a")
      .agg(count(lit(1)).as("_n"),
        sum(when(col("_l") === col("_maj"), 1L).otherwise(0L)).as("_h"))
      .select(col("_a"),
        round(lit(1e6) * col("_h") / col("_n")).cast("long").as("_wt"))
    val wcnt = l.join(weights, Seq("_a"))
      .groupBy("_i", "_l").agg(sum(col("_wt")).as("_s"))
    val wmaj = wcnt.join(
        wcnt.groupBy("_i").agg(max(col("_s")).as("_wmx")), Seq("_i"))
      .filter(col("_s") === col("_wmx"))
      .groupBy("_i").agg(min(col("_l")).as("_wl"))
    l.groupBy("_i").agg(count(lit(1)).as("n_votes"))
      .join(maj, Seq("_i")).join(wmaj, Seq("_i"))
      .select(col("_i").as(itemCol), col("n_votes"),
        col("_maj").as("majority_label"),
        col("_wl").as("weighted_label"),
        (col("_wl") =!= col("_maj")).cast("long").as("changed"))
      .orderBy(itemCol)
  }

  /** Per-annotator confusion matrix against the panel majority — the
    * Dawid–Skene sufficient statistic itself (their π̂ matrix, 1979
    * §2, estimated against the majority instead of the latent truth):
    * for each (annotator, majority_label, given_label), the count and
    * the row-normalized rate P(annotator says l | majority is m). The
    * diagonal is the annotator's per-class accuracy; off-diagonal
    * mass shows WHICH confusions each annotator makes — the readout
    * [[dawidSkeneRound]]'s scalar weights collapse.
    *
    * Output: one row per OBSERVED (annotator, majority_label, label)
    * cell — n, row_total, rate (round 6). Unobserved cells are absent
    * (sparse), not zero-filled.
    *
    * Scale shape: the majority aggregate + one (annotator, m, l)
    * count + one (annotator, m) row-total aggregate joined back on
    * its own grouping keys. Cell cardinality is |annotators|·|labels|²
    * — dictionary-scale. No windows.
    */
  def annotatorConfusion(labels: DataFrame, itemCol: String = "item_id",
                         annotatorCol: String = "annotator_id",
                         labelCol: String = "label"): DataFrame = {
    val l = labels.select(col(itemCol).as("_i"),
      col(annotatorCol).as("_a"), col(labelCol).as("_l"))
      .filter(col("_i").isNotNull && col("_a").isNotNull &&
        col("_l").isNotNull)
      .trackedPersist()
    val joined = l.join(majorityByItem(l), Seq("_i"))
    val cells = joined.groupBy("_a", "_maj", "_l")
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("_a", "_maj")
      .agg(sum(col("n")).as("row_total"))
    cells.join(rows, Seq("_a", "_maj"))
      .select(col("_a").as(annotatorCol),
        col("_maj").as("majority_label"), col("_l").as(labelCol),
        col("n"), col("row_total"),
        round(col("n").cast("double") / col("row_total"), 6).as("rate"))
      .orderBy(annotatorCol, "majority_label", labelCol)
  }

  /** Paired-bootstrap significance (Koehn 2004, "Statistical
    * Significance Tests for Machine Translation Evaluation") between
    * two systems scored on the SAME segments: `b` deterministic
    * resamples of the per-segment metric deltas → win fraction, a
    * sign-test-style p-value (losses + ties/2, so identical systems
    * read exactly 0.5), and a nearest-rank 95% CI on the resample
    * mean delta.
    *
    * Resampling is the POISSON bootstrap (the cluster-scale form —
    * Chamandy et al. 2012): each (resample, segment) draws a weight
    * w ~ Poisson(1) approximated by thresholding an md5 coin on the
    * cumulative pmf in 1e-4 steps — NO RNG state, NO global n needed,
    * every row independent, replayable verbatim in SQL.
    *
    * Engine-exactness: per-segment deltas are 1e-6-quantized BIGINTs
    * before any aggregation; each resample reduces to the integer
    * pair (Σw, Σw·qd); win/loss/tie is the SIGN of the integer Σw·qd;
    * and the percentile ranks order resample means by EXACT RATIONAL
    * cross-comparison (sq·sw' vs sq'·sw on DECIMAL(38,0), resample id
    * tie-break) — no double enters any comparison. Nearest-rank
    * indices are exact integer ceilings (n/40, 39n/40). The only
    * doubles are the final reported divisions, each rounded to 6.
    *
    * Resamples that draw all-zero weights (Σw = 0) have no mean and
    * drop from the win/p/CI denominators — `n_eff` reports the
    * survivor count (at corpus scale Σw = 0 has probability e^{−n}).
    *
    * Scale shape: one segment-keyed map pass, a b× literal explode
    * (map-side, no shuffle), ONE resample-keyed aggregate down to b
    * rows, then a b×b broadcast nested-loop rank join — bounded by
    * the `b` PARAMETER, independent of corpus size — and 1-row
    * broadcast crossJoins. No windows anywhere.
    */
  def pairedBootstrap(segs: DataFrame, idCol: String, aCol: String,
                      bCol: String, b: Int = 200,
                      seed: String = "pb"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(b >= 1, s"pairedBootstrap: b must be >= 1, got $b")
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    // finite check on the DELTA before quantization: cast(NaN as
    // long) is 0, not NULL, so a NaN metric would silently score as
    // a zero delta instead of dropping (the confSeqTest rule)
    val base = segs.select(col(idCol).as("_s"),
        (col(aCol).cast("double") - col(bCol).cast("double"))
          .as("_d"))
      .filter(col("_s").isNotNull && finite(col("_d")))
      .select(col("_s"),
        round(lit(1e6) * col("_d")).cast("long").as("_qd"))
      .trackedPersist() // feeds the full-sample stats AND the explode
    val full = base.agg(count(lit(1)).as("n_segs"),
      coalesce(sum("_qd"), lit(0L)).as("_sqd"))
    // Poisson(1) pmf cumulative in 1e-4 steps: .3679/.7358/.9197/
    // .9810/.9963 → w ∈ {0..5}, E[w] = 0.9993
    val u = conv(substring(md5(concat(lit(seed), lit("#"),
      col("_r").cast("string"), lit("#"), col("_s").cast("string"))),
      1, 7), 16, 10).cast("long") % 10000L
    val w = when(u < 3679L, 0L).when(u < 7358L, 1L)
      .when(u < 9197L, 2L).when(u < 9810L, 3L).when(u < 9963L, 4L)
      .otherwise(5L)
    val means = base
      .select(col("_s"), col("_qd"),
        explode(sequence(lit(0), lit(b - 1))).as("_r"))
      .withColumn("_w", w)
      .groupBy("_r")
      .agg(sum("_w").as("_sw"), sum(col("_w") * col("_qd")).as("_sq"))
      .filter(col("_sw") > 0L)
      .trackedPersist() // b rows; feeds totals + both rank-join sides
    val tot = means.agg(count(lit(1)).as("n_eff"),
      coalesce(sum(when(col("_sq") > 0L, 1L).otherwise(0L)), lit(0L))
        .as("_wins"),
      coalesce(sum(when(col("_sq") < 0L, 1L).otherwise(0L)), lit(0L))
        .as("_losses"),
      coalesce(sum(when(col("_sq") === 0L, 1L).otherwise(0L)), lit(0L))
        .as("_ties"))
    val y = means.select(col("_r").as("_yr"), col("_sw").as("_ysw"),
      col("_sq").as("_ysq"))
    val lhs = dec(col("_ysq")) * dec(col("_sw"))
    val rhs = dec(col("_sq")) * dec(col("_ysw"))
    val rk = means.join(broadcast(y),
        lhs < rhs || (lhs === rhs && col("_yr") <= col("_r")))
      .groupBy("_r", "_sw", "_sq").agg(count(lit(1)).as("_rk"))
    val ci = rk.crossJoin(broadcast(tot.select(col("n_eff").as("_ne"))))
      .agg(
        max(when(col("_rk") === expr("(_ne + 39) div 40"),
          round(col("_sq").cast("double") / 1e6 / col("_sw"), 6)))
          .as("ci_lo"),
        max(when(col("_rk") === expr("(39 * _ne + 39) div 40"),
          round(col("_sq").cast("double") / 1e6 / col("_sw"), 6)))
          .as("ci_hi"))
    full.crossJoin(broadcast(tot)).crossJoin(broadcast(ci))
      .select(col("n_segs"), lit(b).cast("long").as("b_resamples"),
        col("n_eff"),
        when(col("n_segs") > 0L,
          round(col("_sqd").cast("double") / 1e6 / col("n_segs"), 6))
          .as("mean_delta"),
        when(col("n_eff") > 0L,
          round(col("_wins").cast("double") / col("n_eff"), 6))
          .as("win_frac"),
        when(col("n_eff") > 0L,
          round(col("_losses").cast("double") / col("n_eff"), 6))
          .as("loss_frac"),
        when(col("n_eff") > 0L,
          round(col("_ties").cast("double") / col("n_eff"), 6))
          .as("tie_frac"),
        when(col("n_eff") > 0L,
          round((col("_losses").cast("double") +
            col("_ties").cast("double") / 2.0) / col("n_eff"), 6))
          .as("p_value"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Approximate-randomization (paired permutation) significance test
    * (Riezler & Maxwell 2005, "On Some Pitfalls in Automatic
    * Evaluation and Significance Testing for MT") — the companion to
    * [[pairedBootstrap]] and the test with the cleaner null: under
    * H0 the system labels are exchangeable per segment, so each
    * permutation FLIPS the sign of each segment's delta with
    * probability ½; the p-value is the fraction of sign-flip
    * resamples whose |mean delta| reaches the observed |mean delta|,
    * with the standard +1/+1 validity correction
    * p = (r + 1)/(b + 1) (guarantees p > 0 and exact validity for
    * finite b). When every segment drops (n_segs = 0) the test is
    * undefined: n_hits and p_value answer NULL alongside mean_delta
    * — an empty input must not read as maximally significant.
    *
    * Determinism and exactness: flips come from an md5 coin per
    * (resample, segment) — no RNG state; per-segment deltas are
    * 1e-6-quantized BIGINTs, each resample reduces to the integer
    * Σ s·qd (s ∈ {−1, +1}), and because every resample shares the
    * observed denominator n the comparison |mean| ≥ |mean_obs| is
    * the pure INTEGER comparison |Σ s·qd| ≥ |Σ qd| — no double
    * enters the decision. The only doubles are the reported
    * divisions, rounded to 6.
    *
    * Scale shape: one segment-keyed map pass, a b× literal explode
    * (map-side), ONE resample-keyed aggregate to b rows, a 1-row
    * broadcast crossJoin for the observed statistic, one final
    * count. No windows, no non-equi joins.
    */
  def permutationTest(segs: DataFrame, idCol: String, aCol: String,
                      bCol: String, b: Int = 200,
                      seed: String = "ar"): DataFrame = {
    require(b >= 1, s"permutationTest: b must be >= 1, got $b")
    // finite-delta rule before quantization (see pairedBootstrap)
    val base = segs.select(col(idCol).as("_s"),
        (col(aCol).cast("double") - col(bCol).cast("double"))
          .as("_d"))
      .filter(col("_s").isNotNull && finite(col("_d")))
      .select(col("_s"),
        round(lit(1e6) * col("_d")).cast("long").as("_qd"))
      .trackedPersist() // feeds the observed stat AND the explode
    val obs = base.agg(count(lit(1)).as("n_segs"),
      coalesce(sum("_qd"), lit(0L)).as("_sqd"))
    val flip = when(conv(substring(md5(concat(lit(seed), lit("#"),
      col("_r").cast("string"), lit("#"), col("_s").cast("string"))),
      1, 7), 16, 10).cast("long") % 2L === 0L, 1L).otherwise(-1L)
    val res = base
      .select(col("_s"), col("_qd"),
        explode(sequence(lit(0), lit(b - 1))).as("_r"))
      .groupBy("_r")
      .agg(coalesce(sum(flip * col("_qd")), lit(0L)).as("_fq"))
    val hits = res.crossJoin(broadcast(obs))
      .agg(coalesce(sum(when(abs(col("_fq")) >= abs(col("_sqd")), 1L)
        .otherwise(0L)), lit(0L)).as("_hits"))
    obs.crossJoin(broadcast(hits))
      .select(col("n_segs"), lit(b).cast("long").as("b_resamples"),
        when(col("n_segs") > 0L,
          round(col("_sqd").cast("double") / 1e6 / col("n_segs"), 6))
          .as("mean_delta"),
        // n_segs = 0 ⇒ the test is undefined: NULL, not p = 1/(b+1)
        // (an empty input must not read as maximally significant)
        when(col("n_segs") > 0L, col("_hits")).as("n_hits"),
        when(col("n_segs") > 0L,
          round((col("_hits").cast("double") + 1.0) / (b + 1.0), 6))
          .as("p_value"))
  }

  /** Anytime-valid sequential test on paired per-segment deltas — a
    * time-uniform CONFIDENCE SEQUENCE for the mean delta (Howard,
    * Ramdas, McAuliffe & Sekhon 2021, "Time-uniform, nonparametric,
    * nonasymptotic confidence sequences", the polynomial stitched
    * boundary with η = 2, s = 1.4):
    *   radius(n) = scale · 1.7 · √((ln ln(2n) + 0.72·ln(5.2/α)) / n)
    * where `scale` is the sub-Gaussian parameter of one delta (for
    * deltas bounded in [−R, R], scale = R by Hoeffding). Unlike the
    * fixed-horizon q373/q374 tests, the interval
    * [mean − radius, mean + radius] holds SIMULTANEOUSLY over all n
    * with probability ≥ 1 − α, so reading it at ANY data-dependent
    * stopping time — including "stop as soon as it rejects" — is
    * valid: exactly the always-valid readout a STREAMING eval ledger
    * needs, and why the statistic is a pure function of the current
    * (n, Σd, Σd²) counters with no history required.
    *
    * reject_null = 1 when 0 falls outside the current interval
    * (|mean| > radius, compared on the 6-dp-rounded pair so the
    * decision is engine-stable); var_delta is the population-variance
    * diagnostic.
    *
    * Determinism: per-segment qd = ⌊1e6·d⌉ and qd2 = ⌊1e6·d²⌉ are
    * BIGINTs before the sums (order-free; the SQUARE is quantized
    * per row, not squared after, so the Σ stays ≤ n·1e6·scale² —
    * no DECIMAL needed and the streaming twin's Long counters agree
    * exactly). Non-finite / NULL scores drop on the [[finite]] rule.
    * The ln/√ of the radius are one double expression over (n, α,
    * scale), rounded 6 — the q381 exp() mirroring class.
    *
    * Scale shape: one map pass + ONE scalar aggregate + the
    * [[seqTestOnCounts]] finisher arithmetic. Nothing else.
    */
  def confSeqTest(segs: DataFrame, idCol: String, aCol: String,
                  bCol: String, alpha: Double = 0.05,
                  scale: Double = 1.0): DataFrame = {
    require(alpha > 0 && alpha < 0.5,
      s"confSeqTest: alpha in (0, 0.5), got $alpha")
    require(scale > 0, s"confSeqTest: scale must be > 0, got $scale")
    // the finite filter must run on the DELTA, before quantization:
    // cast(NaN as long) is 0, not NULL, so a NULL-check downstream
    // would silently score a NaN delta as zero
    val base = segs.select(col(idCol).as("_s"),
        (col(aCol).cast("double") - col(bCol).cast("double")).as("_d"))
      .filter(col("_s").isNotNull && finite(col("_d")))
      .select(col("_s"),
        round(lit(1e6) * col("_d")).cast("long").as("_qd"),
        round(lit(1e6) * col("_d") * col("_d")).cast("long")
          .as("_qd2"))
    seqTestOnCounts(base.agg(count(lit(1)).as("n_segs"),
        coalesce(sum("_qd"), lit(0L)).as("sqd"),
        coalesce(sum("_qd2"), lit(0L)).as("sqd2")),
      alpha, scale)
  }

  /** [[confSeqTest]]'s statistic from PRE-AGGREGATED quantized delta
    * moments — the finisher for incremental pipelines (the streaming
    * twin [[graft.ext.Streaming.confSeqLedgerStream]] keeps per-shard
    * (n_segs, sqd, sqd2) ledgers; this sums the shards and applies
    * the identical formulas, so stream and batch agree by
    * construction — the ipsOnCounts pattern). The confidence
    * sequence is a pure function of the summed counters, which is
    * what makes the ANYTIME guarantee deployable on a ledger: no
    * per-arrival history is needed, only the current sums.
    */
  def seqTestOnCounts(counts: DataFrame, alpha: Double = 0.05,
                      scale: Double = 1.0): DataFrame = {
    require(alpha > 0 && alpha < 0.5,
      s"seqTestOnCounts: alpha in (0, 0.5), got $alpha")
    require(scale > 0, s"seqTestOnCounts: scale must be > 0, got $scale")
    val agg = counts.agg(
      coalesce(sum("n_segs"), lit(0L)).as("n_segs"),
      coalesce(sum("sqd"), lit(0L)).as("_sqd"),
      coalesce(sum("sqd2"), lit(0L)).as("_sqd2"))
    val n = col("n_segs").cast("double")
    val meanRaw = col("_sqd") / 1e6 / n
    val varRaw = col("_sqd2") / 1e6 / n - meanRaw * meanRaw
    val radRaw = lit(scale) * lit(1.7) *
      sqrt((log(log(lit(2.0) * n)) + lit(0.72) * log(lit(5.2 / alpha)))
        / n)
    val mean6 = round(meanRaw, 6)
    val rad6 = round(radRaw, 6)
    agg.select(col("n_segs"),
      when(col("n_segs") > 0L, mean6).as("mean_delta"),
      when(col("n_segs") > 0L, round(varRaw, 6)).as("var_delta"),
      when(col("n_segs") > 0L, rad6).as("radius"),
      when(col("n_segs") > 0L, round(meanRaw - radRaw, 6)).as("ci_lo"),
      when(col("n_segs") > 0L, round(meanRaw + radRaw, 6)).as("ci_hi"),
      when(col("n_segs") > 0L,
        when(abs(mean6) > rad6, 1L).otherwise(0L)).as("reject_null"))
  }

  /** EMPIRICAL-BERNSTEIN anytime-valid sequential test — the
    * variance-adaptive companion of [[seqTestOnCounts]] that removes
    * its one caller-asserted footgun: there, a mis-specified
    * sub-Gaussian `scale` silently voids the coverage guarantee; here
    * `scale` only needs to BOUND the deltas (|d| ≤ scale — easy to
    * assert for clipped metrics) while the radius WIDTH adapts to the
    * measured variance via the already-ledgered second moment:
    *   ℓ(n)      = ln ln(2n) + 0.72·ln(5.2/α)   (the shared stitched
    *               term, Howard et al. 2021, η = 2, s = 1.4)
    *   radius_sg = scale · 1.7 · √(ℓ(n)/n)      (the sub-Gaussian
    *               radius, reported for comparison)
    *   radius_eb = 1.7 · √(V̂·ℓ(n)/n) + 3.4 · scale · ℓ(n)/n
    * with V̂ = max(var_delta, 0) — the empirical-Bernstein stitched
    * boundary's shape (first-order term scaled by the EMPIRICAL
    * standard deviation, a second-order range-penalty term that
    * decays at rate ℓ(n)/n). When the deltas' true spread is far
    * below the asserted bound (V̂ ≪ scale² — the common case for a
    * conservatively clipped metric), radius_eb ≪ radius_sg and the
    * test gains power for free; the CI and reject_null here use
    * radius_eb.
    *
    * Consumes the IDENTICAL (n_segs, sqd, sqd2) counters as
    * [[seqTestOnCounts]] — in particular the
    * [[graft.ext.Streaming.confSeqLedgerStream]] shard ledgers — so
    * the upgrade is a finisher swap, the ledger stream byte-unchanged
    * (batch/stream parity is the same ipsOnCounts argument).
    *
    * Determinism: pure arithmetic over the summed integer counters;
    * one double expression per reported quantity, rounded 6; the
    * reject decision compares the 6-dp-rounded pair (the
    * [[seqTestOnCounts]] discipline).
    */
  def seqTestOnCountsEB(counts: DataFrame, alpha: Double = 0.05,
                        scale: Double = 1.0): DataFrame = {
    require(alpha > 0 && alpha < 0.5,
      s"seqTestOnCountsEB: alpha in (0, 0.5), got $alpha")
    require(scale > 0,
      s"seqTestOnCountsEB: scale must be > 0, got $scale")
    val agg = counts.agg(
      coalesce(sum("n_segs"), lit(0L)).as("n_segs"),
      coalesce(sum("sqd"), lit(0L)).as("_sqd"),
      coalesce(sum("sqd2"), lit(0L)).as("_sqd2"))
    val n = col("n_segs").cast("double")
    val meanRaw = col("_sqd") / 1e6 / n
    val varRaw = col("_sqd2") / 1e6 / n - meanRaw * meanRaw
    val ell = log(log(lit(2.0) * n)) + lit(0.72) * log(lit(5.2 / alpha))
    val radSg = lit(scale) * lit(1.7) * sqrt(ell / n)
    val radEb = lit(1.7) * sqrt(greatest(varRaw, lit(0.0)) * ell / n) +
      lit(3.4 * scale) * ell / n
    val mean6 = round(meanRaw, 6)
    val radEb6 = round(radEb, 6)
    agg.select(col("n_segs"),
      when(col("n_segs") > 0L, mean6).as("mean_delta"),
      when(col("n_segs") > 0L, round(varRaw, 6)).as("var_delta"),
      when(col("n_segs") > 0L, round(radSg, 6)).as("radius_sg"),
      when(col("n_segs") > 0L, radEb6).as("radius_eb"),
      when(col("n_segs") > 0L, round(meanRaw - radEb, 6)).as("ci_lo"),
      when(col("n_segs") > 0L, round(meanRaw + radEb, 6)).as("ci_hi"),
      when(col("n_segs") > 0L,
        when(abs(mean6) > radEb6, 1L).otherwise(0L)).as("reject_null"))
  }

  /** [[seqTestOnCountsEB]] from raw paired per-segment scores — the
    * batch convenience that builds the quantized (n, Σd, Σd²)
    * counters exactly like [[confSeqTest]] (same 1e-6 HALF_UP rule,
    * same [[finite]] drop on the delta) and applies the
    * empirical-Bernstein finisher. */
  def confSeqTestEB(segs: DataFrame, idCol: String, aCol: String,
                    bCol: String, alpha: Double = 0.05,
                    scale: Double = 1.0): DataFrame = {
    val base = segs.select(col(idCol).as("_s"),
        (col(aCol).cast("double") - col(bCol).cast("double")).as("_d"))
      .filter(col("_s").isNotNull && finite(col("_d")))
      .select(col("_s"),
        round(lit(1e6) * col("_d")).cast("long").as("_qd"),
        round(lit(1e6) * col("_d") * col("_d")).cast("long")
          .as("_qd2"))
    seqTestOnCountsEB(base.agg(count(lit(1)).as("n_segs"),
        coalesce(sum("_qd"), lit(0L)).as("sqd"),
        coalesce(sum("_qd2"), lit(0L)).as("sqd2")),
      alpha, scale)
  }

  /** Per-group Poisson-bootstrap percentile CI on ONE metric column —
    * the "how uncertain is each slice's mean" companion to
    * [[pairedBootstrap]]'s two-system comparison, on the same
    * deterministic Poisson(1) resampling machinery (Chamandy et al.
    * 2012) keyed by (resample, row id): per group, `b` resample
    * means → the nearest-rank 2.5%/97.5% bounds.
    *
    * Engine-exactness (the q373 disciplines, group-keyed): values
    * are 1e-6-quantized BIGINTs; each (group, resample) reduces to
    * the integer pair (Σw, Σw·qx); percentile ranks order resample
    * means per group by EXACT RATIONAL cross-comparison on
    * DECIMAL(38,0) with resample-id tie-break; nearest-rank indices
    * are exact integer ceilings (⌈n_eff/40⌉, ⌈39·n_eff/40⌉). The
    * only doubles are the final reported divisions, rounded 6.
    * NULL / non-finite values drop on the [[finite]] rule.
    * All-zero-weight resamples drop from the CI (n_eff reports the
    * survivors); a DEGENERATE single-value group collapses to the
    * point CI [v, v] (every resample mean is v — the spec law).
    *
    * Scale shape: one row-keyed map pass, a b× literal explode
    * (map-side), ONE (group, resample)-keyed aggregate down to
    * |groups|·b rows, then a group-EQUI self-join with b×b fan-out
    * per group — bounded by the b PARAMETER, never a cartesian or
    * BNLJ — and dictionary-scale equi-joins back to the group stats.
    * No windows anywhere.
    */
  def groupedBootstrapCI(rows: DataFrame, groupCol: String,
                         idCol: String, valueCol: String, b: Int = 200,
                         seed: String = "gb"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(b >= 1, s"groupedBootstrapCI: b must be >= 1, got $b")
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    // finite check on the raw value: cast(NaN as long) is 0, not
    // NULL, so a post-quantization NULL-check would score NaN as 0
    val base = rows.select(col(groupCol).as("_g"), col(idCol).as("_s"),
        col(valueCol).cast("double").as("_x"))
      .filter(col("_g").isNotNull && col("_s").isNotNull &&
        finite(col("_x")))
      .select(col("_g"), col("_s"),
        round(lit(1e6) * col("_x")).cast("long").as("_qx"))
      .trackedPersist() // feeds the group stats AND the explode
    val grp = base.groupBy("_g").agg(count(lit(1)).as("n_rows"),
      coalesce(sum("_qx"), lit(0L)).as("_sqx"))
    // Poisson(1) pmf cumulative in 1e-4 steps (the q373 coin)
    val u = conv(substring(md5(concat(lit(seed), lit("#"),
      col("_r").cast("string"), lit("#"), col("_s").cast("string"))),
      1, 7), 16, 10).cast("long") % 10000L
    val w = when(u < 3679L, 0L).when(u < 7358L, 1L)
      .when(u < 9197L, 2L).when(u < 9810L, 3L).when(u < 9963L, 4L)
      .otherwise(5L)
    val means = base
      .select(col("_g"), col("_s"), col("_qx"),
        explode(sequence(lit(0), lit(b - 1))).as("_r"))
      .withColumn("_w", w)
      .groupBy("_g", "_r")
      .agg(sum("_w").as("_sw"), sum(col("_w") * col("_qx")).as("_sq"))
      .filter(col("_sw") > 0L)
      .trackedPersist() // |groups|·b rows; feeds n_eff + both
                        // rank-join sides
    val neff = means.groupBy("_g").agg(count(lit(1)).as("n_eff"))
    val y = means.select(col("_g"), col("_r").as("_yr"),
      col("_sw").as("_ysw"), col("_sq").as("_ysq"))
    val lhs = dec(col("_ysq")) * dec(col("_sw"))
    val rhs = dec(col("_sq")) * dec(col("_ysw"))
    val rk = means.join(y, Seq("_g"))
      .filter(lhs < rhs || (lhs === rhs && col("_yr") <= col("_r")))
      .groupBy("_g", "_r", "_sw", "_sq").agg(count(lit(1)).as("_rk"))
    val ci = rk.join(neff, Seq("_g"))
      .groupBy("_g").agg(
        max(when(col("_rk") === expr("(n_eff + 39) div 40"),
          round(col("_sq").cast("double") / 1e6 / col("_sw"), 6)))
          .as("ci_lo"),
        max(when(col("_rk") === expr("(39 * n_eff + 39) div 40"),
          round(col("_sq").cast("double") / 1e6 / col("_sw"), 6)))
          .as("ci_hi"))
    grp.join(neff, Seq("_g"), "left").join(ci, Seq("_g"), "left")
      .select(col("_g").as(groupCol), col("n_rows"),
        lit(b).cast("long").as("b_resamples"),
        coalesce(col("n_eff"), lit(0L)).as("n_eff"),
        when(col("n_rows") > 0L,
          round(col("_sqx").cast("double") / 1e6 / col("n_rows"), 6))
          .as("mean"),
        col("ci_lo"), col("ci_hi"))
      .orderBy(groupCol)
  }

  /** Off-policy evaluation via inverse propensity scoring — the
    * offline estimate of a NEW policy's value from logged behavior
    * data (Horvitz–Thompson / IPS, plus the self-normalized SNIPS of
    * Swaminathan & Joachims 2015, plus the effective sample size
    * diagnostic): with w_i = π_target(a_i|x_i)/π_behavior(a_i|x_i)
    * and logged reward r_i,
    *   IPS   = (1/n)·Σ w_i·r_i          (unbiased, high variance)
    *   SNIPS = Σ w_i·r_i / Σ w_i        (biased, much lower variance)
    *   ESS   = (Σ w_i)² / Σ w_i²        (how many "real" samples the
    *                                     reweighting left — the
    *                                     overlap-health readout)
    * The standard readout before trusting an offline RLHF / ranking
    * eval: ESS ≪ n means the target policy probes actions the
    * behavior policy rarely took and the estimate is noise.
    *
    * Determinism: per-example w, w·r, w² are each 1e-6-quantized
    * BIGINTs before their sums (order-free); each estimate is ONE
    * double expression over the integer sums (DECIMAL(38,0) for the
    * ESS square), rounded 6. Rows with NULL id/probs/reward, a
    * non-FINITE prob/reward (NaN or ±Inf — note Spark SQL orders NaN
    * ABOVE every double, so a plain `> 0` filter would PASS a NaN
    * propensity that the streaming twin's Scala comparison drops),
    * or a non-positive behavior probability drop (w undefined);
    * n_dropped reports them. [[graft.ext.Streaming.ipsLedgerStream]]
    * applies the identical finite-and-positive rule, so the twins
    * drop the same rows by construction.
    *
    * Scale shape: one map pass + one scalar aggregate. Nothing else.
    */
  def ipsOffPolicy(logged: DataFrame, idCol: String, behaviorCol: String,
                   targetCol: String, rewardCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val all = logged.select(col(idCol).as("_t"),
      col(behaviorCol).cast("double").as("_pb"),
      col(targetCol).cast("double").as("_pt"),
      col(rewardCol).cast("double").as("_r"))
    val w = col("_pt") / col("_pb")
    val base = all.filter(col("_t").isNotNull &&
        finite(col("_pb")) && finite(col("_pt")) &&
        finite(col("_r")) && col("_pb") > 0.0)
      .select(
        round(lit(1e6) * w).cast("long").as("_qw"),
        round(lit(1e6) * w * col("_r")).cast("long").as("_qwr"),
        round(lit(1e6) * w * w).cast("long").as("_qw2"))
    val tot = all.agg(count(lit(1)).as("_all"))
    val agg = base.agg(count(lit(1)).as("n_samples"),
      coalesce(sum("_qw"), lit(0L)).as("_sw"),
      coalesce(sum("_qwr"), lit(0L)).as("_swr"),
      coalesce(sum("_qw2"), lit(0L)).as("_sw2"))
    agg.crossJoin(broadcast(tot))
      .select(col("n_samples"),
        (col("_all") - col("n_samples")).as("n_dropped"),
        when(col("n_samples") > 0L,
          round(col("_swr").cast("double") / 1e6 / col("n_samples"), 6))
          .as("ips"),
        when(col("_sw") > 0L,
          round(col("_swr").cast("double") / col("_sw"), 6))
          .as("snips"),
        when(col("_sw2") > 0L,
          round((dec(col("_sw")) * dec(col("_sw"))).cast("double") /
            (lit(1e6) * col("_sw2").cast("double")), 6)).as("ess"))
  }

  /** [[ipsOffPolicy]]'s estimates from PRE-AGGREGATED quantized
    * weight moments — the finisher for incremental pipelines (the
    * streaming twin keeps monotone per-shard (n_total, n_samples,
    * sw, swr, sw2) ledgers; all five counters are associative sums,
    * so any sharding of the play stream converges to the batch
    * statistic — the mcNemarOnCounts pattern).
    */
  def ipsOnCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    counts.agg(
      coalesce(sum("n_total"), lit(0L)).as("_all"),
      coalesce(sum("n_samples"), lit(0L)).as("n_samples"),
      coalesce(sum("sw"), lit(0L)).as("_sw"),
      coalesce(sum("swr"), lit(0L)).as("_swr"),
      coalesce(sum("sw2"), lit(0L)).as("_sw2"))
      .select(col("n_samples"),
        (col("_all") - col("n_samples")).as("n_dropped"),
        when(col("n_samples") > 0L,
          round(col("_swr").cast("double") / 1e6 / col("n_samples"), 6))
          .as("ips"),
        when(col("_sw") > 0L,
          round(col("_swr").cast("double") / col("_sw"), 6))
          .as("snips"),
        when(col("_sw2") > 0L,
          round((dec(col("_sw")) * dec(col("_sw"))).cast("double") /
            (lit(1e6) * col("_sw2").cast("double")), 6)).as("ess"))
  }

  /** Doubly-robust off-policy estimate (Dudík, Langford & Li 2011,
    * "Doubly Robust Policy Evaluation and Learning") — IPS with a
    * reward-model control variate: with ŵ_i = π_t/π_b and q̂_i the
    * model's predicted reward under the target policy,
    *   DR = (1/n)·Σ [ q̂_i + w_i·(r_i − q̂_i) ]
    * — unbiased when EITHER the propensities or the reward model are
    * right, and with a perfect reward model (q̂ = r) the importance
    * weights cancel EXACTLY (the robustness the spec pins). The
    * plain IPS rides along for comparison.
    *
    * Determinism: the per-example DR term and w·r are 1e-6-quantized
    * BIGINTs before the sums; each estimate is one double division.
    * Rows with NULL fields, a non-FINITE prob/reward/q̂ (NaN or ±Inf
    * — the [[ipsOffPolicy]] finite-and-positive rule), or a
    * non-positive behavior probability drop and are counted.
    *
    * Scale shape: one map pass + one scalar aggregate.
    */
  def drOffPolicy(logged: DataFrame, idCol: String, behaviorCol: String,
                  targetCol: String, rewardCol: String,
                  qhatCol: String): DataFrame = {
    val all = logged.select(col(idCol).as("_t"),
      col(behaviorCol).cast("double").as("_pb"),
      col(targetCol).cast("double").as("_pt"),
      col(rewardCol).cast("double").as("_r"),
      col(qhatCol).cast("double").as("_qh"))
    val w = col("_pt") / col("_pb")
    val base = all.filter(col("_t").isNotNull &&
        finite(col("_pb")) && finite(col("_pt")) &&
        finite(col("_r")) && finite(col("_qh")) && col("_pb") > 0.0)
      .select(
        round(lit(1e6) * (col("_qh") + w * (col("_r") - col("_qh"))))
          .cast("long").as("_qd"),
        round(lit(1e6) * w * col("_r")).cast("long").as("_qwr"))
    val tot = all.agg(count(lit(1)).as("_all"))
    base.agg(count(lit(1)).as("n_samples"),
        coalesce(sum("_qd"), lit(0L)).as("_sd"),
        coalesce(sum("_qwr"), lit(0L)).as("_swr"))
      .crossJoin(broadcast(tot))
      .select(col("n_samples"),
        (col("_all") - col("n_samples")).as("n_dropped"),
        when(col("n_samples") > 0L,
          round(col("_sd").cast("double") / 1e6 / col("n_samples"), 6))
          .as("dr"),
        when(col("n_samples") > 0L,
          round(col("_swr").cast("double") / 1e6 / col("n_samples"), 6))
          .as("ips"))
  }

  /** McNemar's test (McNemar 1947) for two systems' PAIRED binary
    * outcomes on the same tasks — the standard significance test for
    * "did classifier/system A really beat B" on a shared benchmark:
    * only the DISCORDANT pairs carry signal. Reports both the
    * uncorrected χ² = (b₁₀ − b₀₁)²/(b₁₀ + b₀₁) and the
    * continuity-corrected (Edwards 1948)
    * χ²_cc = (max(|b₁₀ − b₀₁| − 1, 0))²/(b₁₀ + b₀₁), each an exact
    * integer ratio with ONE double division, rounded 6; NULL when
    * there are no discordant pairs (the statistic is undefined —
    * the systems never disagree).
    *
    * NULL rows (task or either outcome) are dropped — a pair with a
    * missing outcome is unscoreable (bonCurve discipline).
    *
    * Scale shape: ONE map pass + ONE scalar aggregate. Nothing else.
    */
  def mcNemar(pairs: DataFrame, idCol: String, aCol: String,
              bCol: String): DataFrame = {
    val base = pairs.select(col(idCol).as("_t"),
        col(aCol).cast("boolean").as("_a"),
        col(bCol).cast("boolean").as("_b"))
      .filter(col("_t").isNotNull && col("_a").isNotNull &&
        col("_b").isNotNull)
    mcNemarOnCounts(base.agg(count(lit(1)).as("n_pairs"),
      coalesce(sum(when(col("_a") === col("_b"), 1L).otherwise(0L)),
        lit(0L)).as("n_concordant"),
      coalesce(sum(when(col("_a") && !col("_b"), 1L).otherwise(0L)),
        lit(0L)).as("b_a_only"),
      coalesce(sum(when(!col("_a") && col("_b"), 1L).otherwise(0L)),
        lit(0L)).as("b_b_only")))
  }

  /** [[mcNemar]]'s statistic from PRE-AGGREGATED counters — the
    * finisher for incremental pipelines (the streaming twin keeps
    * monotone per-shard (n_pairs, n_concordant, b_a_only, b_b_only)
    * ledgers; this sums the shards and applies the identical
    * χ² formulas, so stream and batch agree by construction — the
    * passAtKOnCounts pattern). All four counters are associative
    * sums, so ANY partitioning of the pair stream yields the same
    * statistic.
    */
  def mcNemarOnCounts(counts: DataFrame): DataFrame = {
    val agg = counts.agg(
      coalesce(sum("n_pairs"), lit(0L)).as("n_pairs"),
      coalesce(sum("n_concordant"), lit(0L)).as("n_concordant"),
      coalesce(sum("b_a_only"), lit(0L)).as("b_a_only"),
      coalesce(sum("b_b_only"), lit(0L)).as("b_b_only"))
    val d = col("b_a_only") - col("b_b_only")
    val disc = col("b_a_only") + col("b_b_only")
    val dcc = greatest(abs(d) - 1L, lit(0L))
    agg.select(col("n_pairs"), col("n_concordant"),
      col("b_a_only"), col("b_b_only"),
      when(disc > 0L,
        round((d * d).cast("double") / disc, 6)).as("chi2"),
      when(disc > 0L,
        round((dcc * dcc).cast("double") / disc, 6)).as("chi2_cc"))
  }

  /** Cochran's Q (Cochran 1950) — the k-system extension of
    * [[mcNemar]]: do k systems' binary outcomes over the same task
    * set share one success rate? With G_j the per-system success
    * total, L_i the per-task success total, and N = ΣG:
    *   Q = (k − 1)·(k·ΣG_j² − N²) / (k·N − ΣL_i²)
    * — every term an exact integer (squares on DECIMAL(38,0)), ONE
    * double division, rounded 6. Q is asymptotically χ²(k−1); for
    * k = 2 it equals McNemar's uncorrected χ² exactly. NULL when
    * the denominator is 0 (every task answered all-right or
    * all-wrong by every system — no discordance anywhere).
    *
    * Contract: a COMPLETE panel (every system scored on every task,
    * EXACTLY ONCE) — enforced like [[graft.ext.TextStats.kendallW]]
    * on DISTINCT task keys, not raw row counts: per system the gate
    * requires countDistinct(task) = count(*) = n_tasks (a duplicate
    * rating compensating an omission keeps the raw count but breaks
    * the ANOVA identity — it must gate to NULL, not pass). Since
    * countDistinct ≤ count per system, min(countDistinct) =
    * max(count) = n_tasks forces every system to n_tasks on both.
    * Q answers NULL on any violation while the counts still report.
    *
    * Scale shape: one task-keyed rollup, one system-keyed rollup
    * (dictionary-scale), two scalar reductions. No windows.
    */
  def cochranQ(outcomes: DataFrame, idCol: String, systemCol: String,
               correctCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val base = outcomes.select(col(idCol).as("_t"),
        col(systemCol).as("_s"),
        col(correctCol).cast("boolean").cast("long").as("_c"))
      .filter(col("_t").isNotNull && col("_s").isNotNull &&
        col("_c").isNotNull)
      .trackedPersist() // feeds both rollup directions
    val sys = base.groupBy("_s")
      .agg(sum("_c").as("_g"), count(lit(1)).as("_sn"),
        countDistinct("_t").as("_sd"))
      .agg(count(lit(1)).as("n_systems"),
        coalesce(sum(dec(col("_g")) * dec(col("_g"))), dec(lit(0)))
          .as("_sg2"),
        coalesce(sum(col("_g")), lit(0L)).as("_n"),
        min("_sd").as("_smn"), max("_sn").as("_smx"))
    val tasks = base.groupBy("_t").agg(sum("_c").as("_l"))
      .agg(count(lit(1)).as("n_tasks"),
        coalesce(sum(dec(col("_l")) * dec(col("_l"))), dec(lit(0)))
          .as("_sl2"))
    val k = dec(col("n_systems"))
    val num = (k - dec(lit(1))) *
      (k * col("_sg2") - dec(col("_n")) * dec(col("_n")))
    val den = k * dec(col("_n")) - col("_sl2")
    // min over systems of countDistinct(task) = max of count(*) =
    // n_tasks ⇒ every system has distinct = raw = n_tasks (distinct
    // ≤ raw per system): exactly-once complete panel.
    val complete = col("_smn") === col("_smx") &&
      col("_smx") === col("n_tasks")
    sys.crossJoin(broadcast(tasks))
      .select(col("n_tasks"), col("n_systems"),
        col("_n").as("n_successes"),
        when(den =!= dec(lit(0)) && complete,
          round(num.cast("double") / den.cast("double"), 6)).as("q"))
  }
}
