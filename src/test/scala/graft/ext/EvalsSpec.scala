package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalsSpec extends SparkSpec {
  import spark.implicits._

  test("passAtK: hand-computed falling-factorial values, the k > n " +
    "NULL gate, and monotonicity in k") {
    // task 0: n=4, c=2 → pass@1=1/2, pass@2=1−(2·1)/(4·3)=5/6,
    // pass@4=1 (C(2,4)=0), pass@8=NULL; task 1: n=4, c=0 → all 0
    val df = Seq(
      (0L, true), (0L, true), (0L, false), (0L, false),
      (1L, false), (1L, false), (1L, false), (1L, false))
      .toDF("task_id", "correct")
    val out = Evals.passAtK(df, "task_id", "correct")
      .collect().map(r => r.getLong(0) -> r).toMap
    val t0 = out(0L)
    assert(t0.getLong(1) === 4L && t0.getLong(2) === 2L)
    assert(t0.getDouble(3) === 0.5)
    assert(t0.getDouble(4) === 0.833333)
    assert(t0.getDouble(5) === 1.0)
    assert(t0.isNullAt(6), "pass@8 undefined for n=4")
    val t1 = out(1L)
    assert(t1.getDouble(3) === 0.0 && t1.getDouble(4) === 0.0 &&
      t1.getDouble(5) === 0.0)
    assert(t0.getDouble(3) <= t0.getDouble(4) &&
      t0.getDouble(4) <= t0.getDouble(5), "pass@k monotone in k")
  }

  test("bonCurve: e_max_1 is the mean, e_max_k is the max, the curve " +
    "is nondecreasing, and a hand-computed 2-subset expectation") {
    val df = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (0L, 13L, 4L)).toDF("prompt_id", "doc_id", "reward")
    val r = Evals.bonCurve(df, "prompt_id", "doc_id", "reward").head()
    assert(r.getLong(1) === 4L && r.getLong(2) === 4L) // k, best
    assert(r.getDouble(3) === 2.5)                     // e1 = mean
    // E[max of 2-subset of {1,2,3,4}] = (2·1 + 3·2 + 4·3)/C(4,2) = 20/6
    assert(r.getDouble(4) === 3.333333)
    assert(r.getDouble(5) === 4.0)                     // e4 = max at n=k
    assert(r.getDouble(3) <= r.getDouble(4) &&
      r.getDouble(4) <= r.getDouble(5))
  }

  test("bonCurve: tie-safety — equal rewards give the same curve " +
    "regardless of id order, and n > k reports NULL") {
    val a = Seq((0L, 1L, 5L), (0L, 2L, 5L), (0L, 3L, 9L))
      .toDF("prompt_id", "doc_id", "reward")
    val b = Seq((0L, 2L, 5L), (0L, 3L, 9L), (0L, 1L, 5L))
      .toDF("prompt_id", "doc_id", "reward").repartition(3)
    val ra = Evals.bonCurve(a, "prompt_id", "doc_id", "reward").head()
    val rb = Evals.bonCurve(b, "prompt_id", "doc_id", "reward").head()
    assert(ra === rb)
    assert(ra.isNullAt(5), "e_max_4 undefined for k=3")
    // E[max of 2-subset of {5,5,9}] = (5·1 + 9·2)/3 = 23/3
    assert(ra.getDouble(4) === 7.666667)
  }

  test("bcubed: perfect clustering scores 1/1/1; all-singletons vs one " +
    "class and one-big-cluster vs two classes match hand values") {
    def run(rows: Seq[(Long, String, Long)]) = {
      val r = Evals.bcubed(rows.toDF("id", "cluster", "gold"),
        "id", "cluster", "gold").head()
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
    }
    // perfect: clusters == classes
    assert(run(Seq((1L, "a", 0L), (2L, "a", 0L), (3L, "b", 1L))) ===
      ((3L, 2L, 2L, 1.0, 1.0, 1.0)))
    // 4 singletons, one gold class: P=1, R=1/4, F1=2·1·.25/1.25=0.4
    assert(run((1L to 4L).map(i => (i, s"c$i", 0L))) ===
      ((4L, 4L, 1L, 1.0, 0.25, 0.4)))
    // one cluster, two classes of 2: P=1/2, R=1, F1=2/3
    assert(run(Seq((1L, "c", 0L), (2L, "c", 0L), (3L, "c", 1L),
      (4L, "c", 1L))) === ((4L, 1L, 2L, 0.5, 1.0, 0.666667)))
  }

  test("selfConsistency: majority vs gold, ties break toward the " +
    "smaller answer, and the single-sample accuracy column is exact") {
    val df = Seq(
      (0L, 1L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),   // majority 1 = gold
      (1L, 1L, 2L), (1L, 1L, 2L), (1L, 2L, 2L), (1L, 2L, 2L), // tie → 1 ≠ gold 2
      (2L, 3L, 0L))                                // gold never sampled
      .toDF("task_id", "answer", "gold")
    val out = Evals.selfConsistency(df, "task_id", "answer", "gold")
      .collect().map(r => r.getLong(0) -> r).toMap
    val t0 = out(0L)
    assert(t0.getLong(1) === 3L && t0.getLong(3) === 2L)
    assert(t0.getDouble(4) === 0.666667)
    assert(t0.getLong(5) === 1L && t0.getLong(6) === 1L)
    val t1 = out(1L)
    assert(t1.getLong(5) === 1L, "2-2 tie must pick the smaller answer")
    assert(t1.getLong(6) === 0L)
    assert(t1.getDouble(4) === 0.5)
    val t2 = out(2L)
    assert(t2.getLong(3) === 0L && t2.getDouble(4) === 0.0 &&
      t2.getLong(6) === 0L)
  }

  test("grpoAdvantages: hand z-scores, zero-sum within prompt, NULL " +
    "on constant and singleton rosters, repartition-stable") {
    val df = Seq((0L, 1L, 0L), (0L, 2L, 2L),        // ±1
      (1L, 3L, 7L), (1L, 4L, 7L),                    // constant → NULL
      (2L, 5L, 42L))                                 // singleton → NULL
      .toDF("prompt_id", "doc_id", "reward")
    def run(d: org.apache.spark.sql.DataFrame) =
      Evals.grpoAdvantages(d, "prompt_id", "doc_id", "reward").collect()
    val out = run(df)
    val byId = out.map(r => r.getLong(1) -> r).toMap
    assert(byId(1L).getDouble(4) === -1.0)
    assert(byId(2L).getDouble(4) === 1.0)
    assert(byId(3L).isNullAt(4) && byId(4L).isNullAt(4))
    assert(byId(5L).isNullAt(4))
    assert(out.toSeq === run(df.repartition(5)).toSeq)
    // larger roster: advantages sum to ~0 (rounding ulps only)
    val big = (0L until 9L).map(i => (0L, i, (i * i * 7) % 31))
      .toDF("prompt_id", "doc_id", "reward")
    val s = run(big).map(_.getDouble(4)).sum
    assert(math.abs(s) < 1e-4, s.toString)
  }

  test("dawidSkeneRound: a planted low-accuracy pair loses a 3-2 " +
    "split to the accuracy-weighted minority") {
    // items 1..8: annotators 0,1,2 → label 0; annotators 3,4 → 1
    // (majority 0, so a3/a4 earn accuracy 1/9).
    // item 9: a0,a1 → 0; a2,a3,a4 → 1 (raw majority 1). Weighted:
    // label 0 gets w0+w1 = 888889·2; label 1 gets w2+w3+w4 =
    // 1000000 + 111111·2 — the reliable minority flips it to 0.
    val rows =
      (1L to 8L).flatMap(i => Seq((i, 0L, 0L), (i, 1L, 0L), (i, 2L, 0L),
        (i, 3L, 1L), (i, 4L, 1L))) ++
      Seq((9L, 0L, 0L), (9L, 1L, 0L), (9L, 2L, 1L), (9L, 3L, 1L),
        (9L, 4L, 1L))
    val out = Evals.dawidSkeneRound(
        rows.toDF("item_id", "annotator_id", "label"))
      .collect().map(r => r.getAs[Long]("item_id") -> r).toMap
    (1L to 8L).foreach { i =>
      assert(out(i).getAs[Long]("majority_label") === 0L)
      assert(out(i).getAs[Long]("weighted_label") === 0L)
      assert(out(i).getAs[Long]("changed") === 0L)
    }
    assert(out(9L).getAs[Long]("majority_label") === 1L)
    assert(out(9L).getAs[Long]("weighted_label") === 0L)
    assert(out(9L).getAs[Long]("changed") === 1L)
    graft.engine.TrackedCache.release()
  }

  test("dawidSkeneRound: min-label tie rule at both stages, and " +
    "determinism under repartition") {
    // one item, two annotators, distinct labels: count tie → majority
    // min(5,7)=5; weights then 1e6 (a hit) vs 0 (a miss) → weighted 5
    val tie = Seq((0L, 0L, 7L), (0L, 1L, 5L))
      .toDF("item_id", "annotator_id", "label")
    val t = Evals.dawidSkeneRound(tie).collect().head
    assert(t.getAs[Long]("majority_label") === 5L)
    assert(t.getAs[Long]("weighted_label") === 5L)
    assert(t.getAs[Long]("changed") === 0L)
    graft.engine.TrackedCache.release()

    val rows = (0L until 60L).map(i =>
      (i % 12, i % 5, (i * 7 + i % 3) % 4))
      .toDF("item_id", "annotator_id", "label")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val r = Evals.dawidSkeneRound(d).collect().toSeq
      graft.engine.TrackedCache.release()
      r
    }
    assert(run(rows) === run(rows.repartition(7)))
  }

  test("dawidSkeneRound: NULL item/annotator/label votes are dropped " +
    "(no phantom groups)") {
    val rows = Seq((Some(0L), Some(0L), Some(1L)),
      (Some(0L), Some(1L), None), (None, Some(2L), Some(1L)))
      .toDF("item_id", "annotator_id", "label")
    val out = Evals.dawidSkeneRound(rows).collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_votes") === 1L)
    graft.engine.TrackedCache.release()
  }

  test("annotatorConfusion: a perfect annotator is purely diagonal, " +
    "a label-swapper's mass sits on the swapped cell, rows sum to 1") {
    // 6 items, labels 0/1 alternating; annotators 0,1 always agree
    // (they ARE the majority), annotator 2 swaps 0↔1 every time
    val rows = (0L until 6L).flatMap { i =>
      val t = i % 2
      Seq((i, 0L, t), (i, 1L, t), (i, 2L, 1L - t))
    }.toDF("item_id", "annotator_id", "label")
    val out = Evals.annotatorConfusion(rows).collect()
    val byKey = out.map(r => (r.getAs[Long]("annotator_id"),
      r.getAs[Long]("majority_label"), r.getAs[Long]("label")) -> r).toMap
    // perfect annotators: only (m, m) cells, rate 1.0
    Seq(0L, 1L).foreach { a =>
      Seq(0L, 1L).foreach { m =>
        assert(byKey((a, m, m)).getAs[Double]("rate") === 1.0)
        assert(!byKey.contains((a, m, 1L - m)))
      }
    }
    // the swapper: only (m, 1−m) cells, rate 1.0, n = 3 per row
    Seq(0L, 1L).foreach { m =>
      val c = byKey((2L, m, 1L - m))
      assert(c.getAs[Long]("n") === 3L && c.getAs[Double]("rate") === 1.0)
      assert(!byKey.contains((2L, m, m)))
    }
    // observed row mass always sums to row_total
    out.groupBy(r => (r.getAs[Long]("annotator_id"),
      r.getAs[Long]("majority_label"))).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("n")).sum ===
        cells.head.getAs[Long]("row_total"))
    }
    graft.engine.TrackedCache.release()
  }

  test("pairedBootstrap: identical systems p = 0.5 (all ties), " +
    "planted uniform improvement wins every resample, NULL segments " +
    "drop, CI brackets the mean") {
    def run(rows: Seq[(Long, Double, Double)], b: Int = 64) = {
      val r = Evals.pairedBootstrap(
        rows.toDF("seg_id", "ma", "mb"), "seg_id", "ma", "mb", b = b)
        .collect().head
      graft.engine.TrackedCache.release()
      r
    }
    // identical systems: every delta 0 ⇒ every resample ties ⇒
    // p-value exactly 0.5, CI degenerate at 0
    val same = (0L to 19L).map(i => (i, i * 0.1, i * 0.1))
    val s = run(same)
    assert(s.getAs[Long]("n_segs") === 20L)
    assert(s.getAs[Double]("mean_delta") === 0.0 &&
      s.getAs[Double]("win_frac") === 0.0 &&
      s.getAs[Double]("tie_frac") === 1.0 &&
      s.getAs[Double]("p_value") === 0.5)
    assert(s.getAs[Double]("ci_lo") === 0.0 &&
      s.getAs[Double]("ci_hi") === 0.0)
    assert(s.getAs[Long]("n_eff") <= s.getAs[Long]("b_resamples"))

    // planted uniform +1.0 improvement: every surviving resample has
    // sq = sw·1e6 > 0 ⇒ win fraction 1, p-value 0, CI = [1, 1]
    val up = (0L to 19L).map(i => (i, i * 0.1 + 1.0, i * 0.1))
    val u = run(up)
    assert(u.getAs[Double]("win_frac") === 1.0 &&
      u.getAs[Double]("p_value") === 0.0)
    assert(math.abs(u.getAs[Double]("mean_delta") - 1.0) < 1e-6)
    assert(math.abs(u.getAs[Double]("ci_lo") - 1.0) < 1e-6 &&
      math.abs(u.getAs[Double]("ci_hi") - 1.0) < 1e-6)
    assert(u.getAs[Double]("ci_lo") <= u.getAs[Double]("mean_delta") &&
      u.getAs[Double]("mean_delta") <= u.getAs[Double]("ci_hi"))

    // NULL and NON-FINITE metric rows drop from n_segs (a NaN delta
    // quantizes to 0, so without the finite filter it would silently
    // score as a tie)
    val withNull = Seq((Some(0L), Some(1.0), Some(0.5)),
      (Some(1L), None, Some(0.5)), (None, Some(1.0), Some(0.5)),
      (Some(2L), Some(0.9), Some(0.4)),
      (Some(3L), Some(Double.NaN), Some(0.5)),
      (Some(4L), Some(Double.PositiveInfinity), Some(0.5)))
      .toDF("seg_id", "ma", "mb")
    val n = Evals.pairedBootstrap(withNull, "seg_id", "ma", "mb",
      b = 16).collect().head
    graft.engine.TrackedCache.release()
    assert(n.getAs[Long]("n_segs") === 2L)
    val p = Evals.permutationTest(withNull, "seg_id", "ma", "mb",
      b = 16).collect().head
    graft.engine.TrackedCache.release()
    assert(p.getAs[Long]("n_segs") === 2L)
  }

  test("permutationTest: identical systems p = 1, planted uniform " +
    "improvement p = 1/(b+1), and p is symmetric in the two systems") {
    def run(rows: Seq[(Long, Double, Double)], b: Int = 64) = {
      val r = Evals.permutationTest(
        rows.toDF("seg_id", "ma", "mb"), "seg_id", "ma", "mb", b = b)
        .collect().head
      graft.engine.TrackedCache.release()
      r
    }
    // identical systems: every delta 0 ⇒ every resample hits ⇒ p = 1
    val same = (0L to 19L).map(i => (i, i * 0.1, i * 0.1))
    val s = run(same)
    assert(s.getAs[Double]("mean_delta") === 0.0 &&
      s.getAs[Long]("n_hits") === 64L &&
      s.getAs[Double]("p_value") === 1.0)

    // planted +1.0 on 20 segments: a flipped sum matches |Σqd| only
    // if ALL 20 coins land heads — absent in 64 resamples ⇒ r = 0 ⇒
    // p = 1/65 exactly
    val up = (0L to 19L).map(i => (i, i * 0.1 + 1.0, i * 0.1))
    val u = run(up)
    assert(u.getAs[Long]("n_hits") === 0L)
    assert(u.getAs[Double]("p_value") ===
      math.rint(1e6 / 65.0) / 1e6)

    // exchanging the systems negates every delta and every flipped
    // sum ⇒ identical |·| comparisons ⇒ identical p
    val mixed = (0L to 19L).map(i =>
      (i, i * 0.07 + (if (i % 3 == 0) 0.4 else -0.1), i * 0.07))
    val ab = run(mixed)
    val ba = run(mixed.map { case (i, a, b) => (i, b, a) })
    assert(ab.getAs[Double]("p_value") === ba.getAs[Double]("p_value"))
    assert(ab.getAs[Double]("mean_delta") ===
      -ba.getAs[Double]("mean_delta"))
  }

  test("permutationTest: empty input is UNDEFINED — n_hits and " +
    "p_value answer NULL, not p = 1/(b+1)") {
    val e = Evals.permutationTest(
      Seq.empty[(Long, Double, Double)].toDF("seg_id", "ma", "mb"),
      "seg_id", "ma", "mb", b = 64).collect().head
    graft.engine.TrackedCache.release()
    assert(e.getAs[Long]("n_segs") === 0L)
    assert(e.isNullAt(e.fieldIndex("mean_delta")) &&
      e.isNullAt(e.fieldIndex("n_hits")) &&
      e.isNullAt(e.fieldIndex("p_value")),
      s"an undefined test must not read as significant: $e")
  }

  test("mcNemar: hand-computed chi2, no-discordance NULL, symmetry, " +
    "NULL outcomes drop") {
    def run(rows: Seq[(Long, Boolean, Boolean)]) = {
      val r = Evals.mcNemar(rows.toDF("t", "a", "b"), "t", "a", "b")
        .collect().head
      graft.engine.TrackedCache.release()
      r
    }
    // 10 pairs: 4 concordant-right, 2 concordant-wrong,
    // 3 a-only, 1 b-only ⇒ chi2 = (3−1)²/4 = 1, cc = (2−1)²/4 = 0.25
    val rows =
      Seq.fill(4)((true, true)) ++ Seq.fill(2)((false, false)) ++
      Seq.fill(3)((true, false)) ++ Seq.fill(1)((false, true))
    val m = run(rows.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a, b) })
    assert(m.getAs[Long]("n_pairs") === 10L &&
      m.getAs[Long]("n_concordant") === 6L &&
      m.getAs[Long]("b_a_only") === 3L &&
      m.getAs[Long]("b_b_only") === 1L)
    assert(m.getAs[Double]("chi2") === 1.0 &&
      m.getAs[Double]("chi2_cc") === 0.25)

    // systems never disagree ⇒ statistic undefined
    val agree = (0L to 5L).map(i => (i, i % 2 == 0, i % 2 == 0))
    val g = run(agree)
    assert(g.isNullAt(g.fieldIndex("chi2")) &&
      g.isNullAt(g.fieldIndex("chi2_cc")))

    // chi2 is symmetric under system exchange (d is squared)
    val swapped = run(rows.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, b, a) })
    assert(swapped.getAs[Double]("chi2") === m.getAs[Double]("chi2"))

    // a NULL outcome makes the pair unscoreable
    val withNull = Seq((Some(0L), Some(true), Some(false)),
      (Some(1L), None, Some(true)), (Some(2L), Some(true), Some(true)))
      .toDF("t", "a", "b")
    val n = Evals.mcNemar(withNull, "t", "a", "b").collect().head
    graft.engine.TrackedCache.release()
    assert(n.getAs[Long]("n_pairs") === 2L)
  }

  test("cochranQ: k = 2 equals McNemar's uncorrected chi2, identical " +
    "systems NULL, incomplete panel NULL with counts reporting") {
    def long(rows: Seq[(Long, Long, Boolean)]) =
      rows.toDF("t", "s", "c")
    // the q376 hand panel in long form: Q(k=2) == McNemar chi2 == 1
    val pairRows =
      Seq.fill(4)((true, true)) ++ Seq.fill(2)((false, false)) ++
      Seq.fill(3)((true, false)) ++ Seq.fill(1)((false, true))
    val longRows = pairRows.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, 0L, a), (i.toLong, 1L, b)) }
    val q2 = Evals.cochranQ(long(longRows), "t", "s", "c")
      .collect().head
    graft.engine.TrackedCache.release()
    assert(q2.getAs[Long]("n_tasks") === 10L &&
      q2.getAs[Long]("n_systems") === 2L)
    assert(q2.getAs[Double]("q") === 1.0)

    // three identical systems: no discordance ⇒ denominator 0 ⇒ NULL
    val ident = (0L to 7L).flatMap(i =>
      (0L to 2L).map(s => (i, s, i % 2 == 0)))
    val qi = Evals.cochranQ(long(ident), "t", "s", "c").collect().head
    graft.engine.TrackedCache.release()
    assert(qi.isNullAt(qi.fieldIndex("q")))

    // system 1 missing task 9 ⇒ complete-panel gate refuses
    val incomplete = longRows.filterNot { case (t, s, _) =>
      t == 9L && s == 1L }
    val qn = Evals.cochranQ(long(incomplete), "t", "s", "c")
      .collect().head
    graft.engine.TrackedCache.release()
    assert(qn.getAs[Long]("n_tasks") === 10L &&
      qn.isNullAt(qn.fieldIndex("q")))

    // a DUPLICATE rating compensating the omission keeps system 1's
    // raw count at 10 but breaks the ANOVA identity — the distinct-
    // key gate must still refuse (the count-based gate would pass)
    val duped = incomplete :+ (0L, 1L, longRows
      .find { case (t, s, _) => t == 0L && s == 1L }.get._3)
    val qd = Evals.cochranQ(long(duped), "t", "s", "c").collect().head
    graft.engine.TrackedCache.release()
    assert(qd.getAs[Long]("n_tasks") === 10L &&
      qd.isNullAt(qd.fieldIndex("q")),
      s"duplicate-compensated panel must gate to NULL: $qd")
  }

  test("ipsOffPolicy: identical policies give the on-policy mean and " +
    "ESS = n, reweighting shifts toward upweighted actions, " +
    "ESS <= n always, bad rows drop") {
    def run(rows: Seq[(Long, Double, Double, Double)]) = {
      val r = Evals.ipsOffPolicy(rows.toDF("t", "pb", "pt", "r"),
        "t", "pb", "pt", "r").collect().head
      graft.engine.TrackedCache.release()
      r
    }
    // π_target = π_behavior ⇒ every w = 1: IPS = SNIPS = mean reward,
    // ESS = n exactly
    val same = Seq((0L, 0.5, 0.5, 1.0), (1L, 0.25, 0.25, 0.0),
      (2L, 0.8, 0.8, 0.5), (3L, 0.1, 0.1, 0.25))
    val s = run(same)
    assert(s.getAs[Long]("n_samples") === 4L &&
      s.getAs[Long]("n_dropped") === 0L)
    assert(s.getAs[Double]("ips") === 0.4375 &&
      s.getAs[Double]("snips") === 0.4375 &&
      s.getAs[Double]("ess") === 4.0)

    // target upweights the high-reward action (w = 2 on r = 1, w = ½
    // on r = 0): hand values — IPS = (2·1 + 0.5·0)/2 = 1,
    // SNIPS = 2/(2.5) = 0.8, ESS = 2.5²/4.25
    val shifted = Seq((0L, 0.25, 0.5, 1.0), (1L, 0.5, 0.25, 0.0))
    val h = run(shifted)
    assert(h.getAs[Double]("ips") === 1.0 &&
      h.getAs[Double]("snips") === 0.8)
    assert(math.abs(h.getAs[Double]("ess") - 6.25 / 4.25) < 1e-6)
    assert(h.getAs[Double]("ess") <=
      h.getAs[Long]("n_samples").toDouble + 1e-9)

    // NULL reward and zero behavior prob are unscoreable
    val bad = Seq((Some(0L), Some(0.5), Some(0.5), Some(1.0)),
      (Some(1L), Some(0.0), Some(0.5), Some(1.0)),
      (Some(2L), Some(0.5), Some(0.5), None))
      .toDF("t", "pb", "pt", "r")
    val b = Evals.ipsOffPolicy(bad, "t", "pb", "pt", "r")
      .collect().head
    graft.engine.TrackedCache.release()
    assert(b.getAs[Long]("n_samples") === 1L &&
      b.getAs[Long]("n_dropped") === 2L)
  }

  test("ipsOffPolicy: non-finite propensities/rewards drop — a NaN " +
    "behavior prob must NOT pass the > 0 filter (Spark SQL orders " +
    "NaN above every double; the streaming twin's Scala comparison " +
    "drops it, and the twins must drop identically)") {
    val nan = Double.NaN
    val inf = Double.PositiveInfinity
    val rows = Seq(
      (0L, 0.5, 0.5, 1.0),   // clean — the only survivor
      (1L, nan, 0.5, 1.0),   // NaN pb: NaN > 0 is TRUE in Spark SQL
      (2L, 0.5, nan, 1.0),   // NaN pt
      (3L, 0.5, 0.5, nan),   // NaN reward
      (4L, inf, 0.5, 1.0),   // +Inf pb
      (5L, 0.5, inf, 1.0),   // +Inf pt
      (6L, 0.5, 0.5, -inf))  // -Inf reward
    val r = Evals.ipsOffPolicy(rows.toDF("t", "pb", "pt", "r"),
      "t", "pb", "pt", "r").collect().head
    graft.engine.TrackedCache.release()
    assert(r.getAs[Long]("n_samples") === 1L &&
      r.getAs[Long]("n_dropped") === 6L, s"got $r")
    assert(r.getAs[Double]("ips") === 1.0 &&
      r.getAs[Double]("ess") === 1.0)
    // same rule in drOffPolicy (plus its q̂ column)
    val d = Evals.drOffPolicy(
      rows.map { case (t, pb, pt, rr) => (t, pb, pt, rr, 0.5) }
        .toDF("t", "pb", "pt", "r", "qh"),
      "t", "pb", "pt", "r", "qh").collect().head
    graft.engine.TrackedCache.release()
    assert(d.getAs[Long]("n_samples") === 1L &&
      d.getAs[Long]("n_dropped") === 6L, s"got $d")
    val dq = Evals.drOffPolicy(
      Seq((0L, 0.5, 0.5, 1.0, 0.5), (1L, 0.5, 0.5, 1.0, nan))
        .toDF("t", "pb", "pt", "r", "qh"),
      "t", "pb", "pt", "r", "qh").collect().head
    graft.engine.TrackedCache.release()
    assert(dq.getAs[Long]("n_samples") === 1L &&
      dq.getAs[Long]("n_dropped") === 1L)
  }

  test("drOffPolicy: a perfect reward model cancels the importance " +
    "weights exactly, identical policies reduce to the mean reward, " +
    "bad rows drop") {
    def run(rows: Seq[(Long, Double, Double, Double, Double)]) = {
      val r = Evals.drOffPolicy(rows.toDF("t", "pb", "pt", "r", "qh"),
        "t", "pb", "pt", "r", "qh").collect().head
      graft.engine.TrackedCache.release()
      r
    }
    // q̂ = r: DR = mean reward no matter how wild the weights are —
    // the doubly-robust cancellation
    val perfect = Seq((0L, 0.01, 0.99, 1.0, 1.0),
      (1L, 0.9, 0.05, 0.5, 0.5), (2L, 0.2, 0.8, 0.25, 0.25))
    val p = run(perfect)
    assert(p.getAs[Double]("dr") ===
      BigDecimal((1.0 + 0.5 + 0.25) / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // ...while plain IPS is blown around by the weights
    assert(math.abs(p.getAs[Double]("ips") - p.getAs[Double]("dr"))
      > 0.1)

    // identical policies (w = 1): DR = q̂ + (r − q̂) = r ⇒ mean
    // reward, and equals IPS exactly, whatever q̂ says
    val same = Seq((0L, 0.5, 0.5, 1.0, 0.2), (1L, 0.25, 0.25, 0.0, 0.9),
      (2L, 0.8, 0.8, 0.5, 0.1))
    val s = run(same)
    assert(s.getAs[Double]("dr") === 0.5 &&
      s.getAs[Double]("ips") === 0.5)

    // NULL q̂ / zero behavior prob drop and are counted
    val bad = Seq((Some(0L), Some(0.5), Some(0.5), Some(1.0), Some(1.0)),
      (Some(1L), Some(0.0), Some(0.5), Some(1.0), Some(1.0)),
      (Some(2L), Some(0.5), Some(0.5), Some(1.0), None))
      .toDF("t", "pb", "pt", "r", "qh")
    val b = Evals.drOffPolicy(bad, "t", "pb", "pt", "r", "qh")
      .collect().head
    graft.engine.TrackedCache.release()
    assert(b.getAs[Long]("n_samples") === 1L &&
      b.getAs[Long]("n_dropped") === 2L)
  }

  test("confSeqTest: hand moments, the radius shrinks in n and grows " +
    "as alpha drops, a planted shift rejects once n is large enough, " +
    "identical systems never reject, non-finite deltas drop") {
    def run(rows: Seq[(Long, Double, Double)], alpha: Double = 0.05,
            scale: Double = 1.0) = {
      val r = Evals.confSeqTest(rows.toDF("seg_id", "ma", "mb"),
        "seg_id", "ma", "mb", alpha = alpha, scale = scale)
        .collect().head
      graft.engine.TrackedCache.release()
      r
    }
    // hand moments: deltas +0.5, -0.5 → mean 0, var 0.25
    val hand = run(Seq((0L, 1.0, 0.5), (1L, 0.0, 0.5)))
    assert(hand.getAs[Long]("n_segs") === 2L &&
      hand.getAs[Double]("mean_delta") === 0.0 &&
      hand.getAs[Double]("var_delta") === 0.25 &&
      hand.getAs[Long]("reject_null") === 0L)
    // radius formula, hand-checked: n=2, alpha=.05, scale=1 →
    // 1.7·sqrt((lnln4 + .72·ln104)/2)
    val expect = 1.7 * math.sqrt((math.log(math.log(4.0)) +
      0.72 * math.log(5.2 / 0.05)) / 2.0)
    assert(math.abs(hand.getAs[Double]("radius") - expect) < 1e-6)
    // anytime-valid monotonicity: radius(4n) < radius(n), and a
    // smaller alpha widens the interval at the same n
    def seg(n: Int) = (0 until n).map(i =>
      (i.toLong, if (i % 2 == 0) 1.0 else 0.0, 0.5))
    assert(run(seg(64)).getAs[Double]("radius") >
      run(seg(256)).getAs[Double]("radius"))
    assert(run(seg(64), alpha = 0.01).getAs[Double]("radius") >
      run(seg(64), alpha = 0.2).getAs[Double]("radius"))
    // a planted +0.5 shift: not rejectable at n=4 (radius ~1.3),
    // rejected at n=4096 (radius ~0.04) — the CS closes on the truth
    val shift = (n: Int) => (0 until n).map(i => (i.toLong, 0.5, 0.0))
    assert(run(shift(4)).getAs[Long]("reject_null") === 0L)
    assert(run(shift(4096)).getAs[Long]("reject_null") === 1L)
    // identical systems: mean 0 forever, never rejected
    assert(run(seg(512).map { case (i, _, _) => (i, 0.3, 0.3) })
      .getAs[Long]("reject_null") === 0L)
    // NaN / infinite deltas drop; empty input answers NULLs
    val nf = run(Seq((0L, 1.0, 0.5), (1L, Double.NaN, 0.5),
      (2L, Double.PositiveInfinity, 0.5)))
    assert(nf.getAs[Long]("n_segs") === 1L)
    val e = run(Seq.empty[(Long, Double, Double)])
    assert(e.getAs[Long]("n_segs") === 0L &&
      e.isNullAt(e.fieldIndex("mean_delta")) &&
      e.isNullAt(e.fieldIndex("radius")) &&
      e.isNullAt(e.fieldIndex("reject_null")))
  }

  test("groupedBootstrapCI: degenerate single-value group collapses " +
    "to the point CI, CIs bracket their group means, groups resample " +
    "independently of frame co-residence") {
    val g1 = (0L until 40L).map(i => ("flat", i, 0.25))
    val g2 = (0L until 400L).map(i =>
      ("mix", i + 1000L, (i % 10).toDouble / 10.0))
    val out = Evals.groupedBootstrapCI(
      (g1 ++ g2).toDF("g", "id", "x"), "g", "id", "x", b = 64,
      seed = "t")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    graft.engine.TrackedCache.release()
    // degenerate group: every resample mean is exactly 0.25
    val f = out("flat")
    assert(f.getAs[Double]("mean") === 0.25 &&
      f.getAs[Double]("ci_lo") === 0.25 &&
      f.getAs[Double]("ci_hi") === 0.25)
    assert(f.getAs[Long]("n_rows") === 40L &&
      f.getAs[Long]("b_resamples") === 64L &&
      f.getAs[Long]("n_eff") <= 64L && f.getAs[Long]("n_eff") > 0L)
    // mixed group: CI brackets the mean strictly
    val m = out("mix")
    assert(m.getAs[Double]("ci_lo") < m.getAs[Double]("mean") &&
      m.getAs[Double]("mean") < m.getAs[Double]("ci_hi"))
    assert(m.getAs[Double]("mean") === 0.45)
    // independence law: the mix group's CI is identical whether or
    // not the flat group shares the frame (the coin is keyed by
    // (resample, row id), never by anything global)
    val solo = Evals.groupedBootstrapCI(
      g2.toDF("g", "id", "x"), "g", "id", "x", b = 64, seed = "t")
      .collect().head
    graft.engine.TrackedCache.release()
    assert(solo.getAs[Double]("ci_lo") === m.getAs[Double]("ci_lo") &&
      solo.getAs[Double]("ci_hi") === m.getAs[Double]("ci_hi") &&
      solo.getAs[Long]("n_eff") === m.getAs[Long]("n_eff"))
    // deterministic under repartition: md5 coins + integer sums,
    // no partition-order dependence anywhere
    val g2df = g2.toDF("g", "id", "x")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val out = Evals.groupedBootstrapCI(df, "g", "id", "x", b = 64,
        seed = "t").collect().toSeq
      graft.engine.TrackedCache.release()
      out
    }
    assert(run(g2df) === run(g2df.repartition(7)))
  }

  test("confSeqTestEB: the EB radius undercuts the sub-Gaussian " +
    "radius when variance << scale², rejects where SG cannot, hand " +
    "formula, planted null never rejects, non-finite deltas drop") {
    def run(rows: Seq[(Long, Double, Double)], alpha: Double = 0.05,
            scale: Double = 1.0) = {
      val r = Evals.confSeqTestEB(rows.toDF("seg_id", "ma", "mb"),
        "seg_id", "ma", "mb", alpha = alpha, scale = scale)
        .collect().head
      graft.engine.TrackedCache.release()
      r
    }
    // small positive delta, tiny spread, conservative scale = 1:
    // mean 0.03, |d| spread 0.02 — SG radius stays above the mean at
    // n = 4096 while EB adapts and rejects
    val planted = (0 until 4096).map(i =>
      (i.toLong, 0.5 + 0.02 + (i % 100 - 50) / 5000.0, 0.5))
    val p = run(planted)
    assert(p.getAs[Double]("radius_eb") <
      p.getAs[Double]("radius_sg"),
      s"EB must undercut SG on low-variance deltas: $p")
    assert(math.abs(p.getAs[Double]("mean_delta")) <
      p.getAs[Double]("radius_sg"),
      s"fixture broken: SG should NOT reject here: $p")
    assert(p.getAs[Long]("reject_null") === 1L,
      s"EB must reject the planted shift: $p")
    // hand formula at n = 2: deltas ±0.5 → mean 0, var 0.25
    val hand = run(Seq((0L, 1.0, 0.5), (1L, 0.0, 0.5)))
    val ell = math.log(math.log(4.0)) + 0.72 * math.log(5.2 / 0.05)
    val ebExpect = 1.7 * math.sqrt(0.25 * ell / 2.0) + 3.4 * ell / 2.0
    val sgExpect = 1.7 * math.sqrt(ell / 2.0)
    assert(math.abs(hand.getAs[Double]("radius_eb") - ebExpect) < 1e-6)
    assert(math.abs(hand.getAs[Double]("radius_sg") - sgExpect) < 1e-6)
    assert(hand.getAs[Long]("reject_null") === 0L)
    // planted null: symmetric deltas, never rejected
    val nul = (0 until 2048).map(i =>
      (i.toLong, if (i % 2 == 0) 0.52 else 0.48, 0.5))
    assert(run(nul).getAs[Long]("reject_null") === 0L)
    // the finite rule is confSeqTest's
    val nf = run(Seq((0L, 1.0, 0.5), (1L, Double.NaN, 0.5),
      (2L, Double.NegativeInfinity, 0.5)))
    assert(nf.getAs[Long]("n_segs") === 1L)
    val e = run(Seq.empty[(Long, Double, Double)])
    assert(e.getAs[Long]("n_segs") === 0L &&
      e.isNullAt(e.fieldIndex("radius_eb")) &&
      e.isNullAt(e.fieldIndex("reject_null")))
  }

  test("seqTestOnCountsEB: sharded ledger counters finish to the " +
    "same row as the raw batch pass (stream/batch parity is a " +
    "finisher swap)") {
    val raw = (0 until 600).map(i =>
      (i.toLong, 0.3 + (i % 7) / 100.0, 0.3)).toDF("seg_id", "ma", "mb")
    // ledger twin: quantize per row, sum per shard — the
    // confSeqLedgerStream state shape
    val shards = raw
      .select((col("seg_id") % 8).as("shard"),
        (col("ma") - col("mb")).as("d"))
      .select(col("shard"),
        round(lit(1e6) * col("d")).cast("long").as("qd"),
        round(lit(1e6) * col("d") * col("d")).cast("long").as("qd2"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_segs"), sum("qd").as("sqd"),
        sum("qd2").as("sqd2"))
    val fromLedger = Evals.seqTestOnCountsEB(
      shards.select("n_segs", "sqd", "sqd2"), alpha = 0.05,
      scale = 0.5).collect().toSeq
    val fromRaw = Evals.confSeqTestEB(raw, "seg_id", "ma", "mb",
      alpha = 0.05, scale = 0.5).collect().toSeq
    graft.engine.TrackedCache.release()
    assert(fromLedger === fromRaw)
  }
}
