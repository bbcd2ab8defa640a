package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = {
    val toks = TextStats.tokens(col("text"))
    Tables.load(spark, sf001, "documents").withColumn("y",
      (array_contains(toks, "spark") && array_contains(toks, "stream") &&
        array_contains(toks, "window")).cast("int"))
  }

  test("bucket: md5-derived, non-negative, stable, within [0, dim)") {
    val toks = Seq("alpha", "beta", "gamma", "the", "a").toDF("t")
    val bs = toks.select(Classifier.bucket($"t", 64).as("b")).collect()
      .map(_.getLong(0))
    assert(bs.forall(b => b >= 0 && b < 64))
    val again = toks.select(Classifier.bucket($"t", 64).as("b")).collect()
      .map(_.getLong(0))
    assert(bs.toSeq === again.toSeq)
  }

  test("IRLS separates a planted separable corpus perfectly") {
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "good clean prose sentence", 1)
      else (i.toLong, "bad noisy garbage junk", 0)
    }.toDF("doc_id", "text", "y")
    val m = Classifier.train(docs, "y", dim = 64, iters = 2)
    val wrong = Classifier.score(docs, m).join(docs.select($"doc_id", $"y"), "doc_id")
      .filter(($"pred" && $"y" === 0) || (!$"pred" && $"y" === 1)).count()
    assert(wrong === 0L)
  }

  test("distills a k-of-n teacher rule from real docs (needle in 256 buckets)") {
    val d = labeled
    val m = Classifier.train(d, "y", dim = 256, iters = 3)
    val scored = Classifier.score(d, m).join(d.select($"doc_id", $"y"), "doc_id")
    val acc = scored.filter(($"pred" && $"y" === 1) || (!$"pred" && $"y" === 0))
      .count().toDouble / scored.count()
    assert(acc >= 0.95, s"distillation accuracy $acc")
  }

  test("more IRLS iterations do not worsen the fit (log-loss descent)") {
    val d = labeled
    val l1 = Classifier.logLoss(d, Classifier.train(d, "y", iters = 1), "y")
    val l3 = Classifier.logLoss(d, Classifier.train(d, "y", iters = 3), "y")
    assert(l3 <= l1 + 1e-9, s"loss rose: $l1 -> $l3")
  }

  test("literal-map and broadcast-join margins are bit-identical") {
    val d = labeled
    val m = Classifier.train(d, "y", iters = 2)
    def scores(via: Boolean) =
      Classifier.score(d, m, viaJoin = Some(via)).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // both paths fold ascending-bucket — exact double equality
    assert(scores(false) === scores(true))
    // and the join path's plan actually broadcasts the weights
    val plan = Classifier.score(d, m, viaJoin = Some(true))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("scores are bit-identical under different partitionings") {
    val d = labeled
    val m = Classifier.train(d, "y", iters = 2)
    def scores(df: org.apache.spark.sql.DataFrame) =
      Classifier.score(df, m).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = scores(d)
    val b = scores(d.repartition(17))
    assert(a === b) // exact double equality — the ordered-fold contract
  }

  // ——— rankAuc ———

  private def aucOf(rows: Seq[(Double, Boolean)]): Option[Double] = {
    val r = Classifier.rankAuc(
      rows.toDF("score", "y"), "score", col("y")).head()
    if (r.isNullAt(r.fieldIndex("auc"))) None
    else Some(r.getAs[Double]("auc"))
  }

  test("rankAuc: perfect separation → 1.0, inverted → 0.0, random ties → 0.5") {
    val perfect = (1 to 10).map(i => (i.toDouble, i > 5))
    assert(aucOf(perfect) === Some(1.0))
    assert(aucOf(perfect.map { case (s, y) => (s, !y) }) === Some(0.0))
    // identical scores for every row: midrank ties → exactly 0.5
    val allTied = (1 to 10).map(i => (7.5, i % 2 == 0))
    assert(aucOf(allTied) === Some(0.5))
  }

  test("rankAuc: hand-computed value with partial ties") {
    // scores: pos {3, 2}, neg {2, 1}. Pairs: (3>2)=1, (3>1)=1,
    // (2=2)=0.5, (2>1)=1 → U=3.5, AUC=3.5/4=0.875
    assert(aucOf(Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false)))
      === Some(0.875))
  }

  test("rankAuc: degenerate single-class input answers null, not 0/0") {
    assert(aucOf(Seq((1.0, true), (2.0, true))) === None)
    val r = Classifier.rankAuc(
      Seq((1.0, true), (2.0, true)).toDF("score", "y"), "score", col("y")).head()
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 0L)
  }

  test("calibrationBins: calibrated data → ece 0; overconfidence measured exactly") {
    // two score levels whose empirical rates match the scores exactly
    val calibrated = (1L to 20L).map(i => (i, 0.25, if (i <= 5) 1 else 0)) ++
      (21L to 40L).map(i => (i, 0.75, if (i <= 35) 1 else 0))
    val c = Classifier.calibrationBins(
      calibrated.toDF("doc_id", "score", "y"), "y", "score", bins = 2)
      .collect()
    assert(c.length === 2)
    c.foreach { r =>
      assert(r.getAs[Double]("confidence") === r.getAs[Double]("accuracy"))
      assert(r.getAs[Double]("ece") === 0.0)
    }
    // uniformly overconfident: says 0.9, delivers 0.5 → ece 0.4
    val over = (1L to 40L).map(i => (i, 0.9, (i % 2).toInt))
    val o = Classifier.calibrationBins(
      over.toDF("doc_id", "score", "y"), "y", "score", bins = 2).collect()
    o.foreach(r => assert(r.getAs[Double]("ece") === 0.4))
  }

  test("calibrationBins: bin confidences are non-decreasing in bin order") {
    val rows = (1L to 100L).map(i => (i, i.toDouble / 100, (i % 3) match {
      case 0 => 1; case _ => 0
    }))
    val out = Classifier.calibrationBins(
      rows.toDF("doc_id", "score", "y"), "y", "score", bins = 5).collect()
    val confs = out.map(_.getAs[Double]("confidence")).toSeq
    assert(confs === confs.sorted)
    assert(out.map(_.getAs[Long]("n")).sum === 100L)
  }

  test("rankAuc: invariant under strictly monotone score transforms") {
    val rows = (1 to 40).map(i => (i.toDouble, (i * 7) % 3 == 0))
    val a = aucOf(rows)
    val b = aucOf(rows.map { case (s, y) => (s * 10 + 100, y) })
    assert(a === b)
  }

  test("brierDecomposition: hand-computed Murphy terms and the " +
    "REL - RES + UNC identity on bin-pure forecasts") {
    import spark.implicits._
    // p=0.1 twice with y=0, p=0.9 twice with y=1 → two pure bins
    val scored = Seq((0.1, 0), (0.1, 0), (0.9, 1), (0.9, 1))
      .toDF("score", "y")
    val r = Classifier.brierDecomposition(scored, "y", "score").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_bins") === 2L)
    assert(r.getAs[Double]("brier") === 0.01)
    assert(r.getAs[Double]("reliability") === 0.01)
    assert(r.getAs[Double]("resolution") === 0.25)
    assert(r.getAs[Double]("uncertainty") === 0.25)
    // identity holds here (up to double re-association): brier = REL - RES + UNC
    assert(math.abs(r.getAs[Double]("brier") -
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
        r.getAs[Double]("uncertainty"))) < 1e-9)
    // perfect calibrated separation: zero brier, zero reliability
    val perfect = Seq((1.0, 1), (0.0, 0)).toDF("score", "y")
    val p = Classifier.brierDecomposition(perfect, "y", "score").head()
    assert(p.getAs[Double]("brier") === 0.0)
    assert(p.getAs[Double]("reliability") === 0.0)
    assert(p.getAs[Double]("resolution") === 0.25)
    assert(p.getAs[Double]("uncertainty") === 0.25)
  }

  test("conformalSplit: qhat is the exact nearest-rank statistic of " +
    "the calibration half and the eval report replays from it") {
    import spark.implicits._
    // deterministic scores: doc i has score (i%101)/100, label = score>=0.5
    // with 10% planted label flips — imperfect but informative
    val df = (0L until 400L).map { i =>
      val sc = (i % 101).toDouble / 100.0
      val y = if (i % 10 == 0) 1 - (if (sc >= 0.5) 1 else 0)
              else (if (sc >= 0.5) 1 else 0)
      (i, sc, y)
    }.toDF("doc_id", "score", "y")
    val alpha = 0.1
    val r = Classifier.conformalSplit(df, "y", "score", alpha).head()
    // replay from first principles on the collected rows
    val rows = df.collect().map { row =>
      val id = row.getLong(0); val sc = row.getDouble(1); val y = row.getInt(2)
      val smRaw = BigDecimal(sc * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val nc = if (y == 1) 1000000L - smRaw else smRaw
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:cal1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (id, smRaw, nc, java.lang.Long.parseLong(hex, 16) % 2 == 0, y)
    }
    val cal = rows.filter(_._4).map(_._3).sorted
    val n = cal.length
    val rank = math.min(math.ceil((n + 1) * (1 - alpha)).toLong, n.toLong)
    val qhat = cal(rank.toInt - 1)
    assert(r.getAs[Long]("n_cal") === n.toLong)
    assert(r.getAs[Long]("qhat_micro") === qhat)
    val ev = rows.filterNot(_._4)
    assert(r.getAs[Long]("n_eval") === ev.length.toLong)
    val covered = ev.count(_._3 <= qhat)
    assert(r.getAs[Double]("coverage") ===
      BigDecimal(covered.toDouble / ev.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the conformal guarantee on this well-behaved set
    assert(r.getAs[Double]("coverage") >= 1 - alpha - 0.05,
      s"coverage ${r.getAs[Double]("coverage")} far below target")
    val sizes = ev.map(t => (if (1000000L - t._2 <= qhat) 1 else 0) +
      (if (t._2 <= qhat) 1 else 0))
    assert(r.getAs[Double]("avg_set_size") ===
      BigDecimal(sizes.sum.toDouble / ev.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("share_empty") ===
      BigDecimal(sizes.count(_ == 0).toDouble / ev.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("share_both") ===
      BigDecimal(sizes.count(_ == 2).toDouble / ev.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // tighter alpha can only raise qhat (monotone threshold law)
    val r2 = Classifier.conformalSplit(df, "y", "score", alpha = 0.01).head()
    assert(r2.getAs[Long]("qhat_micro") >= qhat)
    graft.engine.TrackedCache.release()
  }

  // deterministic pseudo-random regression frame: two groups, target
  // spread by a fixed multiplicative hash — every law below is a
  // fixed-point check (md5 coins + fixed data → one reproducible run)
  private def cqrFrame = (0L until 4000L).map { i =>
    (i, if (i % 2 == 0) "a" else "b",
      ((i * 2654435761L) % 10007L).toDouble / 100.0)
  }.toDF("event_id", "event_type", "value")

  test("cqr: eval coverage meets the distribution-free target on iid " +
    "md5 splits, for every group") {
    val out = Classifier.cqr(cqrFrame, "event_type", "value", "event_id",
      alpha = 0.2).collect()
    assert(out.length === 2)
    for (r <- out) {
      assert(r.getAs[Double]("coverage") >= 0.75,
        s"group ${r.getString(0)}: coverage ${r.getAs[Double]("coverage")}")
      assert(r.getAs[Long]("n_train") > 0 && r.getAs[Long]("n_eval") > 0)
    }
    graft.engine.TrackedCache.release()
  }

  test("cqr: shrinking alpha never narrows the conformalized interval") {
    def widths(alpha: Double) = {
      val m = Classifier.cqr(cqrFrame, "event_type", "value", "event_id",
        alpha = alpha).collect()
        .map(r => r.getString(0) -> r.getAs[Double]("width")).toMap
      graft.engine.TrackedCache.release()
      m
    }
    val tight = widths(0.1)
    val loose = widths(0.4)
    for ((g, w) <- tight)
      assert(w >= loose(g), s"group $g: width($w) < width(${loose(g)})")
  }

  test("cqr: a constant target collapses to a zero-width interval with " +
    "qhat 0 and full coverage") {
    val const = (0L until 600L).map(i => (i, "g", 12.34))
      .toDF("event_id", "event_type", "value")
    val r = Classifier.cqr(const, "event_type", "value", "event_id",
      alpha = 0.2).head()
    assert(r.getAs[Double]("q_lo") === 12.34)
    assert(r.getAs[Double]("q_hi") === 12.34)
    assert(r.getAs[Long]("qhat_cents") === 0L)
    assert(r.getAs[Double]("coverage") === 1.0)
    assert(r.getAs[Double]("width") === 0.0)
    graft.engine.TrackedCache.release()
  }

  test("cqr is deterministic under repartition (md5 splits, dictionary " +
    "ranks — no partition-order dependence)") {
    def run(df: org.apache.spark.sql.DataFrame) = {
      val out = Classifier.cqr(df, "event_type", "value", "event_id",
        alpha = 0.2).collect().toSeq
      graft.engine.TrackedCache.release()
      out
    }
    assert(run(cqrFrame) === run(cqrFrame.repartition(7)))
  }

  /** Brute-force PAV over (bucket, n, sy) triples — the O(n²)
    * reference the distributed fold must match block-for-block. */
  private def refPav(buckets: Seq[(Long, Long, Long)])
      : Seq[(Long, Long, Long, Long)] = {
    val stack = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    for ((b, n, sy) <- buckets.sortBy(_._1)) {
      stack += ((b, b, n, sy))
      while (stack.length >= 2 && {
        val l = stack(stack.length - 2); val r = stack.last
        l._4 * r._3 >= r._4 * l._3 // small fixtures: Long is exact
      }) {
        val r = stack.remove(stack.length - 1)
        val l = stack.remove(stack.length - 1)
        stack += ((l._1, r._2, l._3 + r._3, l._4 + r._4))
      }
    }
    stack.toSeq
  }

  test("isotonicCalibration: hand panel pools the violating run, " +
    "already-isotonic input is a fixed point, blocks partition the " +
    "input with weighted-mean fitted values") {
    // scores 0.1..0.5 with rates 0.0, 0.8, 0.4, 0.6, 1.0 — PAV must
    // pool {0.8, 0.4, 0.6} (means 4/5, 2/5, 3/5 → one 9/15 block)
    val rows = Seq(
      (0.1, 0, 5), (0.2, 4, 5), (0.3, 2, 5), (0.4, 3, 5), (0.5, 5, 5))
      .flatMap { case (sc, pos, tot) =>
        (0 until tot).map(i => ("g", sc, if (i < pos) 1L else 0L)) }
    val out = Classifier.isotonicCalibration(
      rows.toDF("g", "score", "y"), "y", "score", "g", buckets = 10)
      .collect()
    graft.engine.TrackedCache.release()
    assert(out.map(_.getAs[Long]("block_id")).toSeq === Seq(1L, 2L, 3L))
    val mid = out(1)
    assert(mid.getAs[Double]("score_lo") === 0.2 &&
      mid.getAs[Double]("score_hi") === 0.4 &&
      mid.getAs[Long]("n") === 15L && mid.getAs[Long]("n_pos") === 9L &&
      mid.getAs[Double]("fitted") === 0.6)
    // fitted strictly increases; totals partition the input
    val fits = out.map(_.getAs[Double]("fitted")).toSeq
    assert(fits === fits.sorted && fits.distinct === fits)
    assert(out.map(_.getAs[Long]("n")).sum === 25L &&
      out.map(_.getAs[Long]("n_pos")).sum === 14L)

    // already-isotonic rates: every bucket keeps its own block
    val iso = Seq((0.1, 1, 5), (0.2, 2, 5), (0.3, 4, 5))
      .flatMap { case (sc, pos, tot) =>
        (0 until tot).map(i => ("g", sc, if (i < pos) 1L else 0L)) }
    val fx = Classifier.isotonicCalibration(
      iso.toDF("g", "score", "y"), "y", "score", "g", buckets = 10)
      .collect()
    graft.engine.TrackedCache.release()
    assert(fx.length === 3 &&
      fx.map(_.getAs[Double]("fitted")).toSeq === Seq(0.2, 0.4, 0.8))
  }

  test("isotonicCalibration: randomized panels match the brute PAV " +
    "reference block-for-block; groups are independent") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 8) {
      val nb = 2 + rnd.nextInt(12)
      val panel = (0 until nb).map { i =>
        val n = 1L + rnd.nextInt(6)
        (i * 7L % 97L, n, (0L to n).apply(rnd.nextInt(n.toInt + 1)))
      }.groupBy(_._1).map { case (b, xs) =>
        (b, xs.map(_._2).sum, xs.map(_._3).sum) }.toSeq
      // raw rows: bucket b ↔ score b/100 with buckets = 100
      val rows = panel.flatMap { case (b, n, sy) =>
        (0L until n).map(i =>
          (s"t$trial", b.toDouble / 100.0, if (i < sy) 1L else 0L)) }
      val out = Classifier.isotonicCalibration(
        rows.toDF("g", "score", "y"), "y", "score", "g", buckets = 100)
        .collect()
      graft.engine.TrackedCache.release()
      val ref = refPav(panel)
      assert(out.length === ref.length, s"trial $trial: block count")
      out.zip(ref).foreach { case (row, (lo, hi, n, sy)) =>
        assert(row.getAs[Double]("score_lo") ===
          math.rint(1e6 * lo / 100.0) / 1e6 &&
          row.getAs[Double]("score_hi") ===
            math.rint(1e6 * hi / 100.0) / 1e6 &&
          row.getAs[Long]("n") === n &&
          row.getAs[Long]("n_pos") === sy, s"trial $trial: $row")
      }
    }
    // two groups in one frame fold independently
    val two = Seq(("a", 0.1, 1L), ("a", 0.2, 0L), ("a", 0.3, 1L),
      ("b", 0.1, 0L), ("b", 0.9, 1L))
    val o2 = Classifier.isotonicCalibration(
      two.toDF("g", "score", "y"), "y", "score", "g", buckets = 10)
      .collect()
    graft.engine.TrackedCache.release()
    val byG = o2.groupBy(_.getAs[String]("g"))
    assert(byG("a").map(_.getAs[Long]("n")).sum === 3L &&
      byG("b").length === 2)
  }

  test("calibrationGain: PAV never hurts the Brier on the fitting " +
    "panel (theorem on grid-aligned scores), a perfectly calibrated " +
    "panel is a fixed point, anti-calibrated scores gain the most") {
    def run(rows: Seq[(String, Double, Long)], buckets: Int = 100) = {
      val out = Classifier.calibrationGain(
        rows.toDF("g", "score", "y"), "y", "score", "g",
        buckets = buckets).collect()
      graft.engine.TrackedCache.release()
      out.map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("brier_raw"), r.getAs[Double]("brier_cal"),
          r.getAs[Long]("n_blocks"))).toMap
    }
    // perfectly calibrated: score 0.25 with 1/4 positives, 0.75 with
    // 3/4 — PAV reproduces the scores; brier_cal == brier_raw and
    // every bucket keeps its own block
    val cal = (0 until 4).map(i =>
        ("c", 0.25, if (i == 0) 1L else 0L)) ++
      (0 until 4).map(i => ("c", 0.75, if (i < 3) 1L else 0L))
    val c = run(cal)("c")
    assert(c._1 === c._2 && c._3 === 2L, s"calibrated fixed point: $c")
    // anti-calibrated (score order inverted vs outcome): PAV pools
    // everything into one block at the base rate; the gain is large
    val anti = (0 until 10).map(i =>
        ("a", 0.9, 0L)) ++ (0 until 10).map(i => ("a", 0.1, 1L))
    val a = run(anti)("a")
    assert(a._3 === 1L && a._2 < a._1 - 0.3,
      s"anti-calibrated must pool and gain: $a")
    // randomized grid-aligned panels: brier_cal <= brier_raw always
    val rnd = new scala.util.Random(16L)
    for (trial <- 0 until 6) {
      val rows = (0 until 30 + rnd.nextInt(40)).map { _ =>
        val b = rnd.nextInt(101)
        ("r", b.toDouble / 100.0, if (rnd.nextInt(100) < 30 +
          (if (rnd.nextBoolean()) b / 2 else 70 - b / 2)) 1L else 0L)
      }
      val r = run(rows)("r")
      assert(r._2 <= r._1 + 1e-6,
        s"trial $trial: PAV worsened the Brier: $r")
    }
  }

  test("isotonicCalibration/calibrationGain are deterministic under " +
    "repartition (quantized sums, dictionary fold — no partition-" +
    "order dependence)") {
    val rnd = new scala.util.Random(77L)
    val rows = (0 until 120).map { i =>
      (s"g${i % 3}", rnd.nextInt(101).toDouble / 100.0,
        rnd.nextInt(2).toLong)
    }.toDF("g", "score", "y")
    def iso(df: org.apache.spark.sql.DataFrame) = {
      val out = Classifier.isotonicCalibration(df, "y", "score", "g",
        buckets = 100).collect().toSeq
      graft.engine.TrackedCache.release()
      out
    }
    def gain(df: org.apache.spark.sql.DataFrame) = {
      val out = Classifier.calibrationGain(df, "y", "score", "g",
        buckets = 100).collect().toSeq
      graft.engine.TrackedCache.release()
      out
    }
    assert(iso(rows) === iso(rows.repartition(7)))
    assert(gain(rows) === gain(rows.repartition(7)))
  }

  test("finite-score rule: NaN/±Inf scores drop from " +
    "isotonicCalibration and calibrationGain (no top-bucket NaN, no " +
    "zero-scored raw Brier term)") {
    val clean = Seq(("g", 0.1, 0L), ("g", 0.1, 1L), ("g", 0.5, 1L),
      ("g", 0.5, 1L), ("g", 0.9, 1L)).toDF("g", "score", "y")
    val dirty = clean.unionByName(Seq(
      ("g", Double.NaN, 1L), ("g", Double.PositiveInfinity, 0L),
      ("g", Double.NegativeInfinity, 1L)).toDF("g", "score", "y"))
    def iso(df: org.apache.spark.sql.DataFrame) = {
      val out = Classifier.isotonicCalibration(df, "y", "score", "g",
        buckets = 10).collect().toSeq
      graft.engine.TrackedCache.release(); out
    }
    def gain(df: org.apache.spark.sql.DataFrame) = {
      val out = Classifier.calibrationGain(df, "y", "score", "g",
        buckets = 10).collect().toSeq
      graft.engine.TrackedCache.release(); out
    }
    assert(iso(dirty) === iso(clean))
    assert(gain(dirty) === gain(clean))
  }

  test("applyCalibration: applying the map back to its own fitting " +
    "panel reproduces calibrationGain with zero gap rows") {
    val rnd = new scala.util.Random(91L)
    val rows = (0 until 150).map { i =>
      (s"g${i % 2}", rnd.nextInt(101).toDouble / 100.0,
        rnd.nextInt(2).toLong)
    }.toDF("g", "score", "y")
    val blocks = Classifier.isotonicCalibration(rows, "y", "score",
      "g", buckets = 100)
    val applied = Classifier.applyCalibration(blocks, rows, "y",
      "score", "g", buckets = 100).collect().toSeq
    val gained = Classifier.calibrationGain(rows, "y", "score", "g",
      buckets = 100).collect().toSeq
    graft.engine.TrackedCache.release()
    assert(applied.map(_.getAs[Long]("n_gap")).sum === 0L,
      "every fitting-panel bucket lies inside a block by construction")
    val a = applied.map(r => (r.getAs[String]("g"), r.getAs[Long]("n"),
      r.getAs[Double]("brier_raw"), r.getAs[Double]("brier_cal")))
    val gn = gained.map(r => (r.getAs[String]("g"), r.getAs[Long]("n"),
      r.getAs[Double]("brier_raw"), r.getAs[Double]("brier_cal")))
    assert(a === gn)
  }

  test("applyCalibration gap semantics: in-block exact, gap reads " +
    "the nearest block below, below-first and beyond-last extend " +
    "the edge blocks, n_gap counts the extension rows") {
    // train: buckets 1 (rate 1/5) and 5 (rate 4/5) of a 10-grid →
    // two singleton blocks fitted 0.2 / 0.8
    val train = ((0 until 5).map(i =>
        ("g", 0.1, if (i < 1) 1L else 0L)) ++
      (0 until 5).map(i => ("g", 0.5, if (i < 4) 1L else 0L)))
      .toDF("g", "score", "y")
    val blocks = Classifier.isotonicCalibration(train, "y", "score",
      "g", buckets = 10)
    // holdout, all y = 0: 0.1 in-block, 0.3 gap → block below (0.2),
    // 0.0 below first → first (0.2), 0.9 beyond last → last (0.8)
    val holdout = Seq(("g", 0.1, 0L), ("g", 0.3, 0L), ("g", 0.0, 0L),
      ("g", 0.9, 0L)).toDF("g", "score", "y")
    val out = Classifier.applyCalibration(blocks, holdout, "y",
      "score", "g", buckets = 10).collect()
    graft.engine.TrackedCache.release()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("n_blocks") === 2L)
    assert(r.getAs[Long]("n_gap") === 3L)
    // brier_cal = (3·0.2² + 0.8²)/4; brier_raw = Σ score²/4
    assert(r.getAs[Double]("brier_cal") === 0.19)
    assert(r.getAs[Double]("brier_raw") === 0.2275)
    // a holdout group with no fitted map drops (inner join)
    val stray = Classifier.applyCalibration(blocks,
      Seq(("other", 0.4, 0L)).toDF("g", "score", "y"),
      "y", "score", "g", buckets = 10).collect()
    graft.engine.TrackedCache.release()
    assert(stray.isEmpty)
  }
}
