package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, Some(2.5), Some("aa")),
    (2L, Some(1.25), Some("bbb")),
    (2L, None, None),
    (3L, Some(-0.5), Some("aa"))
  ).toDF("k", "x", "s")

  test("profileTable: counts, nulls, ndv, portable min/max, avg_len") {
    val p = Profile.profileTable(sample, exactNdv = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("k", "x", "s"))

    val k = p("k")
    assert(k.getAs[Long]("n_rows") === 4L)
    assert(k.getAs[Long]("n_nulls") === 0L)
    assert(k.getAs[Long]("n_distinct") === 3L)
    assert(k.getAs[String]("min_value") === "1")
    assert(k.getAs[String]("max_value") === "3")
    assert(k.isNullAt(k.fieldIndex("avg_len")))

    val x = p("x")
    assert(x.getAs[Long]("n_nulls") === 1L)
    assert(x.getAs[Long]("n_distinct") === 3L)
    // doubles render as micro-unit longs (typed min/max, THEN render)
    assert(x.getAs[String]("min_value") === "-500000")
    assert(x.getAs[String]("max_value") === "2500000")

    val s = p("s")
    assert(s.getAs[String]("min_value") === "aa")
    assert(s.getAs[String]("max_value") === "bbb")
    // (2 + 3 + 2) / 3 non-null strings
    assert(math.abs(s.getAs[Double]("avg_len") - 7.0 / 3) < 1e-6)
  }

  test("profileTable approx path: sketch NDV within documented HLL error") {
    val df = spark.range(0, 10000)
      .select(col("id"), (col("id") % 100).as("m"))
    val p = Profile.profileTable(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(math.abs(p("id") - 10000L) <= 500L)  // 5% >> HLL default 2.27%
    assert(math.abs(p("m") - 100L) <= 5L)
  }

  test("checkExpectations: every rule kind, pass and fail outcomes") {
    val dim = Seq(1L, 2L).toDF("id")
    val out = Profile.checkExpectations(sample, Seq(
      Profile.NotNull("r1", "x"),                      // 1 violation
      Profile.Range("r2", "x", 0, 10),                 // -0.5 violates; null skipped
      Profile.Regex("r3", "s", "^[ab]+$"),             // all match
      Profile.InSet("r4", "s", Seq("aa")),             // "bbb" violates
      Profile.Unique("r5", "k"),                       // k=2 twice → 1
      Profile.ForeignKey("r6", "k", dim, "id")))       // k=3 orphan → 1
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass"))).toMap
    assert(out("r1") === ((1L, false)))
    assert(out("r2") === ((1L, false)))
    assert(out("r3") === ((0L, true)))
    assert(out("r4") === ((1L, false)))
    assert(out("r5") === ((1L, false)))
    assert(out("r6") === ((1L, false)))
  }

  test("checkExpectations rejects duplicate rule ids") {
    intercept[IllegalArgumentException] {
      Profile.checkExpectations(sample,
        Seq(Profile.NotNull("r1", "k"), Profile.NotNull("r1", "x")))
    }
  }

  test("madOutliers: flags the planted outlier, robust to its presence") {
    // 20 well-behaved values + one wild outlier per group; the median
    // and MAD barely move, so the outlier's |rz| is huge while the
    // inliers stay under threshold
    val rows = (for (g <- Seq("a", "b"); i <- 0 until 20)
      yield (g, 10.0 + (i % 5))) ++ Seq(("a", 500.0))
    val df = rows.toDF("grp", "v")
    val out = Profile.madOutliers(df, "v", "grp", threshold = 3.0).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("grp") === "a")
    assert(out.head.getAs[Double]("v") === 500.0)
    assert(out.head.getAs[Double]("rz") > 100)
  }

  test("madOutliers: MAD=0 group still flags deviants (review fix)") {
    // majority-constant group: median=5, MAD=0 — the quotient is null
    // under non-ANSI division, which silently unflagged the extreme
    // row before the degenerate-scale rule
    val rows = Seq.fill(6)(("a", 5.0)) ++ Seq(("a", 100.0)) ++
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 50.0).map(("b", _))
    val out = Profile.madOutliers(rows.toDF("grp", "v"), "v", "grp")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(r.fieldIndex("rz"))))).toSet
    // group a: MAD 0 → 100 flagged with null rz; 5s unflagged
    assert(out.exists { case (g, v, rz) => g == "a" && v == 100.0 && rz.isEmpty })
    assert(!out.exists { case (g, v, _) => g == "a" && v == 5.0 })
    // group b: MAD > 0 → ordinary robust z flags 50
    assert(out.exists { case (g, v, rz) => g == "b" && v == 50.0 && rz.nonEmpty })
  }

  test("profileTable exact path: all-null column reports n_distinct 0") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val p = Profile.profileTable(df, exactNdv = true)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(p("s") === 0L)
    assert(p("k") === 2L)
  }

  test("dupProvenanceMatrix: pair-normalized upper-triangular counts") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val prov = Seq((1L, "s2"), (2L, "s1"), (3L, "s1"), (4L, "s2"),
      (5L, "s1"), (6L, "s1")).toDF("doc_id", "source")
    val m = Dedup.dupProvenanceMatrix(pairs, prov).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (s2,s1) and (s1,s2) collapse into one cell
    assert(m === Map(("s1", "s2") -> 2L, ("s1", "s1") -> 1L))
  }

  test("row-level rules share one aggregation job (no per-rule scan)") {
    val out = Profile.checkExpectations(sample, Seq(
      Profile.NotNull("r1", "x"), Profile.Range("r2", "x", 0, 10),
      Profile.Regex("r3", "s", "^[ab]+$")))
    // a single HashAggregate pair over one scan: exactly one Exchange
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, plan) // agg + final sort
  }

  test("psiDrift: baseline scores 0; identical group ~0; shifted group > 0") {
    // base/id draw from bins 0-2 identically; hi sits entirely in bin 9
    val rows =
      (1 to 30).map(i => ("base", (i % 3) * 10.0)) ++
      (1 to 30).map(i => ("same", (i % 3) * 10.0)) ++
      (1 to 30).map(_ => ("hi", 95.0))
    val psi = Profile.psiDrift(rows.toDF("g", "v"), "v", "g",
        baseline = "base", binWidth = 10.0, nBins = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psi("base") === 0.0)
    assert(math.abs(psi("same")) < 1e-9) // identical counts → every term 0
    assert(psi("hi") > 1.0)              // total mass displacement
  }

  test("ksDrift: identical → 0, disjoint → 1, hand case exact") {
    val same = (1 to 20).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong)))
    val r0 = Profile.ksDrift(same.toDF("g", "v"), "v", "g", "a", "b").head()
    assert(r0.getAs[Double]("ks_stat") === 0.0)

    val disjoint = (1 to 10).map(i => ("a", i.toLong)) ++
      (11 to 20).map(i => ("b", i.toLong))
    val r1 = Profile.ksDrift(disjoint.toDF("g", "v"), "v", "g", "a", "b").head()
    assert(r1.getAs[Double]("ks_stat") === 1.0)
    assert(r1.getAs[Long]("at_value") === 10L) // smallest arg attaining max

    // A={1,2,3,4}, B={3,4,5,6}: D = |2/4 - 0/4| = 0.5 at v=2
    val hand = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 3L), ("b", 4L), ("b", 5L), ("b", 6L))
    val r2 = Profile.ksDrift(hand.toDF("g", "v"), "v", "g", "a", "b").head()
    assert(r2.getAs[Double]("ks_stat") === 0.5)
    assert(r2.getAs[Long]("at_value") === 2L)
  }

  test("equidepthBins: equal-count bins, ordered, exhaustive") {
    val df = (1 to 100).map(i => (i.toLong, (i * i).toLong)).toDF("id", "v")
    val bins = Profile.equidepthBins(df, "v", "id", nBins = 10).collect()
    assert(bins.length === 10)
    assert(bins.forall(_.getAs[Long]("n") === 10L))
    // bins tile the value range in order: hi(i) < lo(i+1)
    val byBin = bins.sortBy(_.getAs[Long]("bin"))
    byBin.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
    }
    // first decile of squares 1..100 is 1..100, last is 8281..10000
    assert(byBin.head.getAs[Long]("lo") === 1L)
    assert(byBin.head.getAs[Long]("hi") === 100L)
    assert(byBin.last.getAs[Long]("lo") === 8281L)
    assert(byBin.last.getAs[Long]("hi") === 10000L)
  }

  test("chiSquareIndependence: independent ≈ 0, dependent = n·min(ka,kb−1)") {
    // perfectly independent: every (a, b) combination equally often
    val ind = (for { a <- 'a' to 'd'; b <- 1 to 3; _ <- 1 to 5 }
      yield (a.toString, b)).toDF("a", "b")
    val r0 = Profile.chiSquareIndependence(ind, "a", "b").head()
    assert(r0.getAs[Double]("chi2") === 0.0)
    assert(r0.getAs[Long]("dof") === 6L) // (4−1)(3−1)
    assert(r0.getAs[Long]("n") === 60L)

    // perfect dependence (b determined by a), square table:
    // chi2 = n·(k−1); empty off-diagonal cells MUST contribute
    val dep = (for { a <- 0 until 3; _ <- 1 to 7 }
      yield (s"a$a", s"b$a")).toDF("a", "b")
    val r1 = Profile.chiSquareIndependence(dep, "a", "b").head()
    // n(k−1) = 21·2 = 42, up to the 1e-6 per-term quantization
    assert(math.abs(r1.getAs[Double]("chi2") - 42.0) < 1e-4)
    assert(r1.getAs[Long]("dof") === 4L)
  }

  test("pearsonCorr: ±1 on exact linear data, null on zero variance") {
    val rows =
      (1 to 20).map(i => ("up", i.toLong, 2.0 * i + 3)) ++
      (1 to 20).map(i => ("down", i.toLong, 100.0 - 2 * i)) ++
      (1 to 20).map(i => ("flat", i.toLong, 7.0))
    val r = Profile.pearsonCorr(rows.toDF("g", "x", "y"), "x", "y", "g")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("up").getAs[Double]("r") === 1.0)
    assert(r("down").getAs[Double]("r") === -1.0)
    assert(r("flat").isNullAt(r("flat").fieldIndex("r")))
    assert(r("up").getLong(1) === 20L)
  }

  test("bootstrapMeanCi: constant data collapses the CI; mean sits inside it") {
    val const = (1L to 50L).map(i => (i, "g", 42L)).toDF("id", "grp", "v")
    val c = Profile.bootstrapMeanCi(const, "v", "grp", idCol = "id", b = 50)
      .head()
    assert(c.getAs[Double]("mean") === 42.0)
    assert(c.getAs[Double]("ci_lo") === 42.0)
    assert(c.getAs[Double]("ci_hi") === 42.0)

    val varied = (1L to 60L).map(i => (i, "g", i)).toDF("id", "grp", "v")
    val r1 = Profile.bootstrapMeanCi(varied, "v", "grp", idCol = "id", b = 60)
      .head()
    assert(r1.getAs[Long]("n_rows") === 60L)
    assert(r1.getAs[Double]("ci_lo") < r1.getAs[Double]("mean"))
    assert(r1.getAs[Double]("ci_hi") > r1.getAs[Double]("mean"))
    // hash coins → identical CI on a second run
    val r2 = Profile.bootstrapMeanCi(varied, "v", "grp", idCol = "id", b = 60)
      .head()
    assert(r1.toSeq === r2.toSeq)
  }

  test("psiDrift rejects an absent baseline; ksDrift answers null on an empty side") {
    val rows = Seq(("g1", 1.0), ("g2", 2.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Profile.psiDrift(rows, "v", "g", baseline = "nope", binWidth = 1.0)
    }
    assert(e.getMessage.contains("baseline"))
    val r = Profile.ksDrift(rows, "v", "g", "g1", "absent").head()
    assert(r.isNullAt(r.fieldIndex("ks_stat")))
  }

  test("winsorize: clips to group percentiles, keeps interior values") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val w = Profile.winsorize(df, "v", "grp", lo = 0.05, hi = 0.95)
      .collect()
    // p05 of 1..100 (interpolated) = 5.95; p95 = 95.05
    val lo = w.head.getAs[Double]("w_lo")
    val hi = w.head.getAs[Double]("w_hi")
    assert(lo === 5.95 && hi === 95.05)
    val byV = w.map(r => r.getAs[Double]("v") -> r.getAs[Double]("winsorized")).toMap
    assert(byV(1.0) === 5.95 && byV(100.0) === 95.05)
    assert(byV(50.0) === 50.0) // interior untouched
  }

  // ——— Kaplan–Meier ———

  private def kmEvents(spans: Seq[(Long, Int, Int)], horizon: Int = 100) = {
    // (user, firstDay, lastDay) → two events per user at day
    // boundaries; plus a sentinel user pinning observation end.
    val rows = spans.flatMap { case (u, f, l) =>
      Seq((u, java.sql.Timestamp.valueOf(f"2024-01-${f}%02d 00:00:00")),
        (u, java.sql.Timestamp.valueOf(f"2024-01-${l}%02d 00:00:00")))
    } :+ ((999L, java.sql.Timestamp.valueOf("2024-01-31 00:00:00")))
    rows.toDF("user_id", "ts")
  }

  test("kaplanMeier: hand-computed risk table with censoring") {
    // horizon = Jan 31. censorDays = 7 → users last seen on/after
    // Jan 24 are censored. u1: span 2 days (churned), u2: 2 days
    // (churned), u3: 5 days (churned), u4: 1..28 → 27 days censored,
    // sentinel u999: 0 days censored.
    val df = kmEvents(Seq((1L, 1, 3), (2L, 5, 7), (3L, 10, 15), (4L, 1, 28)))
    val out = Profile.kaplanMeier(df, "user_id", "ts", censorDays = 7)
      .collect()
    // event rows only: d=2 (two events, 5 at risk), d=5 (one event,
    // 3 at risk after the two d=2 users and... ordering: durations
    // present: 0(cens),2,2,5,27(cens) → at d=2 risk=4 (all with d≥2)
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 5L))
    val at2 = out.find(_.getLong(0) == 2L).get
    assert(at2.getAs[Long]("n_risk") === 4L)
    assert(at2.getAs[Long]("n_events") === 2L)
    assert(at2.getAs[Long]("n_censored") === 0L)
    assert(at2.getAs[Double]("factor") === 0.5)
    val at5 = out.find(_.getLong(0) == 5L).get
    assert(at5.getAs[Long]("n_risk") === 2L)
    assert(at5.getAs[Long]("n_events") === 1L)
    assert(at5.getAs[Double]("factor") === 0.5)
  }

  test("kaplanMeier: n_risk is non-increasing and bounded by cohort size") {
    val df = kmEvents((1L to 20L).map(u =>
      (u, 1 + (u % 5).toInt, 3 + (u % 19).toInt)))
    val out = Profile.kaplanMeier(df, "user_id", "ts").collect()
    val risks = out.map(_.getAs[Long]("n_risk")).toSeq
    assert(risks === risks.sorted.reverse)
    assert(risks.forall(_ <= 21)) // 20 users + sentinel
  }

  test("kaplanMeier: all users active at horizon → empty event table") {
    val df = kmEvents(Seq((1L, 25, 30), (2L, 26, 31)), horizon = 100)
    assert(Profile.kaplanMeier(df, "user_id", "ts").count() === 0L)
  }

  // ——— Benford ———

  test("benford: planted Benford-exact counts give chi2 ≈ 0") {
    // counts proportional to log10(1+1/d) over 10000 values
    val counts = (1 to 9).map(d => d -> math.round(10000 * math.log10(1.0 + 1.0 / d)))
    val vals = counts.flatMap { case (d, n) =>
      (0L until n).map(i => d * 100.0 + (i % 90)) }
    val out = Profile.benford(vals.toDF("v"), "v").collect()
    assert(out.length === 9)
    assert(out.head.getAs[Double]("chi2") < 0.1)
    // observed counts are exactly the planted ones
    assert(out.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n_obs")).toMap
      === counts.map { case (d, n) => d -> n.toLong }.toMap)
  }

  test("benford: single-digit data is flagged with a large chi2") {
    val out = Profile.benford(
      (1 to 500).map(i => 100.0 + i % 90).toDF("v"), "v").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Int]("digit") === 1)
    assert(out.head.getAs[Double]("chi2") > 100.0)
  }

  test("benford: values below 1 are excluded from the audit") {
    val out = Profile.benford(
      Seq(0.5, 0.9, 123.0, 456.0).toDF("v"), "v").collect()
    assert(out.map(_.getAs[Long]("n_obs")).sum === 2L)
  }

  // ——— ewmaDaily ———

  private def dayEvents(counts: Seq[(String, Int, Long)]) =
    counts.flatMap { case (g, day, n) =>
      (0L until n).map(i =>
        (g, java.sql.Timestamp.valueOf(f"2024-02-${day}%02d 0${(i % 9) + 1}%d:00:00")))
    }.toDF("grp", "ts")

  test("ewmaDaily: constant series is a fixed point; hand recursion holds") {
    val out = Profile.ewmaDaily(
      dayEvents(Seq(("a", 1, 4L), ("a", 2, 8L), ("a", 3, 2L),
        ("b", 1, 5L), ("b", 2, 5L), ("b", 3, 5L))), "grp", "ts")
      .collect()
    val a = out.filter(_.getString(0) == "a").map(_.getAs[Double]("ewma")).toSeq
    // s0=4; s1=(8+4)/2=6; s2=(2+6)/2=4
    assert(a === Seq(4.0, 6.0, 4.0))
    val b = out.filter(_.getString(0) == "b").map(_.getAs[Double]("ewma")).toSeq
    assert(b === Seq(5.0, 5.0, 5.0))
  }

  test("ewmaDaily: bit-identical under repartitioning") {
    val df = dayEvents((1 to 20).map(d => ("g", d, (d * 3 % 7 + 1).toLong)))
    val x = Profile.ewmaDaily(df, "grp", "ts").collect().toSeq
    val y = Profile.ewmaDaily(df.repartition(13), "grp", "ts").collect().toSeq
    assert(x === y)
  }

  test("weightedQuantiles: hand-weighted median differs from row median") {
    // values 1..4; value 4 carries 90% of the weight → weighted
    // median = 4 while the row median is 2
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 27L))
      .toDF("grp", "v", "w")
    val r = Profile.weightedQuantiles(df, "v", "w", "grp").head()
    assert(r.getAs[Long]("total_weight") === 30L)
    assert(r.getAs[Long]("w_median") === 4L)
    assert(r.getAs[Long]("w_q1") === 4L) // ceil(7.5) = 8 > 3 cum
    // uniform weights reduce to the plain nearest-rank quartiles
    val uni = (1L to 8L).map(v => ("u", v, 1L)).toDF("grp", "v", "w")
    val u = Profile.weightedQuantiles(uni, "v", "w", "grp").head()
    assert(u.getAs[Long]("w_q1") === 2L)   // ceil(2) = 2
    assert(u.getAs[Long]("w_median") === 4L)
    assert(u.getAs[Long]("w_q3") === 6L)
  }

  test("weightedQuantiles: duplicate values merge weights before ranking") {
    val df = Seq(("g", 5L, 2L), ("g", 5L, 3L), ("g", 9L, 1L))
      .toDF("grp", "v", "w")
    val r = Profile.weightedQuantiles(df, "v", "w", "grp").head()
    assert(r.getAs[Long]("total_weight") === 6L)
    assert(r.getAs[Long]("w_median") === 5L) // cum weight 5 ≥ ceil(3)
  }

  test("modeShare: smallest-value tie-break, exact share") {
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"),
      ("h", "z")).toDF("grp", "v")
    val out = Profile.modeShare(df, "v", "grp").collect()
      .map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[String]("mode") === "a") // tie with b → smaller value
    assert(g.getAs[Long]("mode_n") === 2L && g.getAs[Long]("total_n") === 5L)
    assert(g.getAs[Double]("share") === 0.4)
    assert(out("h").getAs[Double]("share") === 1.0)
  }

  test("dowSeasonality: planted weekday rhythm, exact averages, peak rank") {
    // 2024-07-01 is a Monday. Mondays get 10 events, Fridays 4, over
    // three weeks.
    val rows = (0 until 3).flatMap { wk =>
      val monday = java.time.LocalDate.of(2024, 7, 1).plusDays(wk * 7L)
      (0 until 10).map(i => ("a", java.sql.Timestamp.valueOf(
        monday.atTime(9, i)))) ++
        (0 until 4).map(i => ("a", java.sql.Timestamp.valueOf(
          monday.plusDays(4).atTime(9, i))))
    }.toDF("grp", "ts")
    val out = Profile.dowSeasonality(rows, "grp", "ts").collect()
      .map(r => r.getAs[Long]("dow") -> r).toMap
    assert(out.keySet === Set(1L, 5L)) // Monday = 1, Friday = 5 (0 = Sunday)
    assert(out(1L).getAs[Long]("n_days") === 3L)
    assert(out(1L).getAs[Double]("avg_per_day") === 10.0)
    assert(out(1L).getAs[Long]("peak_rank") === 1L)
    assert(out(5L).getAs[Double]("avg_per_day") === 4.0)
    assert(out(5L).getAs[Long]("peak_rank") === 2L)
  }

  test("ewmaDaily: >62 present days fails loudly instead of overflowing") {
    // 63 distinct days across three months
    val rows = (0 until 63).map { i =>
      ("g", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(i).atStartOfDay()))
    }.toDF("grp", "ts")
    val e = intercept[Exception] {
      Profile.ewmaDaily(rows, "grp", "ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("ewmaDaily")))
  }

  test("abcAnalysis: hand-computed classes with integer boundaries") {
    // values 50,30,15,4,1 (total 100): cum-prev shares 0,50,80,95,99
    // → A: {50,30} (prev 0,50 < 80); B: {15} (prev 80 < 95); C: {4,1}
    val rows = Seq(("e1", 5000L), ("e2", 3000L), ("e3", 1500L),
      ("e4", 400L), ("e5", 100L)).toDF("ent", "cents")
    val out = Profile.abcAnalysis(rows, "ent", col("cents")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("A", "B", "C"))
    assert(out("A").getAs[Long]("n_entities") === 2L)
    assert(out("A").getAs[Double]("class_value") === 80.0)
    assert(out("A").getAs[Double]("value_share") === 0.8)
    assert(out("B").getAs[Long]("n_entities") === 1L)
    assert(out("C").getAs[Long]("n_entities") === 2L)
    assert(out("C").getAs[Double]("class_value") === 5.0)
  }

  test("abcAnalysis: boundary-crossing entity belongs to the class it completes") {
    // one 90%-share entity crosses the 80% line — previous-cum share 0 → A
    val rows = Seq(("big", 9000L), ("s1", 500L), ("s2", 500L))
      .toDF("ent", "cents")
    val out = Profile.abcAnalysis(rows, "ent", col("cents")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_entities")).toMap
    assert(out("A") === 1L)
  }

  test("abcAnalysis: aggregates duplicate entity rows before ranking") {
    val rows = Seq(("e1", 4000L), ("e1", 4000L), ("e2", 2000L))
      .toDF("ent", "cents")
    val out = Profile.abcAnalysis(rows, "ent", col("cents")).collect()
      .map(r => r.getString(0) -> r).toMap
    // e1 = 8000 of 10000 (prev 0 → A), e2 prev share 80 → B
    assert(out("A").getAs[Long]("n_entities") === 1L)
    assert(out("A").getAs[Double]("class_value") === 80.0)
    assert(out("B").getAs[Long]("n_entities") === 1L)
  }

  test("abcAnalysis: rejects bad percent boundaries") {
    val rows = Seq(("e", 1L)).toDF("ent", "cents")
    intercept[IllegalArgumentException](
      Profile.abcAnalysis(rows, "ent", col("cents"), aPct = 95, bPct = 80))
  }

  private def dayEvents(counts: Seq[Int], grp: String = "g") =
    counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (grp, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d).atTime(8, i % 60))))
    }.toDF("grp", "ts")

  test("theilSenDaily: exact linear series recovers the slope") {
    // counts 2,4,6,8,10 → every pairwise slope is exactly 2
    val out = Profile.theilSenDaily(dayEvents(Seq(2, 4, 6, 8, 10)),
      "grp", "ts").collect().head
    assert(out.getAs[Long]("n_days") === 5L)
    assert(out.getAs[Long]("n_pairs") === 10L)
    assert(out.getAs[Double]("slope_per_day") === 2.0)
  }

  test("theilSenDaily: one outlier day cannot move the median slope") {
    // linear slope 1 with day 3 spiked to 50: most pairs still slope
    // ~1; OLS would be dragged far above
    val out = Profile.theilSenDaily(dayEvents(Seq(3, 4, 5, 50, 7, 8, 9)),
      "grp", "ts").collect().head
    assert(out.getAs[Double]("slope_per_day") === 1.0)
  }

  test("theilSenDaily: flat series → slope 0; groups independent") {
    val both = dayEvents(Seq(5, 5, 5, 5), "flat")
      .union(dayEvents(Seq(1, 3, 5, 7), "up"))
    val out = Profile.theilSenDaily(both, "grp", "ts").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("slope_per_day")).toMap
    assert(out === Map("flat" -> 0.0, "up" -> 2.0))
  }

  test("cusumDaily: flat series never alarms, peak ≈ 0") {
    val out = Profile.cusumDaily(dayEvents(Seq(5, 5, 5, 5, 5)), "grp", "ts")
      .collect().head
    assert(out.getAs[Double]("max_cusum") === 0.0)
    assert(out.getAs[Long]("n_alarms") === 0L)
  }

  test("cusumDaily: level shift accumulates and alarms after the shift") {
    // mean jumps 5 → 15 at day 10: post-shift excess ≈ +5/day compounds
    val counts = Seq.fill(10)(5) ++ Seq.fill(10)(15)
    val out = Profile.cusumDaily(dayEvents(counts), "grp", "ts", hMeans = 2)
      .collect().head
    assert(out.getAs[Long]("n_days") === 20L)
    // peak is the last day (cumulative excess keeps growing)
    assert(out.getAs[Long]("peak_day") ===
      java.time.LocalDate.of(2024, 1, 20).toEpochDay)
    assert(out.getAs[Long]("n_alarms") > 0L)
    assert(out.getAs[Double]("max_cusum") > 40.0)
  }

  test("associationRules: hand-computed supports, confidence and lift") {
    // baskets: {x,y,z}, {x,y}, {x,w}, {y}  → supp x=3, y=3, z=1, w=1
    val rows = Seq((1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"),
      (3, "x"), (3, "w"), (4, "y")).toDF("g", "item")
    val out = Profile.associationRules(rows, "g", "item", minPairSupport = 2L)
      .collect()
      .map(r => (r.getAs[String]("ante"), r.getAs[String]("cons")) -> r).toMap
    assert(out.keySet === Set(("x", "y"), ("y", "x")))
    val xy = out(("x", "y"))
    assert(xy.getAs[Long]("supp_pair") === 2L)
    assert(xy.getAs[Long]("supp_a") === 3L)
    assert(xy.getAs[Long]("supp_b") === 3L)
    assert(xy.getAs[Double]("confidence") === 0.666667)
    // lift = 4·2/(3·3)
    assert(xy.getAs[Double]("lift") === 0.888889)
  }

  test("associationRules: duplicate (basket,item) rows count once") {
    val rows = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"))
      .toDF("g", "item")
    val out = Profile.associationRules(rows, "g", "item", minPairSupport = 2L)
      .collect()
    assert(out.length === 2) // a→b and b→a, each supp_pair 2
    out.foreach { r =>
      assert(r.getAs[Long]("supp_pair") === 2L)
      assert(r.getAs[Double]("confidence") === 1.0)
      assert(r.getAs[Double]("lift") === 1.0) // 2·2/(2·2)
    }
  }

  private def localMoments(xs: Seq[Long]): (Double, Double, Double) = {
    val n = xs.size.toDouble
    val mean = xs.sum / n
    val e2 = xs.map(x => x.toDouble * x).sum / n
    val e3 = xs.map(x => x.toDouble * x * x).sum / n
    val e4 = xs.map(x => x.toDouble * x * x * x).sum / n
    val m2 = e2 - mean * mean
    val m3 = e3 - 3 * mean * e2 + 2 * mean * mean * mean
    val m4 = e4 - 4 * mean * e3 + 6 * mean * mean * e2 -
      3 * mean * mean * mean * mean
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    (r6(m2), r6(m3 / (m2 * math.sqrt(m2))), r6(m4 / (m2 * m2) - 3))
  }

  test("shapeMoments: symmetric data → zero skew; uniform kurtosis < 0") {
    val sym = Seq(1L, 2L, 2L, 3L, 3L, 3L, 4L, 4L, 5L) // symmetric around 3
    val df = sym.map(("g", _)).toDF("grp", "v")
    val out = Profile.shapeMoments(df, "grp", "v").collect().head
    assert(out.getAs[Double]("mean") === 3.0)
    assert(out.getAs[Double]("skewness") === 0.0)
    val (m2, sk, ku) = localMoments(sym)
    assert(out.getAs[Double]("m2") === m2)
    assert(out.getAs[Double]("kurtosis_excess") === ku && ku < 0)
    assert(sk === 0.0)
  }

  test("shapeMoments: right-skewed data matches the local replay, skew > 0") {
    val xs = Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 10L)
    val out = Profile.shapeMoments(xs.map(("g", _)).toDF("grp", "v"),
      "grp", "v").collect().head
    val (m2, sk, ku) = localMoments(xs)
    assert(out.getAs[Double]("m2") === m2)
    assert(out.getAs[Double]("skewness") === sk && sk > 0)
    assert(out.getAs[Double]("kurtosis_excess") === ku)
  }

  test("lorenzDeciles: uniform contributions → cum_share = decile/10") {
    val rows = (1 to 20).map(i => (s"e$i", 500L)).toDF("ent", "cents")
    val out = Profile.lorenzDeciles(rows, "ent", col("cents")).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getAs[Long]("n_entities") === 2L)
      assert(r.getAs[Double]("cum_share") ===
        r.getAs[Long]("decile").toDouble / 10)
    }
  }

  test("lorenzDeciles: concentrated top decile carries the tail share") {
    // 9 entities at 1 cent, one at 991 cents → top decile share 99.1%
    val rows = ((1 to 9).map(i => (s"e$i", 1L)) :+ ("big", 991L))
      .toDF("ent", "cents")
    val out = Profile.lorenzDeciles(rows, "ent", col("cents")).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(out(10L).getAs[Double]("decile_value") === 9.91)
    assert(out(10L).getAs[Double]("cum_share") === 1.0)
    assert(out(9L).getAs[Double]("cum_share") === 0.009)
  }

  test("conversionLatency: hand delays; non-converters and pre-signup buys drop") {
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      ("u1", ts(0), "signup"), ("u1", ts(10), "purchase"),  // delay 10 s
      ("u2", ts(0), "signup"), ("u2", ts(30), "purchase"),  // delay 30 s
      ("u3", ts(0), "signup"), ("u3", ts(20), "purchase"),  // delay 20 s
      ("u4", ts(50), "signup"), ("u4", ts(40), "purchase"), // buy BEFORE signup
      ("u5", ts(0), "signup")                               // never converts
    ).toDF("user_id", "ts", "event_type")
    val out = Profile.conversionLatency(ev, "user_id", "ts", "event_type",
      "signup", "purchase").collect().head
    assert(out.getAs[Long]("n_entities") === 3L)
    assert(out.getAs[Double]("p50_seconds") === 20.0) // rank 2 of {10,20,30}
    assert(out.getAs[Double]("p90_seconds") === 30.0) // rank ceil(2.7) = 3
  }

  test("concentrationHHI: hand shares; singletons excluded") {
    val rows = Seq((1, "a", 50L), (1, "b", 50L),     // even split → 0.5
      (2, "a", 90L), (2, "b", 10L),                  // 0.81 + 0.01
      (3, "a", 100L)                                 // singleton → excluded
    ).toDF("grp", "member", "w")
    val out = Profile.concentrationHHI(rows, "grp", "member", col("w"))
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("hhi")).toMap
    assert(out === Map(1 -> 0.5, 2 -> 0.82))
  }

  test("twap: durations weight the average; single-event keys drop") {
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq(
      ("u1", ts(0), 100L),   // held 10 s
      ("u1", ts(10), 200L),  // held 30 s
      ("u1", ts(40), 999L),  // last event: no duration
      ("u2", ts(5), 50L)     // single event → dropped
    ).toDF("k", "ts", "cents")
    val out = Profile.twap(rows, "k", "ts", col("cents")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("key") === "u1")
    assert(out.head.getAs[Long]("n_intervals") === 2L)
    // (100·10 + 200·30) / 40 = 175
    assert(out.head.getAs[Double]("twap_cents") === 175.0)
  }

  test("olsByGroup: exact line recovered; R² = 1") {
    val rows = (1L to 20L).map(x => ("g", x, 2 * x + 1)).toDF("grp", "x", "y")
    val out = Profile.olsByGroup(rows, "grp", col("x"), col("y"))
      .collect().head
    assert(out.getAs[Long]("slope_micro") === 2000000L)
    assert(out.getAs[Long]("intercept_micro") === 1000000L)
    assert(out.getAs[Long]("r2_micro") === 1000000L)
  }

  test("olsByGroup: matches the local normal-equations replay") {
    val xs = Seq(1L, 2L, 3L, 5L, 8L, 13L)
    val ys = Seq(3L, 5L, 4L, 9L, 12L, 20L)
    val rows = xs.zip(ys).map { case (x, y) => ("g", x, y) }
      .toDF("grp", "x", "y")
    val out = Profile.olsByGroup(rows, "grp", col("x"), col("y"))
      .collect().head
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val syy = ys.map(a => a * a).sum.toDouble
    val num = n * sxy - sx * sy
    val slope = num / (n * sxx - sx * sx)
    def micro(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    assert(out.getAs[Long]("slope_micro") === micro(slope))
    assert(out.getAs[Long]("intercept_micro") === micro((sy - slope * sx) / n))
    assert(out.getAs[Long]("r2_micro") ===
      micro(num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy))))
  }

  test("forwardFillDaily: gaps carry forward, leading gap stays null") {
    def at(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 6, 1).plusDays(d).atTime(12, 0))
    // g1 observed on days 1 and 3 (of spine 0..3 set by g2);
    // g2 observed on days 0 and 3
    val rows = Seq(("g1", at(1), 10L), ("g1", at(3), 30L),
      ("g2", at(0), 5L), ("g2", at(3), 7L)).toDF("grp", "ts", "cents")
    val out = Profile.forwardFillDaily(rows, "grp", "ts", col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1) -
        java.time.LocalDate.of(2024, 6, 1).toEpochDay) ->
        (if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toMap
    assert(out.size === 8) // 2 groups × 4 spine days
    assert(out(("g1", 0L)) === ((null, 1L)))  // before first obs: null
    assert(out(("g1", 1L)) === ((10L, 0L)))
    assert(out(("g1", 2L)) === ((10L, 1L)))   // carried forward
    assert(out(("g1", 3L)) === ((30L, 0L)))
    assert(out(("g2", 1L)) === ((5L, 1L)))
    assert(out(("g2", 2L)) === ((5L, 1L)))
  }

  private def xyEvents(xy: Seq[(Int, Int)]): org.apache.spark.sql.DataFrame =
    xy.zipWithIndex.flatMap { case ((x, y), d) =>
      val day = java.time.LocalDate.of(2024, 5, 1).plusDays(d)
      (0 until x).map(i => ("view",
        java.sql.Timestamp.valueOf(day.atTime(8, i % 60)))) ++
        (0 until y).map(i => ("purchase",
          java.sql.Timestamp.valueOf(day.atTime(9, i % 60))))
    }.toDF("event_type", "ts")

  private def localTauB(xy: Seq[(Int, Int)]): Double = {
    val n = xy.size
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- 0 until n; j <- i + 1 until n) {
      val (xa, ya) = xy(i); val (xb, yb) = xy(j)
      if (xa == xb) tx += 1
      if (ya == yb) ty += 1
      if (xa != xb && ya != yb) {
        if ((xa < xb) == (ya < yb)) c += 1 else d += 1
      }
    }
    val n0 = n.toLong * (n - 1) / 2
    math.rint(1e6 * (c - d).toDouble /
      math.sqrt(((n0 - tx) * (n0 - ty)).toDouble)) / 1e6
  }

  test("kendallTauDaily: perfect concordance → 1, inversion → -1") {
    val up = Seq((1, 2), (2, 3), (3, 5), (4, 8))
    val down = Seq((1, 8), (2, 5), (3, 3), (4, 2))
    assert(Profile.kendallTauDaily(xyEvents(up), "ts", "event_type",
      "view", "purchase").collect().head.getAs[Double]("tau_b") === 1.0)
    assert(Profile.kendallTauDaily(xyEvents(down), "ts", "event_type",
      "view", "purchase").collect().head.getAs[Double]("tau_b") === -1.0)
  }

  test("kendallTauDaily: tie bookkeeping matches the local τ-b replay") {
    // ties on x, on y, and on BOTH axes (the n1/n2 double-count case)
    val xy = Seq((2, 3), (2, 3), (2, 5), (4, 5), (5, 1), (6, 1), (6, 7))
    val out = Profile.kendallTauDaily(xyEvents(xy), "ts", "event_type",
      "view", "purchase").collect().head
    assert(out.getAs[Long]("n_days") === 7L)
    assert(out.getAs[Long]("n_pairs") === 21L)
    assert(out.getAs[Long]("concordant") + out.getAs[Long]("discordant") +
      out.getAs[Long]("ties_x") + out.getAs[Long]("ties_y") >= 21L)
    assert(out.getAs[Double]("tau_b") === localTauB(xy))
  }

  test("kendallTauDaily: other event types are ignored") {
    val base = xyEvents(Seq((1, 4), (2, 3), (3, 2), (4, 1)))
    val noise = Seq(("click", java.sql.Timestamp.valueOf("2024-05-01 10:00:00")))
      .toDF("event_type", "ts")
    val out = Profile.kendallTauDaily(base.union(noise), "ts", "event_type",
      "view", "purchase").collect().head
    assert(out.getAs[Double]("tau_b") === -1.0)
  }

  test("cusumDaily: matches the max(0, s+y) recursion replayed locally") {
    val counts = Seq(5, 9, 2, 14, 3, 3, 12, 1, 8, 6)
    val out = Profile.cusumDaily(dayEvents(counts), "grp", "ts")
      .collect().head
    val n = counts.size
    val meanU = math.round(1e6 * counts.sum / n.toDouble)
    var s = 0L; var smax = 0L
    counts.foreach { c =>
      s = math.max(0L, s + (c * 1000000L - meanU)); smax = math.max(smax, s)
    }
    assert(out.getAs[Double]("max_cusum") === smax / 1e6)
  }

  test("trendingRanks: rank ties to smaller item; delta vs previous OBSERVED day") {
    // day 1: a×3 b×3 c×1 → a=1 (tie to smaller), b=2, c=3
    // day 2: b×5 c×2     → b=1, c=2; a absent
    // day 4: a×9 b×1     → a=1 (prev_rnk from day 1 — gap skipped), b=2
    val rows = Seq.fill(3)((1L, "a")) ++ Seq.fill(3)((1L, "b")) ++
      Seq((1L, "c")) ++ Seq.fill(5)((2L, "b")) ++ Seq.fill(2)((2L, "c")) ++
      Seq.fill(9)((4L, "a")) ++ Seq((4L, "b"))
    val df = rows.toDF("d", "item")
    val out = Profile.trendingRanks(df, col("d"), "item", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      (1L, "a", 3L, 1L, None, None),
      (1L, "b", 3L, 2L, None, None),
      (2L, "b", 5L, 1L, Some(2L), Some(1L)),
      (2L, "c", 2L, 2L, Some(3L), Some(1L)),
      (4L, "a", 9L, 1L, Some(1L), Some(0L)),
      (4L, "b", 1L, 2L, Some(1L), Some(-1L))))
  }

  test("fdAudit: holding FD, g3 of a violating FD, composite LHS, null RHS") {
    // k → v: group 1 maps to {x:2, y:1} (violating, g3 = 3−2 = 1);
    // group 2 maps to {x:1} (clean); group 3 maps to {null:2} (clean —
    // NULL is one RHS value under GROUP BY semantics)
    val df = Seq(
      (1, "a", Some("x")), (1, "a", Some("x")), (1, "b", Some("y")),
      (2, "a", Some("x")),
      (3, "b", None), (3, "b", None)
    ).toDF("k", "k2", "v")
    val out = Profile.fdAudit(df, Seq(
        ("k->v", Seq("k"), "v"),
        ("k_k2->v", Seq("k", "k2"), "v"),
        ("row->v", Seq("k", "k2", "v"), "v")))
      .collect().map(r => r.getString(0) -> r).toMap

    val kv = out("k->v")
    assert(kv.getAs[Long]("n_groups") === 3L)
    assert(kv.getAs[Long]("n_violating") === 1L)
    assert(kv.getAs[Long]("g3_rows") === 1L)
    assert(kv.getAs[Boolean]("holds") === false)
    assert(kv.getAs[Double]("confidence") === 0.833333) // round(1 − 1/6, 6)

    // composite LHS splits group 1 into (1,a)→x and (1,b)→y — FD holds
    val comp = out("k_k2->v")
    assert(comp.getAs[Long]("n_groups") === 4L)
    assert(comp.getAs[Boolean]("holds") === true)
    assert(comp.getAs[Long]("g3_rows") === 0L)
    assert(comp.getAs[Double]("confidence") === 1.0)

    // trivial FD (RHS ⊆ LHS) always holds
    assert(out("row->v").getAs[Boolean]("holds") === true)
  }

  test("changepointDaily: planted level shift found at the exact day") {
    // type "a": 5 days at 2 events/day then 5 days at 8/day — best
    // split is after day 4 (the last low day); means 2.0 / 8.0
    // type "b": constant 3/day — strength must be NULL (no variance)
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:0$i:00")
    val rows =
      (0 until 10).flatMap { d =>
        val k = if (d < 5) 2 else 8
        (0 until k).map(i => ("a", ts(d, i)))
      } ++ (0 until 10).flatMap(d => (0 until 3).map(i => ("b", ts(d, i))))
    val df = rows.toDF("event_type", "ts")
    val out = Profile.changepointDaily(df, "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap

    val a = out("a")
    assert(a.getAs[Long]("n_days") === 10L)
    // epoch day of 2024-01-05 (last day of the low segment)
    val expectDay = java.time.LocalDate.of(2024, 1, 5).toEpochDay
    assert(a.getAs[Long]("split_day") === expectDay)
    assert(a.getAs[Double]("mean_left") === 2.0)
    assert(a.getAs[Double]("mean_right") === 8.0)
    // perfect two-level series: the one-split model explains all
    // variance — strength 1.0
    assert(a.getAs[Double]("strength") === 1.0)

    val b = out("b")
    assert(b.isNullAt(b.fieldIndex("strength")))
    // constant series: every split has equal gain — tie goes to t=1
    assert(b.getAs[Long]("split_day") ===
      java.time.LocalDate.of(2024, 1, 1).toEpochDay)
  }

  test("changepointDaily: single-day group emits no row") {
    val df = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_type", "ts")
    assert(Profile.changepointDaily(df, "event_type", "ts").count() === 0L)
  }

  test("shuffleSkewAudit: mass conservation, hot-key share, single-key degenerate") {
    // one hot key with 50 rows + 50 singleton keys → top share 50/100
    val rows = Seq.fill(50)("hot") ++ (0 until 50).map(i => s"k$i")
    val out = Profile.shuffleSkewAudit(rows.toDF("k"), "k", "t").collect()(0)
    assert(out.getAs[Long]("n_rows") === 100L)
    assert(out.getAs[Long]("n_keys") === 51L)
    assert(out.getAs[Long]("top_key_rows") === 50L)
    assert(out.getAs[Double]("top_key_share") === 0.5)
    assert(out.getAs[Long]("buckets_used") <= 32L)
    // max bucket holds at least the hot key and at least the mean
    assert(out.getAs[Long]("max_bucket_rows") >= 50L)
    assert(out.getAs[Double]("skew_x") >=
      out.getAs[Long]("max_bucket_rows") * 32.0 / 100 - 1e-6)

    // all rows on ONE key: one bucket used, straggler factor = nBuckets
    val one = Profile.shuffleSkewAudit(
      Seq.fill(10)("x").toDF("k"), "k", "one").collect()(0)
    assert(one.getAs[Long]("buckets_used") === 1L)
    assert(one.getAs[Double]("skew_x") === 32.0)
    assert(one.getAs[Double]("top_key_share") === 1.0)
  }

  test("shuffleSkewAudit: uniform keys spread across buckets") {
    val out = Profile.shuffleSkewAudit(
      (0 until 3200).map(i => s"id$i").toDF("k"), "k", "u").collect()(0)
    assert(out.getAs[Long]("n_rows") === 3200L)
    assert(out.getAs[Long]("buckets_used") === 32L)
    // a uniform hash over 100 keys/bucket should stay well under 2×
    assert(out.getAs[Double]("skew_x") < 2.0)
  }

  test("joinSizeAudit: exact product law vs the actually-run join") {
    val a = Seq("x", "x", "y", "z", "w").toDF("ka")
    val b = Seq("x", "x", "x", "y", "q").toDF("kb")
    val r = Profile.joinSizeAudit(a, "ka", b, "kb", "t").collect()(0)
    assert(r.getAs[Long]("n_left") === 5L)
    assert(r.getAs[Long]("n_right") === 5L)
    assert(r.getAs[Long]("n_keys_matched") === 2L) // x, y
    val actual = a.join(b, col("ka") === col("kb")).count()
    assert(r.getAs[Long]("out_rows") === actual) // 2·3 + 1·1 = 7
    assert(r.getAs[Long]("out_rows") === 7L)
    assert(r.getAs[String]("top_key") === "x")
    assert(r.getAs[Long]("top_key_rows") === 6L)
    assert(r.getAs[Double]("amplification") === 1.4) // 7 / 5
  }

  test("joinSizeAudit: disjoint keys produce zero rows; top key null") {
    val a = Seq("a").toDF("k1")
    val b = Seq("b").toDF("k2")
    val r = Profile.joinSizeAudit(a, "k1", b, "k2", "d").collect()(0)
    assert(r.getAs[Long]("out_rows") === 0L)
    assert(r.getAs[Long]("n_keys_matched") === 0L)
    assert(r.getAs[Double]("amplification") === 0.0)
    assert(r.isNullAt(r.fieldIndex("top_key")))
  }

  test("seasonalDecompose: planted weekly rhythm separates from a flat trend") {
    // 28 days, constant base 10/day with +4 every Sunday-aligned dow 0:
    // trend (7-day MA) is flat at 10 + 4/7; seasonal absorbs the +4 on
    // dow 0 and −4/7 elsewhere; residuals are ~0
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    val rows = (0 until 28).flatMap { d =>
      val dow = (d + 4) % 7
      val k = if (dow == 0) 14 else 10
      (0 until k).map(i => ("a", ts(d, i)))
    }
    val out = Profile.seasonalDecompose(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
    // edge days (first/last 3) drop: 28 − 6 = 22 rows
    assert(out.length === 22)
    val expectedTrend = math.round((74.0 / 7) * 1e6) / 1e6
    out.foreach { r =>
      assert(r.getAs[Double]("trend") === expectedTrend, r.toString)
      assert(math.abs(r.getAs[Double]("residual")) < 1e-3, r.toString)
      val dow = r.getAs[Long]("dow")
      val s = r.getAs[Double]("seasonal")
      if (dow == 0L) assert(s > 3.0, r.toString)
      else assert(s < 0.0 && s > -1.0, r.toString)
    }
    // decomposition identity: y = trend + seasonal + residual exactly
    // (all three are the same micro-integers divided by 1e6)
    out.foreach { r =>
      val y = r.getAs[Long]("y").toDouble
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(y - sum) < 1e-9, r.toString)
    }
  }

  test("seasonalAnomalies: spike day flags after the weekly rhythm is removed") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    // base 10/day, +4 every dow 0 (pure rhythm), +30 extra on day 14
    val rows = (0 until 28).flatMap { d =>
      val k = 10 + (if ((d + 4) % 7 == 0) 4 else 0) +
        (if (d == 14) 30 else 0)
      (0 until k).map(i => ("a", ts(d, i)))
    }
    val out = Profile.seasonalAnomalies(rows.toDF("event_type", "ts"),
        "event_type", "ts").collect()
      .map(r => r.getAs[Long]("day") -> r).toMap
    assert(out(14L).getAs[Boolean]("is_anomaly"), out(14L).toString)
    assert(out(14L).getAs[Double]("score") > 3.0)
    // days sharing neither the spike's MA window (11..17) nor its
    // day-of-week (the spike pulls its own dow's seasonal mean, so
    // sibling dow days 7/21 legitimately score negative) stay quiet
    Seq(5L, 6L, 19L, 22L, 23L).foreach(d =>
      assert(!out(d).getAs[Boolean]("is_anomaly"), out(d).toString))
  }

  test("seasonalAnomalies: clean rhythm alerts nowhere") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    val rows = (0 until 28).flatMap { d =>
      val k = 10 + (if ((d + 4) % 7 == 0) 4 else 0)
      (0 until k).map(i => ("a", ts(d, i)))
    }
    val out = Profile.seasonalAnomalies(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")),
      out.filter(_.getAs[Boolean]("is_anomaly")).mkString("; "))
  }

  test("fdAudit: empty input yields zero groups and null confidence") {
    val empty = Seq.empty[(Int, String)].toDF("k", "v")
    val r = Profile.fdAudit(empty, Seq(("k->v", Seq("k"), "v"))).collect()(0)
    assert(r.getAs[Long]("n_groups") === 0L)
    assert(r.getAs[Long]("g3_rows") === 0L)
    assert(r.getAs[Boolean]("holds") === true)
    assert(r.isNullAt(r.fieldIndex("confidence")))
  }

  test("acfDaily: period-2 alternating series has acf(1) < 0 < acf(2)") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    // 20 days alternating 2,6,2,6,... events/day
    val rows = (0 until 20).flatMap { d =>
      val k = if (d % 2 == 0) 2 else 6
      (0 until k).map(i => ("a", ts(d, i)))
    }
    val out = Profile.acfDaily(rows.toDF("event_type", "ts"),
        "event_type", "ts", maxLag = 3).collect()
      .map(r => r.getAs[Long]("lag") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).getAs[Double]("acf") < -0.9)
    assert(out(2L).getAs[Double]("acf") > 0.9)
    assert(out(1L).getAs[Long]("n_pairs") === 19L)
  }

  test("acfDaily: constant series reports NULL (zero variance), gaps drop pairs") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // constant 1/day on days 0..5 and 10..15 (gap 6..9)
    val days = (0 to 5) ++ (10 to 15)
    val rows = days.map(d => ("a", ts(d)))
    val out = Profile.acfDaily(rows.toDF("event_type", "ts"),
        "event_type", "ts", maxLag = 1).collect()
    assert(out.length === 1)
    // day-aligned: pairs only where day-1 exists → 5 + 5
    assert(out(0).getAs[Long]("n_pairs") === 10L)
    assert(out(0).isNullAt(out(0).fieldIndex("acf")))
  }

  test("mutualInformation: independent columns → MI 0; copies → MI = H") {
    val indep = (for (x <- 0 until 4; y <- 0 until 4) yield (s"x$x", s"y$y"))
      .toDF("a", "b")
    val ri = Profile.mutualInformation(indep, col("a"), col("b"), "i")
      .collect()(0)
    assert(math.abs(ri.getAs[Double]("mi")) < 1e-6)
    val copy = (0 until 4).flatMap(x => Seq.fill(x + 1)((s"v$x", s"v$x")))
      .toDF("a", "b")
    val rc = Profile.mutualInformation(copy, col("a"), col("b"), "c")
      .collect()(0)
    assert(math.abs(rc.getAs[Double]("mi") - rc.getAs[Double]("h_x")) < 1e-6)
    assert(math.abs(rc.getAs[Double]("nmi") - 1.0) < 1e-6)
  }

  test("mutualInformation: constant column has zero entropy and null nmi") {
    val df = Seq(("k", "p"), ("k", "q"), ("k", "r")).toDF("a", "b")
    val r = Profile.mutualInformation(df, col("a"), col("b"), "z")
      .collect()(0)
    assert(r.getAs[Double]("h_x") === 0.0)
    assert(r.getAs[Double]("mi") === 0.0)
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }

  test("encodingAudit: run structure, NDV and the three recommendations") {
    // key 0..99 in one bucket; three columns engineered per branch:
    // rle: 100 rows in 2 runs; dict: 5 distinct over 100 rows (but
    // alternating → 100 runs); plain: all-distinct values
    val rows = (0 until 100).map { k =>
      (k.toLong, if (k < 50) "aa" else "bb", s"v${k % 5}", s"u$k")
    }
    val out = Profile.encodingAudit(
        rows.toDF("k", "c_rle", "c_dict", "c_plain"), "k",
        Seq("c_rle", "c_dict", "c_plain"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(out("c_rle").getAs[Long]("n_runs") === 2L)
    assert(out("c_rle").getAs[String]("recommended") === "rle")
    assert(out("c_dict").getAs[Long]("ndv") === 5L)
    assert(out("c_dict").getAs[String]("recommended") === "dictionary")
    assert(out("c_plain").getAs[Long]("ndv") === 100L)
    assert(out("c_plain").getAs[String]("recommended") === "plain")
    assert(out("c_rle").getAs[Long]("raw_bytes") === 200L)
    assert(out("c_rle").getAs[Long]("dict_bytes") === 4L + 400L)
  }

  test("encodingAudit: bucket boundaries start new runs; nulls join runs") {
    // one constant column split across two key buckets → 2 runs
    val rows = (0 until 2048).map(k => (k.toLong, "same"))
    val out = Profile.encodingAudit(rows.toDF("k", "c"), "k", Seq("c"))
      .collect()(0)
    assert(out.getAs[Long]("n_runs") === 2L)
    // null runs: null,null,x,null → 3 runs (null-safe equality)
    val nz = Seq((0L, null), (1L, null), (2L, "x"), (3L, null))
      .toDF("k", "c")
    val rn = Profile.encodingAudit(nz, "k", Seq("c")).collect()(0)
    assert(rn.getAs[Long]("n_runs") === 3L)
    assert(rn.getAs[Long]("n_nulls") === 3L)
  }

  test("decayScores: a cents-equal recent user outranks an old one 2^w-fold") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    val rows = Seq(
      ("new", ts(70), 800.0),  // week 0 vs ref day 70
      ("old", ts(0), 800.0),   // 10 weeks earlier → weight 2^-10
      ("mid", ts(63), 400.0))  // week 1 → half weight
    val out = Profile.decayScores(rows.toDF("u", "ts", "v"), "u", "ts",
        round(col("v") * 100)).collect()
    assert(out.map(_.getAs[String]("entity")).toSeq ===
      Seq("new", "mid", "old")) // 800, 200, 800/1024
    val m = out.map(r => r.getAs[String]("entity") ->
      r.getAs[Double]("score")).toMap
    assert(m("new") === 800.0)
    assert(m("mid") === 200.0)
    assert(math.abs(m("old") - 800.0 / 1024) < 1e-6)
  }

  test("decayScores: ages beyond wCap clamp instead of vanishing") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    val rows = Seq(("ancient", ts(0), 1024.0), ("now", ts(7 * 30), 1.0))
    val out = Profile.decayScores(rows.toDF("u", "ts", "v"), "u", "ts",
        round(col("v") * 100), wCap = 20).collect()
      .map(r => r.getAs[String]("entity") -> r.getAs[Double]("score")).toMap
    // 30 weeks old but clamped to 2^-20: 1024/2^20 ≈ 0.000977 ≠ 0
    assert(out("ancient") > 0.0)
    assert(out("ancient") === 0.000977) // round(1024/2^20, 6)
  }

  test("infoGain: perfect predictor gains H(label); pure noise gains 0") {
    // label == feature f_copy (gain = H); f_const carries nothing
    val rows = (0 until 12).map(i => (s"l${i % 3}", s"l${i % 3}", "k"))
    val out = Profile.infoGain(rows.toDF("lab", "f_copy", "f_const"),
        col("lab"),
        Seq("f_copy" -> col("f_copy"), "f_const" -> col("f_const")))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    val copy = out("f_copy")
    assert(math.abs(copy.getAs[Double]("info_gain") -
      copy.getAs[Double]("h_label")) < 1e-6)
    assert(math.abs(copy.getAs[Double]("gain_ratio") - 1.0) < 1e-6)
    val const = out("f_const")
    assert(math.abs(const.getAs[Double]("info_gain")) < 1e-6)
    assert(const.isNullAt(const.fieldIndex("gain_ratio"))) // H(const)=0
    assert(const.getAs[Long]("n_values") === 1L)
  }

  test("infoGain: independent feature gains ~0 despite own entropy") {
    val rows = for (l <- 0 until 2; f <- 0 until 4; _ <- 0 until 3)
      yield (s"l$l", s"f$f")
    val r = Profile.infoGain(rows.toDF("lab", "f"), col("lab"),
      Seq("f" -> col("f"))).collect()(0)
    assert(math.abs(r.getAs[Double]("info_gain")) < 1e-6)
    assert(r.getAs[Double]("h_cond") > 0.0)
  }

  test("saxMotifs: planted sawtooth yields the alternating motif on top") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    // low(2)/high(8) alternating 30 days → symbols alternate low/high
    val rows = (0 until 30).flatMap { d =>
      val k = if (d % 2 == 0) 2 else 8
      (0 until k).map(i => ("a", ts(d, i)))
    }
    val out = Profile.saxMotifs(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
    assert(out.length <= 3)
    val top = out.head
    assert(top.getAs[Long]("rk") === 1L)
    // only two motifs exist (ada/dad with breakpoints at ±0.6745);
    // 28 grams split 14/14 → top ties break lexicographically
    val motifs = out.map(_.getAs[String]("motif")).toSet
    assert(motifs.subsetOf(Set("ada", "dad")), motifs.toString)
    assert(out.map(_.getAs[Long]("n_occurrences")).sum === 28L)
  }

  test("saxMotifs: constant series symbolizes all-c (zero variance)") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    val rows = (0 until 10).map(d => ("a", ts(d)))
    val out = Profile.saxMotifs(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("motif") === "ccc")
    assert(out(0).getAs[Long]("n_occurrences") === 8L)
  }

  test("seasonalNaiveBacktest: repeating weekly pattern forecasts exactly") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    // 28 days, count = 3 + dow: last 7 days forecast error 0
    val rows = (0 until 28).flatMap { d =>
      val k = 3 + (d + 4) % 7
      (0 until k).map(i => ("a", ts(d, i)))
    }
    val out = Profile.seasonalNaiveBacktest(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
    assert(out.length === 7)
    out.foreach { r =>
      assert(r.getAs[Double]("abs_err") === 0.0, r.toString)
      assert(r.getAs[Double]("forecast") ===
        (3 + r.getAs[Long]("dow")).toDouble, r.toString)
    }
  }

  test("seasonalNaiveBacktest: unseen dow in training reports NULL") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // cut = 10 − 7 = 3 → train days {0,1,2} (dows 4,5,6); held-out
    // day 10 has dow (10+4)%7 = 0 — never seen in training
    val rows = Seq(0, 1, 2, 10).map(d => ("a", ts(d)))
    val out = Profile.seasonalNaiveBacktest(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
    val d10 = out.find(_.getAs[Long]("day") === 10L).get
    assert(d10.isNullAt(d10.fieldIndex("forecast")))
    assert(d10.isNullAt(d10.fieldIndex("abs_err")))
  }

  test("anovaOneWay: planted group separation reproduces exact eta2 and F") {
    // A={1,3}, B={101,103} cents: SSB=10000, SSW=4 → η²=10000/10004,
    // F = (SSB/1)/(SSW/2) = 5000
    val rows = Seq(("A", 1L), ("A", 3L), ("B", 101L), ("B", 103L))
    val r = Profile.anovaOneWay(rows.toDF("g", "v"), col("g"), col("v"),
      "t").collect()(0)
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("k") === 2L)
    assert(math.abs(r.getAs[Double]("eta2") - 10000.0 / 10004) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_stat") - 5000.0) < 0.01)
  }

  test("anovaOneWay: zero variance → NULL; saturated eta2 → NULL F") {
    val const = Seq(("A", 5L), ("B", 5L), ("B", 5L))
    val rc = Profile.anovaOneWay(const.toDF("g", "v"), col("g"), col("v"),
      "c").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("eta2")))
    assert(rc.isNullAt(rc.fieldIndex("f_stat")))
    // perfect separation with zero within-variance: η² = 1 → F null
    val sep = Seq(("A", 1L), ("A", 1L), ("B", 9L), ("B", 9L))
    val rs = Profile.anovaOneWay(sep.toDF("g", "v"), col("g"), col("v"),
      "s").collect()(0)
    assert(rs.getAs[Double]("eta2") === 1.0)
    assert(rs.isNullAt(rs.fieldIndex("f_stat")))
  }

  test("rateShift: planted 3x acceleration yields ratio 3 and Wald z") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i) * 1000L)
    // days 0..9 → mid 4; 1/day pre, 3/day post
    val rows = (0 to 4).map(d => ("up", ts(d, 0))) ++
      (5 to 9).flatMap(d => (0 until 3).map(i => ("up", ts(d, i))))
    val r = Profile.rateShift(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(r.getAs[Long]("days_pre") === 5L)
    assert(r.getAs[Long]("days_post") === 5L)
    assert(r.getAs[Long]("n_pre") === 5L && r.getAs[Long]("n_post") === 15L)
    assert(r.getAs[Double]("rate_ratio") === 3.0)
    // z = (3−1)/√(5/25 + 15/25) = 2/√0.8
    assert(math.abs(r.getAs[Double]("z") - 2.0 / math.sqrt(0.8)) < 1e-6)
  }

  test("hillTail: exact Pareto order statistics recover the closed form") {
    // x_i = C/i: ln(x_i/x_{k+1}) = ln((k+1)/i); α = k / Σ_{i≤k} ln((k+1)/i)
    val n = 60
    def v(i: Int): Long = 7207200L / i // truncating, mirrored below
    val rows = (1 to n).map(i => (i.toLong, v(i)))
    val k = 10
    val out = Profile.hillTail(rows.toDF("kk", "c"), col("c"), col("kk"),
      k, "t").collect()(0)
    val expected = k / (1 to k).map(i =>
      math.log(v(i).toDouble / v(k + 1).toDouble)).sum
    assert(out.getAs[Long]("n_top") === (k + 1).toLong)
    assert(out.getAs[Long]("x_tail") === 7207200L / (k + 1))
    assert(math.abs(out.getAs[Double]("alpha") - expected) < 1e-4)
  }

  test("hillTail: flat top (all equal) reports NULL alpha") {
    val rows = (1 to 40).map(i => (i.toLong, 100L))
    val out = Profile.hillTail(rows.toDF("kk", "c"), col("c"), col("kk"),
      10, "flat").collect()(0)
    assert(out.isNullAt(out.fieldIndex("alpha")))
  }

  test("readability: hand-counted two-sentence doc scores exactly") {
    // 6 words, 2 sentences, 6 single-vowel-group words:
    // wps=3, spw=1 → FRE = 206.835 − 3.045 − 84.6 = 119.19
    //                FK = 1.17 + 11.8 − 15.59 = −2.62
    val docs = Seq(("s1", "The cat sat. The dog ran!")).toDF("source", "text")
    val r = Profile.readability(docs).collect()(0)
    assert(r.getAs[Long]("n_words") === 6L)
    assert(r.getAs[Long]("n_syllables") === 6L)
    assert(math.abs(r.getAs[Double]("avg_fre") - 119.19) < 1e-4)
    assert(math.abs(r.getAs[Double]("avg_fk_grade") - (-2.62)) < 1e-4)
  }

  test("zonemapSkipAudit: clustered key skips; scattered column cannot") {
    val rows = (0 until 4096).map(k => (k.toLong, k.toLong, (k % 7).toLong))
    val df = rows.toDF("k", "v_sorted", "v_scattered")
    val out = Profile.zonemapSkipAudit(df, "k", Seq(
        ("point", col("v_sorted"), 1024L, 1024L),
        ("none", col("v_sorted"), 5000L, 9999L),
        ("scatter", col("v_scattered"), 3L, 3L)))
      .collect().map(r => r.getAs[String]("predicate") -> r).toMap
    val p = out("point")
    assert(p.getAs[Long]("n_buckets") === 4L)
    assert(p.getAs[Long]("n_skippable") === 3L)
    assert(p.getAs[Long]("rows_scanned") === 1024L)
    assert(p.getAs[Long]("rows_matching") === 1L)
    assert(p.getAs[Long]("est_sorted_scan_rows") === 1024L)
    val z = out("none")
    assert(z.getAs[Long]("n_skippable") === 4L)
    assert(z.getAs[Long]("rows_scanned") === 0L)
    assert(z.getAs[Long]("est_sorted_scan_rows") === 0L)
    val s = out("scatter")
    assert(s.getAs[Long]("n_skippable") === 0L) // every zone spans 0..6
    assert(s.getAs[Long]("rows_scanned") === 4096L)
    assert(s.getAs[Long]("rows_matching") ===
      rows.count(_._3 == 3L).toLong)
    assert(s.getAs[Long]("est_sorted_scan_rows") === 1024L)
  }

  test("cardinalityAudit: uniform column q-error 1, skewed column blows up") {
    val uniform = (0 until 100).map(i => s"u${i % 10}").toDF("c")
    val ru = Profile.cardinalityAudit(uniform,
      Seq(("eq", col("c"), Left("u0")))).collect()(0)
    assert(ru.getAs[Long]("est_rows") === 10L)
    assert(ru.getAs[Long]("actual_rows") === 10L)
    assert(ru.getAs[Double]("q_error") === 1.0)
    val skewed = (Seq.fill(91)("hot") ++ (0 until 9).map(i => s"s$i"))
      .toDF("c")
    val rs = Profile.cardinalityAudit(skewed,
      Seq(("eq", col("c"), Left("hot")))).collect()(0)
    assert(rs.getAs[Long]("est_rows") === 10L) // n/ndv = 100/10
    assert(rs.getAs[Long]("actual_rows") === 91L)
    assert(rs.getAs[Double]("q_error") === 9.1)
  }

  test("cardinalityAudit: range estimate under uniform spread; empty → null") {
    val vals = (0L until 100L).toDF("v")
    val out = Profile.cardinalityAudit(vals, Seq(
        ("decile", col("v"), Right((0L, 9L))),
        ("miss", col("v"), Right((500L, 600L)))))
      .collect().map(r => r.getAs[String]("predicate") -> r).toMap
    val d = out("decile")
    assert(d.getAs[Long]("est_rows") === 10L)
    assert(d.getAs[Double]("q_error") === 1.0)
    val m = out("miss")
    assert(m.getAs[Long]("actual_rows") === 0L)
    assert(m.isNullAt(m.fieldIndex("q_error")))
  }

  test("joinOrderAudit: exact intermediates pick the smaller start") {
    val fact = Seq((1L, "x"), (1L, "y"), (1L, "y"), (2L, "z"))
      .toDF("fa", "fb")
    val dimA = Seq(1L, 1L, 2L).toDF("ka") // dup parent key amplifies
    val dimB = Seq("x", "y", "z").toDF("kb")
    val out = Profile.joinOrderAudit(fact, "fa", dimA, "ka", "A",
        "fb", dimB, "kb", "B").collect()
      .map(r => r.getAs[String]("plan") -> r).toMap
    assert(out("A*fact first").getAs[Long]("intermediate") === 7L) // 3·2+1
    assert(out("B*fact first").getAs[Long]("intermediate") === 4L)
    out.values.foreach(r => assert(r.getAs[Long]("final_rows") === 7L))
    assert(out("B*fact first").getAs[Boolean]("recommended"))
    assert(!out("A*fact first").getAs[Boolean]("recommended"))
  }

  test("mannWhitney: perfect separation hits the closed-form z") {
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
    val r = Profile.mannWhitney(rows.toDF("g", "v"), col("g"), col("v"),
      "A", "B").collect()(0)
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("u_stat") === 0.0)
    // z = (0 − 2)/√(4/12·5) = −2/√(5/3)
    assert(math.abs(r.getAs[Double]("z") - (-2.0 / math.sqrt(5.0 / 3))) <
      1e-6)
    val rev = Profile.mannWhitney(rows.toDF("g", "v"), col("g"), col("v"),
      "B", "A").collect()(0)
    assert(rev.getAs[Double]("u_stat") === 4.0)
    assert(rev.getAs[Double]("z") > 0)
  }

  test("mannWhitney: all-tied sample reports NULL z, average ranks exact") {
    val rows = Seq(("A", 7L), ("A", 7L), ("B", 7L))
    val r = Profile.mannWhitney(rows.toDF("g", "v"), col("g"), col("v"),
      "A", "B").collect()(0)
    // everyone shares rank 2 → R_A = 4 → U = 4 − 3 = 1
    assert(r.getAs[Double]("u_stat") === 1.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("kruskalWallis: two groups reproduce H = z² of the MW test") {
    // A={1,2}, B={3,4}: H = 12/(4·5)·(R_A²/2 + R_B²/2) − 15 = 2.4 = z²
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
    val r = Profile.kruskalWallis(rows.toDF("g", "v"), col("g"), col("v"),
      "t").collect()(0)
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("k") === 2L)
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-5)
    assert(math.abs(r.getAs[Double]("h_tie_corrected") - 2.4) < 1e-5)
    val zr = Profile.mannWhitney(rows.toDF("g", "v"), col("g"), col("v"),
      "A", "B").collect()(0).getAs[Double]("z")
    assert(math.abs(r.getAs[Double]("h") - zr * zr) < 1e-4)
  }

  test("kruskalWallis: all-tied sample reports NULL H") {
    val rows = Seq(("A", 7L), ("B", 7L), ("C", 7L), ("A", 7L))
    val r = Profile.kruskalWallis(rows.toDF("g", "v"), col("g"), col("v"),
      "t").collect()(0)
    assert(r.isNullAt(r.fieldIndex("h_tie_corrected")))
  }

  test("spearman: monotone transform gives rho 1, reversal -1, constant NULL") {
    val mono = (1L to 50L).map(i => (i, i * i * i)).toDF("x", "y")
    val rm = Profile.spearman(mono, col("x"), col("y"), "m").collect()(0)
    assert(rm.getAs[Double]("rho") === 1.0)
    val rev = (1L to 50L).map(i => (i, -i)).toDF("x", "y")
    val rr = Profile.spearman(rev, col("x"), col("y"), "r").collect()(0)
    assert(rr.getAs[Double]("rho") === -1.0)
    val const = (1L to 10L).map(i => (i, 5L)).toDF("x", "y")
    val rc = Profile.spearman(const, col("x"), col("y"), "c").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("rho")))
  }

  test("effectSizes: hand groups give exact d and Cliff's delta") {
    // A={0,200}, B={100,300}: d = −100/√20000; δ = (1−3)/4 = −0.5
    val rows = Seq(("A", 0L), ("A", 200L), ("B", 100L), ("B", 300L))
    val r = Profile.effectSizes(rows.toDF("g", "v"), col("g"), col("v"),
      "A", "B").collect()(0)
    assert(r.getAs[Double]("mean_a") === 100.0)
    assert(r.getAs[Double]("mean_b") === 200.0)
    assert(math.abs(r.getAs[Double]("cohens_d") -
      (-100.0 / math.sqrt(20000))) < 1e-6)
    assert(r.getAs[Double]("cliffs_delta") === -0.5)
  }

  test("effectSizes: disjoint groups saturate Cliff's delta at ±1") {
    val rows = Seq(("A", 10L), ("A", 11L), ("B", 1L), ("B", 2L))
    val r = Profile.effectSizes(rows.toDF("g", "v"), col("g"), col("v"),
      "A", "B").collect()(0)
    assert(r.getAs[Double]("cliffs_delta") === 1.0) // every a beats every b
  }

  test("bhAdjust: textbook p-values, step-up monotone, last equals raw") {
    val tests = Seq(("t1", 0.0), ("t2", 1.96), ("t3", 3.0))
      .toDF("key", "z")
    val out = Profile.bhAdjust(tests, "key", "z").collect()
    val byKey = out.map(r => r.getAs[String]("key") -> r).toMap
    assert(math.abs(byKey("t1").getAs[Double]("p_raw") - 1.0) < 1e-5)
    assert(math.abs(byKey("t2").getAs[Double]("p_raw") - 0.05) < 1e-4)
    assert(math.abs(byKey("t3").getAs[Double]("p_raw") - 0.0027) < 1e-4)
    // ranks ascend by p; adjusted p monotone nondecreasing in rank;
    // the worst hypothesis keeps its raw p (m/m = 1)
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[String]("key")).toSeq ===
      Seq("t3", "t2", "t1"))
    val adj = byRank.map(_.getAs[Double]("p_adj"))
    assert(adj.sliding(2).forall(p => p(0) <= p(1)))
    assert(adj.last === byRank.last.getAs[Double]("p_raw"))
    assert(byKey("t3").getAs[Boolean]("significant"))
    assert(!byKey("t1").getAs[Boolean]("significant"))
  }

  test("partitionerAudit: conservation, bucket bounds, hot key lands whole") {
    val rows = (Seq.fill(1000)("hot") ++ (0 until 99).map(i => s"k$i"))
      .toDF("k")
    val out = Profile.partitionerAudit(rows, "k", nParts = 10).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    Seq("hash", "range").foreach { s =>
      val r = out(s)
      assert(r.getAs[Long]("n_buckets") <= 10L)
      // a single hot KEY cannot be split by either strategy
      assert(r.getAs[Long]("max_rows") >= 1000L, r.toString)
      assert(r.getAs[Double]("mean_rows") === 109.9)
      assert(r.getAs[Double]("straggler_factor") >= 9.0)
    }
    // deterministic replay
    val again = Profile.partitionerAudit(rows, "k", nParts = 10).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    Seq("hash", "range").foreach(s =>
      assert(out(s).toString === again(s).toString))
  }

  test("outlierVotes: the extreme point sweeps all three detectors") {
    // tight cluster 990..1089 + one point 100× out
    val rows = (0 until 100).map(i => (i.toLong, 990L + i)) :+
      (999L, 100000L)
    val out = Profile.outlierVotes(rows.toDF("k", "v"), col("k"), col("v"),
      topK = 5).collect()
    val top = out.head
    assert(top.getAs[Long]("k") === 999L)
    assert(top.getAs[Long]("votes") === 3L)
    assert(top.getAs[Boolean]("flag_z") &&
      top.getAs[Boolean]("flag_mad") && top.getAs[Boolean]("flag_iqr"))
    // cluster members earn zero votes
    assert(out.tail.forall(_.getAs[Long]("votes") === 0L))
  }

  test("weeklyGini: equal shares score 0; two-user closed form") {
    def ts(week: Int, i: Int) = new java.sql.Timestamp(
      (week.toLong * 7 * 86400 + i) * 1000L)
    // week 0: four users × 5 events (G = 0);
    // week 1: a=1, b=19 (G = (19−1)/(2·20) = 0.45)
    val rows = (0 until 4).flatMap(u =>
        (0 until 5).map(i => (s"u$u", ts(0, u * 10 + i)))) ++
      Seq(("a", ts(1, 0))) ++ (0 until 19).map(i => ("b", ts(1, i + 10)))
    val out = Profile.weeklyGini(rows.toDF("u", "ts"), "u", "ts")
      .collect().map(r => r.getAs[Long]("week") -> r).toMap
    assert(out(0L).getAs[Long]("n_users") === 4L)
    assert(out(0L).getAs[Double]("gini") === 0.0)
    assert(out(1L).getAs[Double]("gini") === 0.45)
  }

  test("topHitterDrift: rank-joined leaderboards expose churn and exits") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i) * 1000L)
    // days 0..9 → mid 4. pre: A×5, B×3, C×1; post: B×5, D×4
    val pre = (0 until 5).map(i => ("A", ts(i % 5, i))) ++
      (0 until 3).map(i => ("B", ts(i, 100 + i))) ++ Seq(("C", ts(2, 200)))
    val post = (0 until 5).map(i => ("B", ts(5 + i % 5, i))) ++
      (0 until 4).map(i => ("D", ts(5 + i, 300 + i)))
    val out = Profile.topHitterDrift((pre ++ post).toDF("u", "ts"),
        "u", "ts", topK = 3).collect()
      .map(r => r.getAs[Long]("rank") -> r).toMap
    assert(out(1L).getAs[String]("user_pre") === "A")
    assert(out(1L).getAs[String]("user_post") === "B")
    assert(out(1L).getAs[Boolean]("user_changed"))
    assert(out(2L).getAs[String]("user_pre") === "B")
    assert(out(2L).getAs[String]("user_post") === "D")
    assert(out(3L).getAs[String]("user_pre") === "C")
    assert(out(3L).isNullAt(out(3L).fieldIndex("user_post")))
    assert(out(3L).getAs[Boolean]("user_changed"))
  }

  test("dowHourHeatmap: planted hour pattern, per-dow shares sum to 1") {
    def ts(day: Int, h: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + h * 3600 + i) * 1000L)
    // day 0 (dow 4): 3 events at 09:00, 1 at 17:00
    val rows = (0 until 3).map(i => ("e", ts(0, 9, i))) :+
      (("e", ts(0, 17, 0)))
    val out = Profile.dowHourHeatmap(rows.toDF("event_type", "ts"), "ts")
      .collect().map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hour")) -> r)
      .toMap
    assert(out.keySet === Set((4L, 9L), (4L, 17L)))
    assert(out((4L, 9L)).getAs[Long]("n") === 3L)
    assert(out((4L, 9L)).getAs[Double]("share_of_dow") === 0.75)
    assert(out((4L, 17L)).getAs[Double]("share_of_dow") === 0.25)
  }

  test("whaleShares: planted head produces exact concentration cuts") {
    def ts(i: Int) = new java.sql.Timestamp(i.toLong * 1000L)
    // 10 users: u0 has 91 events, u1..u9 one each → top 10% (1 user)
    // holds 91%, top 50% (5 users) holds 95%
    val rows = (0 until 91).map(i => ("u0", ts(i))) ++
      (1 until 10).map(u => (s"u$u", ts(1000 + u)))
    val out = Profile.whaleShares(rows.toDF("u", "ts"), "u",
        percents = Seq(10, 50)).collect()
      .map(r => r.getAs[Long]("top_percent") -> r).toMap
    assert(out(10L).getAs[Long]("n_top_entities") === 1L)
    assert(out(10L).getAs[Double]("share") === 0.91)
    assert(out(50L).getAs[Long]("n_top_entities") === 5L)
    assert(out(50L).getAs[Double]("share") === 0.95)
  }

  test("freshnessAudit: fresh / stale / gappy verdicts from planted feeds") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    val rows = (14 to 20).map(d => ("A", ts(d))) ++        // complete
      (10 to 17).map(d => ("B", ts(d))) ++                 // 3 days behind
      Seq(20, 19, 15, 14).map(d => ("C", ts(d)))           // holes
    val out = Profile.freshnessAudit(rows.toDF("event_type", "ts"),
        "event_type", "ts").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("A").getAs[String]("verdict") === "fresh")
    assert(out("A").getAs[Long]("days_present_7d") === 7L)
    assert(out("B").getAs[String]("verdict") === "stale")
    assert(out("B").getAs[Long]("staleness_days") === 3L)
    assert(out("C").getAs[String]("verdict") === "gappy")
    assert(out("C").getAs[Long]("days_missing_7d") === 3L)
  }

  test("fkDiscovery: full containment flags the FK; partial does not") {
    val child = Seq(Some(1), Some(2), Some(3), None).toDF("c")
    val parent = Seq(1, 2, 3, 4, 5).toDF("p")
    val bad = Seq(1, 9).toDF("c")
    val out = Profile.fkDiscovery(Seq(
        ("good", child, "c", parent, "p"),
        ("bad", bad, "c", parent, "p")))
      .collect().map(r => r.getAs[String]("candidate") -> r).toMap
    val g = out("good")
    assert(g.getAs[Long]("ndv_child") === 3L) // NULL ignored
    assert(g.getAs[Long]("n_matched") === 3L)
    assert(g.getAs[Double]("containment") === 1.0)
    assert(g.getAs[Double]("coverage") === 0.6)
    assert(g.getAs[Boolean]("is_fk_candidate"))
    val b = out("bad")
    assert(b.getAs[Double]("containment") === 0.5)
    assert(!b.getAs[Boolean]("is_fk_candidate"))
  }

  test("interpolateDaily: interior gap fills on the line, micro-exact") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // day 0: 2 events; day 3: 8 events; days 1,2 missing → 4, 6
    val rows = Seq.fill(2)(("a", ts(0))) ++ Seq.fill(8)(("a", ts(3)))
    val out = Profile.interpolateDaily(rows.toDF("event_type", "ts"),
        "event_type", "ts").collect()
      .map(r => r.getAs[Long]("day") -> r).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
    assert(out(0L).getAs[Boolean]("observed") &&
      out(0L).getAs[Double]("y_filled") === 2.0)
    assert(!out(1L).getAs[Boolean]("observed") &&
      out(1L).getAs[Double]("y_filled") === 4.0)
    assert(out(2L).getAs[Double]("y_filled") === 6.0)
    assert(out(3L).getAs[Double]("y_filled") === 8.0)
  }

  test("interpolateDaily: fractional slope quantizes at 1e-6") {
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // 1 event day 0, 2 events day 3 → interior 4/3 and 5/3
    val rows = Seq(("a", ts(0))) ++ Seq.fill(2)(("a", ts(3)))
    val out = Profile.interpolateDaily(rows.toDF("event_type", "ts"),
        "event_type", "ts").collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("y_filled")).toMap
    assert(out(1L) === math.round(1e6 * 4 / 3.0) / 1e6)
    assert(out(2L) === math.round(1e6 * 5 / 3.0) / 1e6)
  }

  test("crossCorrelation: a one-day-shifted copy peaks at lag 1") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    // A alternates 2/6 on days 0..19; B(d) = A(d−1) on days 1..20
    def cnt(d: Int) = if (d % 2 == 0) 2 else 6
    val rows = (0 until 20).flatMap(d =>
      (0 until cnt(d)).map(i => ("A", ts(d, i)))) ++
      (1 to 20).flatMap(d =>
        (0 until cnt(d - 1)).map(i => ("B", ts(d, i))))
    val out = Profile.crossCorrelation(rows.toDF("event_type", "ts"),
        "event_type", "ts", maxLag = 2).collect()
      .map(r => (r.getAs[String]("ga"), r.getAs[String]("gb"),
        r.getAs[Long]("lag")) -> r.getAs[Double]("xcorr")).toMap
    assert(out(("B", "A", 1L)) === 1.0)   // B today IS A yesterday
    assert(out(("B", "A", 0L)) < -0.9)    // contemporaneous anti-phase
    // A(t) vs B(t−1) = cnt(t−2): the period-2 series aliases back
    // into phase at even effective offsets
    assert(out(("A", "B", 1L)) > 0.9)
  }

  test("overdispersion: bursty series flags over, constant flags under") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400 + i * 60) * 1000L)
    val rows = (0 until 10).flatMap { d =>
      val burst = if (d % 2 == 0) 1 else 9
      (0 until burst).map(i => ("bursty", ts(d, i))) ++
        (0 until 4).map(i => ("steady", ts(d, i)))
    }
    val out = Profile.overdispersion(rows.toDF("event_type", "ts"),
        "event_type", "ts").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val b = out("bursty")
    assert(b.getAs[String]("verdict") === "overdispersed")
    // s² = (10·410 − 2500)/90 = 160/9; dispersion = s²/5
    assert(math.abs(b.getAs[Double]("dispersion") - 160.0 / 9 / 5) < 1e-5)
    val s = out("steady")
    assert(s.getAs[Double]("variance") === 0.0)
    assert(s.getAs[String]("verdict") === "underdispersed")
  }

  test("simpsonCheck: planted reversal flags both strata against the pooled slope") {
    // within-stratum slope −1, across-strata trend +: pooled slope 0.4
    val rows = Seq(("A", 1L, 9L), ("A", 2L, 8L), ("B", 8L, 12L),
      ("B", 9L, 11L))
    val out = Profile.simpsonCheck(rows.toDF("g", "x", "y"), "g",
        col("x"), col("y")).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    assert(out("__pooled__").getAs[Double]("slope") === 0.4)
    assert(out("__pooled__").isNullAt(
      out("__pooled__").fieldIndex("opposes_pooled")))
    Seq("A", "B").foreach { g =>
      assert(out(g).getAs[Double]("slope") === -1.0)
      assert(out(g).getAs[Boolean]("opposes_pooled"))
    }
  }

  test("simpsonCheck: zero-variance stratum reports NULL slope, no flag") {
    val rows = Seq(("C", 5L, 1L), ("C", 5L, 9L), ("D", 1L, 1L),
      ("D", 2L, 2L))
    val out = Profile.simpsonCheck(rows.toDF("g", "x", "y"), "g",
        col("x"), col("y")).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    assert(out("C").isNullAt(out("C").fieldIndex("slope")))
    assert(out("C").isNullAt(out("C").fieldIndex("opposes_pooled")))
  }

  test("weeklyChurn: planted cohort turnover produces exact rates") {
    def ts(week: Int, u: String) = new java.sql.Timestamp(
      week.toLong * 7 * 86400000L)
    // week0: {a,b,c,d}; week1: {c,d,e}; week2: {e}
    val rows = Seq("a", "b", "c", "d").map(u => (u, ts(0, u))) ++
      Seq("c", "d", "e").map(u => (u, ts(1, u))) ++
      Seq(("e", ts(2, "e")))
    val out = Profile.weeklyChurn(rows.toDF("u", "ts"), "u", "ts")
      .collect().map(r => r.getAs[Long]("week") -> r).toMap
    assert(out(0L).isNullAt(out(0L).fieldIndex("churn_rate")))
    assert(out(1L).getAs[Long]("n_retained") === 2L)
    assert(out(1L).getAs[Long]("n_churned") === 2L)
    assert(out(1L).getAs[Double]("churn_rate") === 0.5)
    assert(out(2L).getAs[Long]("n_retained") === 1L)
    assert(out(2L).getAs[Double]("retention_rate") ===
      math.round(1e6 / 3.0) / 1e6)
  }
}
