package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats flags loopy text and clears diverse text") {
    val docs = Seq(
      (0L, "spam spam spam spam spam spam"),                  // one token repeated
      (1L, "every word here is completely different tokens")  // all distinct
    ).toDF("doc_id", "text")
    val stats = Corpus.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("distinct_ratio"), r.getAs[Double]("top_bigram_frac")))
      .toMap
    assert(stats(0L)._1 < 0.2)       // 1 distinct / 6 tokens
    assert(stats(0L)._2 === 1.0)     // "spam spam" is every bigram
    assert(stats(1L)._1 === 1.0)
    assert(stats(1L)._2 < 0.2)       // 1 occurrence / 6 bigrams
  }

  test("chunk: stride coverage, overlap reconstruction, ragged tail") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val chunks = Corpus.chunk(docs, chunkSize = 32, overlap = 8)
      .orderBy("chunk_id").collect()
    // ceil((100-8)/24) = 4 chunks
    assert(chunks.length === 4)
    val texts = chunks.map(_.getAs[String]("chunk_text"))
    // chunk i starts at token i*24+1; overlap = last 8 tokens repeat
    assert(texts(0).startsWith("t1 ") && texts(1).startsWith("t25 "))
    val t0 = texts(0).split(" ")
    val t1 = texts(1).split(" ")
    assert(t0.takeRight(8).toSeq === t1.take(8).toSeq) // overlap region
    // ragged tail: last chunk has 100 - 73 + 1 = 28 tokens
    assert(chunks.last.getAs[Long]("n_tokens") === 28L)
    assert(texts.last.split(" ").length === 28)
    // full coverage: concatenating chunks at stride boundaries
    // reconstructs the document exactly
    val reconstructed = (texts.head.split(" ") ++
      texts.tail.flatMap(_.split(" ").drop(8))).toSeq
    assert(reconstructed === text.split(" ").toSeq)
  }

  test("chunk: single short doc yields one chunk; bad params rejected") {
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val one = Corpus.chunk(docs, chunkSize = 32, overlap = 8).collect()
    assert(one.length === 1)
    assert(one.head.getAs[String]("chunk_text") === "a b c")
    assert(one.head.getAs[Long]("n_tokens") === 3L)
    intercept[IllegalArgumentException] {
      Corpus.chunk(docs, chunkSize = 8, overlap = 8)
    }
  }

  test("packByTokenBudget: offset bins are monotone, exact, and per-stratum") {
    // doc i in stratum A has i+1 tokens; budget 5 → offsets 0,1,3,6,10
    // → bins 0,0,0,1,2. Stratum B restarts at offset 0.
    val docs = Seq(
      (0L, "a", "t"), (1L, "a", "t t"), (2L, "a", "t t t"),
      (3L, "a", "t t t t"), (4L, "a", "t t t t t"),
      (10L, "b", "t t t t t t t"), (11L, "b", "t")
    ).toDF("doc_id", "lang", "text")
    val got = Corpus.packByTokenBudget(docs, budget = 5L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L,
      10L -> 0L, 11L -> 1L))
    // laws: bins start at 0 per stratum and are contiguous (a window
    // over id order can't skip a bin), and every doc's start offset
    // sits inside its bin
    val full = Corpus.packByTokenBudget(docs, budget = 5L)
      .orderBy("lang", "doc_id").collect()
    full.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val bins = rows.map(_.getAs[Long]("bin"))
      assert(bins.head === 0L)
      bins.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= 1 && b >= a)
        case _ =>
      }
    }
    // partition invariance: same result on a repartitioned input
    val shuffled = Corpus.packByTokenBudget(docs.repartition(7), budget = 5L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(shuffled === got)
    intercept[IllegalArgumentException](Corpus.packByTokenBudget(docs, 0L))
  }

  test("cdcChunks: boundaries are content-defined — insertion shifts only locally") {
    // a long synthetic doc (distinct tokens → ~1/divisor boundary
    // rate, many chunks) so the re-sync property has room to show
    val doc = (1 to 400).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, doc), (1L, "inserted preamble tokens " + doc))
      .toDF("doc_id", "text")
    val chunks = Corpus.cdcChunks(docs, w = 3, divisor = 16).collect()
    val h0 = chunks.filter(_.getLong(0) == 0L).map(_.getAs[String]("chunk_hash")).toSet
    val h1 = chunks.filter(_.getLong(0) == 1L).map(_.getAs[String]("chunk_hash")).toSet
    assert(h0.size >= 5, s"expected several chunks, got ${h0.size}")
    // fixed-size chunking would share ~nothing after a 3-token shift;
    // CDC re-synchronizes at the FIRST boundary, so every chunk but
    // the one absorbing the prefix survives the insertion
    val shared = h0.intersect(h1).size.toDouble / h0.size
    assert(shared >= 0.7, f"only $shared%.2f of chunks survived the insertion")
    // every token lands in exactly one chunk
    val nToks = chunks.filter(_.getLong(0) == 0L).map(_.getAs[Long]("n_tokens")).sum
    assert(nToks === doc.toLowerCase.split("\\s+").length.toLong)
    // chunk text reassembles the document in order
    val joined = chunks.filter(_.getLong(0) == 0L)
      .sortBy(_.getAs[Long]("chunk_id")).map(_.getAs[String]("chunk_text"))
      .mkString(" ")
    assert(joined === doc.toLowerCase.split("\\s+").mkString(" "))
    intercept[IllegalArgumentException](Corpus.cdcChunks(docs, w = 0))
  }

  test("stratifiedSample is partition-invariant (deterministic by md5)") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "stratum")
    def ids(parts: Int) = Corpus.stratifiedSample(
      df.repartition(parts), "stratum", k = 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val a = ids(1)
    assert(a === ids(13))                       // layout cannot change the sample
    assert(a.groupBy(_._1).forall(_._2.size == 7)) // exactly k per stratum
  }

  test("weightedSample: rate laws and partition invariance") {
    val df = (0L until 1000L).map(i => (i, s"s${i % 2}")).toDF("doc_id", "source")
    // rate 1.0 keeps everything in the stratum; rate 0 / unlisted drops all
    val all = Corpus.weightedSample(df, "source", Map("s0" -> 1.0))
      .collect().map(_.getLong(0)).toSet
    assert(all.size === 500 && all.forall(_ % 2 == 0))
    assert(Corpus.weightedSample(df, "source", Map("s0" -> 0.0)).count() === 0L)
    // ~half survive at 0.5 (hash coin is uniform-ish)
    val half = Corpus.weightedSample(df, "source", Map("s0" -> 0.5, "s1" -> 0.5))
      .count()
    assert(half > 350 && half < 650, s"0.5-rate kept $half of 1000")
    // deterministic: layout cannot change the sample
    val a = Corpus.weightedSample(df.repartition(17), "source",
      Map("s0" -> 0.3, "s1" -> 0.7)).collect().map(_.getLong(0)).toSet
    val b = Corpus.weightedSample(df.repartition(1), "source",
      Map("s0" -> 0.3, "s1" -> 0.7)).collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("tokenBudgetSample: budget bound, prefix property, partition-invariant") {
    val docs = (0L until 60L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val budgets = Map("a" -> 40L, "b" -> 25L)
    def run(parts: Int) = Corpus.tokenBudgetSample(docs.repartition(parts), budgets)
      .select("doc_id").as[Long].collect().toSet
    val kept = run(1)
    assert(kept === run(13)) // deterministic on any layout
    // budgets hold per stratum
    val tokens = docs.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(2).split(" ").length.toLong)).toMap
    Seq("a", "b").foreach { g =>
      val total = kept.toSeq.map(tokens).filter(_._1 == g).map(_._2).sum
      assert(total <= budgets(g), s"stratum $g: $total > ${budgets(g)}")
    }
    assert(kept.nonEmpty && kept.size < 60) // it actually sampled
    // prefix property: kept set = maximal hash-order prefix (nothing
    // after the first exclusion is kept)
    import org.apache.spark.sql.expressions.Window
    val ordered = docs.withColumn("_rn", row_number().over(
        Window.partitionBy("lang").orderBy(md5($"doc_id".cast("string")), $"doc_id")))
      .select("doc_id", "lang", "_rn").as[(Long, String, Int)].collect()
    Seq("a", "b").foreach { g =>
      val inOrder = ordered.filter(_._2 == g).sortBy(_._3).map(_._1)
      val keptFlags = inOrder.map(kept.contains)
      assert(!keptFlags.dropWhile(identity).contains(true), s"non-prefix keep in $g")
    }
  }

  test("tokenBudgetSample: unlisted stratum is dropped by default, kept via defaultBudget") {
    val docs = Seq((0L, "a", "w w"), (1L, "b", "w w"), (2L, "zz", "w w"))
      .toDF("doc_id", "lang", "text")
    val budgets = Map("a" -> 10L, "b" -> 10L)
    // default: closed allocation — 'zz' has no budget line, so it is dropped
    val strict = Corpus.tokenBudgetSample(docs, budgets)
      .select("lang").as[String].collect().toSet
    assert(strict === Set("a", "b"))
    // defaultBudget = MaxValue: unlisted strata pass through unbounded
    val open = Corpus.tokenBudgetSample(docs, budgets, defaultBudget = Long.MaxValue)
      .select("lang").as[String].collect().toSet
    assert(open === Set("a", "b", "zz"))
  }

  test("prepare: every stage of the composed pipeline binds") {
    val quick = "the quick brown fox jumps over the lazy dog and runs on, for miles."
    val docs = Seq(
      (0L, s"$quick contact me at a@b.co today."),
      (1L, s"$quick contact me at a@b.co today."),            // exact dup of 0
      (2L, s"$quick contact me at a@b.co tomorrow."),         // near dup of 0 (one token)
      (3L, "x")                                                // junk: fails the gate
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val out = Corpus.prepare(docs, minQuality = 0.6, minJaccard = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted"))
      .toMap
    // 1 exact-dropped, 2 near-dropped, 3 gated → only 0 survives
    assert(out.keySet === Set(0L))
    // and its PII is redacted, the rest intact
    assert(out(0L).contains("[EMAIL]") && !out(0L).contains("a@b.co"))
    assert(out(0L).startsWith("the quick brown fox"))
  }

  test("stripBoilerplate: shared lines go, unique lines stay in order") {
    // line size 2 → doc 0/1 share the line "nav bar"; "alpha beta",
    // "gamma delta" are unique; doc 2 is untouched
    val docs = Seq(
      (0L, "nav bar alpha beta"),
      (1L, "nav bar gamma delta"),
      (2L, "epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val out = Corpus.stripBoilerplate(docs, lineSize = 2, minDf = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq ===
      Seq("alpha beta", "gamma delta", "epsilon zeta eta theta"))
    assert(out.map(_.getAs[Long]("n_removed")).toSeq === Seq(1L, 1L, 0L))
    assert(out.map(_.getAs[Long]("n_lines")).toSeq === Seq(2L, 2L, 2L))
  }

  test("stripBoilerplate: group scoping, full-boilerplate doc, invariance") {
    val docs = Seq(
      (0L, "a", "nav bar"), (1L, "a", "nav bar"),    // same group → stripped
      (2L, "b", "nav bar"),                          // alone in group b → kept
      (3L, "a", "nav bar")                           // stripped, fully empty
    ).toDF("doc_id", "grp", "text")
    val out = Corpus.stripBoilerplate(docs, lineSize = 2, minDf = 2,
      groupCol = Some("grp")).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq ===
      Seq("", "", "nav bar", ""))
    // partition invariance: same result at any layout
    val alt = Corpus.stripBoilerplate(docs.repartition(13), lineSize = 2,
      minDf = 2, groupCol = Some("grp")).orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq === alt.map(_.toSeq).toSeq)
    // minDf < 2 is a foot-gun, rejected
    intercept[IllegalArgumentException] {
      Corpus.stripBoilerplate(docs, lineSize = 2, minDf = 1)
    }
  }

  test("withEmbeddings aligns ids and keeps both sides' columns") {
    val d = Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
    val e = Seq((0L, Array(1.0f), 7), (1L, Array(2.0f), 8))
      .toDF("vec_id", "embedding", "label")
    val j = Corpus.withEmbeddings(d, e).orderBy("doc_id").collect()
    assert(j.length === 2)
    assert(j(0).getAs[Int]("label") === 7)
    assert(j(1).getAs[String]("text") === "beta")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; " +
    "whitespace-only edits are unchanged") {
    val v1 = Seq((0L, "same text"), (1L, "will change"), (2L, "will vanish"),
      (3L, "spacing   here")).toDF("doc_id", "text")
    val v2 = Seq((0L, "same text"), (1L, "has changed"), (4L, "brand new"),
      (3L, "spacing here")).toDF("doc_id", "text")
    val out = Corpus.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(0L -> "unchanged", 1L -> "changed", 2L -> "removed",
      4L -> "added", 3L -> "unchanged")) // fp normalizes whitespace
  }

  test("hashSplit: exhaustive, disjoint, proportional — globally and per stratum") {
    val d = (0L until 4000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val s = Corpus.hashSplit(d, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.count() === 4000L)                        // exhaustive
    val byn = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byn.keySet === Set("train", "val", "test")) // disjoint labels only
    assert(math.abs(byn("train") - 3200L) < 150, byn.toString)
    assert(math.abs(byn("val") - 400L) < 80, byn.toString)
    // stratification for free: per-source train share ≈ 0.8
    val perSrc = s.filter($"split" === "train").groupBy("source").count()
      .collect().map(r => r.getLong(1))
    perSrc.foreach(n => assert(math.abs(n - 800L) < 80, perSrc.toSeq))
    // reproducible
    val again = Corpus.hashSplit(d, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.join(again.withColumnRenamed("split", "s2"), "doc_id")
      .filter($"split" =!= $"s2").count() === 0L)
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Corpus.hashSplit(d, Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("sourceReport: hand-computed per-source stats") {
    val d = Seq(
      (0L, "the cat sat.", "en", "s1"),
      (1L, "a dog ran", "en", "s1"),
      (2L, "un chat", "fr", "s2")).toDF("doc_id", "text", "lang", "source")
    val r = Corpus.sourceReport(d).collect()
      .map(x => x.getString(0) -> x).toMap
    val s1 = r("s1")
    assert(s1.getAs[Long]("n_docs") === 2L)
    assert(s1.getAs[Long]("total_tokens") === 6L)
    assert(s1.getAs[Double]("mean_tokens") === 3.0)
    assert(s1.getAs[Long]("n_langs") === 1L)
    assert(s1.getAs[Long]("vocab") === 6L)  // 'sat.' keeps its dot
    assert(r("s2").getAs[Long]("vocab") === 2L)
    // mean quality matches the per-doc operator's mean exactly
    val exp = d.filter($"source" === "s1")
      .select(TextStats.qualityScore($"text").as("q"))
      .collect().map(_.getDouble(0)).sum / 2
    assert(math.abs(s1.getAs[Double]("mean_quality") - exp) < 1e-6)
  }

  test("mixtureRates: budget shares to rates; undersupplied source caps at 1") {
    val tok = Seq(("a", 1000L), ("b", 10000L), ("c", 500L))
      .toDF("source", "total_tokens")
    val r = Corpus.mixtureRates(tok, Map("a" -> 0.5, "b" -> 0.5), 4000)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Double]("rate"), x.getAs[Long]("expected_tokens"))).toMap
    assert(r("a") === ((1.0, 1000L)))    // 2000 wanted > 1000 available
    assert(r("b") === ((0.2, 2000L)))    // 2000 / 10000
    assert(r("c") === ((0.0, 0L)))       // no target share
    intercept[IllegalArgumentException] {
      Corpus.mixtureRates(tok, Map("a" -> 0.5, "b" -> 0.4), 100)
    }
  }

  test("doremiRound: weights sum to 1, zero excess gives the uniform " +
    "mixture, planted excess wins, smoothing floors every domain") {
    def run(rows: Seq[(String, Double, Double)], smooth: Double = 0.2) = {
      val out = Corpus.doremiRound(
        rows.toDF("source", "proxy_loss", "ref_loss"),
        "source", "proxy_loss", "ref_loss", eta = 1.0, smooth = smooth)
        .collect()
      graft.engine.TrackedCache.release()
      out.map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("excess_loss"), r.getAs[Double]("weight")))
        .toMap
    }
    // proxy never exceeds reference ⇒ zero excess everywhere ⇒
    // the MW update is a no-op: exactly the uniform mixture
    val calm = Seq(("a", 1.0, 2.0), ("a", 0.5, 0.5), ("b", 1.0, 1.5),
      ("c", 2.0, 2.0), ("c", 0.1, 0.2))
    val u = run(calm)
    assert(u.size === 3)
    assert(u.values.forall { case (ex, w) =>
      ex == 0.0 && math.abs(w - 1.0 / 3) < 1e-6 })
    // planted excess in domain b ⇒ largest weight; sum stays 1
    val hot = Seq(("a", 1.0, 1.0), ("a", 1.2, 1.1), ("b", 3.0, 1.0),
      ("b", 2.5, 1.0), ("c", 1.05, 1.0))
    val h = run(hot)
    assert(h("b")._2 > h("a")._2 && h("b")._2 > h("c")._2)
    assert(math.abs(h.values.map(_._2).sum - 1.0) < 5e-6)
    // smoothing floors: every weight >= eps/|D|
    assert(h.values.forall(_._2 >= 0.2 / 3 - 1e-9))
    // smooth = 0: pure MW normalization still sums to 1
    val h0 = run(hot, smooth = 0.0)
    assert(math.abs(h0.values.map(_._2).sum - 1.0) < 5e-6)
  }

  test("doremiRound: softmax shift invariance and no BIGINT overflow " +
    "on huge clipped excess (max-normalized scores live in (0, 1])") {
    def run(rows: Seq[(String, Double, Double)]) = {
      val out = Corpus.doremiRound(
        rows.toDF("source", "proxy_loss", "ref_loss"),
        "source", "proxy_loss", "ref_loss", eta = 1.0, smooth = 0.0)
        .collect()
      graft.engine.TrackedCache.release()
      out.map(r => r.getAs[String]("source") ->
        r.getAs[Double]("weight")).toMap
    }
    // adding a constant to every domain's excess must not move the
    // weights (the normalization identity the shift form relies on)
    val base = Seq(("a", 2.0, 1.0), ("b", 3.5, 1.0), ("c", 1.2, 1.0))
    val shifted = base.map { case (d, p, r) => (d, p + 7.0, r) }
    val w0 = run(base)
    val w1 = run(shifted)
    assert(w0.keySet === w1.keySet &&
      w0.forall { case (d, w) => math.abs(w - w1(d)) <= 2e-6 },
      s"shift must be a weight no-op: $w0 vs $w1")
    // eta·excess = 80 nats: exp(80)·1e9 would saturate BIGINT and
    // collapse large domains to identical garbage; max-normalized it
    // is exact — the hot domain takes ~all mass, the weights are
    // finite and sum to 1
    val huge = Seq(("a", 81.0, 1.0), ("b", 41.0, 1.0), ("c", 1.0, 1.0))
    val w = run(huge)
    assert(math.abs(w.values.sum - 1.0) < 5e-6, s"sum(w) != 1: $w")
    assert(w("a") > 0.999999 && w("b") >= 0.0 && w("c") >= 0.0, s"$w")
    // NaN / infinite losses drop instead of quantizing to a silent
    // zero-excess example (greatest(NaN, 0) is NaN; cast → 0)
    val nf = Corpus.doremiRound(
      Seq(("a", 2.0, 1.0), ("a", Double.NaN, 1.0),
        ("a", 1.0, Double.PositiveInfinity), ("b", 1.5, 1.0))
        .toDF("source", "proxy_loss", "ref_loss"),
      "source", "proxy_loss", "ref_loss", eta = 1.0, smooth = 0.0)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("n_examples")).toMap
    graft.engine.TrackedCache.release()
    assert(nf === Map("a" -> 1L, "b" -> 1L), s"$nf")
  }

  test("negativeSamples: k per anchor, never self, in-range, deterministic") {
    val d = (0L until 20L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val s1 = Corpus.negativeSamples(d, k = 3, nDocs = 20).collect()
    assert(s1.length === 60)
    s1.foreach { r =>
      val (a, neg) = (r.getLong(0), r.getLong(2))
      assert(neg != a, s"self-negative for $a")
      assert(neg >= 0 && neg < 20)
      assert(r.getAs[String]("neg_source") === s"src${neg % 3}")
    }
    val s2 = Corpus.negativeSamples(d, k = 3, nDocs = 20).collect()
    assert(s1.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ===
      s2.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("weightedSampleES: deterministic, weight-tilted, keys in (0,1]") {
    val docs = (0L until 200L)
      .map(i => (i, if (i < 100) 1000.0 else 1.0)).toDF("doc_id", "w")
    val s1 = Corpus.weightedSampleES(docs, "w", k = 20).collect()
    val s2 = Corpus.weightedSampleES(docs, "w", k = 20).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq)
    assert(s1.length === 20)
    s1.foreach { r =>
      val key = r.getAs[Double]("es_key")
      assert(key > 0.0 && key <= 1.0)
    }
    // u^(1/1000) ≈ 1 ≫ u^(1/1): the heavy half dominates the sample
    val heavy = s1.count(_.getLong(0) < 100L)
    assert(heavy >= 18, s"only $heavy/20 heavy-weight rows sampled")
  }

  test("quantileNormalize: rank fractions per group, singleton → 0") {
    val df = Seq(
      (1L, "g1", 10.0), (2L, "g1", 30.0), (3L, "g1", 20.0),
      (4L, "g2", 5.0)).toDF("doc_id", "grp", "v")
    val q = Corpus.quantileNormalize(df, "v", "grp")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("qnorm")).toMap
    assert(q(1L) === 0.0 && q(3L) === 0.5 && q(2L) === 1.0)
    assert(q(4L) === 0.0)
  }

  test("temperatureShares: α=1 is the natural mix; lower α flattens it") {
    val tok = Seq(("big", 9000L), ("small", 1000L)).toDF("source", "total_tokens")
    val natural = Corpus.temperatureShares(tok, alpha = 1.0, budgetTokens = 1000)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("share")).toMap
    assert(math.abs(natural("big") - 0.9) < 1e-6)
    assert(math.abs(natural("small") - 0.1) < 1e-6)
    val flat = Corpus.temperatureShares(tok, alpha = 0.5, budgetTokens = 1000)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("share")).toMap
    // √0.9 : √0.1 = 3 : 1 — the small source is up-sampled 0.1 → 0.25
    assert(math.abs(flat("big") - 0.75) < 1e-6)
    assert(math.abs(flat("small") - 0.25) < 1e-6)
    assert(math.abs(flat.values.sum - 1.0) < 1e-5)
    intercept[IllegalArgumentException] {
      Corpus.temperatureShares(tok, alpha = 0.0, budgetTokens = 1000)
    }
  }

  test("curriculumEpochs: equal-count epochs, quality-monotone boundaries") {
    // 3 clean long docs, 3 punctuation-junk docs, 3 mid: quality
    // separates them; 9 docs / 3 epochs
    val docs = (
      (1 to 3).map(i => (i.toLong, ("the clear and useful words " * 10).trim)) ++
      (4 to 6).map(i => (i.toLong, "a b.. c!! d;; e,, f:: g?? h.. i!! j;;")) ++
      (7 to 9).map(i => (i.toLong, "the plain short note"))
    ).toDF("doc_id", "text")
    val ep = Corpus.curriculumEpochs(docs, nEpochs = 3).collect()
      .sortBy(_.getAs[Long]("epoch"))
    assert(ep.length === 3)
    assert(ep.forall(_.getAs[Long]("n_docs") === 3L))
    // cleanest-first: epoch boundaries never interleave quality
    ep.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("q_lo") >= b.getAs[Double]("q_hi"))
    }
    // the junk block has strictly lower quality than the clean block
    assert(ep.head.getAs[Double]("q_lo") > ep.last.getAs[Double]("q_hi"))
    // token payload: totals add up across epochs
    val totalToks = ep.map(_.getAs[Long]("n_tokens")).sum
    val expected = docs.select(org.apache.spark.sql.functions.sum(
      graft.ext.TextStats.tokenCount(org.apache.spark.sql.functions.col("text"))))
      .head().getLong(0)
    assert(totalToks === expected)
  }

  // ——— ngramNovelty ———

  private val threeWay = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("ngramNovelty: identical text everywhere → zero novelty") {
    val docs = (1L to 300L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(docs, n = 3, threeWay).collect()
    assert(out.nonEmpty) // both held-out splits populated at n=300
    out.foreach { r =>
      assert(r.getAs[Long]("n_novel") === 0L)
      assert(r.getAs[Double]("novelty_rate") === 0.0)
    }
  }

  test("ngramNovelty: per-doc-unique text → full novelty") {
    val docs = (1L to 300L).map(i =>
      (i, s"tok${i}a tok${i}b tok${i}c tok${i}d")).toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(docs, n = 3, threeWay).collect()
    assert(out.map(_.getAs[String]("split")).toSet === Set("val", "test"))
    out.foreach(r => assert(r.getAs[Double]("novelty_rate") === 1.0))
  }

  test("ngramNovelty: differential against a local set-ops replay") {
    val texts = Seq("a b c d", "b c d e", "x y z w", "a b c q")
    val docs = (1L to 120L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    val splitOf = Corpus.hashSplit(docs.select("doc_id"), threeWay)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val bySplit = (1L to 120L).groupBy(splitOf)
      .map { case (s, ids) =>
        s -> ids.flatMap(i => grams(texts((i % 4).toInt))).toSet }
    val train = bySplit.getOrElse("train", Set.empty)
    val out = Corpus.ngramNovelty(docs, n = 3, threeWay).collect()
    out.foreach { r =>
      val s = r.getAs[String]("split")
      val expected = bySplit(s)
      assert(r.getAs[Long]("n_ngrams") === expected.size.toLong)
      assert(r.getAs[Long]("n_novel") === expected.diff(train).size.toLong)
    }
  }

  test("universeSample: deterministic, monotone in rate, roughly calibrated") {
    val df = (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
    val s10 = Corpus.universeSample(df, "k", 0.1)
    val s30 = Corpus.universeSample(df, "k", 0.3)
    val kept10 = s10.select("k").as[Long].collect().toSet
    val kept30 = s30.select("k").as[Long].collect().toSet
    // same coin → deterministic and nested: rate 0.1 keys ⊂ rate 0.3 keys
    assert(Corpus.universeSample(df, "k", 0.1)
      .select("k").as[Long].collect().toSet === kept10)
    assert(kept10.subsetOf(kept30))
    assert(math.abs(kept10.size / 4000.0 - 0.1) < 0.03)
    assert(math.abs(kept30.size / 4000.0 - 0.3) < 0.03)
  }

  test("universeSample: join-consistent — sampled join == join of samples") {
    val parent = (1L to 500L).map(i => (i, i % 7)).toDF("k", "p")
    val child = (1L to 500L).flatMap(i => Seq((i, "a"), (i, "b")))
      .toDF("k", "c")
    val sp = Corpus.universeSample(parent, "k", 0.2)
    val sc = Corpus.universeSample(child, "k", 0.2)
    // every sampled child row finds its sampled parent (no orphans)
    assert(sc.join(sp, Seq("k"), "left_anti").count() === 0L)
    assert(sp.join(sc, Seq("k"), "left_anti").count() === 0L)
    // and the sampled join is exactly the key-filtered full join
    val keys = sp.select("k").as[Long].collect().toSet
    assert(sc.count() === 2L * keys.size)
  }

  test("universeSample: rejects a rate outside (0,1]") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException](Corpus.universeSample(df, "k", 0.0))
    intercept[IllegalArgumentException](Corpus.universeSample(df, "k", 1.5))
  }

  test("epochShuffle: each epoch is a full permutation and epochs differ") {
    val docs = (0L until 97L).toDF("doc_id")
    val out = Corpus.epochShuffle(docs, nEpochs = 3).collect()
      .groupBy(_.getLong(0))
    assert(out.keySet === Set(1L, 2L, 3L))
    out.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to 97L))
      assert(rows.map(_.getLong(2)).toSet === (0L until 97L).toSet)
    }
    val order = (e: Long) => out(e).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(order(1L) !== order(2L), "epochs must permute differently")
  }

  test("epochShuffle: bucket-offset ranking equals the global ROW_NUMBER") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 211L).toDF("doc_id")
    val got = Corpus.epochShuffle(docs, nEpochs = 2)
      .orderBy("epoch", "rank").collect().map(r => (r.getLong(0), r.getLong(2)))
    val w = Window.partitionBy("epoch").orderBy(
      md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))), col("doc_id"))
    val want = docs.crossJoin(spark.range(1, 3).select(col("id").as("epoch")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .orderBy("epoch", "rank").collect().map(r => (r.getLong(1), r.getLong(0)))
    assert(got.toSeq === want.toSeq)
    // and the order is partition-layout-invariant
    val re = Corpus.epochShuffle(docs.repartition(13), nEpochs = 2)
      .orderBy("epoch", "rank").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(re.toSeq === got.toSeq)
  }

  test("leakageSafeSplit: dup clusters never straddle; doc counts conserved") {
    import spark.implicits._
    // 40 distinct texts, each duplicated under 3 different doc_ids
    // (whitespace variants normalize to the same fingerprint)
    val rows = (0 until 40).flatMap { i =>
      val base = s"alpha beta text body $i"
      Seq((i * 3L, base), (i * 3L + 1, base.replace(" ", "  ")),
        (i * 3L + 2, base.replace(" ", "\t")))
    }
    val docs = rows.toDF("doc_id", "text")
    val out = Corpus.leakageSafeSplit(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 120L)
    assert(out.map(_.getAs[Long]("n_clusters")).sum === 40L)
    // the invariant this operator exists for
    out.foreach(r => assert(r.getAs[Long]("leaked_clusters") === 0L))
    // every doc sits in a 3-copy cluster
    assert(out.map(_.getAs[Long]("n_dup_docs")).sum === 120L)
    // the doc-id coin would have split most 3-copy clusters
    assert(out.head.getAs[Long]("id_coin_leaked") > 0L)
  }

  test("leakageSafeSplit: no dups → both coins leak nothing, all clusters singleton") {
    import spark.implicits._
    val docs = (0 until 60).map(i => (i.toLong, s"unique doc $i payload"))
      .toDF("doc_id", "text")
    val out = Corpus.leakageSafeSplit(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 60L)
    assert(out.map(_.getAs[Long]("n_dup_docs")).sum === 0L)
    out.foreach { r =>
      assert(r.getAs[Long]("leaked_clusters") === 0L)
      assert(r.getAs[Long]("id_coin_leaked") === 0L)
    }
  }

  test("fingerprintManifest: root = xor of shards; a one-row edit flips only its shard + root") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"content of document $i"))
      .toDF("doc_id", "text")
    val m1 = Corpus.fingerprintManifest(docs, shards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m1.keySet === ((-1L) +: (0L until 8L)).toSet)
    assert(m1(-1L)._1 === 40L)
    // root digest is the xor of the shard digests
    val xored = (0L until 8L).map(m1(_)._2).reduce(_ ^ _)
    assert(m1(-1L)._2 === xored)
    // edit one row: exactly its shard's digest and the root change
    val docs2 = docs.withColumn("text",
      when(col("doc_id") === 11L, lit("TAMPERED")).otherwise(col("text")))
    val m2 = Corpus.fingerprintManifest(docs2, shards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (sh <- 0L until 8L) {
      if (sh == 11L % 8L) assert(m2(sh)._2 !== m1(sh)._2, "edited shard must flip")
      else assert(m2(sh) === m1(sh), s"untouched shard $sh changed")
    }
    assert(m2(-1L)._2 !== m1(-1L)._2)
    // deletion changes the count too
    val m3 = Corpus.fingerprintManifest(docs.filter(col("doc_id") =!= 3L),
      shards = 8).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m3(3L % 8L) === m1(3L % 8L)._1 - 1)
    assert(m3(-1L) === 39L)
  }

  test("manifestDiff: identical manifests show no change; a one-row edit flags its shard + root only") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val m = Corpus.fingerprintManifest(docs, shards = 4)
    val same = Corpus.manifestDiff(m, Corpus.fingerprintManifest(docs, shards = 4))
      .collect()
    assert(same.forall(!_.getAs[Boolean]("changed")))
    val edited = docs.withColumn("text",
      when(col("doc_id") === 9L, lit("EDITED")).otherwise(col("text")))
    val diff = Corpus.manifestDiff(m,
        Corpus.fingerprintManifest(edited, shards = 4)).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("changed")).toMap
    assert(diff === Map(-1L -> true, 0L -> false, 1L -> true,
      2L -> false, 3L -> false))
  }

  test("paddingWasteAudit: exact bucket arithmetic per scheme") {
    import spark.implicits._
    // token counts 1, 17, 64, 100 (whitespace tokens)
    val docsDf = Seq(
      (1L, "t1"), // 1 token
      (2L, (1 to 17).map(i => s"w$i").mkString(" ")), // 17
      (3L, (1 to 64).map(i => s"w$i").mkString(" ")), // 64
      (4L, (1 to 100).map(i => s"w$i").mkString(" ")) // 100
    ).toDF("doc_id", "text")
    val out = Corpus.paddingWasteAudit(docsDf).collect()
      .map(r => r.getAs[String]("scheme") ->
        (r.getAs[Long]("tokens_real"), r.getAs[Long]("tokens_padded"))).toMap
    // pow2: max(16,1)=16, 17→32, 64→64, 100→128 ⇒ 240
    assert(out("pow2") === ((182L, 240L)))
    // fixed64: 64+64+64+128 = 320
    assert(out("fixed64") === ((182L, 320L)))
    // pad-to-max: 4 × 100
    assert(out("global_max") === ((182L, 400L)))
  }

  test("purgedTimeSplit: embargo rows purged, cross-boundary entities " +
    "reported, purged-only entities excluded from the denominator") {
    import spark.implicits._
    val ev = Seq(
      ("D", 0L), ("D", 10000000L), // span anchors; D crosses → leaky
      ("A", 1000000L), ("A", 8000000L), // leaky
      ("B", 2000000L), // train only
      ("C", 6500000L) // inside [6e6, 7e6) → purged
    ).toDF("user_id", "us")
      .select(col("user_id"), lit("x").as("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val r = Corpus.purgedTimeSplit(ev, splitFrac = 0.7,
      embargoUs = 1000000L).head()
    assert(r.getAs[Long]("n_train") === 3L)
    assert(r.getAs[Long]("n_purged") === 1L)
    assert(r.getAs[Long]("n_test") === 2L)
    assert(r.getAs[Long]("n_entities") === 3L) // C is purged-only
    assert(r.getAs[Long]("n_leaky_entities") === 2L)
    assert(r.getAs[Double]("leaky_frac") === 0.666667)
  }

  test("trainingShuffleShards: deterministic replay, seed sensitivity, " +
    "conservation and skew arithmetic") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, s"tok${i % 7} " * ((i % 5 + 1).toInt)))
      .toDF("doc_id", "text")
    val a = Corpus.trainingShuffleShards(d, nShards = 4, seed = "e1").collect()
    val b = Corpus.trainingShuffleShards(d, nShards = 4, seed = "e1").collect()
    // byte-for-byte replay: same seed → identical audit incl. witnesses
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // a different seed reshuffles: SOME witness key must move
    val c = Corpus.trainingShuffleShards(d, nShards = 4, seed = "e2").collect()
    assert(a.map(_.getAs[String]("first_key")).toSet !==
      c.map(_.getAs[String]("first_key")).toSet)
    // conservation: docs and tokens partition the corpus
    assert(a.map(_.getAs[Long]("n_docs")).sum === 200L)
    val totalToks = a.map(_.getAs[Long]("n_tokens")).sum
    // trailing "  " after repetition: split("\\s+") of "x " is ["x", ""]
    // → tokenCount counts the empty tail, mirroring the oracle; just
    // assert conservation against a direct recount
    val direct = d.select(org.apache.spark.sql.functions.sum(
      graft.ext.TextStats.tokenCount(col("text")))).head().getLong(0)
    assert(totalToks === direct)
    // skew = share × nShards, row-wise exactly (same rounding)
    a.foreach { r =>
      val share = r.getAs[Double]("token_share")
      val skew = r.getAs[Double]("skew")
      val expected = BigDecimal(r.getAs[Long]("n_tokens").toDouble * 4 /
        totalToks.toDouble).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(skew === expected)
      assert(math.abs(skew - share * 4) < 5e-6)
    }
  }

  test("budgetWaterfill: pivot arithmetic, small sources untrimmed, " +
    "degenerate budgets") {
    import spark.implicits._
    // masses A=10, B=20, C=70; budget 60% of 100 = 60 → level 30:
    // A and B keep everything, C trims to 30 — allocations sum to 60
    def corpus(rows: (String, Int)*) = rows.toSeq.flatMap { case (s, n) =>
      (1 to n).map(i => (s, "w")) }.zipWithIndex
      .map { case ((s, w), i) => (i.toLong, s, w) }
      .toDF("doc_id", "source", "text")
    val d = corpus(("A", 10), ("B", 20), ("C", 70))
    val out = Corpus.budgetWaterfill(d, budgetFrac = 0.6).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("allocation") === 10L)
    assert(out("B").getAs[Long]("allocation") === 20L)
    assert(out("C").getAs[Long]("allocation") === 30L)
    assert(out("C").getAs[Long]("cap") === 30L)
    assert(out("C").getAs[Long]("trimmed") === 40L)
    assert(out("C").getAs[Double]("trim_frac") === 0.571429)
    assert(out.values.map(_.getAs[Long]("allocation")).sum === 60L)
    // budget covers everything → NULL level, nothing trimmed
    val full = Corpus.budgetWaterfill(d, budgetFrac = 1.0).collect()
    assert(full.forall(_.getAs[Long]("trimmed") === 0L))
    assert(full.forall(_.isNullAt(full.head.fieldIndex("cap"))))
    // budget below even a uniform floor: cap = B div n
    val tight = Corpus.budgetWaterfill(d, budgetFrac = 0.2).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("allocation")).toMap
    assert(tight === Map("A" -> 6L, "B" -> 6L, "C" -> 6L)) // 20 div 3
  }

  test("packingContamination: hand pair accounting per pack, " +
    "single-token pack yields null ratio") {
    import spark.implicits._
    // lang x, budget 5: docs of 3/2/4 tokens pack as [3,2] + [4]
    val d = Seq((1L, "x", "a b c"), (2L, "x", "d e"),
      (3L, "x", "f g h i")).toDF("doc_id", "lang", "text")
    val r = Corpus.packingContamination(d, budget = 5L).head()
    assert(r.getAs[Long]("n_packs") === 2L)
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_tokens") === 9L)
    // pack [3,2]: cross = 2×3 = 6, total = 5·4/2 = 10
    // pack [4]:   cross = 0,     total = 4·3/2 = 6
    assert(r.getAs[Long]("cross_pairs") === 6L)
    assert(r.getAs[Long]("total_pairs") === 16L)
    assert(r.getAs[Double]("contamination") === 0.375)
    // a lone 1-token doc: zero pairs → NULL, not a division crash
    val solo = Seq((1L, "y", "tok")).toDF("doc_id", "lang", "text")
    val sr = Corpus.packingContamination(solo, budget = 5L).head()
    assert(sr.getAs[Long]("total_pairs") === 0L)
    assert(sr.isNullAt(sr.fieldIndex("contamination")))
  }

  test("domainFrequencyCap: cap binds per domain, conservation, " +
    "deterministic replay and seed sensitivity") {
    import spark.implicits._
    // domain A: 10 docs, B: 3 docs, C: 1 doc — cap 3
    val d = ((0L until 10L).map(i => (i, "A", s"w$i x y")) ++
      Seq((20L, "B", "a b"), (21L, "B", "c"), (22L, "B", "d e f")) ++
      Seq((30L, "C", "solo"))).toDF("doc_id", "source", "text")
    val out = Corpus.domainFrequencyCap(d, cap = 3, seed = "s1").collect()
      .map(r => r.getAs[String]("domain") -> r).toMap
    assert(out("A").getAs[Long]("n_kept") === 3L)
    assert(out("A").getAs[Long]("n_dropped") === 7L)
    assert(out("B").getAs[Long]("n_kept") === 3L)
    assert(out("B").getAs[Long]("n_dropped") === 0L)
    assert(out("C").getAs[Long]("n_kept") === 1L)
    // conservation: kept+dropped tokens = direct recount per domain
    for (dom <- Seq("A", "B", "C")) {
      val direct = d.filter(col("source") === dom)
        .select(sum(graft.ext.TextStats.tokenCount(col("text"))))
        .head().getLong(0)
      assert(out(dom).getAs[Long]("tokens_kept") +
        out(dom).getAs[Long]("tokens_dropped") === direct)
    }
    // replay: same seed → identical audit; different seed must keep a
    // different subset of A's docs (token counts differ with p≈1 —
    // every doc i has a distinct token count? no: all A docs have 3
    // tokens, so compare via the kept-set indirectly: rerun with
    // distinct per-doc token counts)
    val varied = (0L until 10L)
      .map(i => (i, "A", (0L to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val a1 = Corpus.domainFrequencyCap(varied, cap = 3, seed = "s1").collect()
    val a2 = Corpus.domainFrequencyCap(varied, cap = 3, seed = "s1").collect()
    assert(a1.map(_.toSeq).toSeq === a2.map(_.toSeq).toSeq)
    val b1 = Corpus.domainFrequencyCap(varied, cap = 3, seed = "s2").head()
    // distinct per-doc token counts (1..10) → a different kept subset
    // shows up as a different kept-token sum (verified for these seeds)
    assert(b1.getAs[Long]("tokens_kept") !==
      a1.head.getAs[Long]("tokens_kept"))
    assert(b1.getAs[Long]("n_kept") === 3L)
  }

  test("ipfRake: marginals converge to uniform, mass is preserved, " +
    "zero cells stay zero, and the run is deterministic") {
    import spark.implicits._
    // skewed 2×3 table with one structural zero: (b, z) never occurs
    val rows = Seq.fill(60)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(6)(("a", "z")) ++ Seq.fill(2)(("b", "x")) ++
      Seq.fill(2)(("b", "y"))
    val docsDf = rows.zipWithIndex
      .map { case ((r, c), i) => (i.toLong, r, c) }
      .toDF("doc_id", "lang", "source")
    val out = Corpus.ipfRake(docsDf, "lang", "source", iterations = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("raked_docs"),
          r.getAs[Double]("rate"))).toMap
    val total = rows.size.toDouble
    // (b, z) is absent from the input → absent from the output (IPF
    // cannot invent mass); all 5 observed cells present
    assert(out.size === 5 && !out.contains(("b", "z")))
    // total mass preserved within micro-grid rounding
    val mass = out.values.map(_._2).sum
    assert(math.abs(mass - total) < 1e-2, s"mass drifted: $mass")
    // row marginals → total/2 each, col marginals → total/3 each
    // (16 iterations is deep convergence for a 2×3 table with a zero)
    for (r <- Seq("a", "b")) {
      val m = out.collect { case ((`r`, _), v) => v._2 }.sum
      assert(math.abs(m - total / 2) < 0.05, s"row $r marginal $m")
    }
    for (c <- Seq("x", "y", "z")) {
      val m = out.collect { case ((_, `c`), v) => v._2 }.sum
      assert(math.abs(m - total / 3) < 0.05, s"col $c marginal $m")
    }
    // rate = raked/observed
    out.foreach { case (k, (n, raked, rate)) =>
      assert(math.abs(rate - raked / n) < 1e-5, s"$k rate") }
    // deterministic: a second run is bit-identical
    val again = Corpus.ipfRake(docsDf, "lang", "source", iterations = 16)
      .collect().map(_.toSeq)
    assert(again.toSeq === Corpus.ipfRake(docsDf, "lang", "source",
      iterations = 16).collect().map(_.toSeq).toSeq)
  }
}
