package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                   // exact dup of 0
    (2L, base.replace("today", "tomorrow")),      // near dup of 0
    (3L, "completely different content about spark catalyst optimizer rules engine")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length === 3)
    val dup = g.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper") === 0L)
  }

  test("ngram jaccard finds the near-dup pair and not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))  // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 2L)))  // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment catches a quote Jaccard misses; directions are exact") {
    val long = (1 to 200).map(i => s"w$i").mkString(" ")
    val quote = (50 to 60).map(i => s"w$i").mkString(" ")
    val cdocs = Seq((0L, long), (1L, quote), (2L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    // every shingle of the quote is in the long doc → cont(quote)=1.0,
    // while Jaccard = 9/198 ≈ 0.045 stays under any useful threshold
    val cont = Dedup.containmentPairs(cdocs, n = 3, minContainment = 0.9,
        maxDf = None).collect()
    assert(cont.length === 1)
    val r = cont.head
    assert((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) === (0L, 1L))
    assert(r.getAs[Double]("cont_b") === 1.0)      // quote ⊆ long doc
    assert(r.getAs[Double]("cont_a") < 0.1)
    val jac = Dedup.ngramJaccardPairs(cdocs, n = 3, minJaccard = 0.5,
      maxDf = None).count()
    assert(jac === 0L)
    // default is capped, like ngramJaccardPairs
    assert(Dedup.containmentPairs(cdocs, n = 3, minContainment = 0.9)
      .columns.toSeq === Seq("id_a", "id_b", "cont_a", "cont_b"))
  }

  test("audit: LSH recall/precision confusion counts are exact") {
    val a = Dedup.auditLshRecall(docs).head()
    // three true pairs: (0,1) exact, (0,2) near, and (1,2) — both
    // being near-dups of 0 makes them near each other
    assert(a.getAs[Long]("n_true") === 3L)
    val hit = a.getAs[Long]("n_hit")
    assert(hit >= 2L && hit <= 3L)
    assert(a.getAs[Double]("recall") ===
      math.round(hit.toDouble / 3L * 1e6) / 1e6)
    assert(a.getAs[Long]("n_cand") >= hit)
    assert(a.getAs[Double]("cand_precision") > 0.0)
  }

  test("decontamination flags the leaked doc, spares clean ones, and applies") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val evalSet = Seq((100L, benchText)).toDF("eval_id", "text")
    val corpus = Seq(
      (0L, s"prefix words then $benchText and a suffix"), // leaked verbatim
      (1L, "completely different content with no overlap at all"),
      (2L, "alpha beta only shares two tokens one shingle")
    ).toDF("doc_id", "text")
    val pairs = Dedup.contaminationPairs(corpus, evalSet, n = 3,
      minShared = 5L, maxDf = None)
    val flagged = pairs.select("doc_id").as[Long].collect().toSet
    assert(flagged === Set(0L))
    assert(pairs.head().getAs[Long]("n_shared") >= 8L) // the bench's 8 shingles
    val clean = Dedup.applyDecontamination(corpus, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(1L, 2L))
  }

  test("minhash LSH candidates contain the true near-dups") {
    val cands = Dedup.minhashCandidates(docs, n = 3, k = 32, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 1L)))
    assert(cands.contains((0L, 2L)))
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("applyNearDedup keeps the earliest member of each dup pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
    val kept = Dedup.applyNearDedup(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 3L)) // 1 and 2 are dups of 0; 3 unrelated
  }

  test("nearDupClusters: transitive chains collapse to the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 4L), (7L, 8L), (3L, 9L))
      .toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) === 1L && clusters(2L) === 1L &&
      clusters(3L) === 1L && clusters(9L) === 1L) // chain 1-2-3-9
    assert(clusters(4L) === 4L && clusters(5L) === 4L)
    assert(clusters(7L) === 7L && clusters(8L) === 7L)
  }

  test("nearDupClusters: a 40-deep chain converges within maxIter=15 (pointer jumping)") {
    // plain min-label propagation moves one hop per iteration — a
    // diameter-40 chain would raise at the 15-iteration backstop;
    // pointer jumping makes it ~4 + log2(40) iterations
    val chain = (0L until 40L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(clusters.size === 40)
    assert(clusters.values.toSet === Set(0L))
  }

  test("nearDupClusters: convergence on an UNCHECKED round (batched " +
    "convergence counts) still terminates with exact labels") {
    // the r18 optimization batches convergence counts (checked on odd
    // rounds / checkpoint rounds / the last admissible round): a graph
    // stable after round 0 — star 1-{2,3} plus pair 5-6 — is detected
    // at the round-1 check, and the extra no-op propagation round
    // leaves the labels byte-identical (min-label monotonicity)
    val pairs = Seq((1L, 2L), (1L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs, maxIter = 2)
      .as[(Long, Long)].collect().toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L))
  }

  test("simhash: identical texts collide; near-dups are Hamming-close") {
    val sh = docs.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) === sh(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)))
    assert(hamming(sh(0L), sh(2L)) <= 8)
  }

  test("portable simhash family agrees with the native family's structure") {
    val native = docs.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    val portable = Dedup.simhashPortableSig(docs)
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // identical texts collide in BOTH families
    assert(portable(0L) === portable(1L))
    // both families order the near-dup below the unrelated doc
    assert(hamming(portable(0L), portable(2L)) < hamming(portable(0L), portable(3L)))
    assert(hamming(native(0L), native(2L)) < hamming(native(0L), native(3L)))
    // 60-bit domain respected
    portable.values.foreach(s => assert(s >= 0 && s < (1L << 60)))
  }

  test("maxDf cap drops only high-frequency shingles; capped pairs ⊆ uncapped") {
    // every doc shares the shingle-rich base → a tiny cap kills the
    // common shingles, a huge cap is a no-op
    val uncapped = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5,
      maxDf = None)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bigCap = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5,
      maxDf = Some(1000L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bigCap === uncapped) // cap above every df is the identity
    val tinyCap = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5,
      maxDf = Some(1L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // df ≤ 1 shingles are unshared by definition → no intersections
    assert(tinyCap.isEmpty)
  }

  test("ngramJaccardPairs is capped BY DEFAULT (quadratic path is opt-in)") {
    // pin the signature itself: the compiler-generated default for
    // the maxDf parameter must be Some(DefaultMaxDf), so the
    // dangerous uncapped shape requires writing `maxDf = None`
    val default = Dedup.getClass.getMethods
      .find(_.getName == "ngramJaccardPairs$default$6").get // param 6 = maxDf
      .invoke(Dedup)
    assert(default === Some(Dedup.DefaultMaxDf))
  }

  test("incremental dedup finds the shard's near-dups in the index") {
    // shard = doc 2 (near-dup of 0/1); index = 0, 1, 3
    val shard = docs.filter($"doc_id" === 2L)
    val corpus = docs.filter($"doc_id" =!= 2L)
    val index = Dedup.buildLshIndex(corpus, n = 3, k = 32, bands = 8)
    val pairs = Dedup.dedupAgainstIndex(shard, index, n = 3, k = 32, bands = 8,
      minJaccard = 0.5)
    val got = pairs.select("id_new", "id_idx").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 0L), (2L, 1L)))
    // jaccard values agree with the full-corpus verified path
    val full = Dedup.minhashVerifiedPairs(docs, n = 3, k = 32, bands = 8,
      minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val inc = pairs.select("id_new", "id_idx", "jaccard")
      .as[(Long, Long, Double)].collect()
    inc.foreach { case (n2, i, j) => assert(full((math.min(n2, i), math.max(n2, i))) === j) }
    // and the admit policy drops the duplicate shard doc
    val kept = Dedup.applyIncrementalDedup(shard, pairs)
      .select("doc_id").as[Long].collect()
    assert(kept.isEmpty)
    // an unrelated shard doc is admitted
    val shard3 = docs.filter($"doc_id" === 3L)
    val index01 = Dedup.buildLshIndex(docs.filter($"doc_id" < 2L), n = 3, k = 32, bands = 8)
    val pairs3 = Dedup.dedupAgainstIndex(shard3, index01, n = 3, k = 32, bands = 8)
    assert(Dedup.applyIncrementalDedup(shard3, pairs3)
      .select("doc_id").as[Long].collect().toSeq === Seq(3L))
  }

  test("LshIndex parquet round-trip: persisted index gives identical pairs") {
    val shard = docs.filter($"doc_id" === 2L)
    val corpus = docs.filter($"doc_id" =!= 2L)
    val index = Dedup.buildLshIndex(corpus, n = 3, k = 32, bands = 8)
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    Dedup.writeLshIndex(index, dir)
    val reloaded = Dedup.readLshIndex(spark, dir)
    val a = Dedup.dedupAgainstIndex(shard, index, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val b = Dedup.dedupAgainstIndex(shard, reloaded, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("dedupAgainstIndex maxBucket: huge cap is identity, cap 1 kills all") {
    val shard = docs.filter($"doc_id" === 2L)
    val index = Dedup.buildLshIndex(docs.filter($"doc_id" =!= 2L))
    val open = Dedup.dedupAgainstIndex(shard, index, maxBucket = None)
      .as[(Long, Long, Double)].collect().toSet
    val big = Dedup.dedupAgainstIndex(shard, index, maxBucket = Some(1000L))
      .as[(Long, Long, Double)].collect().toSet
    assert(big === open && open.nonEmpty)
    // any candidate needs ≥1 member per side → combined ≥ 2 > 1
    val tiny = Dedup.dedupAgainstIndex(shard, index, maxBucket = Some(1L))
      .as[(Long, Long, Double)].collect().toSet
    assert(tiny.isEmpty)
  }

  test("maxBucket cap: huge cap is identity, cap of 1 kills every pair") {
    val uncapped = Dedup.minhashCandidates(docs, n = 3, k = 32, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bigCap = Dedup.minhashCandidates(docs, n = 3, k = 32, bands = 8,
      maxBucket = Some(1000L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bigCap === uncapped)
    val tiny = Dedup.minhashCandidates(docs, n = 3, k = 32, bands = 8,
      maxBucket = Some(1L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // singleton buckets can never produce a pair
    assert(tiny.isEmpty)
  }

  test("minhashVerifiedPairs: exact precision on LSH candidates") {
    val verified = Dedup.minhashVerifiedPairs(docs, n = 3, k = 32, bands = 8,
      minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification is exact → no false positives vs the exact path
    assert(verified.subsetOf(exact))
    // the planted dups survive the LSH gate at k=32/b=8
    assert(verified.contains((0L, 1L)) && verified.contains((0L, 2L)))
    // and the jaccard values agree with the exact path where present
    val vj = Dedup.minhashVerifiedPairs(docs, n = 3, k = 32, bands = 8,
      minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ej = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    vj.foreach { case (k, j) => assert(math.abs(ej(k) - j) < 1e-9) }
  }

  test("LSH index carries its family params; mismatched query refused") {
    val index = Dedup.buildLshIndex(docs, n = 3, k = 32, bands = 8)
    assert(index.params === Some((3, 32, 8)))
    // wrong family must throw, not return garbage candidates
    val e = intercept[IllegalArgumentException](
      Dedup.dedupAgainstIndex(docs, index, n = 3, k = 16, bands = 8))
    assert(e.getMessage.contains("LSH family"))
    // params survive BOTH persisted layouts
    val dir = java.nio.file.Files.createTempDirectory("lshidxp").toString
    Dedup.writeLshIndex(index, dir)
    assert(Dedup.readLshIndex(spark, dir).params === Some((3, 32, 8)))
    Dedup.writeLshIndexBucketed(index, "lshidx_params_rt", buckets = 4)
    assert(Dedup.readLshIndexBucketed(spark, "lshidx_params_rt").params
      === Some((3, 32, 8)))
    // a matching query still works (smoke)
    assert(Dedup.dedupAgainstIndex(docs.limit(3), index,
      n = 3, k = 32, bands = 8).columns.toSeq
      === Seq("id_new", "id_idx", "jaccard"))
  }

  test("appendToLshIndex: the next shard dedups against admitted docs") {
    val d = graft.Tables.load(spark, sf001, "documents")
    val corpus = d.filter(col("doc_id") % 10 < 6)
    val shard1 = d.filter(col("doc_id") % 10 === 7)
    // shard2 = shard1's docs under new ids → near-dups of shard1, and
    // (mostly) not of the original corpus
    val shard2 = shard1.withColumn("doc_id", col("doc_id") + 100000L)
    val index0 = Dedup.buildLshIndex(corpus, n = 3, k = 32, bands = 8)
    val pairs1 = Dedup.dedupAgainstIndex(shard1, index0, n = 3, k = 32, bands = 8)
    val admitted1 = Dedup.applyIncrementalDedup(shard1, pairs1)
    val index1 = Dedup.appendToLshIndex(index0, admitted1)
    assert(index1.params === index0.params)
    // against the EXTENDED index, shard2's copies of admitted docs are
    // caught; against the original index they were not
    val pairs2new = Dedup.dedupAgainstIndex(shard2, index1, n = 3, k = 32, bands = 8)
    val pairs2old = Dedup.dedupAgainstIndex(shard2, index0, n = 3, k = 32, bands = 8)
    val admittedIds = admitted1.select("doc_id").as[Long].collect().toSet
    val caughtVsAdmitted = pairs2new.select("id_new", "id_idx").as[(Long, Long)]
      .collect().filter { case (nw, idx) => admittedIds.contains(idx) &&
        nw - 100000L === idx }
    assert(caughtVsAdmitted.nonEmpty,
      "extended index must catch copies of newly admitted docs")
    assert(pairs2new.count() > pairs2old.count())
  }

  test("simhashPairs equals brute-force Hamming pairs (pigeonhole recall)") {
    // maxHamming=3 < bands=4 ⇒ the banded result must be EXACTLY the
    // all-pairs Hamming-verified set — banding prunes, never misses
    val docs = graft.Tables.load(spark, sf001, "documents")
    val got = Dedup.simhashPairs(docs, maxHamming = 3, bands = 4)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val sigs = Dedup.simhashPortableSig(docs)
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib) -> h.toLong).toMap
    assert(got === brute)
    assert(got.nonEmpty, "corpus has planted near-dups; expected pairs")
    // parameter guards
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, maxHamming = 4, bands = 4))
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, bands = 7))
  }

  test("appendToLshIndex refuses an index without family params") {
    val index = Dedup.buildLshIndex(docs.limit(5), n = 3, k = 32, bands = 8)
    val paramless = index.copy(params = None)
    val e = intercept[IllegalArgumentException](
      Dedup.appendToLshIndex(paramless, docs.limit(2)))
    assert(e.getMessage.contains("family params"),
      "error must say why the append was refused")
  }

  test("dupSpans: shared passage found at ANY offset; islands merge; short docs safe") {
    val passage = "alpha beta gamma delta epsilon"          // 5 tokens
    val d = Seq(
      (0L, s"one two three $passage x y z"),               // passage at pos 3
      (1L, s"$passage p q r s t u"),                       // same passage at pos 0
      (2L, "unrelated words nothing shared here at all eleven twelve"),
      (3L, "tiny doc")                                     // shorter than n
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(d, n = 5, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 0: 11 tokens; only the exact 5-gram at pos 3 is shared
    assert(out(0L) === ((11L, 1L, 5L, 0.454545)))
    assert(out(1L) === ((11L, 1L, 5L, 0.454545)))
    assert(out(2L) === ((9L, 0L, 0L, 0.0)))
    assert(out(3L) === ((2L, 0L, 0L, 0.0)))
  }

  test("dupSpans: overlapping marked grams merge into one maximal island") {
    // two copies of a 7-token passage → with n=5, positions 0..2 are
    // all hot → one island [0, 7), not three separate spans
    val passage = "a b c d e f g"
    val d = Seq((0L, passage), (1L, passage)).toDF("doc_id", "text")
    val out = Dedup.dupSpans(d, n = 5, minCount = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) === ((1L, 7L)))                          // one island, all 7 tokens
  }

  test("dupSpans: within-doc repetition counts toward minCount") {
    // the 3-gram "x y z" occurs twice INSIDE one doc — no other doc
    val d = Seq(
      (0L, "x y z pad pad x y z"),
      (1L, "totally different words here")).toDF("doc_id", "text")
    val out = Dedup.dupSpans(d, n = 3, minCount = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) === 2L)                                  // both occurrences marked
    assert(out(1L) === 0L)
  }

  test("resetManagedTable deletes only real table data") {
    val wh = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")))
    // an unrelated directory that merely shares the table's name must
    // survive a reset (it has no Spark-table layout)
    val bystander = new java.io.File(wh, "graft_reset_bystander")
    bystander.mkdirs()
    val keep = new java.io.File(bystander, "precious.txt")
    java.nio.file.Files.writeString(keep.toPath, "not a table")
    Dedup.resetManagedTable(spark, "graft_reset_bystander")
    assert(keep.exists(), "unrelated same-named dir must not be deleted")

    // a STALE table dir (part- files, no catalog entry — the
    // prior-JVM case) must be cleared so saveAsTable can recreate it
    val staleDir = new java.io.File(wh, "graft_reset_stale")
    staleDir.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(staleDir, "part-00000-dead.snappy.parquet").toPath, "x")
    java.nio.file.Files.writeString(
      new java.io.File(staleDir, "_SUCCESS").toPath, "")
    assert(!spark.catalog.tableExists("graft_reset_stale"))
    Dedup.resetManagedTable(spark, "graft_reset_stale")
    assert(!staleDir.exists(), "orphaned table dir must be cleared")

    // a LIVE table's location is resolved from the catalog and cleared
    spark.range(4).write.mode("overwrite").saveAsTable("graft_reset_live")
    val liveDir = new java.io.File(wh, "graft_reset_live")
    assert(liveDir.exists())
    Dedup.resetManagedTable(spark, "graft_reset_live")
    assert(!liveDir.exists())
    assert(!spark.catalog.tableExists("graft_reset_live"))
  }

  test("dupRateByLength: duplicate mass lands in its length band") {
    import spark.implicits._
    val d = (1L to 10L).map(i => (i, i * 10)).toDF("doc_id", "n_chars")
    val dups = Seq(1L, 2L).toDF("doc_id")
    val r = Dedup.dupRateByLength(d, dups, nBuckets = 5).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(4),
        x.getAs[Double]("dup_rate"))).toMap
    assert(r(1L) === ((2L, 2L, 1.0))) // shortest band holds both dups
    (2L to 5L).foreach(b => assert(r(b)._3 === 0.0))
  }

  test("cluster-size histogram: chained pairs merge before counting") {
    import spark.implicits._
    // 1-2 and 2-3 chain into one 3-cluster; 5-6 stays a pair
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val hist = Dedup.nearDupClusters(pairs)
      .groupBy("cluster").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === Map(3L -> 1L, 2L -> 1L))
  }

  test("dedupReport: exact members and near-dup flags roll up per source") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, "s1", base),              // keeper of the exact group
      (2L, "s1", base),              // exact copy → exact_dup + near flag
      (3L, "s2", base + " phi"),     // near-dup of 1/2, not exact
      (4L, "s2", "totally unrelated content words here nothing shared at all")
    ).toDF("doc_id", "source", "text")
    val r = Dedup.dedupReport(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r("s1") === ((2L, 1L, 2L))) // 2 docs, 1 exact member, both near-flagged
    assert(r("s2") === ((2L, 0L, 1L))) // doc 3 near-flagged, doc 4 clean
  }

  test("decontaminateByMinhash: flags only cross-boundary near-dups, best match") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, base),                            // benchmark (id % 2 == 0)
      (1L, base + " phi"),                   // train: near-dup of benchmark 0
      (3L, "one two three four five six seven eight nine ten"),
      (5L, "one two three four five six seven eight nine ten"),
      (7L, "completely different words nothing shared here at all today")
    ).toDF("doc_id", "text")
    val flagged = Dedup.decontaminateByMinhash(docs,
        isBenchmark = col("doc_id") % 2 === 0, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // train doc 1 is contaminated by benchmark 0
    assert(flagged.get(1L) === Some(0L))
    // 3↔5 is a TRAIN-train duplicate: dedup's business, not
    // decontamination's — must NOT be flagged here
    assert(!flagged.contains(3L) && !flagged.contains(5L))
    assert(!flagged.contains(7L))
  }

  test("prefixFilterJoin: ZERO recall loss — differential vs local brute force") {
    // Zipfian-ish vocab: a few hot tokens + many rare ones
    val hot = Seq("the", "of", "and")
    val texts = (0L until 40L).map { i =>
      val rare = (0 until 6).map(j => s"w${(i * 5 + j * 7) % 37}")
      val dup = if (i % 4 == 0) (0 until 6).map(j => s"w${j * 7 % 37}")
                else rare
      i -> (hot ++ dup).mkString(" ")
    }
    val docs = texts.toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(docs, num = 3, den = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // local brute force over every pair
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSet
    val sets = texts.map { case (i, t) => i -> toks(t) }.toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      in = sets(a).intersect(sets(b)).size
      un = sets(a).union(sets(b)).size
      if in * 5 >= un * 3
    } yield (a, b)).toSet
    assert(got === brute, "prefix filter must return EXACTLY the brute pairs")
    assert(brute.nonEmpty, "fixture must contain qualifying pairs")
  }

  test("prefixFilterJoin: pair exactly at the threshold is included") {
    // |a|=|b|=5, inter=4, union=6 → J = 2/3 ≥ 2/3 exactly
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d f")
    ).toDF("doc_id", "text")
    val out = Dedup.prefixFilterJoin(docs, num = 2, den = 3).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("inter") === 4L)
    assert(out.head.getAs[Long]("uni") === 6L)
    assert(out.head.getAs[Double]("jaccard") === 0.666667)
    // and just past it, excluded
    assert(Dedup.prefixFilterJoin(docs, num = 7, den = 10).collect().isEmpty)
  }

  test("prefixFilterJoin: duplicate tokens collapse to sets") {
    val docs = Seq((1L, "x x x y"), (2L, "x y y y")).toDF("doc_id", "text")
    val out = Dedup.prefixFilterJoin(docs, num = 1, den = 1).collect()
    assert(out.length === 1) // both sets are {x, y} → J = 1
    assert(out.head.getAs[Double]("jaccard") === 1.0)
  }

  test("entityClusters: variants cluster under their canonical form") {
    val df = Seq("acme corporation", "acme corporatio", "acme corporatin",
      "zenith holdings", "zenith holding", "unrelated name here")
      .map(Tuple1(_)).toDF("name")
    val out = Dedup.entityClusters(df, "name", threshold = 0.93).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_members"),
        r.getAs[String]("members"))).toMap
    assert(out.keySet === Set("acme corporatin", "zenith holding"))
    assert(out("acme corporatin")._1 === 3L)
    assert(out("acme corporatin")._2 ===
      "acme corporatin,acme corporatio,acme corporation")
    assert(out("zenith holding")._1 === 2L)
    // the unmatched name forms no cluster (dictionary singletons are
    // not emitted — they resolve to themselves by definition)
  }

  test("dedupThresholdCurve: hand bins and reverse cumulative") {
    val pairs = Seq(0.52, 0.55, 0.61, 0.79, 0.8, 1.0, 1.0)
      .zipWithIndex.map { case (j, i) => (i.toLong, i + 100L, j) }
      .toDF("id_a", "id_b", "jaccard")
    val out = Dedup.dedupThresholdCurve(pairs, binsPerUnit = 20).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0.5) === ((1L, 7L)))   // 0.52
    assert(out(0.55) === ((1L, 6L)))  // 0.55 sits on its own bin edge
    assert(out(0.6) === ((1L, 5L)))
    assert(out(0.75) === ((1L, 4L)))  // 0.79
    assert(out(0.8) === ((1L, 3L)))   // exactly 0.8
    assert(out(1.0) === ((2L, 2L)))   // both exact dups
    assert(out.keySet === Set(0.5, 0.55, 0.6, 0.75, 0.8, 1.0))
  }

  test("entityClusters: transitive chain a~b~c collapses to one cluster") {
    // a~b and b~c above threshold even if a~c alone is not
    val df = Seq("pattern alpha one", "pattern alpha one x",
      "pattern alpha one xy").map(Tuple1(_)).toDF("name")
    val out = Dedup.entityClusters(df, "name", threshold = 0.97).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_members") === 3L)
  }

  test("goldenRecords: plurality with smallest-value tie-break, max rule, lineage") {
    // "acme corp" / "acme corp." cluster (JW ≈ 0.99); "zeta" stays a
    // singleton. Brands in the cluster: b1×2, b2×1 → plurality b1;
    // sizes 3,7,5 → max 7; price max 20.0 over {10.0, 20.0, 15.0}.
    val df = Seq(
      ("acme corp", "b1", 10.0, 3L),
      ("acme corp", "b2", 20.0, 7L),
      ("acme corp.", "b1", 15.0, 5L),
      ("zeta", "b9", 1.0, 1L)
    ).toDF("name", "brand", "price", "size")
    val out = Dedup.goldenRecords(df, "name", threshold = 0.95,
        modeCols = Seq(("brand", "g_brand")),
        maxCols = Seq(("price", "g_price"), ("size", "g_size")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("acme corp", "zeta"))
    val a = out("acme corp")
    assert(a.getAs[Long]("n_rows") === 3L)
    assert(a.getAs[Long]("n_names") === 2L)
    assert(a.getAs[String]("g_brand") === "b1")
    assert(a.getAs[Double]("g_price") === 20.0)
    assert(a.getAs[Long]("g_size") === 7L)
    val z = out("zeta")
    assert(z.getAs[Long]("n_rows") === 1L && z.getAs[Long]("n_names") === 1L)
    assert(z.getAs[String]("g_brand") === "b9")
  }

  test("goldenRecords: exact mode tie breaks to the smaller value") {
    // two names match; brands split 1/1 → tie → smaller string wins
    val df = Seq(("node alpha", "zz"), ("node alpha.", "aa"))
      .toDF("name", "brand")
    val out = Dedup.goldenRecords(df, "name", threshold = 0.95,
      modeCols = Seq(("brand", "g_brand")), maxCols = Seq.empty).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("g_brand") === "aa")
  }

  test("clusterSampleWeights: cluster mass collapses to ~1e6, singletons keep 1e6") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // one 3-clique (0-1-2) and one pair (5,6); the rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusterSampleWeights(docs, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.size === 10)
    for (i <- Seq(0L, 1L, 2L))
      assert(out(i) === ((0L, 3L, 333333L)), s"clique member $i")
    for (i <- Seq(5L, 6L)) assert(out(i) === ((5L, 2L, 500000L)))
    for (i <- Seq(3L, 4L, 7L, 8L, 9L))
      assert(out(i) === ((i, 1L, 1000000L)), s"singleton $i")
    // downweighted mass: clique contributes ~1e6 total (floor rounding)
    assert(Seq(0L, 1L, 2L).map(out(_)._3).sum === 999999L)
  }

  test("shardContaminationMatrix: exact shared-shingle counts and jaccard") {
    // shard 0 holds docs 0 (base) and 2 (near dup); shard 1 holds
    // docs 1 (= base, so heavy overlap with shard 0) and 3 (unrelated)
    val m = Dedup.shardContaminationMatrix(docs, pmod(col("doc_id"), lit(2)),
      n = 3)
    val rows = m.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n_shared_shingles"), r.getAs[Long]("n_sh_a"),
        r.getAs[Long]("n_sh_b"), r.getAs[Double]("jaccard"))).toMap
    // expected values from first principles via the shingle sets
    val sh = Dedup.shingles(docs, 3)
    val byShard = sh.withColumn("s", pmod(col("doc_id"), lit(2)))
      .select("s", "shingle").distinct().collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getString(1)).toSet }
    val s0 = byShard(0L); val s1 = byShard(1L)
    val inter = (s0 intersect s1).size.toLong
    assert(rows(("0", "1"))._1 === inter)
    assert(rows(("0", "1"))._2 === s0.size.toLong)
    assert(rows(("0", "1"))._3 === s1.size.toLong)
    val jac = BigDecimal(inter.toDouble / (s0.size + s1.size - inter))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows(("0", "1"))._4 - jac) < 1e-9)
    // fully disjoint shards produce NO row (matrix is sparse)
    val disjoint = Seq((0L, "alpha beta gamma delta"),
      (1L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    assert(Dedup.shardContaminationMatrix(disjoint,
      pmod(col("doc_id"), lit(2)), n = 3).count() === 0L)
  }

  test("shardContaminationMatrix: non-numeric shard labels keep their " +
    "identity; a NULL shard label fails loudly") {
    // the docstring's own use case — named splits, not numeric codes
    val named = Seq(
      ("train", "alpha beta gamma delta"),
      ("val", "alpha beta gamma epsilon"),
      ("vendor_a", "zeta eta theta iota")).toDF("split", "text")
    val m = Dedup.shardContaminationMatrix(named, col("split"), n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_shared_shingles")).toMap
    // train/val share exactly "alpha beta gamma" (one 3-gram)
    assert(m === Map(("train", "val") -> 1L))
    val withNull = Seq((Some("train"), "alpha beta gamma"),
      (None, "alpha beta gamma")).toDF("split", "text")
    val ex = intercept[Exception] {
      Dedup.shardContaminationMatrix(withNull, col("split"), n = 3).collect()
    }
    assert(ex.getMessage != null)
  }

  test("clusterCanonicalKeepers: longest wins, min-id breaks ties, " +
    "byte ledger is exact") {
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (7L, 7L), (9L, 7L))
      .toDF("id", "cluster")
    val cdocs = Seq(
      (0L, "a" * 10), (1L, "b" * 20), (2L, "c" * 20), // tie at 20 → id 1
      (7L, "d" * 5), (9L, "e" * 50)).toDF("doc_id", "text")
    val out = Dedup.clusterCanonicalKeepers(clusters, cdocs).collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("keeper"),
          r.getAs[Long]("bytes_kept"), r.getAs[Long]("bytes_total"),
          r.getAs[Long]("bytes_saved"))).toMap
    assert(out(0L) === ((3L, 1L, 20L, 50L, 30L)))
    assert(out(7L) === ((2L, 9L, 50L, 55L, 5L)))
  }

  test("dedupQualityBias: removal lands in the duplicated doc's bin only") {
    // bin = (10·stop_n) div n_toks. "the a an of" → stop 4/4 → bin 9 (capped);
    // "x y z w" → stop 0 → bin 0. Duplicate only the stopword-heavy doc.
    val d = Seq(
      (0L, "the a an of"), (1L, "the a an of"), (2L, "the a an of"),
      (3L, "x y z w"), (4L, "q r s t")).toDF("doc_id", "text")
    val out = Dedup.dedupQualityBias(d).collect()
      .map(r => r.getAs[Long]("quality_bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"), r.getAs[Double]("share_kept"))).toMap
    assert(out(9L) === ((3L, 1L, 2L, 0.333333)))
    assert(out(0L) === ((2L, 2L, 0L, 0.666667)))
    // population share vs kept share diverge exactly where dedup bit
    val row9 = Dedup.dedupQualityBias(d).filter(col("quality_bin") === 9)
      .select("share_all", "removal_rate").head()
    assert(row9.getDouble(0) === 0.6)
    assert(row9.getDouble(1) === 0.666667)
  }

  test("pairSetAgreement: orientation-normalized overlap ledger, " +
    "duplicate pairs collapsed, empty sides behave") {
    import spark.implicits._
    // (1,2) appears in both (b reversed); (3,4) a-only; (5,6) b-only
    val a = Seq((1L, 2L), (3L, 4L), (4L, 3L)).toDF("id_a", "id_b")
    val b = Seq((2L, 1L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Dedup.pairSetAgreement(a, b, "ma", "mb").head()
    assert(r.getAs[Long]("n_a") === 2L)      // (4,3) dup of (3,4)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("n_both") === 1L)
    assert(r.getAs[Long]("n_a_only") === 1L)
    assert(r.getAs[Long]("n_b_only") === 1L)
    assert(r.getAs[Double]("pair_jaccard") === 0.333333)
    // one empty side: zero overlap, jaccard 0
    val e = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val r2 = Dedup.pairSetAgreement(a, e, "ma", "mb").head()
    assert(r2.getAs[Long]("n_b") === 0L)
    assert(r2.getAs[Double]("pair_jaccard") === 0.0)
    // both empty: no pairs at all → NULL jaccard, zero counts
    val r3 = Dedup.pairSetAgreement(e, e, "ma", "mb").head()
    assert(r3.getAs[Long]("n_a") === 0L)
    assert(r3.isNullAt(r3.fieldIndex("pair_jaccard")))
  }

  test("winnowing: the guarantee (shared run >= k+w-1 chars => shared " +
    "fingerprint), density bound, and determinism") {
    import spark.implicits._
    val k = 5; val w = 4
    // two docs sharing a 40-char run embedded at DIFFERENT offsets in
    // otherwise-unrelated text — alignment-free detection is the point
    val shared = "the quick brown fox jumps over the lazy"
    val d = Seq(
      (0L, s"completely unrelated preamble text here $shared and a tail"),
      (1L, s"$shared padded with different trailing content entirely"),
      (2L, "nothing in common with the others at all zzz qqq www")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(d, k, w)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("fp")).toSet }
    // guarantee: the shared 40-char run (>= k+w-1 = 8) must yield at
    // least one shared fingerprint between docs 0 and 1
    assert((byDoc(0L) intersect byDoc(1L)).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint")
    // density: winnowing selects ~2/(w+1) of grams; allow a loose
    // upper bound of 1 per window and require > 1 fingerprint
    val n0 = byDoc(0L).size
    val grams0 = d.filter(col("doc_id") === 0L)
      .select(length(regexp_replace(lower(col("text")), "\\s+", " ")))
      .head().getInt(0) - k + 1
    assert(n0 > 1 && n0 <= grams0, s"density off: $n0 of $grams0")
    // candidates: (0,1) surfaces, the unrelated doc does not
    val cands = Dedup.winnowingCandidates(d, k, w, minShared = 1,
      maxDf = 50).collect()
    val pairs = cands.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // overlap coefficient is n_shared / min(n_fp)
    val row01 = cands.find(r => (r.getLong(0), r.getLong(1)) == ((0L, 1L))).get
    assert(row01.getAs[Double]("overlap") ===
      BigDecimal(row01.getAs[Long]("n_shared").toDouble /
        math.min(row01.getAs[Long]("n_fp_a"), row01.getAs[Long]("n_fp_b")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // determinism + partition invariance
    val again = Dedup.winnowingFingerprints(d.repartition(7), k, w)
      .collect().map(_.toSeq).toSet
    assert(again === fps.collect().map(_.toSeq).toSet)
    graft.engine.TrackedCache.release()
  }

  test("winnowing nativeHash: the guarantee and the scalar reference " +
    "both hold under the xxhash64 production path") {
    import spark.implicits._
    val k = 5; val w = 4
    val shared = "the quick brown fox jumps over the lazy"
    val d = Seq(
      (0L, s"completely unrelated preamble text here $shared and a tail"),
      (1L, s"$shared padded with different trailing content entirely"),
      (2L, "nothing in common with the others at all zzz qqq www")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(d, k, w, nativeHash = true)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("fp")).toSet }
    // the guarantee is hash-agnostic: any shared run >= k+w-1 chars
    // must still yield a shared fingerprint
    assert((byDoc(0L) intersect byDoc(1L)).nonEmpty)
    // the distributed xx path must agree exactly with the independent
    // scalar reference (the oracle's q61-style cross-check, pinned
    // here at spec scale too)
    val ref = graft.queries.Fixtures.winnowingXxFixture(d, k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = fps.select("doc_id", "fp").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === ref, s"distributed xx winnowing drifted from the " +
      s"scalar reference:\n got=$got\n ref=$ref")
    graft.engine.TrackedCache.release()
  }

  test("winnowing: a doc shorter than k+w-1 contributes its single " +
    "truncated window; position tie-break prefers the rightmost min") {
    import spark.implicits._
    val tiny = Seq((0L, "abc")).toDF("doc_id", "text")
    val f = Dedup.winnowingFingerprints(tiny, k = 5, w = 4).collect()
    assert(f.length === 1, "short doc must yield exactly one fingerprint")
    // rightmost tie: a doc of one repeated char has IDENTICAL gram
    // hashes everywhere; each window must pick its RIGHTMOST position
    val rep = Seq((0L, "aaaaaaaaaaaa")).toDF("doc_id", "text") // 12 chars
    val sel = Dedup.winnowingFingerprints(rep, k = 5, w = 4)
      .collect().map(r => r.getAs[Long]("fp_pos")).sorted
    // 8 grams (pos 0..7), valid window starts 0..4; window at start s
    // picks pos s+3 (rightmost of equal hashes) → positions 3..7
    assert(sel.toSeq === Seq(3L, 4L, 5L, 6L, 7L))
    graft.engine.TrackedCache.release()
  }
}
