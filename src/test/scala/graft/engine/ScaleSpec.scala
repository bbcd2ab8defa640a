package graft.engine

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the scale mechanics SCALE.md claims: salting preserves
  * results, bucketing co-locates joins (no shuffle in the plan), and
  * sketches stay within tolerance.
  */
class ScaleSpec extends SparkSpec {

  // every pin asserts a plan SHAPE; frames persisted by earlier suites
  // (helpers persist() eagerly into the shared session's CacheManager)
  // would plan-match into these queries and add/remove the very
  // operators the assertions count — start each test from a clean cache
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    spark.catalog.clearCache()
    super.withFixture(test)
  }

  private def li = Tables.load(spark, sf001, "lineitem")
  private def orders = Tables.load(spark, sf001, "orders")

  test("salted two-phase sum equals the direct aggregation (decimal-exact)") {
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(
      li.withColumn("q", col("l_quantity").cast("decimal(18,2)")),
      Seq("l_returnflag"), "q", saltSrc = col("l_orderkey"), n = 16)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted === direct)
  }

  test("salted join equals the plain join") {
    val dim = orders.select("o_orderkey", "o_orderpriority")
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(
      li.withColumnRenamed("l_orderkey", "o_orderkey"), dim,
      key = "o_orderkey", saltSrc = col("l_partkey"), n = 8)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    info(s"warehouse: $wh")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still returns the right row count
      assert(j.count() === li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed LSH index: shard-vs-index join shuffles only the shard") {
    import graft.ext.Dedup
    val docs = Tables.load(spark, sf001, "documents")
    val shard = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val plain = Dedup.buildLshIndex(corpus)
    spark.sql("DROP TABLE IF EXISTS lshidx_buckets")
    spark.sql("DROP TABLE IF EXISTS lshidx_shingles")
    Dedup.writeLshIndexBucketed(plain, "lshidx", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val bucketed = Dedup.readLshIndexBucketed(spark, "lshidx")
      val pairs = Dedup.dedupAgainstIndex(shard, bucketed, maxBucket = None)
      val plan = pairs.queryExecution.executedPlan.toString
      // the candidate join partitions on (band, bucket): exactly ONE
      // such exchange (the shard side) — the bucketed index side
      // reads its layout with no shuffle
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges === 1,
        s"expected only the shard side to shuffle on (band, bucket), got $bandExchanges:\n$plan")
      // and the results equal the plain-parquet index's
      import spark.implicits._
      val a = pairs.as[(Long, Long, Double)].collect().toSet
      val b = Dedup.dedupAgainstIndex(shard, plain, maxBucket = None)
        .as[(Long, Long, Double)].collect().toSet
      assert(a === b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS lshidx_buckets")
      spark.sql("DROP TABLE IF EXISTS lshidx_shingles")
    }
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("partw").toFile
    Reshape.writePartitioned(orders.withColumn("status", col("o_orderstatus")),
      "status", dir.getAbsolutePath)
    val back = spark.read.parquet(dir.getAbsolutePath).filter(col("status") === "F")
    val plan = back.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(back.count() === orders.filter(col("o_orderstatus") === "F").count())
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"expected partition pruning:\n${plan.take(2000)}")
  }

  test("sequence packing plan: exactly one exchange, on the stratum key") {
    val docs = Tables.load(spark, sf001, "documents")
    val plan = graft.ext.Corpus.packByTokenBudget(docs, budget = 2048L)
      .queryExecution.executedPlan.toString
    // the whole operator is one window over (lang) — a single
    // hash exchange on the stratum, never a global (single-partition)
    // sort: a global ordering would serialize 100 TB into one task
    val exchanges = "Exchange hashpartitioning\\(lang".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one stratum exchange:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"global exchange would serialize the corpus:\n$plan")
  }

  test("batch ANN plan: equi-joins only (no cartesian, no nested-loop)") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val plan = graft.ext.Similarity.annTopKBatch(emb, queries, k = 5)
      .queryExecution.executedPlan.toString
    // the candidate step must stay a (band, bucket) equi-join however
    // large the query side grows — a nested-loop fallback here is the
    // all-pairs scan this operator exists to avoid
    assert(!plan.contains("CartesianProduct"), s"cartesian in ANN plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop in ANN plan:\n$plan")
  }

  test("BPE pair counts: corpus-sized work only in the word count") {
    val docs = Tables.load(spark, sf001, "documents")
    val vocab = graft.ext.Bpe.initVocab(docs)
    val plan = graft.ext.Bpe.pairCounts(vocab)
      .queryExecution.executedPlan.toString
    // two aggregates (word count, pair count) → exactly two hash
    // exchanges; everything between is map-only over the vocabulary
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"expected 2 exchanges (word, pair):\n$plan")
  }

  test("pageRank iteration plan: cached adjacency joins by broadcast, never re-shuffles") {
    import spark.implicits._
    val edges = (0 until 500).map(i => (s"n${i % 53}", s"n${(i * 11 + 5) % 53}"))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    // the lazy variant: pageRank itself returns a checkpointed frame
    // whose executed plan is an opaque ExistingRDD scan
    val (pr, _) = graft.ext.Graph.pageRankLazy(edges, "src", "dst",
      iterations = 3, damping = 0.85, micro = 1000000000000L)
    val plan = pr.queryExecution.executedPlan.toString
    // every iteration's rank join is a broadcast over the cached
    // adjacency — a sort-merge join would re-shuffle the edge table
    // each round
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("InMemoryTableScan"), plan)
  }

  test("int8 quant audit plan: param table broadcasts, two hash exchanges") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val plan = graft.ext.Quantization.sqQuantError(emb)
      .queryExecution.executedPlan.toString
    // per-dim params (64 rows) must broadcast into the exploded scan;
    // the only hash exchanges are the param build's groupBy(pos) and
    // the final per-vector aggregation
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 hash exchanges:\n$plan")
  }

  test("compactionPlan touches only the manifest: one window, no join") {
    import spark.implicits._
    val manifest = (1 to 100).map(i => (s"f$i", (i * 97 % 500 + 1).toLong))
      .toDF("name", "bytes")
    val plan = Layout.compactionPlan(manifest, "bytes", 1000L,
        orderBy = Seq(col("bytes").desc, col("name")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("weighted sample plan: map-only + TakeOrdered, zero exchanges") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, (i % 97 + 1).toDouble))
      .toDF("doc_id", "w")
    val plan = graft.ext.Corpus.weightedSampleES(docs, "w", k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("triangle census plan: equi-joins only, cached oriented edges") {
    import spark.implicits._
    val edges = ((0 until 400).map(i => (s"n${i % 41}", s"n${(i * 13 + 7) % 41}")) ++
      (for { a <- 0 until 5; b <- 0 until 5 if a < b } yield (s"n$a", s"n$b")))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val plan = graft.ext.Graph.triangleStats(edges)
      .queryExecution.executedPlan.toString
    // the wedge self-join and the closure semi-join must stay
    // equi-joins on (lo) / (h1, h2) — a cartesian here is the n²
    // neighbor-pair blowup the degree orientation exists to avoid
    assert(!plan.contains("CartesianProduct") ||
      // the final 1×1 summary×count crossJoin is the only allowed one
      "CartesianProduct".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("InMemoryTableScan"), plan)
  }

  test("association rules plan: dictionary supports ride as broadcasts") {
    val plan = graft.ext.Profile.associationRules(li, "l_orderkey",
        "l_partkey", minPairSupport = 3L)
      .queryExecution.executedPlan.toString
    // supp_a / supp_b / n_baskets joins must all be broadcasts — a
    // sort-merge join on the rule stream would re-shuffle per join
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("prefix-filter join plan: equi-joins only (no cartesian, no nested-loop)") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
        (i, (0 until 8).map(j => s"w${(i * 3 + j * 5) % 61}").mkString(" ")))
      .toDF("doc_id", "text")
    val plan = graft.ext.Dedup.prefixFilterJoin(docs, num = 3, den = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("blocklist filter plan: map-only into one exchange, no join") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (s"s${i % 3}", s"tok$i slow word"))
      .toDF("source", "text")
    val plan = graft.ext.Privacy.blocklistStats(docs, Seq("slow", "leak"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange (group rollup):\n$plan")
  }

  test("dimension stats plan: one exchange on the dim key") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val plan = graft.ext.Similarity.dimensionStats(emb)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange (dim groupBy):\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("peak concurrency plan: join-free, windows reuse the user/day partitionings") {
    val events = Tables.load(spark, sf001, "events")
    val plan = graft.ext.Streaming.peakConcurrency(events)
      .queryExecution.executedPlan.toString
    // the sweep is session windows (user key) + day sweep (day key):
    // pure window/aggregate passes — a join anywhere here means the
    // day clip got implemented as an interval join and will not scale
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 4, s"expected <= 4 hash exchanges:\n$plan")
  }

  test("trending ranks plan: row-scale input collapses to the daily dictionary first") {
    import spark.implicits._
    val rows = (0 until 600).map(i => (i % 30L, s"b${i % 7}"))
      .toDF("d", "item")
    val plan = graft.ext.Profile.trendingRanks(rows, col("d"), "item")
      .queryExecution.executedPlan.toString
    // one hash-agg to (day, item) then two window passes over that
    // dictionary — rank windows running over ROWS instead of the
    // aggregate is the non-scalable shape this pin rejects
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <= 3 hash exchanges:\n$plan")
    assert(plan.indexOf("Window") < plan.lastIndexOf("HashAggregate"),
      s"expected the daily aggregate BELOW the windows:\n$plan")
  }

  test("interval coverage plan: join-free, one partitioning carries merge + rollups") {
    import spark.implicits._
    val iv = (0 until 400).map(i =>
        (s"k${i % 13}", (i * 7 % 100).toLong, (i * 7 % 100 + i % 9).toLong))
      .toDF("key", "s", "e")
    val plan = graft.ext.Profile.intervalCoverage(iv, "key", col("s"), col("e"))
      .queryExecution.executedPlan.toString
    // gaps-and-islands via running-max window + two aggregations, all
    // keyed on `key` — no self-join against overlapping intervals
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <= 3 hash exchanges:\n$plan")
  }

  test("k-core peel round plan: equi-joins only against the survivor set") {
    import spark.implicits._
    val edges = (0 until 300).map(i => (s"n${i % 29}", s"n${(i * 17 + 3) % 29}"))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.toDF("u", "v")
    val keep = graft.ext.Graph.peelDegrees(edges)
      .where(col("deg") >= 2).select("node")
    val plan = graft.ext.Graph.peelRound(edges, keep)
      .queryExecution.executedPlan.toString
    // both endpoint filters are semi equi-joins on the survivor
    // dictionary — any nested-loop/cartesian here is quadratic in
    // edges and the peel loop runs it every round
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi"), plan)
  }

  test("k-anonymity audit plan: join-free, count-distinct Expand only") {
    import spark.implicits._
    val rows = (0 until 300).map(i => (s"r${i % 7}", s"s${i % 4}", (i % 11).toLong))
      .toDF("region", "segment", "sens")
    val plan = graft.ext.Privacy.kAnonymityAudit(rows,
        Seq("region", "segment"), "sens", k = 10, l = 3)
      .queryExecution.executedPlan.toString
    // one QI-keyed aggregation carrying the distinct-sensitive count;
    // a join against a separate distinct-count frame would shuffle the
    // class dictionary twice
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 hash exchanges (Expand shape):\n$plan")
  }

  test("DSIR weights plan: token-keyed joins only; scalars ride as 1-row broadcasts") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
        (i, s"src${i % 5}", (0 until 6).map(j => s"w${(i + j * 7) % 31}").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val plan = graft.ext.TextStats.dsirWeights(docs, "src0")
      .queryExecution.executedPlan.toString
    // the scoring joins are all keyed on `tok` — document-pair-shaped
    // work (a cartesian) would be quadratic in the corpus. The only
    // nested-loop joins allowed are the three 1-row scalar frames.
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 3, plan)
  }

  test("stream-static enrichment plan (batch twin): dim broadcasts, no SMJ") {
    val events = Tables.load(spark, sf001, "events")
    val dim = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    val plan = graft.ext.Streaming.enrichedHourly(events, dim, "user_id", "segment")
      .queryExecution.executedPlan.toString
    // the dimension must broadcast (in streaming it re-broadcasts per
    // micro-batch); a sort-merge join would shuffle the fact stream
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("fd audit plan: join-free per candidate FD, aggregations only") {
    val c = Tables.load(spark, sf001, "customer")
    val plan = graft.ext.Profile.fdAudit(c, Seq(
        ("a", Seq("c_custkey"), "c_nationkey"),
        ("b", Seq("c_mktsegment"), "c_nationkey")))
      .queryExecution.executedPlan.toString
    // per FD: (lhs, rhs) counts → lhs rollup → single-row agg; a join
    // anywhere means the violating-group math left the aggregate path
    assert(!plan.contains("Join"), plan)
  }

  test("changepoint plan: join-free, windows over the daily dictionary") {
    val events = Tables.load(spark, sf001, "events")
    val plan = graft.ext.Profile
      .changepointDaily(events, "event_type", "ts")
      .queryExecution.executedPlan.toString
    // raw rows collapse to (group, day) in ONE aggregation; every
    // window after runs on that dictionary, partitioned per group
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <= 3 hash exchanges:\n$plan")
  }

  test("link prediction plan: equi-joins only, top-k via TakeOrdered") {
    import spark.implicits._
    val edges = (0 until 300).map(i => (s"n${i % 25}", s"n${(i * 7 + 3) % 23}"))
      .toDF("src", "dst")
    val plan = graft.ext.Graph.linkPrediction(edges)
      .queryExecution.executedPlan.toString
    // the wedge join keys on the center node and the anti-join on the
    // canonical pair — a cartesian/NLJ here would be the n² pair space
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-k, not a global sort:\n$plan")
  }

  test("shuffle-skew audit plan: join-free, two hash aggregations") {
    val plan = graft.ext.Profile.shuffleSkewAudit(li, "l_orderkey", "t")
      .queryExecution.executedPlan.toString
    // key counts (the only data-sized shuffle) → bucket rollup
    // carrying the top-key stats → single-row agg: ONE chain, no
    // join, the key shuffle never re-runs for a second branch
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 hash exchanges:\n$plan")
  }

  test("pca power plan: no cartesian; iteration joins all broadcast") {
    import spark.implicits._
    val df = (1L to 50L).map(i =>
        (i, Array.tabulate(4)(d => ((i * (d + 3)) % 17).toFloat / 7f)))
      .toDF("vec_id", "embedding")
    val plan = graft.ext.Similarity.pcaTopComponent(df, dim = 4)
      .queryExecution.executedPlan.toString
    // the data-sized pass is generate + partial-agg (checkpointed
    // away); everything visible here is d-row frames riding
    // broadcasts — a SortMergeJoin means a dictionary frame shuffled
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("modularity plan: label map broadcasts; no cartesian pair space") {
    import spark.implicits._
    val edges = (0 until 200).map(i => (s"n${i % 20}", s"n${(i * 3 + 1) % 19}"))
      .toDF("src", "dst")
    val labels = (0 until 25).map(i => (s"n$i", s"c${i % 4}"))
      .toDF("node", "label")
    val plan = graft.ext.Graph.modularity(edges, labels)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"label attach must broadcast (node dictionary sized):\n$plan")
  }

  test("acf plan: row-scale work collapses to the daily dictionary first") {
    val ev = Tables.load(spark, sf001, "events")
    val df = graft.ext.Profile.acfDaily(ev, "event_type", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // daily rollup, the lag self-join, the (grp,lag) agg, final sort —
    // everything after the first agg is days×groups sized
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 4, s"expected <= 4 hash exchanges:\n$plan")
  }

  test("mutual information / info gain plans: marginals broadcast, no SMJ") {
    val ords = orders
    val mi = graft.ext.Profile.mutualInformation(ords,
      col("o_orderstatus"), col("o_orderpriority"), "t")
    assert(!mi.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    val ig = graft.ext.Profile.infoGain(ords, col("o_orderstatus"),
      Seq("p" -> col("o_orderpriority")))
    val plan = ig.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("encoding audit plan: windows partition by bucket, never one reducer") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val plan = graft.ext.Profile.encodingAudit(orders, "o_orderkey",
      Seq("o_orderstatus")).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_b"),
      s"run-count window must partition by bucket:\n$plan")
  }

  test("decay scores / hill tail plans: top-k via TakeOrdered, no global sort") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val ev = Tables.load(spark, sf001, "events")
    val ds = graft.ext.Profile.decayScores(ev, "user_id", "ts",
      round(col("value") * 100)).queryExecution.executedPlan.toString
    assert(ds.contains("TakeOrderedAndProject"), ds)
    val ht = graft.ext.Profile.hillTail(orders,
      round(col("o_totalprice") * 100), col("o_orderkey"), 100, "t")
      .queryExecution.executedPlan.toString
    assert(ht.contains("TakeOrderedAndProject"), ht)
  }

  test("markov squaring plan: runs on the types dictionary, no cartesian") {
    val ev = Tables.load(spark, sf001, "events")
    val plan = graft.ext.Streaming.transitionMatrix2(ev)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("sax motifs / backtest plans: group-partitioned windows, broadcast stats") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val ev = Tables.load(spark, sf001, "events")
    val sax = graft.ext.Profile.saxMotifs(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(!sax.contains("SortMergeJoin"), sax)
    assert(sax.contains("hashpartitioning(grp"),
      s"3-gram window must partition by group:\n$sax")
    val bt = graft.ext.Profile.seasonalNaiveBacktest(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(!bt.contains("SortMergeJoin"),
      s"cut + training means are dictionary broadcasts:\n$bt")
  }

  test("anova / rate shift plans: join-free reductions over group dictionaries") {
    val an = graft.ext.Profile.anovaOneWay(orders, col("o_orderpriority"),
      round(col("o_totalprice") * 100), "t")
      .queryExecution.executedPlan.toString
    assert(!an.contains("SortMergeJoin"), an)
    assert(!an.contains("CartesianProduct"), an)
    val ev = Tables.load(spark, sf001, "events")
    val rs = graft.ext.Profile.rateShift(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(!rs.contains("SortMergeJoin"), rs)
  }

  test("readability / zonemap plans: map-only scans, no joins anywhere") {
    val docs = Tables.load(spark, sf001, "documents")
    val rd = graft.ext.Profile.readability(docs)
      .queryExecution.executedPlan.toString
    assert(!rd.contains("Join"), rd)
    val zm = graft.ext.Profile.zonemapSkipAudit(li, "l_orderkey",
      Seq(("q45", col("l_quantity"), 45L, Long.MaxValue)))
      .queryExecution.executedPlan.toString
    assert(!zm.contains("Join"), zm)
  }

  test("weekly churn plan: shifted self-join stays equi on (entity, week)") {
    val ev = Tables.load(spark, sf001, "events")
    val plan = graft.ext.Profile.weeklyChurn(ev, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("pit features plan: history join stays equi on the user key") {
    val ev = Tables.load(spark, sf001, "events")
    val plan = graft.ext.Streaming.pitFeatures(ev)
      .queryExecution.executedPlan.toString
    // the 24h bound must ride as a join FILTER on the user equi-join —
    // a nested-loop/cartesian here is the anchors×history blowup
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("davies-bouldin plan: centroid dictionary broadcasts, no SMJ") {
    import spark.implicits._
    val df = (1L to 60L).map(i =>
        (i, Array.tabulate(4)(d => ((i * (d + 3)) % 17).toFloat / 7f),
          (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val plan = graft.ext.Similarity.daviesBouldin(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"centroid/scatter frames are label-dictionary sized:\n$plan")
  }

  test("dp counts plan: join-free; fk discovery via dictionary semi-joins") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val ev = Tables.load(spark, sf001, "events")
    val dp = graft.ext.Privacy.dpCounts(ev, col("event_type"))
      .queryExecution.executedPlan.toString
    assert(!dp.contains("Join"), dp)
    val fk = graft.ext.Profile.fkDiscovery(Seq(
      ("t", li, "l_orderkey", orders, "o_orderkey")))
      .queryExecution.executedPlan.toString
    assert(fk.contains("LeftSemi"),
      s"containment must be a semi-join of key dictionaries:\n$fk")
    assert(!fk.contains("CartesianProduct"), fk)
  }

  test("interpolate plan: neighbor windows partition by group") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val ev = Tables.load(spark, sf001, "events")
    val plan = graft.ext.Profile.interpolateDaily(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(grp"),
      s"IGNORE NULLS windows must partition by group:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("cross-correlation / cohort-ltv plans: dictionary joins, grouped windows") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val ev = Tables.load(spark, sf001, "events")
    val xc = graft.ext.Profile.crossCorrelation(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(!xc.contains("CartesianProduct"), xc)
    val ltv = graft.ext.Streaming.cohortLtv(ev)
      .queryExecution.executedPlan.toString
    assert(!ltv.contains("CartesianProduct"), ltv)
    assert(ltv.contains("hashpartitioning(cohort_week"),
      s"cumulative window must partition by cohort:\n$ltv")
  }

  test("burrows delta / overdispersion / simpson plans stay dictionary-sized") {
    val docs = Tables.load(spark, sf001, "documents")
    val bd = graft.ext.TextStats.burrowsDelta(docs, topN = 10)
      .queryExecution.executedPlan.toString
    assert(!bd.contains("CartesianProduct"),
      s"the sources×topN grid must ride the broadcast word list:\n$bd")
    val ev = Tables.load(spark, sf001, "events")
    val od = graft.ext.Profile.overdispersion(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(!od.contains("Join"), od)
    val sc = graft.ext.Profile.simpsonCheck(li.limit(1000), "l_returnflag",
      col("l_quantity"), round(col("l_extendedprice") * 100))
      .queryExecution.executedPlan.toString
    assert(!sc.contains("SortMergeJoin"), sc)
    assert(!sc.contains("CartesianProduct"), sc)
  }

  test("cardinality / join-order / partitioner audit plans stay dictionary-sized") {
    val ca = graft.ext.Profile.cardinalityAudit(orders,
      Seq(("s", col("o_orderstatus"), Left("F"))))
      .queryExecution.executedPlan.toString
    assert(!ca.contains("Join"), ca)
    val jo = graft.ext.Profile.joinOrderAudit(li, "l_orderkey", orders,
      "o_orderkey", "o", "l_partkey", orders.limit(10), "o_orderkey", "p")
      .queryExecution.executedPlan.toString
    assert(!jo.contains("CartesianProduct"), jo)
    val pa = graft.ext.Profile.partitionerAudit(li, "l_orderkey", 8)
      .queryExecution.executedPlan.toString
    assert(!pa.contains("SortMergeJoin"), pa)
    assert(!pa.contains("CartesianProduct"), pa)
  }

  test("mann-whitney plan: ranks ride the value dictionary, join-free") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val mw = graft.ext.Profile.mannWhitney(Tables.load(spark, sf001,
        "customer"), col("c_mktsegment"), round(col("c_acctbal") * 100),
      "AUTOMOBILE", "BUILDING")
      .queryExecution.executedPlan.toString
    assert(!mw.contains("Join"), mw)
    // the per-row work is ONE rollup; the unpartitioned window runs on
    // the distinct-value dictionary, stated by design
    assert("Exchange hashpartitioning".r.findAllIn(mw).size <= 2, mw)
  }

  test("rank-test family plans: dictionary ranks broadcast, no SMJ") {
    val cust = Tables.load(spark, sf001, "customer")
    val kw = graft.ext.Profile.kruskalWallis(cust, col("c_mktsegment"),
      round(col("c_acctbal") * 100), "t")
      .queryExecution.executedPlan.toString
    assert(!kw.contains("SortMergeJoin"), kw)
    val sp = graft.ext.Profile.spearman(li, col("l_quantity"),
      round(col("l_extendedprice") * 100), "t")
      .queryExecution.executedPlan.toString
    assert(!sp.contains("SortMergeJoin"),
      s"rank dictionaries must broadcast back onto rows:\n$sp")
    val es = graft.ext.Profile.effectSizes(cust, col("c_mktsegment"),
      round(col("c_acctbal") * 100), "AUTOMOBILE", "BUILDING")
      .queryExecution.executedPlan.toString
    assert(!es.contains("SortMergeJoin"), es)
    assert(!es.contains("CartesianProduct"), es)
  }

  test("seasonal anomalies / louvain / drift plans: grouped windows, broadcasts") {
    // a concurrently-cached matching subtree (shared test session)
    // would swallow the very Exchange/operator this pin asserts
    spark.catalog.clearCache()
    val ev = Tables.load(spark, sf001, "events")
    val sa = graft.ext.Profile.seasonalAnomalies(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(sa.contains("hashpartitioning(grp"), sa)
    assert(!sa.contains("CartesianProduct"), sa)
    import spark.implicits._
    val edges = (0 until 200).map(i => (s"n${i % 20}", s"n${(i * 3 + 1) % 19}"))
      .toDF("src", "dst")
    val labels = (0 until 25).map(i => (s"n$i", s"c${i % 4}"))
      .toDF("node", "label")
    val lv = graft.ext.Graph.louvainMoveGain(edges, labels)
      .queryExecution.executedPlan.toString
    assert(!lv.contains("CartesianProduct"), lv)
    assert(!lv.contains("SortMergeJoin"),
      s"label/degree/sigma dictionaries must broadcast:\n$lv")
    assert(lv.contains("TakeOrderedAndProject"), lv)
    val emb = Tables.load(spark, sf001, "embeddings")
    val dr = graft.ext.Similarity.embeddingDrift(emb)
      .queryExecution.executedPlan.toString
    assert(!dr.contains("CartesianProduct"), dr)
  }

  test("no single-partition Window over a row-scale frame in the four " +
    "formerly-global-ntile queries (q163/q177/q181/q220)") {
    // these four once carried partition-less ntile/row_number windows
    // over corpus- or entity-scale frames (the single-reducer shape);
    // they now decompose through Ranks.* — pin that every ordered
    // partition-less Window in their plans runs over a value
    // dictionary (ordering columns = grouping keys of an Aggregate
    // beneath), never raw rows
    for (name <- Seq("q163_dup_rate_by_length", "q177_rfm",
        "q181_calibration", "q220_conversion_latency")) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      val offenders = graft.PlanChecks.rowScaleGlobalWindows(df)
      assert(offenders.isEmpty,
        s"$name has row-scale global windows:\n${offenders.mkString("\n")}")
    }
  }

  test("media CDC / cross-modal audit plans: payload windows partition per media/hash, joins stay equi") {
    val cdc = graft.SparkEntry.queries("q291_media_cdc_chunks")(spark, sf001)
    assert(graft.PlanChecks.rowScaleGlobalWindows(cdc).isEmpty,
      "q291 must not sort the byte-position frame on one reducer")
    val cp = cdc.queryExecution.executedPlan.toString
    assert(!cp.contains("CartesianProduct"), cp)
    val audit = graft.SparkEntry.queries("q292_crossmodal_audit")(spark, sf001)
    assert(graft.PlanChecks.rowScaleGlobalWindows(audit).isEmpty)
    val ap = audit.queryExecution.executedPlan.toString
    assert(!ap.contains("CartesianProduct"), ap)
    assert(!ap.contains("BroadcastNestedLoopJoin"), ap)
  }

  test("fingerprint/weights/kappa plans: pure aggregations, no row-scale global windows") {
    for (name <- Seq("q293_fingerprint_manifest", "q294_cluster_weights",
        "q295_fleiss_kappa", "q296_degenerate_runs",
        "q297_calinski_harabasz", "q298_pii_density",
        "q299_manifest_diff", "q300_streaming_manifest")) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty, name)
    }
    // the manifest is windows-AND-joins-free: one hash aggregation
    // per level — the shape that makes the digest partition-proof
    val mp = graft.SparkEntry.queries("q293_fingerprint_manifest")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!mp.contains("Join"), s"manifest must not join:\n$mp")
  }

  test("r11 additions (q303–q311): bounded explodes and per-group " +
    "windows only — no cartesian, no BNLJ, no row-scale global window") {
    // queries whose only nested-loop join is the broadcast 1-row
    // totals/span attach (crossJoin(broadcast(1-row aggregate)))
    val totalsAttach = Set("q304_training_shuffle_shards",
      "q305_dedup_quality_bias", "q308_padding_waste",
      "q309_purged_time_split")
    for (name <- Seq("q303_shard_contamination_matrix",
        "q304_training_shuffle_shards", "q305_dedup_quality_bias",
        "q306_mmr_rerank", "q307_cluster_canonical",
        "q308_padding_waste", "q309_purged_time_split",
        "q310_randomwalk_pairs", "q311_walk_skipgram")) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty, name)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      // q309's span attach sits below a DAG fork (counts + leaky both
      // read the split labels), so the tree plan repeats it once
      val cap = if (name == "q309_purged_time_split") 2
                else if (totalsAttach(name)) 1 else 0
      assert(bnlj <= cap, s"$name has $bnlj BNLJ:\n$p")
    }
  }

  test("r11 continuation (q312–q330): partitioned/dictionary windows " +
    "only, no cartesian, BNLJ only as bounded broadcast attaches") {
    // q316 replays the ANN battery's accepted shape: the brute-truth
    // crossJoin(broadcast(query-roster)) — the roster is the bounded
    // qid dictionary (vec_id % 50), same as q196/q197. q319 attaches
    // TWO broadcast 1-row aggregates (observed-disagreement sum +
    // category marginals) to the unit totals.
    // q323 attaches the bounded sensitive-value dictionary AND the
    // 1-row total to the class dictionary — two broadcast attaches
    // q325's three are all bounded-roster broadcasts: query×centroid
    // ranking, brute-truth roster attach, and the recall grid
    val bnljCap = Map("q316_mrr" -> 2, "q319_krippendorff_alpha" -> 2,
      "q323_t_closeness" -> 2, "q325_ivf_recall_curve" -> 3,
      "q328_budget_waterfill" -> 3).withDefaultValue(1)
    for (name <- Seq("q312_domain_cap", "q313_secret_scan",
        "q314_vocab_coverage", "q315_node2vec_walks", "q316_mrr",
        "q317_streaming_domain_cap", "q318_filter_disparity",
        "q319_krippendorff_alpha", "q320_brier_decomposition",
        "q321_negative_samples", "q322_streaming_upsert",
        "q323_t_closeness", "q324_packing_contamination",
        "q325_ivf_recall_curve", "q326_dedup_method_agreement",
        "q327_redaction_audit", "q328_budget_waterfill",
        "q329_scd2_pit_lookup", "q330_streaming_ann")) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty, name)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnlj <= bnljCap(name), s"$name has $bnlj BNLJ:\n$p")
      graft.engine.TrackedCache.release()
    }
  }

  test("r12/r13 additions (q331–q352): partitioned/dictionary windows " +
    "only, no cartesian, BNLJ only as bounded broadcast attaches") {
    // q333's single maxPairs-gated crossJoin(broadcast(rosterB)) is
    // echoed 3× in the plan string: the persisted `ranked` frame's
    // InMemoryRelation (which embeds the child plan text) is scanned
    // by ka, kb, and the reciprocal-top1 filter — one execution, three
    // textual occurrences.
    // q335 attaches TWO broadcast 1-row aggregates (the calibration
    // qhat/n_cal statistic row onto the eval scores, then the eval
    // totals onto the report) — the accepted totals-attach class.
    // q339 attaches TWO broadcast 1-row aggregates, exactly q335's
    // class: Ranks.nearestRank's internal n_total attach inside the
    // qhat computation, then the qhat row onto the eval quarter.
    // q349 attaches TWO broadcast 1-row aggregates (the n_clusters /
    // n_classes dictionary counts onto the single report row) — the
    // q335/q339 totals-attach class.
    val bnljCap = Map("q333_bitext_mining" -> 3,
      "q335_conformal_coverage" -> 2,
      "q339_cqr_intervals" -> 2,
      "q349_bcubed_cluster_eval" -> 2).withDefaultValue(1)
    for (name <- Seq("q331_ipf_raking", "q332_winnowing_dedup",
        "q333_bitext_mining", "q334_hard_negatives",
        "q335_conformal_coverage", "q336_preference_audit",
        "q337_media_energy_segments", "q338_bradley_terry",
        "q339_cqr_intervals", "q340_wav_pcm_segments",
        "q341_model_arena", "q342_dpo_pairs", "q343_bmp_pixel_stats",
        "q344_pass_at_k", "q345_bon_curve", "q346_grpo_advantages",
        "q347_length_bias", "q349_bcubed_cluster_eval",
        "q350_bleu_components", "q351_answer_f1",
        "q352_self_consistency")) {
      // q348 (streaming) is excluded like the other streaming
      // entries: constructing it RUNS the stream; its plan law is
      // the battery-wide window check in QueriesSpec.
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty, name)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnlj <= bnljCap(name), s"$name has $bnlj BNLJ:\n$p")
      graft.engine.TrackedCache.release()
    }
  }

  test("r14 additions (q353–q370): partitioned/dictionary windows " +
    "only, no cartesian, BNLJ only as bounded broadcast attaches") {
    // q353 replays q316's accepted ANN-battery shape and cap: the
    // brute-truth crossJoin(broadcast(query-roster)) over the bounded
    // qid dictionary (vec_id % 50) — two bounded roster attaches,
    // exactly q316's count (the roster feeds both the ANN candidate
    // side and the graded-truth construction).
    // q354 is map-only (the LCS DP folds inside one projection);
    // q355's joins are the banded LSH bucket equi-joins; q356's only
    // shuffle is the league repartition feeding the in-partition fold.
    // q360's multi-reference clip is three (prompt, n, gram)-keyed
    // aggregates + equi-joins (no k² pairwise); q361 is map-only (the
    // WER DP folds inside one projection); q362's only joins are the
    // two count aggregates' full outer + rowNumberExact's broadcast
    // dictionary attach.
    // q365 is the accepted q316 brute-roster shape: ONE
    // crossJoin(broadcast(bounded query roster)).
    // q367 has two logical 1-row broadcast total attaches (the
    // CQR-accepted shape: totals, then tv); the plan STRING prints 3
    // because the persisted k-cell frame's inner attach appears under
    // both of its InMemoryTableScan consumers. Its assignment is the
    // zero-join literal argmin.
    // q370's second attach is the r16 exactly-once gate: the
    // per-judge countDistinct(item) minimum is its own 1-row
    // broadcast (the cnt dictionary groups (judge, score) and cannot
    // see item duplicates).
    val bnljCap = Map("q353_ndcg_curve" -> 2,
      "q357_winnowing_md5_slice" -> 1,
      "q365_nn_label_eval" -> 1,
      "q367_cluster_tv" -> 3,
      "q369_alpha_interval" -> 1,
      "q370_kendall_w" -> 2).withDefaultValue(0)
    for (name <- Seq("q353_ndcg_curve", "q354_rouge_l",
        "q355_bmp_dhash_neardup", "q356_elo_arena",
        "q357_winnowing_md5_slice", "q358_chrf", "q359_distinct_n",
        "q360_self_bleu", "q361_wer", "q362_arena_wilson",
        "q363_fertility", "q364_dawid_skene", "q365_nn_label_eval",
        "q366_annotator_confusion", "q367_cluster_tv",
        "q368_stratified_winrate", "q369_alpha_interval",
        "q370_kendall_w")) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty, name)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnlj <= bnljCap(name), s"$name has $bnlj BNLJ:\n$p")
      graft.engine.TrackedCache.release()
    }
  }

  test("r15/r16 additions (q371–q392): partitioned/dictionary " +
    "windows only, no cartesian, BNLJ only as bounded broadcast " +
    "attaches or the b-bounded bootstrap rank join") {
    // Every BNLJ below is a broadcast of a 1-row aggregate (totals /
    // max / observed-statistic attach) EXCEPT q373's deliberate b×b
    // rank join — the nearest-rank CI comparison between resample
    // means, bounded by the b PARAMETER (200), independent of corpus
    // size. Per-entry caps, measured then pinned:
    // q371: interval-alpha's internal d_e total attach + the n_cats
    //   dictionary-count attach (2).
    // q373: the b×b rank join + tot→ci attach + tot/ci→full (4) —
    //   the rank join is the ONLY data-shaped one and b bounds it.
    // q374: observed-stat attach onto resamples + hits→obs (2).
    // q375: weighted-kappa's marginal/total attaches (2).
    // q377/q378/q382/q384/q386: one 1-row (or dictionary-row) attach.
    // q379: rater + grand 1-row attaches (2).
    // q381: the NEW max-excess normalization attach + the normalizing
    //   total attach; the persisted score frame echoes one in the
    //   plan string (3 textual, 2 logical).
    // q383: the bounded query-roster attach (roster contract is the
    //   operator's scale contract — Q stays dictionary-sized).
    // q387 (PAV: one row-scale groupBy + the repartition(group) fold),
    // q389 (grouped bootstrap: the rank comparison is a group-EQUI
    // self-join with b² per-group fan-out, never a BNLJ) and q390
    // (calibration gain: the bucket→block apply is a dictionary
    // range join under a group equi key) pin at ZERO BNLJ —
    // measured, their whole point.
    // q391's two BNLJ are the n_units 1-row attach onto the category
    // marginals and the final pe attach — the accepted totals class.
    // q392 attaches the SAME class five times logically (the 1-row
    // span/n_cats scale onto the pair terms, onto the C×C weight
    // grid, and scale+grid+prevalence onto the final row); the
    // persisted cells/units frames echo three more textual
    // occurrences. Every one is a 1-row or C-row broadcast.
    // q380/q385/q388 (streaming) are excluded like q348/q356:
    // constructing them RUNS the stream; their plan law is the
    // battery-wide window check in QueriesSpec.
    val bnljCap = Map("q371_alpha_ordinal" -> 2,
      "q373_paired_bootstrap" -> 4,
      "q374_permutation_test" -> 2,
      "q375_weighted_kappa" -> 2,
      "q377_cochran_q" -> 1,
      "q378_cronbach_alpha" -> 1,
      "q379_icc21" -> 2,
      "q381_doremi_round" -> 3,
      "q382_kn_bigram" -> 1,
      "q383_knn_shapley" -> 1,
      "q384_ips_offpolicy" -> 1,
      "q386_dr_offpolicy" -> 1,
      "q391_gwet_ac1" -> 2,
      "q392_gwet_ac2" -> 8).withDefaultValue(0)
    for (name <- Seq("q371_alpha_ordinal", "q372_bertscore",
        "q373_paired_bootstrap", "q374_permutation_test",
        "q375_weighted_kappa", "q376_mcnemar", "q377_cochran_q",
        "q378_cronbach_alpha", "q379_icc21", "q381_doremi_round",
        "q382_kn_bigram", "q383_knn_shapley", "q384_ips_offpolicy",
        "q386_dr_offpolicy", "q387_isotonic_pav",
        "q389_grouped_bootstrap_ci", "q390_calibration_gain",
        "q391_gwet_ac1", "q392_gwet_ac2")) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty, name)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnlj <= bnljCap(name), s"$name has $bnlj BNLJ:\n$p")
      graft.engine.TrackedCache.release()
    }
  }

  test("r17 additions (q393/q49/q394/q395): no cartesian, the " +
    "bootstrap rank join is a b-bounded EQUI hash join, BNLJ only " +
    "as 1-row broadcast attaches") {
    // agreementBootstrapCI's b×b nearest-rank comparison joins on
    // the derived key pmod(_r, 1) — constant-valued but NON-FOLDABLE,
    // so Catalyst plans a real hash join bounded by the b PARAMETER
    // (never a BNLJ; confirmed by the measured counts below, which
    // are fully accounted for by 1-row attaches).
    // Logical attach inventory (post-inline-point — the estimate
    // reads the shared persisted frames, no delegate):
    // q393 (ac1): consts attach in the pe finisher + rank→n_eff +
    //   the point finisher's pcs-onto-pus and pus×pcs×consts
    //   attaches + the final point×stats×ci — ~7 logical; persisted
    //   qvs/cells/units/uw frames echo the rest (cap 10).
    // q49 (alpha): no consts attach in the alpha finisher —
    //   rank→n_eff + the point finisher's snc2/consts attaches +
    //   the final two (cap 5 = the exact logical count, which is
    //   also what confirms the rank join planned equi).
    // q394 (isotonic apply): ZERO — the bucket→block lookup is a
    //   group-equi join with a ≤-filter and the first-block fallback
    //   a group-equi attach; measured, its whole point.
    // q395 (EB confseq): ZERO — one scalar aggregate + arithmetic.
    // q396 (aHash near-dup): ZERO — the q355 LSH band-bucket shape.
    // q398 (streaming EB) is excluded like q380/q385/q388:
    // constructing it RUNS the stream; q399 (media CC) is excluded
    // like q58: nearDupClusters iterates with eager per-round counts
    // at construction. Both inherit their components' pinned shapes.
    // q397 (ac2 bootstrap): ~10 LOGICAL attaches, all the accepted
    //   1-row class (the consts = span/n_cats/T_w scale row onto the
    //   C²-bounded pair join, the pe finisher and the point
    //   finisher, the grid-onto-sc attach inside consts, rank→n_eff,
    //   the final two); the persisted uterm/uw/consts/cells frames
    //   echo the SAME attaches under every InMemoryTableScan
    //   consumer (the q392 phenomenon at the bootstrap's greater
    //   plan depth). The former raw-substring caps (up to 65 for
    //   q397) could have absorbed a future genuinely data-shaped
    //   BNLJ; the pin is now STRUCTURAL — every BNLJ's build side
    //   must be provably ≤1 row (PlanChecks.dataShapedBnlj walks
    //   build subtrees through cache/AQE wrappers), so one real
    //   data-shaped BNLJ fails regardless of how many textual
    //   echoes the accepted attaches produce.
    for (name <- Seq("q393_ac1_bootstrap_ci", "q49_alpha_bootstrap_ci",
        "q394_isotonic_apply", "q395_eb_confseq",
        "q396_bmp_ahash_neardup", "q397_ac2_bootstrap_ci")) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty, name)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      // allowed non-1-row build: the AC2 grid — a C×C cross of the
      // CATEGORY dictionary (grouped on `cat`), bounded by the
      // instrument's category count, never by data volume
      val bad = graft.PlanChecks.dataShapedBnlj(df, Set("cat"))
      assert(bad.isEmpty, s"$name has data-shaped BNLJ:\n${bad.mkString("\n")}")
      graft.engine.TrackedCache.release()
    }
  }

  test("approximate sketches stay within tolerance of exact") {
    val exact = li.select(countDistinct("l_partkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct("l_partkey", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
    val (qLo, qHi) = {
      val r = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01)
      val ex = li.selectExpr("percentile(l_extendedprice, 0.5)").head().getDouble(0)
      (r(0), ex)
    }
    assert(math.abs(qLo - qHi) / qHi < 0.05)
  }
}
