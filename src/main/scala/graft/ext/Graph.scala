package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.TrackedCache.Trackable
import graft.engine.Skew.compactForOverhead

/** Graph operators over edge-list DataFrames.
  *
  * The reference catalog models entity links (occupation↔industry,
  * region↔occupation) as plain join tables; at training-data scale the
  * same shape appears as link graphs (page→page, doc→domain,
  * user→item) where *importance propagation* — PageRank — is the
  * canonical signal for crawl prioritization and source weighting.
  *
  * Scale design: the graph never leaves the cluster. Adjacency
  * (src, dst, deg) is built once — two shuffles (distinct + degree
  * count) — and cached; each iteration is then ONE shuffle (the
  * contribution groupBy). Ranks stay a node-keyed DataFrame; nothing
  * is collected to the driver. Iterations are a fixed small count
  * (PageRank converges geometrically at `damping^k`; 3–10 iterations
  * rank-order stabilizes long before values converge).
  *
  * Determinism across engines AND partitionings: per-edge
  * contributions `rank/deg` are quantized to integer micro-units
  * (`round(x * micro)` as BIGINT) before the sum. Integer addition is
  * associative, so Spark's partial-aggregation order and DuckDB's
  * single-threaded fold produce the SAME totals — the oracle replays
  * the iterations verbatim. The quantization error per iteration is
  * ≤ deg_in/micro ≈ 1e-12·deg, far below the round-6 reporting
  * precision. `micro` must satisfy nodes·micro < 2^63 (raise/lower it
  * for extreme node counts; the default covers ~9e6 nodes at 1e12).
  */
object Graph {

  /** Undirected, deduplicated, self-loop-free edge set with both
    * directions materialized: (src, dst). The dedup runs on the
    * CANONICAL (least, greatest) pair — half the rows of a
    * both-directions distinct — and the swap-union after it cannot
    * reintroduce duplicates (each canonical pair yields exactly one
    * row per direction). One shuffle. This is the frame for
    * algorithms that DON'T need degrees (label propagation, BFS);
    * they shouldn't pay the degree aggregation + join.
    */
  def undirectedEdges(edges: DataFrame, srcCol: String = "src",
                      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
                         col(dstCol).cast("string").as("dst"))
      .where(col("src") =!= col("dst"))
    val canon = e.select(least(col("src"), col("dst")).as("src"),
                         greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    canon.union(canon.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Undirected, deduplicated, self-loop-free edge set (both
    * directions materialized) with per-source degree attached:
    * (src, dst, deg). This is the reusable adjacency for iterative
    * algorithms — build once, cache, iterate. The degree frame is
    * node-dictionary-sized, so its join back onto the edges is
    * broadcast; for graphs whose node dictionary outgrows broadcast,
    * drop the hint — the fallback is one extra edge shuffle at build
    * time, never per iteration.
    */
  def undirectedAdjacency(edges: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    val und = undirectedEdges(edges, srcCol, dstCol)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    und.join(broadcast(deg), "src")
  }

  /** Item co-occurrence edges: the distinct pairs of items sharing a
    * group (parts sharing an order, docs sharing a domain), with the
    * canonical `a < b` orientation so each undirected edge appears
    * once. The self-join runs WITHIN groups, so the pair fan-out is
    * bounded by the basket size (TPC-H orders: ≤ 7 items → ≤ 21
    * pairs), never the table size — the projection of a bipartite
    * graph that stays linear when baskets are small. For heavy
    * groups (a domain with 10⁶ docs) cap the group size upstream —
    * the same `maxDf` discipline as the shingle joins.
    *
    * `maxItemDf`: the projection's EDGE set still grows
    * superlinearly through hot items — an item in d groups reaches
    * up to d·(basket−1) distinct partners, so doubling the data more
    * than doubles a popular item's edges (measured 3.2× edges for
    * 10× rows on the co-purchase graph). Setting `maxItemDf` drops
    * items appearing in more than that many groups BEFORE pairing
    * (the stopword move: a part in every order connects everything
    * to everything and carries no co-occurrence signal), bounding
    * any item's fan-out to maxItemDf·(basket−1). None = exact
    * projection (oracle parity at test scale); set it at corpus
    * scale.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
                        itemCol: String,
                        maxItemDf: Option[Long] = None): DataFrame = {
    // the row-scale distinct runs on NATIVE key types (guide §2.3:
    // narrower types — int pairs hash/compare far cheaper than their
    // string forms); the string cast is applied AFTER, which is
    // result-identical because cast-to-string is injective on the key
    // types used here, and the pair orientation below still compares
    // the STRING forms (the oracle's VARCHAR `<`)
    val g0 = df.select(col(groupCol).as("_gn"), col(itemCol).as("_in"))
      .distinct()
      .select(col("_gn").cast("string").as("g"),
        col("_in").cast("string").as("item"))
    val g = maxItemDf.fold(g0) { cap =>
      require(cap >= 1, s"coOccurrenceEdges: maxItemDf must be >= 1, got $cap")
      // one dictionary-sized aggregate + a broadcast-able semi-join:
      // the kept-items frame has ≤ |items| rows and shrinks with cap
      val kept = g0.groupBy("item").agg(count(lit(1)).as("_df"))
        .where(col("_df") <= cap).select("item")
      g0.join(kept, Seq("item"), "left_semi")
    }
    val a = g.select(col("g"), col("item").as("src"))
    val b = g.select(col("g"), col("item").as("dst"))
    a.join(b, Seq("g")).where(col("src") < col("dst"))
      .select("src", "dst").distinct()
  }

  /** Exact triangle count + global clustering coefficient via the
    * degree-ordered orientation (the MPC-standard "curse of the last
    * reducer" fix): rank every node by (degree, id), orient each edge
    * from the lower rank to the higher, and count wedges only at
    * their lowest-ranked corner. Out-degrees are then bounded by
    * O(sqrt(|E|)) on any graph (arboricity bound), so the wedge
    * self-join never explodes on hub nodes the way a naive
    * neighbor-pair join does. One row out:
    * (n_nodes, n_edges, n_wedges, n_triangles, global_cc) with
    * wedges = Σ C(deg,2) and cc = 3·triangles / wedges — everything
    * an exact integer except the final rounded ratio.
    */
  def triangleStats(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col(srcCol).cast("string").as("a"),
                          col(dstCol).cast("string").as("b"))
      .where(col("a") =!= col("b"))
    // canonical undirected edge set (u < v), then true degrees
    val und = compactForOverhead(
        e0.select(least(col("a"), col("b")).as("u"),
                  greatest(col("a"), col("b")).as("v")).distinct(),
        Seq(col("u"))) // r19 loop-cache compaction (see pageRankLazy)
      .trackedPersist()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // total order: rank by (deg, id) — the orientation key, computed
    // via Ranks.rowNumberExact (the only ordered window runs over the
    // bounded DEGREE-value dictionary, never a partition-less sort of
    // the node frame), cached for its three consumers, and cast to
    // INT: the wedge self-join + closure semi-join below key on the
    // rank, and the 4-byte key measurably matters (LONG keys ran the
    // wedge stage 4× slower at sf0.1 — 7.3 s vs 2.0 s). INT caps the
    // graph at 2^31 nodes; past that, widen to long and pay the
    // wider shuffle.
    val ranked = graft.engine.Ranks
      .rowNumberExact(deg, "deg", "node", out = "rk0", withTotal = false)
      .select(col("node"), col("deg"), col("rk0").cast("int").as("rk"))
      .trackedPersist()
    val rkOf = ranked.select(col("node"), col("rk"))
    // orient every edge low-rank → high-rank
    val oriented = und
      .join(rkOf.withColumnRenamed("node", "u")
                .withColumnRenamed("rk", "rku"), Seq("u"))
      .join(rkOf.withColumnRenamed("node", "v")
                .withColumnRenamed("rk", "rkv"), Seq("v"))
      .select(when(col("rku") < col("rkv"), col("rku")).otherwise(col("rkv")).as("lo"),
              when(col("rku") < col("rkv"), col("rkv")).otherwise(col("rku")).as("hi"))
      .trackedPersist()
    // wedges at the lowest corner: pairs of out-neighbors of `lo`;
    // a wedge closes iff (hi1, hi2) is itself an oriented edge
    val w1 = oriented.select(col("lo"), col("hi").as("h1"))
    val w2 = oriented.select(col("lo"), col("hi").as("h2"))
    val wedges = w1.join(w2, Seq("lo")).where(col("h1") < col("h2"))
    val tri = wedges.join(oriented.withColumnRenamed("lo", "h1")
                                  .withColumnRenamed("hi", "h2"),
                          Seq("h1", "h2"), "left_semi")
    val nTri = tri.agg(count(lit(1)).as("n_triangles"))
    // integer division per node: deg·(deg−1) is always even, so the
    // per-node `div 2` is exact and the sums never touch doubles
    val summary = ranked.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").cast("long").as("n_edges"),
      sum(expr("(deg * (deg - 1)) div 2")).cast("long").as("n_wedges"))
    summary.crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("global_cc"))
  }

  /** Link prediction over an undirected graph: score NON-adjacent
    * node pairs at distance 2 by common-neighbor statistics — the
    * classic "which edges are missing" primitive (recommendations,
    * knowledge-graph completion, dedup-edge suggestion). Per
    * candidate pair (u, v):
    *
    *   - `cn`: |Γ(u) ∩ Γ(v)| (common neighbors)
    *   - `adamic_adar`: Σ_w 1/ln(deg(w)) over common neighbors w —
    *     rare shared neighbors weigh more (Adamic & Adar 2003,
    *     public literature)
    *   - `jaccard`: cn / (deg(u) + deg(v) − cn)
    *
    * Candidates are generated by the wedge join at the CENTER node
    * (each common neighbor w emits one (u, v) wedge), so only pairs
    * with cn ≥ 1 ever materialize — never the n² pair space. The
    * per-wedge Adamic–Adar contribution is micro-quantized to a
    * BIGINT (`round(1e9/ln deg)`) before the sum, making the
    * aggregate order-free (deg ≥ 2 for any wedge center, so ln > 0).
    * Existing edges drop via one anti-join on the canonical pair.
    *
    * Scale: wedge fan-out is Σ C(deg(w), 2) — quadratic in HUB
    * degrees. `maxCenterDeg` drops centers above the cap BEFORE the
    * wedge join (their per-wedge weight 1/ln(deg) is the smallest in
    * the graph, so high-degree centers add the least signal per row
    * — the same stopword argument as `coOccurrenceEdges.maxItemDf`);
    * None keeps the exact score. The top-k cut is a TakeOrdered
    * (sort+limit), not a single-partition window.
    */
  def linkPrediction(edges: DataFrame, topK: Int = 50,
                     srcCol: String = "src", dstCol: String = "dst",
                     maxCenterDeg: Option[Long] = None): DataFrame = {
    val und = undirectedEdges(edges, srcCol, dstCol)
      .trackedPersist()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    // deg-1 centers can't form a wedge, and ln(1) = 0 would divide by
    // zero under ANSI mode — prune them before the contribution expr
    val centers0 = und.join(broadcast(deg), "src").where(col("deg") >= 2)
    val centers = maxCenterDeg.fold(centers0) { cap =>
      require(cap >= 2, s"linkPrediction: maxCenterDeg must be >= 2, got $cap")
      centers0.where(col("deg") <= cap)
    }
    // per-wedge weight in MICRO units; scores are reported as the
    // exact BIGINT sum divided by 1e6 with NO final round(x, 6) — a
    // quantized sum can land exactly on a 6-dp half boundary, where
    // Spark's decimal HALF_UP and another engine's double rounding
    // disagree (the q218 lesson)
    val contrib = centers.select(col("src").as("w"), col("dst").as("u"),
      round(lit(1e6) / log(col("deg").cast("double"))).cast("long").as("c_u"))
    val wedges = contrib.join(
      contrib.select(col("w"), col("u").as("v")), Seq("w"))
      .where(col("u") < col("v"))
    val scored = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("cn"), sum("c_u").as("aa_u"))
    val existing = und.where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    val nonEdges = scored.join(existing, Seq("u", "v"), "left_anti")
    nonEdges
      .join(broadcast(deg.select(col("src").as("u"), col("deg").as("deg_u"))),
        Seq("u"))
      .join(broadcast(deg.select(col("src").as("v"), col("deg").as("deg_v"))),
        Seq("v"))
      .orderBy(col("aa_u").desc, col("u"), col("v"))
      .limit(topK)
      .select(col("u"), col("v"), col("cn"), col("deg_u"), col("deg_v"),
        (round(col("cn") * lit(1e6) /
            (col("deg_u") + col("deg_v") - col("cn"))).cast("long")
          .cast("double") / 1e6).as("jaccard"),
        (col("aa_u").cast("double") / 1e6).as("adamic_adar"))
  }

  /** Personalized PageRank: random walks teleport back to the SEED
    * set instead of everywhere — rank becomes "proximity to the
    * seeds", the graph-recommendation / related-entities primitive
    * (vs [[pageRank]]'s global importance). Same iteration shape and
    * integer micro-unit contribution sums as [[pageRank]]: one
    * cached adjacency, one shuffle per iteration. The teleport mass
    * 1/|seeds| and the damping constants are computed once and the
    * SAME doubles enter any SQL replay (emit them at %.17g).
    * Seeds absent from the graph hold teleport mass that never
    * circulates — by design (their share of the walk is "lost", as
    * in the standard formulation over the induced graph).
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iterations: Int = 3, damping: Double = 0.85,
                           micro: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "personalizedPageRank: iterations must be >= 1")
    val adj = compactForOverhead(undirectedAdjacency(edges),
        Seq(col("src"))) // r19 loop-cache compaction (see pageRankLazy)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(col(seeds.columns.head).cast("string")
      .as("node")).distinct()
    val nSeeds = seedSet.agg(count(lit(1)).as("ns"))
    val base = adj.select(col("src").as("node")).distinct()
      .join(seedSet.withColumn("_isSeed", lit(1)), Seq("node"), "left")
      .crossJoin(broadcast(nSeeds))
      .select(col("node"),
        when(col("_isSeed") === 1, lit(1.0) / col("ns")).otherwise(lit(0.0))
          .as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = base.select(col("node"), col("s").as("rank"))
    for (i <- 1 to iterations) {
      // ranks and contribs are node-dictionary-sized — broadcast both
      // joins so the cached edge table never re-shuffles (the q126
      // plan posture; derived frames lack size estimates here, so an
      // explicit hint replaces the estimate). For graphs whose node
      // dictionary outgrows broadcast, drop the hints: the plan falls
      // back to one edge-shuffle per iteration, still correct.
      val contribs = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          round(col("rank") / col("deg") * micro).cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("cs"))
      ranks = base.join(broadcast(contribs), Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) * col("s") +
            lit(damping) * (coalesce(col("cs"), lit(0L)).cast("double") / micro),
            9).as("rank"))
      if (i % 5 == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
    }
    // materialize the node-sized result once, then free the cached
    // adjacency + seed frames instead of leaking them session-wide;
    // the result checkpoint's blocks go to the RDD ledger for the
    // harness's post-materialization release()
    val out = ranks.localCheckpoint(true)
    adj.unpersist(false)
    base.unpersist(false)
    graft.engine.TrackedCache.adoptRdds(
      org.apache.spark.sql.GraftBridge.leafRdds(out))
    out
  }

  /** Semi-supervised label propagation: `seedLabels` (node, label)
    * stay CLAMPED; each round, every still-unlabeled node adopts the
    * majority label of its labeled neighbors, ties to the smallest
    * label — fully deterministic, so a fixed round count replays
    * exactly in SQL. The "spread the 2% human labels over the
    * similarity graph" operator. Per round: one join of the cached
    * adjacency against current labels + one (node, label) count +
    * one argmax window over the candidate dictionary.
    */
  def labelPropagation(edges: DataFrame, seedLabels: DataFrame,
                       rounds: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1 && rounds <= 10, s"labelPropagation: rounds 1..10")
    val adj = compactForOverhead(undirectedEdges(edges),
        Seq(col("src"))) // r19 loop-cache compaction (see pageRankLazy)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seeds = seedLabels.select(
      col(seedLabels.columns(0)).cast("string").as("node"),
      col(seedLabels.columns(1)).cast("string").as("label")).distinct()
    var labeled = seeds.persist(StorageLevel.MEMORY_AND_DISK)
    // each round's label frame is persisted, materialized by its own
    // count, and the superseded generation unpersisted immediately —
    // executor storage holds at most two generations at any instant.
    // persist+count beats an eager localCheckpoint for STORAGE, but
    // the LOGICAL plan still embeds `labeled` three times per round
    // (two vote joins + the union), so analysis cost grows 3^rounds —
    // the kcorePeel lesson. A localCheckpoint every 4th round cuts
    // the lineage (plan segments stay ≤ 3^4 nodes) at one extra copy
    // job per cut; superseded checkpoint blocks are freed at the NEXT
    // cut (earlier would strand the persisted generations built on
    // them — localCheckpoint leaves no lineage to recompute from).
    var liveCkptRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    for (r <- 1 to rounds) {
      val votes = adj
        .join(labeled.withColumnRenamed("node", "src"), Seq("src"))
        .join(labeled.select(col("node").as("dst")), Seq("dst"), "left_anti")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("votes"))
      val won = votes.withColumn("_rk", row_number().over(
          Window.partitionBy("node")
            .orderBy(col("votes").desc, col("label"))))
        .where(col("_rk") === 1).select("node", "label")
      val isCkpt = r % 4 == 0
      val next =
        if (isCkpt) labeled.unionByName(won).localCheckpoint(true)
        else labeled.unionByName(won).persist(StorageLevel.MEMORY_AND_DISK)
      if (!isCkpt) next.count()
      labeled.unpersist(false) // no-op when labeled was a checkpoint
      if (isCkpt) {
        liveCkptRdds.foreach(_.unpersist(blocking = false))
        liveCkptRdds = org.apache.spark.sql.GraftBridge.leafRdds(next)
      }
      labeled = next
    }
    adj.unpersist(false)
    // self-contain the final generation (one node-scale checkpoint if
    // the loop didn't just cut), then free every intermediate cut's
    // blocks NOW — previously the last cut's RDDs outlived the call,
    // invisible to both unpersist and the DataFrame ledger. The final
    // checkpoint's own blocks go to the RDD ledger so the harness's
    // release() frees them after the caller materializes the result.
    val out =
      if (rounds % 4 == 0) labeled // the last round WAS a checkpoint
      else {
        val c = labeled.localCheckpoint(true)
        labeled.unpersist(false)
        liveCkptRdds.foreach(_.unpersist(blocking = false))
        c
      }
    graft.engine.TrackedCache.adoptRdds(
      org.apache.spark.sql.GraftBridge.leafRdds(out))
    out
  }

  /** Degree assortativity (Newman's r) of the undirected graph —
    * "do hubs link to hubs?" (r > 0) or to leaves (r < 0); the one
    * number that separates social-style from web-style link
    * structure. Per-edge sums Σdu·dv, Σ(du+dv), Σ(du²+dv²) are exact
    * BIGINTs over the canonical (u < v) edge set; r is a fixed IEEE
    * expression over them. One degree aggregation + two
    * dictionary-key joins + one global fold.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("string").as("a"),
                          col(dstCol).cast("string").as("b"))
      .where(col("a") =!= col("b"))
    // und feeds three consumers (degree agg + the edge join's probe
    // side) and deg two — cache both or the distinct's shuffle and
    // the upstream pair fan-out replay per consumer
    val und = compactForOverhead(
        e0.select(least(col("a"), col("b")).as("u"),
                  greatest(col("a"), col("b")).as("v")).distinct(),
        Seq(col("u"))) // r19 loop-cache compaction (see pageRankLazy)
      .trackedPersist()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .trackedPersist()
    val j = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val agg = j.agg(count(lit(1)).as("m"),
      sum(col("du") * col("dv")).as("sp"),
      sum(col("du") + col("dv")).as("s1"),
      sum(col("du") * col("du") + col("dv") * col("dv")).as("s2"))
    val mean = col("s1").cast("double") / (lit(2) * col("m"))
    agg.crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .select(col("n_nodes"), col("m").cast("long").as("n_edges"),
        round((col("sp").cast("double") / col("m") - mean * mean) /
          (col("s2").cast("double") / (lit(2) * col("m")) - mean * mean), 6)
          .as("assortativity"))
  }

  /** Modularity of a GIVEN node partition (Newman–Girvan Q, public
    * literature: Newman & Girvan 2004) over the undirected simple
    * graph: Q = Σ_c [ L_c/m − (d_c/(2m))² ] where m is the edge
    * count, L_c the edges with both endpoints in community c and
    * d_c the community's degree sum. The labels come from the
    * caller (an attribute, a label-propagation run, an ER cluster
    * map) — this operator SCORES a partition, it doesn't find one,
    * which is exactly the missing half of q215: "are these
    * communities better than chance?".
    *
    * Output: one row per community — (community, n_nodes,
    * within_edges, degree_sum, dq) with dq the community's exact
    * contribution to Q as a 1e9-quantized term; Σ dq = Q. Every
    * input to the final expression is an exact BIGINT, so the
    * rounded double is engine-reproducible.
    *
    * Scale: canonical-pair dedup (one shuffle), a node-dictionary
    * broadcast of the label map onto both endpoints, then one
    * community-keyed aggregation — no iteration, no all-pairs
    * anything. Nodes missing from `labels` fall into their own
    * singleton community keyed by the node id (isolated-node
    * convention, stated rather than silent).
    */
  def modularity(edges: DataFrame, labels: DataFrame,
                 nodeCol: String = "node", labelCol: String = "label",
                 srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("string").as("a"),
                          col(dstCol).cast("string").as("b"))
      .where(col("a") =!= col("b"))
    val und = compactForOverhead(
        e0.select(least(col("a"), col("b")).as("u"),
                  greatest(col("a"), col("b")).as("v")).distinct(),
        Seq(col("u"))) // r19 loop-cache compaction (see pageRankLazy)
      .trackedPersist()
    val lab = labels.select(col(nodeCol).cast("string").as("node"),
                            col(labelCol).cast("string").as("lab"))
    val tagged = und
      .join(broadcast(lab.select(col("node").as("u"), col("lab").as("cu"))),
        Seq("u"), "left")
      .join(broadcast(lab.select(col("node").as("v"), col("lab").as("cv"))),
        Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("cu"),
              coalesce(col("cv"), col("v")).as("cv"))
      .trackedPersist()
    val m = tagged.agg(count(lit(1)).as("m"))
    // degree sum per community = endpoint incidences per community
    val degc = tagged.select(col("cu").as("community"))
      .union(tagged.select(col("cv").as("community")))
      .groupBy("community").agg(count(lit(1)).as("degree_sum"))
    val within = tagged.where(col("cu") === col("cv"))
      .groupBy(col("cu").as("community"))
      .agg(count(lit(1)).as("within_edges"))
    val nodes = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node"))).distinct()
      .join(broadcast(lab), Seq("node"), "left")
      .select(coalesce(col("lab"), col("node")).as("community"))
      .groupBy("community").agg(count(lit(1)).as("n_nodes"))
    // within/nodes are community-dictionary frames — bounded by the
    // label map that already rides a broadcast, so these joins
    // broadcast too (ScaleSpec pins the no-SMJ shape)
    degc.join(broadcast(within), Seq("community"), "left")
      .join(broadcast(nodes), Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("within_edges"), lit(0L)).as("within_edges"),
        col("degree_sum"),
        ((round(coalesce(col("within_edges"), lit(0L)).cast("double") * 1e9 /
            col("m")).cast("long") -
          round(col("degree_sum").cast("double") * col("degree_sum") * 1e9 /
            (lit(4.0) * col("m") * col("m"))).cast("long")).cast("double") /
          1e9).as("dq"))
      .orderBy("community")
  }

  /** One Louvain local-move pass over a GIVEN partition (Blondel et
    * al. 2008, public literature): for every node and every
    * NEIGHBORING community c ≠ its own, the exact modularity gain
    * ΔQ(i→c) = (k_{i,c} − k_{i,cᵢ})/m − k_i·(Σtot_c − Σtot_cᵢ + k_i)/(2m²),
    * reported as the top-`topK` improving moves — the refinement
    * step that turns [[modularity]]'s score into an actionable
    * "these nodes are mislabeled" list without running the full
    * iterative algorithm. Every input to the 1e9-quantized gain is
    * an exact BIGINT (degrees, community degree sums, neighbor-
    * community edge counts).
    *
    * Scale: the canonical edge dedup, one (node, neighbor-community)
    * rollup, node-degree and community-degree-sum dictionaries on
    * broadcasts, and a TakeOrdered cut. No iteration — this is ONE
    * pass; loop it externally for full Louvain.
    */
  def louvainMoveGain(edges: DataFrame, labels: DataFrame,
                      topK: Int = 20,
                      nodeCol: String = "node", labelCol: String = "label",
                      srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    require(topK >= 1, s"louvainMoveGain: topK must be >= 1, got $topK")
    val und = undirectedEdges(edges, srcCol, dstCol)
      .trackedPersist() // both directions, deduped
    val lab = labels.select(col(nodeCol).cast("string").as("node"),
      col(labelCol).cast("string").as("lab"))
    val m = und.agg((count(lit(1)) / 2L).cast("long").as("m"))
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("k"))
      .trackedPersist()
    // community of every node (unlabeled → singleton, q244 convention)
    val comm = deg.select(col("node"))
      .join(broadcast(lab), Seq("node"), "left")
      .select(col("node"), coalesce(col("lab"), col("node")).as("c"))
      .trackedPersist()
    val sigma = und.select(col("src").as("node"))
      .join(broadcast(comm), "node")
      .groupBy("c").agg(count(lit(1)).as("sigma_tot"))
    // k_{i,c}: node's edges into each neighboring community
    val kic = und
      .join(broadcast(comm.select(col("node").as("dst"),
        col("c").as("cn"))), "dst")
      .groupBy(col("src").as("node"), col("cn"))
      .agg(count(lit(1)).as("kic"))
    val own = comm.select(col("node"), col("c").as("ci"))
    val kici = kic.join(broadcast(own), "node")
      .where(col("cn") === col("ci"))
      .select(col("node"), col("kic").as("kici"))
    val cand = kic.join(broadcast(own), "node")
      .where(col("cn") =!= col("ci"))
      .join(broadcast(kici), Seq("node"), "left")
      .na.fill(0L, Seq("kici"))
      .join(broadcast(deg), "node")
      .join(broadcast(sigma.select(col("c").as("cn"),
        col("sigma_tot").as("st_to"))), "cn")
      .join(broadcast(sigma.select(col("c").as("ci"),
        col("sigma_tot").as("st_from"))), "ci")
      .crossJoin(broadcast(m))
    cand.select(col("node"), col("ci").as("from_community"),
        col("cn").as("to_community"), col("k"), col("kic"),
        (round(((col("kic") - col("kici")).cast("double") / col("m") -
          col("k").cast("double") *
            (col("st_to") - col("st_from") + col("k")).cast("double") /
            (lit(2.0) * col("m").cast("double") * col("m").cast("double")))
          * lit(1e9)).cast("long").cast("double") / 1e9).as("dq"))
      .orderBy(col("dq").desc, col("node"), col("to_community"))
      .limit(topK)
  }

  /** Min-hop BFS from a seed set, bounded to `maxHops` frontier
    * expansions. Returns (node, hop) for every reached node. Each
    * hop is ONE join of the (shrinking) frontier against the cached
    * adjacency plus an anti-join against the visited set — no
    * driver-side state, frontier never collected. Fixed small hop
    * counts (the "blast radius" question) keep the plan linear; for
    * unbounded reachability use the connected-components operator
    * instead.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
              srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 20, s"bfsHops: maxHops 1..20, got $maxHops")
    val adj = undirectedEdges(edges, srcCol, dstCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // each hop's frontier is persisted and materialized by its own
    // count; `visited` is the lazy union of those cached frontiers
    // (scanning cached blocks, no recompute). Nothing is superseded —
    // every frontier is part of the result — so nothing unpersists
    // mid-loop; persist+count gives the checkpoint's storage bound
    // without the extra copy job, and keeps lineage for eviction
    // recovery (maxHops ≤ 20 keeps the union plan small).
    var visited = seeds.select(col(seeds.columns.head).cast("string").as("node"))
      .distinct().withColumn("hop", lit(0))
      .trackedPersist()
    visited.count()
    var frontier = visited.select("node")
    var hop = 0
    while (hop < maxHops) {
      hop += 1
      val next = adj.join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
        .trackedPersist()
      next.count()
      visited = visited.union(next)
      frontier = next.select("node")
    }
    adj.unpersist(false)
    visited
  }

  /** HITS hubs-and-authorities over the DIRECTED edge set — the
    * complement of [[pageRank]]'s undirected importance: on bipartite
    * link structures (part→supplier, page→domain, query→doc) hub and
    * authority scores separate "points at good things" from "is
    * pointed at by good things" (Kleinberg 1999). Fixed iteration
    * count; each half-step is ONE keyed shuffle over the cached edge
    * set with the score frame riding as a broadcast (same posture as
    * pageRank — for node dictionaries beyond broadcast the joins
    * degrade to shuffles, no rewrite).
    *
    * Determinism across engines AND partitionings, the q126
    * discipline: per-edge contributions quantize to integer `micro`
    * units before summing (associative BIGINT adds), and each
    * half-step L1-normalizes by the EXACT integer total (one scalar
    * subquery in the replay; a broadcast 1-row frame here), so the
    * double division sees the same two integers everywhere. Scores
    * round to 9 places per half-step — SQL replays CTE-by-CTE.
    *
    * Returns (node, a, h): authority and hub score per node, 0.0
    * where a side doesn't apply (pure hubs have a = 0).
    */
  def hits(edges: DataFrame, iterations: Int = 2,
           micro: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"hits: iterations 1..10, got $iterations")
    val e = compactForOverhead(
        edges.select(col("src").cast("string").as("src"),
                     col("dst").cast("string").as("dst"))
          .where(col("src") =!= col("dst")).distinct(),
        Seq(col("src"))) // r19 loop-cache compaction (see pageRankLazy)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var hub = e.select(col("src").as("node")).distinct()
      .withColumn("h", lit(1.0))
    var auth: DataFrame = e.select(col("dst").as("node")).distinct()
      .withColumn("a", lit(0.0))
    // each half-step's count frame feeds TWO consumers (its rows and
    // its own L1 total) and the next half-step builds on it — left
    // lazy, the 2·iterations-deep diamond replays the edge join
    // exponentially (measured 18 s for 2 iterations at sf0.1 vs ~4 s
    // materialized). So: persist + count each node-dictionary-sized
    // count frame, unpersist the superseded generation (the
    // labelPropagation loop discipline).
    var live: Seq[DataFrame] = Nil
    var allCkptRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    for (it <- 1 to iterations) {
      val aq = e.join(broadcast(hub.withColumnRenamed("node", "src")), Seq("src"))
        .select(col("dst").as("node"),
          round(col("h") * micro).cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("q"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      aq.count()
      auth = aq.crossJoin(broadcast(aq.agg(sum("q").as("tot"))))
        .select(col("node"),
          round(col("q").cast("double") / col("tot").cast("double"), 9).as("a"))
      val hq = e.join(broadcast(auth.withColumnRenamed("node", "dst")), Seq("dst"))
        .select(col("src").as("node"),
          round(col("a") * micro).cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("q"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      hq.count()
      hub = hq.crossJoin(broadcast(hq.agg(sum("q").as("tot"))))
        .select(col("node"),
          round(col("q").cast("double") / col("tot").cast("double"), 9).as("h"))
      // DEPTH-SCALED lineage cuts (VERDICT r10 #3): hub/auth embed
      // the previous generation ~4× each, so unbounded iteration
      // would blow ANALYSIS cost (the kcorePeel lesson, 4^10 plan
      // nodes at the bound) — but execution is already bounded by
      // the persist+count above, so the cut only serves plan depth.
      // Cutting every 4th round caps depth at ~4^4 nodes while the
      // common small-iteration runs (default 2) skip the two copy
      // jobs per round entirely (r10's per-iteration cuts cost
      // ~20% of q228 at sf0.1 for no asymptotic benefit).
      if (it % 4 == 0 && it < iterations) {
        hub = hub.localCheckpoint(true)
        auth = auth.localCheckpoint(true)
        allCkptRdds = allCkptRdds ++
          org.apache.spark.sql.GraftBridge.leafRdds(hub) ++
          org.apache.spark.sql.GraftBridge.leafRdds(auth)
      }
      live.foreach(_.unpersist(false))
      live = Seq(aq, hq)
    }
    val out = hub.join(auth, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("a"), lit(0.0)).as("a"),
        coalesce(col("h"), lit(0.0)).as("h"))
      .localCheckpoint(true)
    live.foreach(_.unpersist(false))
    e.unpersist(false)
    allCkptRdds.foreach(_.unpersist(blocking = false))
    // the final checkpoint's own node-scale blocks: ledgered so the
    // harness's release() frees them post-materialization
    graft.engine.TrackedCache.adoptRdds(
      org.apache.spark.sql.GraftBridge.leafRdds(out))
    out
  }

  /** Fixed-round k-core peel: each round removes every node whose
    * current degree is below `k`, then drops edges touching removed
    * nodes — the standard "dense cohesive core" extraction (spam/
    * community cores in link graphs, well-connected neighborhoods in
    * kNN graphs). A fixed round count replays exactly in SQL (the
    * q215 discipline); full convergence is `rounds ≈ O(peel depth)`,
    * usually single digits. Per round: one degree aggregation + two
    * semi-joins — linear in edges; driver state is three longs per
    * round (the readout row), nothing graph-sized.
    *
    * Loop hygiene: each round's edge set is persisted, MATERIALIZED
    * by its own count, and the superseded generation unpersisted
    * immediately — executor storage holds at most two generations at
    * any instant instead of `rounds` dead ones (ContextCleaner is
    * best-effort; at 100 TB edge sets, relying on it fills storage
    * with dead generations). GraphSpec pins this.
    *
    * Returns one row per round boundary: (round, n_nodes, n_edges)
    * where round 0 is the raw graph (nodes = endpoints with ≥ 1
    * edge) and round r ≥ 1 counts the nodes that SURVIVED peel r and
    * the edges between them.
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 10,
      s"kcorePeel: need k >= 1 and rounds in 1..10, got k=$k rounds=$rounds")
    val spark = edges.sparkSession
    val e0 = edges.select(col("src").cast("string").as("a"),
                          col("dst").cast("string").as("b"))
      .where(col("a") =!= col("b"))
    var cur = e0.select(least(col("a"), col("b")).as("u"),
                        greatest(col("a"), col("b")).as("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val r0 = peelDegrees(cur)
      .agg(count(lit(1)).as("n_nodes"),
        expr("sum(deg) div 2").cast("long").as("n_edges")).head()
    val rows = scala.collection.mutable.ArrayBuffer(
      (0L, r0.getLong(0), r0.getLong(1)))
    // each round's plan embeds `cur` FIVE times (peelDegrees twice in
    // keep ×2 references + peelRound once), so a persist+count loop
    // grows the ANALYZED plan 5× per round — physical execution stays
    // cheap (InMemoryRelation), but Catalyst's per-execution analysis
    // + plan stringification explode super-linearly in plan nodes
    // (measured: round-5 count on 60 edges = 595 s, with 2 GiB plan
    // strings). localCheckpoint(eager) materializes AND truncates the
    // lineage to a LogicalRDD each round — the Dedup CC discipline —
    // with superseded checkpoint blocks freed explicitly.
    var liveCkptRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    for (r <- 1 to rounds) {
      val keep = peelDegrees(cur).where(col("deg") >= k).select("node")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val next = peelRound(cur, keep).localCheckpoint(true)
      val nEdges = next.count() // already materialized; cheap job
      rows += ((r.toLong, keep.count(), nEdges))
      cur.unpersist(false) // frees round 0's cache; no-op on checkpoints
      keep.unpersist(false)
      liveCkptRdds.foreach(_.unpersist(blocking = false))
      liveCkptRdds = org.apache.spark.sql.GraftBridge.leafRdds(next)
      cur = next
    }
    // the counts are extracted — the final generation's blocks can go
    liveCkptRdds.foreach(_.unpersist(blocking = false))
    import spark.implicits._
    rows.toSeq.toDF("round", "n_nodes", "n_edges").orderBy("round")
  }

  /** Degree table of a canonical (u < v) edge set — the per-round
    * peel aggregation. Factored out so ScaleSpec can pin the round's
    * plan shape without running the eager loop.
    */
  private[graft] def peelDegrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** One k-core peel round: keep only edges whose BOTH endpoints
    * survive, via two left-semi equi-joins on the survivor set.
    * Linear in edges; no cross product anywhere — this is the exact
    * frame kcorePeel materializes each round.
    */
  private[graft] def peelRound(cur: DataFrame, keep: DataFrame): DataFrame =
    cur
      .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      .select("u", "v")

  /** Fixed-iteration PageRank on the undirected graph of `edges`.
    * Returns (node, rank) for every node; ranks sum to ≈ node count
    * (undirected symmetrization leaves no dangling mass).
    *
    * rank_0 = 1.0; rank_{k+1} = (1−d) + d·Σ_{u→v} rank_k(u)/deg(u),
    * with the sum taken over integer micro-units (see object doc).
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 3,
               damping: Double = 0.85,
               micro: Long = 1000000000000L): DataFrame = {
    val (ranks, adj) = pageRankLazy(edges, srcCol, dstCol, iterations,
      damping, micro)
    // ONE end-of-loop materialization of the node-dictionary-sized
    // result, so the edge-sized adjacency cache can be freed NOW
    // instead of leaking into every later query of the session; the
    // result checkpoint's blocks are ledgered for release()
    val out = ranks.localCheckpoint(true)
    adj.unpersist(false)
    graft.engine.TrackedCache.adoptRdds(
      org.apache.spark.sql.GraftBridge.leafRdds(out))
    out
  }

  /** The lazy pageRank iteration plan, plus the cached adjacency it
    * reads (caller materializes + unpersists). Factored out so
    * ScaleSpec can pin the per-iteration plan shape — [[pageRank]]
    * itself returns a checkpointed frame whose plan is opaque.
    */
  private[graft] def pageRankLazy(edges: DataFrame, srcCol: String,
                                  dstCol: String, iterations: Int,
                                  damping: Double,
                                  micro: Long): (DataFrame, DataFrame) = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    // plan shape (verified via explain at sf0.1): ranks is node-sized
    // → every iteration joins as BroadcastHashJoin over the CACHED
    // adjacency, so the edge table never re-shuffles; per-iteration
    // cost is one broadcast + one Exchange (the contribution groupBy).
    // For billion-node graphs where ranks outgrows broadcast, Spark
    // falls back to a shuffle join keyed on src — still one
    // edge-shuffle per iteration, no plan change needed here.
    // r19: size-derived partition compaction before the loop cache
    // (guide §2.2) — every iteration re-reads this frame; see
    // Skew.compactForOverhead for the rule and the measurements
    val adj = compactForOverhead(
        undirectedAdjacency(edges, srcCol, dstCol), Seq(col("src")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = adj.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0))
    for (i <- 1 to iterations) {
      // one shuffle per iteration: the contribution sum keyed by dst.
      // deg >= 1 by construction (node appears => it has an edge).
      val contribs = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          round(col("rank") / col("deg") * micro).cast("long").as("c"))
      ranks = contribs.groupBy("node").agg(sum("c").as("cs"))
        .select(col("node"),
          round(lit(1.0 - damping) +
            lit(damping) * (col("cs").cast("double") / micro), 9).as("rank"))
      // long runs: cut lineage so iteration k doesn't replan k joins
      // (same discipline as Dedup's connected-components loop)
      if (i % 5 == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
    }
    (ranks, adj)
  }

  /** Deterministic random-walk trajectories — the DeepWalk/node2vec
    * sampling stage of a graph-embedding training pipeline, made
    * replayable: from EVERY node, one `steps`-step walk whose step-t
    * neighbor choice is the md5 coin (start node : seed : t) mod the
    * CURRENT node's degree over its sorted neighbor list. No RNG
    * state — the walk set is a pure function of (graph, seed), so a
    * retried stage regenerates identical training pairs and the
    * DuckDB oracle replays every trajectory bit-exactly (the same
    * md5-coin discipline as the stratified sampler and dp-counts).
    *
    * Returns (start, step, node) for steps 1..`steps` — |V|·steps
    * rows, linear in the graph. Scale shape: the indexed adjacency
    * (neighbor rank within each node's sorted list) is one
    * PARTITIONED window over per-node frames; each step is one
    * equi-join of the walk frontier against it on (node, chosen
    * index); `steps` is a small constant, so the whole plan is
    * `steps` node-keyed shuffles. Adjacency and degrees are built
    * once and ledger-cached for the loop.
    */
  def deterministicWalks(edges: DataFrame, steps: Int,
                         seed: String): DataFrame = {
    require(steps >= 1, s"deterministicWalks: steps >= 1, got $steps")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // persist the INDEXED adjacency and degrees, not the raw edge
    // list: each of the `steps` joins reads both, and an unpersisted
    // window would re-sort every per-node frame once per step
    val adjIdx = compactForOverhead(
        und.withColumn("idx",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("src").orderBy("dst")) - 1).cast("long")),
        Seq(col("src"))) // r19 loop-cache compaction (see pageRankLazy)
      .trackedPersist(StorageLevel.MEMORY_AND_DISK_SER)
    val deg = adjIdx.groupBy("src").agg(count(lit(1)).as("deg"))
      .trackedPersist(StorageLevel.MEMORY_AND_DISK_SER)
    var frontier = deg.select(col("src").as("start"), col("src").as("cur"))
    var out: DataFrame = null
    for (t <- 1 to steps) {
      val coin = conv(substring(md5(concat(col("start"),
        lit(s":$seed:$t"))), 1, 15), 16, 10).cast("long")
      val next = frontier
        .join(deg.select(col("src").as("cur"), col("deg")), Seq("cur"))
        .withColumn("_i", pmod(coin, col("deg")))
        // equi-join on BOTH (node, chosen index): exactly one neighbor
        // row matches — no per-degree expansion then filter
        .join(adjIdx.select(col("src").as("cur"), col("idx").as("_i"),
          col("dst")), Seq("cur", "_i"))
        .select(col("start"), col("dst").as("cur"))
        // step-chain-union replay guard (the q311/q315 lesson): each
        // union branch below re-evaluates its frontier chain, so an
        // unpersisted step t would recompute steps 1..t once per
        // LATER branch — steps(steps+1)/2 join rounds instead of
        // `steps` (measured 590 s of task CPU on the sf0.1 q321
        // chain, ~2× from exactly this). The frontier is node-sized,
        // so the ledger-persist is cheap at any scale.
        .trackedPersist(StorageLevel.MEMORY_AND_DISK_SER)
      val traj = next.select(col("start"), lit(t).as("step"),
        col("cur").as("node"))
      out = if (out == null) traj else out.unionByName(traj)
      frontier = next
    }
    out.orderBy("start", "step")
  }

  /** Deterministic node2vec walks — [[deterministicWalks]] upgraded
    * to SECOND-ORDER (biased) sampling: from step 2 on, the neighbor
    * choice at `cur` depends on where the walk came from (`prev`),
    * with INTEGER weights — `wBack` for returning to `prev` (the 1/p
    * return bias), `wCommon` for neighbors shared with `prev` (BFS-ish
    * locality), `wFar` for the rest (DFS-ish exploration, the 1/q
    * bias). Integer weights keep every cumulative sum exact, so the
    * md5 coin (start:seed:t) mod total-weight picks the same neighbor
    * in Spark and the DuckDB oracle, bit-for-bit.
    *
    * Scale shape per step: one equi-join of the frontier against the
    * indexed adjacency on the current node, one LEFT join against the
    * edge set for the common-neighbor flag, and one PARTITIONED
    * window (by walk id) over each walk's candidate frame — bounded
    * by max degree, never row-scale global. Adjacency, degrees and
    * the edge set build once and ride the TrackedCache ledger.
    */
  def node2vecWalks(edges: DataFrame, steps: Int, seed: String,
                    wBack: Int = 1, wCommon: Int = 4,
                    wFar: Int = 2): DataFrame = {
    require(steps >= 1, s"node2vecWalks: steps >= 1, got $steps")
    require(wBack >= 1 && wCommon >= 1 && wFar >= 1,
      s"node2vecWalks: weights must be >= 1, got ($wBack, $wCommon, $wFar)")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .trackedPersist(StorageLevel.MEMORY_AND_DISK_SER)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .trackedPersist(StorageLevel.MEMORY_AND_DISK_SER)
    def coin(t: Int) = conv(substring(md5(concat(col("start"),
      lit(s":$seed:$t"))), 1, 15), 16, 10).cast("long")
    // step 1 is first-order (no prev yet): uniform md5 coin mod degree,
    // identical to deterministicWalks so the two samplers share a
    // prefix. Every step's frontier is ledger-CHECKPOINTED (it is
    // only |V| rows): the output union references each step from two
    // places (its own traj branch + the next step's parent), and an
    // unmaterialized chain would replay every candidate expansion
    // once per reference — the q311 lesson, measured at 4× here.
    val first = graft.engine.TrackedCache.trackedLocalCheckpoint(
      deg.select(col("src").as("start"), col("src").as("cur"))
        .join(deg.select(col("src").as("cur"), col("deg")), Seq("cur"))
        .withColumn("_i", pmod(coin(1), col("deg")))
        .join(und.select(col("src").as("cur"),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("src").orderBy("dst")) - 1).cast("long").as("_i"),
          col("dst")), Seq("cur", "_i"))
        .select(col("start"), col("cur").as("prev"), col("dst").as("cur")))
    var frontier = first
    var out = first.select(col("start"), lit(1).as("step"),
      col("cur").as("node"))
    for (t <- 2 to steps) {
      val cand = frontier
        .join(und.select(col("src").as("cur"), col("dst")), Seq("cur"))
        .join(und.select(col("src").as("prev"), col("dst"),
          lit(1).as("_e")), Seq("prev", "dst"), "left")
        .withColumn("w",
          when(col("dst") === col("prev"), lit(wBack.toLong))
            .when(col("_e") === 1, lit(wCommon.toLong))
            .otherwise(lit(wFar.toLong)))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("start").orderBy("dst")
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("start")
      val picked = graft.engine.TrackedCache.trackedLocalCheckpoint(cand
        .withColumn("_cum", sum("w").over(
          wOrd.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .withColumn("_tot", sum("w").over(wAll))
        .withColumn("_pm", pmod(coin(t), col("_tot")))
        .filter(col("_pm") >= col("_cum") - col("w") &&
          col("_pm") < col("_cum"))
        .select(col("start"), col("cur").as("prev"), col("dst").as("cur")))
      out = out.unionByName(picked.select(col("start"),
        lit(t).as("step"), col("cur").as("node")))
      frontier = picked
    }
    out.orderBy("start", "step")
  }

  /** Deterministic unigram^0.75 negative sampling — the third stage
    * of the embedding-training pipeline (after [[deterministicWalks]]
    * → [[walkSkipGramPairs]]): for every skip-gram pair and
    * j ∈ 1..k, draw a negative node from the degree^0.75 distribution
    * (degree is the stationary visit frequency of a uniform walk, so
    * it stands in for the corpus unigram counts) with an md5 coin —
    * no RNG state, every draw replayable.
    *
    * HOW IT SCALES — the alias-table substitute: each node owns the
    * half-open interval [cum−w, cum) of cumulative 1e-6-quantized
    * weight, computed by `Ranks.rowNumberWithRunningSum` (ordered
    * window over the WEIGHT-VALUE dictionary only, never a row-scale
    * sort). A draw is then "find the interval containing coin mod
    * total" — NOT a non-equi join: intervals explode into the fixed
    * `bucketWidth` grid they overlap (Σ w/B + |V| rows total, a
    * constant per node by construction), coins hash to their bucket,
    * and the lookup is a plain bucket-keyed EQUI-join + interval
    * filter. Exactly one node matches per coin. Collisions with the
    * pair's own endpoints are flagged, not resampled (a resample
    * loop is not replayable; the trainer drops flagged rows).
    */
  def negativeSamples(edges: DataFrame, pairs: DataFrame, k: Int,
                      seed: String,
                      bucketWidth: Long = 1L << 22): DataFrame = {
    require(k >= 1, s"negativeSamples: k >= 1, got $k")
    require(bucketWidth >= 1L,
      s"negativeSamples: bucketWidth >= 1, got $bucketWidth")
    import graft.engine.Ranks
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val degW = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"),
        round(lit(1e6) * pow(col("deg").cast("double"), lit(0.75)))
          .cast("long").as("w"))
    val iv = Ranks.rowNumberWithRunningSum(degW, "w", "node",
        outRank = "_r", outCum = "hi", withTotal = false)
      .select(col("node"), (col("hi") - col("w")).as("lo"), col("hi"))
    val bucketed = iv.select(col("node"), col("lo"), col("hi"),
      explode(sequence(Ranks.idiv(col("lo"), lit(bucketWidth)),
        Ranks.idiv(col("hi") - 1L, lit(bucketWidth)))).as("bkt"))
    val tot = degW.agg(sum("w").cast("long").as("_t"))
    val coins = pairs.select(col("u"), col("v"))
      .crossJoin(broadcast(tot))
      .select(col("u"), col("v"),
        explode(array((1 to k).map(lit): _*)).as("j"), col("_t"))
      .withColumn("c", pmod(conv(substring(md5(concat(col("u"), lit("|"),
        col("v"), lit("|"), col("j").cast("string"), lit(":" + seed))),
        1, 15), 16, 10).cast("long"), col("_t")))
      .withColumn("bkt", Ranks.idiv(col("c"), lit(bucketWidth)))
    coins.join(bucketed, Seq("bkt"))
      .filter(col("c") >= col("lo") && col("c") < col("hi"))
      .select(col("u"), col("v"), col("j"), col("node").as("neg"),
        (col("node") === col("u") || col("node") === col("v"))
          .as("is_collision"))
      .orderBy("u", "v", "j")
  }

  /** Skip-gram training pairs from walk trajectories — the
    * aggregation that turns [[deterministicWalks]]' output into the
    * (center, context, count) table a word2vec-style embedding
    * trainer consumes: nodes co-occurring within `window` hops on
    * the same walk, least/greatest-normalized, self-pairs (walk
    * revisits) dropped. The walk's start node participates as step
    * 0. Scale shape: a self-join on the walk id with the step band
    * as an inequality filter — per walk the pair fan-out is bounded
    * by C(steps+1, 2), a compile-time constant, and the final count
    * is one hash aggregate on the pair key.
    */
  def walkSkipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"walkSkipGramPairs: window >= 1, got $window")
    val traj = walks.select(col("start"), col("step"), col("node"))
      .unionByName(walks.select(col("start")).distinct()
        .select(col("start"), lit(0).as("step"), col("start").as("node")))
    val a = traj.select(col("start"), col("step").as("_sa"),
      col("node").as("_na"))
    val b = traj.select(col("start"), col("step").as("_sb"),
      col("node").as("_nb"))
    a.join(b, Seq("start"))
      .filter(col("_sb") > col("_sa") &&
        col("_sb") - col("_sa") <= window)
      .select(least(col("_na"), col("_nb")).as("u"),
        greatest(col("_na"), col("_nb")).as("v"))
      .filter(col("u") =!= col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n_cooc"))
      .orderBy("u", "v")
  }
}
