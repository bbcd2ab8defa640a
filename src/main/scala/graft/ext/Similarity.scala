package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.TrackedCache.Trackable

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: the correctness baseline. Dot products
  *    via `zip_with`/`aggregate` with per-element promotion to double
  *    (bit-reproducible against the DuckDB oracle's explicit
  *    `list_transform` arithmetic — float ops are NOT used because
  *    float-multiply-then-promote ≠ promote-then-double-multiply).
  *  - LSH-bucketed ANN: random-hyperplane signatures from a
  *    deterministic hash-derived hyperplane family; candidates only
  *    within matching signature buckets. This is the scale path — at
  *    100 TB the brute-force cross join is O(n·q) and dies; bucketed
  *    search reduces each query to one hash lookup + a small
  *    bucket-local scan.
  */
object Similarity {

  /** Σ aᵢ·bᵢ with each element promoted to double BEFORE multiplying
    * (determinism contract with the oracle). Native codegen'd
    * expression — the HOF formulation (`aggregate(zip_with(...))`)
    * runs interpreted and was the q41 bottleneck (36 s → ~1 s).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def norm2(a: Column): Column = graft.functions.VectorOps.norm2(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force cosine top-k against one query vector (as a 1-row
    * DataFrame with column `qv`). The query side is broadcast; the
    * scan side streams — no shuffle until the final top-k, which is a
    * TakeOrdered (no full sort materialization). Norms are computed
    * once per side, not per pair.
    */
  def knnBruteForce(embeddings: DataFrame, query: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn("_n2", norm2(col(vecCol)))
      .crossJoin(broadcast(query.withColumn("_qn2", norm2(col("qv")))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qv")) / (sqrt(col("_n2")) * sqrt(col("_qn2"))), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** Deterministic hyperplane family: splitmix64-derived components
    * in [-0.5, 0.5), generated ON THE DRIVER and shipped as literal
    * arrays — no RNG state, reproducible across runs, and the per-row
    * work becomes a codegen'd native dot product instead of an
    * interpreted nested-HOF tree (which re-derived every component
    * per row).
    */
  private def hyperplane(p: Int, dim: Int): Array[Double] = {
    def splitmix64(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    Array.tabulate(dim) { j =>
      val h = splitmix64(p.toLong * 131071L + j)
      (java.lang.Math.floorMod(h, 100000L).toDouble / 100000.0) - 0.5
    }
  }

  /** The hyperplane family as data rows (p, comps) — materialized as
    * a parquet artifact so the oracle can evaluate the SAME
    * signature arithmetic (sign of ⟨v, h_p⟩) in plain SQL.
    */
  def hyperplaneRows(nPlanes: Int, dim: Int = 64): Seq[(Int, Seq[Double])] =
    (0 until nPlanes).map(p => p -> hyperplane(p, dim).toSeq)

  /** nPlanes-bit random-hyperplane signature of a vector: bit p = sign
    * of ⟨v, h_p⟩. Narrow, per-row, no shuffle; dim read once from the
    * data.
    */
  def rhpSignature(vec: Column, nPlanes: Int, dim: Int = 64): Column =
    array((0 until nPlanes).map { p =>
      val hp = array(hyperplane(p, dim).toIndexedSeq.map(lit): _*)
      when(dot(vec, hp) >= 0, lit(1)).otherwise(lit(0))
    }: _*)

  /** Bucket key = the signature rendered as a bit string. */
  def rhpBucket(vec: Column, nPlanes: Int): Column =
    array_join(transform(rhpSignature(vec, nPlanes), b => b.cast("string")), "")

  /** Johnson–Lindenstrauss random projection: dim → outDim via the
    * SAME deterministic splitmix64 hyperplane family the LSH paths
    * use (here as a dense projection matrix, not sign buckets).
    * Map-only, no shuffle; out_j = ⟨v, h_j⟩ in double, ascending-i
    * sequential sum (oracle op order). The scale use is shrinking
    * embedding IO before ANN/clustering: 64→16 dims cuts the vector
    * bytes 4× while approximately preserving pairwise distances
    * (E‖Pv‖² = outDim/12 · ‖v‖² for this family — the 1/12 is the
    * variance of U[-0.5, 0.5) components; pinned in SimilaritySpec).
    */
  def projectRandom(embeddings: DataFrame, outDim: Int, dim: Int = 64,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplaneRows(outDim, dim)
    embeddings.select(col(idCol),
      array(planes.map { case (_, comps) =>
        dot(col(vecCol), array(comps.map(lit): _*))
      }: _*).as("proj"))
  }

  /** (id, payload..., band, bucket) long form: ONE signature string
    * of bands·r bit chars per row, then each band's bucket is a
    * substring slice — band b covers planes [b·r, (b+1)·r).
    *
    * Why one string and not bands·r bit columns: the all-dots
    * projection generates a codegen method past the JVM's huge-method
    * JIT threshold, so the "compiled" form executes as interpreted
    * bytecode — measured 30-40× slower than this form, where the HOF
    * wrapper falls back to the compiled native `DotProduct.eval` loop
    * once per row and the band slices are trivial substrings
    * (32 s → 0.9 s for a 100k-row × 64-plane banded explode).
    */
  private def explodeBands(df: DataFrame, keep: Seq[String], bands: Int,
                           r: Int, dim: Int, vecCol: String): DataFrame = {
    val sig = array_join(transform(rhpSignature(col(vecCol), bands * r, dim),
      b => b.cast("string")), "")
    df.select(keep.map(col) :+ sig.as("_sig"): _*)
      .select(keep.map(col) :+
        posexplode(array((0 until bands).map(b =>
          substring(col("_sig"), b * r + 1, r)): _*))
          .as(Seq("band", "bucket")): _*)
  }

  /** ANN top-k, multi-band OR: a row is a candidate when it shares
    * ANY band's bucket with the query (the same banding structure as
    * MinHash/LSH in Dedup). Recall is 1−(1−p^r)^bands per neighbor
    * (p = 1−θ/π), so bands raise recall while r keeps buckets small —
    * the single-bucket form (bands = 1) is strictly dominated.
    * Candidates are deduped before scoring; the final top-k is a
    * TakeOrdered, no full sort.
    */
  def annTopK(embeddings: DataFrame, query: DataFrame, k: Int, bands: Int = 4,
              r: Int = 8, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = explodeBands(embeddings, Seq(idCol), bands, r, dim, vecCol)
    val q = explodeBands(query, Seq("qv"), bands, r, dim, "qv")
    val candidates = e.join(broadcast(q.select("band", "bucket")), Seq("band", "bucket"))
      .select(idCol).distinct()
    embeddings.join(candidates, idCol)
      .crossJoin(broadcast(query))
      .select(col(idCol),
        round(cosine(col(vecCol), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Batch ANN: top-k for EVERY query row in ONE distributed join —
    * the retrieval-indexing / RAG shape (a query per row, not a
    * driver-side vector per call like `annTopK`). Both sides are
    * banded with the same hyperplane family; a (query, vector) pair
    * is a candidate when ANY band bucket matches (multi-band OR),
    * candidates dedupe on the pair, exact cosine rescores candidates
    * only, and a per-query window rank keeps k.
    *
    * Scale shape: the bucket join shuffles on (band, bucket) with NO
    * broadcast assumption on the query side, so the query table can
    * be arbitrarily large (index-build joins run millions of queries);
    * hot buckets split under AQE, and the rank window's exchange is
    * on the query id — the same key as the rescore join, so it
    * reuses that clustering.
    */
  def annTopKBatch(embeddings: DataFrame, queries: DataFrame, k: Int,
                   bands: Int = 4, r: Int = 8, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   qidCol: String = "qid", qvecCol: String = "qv"): DataFrame = {
    val e = explodeBands(embeddings, Seq(idCol), bands, r, dim, vecCol)
    val q = explodeBands(queries, Seq(qidCol), bands, r, dim, qvecCol)
    val cand = q.join(e, Seq("band", "bucket"))
      .select(qidCol, idCol).distinct()
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(col("cos_sim").desc, col(idCol))
    cand
      .join(embeddings.select(col(idCol), col(vecCol)), idCol)
      .join(queries.select(col(qidCol), col(qvecCol)), qidCol)
      .withColumn("cos_sim", round(cosine(col(vecCol), col(qvecCol)), 6))
      .withColumn("_rk", row_number().over(win))
      .filter(col("_rk") <= k)
      .select(col(qidCol), col(idCol), col("cos_sim"))
  }

  /** Maximal-Marginal-Relevance diversified re-ranking (Carbonell &
    * Goldstein 1998) — the post-ANN stage of a RAG retriever: from
    * each query's candidate pool, greedily pick k results maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — relevance traded
    * against redundancy with what's already picked, so near-duplicate
    * passages don't crowd the context window.
    *
    * Input `cands`: one row per (qid, vec_id) candidate with the
    * candidate's embedding and its relevance (`rel`, the ANN rescore,
    * already round(·,6)). Feed it from [[annTopKBatch]] joined back
    * to the embedding table — N (pool size per query) is a SMALL
    * constant, which is what makes MMR's greedy loop scale-free:
    * every step is one join + one per-query window over ≤ N rows, the
    * selected set rides along as a bounded array column, and the k−1
    * driver-side iterations grow the plan linearly (k is single-digit
    * in practice). No pairwise explosion beyond N per query, no
    * global window, no driver collect.
    *
    * Determinism: every score the greedy compares is round(·,6) with
    * vec_id tie-break, so the selection path is engine-exact (the
    * DuckDB oracle unrolls the same k steps). Rank 1's mmr_score is
    * defined as plain relevance (the diversity term is vacuous on an
    * empty selected set). Queries with fewer than k candidates simply
    * stop early. Returns (qid, vec_id, rank, mmr_score).
    */
  def mmrRerank(cands: DataFrame, k: Int, lam: Double,
                qidCol: String = "qid", idCol: String = "vec_id",
                vecCol: String = "embedding", relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"mmrRerank: k >= 1, got $k")
    require(lam >= 0.0 && lam <= 1.0, s"mmrRerank: lambda in [0,1], got $lam")
    val pool = cands.trackedPersist()
    def pickTop(df: DataFrame, scoreCol: String): DataFrame = {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(qidCol).orderBy(col(scoreCol).desc, col(idCol))
      df.withColumn("_rk", row_number().over(win)).filter(col("_rk") === 1)
    }
    var selected = pickTop(pool, relCol)
      .select(col(qidCol), col(idCol), lit(1).as("rank"),
        col(relCol).as("mmr_score"),
        array(col(vecCol)).as("_sel_embs"), array(col(idCol)).as("_sel_ids"))
    var out = selected.select(col(qidCol), col(idCol), col("rank"),
      col("mmr_score"))
    for (step <- 2 to k) {
      val scored = pool
        .join(selected.select(col(qidCol), col("_sel_embs"), col("_sel_ids")),
          Seq(qidCol))
        .filter(!array_contains(col("_sel_ids"), col(idCol)))
        .withColumn("_max_sim", array_max(transform(col("_sel_embs"),
          e => round(cosine(col(vecCol), e), 6))))
        .withColumn("_mmr", round(lit(lam) * col(relCol) -
          lit(1.0 - lam) * col("_max_sim"), 6))
      val pick = pickTop(scored, "_mmr")
        .select(col(qidCol), col(idCol), lit(step).as("rank"),
          col("_mmr").as("mmr_score"),
          concat(col("_sel_embs"), array(col(vecCol))).as("_sel_embs"),
          concat(col("_sel_ids"), array(col(idCol))).as("_sel_ids"))
      selected = pick
      out = out.unionByName(pick.select(col(qidCol), col(idCol), col("rank"),
        col("mmr_score")))
    }
    out.orderBy(qidCol, "rank")
  }

  /** All near-duplicate pairs by cosine ≥ threshold (brute force,
    * a < b). Test-scale verification path; the scale path is
    * `annCandidatePairs` (signature-bucketed) or
    * `semanticNearDupPairs` (cluster-partitioned).
    *
    * GUARDED: the plan is an O(n²) cartesian product by construction,
    * so the input is size-checked up front and the call REFUSES rows
    * beyond `maxRows` (default 100k ⇒ ≤ 5·10⁹ scored pairs) rather
    * than silently launching a job that can never finish at corpus
    * scale. The count is one column-pruned scan of the id column —
    * negligible next to the n² it prevents. Raise `maxRows` only for
    * a deliberate, bounded verification run.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         maxRows: Long = 100000L): DataFrame = {
    val n = embeddings.select(col(idCol)).count()
    require(n <= maxRows,
      s"cosineNearDupPairs is brute-force O(n²) and refuses $n rows " +
        s"(maxRows=$maxRows). At scale use Similarity.annCandidatePairs " +
        "(banded signature buckets) or Similarity.semanticNearDupPairs " +
        "(SemDeDup cluster partitioning); raise maxRows only for a " +
        "deliberate bounded verification run.")
    val withNorm = embeddings.select(col(idCol), col(vecCol),
      norm2(col(vecCol)).as("_n2"))
    val a = withNorm.toDF("id_a", "va", "n2a")
    val b = withNorm.toDF("id_b", "vb", "n2b")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (sqrt(col("n2a")) * sqrt(col("n2b"))), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix recipe): align two embedding collections (e.g.
    * sentences in two languages in a shared embedding space) by
    * keeping the pairs that are RECIPROCAL nearest neighbors and
    * scoring each with the margin criterion
    * `cos(x,y) / (½·(avgk(x) + avgk(y)))` — cosine relative to each
    * side's average top-`kNeighbors` neighborhood similarity, which
    * cancels hubness (a vector that is "close to everything" needs a
    * much higher raw cosine to clear margin 1). Downstream filters on
    * `margin` (≥ ~1.05 is the published operating point).
    *
    * Deterministic: cosines are rounded to 6 dp before ranking
    * (rank ties broken by id), and the neighborhood means sum exact
    * DECIMAL(18,6) so no float-order drift reaches the oracle.
    *
    * This entry point scores all |A|×|B| pairs and REFUSES inputs
    * beyond `maxPairs` — the bounded verification path. At corpus
    * scale, generate the candidate pairs with [[annTopKBatch]] in
    * BOTH directions (k ≥ kNeighbors) and feed the union through the
    * same window/margin arithmetic: the margin only reads each side's
    * top-k, which is exactly what the ANN index returns.
    */
  def bitextMarginMine(a: DataFrame, b: DataFrame, kNeighbors: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       maxPairs: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(kNeighbors >= 1, s"bitextMarginMine: kNeighbors >= 1")
    val na = a.select(col(idCol)).count()
    val nb = b.select(col(idCol)).count()
    require(na * nb <= maxPairs,
      s"bitextMarginMine is brute-force |A|x|B| and refuses ${na}x$nb " +
        s"pairs (maxPairs=$maxPairs). At scale feed annTopKBatch " +
        "candidates from both directions through the margin arithmetic.")
    val av = a.select(col(idCol).as("qid"), col(vecCol).as("_av"),
      norm2(col(vecCol)).as("_na"))
    val bv = b.select(col(idCol).as("vid"), col(vecCol).as("_bv"),
      norm2(col(vecCol)).as("_nb"))
    val scored = av.crossJoin(broadcast(bv))
      .select(col("qid"), col("vid"),
        round(dot(col("_av"), col("_bv")) /
          (sqrt(col("_na")) * sqrt(col("_nb"))), 6).as("cos"))
    val wa = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    val wb = Window.partitionBy("vid").orderBy(col("cos").desc, col("qid"))
    val ranked = scored
      .withColumn("rna", row_number().over(wa))
      .withColumn("rnb", row_number().over(wb))
      .trackedPersist()
    val ka = ranked.filter(col("rna") <= kNeighbors).groupBy("qid")
      .agg((sum(col("cos").cast(DecimalType(18, 6))).cast("double") /
        count(lit(1))).as("_ka"))
    val kb = ranked.filter(col("rnb") <= kNeighbors).groupBy("vid")
      .agg((sum(col("cos").cast(DecimalType(18, 6))).cast("double") /
        count(lit(1))).as("_kb"))
    ranked.filter(col("rna") === 1 && col("rnb") === 1)
      .join(ka, Seq("qid")).join(kb, Seq("vid"))
      .select(col("qid"), col("vid"), col("cos").as("cos_sim"),
        round(col("_ka"), 6).as("avg_topk_a"),
        round(col("_kb"), 6).as("avg_topk_b"),
        round(col("cos") / (lit(0.5) * (col("_ka") + col("_kb"))), 6)
          .as("margin"))
      .orderBy("qid")
  }

  /** Hard-negative mining for contrastive/retrieval training (the
    * DPR / sentence-transformers curriculum step): for each query
    * vector, the `k` most-similar corpus vectors with a DIFFERENT
    * label (the "hard" negatives — near in embedding space, wrong by
    * supervision), plus the query's nearest SAME-label anchor (the
    * positive) and the pos−neg margin. Small or negative margins mark
    * the negatives worth training on; a margin near the positive's
    * own similarity marks label noise worth auditing.
    *
    * Queries whose label has no other member (no positive anchor)
    * drop out — deterministic, mirrored by the oracle.
    *
    * Scale shape: corpus × broadcast(query roster) — the q316-class
    * bounded-roster scan — then per-qid partitioned top-k windows.
    * For a corpus-sized query load, swap the scored-pair source with
    * [[annTopKBatch]] oversampled by the expected same-label fraction
    * and keep the same window/margin arithmetic.
    */
  def hardNegatives(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"hardNegatives: k >= 1, got $k")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"),
      col(labelCol).as("_ql"), norm2(col(vecCol)).as("_qn"))
    val pairs = embeddings
      .select(col(idCol), col(vecCol), col(labelCol),
        norm2(col(vecCol)).as("_en"))
      .crossJoin(broadcast(q))
      .select(col("qid"), col("_ql"), col(idCol), col(labelCol),
        round(dot(col(vecCol), col("_qv")) /
          (sqrt(col("_en")) * sqrt(col("_qn"))), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col(idCol))
    val negs = pairs.filter(col(labelCol) =!= col("_ql"))
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col("qid"), col("neg_rank"),
        col(idCol).as("neg_id"), col("cos").as("neg_cos"))
    val pos = pairs.filter(col(labelCol) === col("_ql") &&
        col(idCol) =!= col("qid"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("qid"), col(idCol).as("pos_id"), col("cos").as("pos_cos"))
    negs.join(pos, Seq("qid"))
      .select(col("qid"), col("neg_rank"), col("neg_id"), col("neg_cos"),
        col("pos_id"), col("pos_cos"),
        round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
      .orderBy("qid", "neg_rank")
  }

  /** IVF (inverted-file) ANN: a coarse quantizer (centroids) splits
    * the corpus into cells; each vector is assigned to its nearest
    * centroid; a query probes only the `nProbes` nearest cells. The
    * canonical trade: recall vs the fraction of the corpus scanned.
    *
    * Centroids here are driver-computed per-label means (tiny:
    * #labels × dim floats, broadcast as literals) — at real scale
    * they come from a k-means pass, but assignment/probing — the
    * distributed 99% of the work — is identical and is what this
    * implements: one narrow argmin pass to assign cells, then a
    * cell-pruned scan per query.
    */
  def ivfAssign(embeddings: DataFrame, centroids: Seq[(Int, Seq[Float])],
                vecCol: String = "embedding"): DataFrame = {
    // nearest centroid by squared L2: ||v||² − 2⟨v,c⟩ + ||c||²; ||v||²
    // is constant per row so argmin over (−2⟨v,c⟩ + ||c||²) suffices
    val scored = centroids.map { case (cid, c) =>
      val cArr = array(c.map(x => lit(x)): _*)
      val cNorm = c.map(x => x.toDouble * x).sum
      struct((lit(-2.0) * dot(col(vecCol), cArr) + lit(cNorm)).as("score"),
        lit(cid).as("cell"))
    }
    // the identity-transform wrapper is deliberate: k dots over
    // literal centroid arrays codegen into one method past the JVM's
    // huge-method JIT threshold (interpreted bytecode); the HOF forces
    // fallback to the compiled native DotProduct.eval loop — measured
    // 5.6× at 100k×32 cells (see explodeBands for the same mechanism)
    embeddings.withColumn("cell",
      array_min(transform(array(scored: _*), s => s)).getField("cell"))
  }

  /** IVF assignment via a BROADCAST JOIN — the large-k form. The
    * literal-argmin tree (`ivfAssign`) is the right call at k ≲ 10³:
    * zero shuffle, one narrow pass. Past that the expression tree
    * itself becomes the problem (plan size and codegen grow with
    * k·dim literals), so here the centroid table rides as a broadcast
    * relation instead: scan × broadcast(k rows) → per-row scores →
    * argmin as a partial/final `min(struct(score, cell))` aggregate.
    * Map-side combine collapses each vector's k scored rows to one
    * BEFORE the exchange, so the shuffle carries one skinny row per
    * vector — NOT n·k — at any k. ‖c‖² is precomputed per centroid
    * (driver-side, same arithmetic as `ivfAssign`'s literal), and the
    * struct-min tie-break (score, then cell) is identical, so
    * assignments match the literal form bit-for-bit (pinned in
    * SimilaritySpec).
    *
    * Returns (idCol, cell) — join back to the corpus by id when the
    * payload is needed downstream.
    */
  def ivfAssignJoin(embeddings: DataFrame, centroids: Seq[(Int, Seq[Float])],
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cdf = centroids
      .map { case (cid, c) => (cid, c, c.map(x => x.toDouble * x).sum) }
      .toDF("cell", "_comps", "_cnorm")
    embeddings.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cdf))
      .select(col(idCol), struct(
        (lit(-2.0) * dot(col(vecCol), col("_comps")) + col("_cnorm")).as("score"),
        col("cell").as("cell")).as("_sc"))
      .groupBy(idCol)
      .agg(min(col("_sc")).getField("cell").as("cell"))
  }

  /** (id, vec, cell) assignment with the strategy picked by centroid
    * count: literal argmin below `joinThreshold` (zero shuffle),
    * broadcast-join scoring + rejoin above it (the k·dim literal tree
    * outgrows plan analysis/codegen past ~10³ literals). Assignments
    * are bit-identical either way — shared arithmetic and tie-break —
    * so callers' results never depend on the strategy.
    */
  private def assignCells(embeddings: DataFrame,
                          centroids: Seq[(Int, Seq[Float])],
                          idCol: String, vecCol: String,
                          joinThreshold: Int = 128): DataFrame = {
    val slim = embeddings.select(col(idCol), col(vecCol))
    if (centroids.size > joinThreshold)
      ivfAssignJoin(slim, centroids, idCol, vecCol).join(slim, idCol)
        .select(col(idCol), col(vecCol), col("cell"))
    else ivfAssign(slim, centroids, vecCol)
  }

  /** SemDeDup-style semantic near-dup pairs: cluster-partition the
    * corpus with the coarse quantizer, then compare pairs ONLY within
    * each cell. All-pairs cosine is n²; cluster partitioning cuts it
    * to Σ|cell|² ≈ n²/k for balanced cells — the published SemDeDup
    * recipe (Abbas et al. 2023) and the embedding twin of LSH-bucketed
    * text dedup. The trade is recall at cell BOUNDARIES: a pair split
    * across cells is never compared (quantified in SimilaritySpec —
    * brute-subset law + planted-dup recall on clustered data).
    *
    * Shape: one broadcast assignment pass (`ivfAssign`, no shuffle),
    * one self-join shuffled on the cell id — skewed cells split by
    * AQE; `maxCell` drops cells larger than the cap outright (the
    * hot-bucket guard, same rationale as LSH's `maxBucket`).
    */
  def semanticNearDupPairs(embeddings: DataFrame,
                           centroids: Seq[(Int, Seq[Float])],
                           threshold: Double,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           maxCell: Option[Long] = None): DataFrame = {
    val assigned0 = assignCells(embeddings, centroids, idCol, vecCol)
    val assigned = maxCell match {
      case Some(cap) =>
        assigned0.withColumn("_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("cell")))
          .filter(col("_n") <= cap)
          .select(col(idCol), col(vecCol), col("cell"))
      case None => assigned0
    }
    val l = assigned.select(col("cell"), col(idCol).as("id_a"),
      col(vecCol).as("_va"))
    val r = assigned.select(col("cell"), col(idCol).as("id_b"),
      col(vecCol).as("_vb"))
    l.join(r, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("_va"), col("_vb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cell", "cos_sim")
  }

  /** Per-label embedding outliers — the label-noise curation op
    * (prune vectors far from their own label's centroid before
    * training): per-label mean vector (kept as a broadcast-joined
    * DataFrame in full double precision — no driver collect, no
    * float truncation), cosine of every vector to its own centroid,
    * bottom-`bottomK` per label flagged.
    *
    * Scale: one skinny posexplode shuffle for the centroids
    * (labels × dim rows), one broadcast join, one per-label window.
    * Ranking uses the ROUNDED cosine (ties → vec_id) so the flag is
    * deterministic and replayable.
    */
  def labelOutliers(embeddings: DataFrame, bottomK: Int = 5,
                    idCol: String = "vec_id", labelCol: String = "label",
                    vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = embeddings
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(labelCol, "i")
      .agg((sum(col("x").cast("double")) / count(lit(1))).as("m"))
      .groupBy(labelCol)
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("_im"))
      .select(col(labelCol), transform(col("_im"), e => e.getField("m")).as("_cent"))
    // a zero-norm vector (or an all-zero centroid) has no cosine:
    // emit null and rank it LAST — a meaningless vector must not eat
    // an outlier slot, and null-last is replayable (`cos IS NULL`
    // sort key), where 0/0's engine-specific null-vs-NaN is not
    val n2v = dot(col(vecCol), col(vecCol))
    val n2c = dot(col("_cent"), col("_cent"))
    val cos = when(n2v > 0 && n2c > 0,
      round(dot(col(vecCol), col("_cent")) / (sqrt(n2v) * sqrt(n2c)), 6))
    val w = Window.partitionBy(labelCol)
      .orderBy(col("cos_centroid").asc_nulls_last, col(idCol))
    embeddings.join(broadcast(cents), labelCol)
      .select(col(idCol), col(labelCol), cos.as("cos_centroid"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("is_outlier", col("rk") <= bottomK && col("cos_centroid").isNotNull)
  }

  /** Retrieval evaluation — recall@k and reciprocal rank per query:
    * join a retrieved list (any ANN path's output, ranked by its
    * score) against a truth set, count hits, and take 1/rank of the
    * first relevant hit (0 when none). The eval loop every retrieval
    * index needs before/after a parameter change.
    *
    * Ranks derive from (score desc, id) row_number per query —
    * deterministic under ties; both inputs are (qid, id)-keyed so the
    * whole evaluation is two qid-keyed joins + one aggregation,
    * linear in retrieved+truth size at any query count.
    */
  def retrievalMetrics(retrieved: DataFrame, truth: DataFrame,
                       qidCol: String = "qid", idCol: String = "vec_id",
                       scoreCol: String = "cos_sim"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(qidCol).orderBy(col(scoreCol).desc, col(idCol))
    val ranked = retrieved.select(col(qidCol), col(idCol), col(scoreCol))
      .withColumn("_rank", row_number().over(w))
    val truthN = truth.groupBy(qidCol).agg(count(lit(1)).as("n_truth"))
    val joined = ranked.join(
      truth.select(col(qidCol), col(idCol), lit(1).as("_rel")),
      Seq(qidCol, idCol), "left")
    joined.groupBy(qidCol)
      .agg(sum(coalesce(col("_rel"), lit(0))).cast("long").as("n_hit"),
        coalesce(max(when(col("_rel") === 1,
          lit(1.0) / col("_rank"))), lit(0.0)).as("_rr"))
      .join(broadcast(truthN), qidCol)
      .select(col(qidCol), col("n_truth").cast("long").as("n_truth"),
        col("n_hit"),
        round(col("n_hit").cast("double") / col("n_truth"), 6).as("recall"),
        round(col("_rr"), 6).as("rr"))
  }

  /** Per-dimension embedding health stats — the "dead dims /
    * variance concentration / scale drift" readout run before
    * quantizing or truncating a vector column. One posexplode pass
    * (rows×dim, map-only) into a dim-keyed aggregation (≤ dim
    * groups): components are micro-quantized to BIGINTs so every
    * sum is exact and order-free; mean/variance are then identical
    * double expressions over those exact integers in any engine.
    * Σv² headroom: dim-wise squares at 1e6 quantization bound
    * |v| ≤ 3 corpora to ~10⁸ rows per the L-moments discipline;
    * lower `micro` for more.
    */
  def dimensionStats(embeddings: DataFrame,
                     vecCol: String = "embedding"): DataFrame = {
    val ex = embeddings
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select((col("pos") + 1).cast("long").as("dim"),
        round(col("v").cast("double") * 1e6).cast("long").as("v_u"))
    ex.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum("v_u").as("s_u"),
        sum(col("v_u") * col("v_u")).as("sq_u"),
        sum(when(col("v_u") === 0L, 1L).otherwise(0L)).as("n_zero"),
        min("v_u").as("min_u"), max("v_u").as("max_u"))
      .select(col("dim"), col("n").cast("long").as("n"),
        round(col("s_u").cast("double") / col("n") / 1e6, 6).as("mean"),
        round(col("sq_u").cast("double") / col("n") / 1e12 -
          (col("s_u").cast("double") / col("n") / 1e6) *
          (col("s_u").cast("double") / col("n") / 1e6), 6).as("variance"),
        round(col("n_zero").cast("double") / col("n"), 6).as("zero_rate"),
        round(col("min_u").cast("double") / 1e6, 6).as("min_v"),
        round(col("max_u").cast("double") / 1e6, 6).as("max_v"))
      .orderBy("dim")
  }

  /** Top principal component of the embedding cloud by distributed
    * power iteration — the "is one direction eating the space"
    * health check (anisotropy / whitening diagnostics; public PCA +
    * power-method literature). Fully deterministic and SQL-replayable:
    *
    *   1. Components micro-quantized to BIGINT (`round(x·1e6)`).
    *   2. The scatter matrix in the CENTERING-FREE exact-integer form
    *      n·C = n·G − s·sᵀ, where G_ij = Σ v_i·v_j and s_i = Σ v_i —
    *      every entry an exact BIGINT, so partial-aggregation order
    *      can't move it. G's upper triangle is generated MAP-SIDE
    *      (explode dim i, slice the tail j ≥ i, multiply) — no
    *      self-join, no shuffle before the (i, j)-keyed partial agg;
    *      one pass over the data for G, s and n together.
    *   3. `iterations` fixed power-method rounds from the uniform
    *      start w₀ = round(1e6/dim): each round's per-entry term
    *      round(m/n/n/1e12 · (w/1e6) · 1e9) is a BIGINT (order-free
    *      sum), normalized by the exact L1 total back to micro units.
    *      All iteration frames are d- or d²-row dictionaries riding
    *      broadcast joins — nothing collects to the driver.
    *
    * Output per dim: the final loading (micro-exact, L1-normalized —
    * sign pinned by the all-positive start) and `lambda_l1`, the L1
    * growth of the last un-normalized step in unit² (a deterministic
    * dominant-eigenvalue proxy under L1 scaling).
    *
    * Scale: the data-sized work is step 2's single aggregation with
    * d²/2 generated rows per input row, combined map-side to ≤ d²/2
    * groups per partition — the standard d² Gram cost. micro=1e6
    * keeps n·G within BIGINT for n ≤ ~4·10⁵ at |x| ≤ 3; shrink the
    * quantization (1e4–1e5) for billion-row clouds, which this
    * synthetic battery doesn't need.
    */
  def pcaTopComponent(embeddings: DataFrame, dim: Int = 64,
                      iterations: Int = 2,
                      vecCol: String = "embedding"): DataFrame = {
    require(iterations >= 1 && iterations <= 8,
      s"pcaTopComponent: iterations 1..8, got $iterations")
    // quantize ONCE in its own projection (HOF-lambda re-eval trap)
    val micro = embeddings.select(transform(col(vecCol),
      x => round(x.cast("double") * lit(1e6)).cast("long")).as("v"))
    val ex = micro.select(col("v"), posexplode(col("v")).as(Seq("i0", "ci")))
    val prods = ex.select((col("i0") + 1).cast("long").as("i"), col("ci"),
        posexplode(slice(col("v"), col("i0") + 1, lit(dim) - col("i0")))
          .as(Seq("j0", "cj")))
      .select(col("i"), (col("i") + col("j0")).cast("long").as("j"),
        (col("ci") * col("cj")).as("p"))
    val gUpper = prods.groupBy("i", "j").agg(sum("p").as("g"))
    val gFull = gUpper.union(gUpper.where(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("g")))
    val s = micro.select(posexplode(col("v")).as(Seq("i0", "vu")))
      .groupBy((col("i0") + 1).cast("long").as("i")).agg(sum("vu").as("s"))
    val nFrame = embeddings.agg(count(lit(1)).cast("long").as("n_rows"))
    val cov = gFull
      .join(broadcast(s.select(col("i"), col("s").as("si"))), "i")
      .join(broadcast(s.select(col("i").as("j"), col("s").as("sj"))), "j")
      .crossJoin(broadcast(nFrame))
      .select(col("i"), col("j"), col("n_rows"),
        (col("n_rows") * col("g") - col("si") * col("sj")).as("m"))
      .trackedLocalCheckpoint() // d²-row frame, freed by release()
    var w: DataFrame = embeddings.sparkSession.range(1, dim + 1)
      .select(col("id").as("i"),
        lit(math.round(1e6 / dim)).as("w_u"))
    var lastL1: DataFrame = null
    for (_ <- 1 to iterations) {
      val y = cov
        .join(broadcast(w.select(col("i").as("j"), col("w_u"))), "j")
        .withColumn("t", round(col("m").cast("double") / col("n_rows") /
          col("n_rows") / lit(1e12) *
          (col("w_u").cast("double") / lit(1e6)) * lit(1e9)).cast("long"))
        .groupBy("i").agg(sum("t").as("y"))
      lastL1 = y.agg(sum(abs(col("y"))).cast("long").as("l1"))
      w = y.crossJoin(broadcast(lastL1))
        .select(col("i"), round(col("y").cast("double") * lit(1e6) /
          col("l1")).cast("long").as("w_u"))
    }
    w.crossJoin(broadcast(nFrame)).crossJoin(broadcast(lastL1))
      .select(col("i").as("dim"), col("n_rows"),
        (col("w_u").cast("double") / 1e6).as("loading"),
        (col("l1").cast("double") / 1e9).as("lambda_l1"))
      .orderBy("dim")
  }

  /** Discount weights for NDCG, in 1e-9 integer units:
    * w_d = round(1e9 / log2(d+1)). Computed ONCE driver-side and
    * injected into both the Spark plan and any SQL replay as the
    * SAME integer literals — no cross-engine log() in the data path
    * (the q140/rboWeights discipline).
    */
  def ndcgWeights(k: Int): Seq[(Int, Long)] =
    (1 to k).map(d => d -> math.round(1e9 / (math.log(d + 1.0) / math.log(2.0))))

  /** NDCG@k of a retrieved ranking against graded relevance.
    * `retrieved` carries (qid, id, score); `gradedTruth` carries
    * (qid, id, grade ≥ 0, integer). Ranks are row_number by
    * (score desc, id); DCG = Σ grade_d·w_d over retrieved ranks ≤ k,
    * IDCG = the same sum over the IDEAL ordering (grade desc, id) of
    * that query's truth set truncated at k. Per-rank terms are
    * integer products grade·w_u, so both sums are exact BIGINTs and
    * ndcg is one rounded division. Queries with no retrieved overlap
    * report ndcg = 0 on the truth-side spine.
    *
    * Scale: two qid-keyed windows over k-bounded lists plus one
    * broadcast of the k-row weight table — nothing corpus-sized.
    */
  def ndcgAtK(retrieved: DataFrame, gradedTruth: DataFrame, k: Int,
              qidCol: String = "qid", idCol: String = "vec_id",
              scoreCol: String = "cos_sim",
              gradeCol: String = "grade"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"ndcgAtK: k must be >= 1, got $k")
    val spark = retrieved.sparkSession
    import spark.implicits._
    val wts = ndcgWeights(k).toDF("d", "w_u")
    val wr = Window.partitionBy(qidCol).orderBy(col(scoreCol).desc, col(idCol))
    val ranked = retrieved.select(col(qidCol), col(idCol), col(scoreCol))
      .withColumn("d", row_number().over(wr)).where(col("d") <= k)
    val dcg = ranked
      .join(gradedTruth.select(col(qidCol), col(idCol), col(gradeCol)),
        Seq(qidCol, idCol))
      .join(broadcast(wts), Seq("d"))
      .groupBy(qidCol).agg(count(lit(1)).as("n_hit"),
        sum(col(gradeCol) * col("w_u")).as("dcg_u"))
    val wi = Window.partitionBy(qidCol).orderBy(col(gradeCol).desc, col(idCol))
    val ideal = gradedTruth.select(col(qidCol), col(idCol), col(gradeCol))
      .withColumn("d", row_number().over(wi)).where(col("d") <= k)
      .join(broadcast(wts), Seq("d"))
      .groupBy(qidCol).agg(sum(col(gradeCol) * col("w_u")).as("idcg_u"))
    ideal.join(dcg, Seq(qidCol), "left")
      .na.fill(0L, Seq("n_hit", "dcg_u"))
      .select(col(qidCol), col("n_hit").cast("long").as("n_hit"),
        round(col("dcg_u").cast("double") / col("idcg_u"), 6).as("ndcg"))
  }

  /** NDCG at MULTIPLE cutoffs in one pass — the report shape every
    * retrieval-eval harness actually emits (ndcg@1/@5/@10 side by
    * side, not one k at a time). Same exact arithmetic contract as
    * [[ndcgAtK]] (integer grade·w_u products, one rounded division
    * per cutoff, driver-injected discount weights so no cross-engine
    * log); the per-k DCG/IDCG pairs are conditional sums over the SAME
    * ranked frame, so adding cutoffs costs extra aggregate columns,
    * not extra windows or joins. `ndcg_at_<k>` is NULL when the
    * query's ideal DCG at that cutoff is 0 (no positively-graded
    * truth inside k — the metric is undefined there, and 0/0 must not
    * masquerade as a score).
    *
    * Monotonicity law (spec-pinned): swapping two retrieved docs that
    * are ordered by relevance (the higher-graded one ranked earlier)
    * never increases any ndcg_at_<k>.
    *
    * Scale: identical to [[ndcgAtK]] — two qid-keyed windows over
    * k-bounded lists + one max(k)-row weight broadcast.
    */
  def ndcgCurve(retrieved: DataFrame, gradedTruth: DataFrame,
                ks: Seq[Int] = Seq(1, 5, 10),
                qidCol: String = "qid", idCol: String = "vec_id",
                scoreCol: String = "cos_sim",
                gradeCol: String = "grade"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"ndcgCurve: every k must be >= 1, got $ks")
    val kMax = ks.max
    val spark = retrieved.sparkSession
    import spark.implicits._
    val wts = ndcgWeights(kMax).toDF("d", "w_u")
    val wr = Window.partitionBy(qidCol).orderBy(col(scoreCol).desc, col(idCol))
    val ranked = retrieved.select(col(qidCol), col(idCol), col(scoreCol))
      .withColumn("d", row_number().over(wr)).where(col("d") <= kMax)
    val dcg = ranked
      .join(gradedTruth.select(col(qidCol), col(idCol), col(gradeCol)),
        Seq(qidCol, idCol))
      .join(broadcast(wts), Seq("d"))
      .groupBy(qidCol)
      .agg(count(lit(1)).as("n_hit"), ks.map { k =>
        sum(when(col("d") <= k, col(gradeCol) * col("w_u")).otherwise(0L))
          .as(s"_d$k")
      }: _*)
    val wi = Window.partitionBy(qidCol).orderBy(col(gradeCol).desc, col(idCol))
    val idealRanked = gradedTruth
      .select(col(qidCol), col(idCol), col(gradeCol))
      .withColumn("d", row_number().over(wi)).where(col("d") <= kMax)
      .join(broadcast(wts), Seq("d"))
    val ideal = idealRanked.groupBy(qidCol)
      .agg(
        sum(when(col("d") <= ks.head, col(gradeCol) * col("w_u"))
          .otherwise(0L)).as(s"_i${ks.head}"),
        ks.tail.map { k =>
          sum(when(col("d") <= k, col(gradeCol) * col("w_u")).otherwise(0L))
            .as(s"_i$k")
        }: _*)
    ideal.join(dcg, Seq(qidCol), "left")
      .na.fill(0L, "n_hit" +: ks.map(k => s"_d$k"))
      .select(col(qidCol) +: col("n_hit").cast("long").as("n_hit") +:
        ks.map { k =>
          when(col(s"_i$k") > 0,
            round(col(s"_d$k").cast("double") / col(s"_i$k"), 6))
            .as(s"ndcg_at_$k")
        }: _*)
  }

  /** Average precision at k against a binary truth set: at every
    * RELEVANT retrieved rank d, precision@d = hits_≤d / d; AP =
    * Σ round(1e9·hits/d) / 1e9 / |truth|. The per-term quantization
    * makes the sum an exact BIGINT (aggregation-order-free); the two
    * final divisions are one rounded double op. Queries with no hits
    * report ap = 0 on the truth-side spine.
    */
  def averagePrecisionAtK(retrieved: DataFrame, truth: DataFrame, k: Int,
                          qidCol: String = "qid", idCol: String = "vec_id",
                          scoreCol: String = "cos_sim"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"averagePrecisionAtK: k must be >= 1, got $k")
    val wr = Window.partitionBy(qidCol).orderBy(col(scoreCol).desc, col(idCol))
    val ranked = retrieved.select(col(qidCol), col(idCol), col(scoreCol))
      .withColumn("d", row_number().over(wr)).where(col("d") <= k)
    val marked = ranked.join(
        truth.select(col(qidCol), col(idCol), lit(1).as("_rel")),
        Seq(qidCol, idCol), "left")
      .withColumn("_hits", sum(coalesce(col("_rel"), lit(0))).over(
        Window.partitionBy(qidCol).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val terms = marked.where(col("_rel") === 1)
      .select(col(qidCol),
        round(lit(1e9) * col("_hits") / col("d")).cast("long").as("_t_u"))
      .groupBy(qidCol)
      .agg(count(lit(1)).as("n_hit"), sum("_t_u").as("_s_u"))
    val truthN = truth.groupBy(qidCol).agg(count(lit(1)).as("n_truth"))
    truthN.join(terms, Seq(qidCol), "left")
      .na.fill(0L, Seq("n_hit", "_s_u"))
      .select(col(qidCol), col("n_truth").cast("long").as("n_truth"),
        col("n_hit").cast("long").as("n_hit"),
        round(col("_s_u").cast("double") / 1e9 / col("n_truth"), 6).as("ap"))
  }

  /** Mean-reciprocal-rank inputs at depth k: per query, the rank of
    * the FIRST relevant item in the retrieved ranking (0 when none of
    * the top-k hit) and its reciprocal — the navigational-retrieval
    * companion to AP (q197) and nDCG (q196); the corpus-level MRR is
    * the plain mean of `rr`. Same scale shape as the siblings: the
    * ranking window is PARTITIONED per query over the bounded
    * candidate pool; the first-hit pick is a per-query min, never a
    * global sort.
    */
  def mrrAtK(retrieved: DataFrame, truth: DataFrame, k: Int,
             qidCol: String = "qid", idCol: String = "vec_id",
             scoreCol: String = "cos_sim"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"mrrAtK: k must be >= 1, got $k")
    val wr = Window.partitionBy(qidCol).orderBy(col(scoreCol).desc, col(idCol))
    val ranked = retrieved.select(col(qidCol), col(idCol), col(scoreCol))
      .withColumn("d", row_number().over(wr)).where(col("d") <= k)
    val firstHit = ranked
      .join(truth.select(col(qidCol), col(idCol)), Seq(qidCol, idCol))
      .groupBy(qidCol).agg(min("d").as("_fhr"))
    truth.select(col(qidCol)).distinct()
      .join(firstHit, Seq(qidCol), "left")
      .select(col(qidCol),
        coalesce(col("_fhr"), lit(0)).cast("long").as("first_hit_rank"),
        round(when(col("_fhr").isNotNull,
          lit(1.0) / col("_fhr").cast("double")).otherwise(lit(0.0)), 6)
          .as("rr"))
  }

  /** Leave-one-out 1-NN label evaluation over an embedding corpus —
    * the standard embedding-quality probe (does the nearest neighbor
    * share my class?) behind kNN-classifier baselines and
    * representation-learning evals (e.g. the kNN protocol of Wu et
    * al. 2018 / DINO): for each query in a BOUNDED roster, the brute
    * cosine 1-NN among all OTHER vectors, and whether its label
    * agrees.
    *
    * `queries` carries the FIXED schema (qid, qv, q_label) — the
    * query-side column names are part of the signature (only the
    * corpus side is parameterized) — and must be roster-scale: it is
    * broadcast against the corpus scan (the q316 brute-truth
    * discipline — the one accepted crossJoin shape, a per-row
    * bounded fan-out, never corpus×corpus). Queries with a NULL qid,
    * qv, or q_label are dropped, mirroring the corpus-side rule (the
    * bonCurve NULL discipline): a NULL query vector has no
    * well-defined neighbor and must not produce an all-NULL-cosine
    * argmax row. Cosines are rounded to 6 decimals BEFORE ranking so
    * the (cos DESC, vec_id) order is engine-portable; the argmax
    * itself is a window PARTITIONED by qid.
    *
    * Output: one row per query — qid, q_label, nn_id, nn_label, cos,
    * correct (BIGINT 0/1). Per-class accuracy is one further
    * aggregate on this frame.
    */
  def nnLabelEval(corpus: DataFrame, queries: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus
      .select(col(idCol), col(vecCol), col(labelCol).cast("long").as("_cl"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        col("_cl").isNotNull) // unlabeled rows can't vote (bonCurve rule)
      .crossJoin(broadcast(queries.select(col("qid"), col("qv"),
        col("q_label").cast("long").as("_ql"))
        .filter(col("qid").isNotNull && col("qv").isNotNull &&
          col("_ql").isNotNull)))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col("_ql"), col(idCol), col("_cl"),
        round(cosine(col(vecCol), col("qv")), 6).as("cos"))
    val wr = Window.partitionBy("qid").orderBy(col("cos").desc, col(idCol))
    scored.withColumn("_rk", row_number().over(wr))
      .filter(col("_rk") === 1)
      .select(col("qid"), col("_ql").as("q_label"),
        col(idCol).as("nn_id"), col("_cl").as("nn_label"), col("cos"),
        (col("_cl") === col("_ql")).cast("long").as("correct"))
      .orderBy("qid")
  }

  /** KNN-Shapley data valuation (Jia et al. 2019, "Efficient
    * Task-Specific Data Valuation for Nearest Neighbor Algorithms"):
    * the EXACT Shapley value of every training point for a K-NN
    * classifier's utility on a query set, via the closed-form
    * O(N log N) suffix recurrence — sorted by distance ascending
    * (α_1 nearest), with m_i = 1[label_i = y_q]:
    *   s_{α_N} = m_N / N
    *   s_{α_i} = s_{α_{i+1}} + (m_i − m_{i+1})·min(K, i)/(K·i)
    * This is the principled "which training examples helped / hurt"
    * signal a data-curation pipeline acts on (drop negative-value
    * points, upweight high-value ones) — the valuation complement of
    * the 1-NN probe (q365).
    *
    * Per query the recurrence telescopes to a SUFFIX SUM, so the
    * whole computation is three qid-PARTITIONED windows over the
    * (query × corpus) scored frame (rank, lead, descending-rank
    * running sum — sequential per partition, hence
    * accumulation-order-deterministic and mirrored verbatim by the
    * SQL twin; cosines rounded to 6 before ranking, the q365
    * discipline). Output is the per-TRAINING-POINT mean value across
    * queries — per-(query, point) values are 1e-9-quantized BIGINTs
    * before the cross-query sum (order-free).
    *
    * Efficiency property (spec-pinned): per query,
    * Σ_i s_i = (1/K)·Σ_{j ≤ min(K,N)} m_j — the K-NN utility of the
    * full training set.
    *
    * Scale shape: the one accepted crossJoin (bounded query roster
    * broadcast against the corpus scan) + per-qid windows + one
    * train-point rollup. Queries with NULL qid/qv/q_label and
    * unlabeled corpus rows drop (bonCurve rule).
    *
    * The cost is honestly linear in |queries|·|corpus| — the roster
    * bound IS the scale contract, so it is ENFORCED like
    * [[cosineNearDupPairs]]' gate, not advisory: the operator counts
    * the query roster (one column-pruned scan, negligible next to
    * the Q·N it prices) and refuses more than `maxQueries` rows.
    * Raise it only for a deliberate, budgeted valuation run. The
    * gate counts exactly the rows that enter the broadcast (after
    * the NULL qid/qv/q_label drop), and the count is an EAGER Spark
    * action at operator-construction time — building the plan runs
    * one column-pruned scan of `queries`.
    */
  def knnShapley(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 labelCol: String = "label",
                 maxQueries: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"knnShapley: k must be >= 1, got $k")
    // count the same roster the broadcast ships: rows the NULL
    // filter drops never reach the Q·N frame, so they must not
    // spend the budget (otherwise the gate over-refuses). The
    // broadcast filters on q_label CAST TO LONG (a non-castable
    // label nulls out and is dropped), so the gate counts the same
    // post-cast roster — counting raw non-NULL labels would spend
    // budget on rows that never ship.
    val nq = queries
      .filter(col("qid").isNotNull && col("qv").isNotNull &&
        col("q_label").cast("long").isNotNull)
      .count()
    require(nq <= maxQueries,
      s"knnShapley scores a query-roster × corpus frame and refuses " +
        s"$nq query rows (maxQueries=$maxQueries): its cost is " +
        "linear in |queries|·|corpus|. Sample the query roster, or " +
        "raise maxQueries for a deliberate budgeted valuation run.")
    val scored = corpus
      .select(col(idCol), col(vecCol), col(labelCol).cast("long").as("_cl"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        col("_cl").isNotNull)
      .crossJoin(broadcast(queries.select(col("qid"), col("qv"),
        col("q_label").cast("long").as("_ql"))
        .filter(col("qid").isNotNull && col("qv").isNotNull &&
          col("_ql").isNotNull)))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col("_ql"), col(idCol), col("_cl"),
        round(cosine(col(vecCol), col("qv")), 6).as("_cos"))
    val wRank = Window.partitionBy("qid")
      .orderBy(col("_cos").desc, col(idCol))
    val wAsc = Window.partitionBy("qid").orderBy("_i")
    val wDesc = Window.partitionBy("qid").orderBy(col("_i").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = scored
      .withColumn("_i", row_number().over(wRank))
      .withColumn("_m", (col("_cl") === col("_ql")).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("qid")))
      .withColumn("_mn", lead("_m", 1).over(wAsc))
    val term = when(col("_i") < col("_n"),
      (col("_m") - col("_mn")).cast("double") *
        least(lit(k.toLong), col("_i")) /
        (lit(k.toDouble) * col("_i")))
      .otherwise(col("_m").cast("double") / col("_n"))
    val perPair = ranked
      .withColumn("_s", sum(term).over(wDesc))
      .select(col(idCol), col("_cl"),
        round(lit(1e9) * col("_s")).cast("long").as("_q"))
    perPair.groupBy(col(idCol), col("_cl").as(labelCol))
      .agg(count(lit(1)).as("n_queries"),
        sum("_q").as("_sq"))
      .select(col(idCol), col(labelCol), col("n_queries"),
        round(col("_sq").cast("double") / 1e9 / col("n_queries"), 6)
          .as("mean_shapley"))
      .orderBy(idCol)
  }

  /** BERTScore-family semantic similarity (Zhang et al. 2020,
    * "BERTScore: Evaluating Text Generation with BERT") over
    * (candidate, reference) pairs of TOKEN EMBEDDINGS: greedy
    * token-level matching —
    *   P = (1/|C|)·Σ_{c∈C} max_{r∈R} cos(c, r)
    *   R = (1/|R|)·Σ_{r∈R} max_{c∈C} cos(c, r)
    *   F = 2PR/(P + R)
    * (no IDF weighting — the uniform-weight variant).
    *
    * Inputs: `cand` / `ref` each carry (pairCol, tokCol, vecCol) —
    * one row per token embedding; rows with a NULL pair/token/vec
    * are dropped (bonCurve NULL discipline), and only pairs present
    * on BOTH sides score (inner join — a pair with an empty side has
    * no defined match direction).
    *
    * Engine-exactness: each cosine is quantized to a 1e-6 BIGINT
    * (ONE mirrored `round(1e6·cos)` — the 6-dp-before-argmax
    * discipline of q333/q365) so the per-token max and the per-pair
    * sums are exact integer ops; P and R are one double division
    * each, and F is computed from the INTEGER sums as
    * 2·sp·sr / (1e6·(sp·n_ref + sr·n_cand)) on DECIMAL(38,0) — one
    * final double division, NULL when the denominator is ≤ 0 (P + R
    * can be ≤ 0 with negative cosines; F is undefined there).
    *
    * Scale shape: ONE equi-join on the pair key with per-pair
    * fan-out bounded by tokens-per-side² (the q365 bounded-roster
    * discipline — never corpus × corpus), the scored frame persisted
    * once to feed both rollup directions, then two (pair, token)
    * max-aggregates collapsing to pair rows. No windows.
    */
  def bertScore(cand: DataFrame, ref: DataFrame,
                pairCol: String = "pair_id", tokCol: String = "tok_id",
                vecCol: String = "vec"): DataFrame = {
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    def side(df: DataFrame, tok: String, vec: String) = df
      .select(col(pairCol).as("_p"), col(tokCol).as(tok),
        col(vecCol).as(vec))
      .filter(col("_p").isNotNull && col(tok).isNotNull &&
        col(vec).isNotNull)
    val scored = side(cand, "_ct", "_cv")
      .join(side(ref, "_rt", "_rv"), Seq("_p"))
      .select(col("_p"), col("_ct"), col("_rt"),
        round(lit(1e6) * cosine(col("_cv"), col("_rv")))
          .cast("long").as("_q"))
      .trackedPersist() // feeds both matching directions
    val pSide = scored.groupBy("_p", "_ct").agg(max("_q").as("_m"))
      .groupBy("_p").agg(sum("_m").as("_sp"),
        count(lit(1)).as("n_cand"))
    val rSide = scored.groupBy("_p", "_rt").agg(max("_q").as("_m"))
      .groupBy("_p").agg(sum("_m").as("_sr"),
        count(lit(1)).as("n_ref"))
    val fDen = dec(col("_sp")) * dec(col("n_ref")) +
      dec(col("_sr")) * dec(col("n_cand"))
    pSide.join(rSide, Seq("_p"))
      .select(col("_p").as(pairCol), col("n_cand"), col("n_ref"),
        round(col("_sp").cast("double") / 1e6 / col("n_cand"), 6)
          .as("p_score"),
        round(col("_sr").cast("double") / 1e6 / col("n_ref"), 6)
          .as("r_score"),
        when(fDen > dec(lit(0)),
          round((lit(2).cast(DecimalType(38, 0)) * dec(col("_sp")) *
            dec(col("_sr"))).cast("double") /
            (lit(1e6) * fDen.cast("double")), 6)).as("f_score"))
      .orderBy(pairCol)
  }

  /** Distributional text/embedding eval via cluster-histogram total
    * variation — the MAUVE family (Pillutla et al. 2021) with TV in
    * place of KL, so NO transcendentals enter the data path (MAUVE
    * itself quantizes both corpora onto a shared k-means codebook and
    * compares the histograms; the divergence choice is the pluggable
    * part): assign set A (model samples) and set B (reference) to the
    * SHARED centroid codebook, and report per-cell occupancy shares
    * plus TV(A, B) = ½·Σ_c |p_c − q_c| ∈ [0, 1] (0 = identical
    * coverage, 1 = disjoint modes — the mode-collapse readout).
    *
    * Engine exactness: each cell's share is quantized to a 1e-9
    * BIGINT (ONE mirrored double division) before the cross-cell
    * sum — integer sums are shuffle-order-free, and the quantized
    * numerators are ≤ 1e9 regardless of corpus size (the chrF/IPF
    * discipline; the naive common-denominator integer form
    * |n_a·N_b − n_b·N_a| would overflow BIGINT at ~1e9 rows/side).
    *
    * Output: one row per codebook cell — n_a, n_b, share_a, share_b,
    * and the total `tv` repeated per row. Both sets must be
    * non-empty (shares are NULL-guarded, not silently zeroed).
    *
    * Scale shape: two literal-argmin assignment passes (zero shuffle,
    * [[ivfAssign]]) + two cell-keyed count aggregates onto the k-cell
    * spine; the two crossJoin attaches are 1-row broadcast totals
    * (the CQR-accepted shape). Nothing is ever corpus × corpus.
    */
  def clusterTvDistance(setA: DataFrame, setB: DataFrame,
                        centroids: Seq[(Int, Seq[Float])],
                        vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "clusterTvDistance: empty codebook")
    val spark = setA.sparkSession
    import spark.implicits._
    val ca = ivfAssign(setA, centroids, vecCol)
      .groupBy("cell").agg(count(lit(1)).as("n_a"))
    val cb = ivfAssign(setB, centroids, vecCol)
      .groupBy("cell").agg(count(lit(1)).as("n_b"))
    val spine = centroids.map(_._1).toDF("cell")
    val cells = spine.join(ca, Seq("cell"), "left")
      .join(cb, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .trackedPersist() // k rows; feeds totals, quantization, output
    val tot = cells.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    val q = cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_a"), col("n_b"),
        when(col("_ta") > 0L,
          round(lit(1e9) * col("n_a") / col("_ta")).cast("long"))
          .as("_qa"),
        when(col("_tb") > 0L,
          round(lit(1e9) * col("n_b") / col("_tb")).cast("long"))
          .as("_qb"),
        when(col("_ta") > 0L,
          round(col("n_a").cast("double") / col("_ta"), 6)).as("share_a"),
        when(col("_tb") > 0L,
          round(col("n_b").cast("double") / col("_tb"), 6)).as("share_b"))
      .trackedPersist() // k rows; else the totals attach replays twice
    val tv = q.agg(sum(abs(col("_qa") - col("_qb"))).as("_s"))
      .select(round(col("_s").cast("double") / 2e9, 6).as("tv"))
    q.crossJoin(broadcast(tv))
      .select(col("cell"), col("n_a"), col("n_b"), col("share_a"),
        col("share_b"), col("tv"))
      .orderBy("cell")
  }

  /** Depth weights for rank-biased overlap: w_d = (1−p)·p^(d−1)/d.
    * Computed ONCE driver-side so both the Spark plan and any SQL
    * replay consume the identical double literals (no cross-engine
    * pow() in the data path).
    */
  def rboWeights(k: Int, p: Double): Seq[(Int, Double)] =
    (1 to k).map(d => d -> (1.0 - p) * math.pow(p, d - 1) / d)

  /** Rank-biased overlap (Webber et al. 2010), truncated at depth
    * `k`, between a retrieved ranking and a truth ranking — the
    * top-weighted rank-similarity metric for comparing index
    * configurations (vs recall@k's set view and tau's uniform-weight
    * view). RBO@k = Σ_{d≤k} w_d·|A_d ∩ B_d|, w_d = (1−p)·p^(d−1)/d.
    *
    * Inputs carry (qid, id, rank ≤ k) per side (`rankACol` /
    * `rankBCol` name each side's rank column). Overlap counting is
    * pure integers (an item joins depth d iff max(rank_a, rank_b) ≤
    * d); per-depth terms are 1e-9-quantized before the per-query sum.
    * Queries with NO overlap still report rbo = 0 (truth-side spine).
    *
    * Scale: one (qid, id) join bounded by k·|queries|, a broadcast
    * k-row depth spine, one groupBy — nothing corpus-sized.
    */
  def rbo(retrieved: DataFrame, truth: DataFrame, k: Int, p: Double = 0.9,
          qidCol: String = "qid", idCol: String = "vec_id",
          rankACol: String = "rank_a", rankBCol: String = "rank_b"): DataFrame = {
    require(k >= 1 && p > 0 && p < 1, s"rbo: need k >= 1, 0 < p < 1")
    val spark = retrieved.sparkSession
    import spark.implicits._
    val depths = rboWeights(k, p).toDF("d", "w")
    val common = retrieved.select(col(qidCol), col(idCol),
        col(rankACol).as("_ra"))
      .join(truth.select(col(qidCol), col(idCol), col(rankBCol).as("_rb")),
        Seq(qidCol, idCol))
      .select(col(qidCol), greatest(col("_ra"), col("_rb")).as("_m"))
    val terms = common.join(broadcast(depths), col("_m") <= col("d"))
      .groupBy(col(qidCol), col("d"), col("w"))
      .agg(count(lit(1)).as("_ov"))
      .select(col(qidCol),
        round(col("_ov").cast("double") * col("w") * 1e9).cast("long")
          .as("_t_u"))
      .groupBy(qidCol).agg(sum("_t_u").as("_su"))
    val nCommon = common.groupBy(qidCol).agg(count(lit(1)).as("n_common"))
    truth.select(qidCol).distinct()
      .join(terms, Seq(qidCol), "left")
      .join(nCommon, Seq(qidCol), "left")
      .na.fill(0L, Seq("_su", "n_common"))
      .select(col(qidCol), col("n_common"),
        round(col("_su").cast("double") / 1e9, 6).as("rbo"))
  }

  def centroidsByLabel(embeddings: DataFrame, labelCol: String = "label",
                       vecCol: String = "embedding"): Seq[(Int, Seq[Float])] = {
    import org.apache.spark.sql.Row
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    val sums = embeddings
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(labelCol, "i")
      .agg(avg(col("x").cast("double")).as("m"))
      .collect()
    sums.groupBy(_.getAs[Int](labelCol)).map { case (label, rows) =>
      val v = new Array[Float](dim)
      rows.foreach(r => v(r.getAs[Int]("i")) = r.getAs[Double]("m").toFloat)
      label -> v.toSeq
    }.toSeq.sortBy(_._1)
  }

  /** Lloyd's k-means as distributed DataFrame aggregates — the real
    * IVF training pass (replaces the per-label-means demo quantizer).
    * Each iteration is (1) one narrow argmin assignment pass
    * (`ivfAssign`, codegen'd dot products, no shuffle) and (2) one
    * posexplode → groupBy(cell, i) → avg — a single hash-agg shuffle
    * of |corpus|·dim skinny rows with map-side partial means. Only
    * the k×dim centroid table ever reaches the driver (the "key
    * roster" exception to no-collect: centroids must be literals to
    * stay codegen'd on the next pass).
    *
    * Seeding is deterministic — the k vectors with the smallest
    * md5(id) — so training is reproducible on any cluster layout.
    * Empty cells keep their previous centroid (standard Lloyd's
    * degeneracy handling).
    *
    * Assignment strategy per iteration: the literal argmin tree
    * (`ivfAssign`) below `joinThreshold` cells — zero shuffle, one
    * narrow codegen'd pass — and the broadcast-join form
    * (`ivfAssignJoin`) above it, where the expression tree itself
    * would outgrow plan analysis and codegen (k·dim literals). The
    * two assignments are bit-identical (same score arithmetic, same
    * (score, cell) struct-min tie-break; pinned in SimilaritySpec),
    * so the trained centroids do not depend on the strategy — only
    * the plan shape does. Override with `assignViaJoin` to force
    * either path.
    */
  def kmeansCentroids(embeddings: DataFrame, kCells: Int, iters: Int = 5,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      assignViaJoin: Option[Boolean] = None,
                      joinThreshold: Int = 128): Seq[(Int, Seq[Float])] = {
    val useJoin = assignViaJoin.getOrElse(kCells > joinThreshold)
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    val seeds = embeddings
      .select(col(idCol).cast("string").as("_id"), col(vecCol).as("_v"))
      .orderBy(md5(col("_id")), col("_id")).limit(kCells).collect()
    var cents: Seq[(Int, Seq[Float])] =
      seeds.toSeq.zipWithIndex.map { case (row, i) => (i, row.getSeq[Float](1)) }
    for (_ <- 0 until iters) {
      // (cell, vec) pairs for the mean update: the join path carries
      // the id through the broadcast scoring and rejoins the vector
      // (one broadcast + one shuffle-by-id); the literal path scores
      // in place (no shuffle at all)
      val assigned =
        if (useJoin)
          ivfAssignJoin(embeddings, cents, idCol, vecCol)
            .join(embeddings.select(col(idCol), col(vecCol)), idCol)
        else ivfAssign(embeddings, cents, vecCol)
      val byCell = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("i", "x")))
        .groupBy("cell", "i")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
        .groupBy(_.getAs[Int]("cell"))
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val v = new Array[Float](dim)
            rows.foreach(r => v(r.getAs[Int]("i")) = r.getAs[Double]("m").toFloat)
            (cid, v.toSeq)
          case None => (cid, old)
        }
      }
    }
    cents
  }

  /** IVF top-k for one query vector: score only vectors in the
    * query's `nProbes` nearest cells.
    */
  def ivfTopK(embeddings: DataFrame, query: DataFrame, k: Int,
              centroids: Seq[(Int, Seq[Float])], nProbes: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assignCells(embeddings, centroids, idCol, vecCol)
    // probe cells: nProbes nearest centroids to the query (the query
    // vector itself is driver-sized by definition)
    val qRow = query.select(col("qv")).head().getSeq[Float](0)
    val probeCells = centroids.map { case (cid, c) =>
      val d = c.zip(qRow).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      (d, cid)
    }.sortBy(_._1).take(nProbes).map(_._2)
    knnBruteForce(assigned.filter(col("cell").isin(probeCells: _*)).drop("cell"),
      query, k, idCol, vecCol)
  }

  /** IVF recall-vs-nprobe curve — the tuning table an ANN deployment
    * reads before fixing its probe budget: for each nprobe in
    * `probes`, the batch roster's mean recall@k of IVF retrieval
    * against exact brute-force truth, plus how many queries were
    * already perfect. One cell assignment of the corpus (shared by
    * every nprobe), one bounded query×centroid ranking, then a
    * candidate equi-join on cell; per-(nprobe, query) rankings are
    * PARTITIONED windows over candidate pools. Recall masses are
    * exact integers (hit counts), divided once at the end. The truth
    * side is the accepted q196/q197 crossJoin(broadcast(roster))
    * shape.
    */
  def ivfRecallCurve(embeddings: DataFrame, queries: DataFrame, k: Int,
                     centroids: Seq[(Int, Seq[Float])], probes: Seq[Int],
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"ivfRecallCurve: k >= 1, got $k")
    require(probes.nonEmpty && probes.forall(_ >= 1),
      s"ivfRecallCurve: probes must be positive, got $probes")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val assigned = assignCells(embeddings, centroids, idCol, vecCol)
    val centDf = centroids.toDF("cell", "comps")
    val qcell = queries.crossJoin(broadcast(centDf))
      .select(col("qid"), col("cell"),
        aggregate(zip_with(col("comps"), col("qv"),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("_dist"))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("_dist"), col("cell"))))
      .select("qid", "cell", "cell_rank")
    val cand = assigned.join(qcell, Seq("cell"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col(idCol), col("cell_rank"),
        round(cosine(col(vecCol), col("qv")), 6).as("_cos"))
    val exploded = cand
      .select(col("qid"), col(idCol), col("cell_rank"), col("_cos"),
        explode(array(probes.map(lit): _*)).as("nprobe"))
      .filter(col("cell_rank") <= col("nprobe"))
    val topk = exploded.withColumn("_rk", row_number().over(
        Window.partitionBy("nprobe", "qid")
          .orderBy(col("_cos").desc, col(idCol))))
      .filter(col("_rk") <= k)
      .select(col("nprobe"), col("qid"), col(idCol))
    val scoredAll = embeddings.crossJoin(broadcast(queries))
      .select(col("qid"), col(idCol),
        round(cosine(col(vecCol), col("qv")), 6).as("_cos"))
    val truth = scoredAll.withColumn("_rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("_cos").desc, col(idCol))))
      .filter(col("_rk") <= k).select(col("qid"), col(idCol))
    val hits = topk.join(truth, Seq("qid", idCol))
      .groupBy("nprobe", "qid").agg(count(lit(1)).as("_h"))
    val grid = probes.toDF("nprobe")
      .crossJoin(broadcast(queries.select("qid").distinct()))
    grid.join(hits, Seq("nprobe", "qid"), "left")
      .na.fill(0L, Seq("_h"))
      .groupBy("nprobe")
      .agg(count(lit(1)).as("n_queries"),
        sum("_h").cast("long").as("sum_hits"),
        sum(when(col("_h") === k, 1L).otherwise(0L)).as("n_perfect"))
      .select(col("nprobe"), col("n_queries"), col("sum_hits"),
        col("n_perfect"),
        round(col("sum_hits").cast("double") /
          (col("n_queries") * lit(k.toLong)), 6).as("mean_recall"))
      .orderBy("nprobe")
  }

  /** int8 symmetric quantization of the embedding column: per-vector
    * scale = max|x|/127, stored as (array<tinyint>, scale float).
    * 4× storage reduction — at 100 TB the dominant embedding cost is
    * IO, and int8 recall loss is negligible for retrieval (pinned in
    * SimilaritySpec: cosine drift < 1e-2).
    */
  def quantizeInt8(vecCol: Column): (Column, Column) = {
    // an all-zero vector has max|x| = 0 → scale 0 → 0/0 = NaN, which
    // throws CAST_INVALID_INPUT under Spark 4's ANSI default (and
    // silently wrote 0 pre-ANSI) — clamp the scale to the smallest
    // positive FLOAT (it must survive the float round-trip below):
    // every element is then 0/ε = 0 exactly, and no real vector's
    // scale is ever that small
    val scale = greatest(
      array_max(transform(vecCol, x => abs(x))) / lit(127.0f),
      lit(java.lang.Float.MIN_VALUE.toDouble))
    val q = transform(vecCol, x =>
      round(x.cast("double") / scale).cast("byte"))
    (q, scale.cast("float"))
  }

  def dequantizeInt8(qCol: Column, scaleCol: Column): Column =
    transform(qCol, b => (b.cast("double") * scaleCol.cast("double")).cast("float"))

  /** Scale path for near-dup pairs: multi-band signature-bucketed
    * self-join (bands × r planes, OR across bands — the same
    * structure as Dedup's MinHash banding). Per band the join is
    * ~n²/2^r pairs with r = 16 → 65 536 buckets, so candidate volume
    * stays near-linear; bands are independent probes whose union
    * drives recall: P(candidate) = 1 − (1 − p^r)^bands with
    * p = 1 − θ/π. The old single-8-bit-bucket form (256 buckets
    * total) was ~n²/256 — a scale-killer — and is strictly dominated:
    * band 0 alone reproduces a single-band-r run, so multi-band
    * recall ⊇ single-band recall by construction (pinned in
    * SimilaritySpec). Exact cosine is verified on candidates only;
    * cross-band duplicates collapse on the (id_a, id_b) distinct.
    */
  def annCandidatePairs(embeddings: DataFrame, threshold: Double, bands: Int = 4,
                        r: Int = 16, dim: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val banded = explodeBands(embeddings, Seq(idCol), bands, r, dim, vecCol)
    val cand = banded.toDF("id_a", "band", "bucket")
      .join(banded.toDF("id_b", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val withNorm = embeddings.select(col(idCol), col(vecCol),
      norm2(col(vecCol)).as("_n2"))
    cand
      .join(withNorm.toDF("id_a", "va", "n2a"), "id_a")
      .join(withNorm.toDF("id_b", "vb", "n2b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (sqrt(col("n2a")) * sqrt(col("n2b"))), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Hubness diagnostic: the k-occurrence histogram — how often each
    * vector appears in OTHER vectors' cosine top-k. High-dimensional
    * embedding spaces grow "hubs" (vectors in everyone's neighbor
    * list) that silently dominate kNN-based dedup/retrieval; the
    * shape of this histogram (long right tail + mass at 0 =
    * anti-hubs) is the standard health check before trusting an ANN
    * index.
    *
    * Queries are a deterministic 1-in-`sampleMod` id sample — the
    * histogram is a corpus STATISTIC, so a sample estimates it; the
    * query side stays broadcast-sized at any corpus scale while the
    * full corpus streams through one broadcast-join pass. Top-k per
    * query is a (qid-partitioned) window rank over candidates —
    * parallel across queries. Counting and the final histogram are
    * two tiny integer aggregations; vectors never ranked enter at
    * k_occurrence = 0 via the left anti-side coalesce.
    */
  def hubness(embeddings: DataFrame, k: Int = 10, sampleMod: Long = 5,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col(idCol).as("vid"), col(vecCol).as("v"),
      norm2(col(vecCol)).as("n2"))
    val q = e.filter(col("vid") % sampleMod === 0)
      .select(col("vid").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    val ranked = e.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        round(dot(col("v"), col("qv")) / (sqrt(col("n2")) * sqrt(col("qn2"))), 6)
          .as("cos_sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vid"))))
      .filter(col("rn") <= k)
    val counts = ranked.groupBy("vid").agg(count(lit(1)).as("c"))
    embeddings.select(col(idCol).as("vid"))
      .join(counts, Seq("vid"), "left")
      .select(coalesce(col("c"), lit(0L)).as("k_occurrence"))
      .groupBy("k_occurrence").agg(count(lit(1)).as("n_vecs"))
      .orderBy("k_occurrence")
  }

  /** Mutual-kNN graph over (a deterministic sample of) the embedding
    * table: a directed edge a→b when b is in a's cosine top-k; kept
    * only when RECIPROCATED (b also ranks a) — the standard
    * noise-robust neighborhood graph that downstream graph analytics
    * (k-core, link prediction, clustering) run on. Degrees are
    * bounded by k BY CONSTRUCTION, so every consumer is safe from
    * hub blowup at any scale.
    *
    * Ranking is by (round(cos,6) desc, id) — the q168 discipline that
    * makes the cutoff identical in both engines. The battery samples
    * 1-in-`sampleMod` (the brute pair build is quadratic in the
    * sample); at corpus scale swap the brute scorer for the q94
    * batch-ANN candidates and keep everything downstream unchanged.
    * Returns canonical (src < dst) undirected edges.
    */
  def mutualKnnEdges(embeddings: DataFrame, k: Int = 5, sampleMod: Long = 5,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "mutualKnnEdges: k must be >= 1")
    val s = embeddings.filter(col(idCol) % sampleMod === 0)
      .select(col(idCol).as("vid"), col(vecCol).as("v"),
        norm2(col(vecCol)).as("n2"))
    val q = s.select(col("vid").as("qid"), col("v").as("qv"),
      col("n2").as("qn2"))
    val directed = s.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid").as("src"), col("vid").as("dst"),
        round(dot(col("v"), col("qv")) / (sqrt(col("n2")) * sqrt(col("qn2"))), 6)
          .as("cos_sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("cos_sim").desc, col("dst"))))
      .filter(col("rn") <= k)
      .select("src", "dst")
    val rev = directed.select(col("dst").as("src"), col("src").as("dst"))
    directed.join(rev, Seq("src", "dst"), "left_semi")
      .where(col("src") < col("dst"))
      .select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
  }

  /** Reciprocal-rank fusion of two retrieval rankings (cosine and
    * euclidean) against one query vector — the standard zero-tuning
    * hybrid-search combiner. Each ranker contributes
    * `round(1e12 / (rrfK + rank))` PICO-units, so the fused score is
    * an exact BIGINT sum (aggregation-order-free) and the final
    * ordering is integer comparison with id tie-break.
    *
    * Both rank passes route through Ranks.rowNumberExact (ordered
    * windows over the rounded-score value dictionaries only); at
    * corpus scale you still run this on each ranker's top-N candidate
    * list (N ≈ 1000), never the full corpus; the scoring passes
    * themselves are broadcast-join map work.
    */
  def rrfFuse(embeddings: DataFrame, query: DataFrame, k: Int = 10,
              rrfK: Int = 60,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = embeddings
      .crossJoin(broadcast(query.select(col("qv"), norm2(col("qv")).as("qn2"))))
      .select(col(idCol).as("vid"),
        round(dot(col(vecCol), col("qv"))
          / (sqrt(norm2(col(vecCol))) * sqrt(col("qn2"))), 6).as("cos_sim"),
        round(graft.functions.VectorOps.l2sq(col(vecCol), col("qv")), 6).as("l2"))
    // both rank passes route through Ranks.rowNumberExact — ordered
    // windows over the rounded-score VALUE dictionaries, never a
    // partition-less sort of the candidate frame
    val rankedCos = graft.engine.Ranks
      .rowNumberExact(scored, "cos_sim", "vid", valueDesc = true,
        out = "rank_cos", withTotal = false)
    val fused = graft.engine.Ranks
      .rowNumberExact(rankedCos, "l2", "vid", out = "rank_l2",
        withTotal = false)
      .withColumn("rrf_pico",
        round(lit(1e12) / (lit(rrfK) + col("rank_cos"))).cast("long") +
          round(lit(1e12) / (lit(rrfK) + col("rank_l2"))).cast("long"))
    // ranks cast to long: DuckDB window functions answer BIGINT
    fused.select(col("vid").as(idCol), col("rank_cos").cast("long").as("rank_cos"),
        col("rank_l2").cast("long").as("rank_l2"), col("rrf_pico"))
      .orderBy(col("rrf_pico").desc, col(idCol))
      .limit(k)
  }
  /** Davies–Bouldin cluster-separation audit over labeled embeddings
    * (Davies & Bouldin 1979, public literature): per label, the
    * intra-cluster scatter s (mean member→centroid distance) and the
    * worst ratio R = max_{j≠i} (sᵢ+sⱼ)/d(cᵢ,cⱼ) — R ≫ 1 means the
    * cluster bleeds into a neighbor; mean R over labels is the DB
    * index. Engine determinism throughout: centroid means are exact
    * (float32 inputs sum without rounding in double at these counts),
    * every squared deviation is 1e12-quantized before its BIGINT
    * sum, member distances 1e9-quantized before the per-label mean,
    * and each ratio 1e6-quantized before the max.
    *
    * Scale: one posexplode pass (rows×dims), a (label,dim) rollup,
    * a broadcast of the label×dim centroid dictionary back onto
    * members, and a labels² pair frame — everything after the first
    * rollup is dictionary-sized.
    */
  def daviesBouldin(emb: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val e = emb.select(col(labelCol).cast("string").as("lab"),
        col(idCol).as("vid"),
        posexplode(col(vecCol)).as(Seq("i0", "x")))
      .select(col("lab"), col("vid"), (col("i0") + 1).cast("long").as("i"),
        col("x").cast("double").as("x"))
    val cent = e.groupBy("lab", "i")
      .agg((sum("x") / count(lit(1))).as("m"), count(lit(1)).as("nm"))
      .trackedPersist()
    // member -> centroid distances, exact in 1e12 units per dim term
    val d2 = e.join(broadcast(cent.select(col("lab"), col("i"), col("m"))),
        Seq("lab", "i"))
      .withColumn("t_u", round((col("x") - col("m")) * (col("x") - col("m"))
        * lit(1e12)).cast("long"))
      .groupBy("lab", "vid").agg(sum("t_u").as("d2_u"))
      .select(col("lab"),
        round(sqrt(col("d2_u").cast("double") / lit(1e12)) * lit(1e9))
          .cast("long").as("v_u"))
    val scatter = d2.groupBy("lab")
      .agg(count(lit(1)).as("n_members"),
        round(sum("v_u").cast("double") / count(lit(1))).cast("long")
          .as("s_u"))
      .trackedPersist()
    // centroid pair distances on the labels^2 dictionary
    val ca = cent.select(col("lab").as("la"), col("i"), col("m").as("ma"))
    val cb = cent.select(col("lab").as("lb"), col("i"), col("m").as("mb"))
    val dd = ca.join(broadcast(cb), Seq("i")).where(col("la") =!= col("lb"))
      .withColumn("t_u", round((col("ma") - col("mb")) *
        (col("ma") - col("mb")) * lit(1e12)).cast("long"))
      .groupBy("la", "lb").agg(sum("t_u").as("dd_u"))
      .select(col("la"), col("lb"),
        round(sqrt(col("dd_u").cast("double") / lit(1e12)) * lit(1e9))
          .cast("long").as("d_u"))
    val ratios = dd
      .join(broadcast(scatter.select(col("lab").as("la"),
        col("s_u").as("sa_u"))), Seq("la"))
      .join(broadcast(scatter.select(col("lab").as("lb"),
        col("s_u").as("sb_u"))), Seq("lb"))
      .where(col("d_u") > 0L)
      .select(col("la"), col("lb"),
        round((col("sa_u") + col("sb_u")).cast("double") / col("d_u")
          * lit(1e6)).cast("long").as("r_u"))
    val worst = ratios.groupBy("la")
      .agg(max(struct(col("r_u"), col("lb"))).as("top"))
      .select(col("la").as("lab"), col("top.r_u").as("r_u"),
        col("top.lb").as("worst_label"))
    scatter.join(broadcast(worst), Seq("lab"), "left")
      .select(col("lab").as("label"), col("n_members"),
        (col("s_u").cast("double") / 1e9).as("scatter"),
        col("worst_label"),
        (col("r_u").cast("double") / 1e6).as("r_max"))
      .orderBy("label")
  }
  /** Calinski–Harabasz index (variance-ratio criterion) of a labeled
    * embedding set — the BETWEEN/WITHIN companion to
    * [[daviesBouldin]]: CH = (B/(K−1)) / (W/(N−K)) with
    * B = Σ_k n_k·‖μ_k − μ‖² and W = Σ_i ‖x_i − μ_{c(i)}‖². Higher =
    * better-separated clusters; the pair (CH up, DB down) is the
    * standard label-quality verdict.
    *
    * Determinism follows the q260 pattern: float32 inputs sum
    * round-free in double at these counts, so per-(label, dim) and
    * global means are EXACT; every squared term is 1e12-quantized to
    * BIGINT before its (DECIMAL-carried) sum, so aggregation order
    * cannot move the result; CH is one double division rounded to 6.
    * Degenerate inputs (K < 2, N ≤ K, zero within-scatter) answer
    * NULL rather than a division error.
    *
    * Scale: one posexplode pass, (label, dim) + dim dictionary
    * rollups broadcast back, one point-keyed reduction. No window.
    */
  def calinskiHarabasz(emb: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame = {
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val e = emb.select(col(labelCol).cast("string").as("lab"),
        col(idCol).as("vid"), posexplode(col(vecCol)).as(Seq("i0", "x")))
      .select(col("lab"), col("vid"), (col("i0") + 1).cast("long").as("i"),
        col("x").cast("double").as("x"))
    val cent = e.groupBy("lab", "i")
      .agg((sum("x") / count(lit(1))).as("m"), count(lit(1)).as("nm"))
    val glob = e.groupBy("i").agg((sum("x") / count(lit(1))).as("g"))
    val wS = e.join(broadcast(cent.select("lab", "i", "m")), Seq("lab", "i"))
      .select(round((col("x") - col("m")) * (col("x") - col("m"))
        * lit(1e12)).cast("long").as("t"))
      .agg(coalesce(sum(dec(col("t"))), dec(lit(0L))).as("w_u"))
    val bS = cent.join(broadcast(glob), Seq("i"))
      .select((dec(col("nm")) * dec(round((col("m") - col("g"))
        * (col("m") - col("g")) * lit(1e12)).cast("long"))).as("t"))
      .agg(coalesce(sum(col("t")), dec(lit(0L))).as("b_u"))
    val counts = e.agg(countDistinct("vid").as("n_points"),
      countDistinct("lab").as("n_clusters"))
    counts.crossJoin(broadcast(wS)).crossJoin(broadcast(bS))
      .select(col("n_points"), col("n_clusters"),
        round(col("b_u").cast("double") / 1e12, 6).as("between_ss"),
        round(col("w_u").cast("double") / 1e12, 6).as("within_ss"),
        when(col("n_clusters") >= 2L && col("n_points") > col("n_clusters") &&
            col("w_u").cast("double") > 0.0,
          round((col("b_u") * dec(col("n_points") - col("n_clusters")))
              .cast("double") /
            (col("w_u") * dec(col("n_clusters") - 1L)).cast("double"), 6))
          .as("ch_index"))
  }

  /** Embedding drift audit between two halves of a corpus (vec_id
    * parity as the deterministic split — swap in a time column in
    * production): per-dimension centroid means of each half (exact —
    * float32 inputs sum round-free in double at these counts), the
    * pooled-standard-deviation-standardized mean shift per dimension
    * (squared terms 1e12-quantized before their BIGINT sums), and
    * the per-dim absolute gap — the "did the embedding distribution
    * move" monitor that q125's scalar PSI can't see. A zero-variance
    * dimension reports NULL shift.
    *
    * Scale: one posexplode pass, one (half, dim) rollup, one
    * dim-keyed join of two dictionary frames.
    */
  def embeddingDrift(emb: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val e = emb.select((col(idCol) % 2L === 0L).as("half_a"),
        posexplode(col(vecCol)).as(Seq("i0", "x")))
      .select(col("half_a"), (col("i0") + 1).cast("long").as("i"),
        col("x").cast("double").as("x"))
    val stats = e.groupBy("half_a", "i")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(round(col("x") * col("x") * lit(1e12)).cast("long")).as("sxx_u"))
    val a = stats.where(col("half_a"))
      .select(col("i"), col("n").as("na"), col("sx").as("sxa"),
        col("sxx_u").as("qa_u"))
    val b = stats.where(!col("half_a"))
      .select(col("i"), col("n").as("nb"), col("sx").as("sxb"),
        col("sxx_u").as("qb_u"))
    val ssA = (col("qa_u").cast("double") / lit(1e12) -
      col("sxa") * col("sxa") / col("na").cast("double"))
    val ssB = (col("qb_u").cast("double") / lit(1e12) -
      col("sxb") * col("sxb") / col("nb").cast("double"))
    val pooled = sqrt((ssA + ssB) / (col("na") + col("nb") - 2L)
      .cast("double"))
    a.join(b, "i").select(col("i"), col("na"), col("nb"),
        round(col("sxa") / col("na"), 6).as("mean_a"),
        round(col("sxb") / col("nb"), 6).as("mean_b"),
        round(abs(col("sxa") / col("na") - col("sxb") / col("nb")), 6)
          .as("abs_gap"),
        when(col("na") > 1L && col("nb") > 1L && pooled > 0.0,
          round((col("sxa") / col("na") - col("sxb") / col("nb")) / pooled,
            6)).as("std_shift"))
      .orderBy("i")
  }
}
