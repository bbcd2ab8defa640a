package graft.ext

import graft.engine.TrackedCache.Trackable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines — the
  * steps between raw scraped documents and a training shard:
  * repetition-based quality signals, stratified deterministic
  * sampling, fixed-size token chunking, and cross-modal alignment.
  *
  * All relational (`functions._` + one window/agg shuffle where a
  * shuffle is inherent); no UDFs, no driver loops, so every operator
  * scales linearly and is oracle-checkable in DuckDB.
  */
object Corpus {

  /** Repetition signals per document (the Gopher/RefinedWeb-style
    * cheap quality gates):
    *  - `distinct_ratio`: |set(tokens)| / |tokens| — low = loopy text;
    *  - `top_bigram_frac`: occurrences of the most frequent 2-gram /
    *    total 2-grams — high = boilerplate or degenerate repetition.
    *
    * Shape: ZERO shuffles — per-doc state never leaves its row. The
    * top-bigram count is the longest equal-run in the per-row SORTED
    * bigram array (sort_array + an aggregate fold, O(L log L) per
    * row), which beat the relational explode → groupBy(doc, gram) →
    * groupBy(doc) form (two hash-agg shuffles) 5× at sf0.1 — and at
    * 100 TB turns a shuffle-bound stage into a map-only one. Token
    * and bigram arrays are materialized in their own projections
    * first (the interpreted-HOF re-evaluation trap — see
    * Dedup.shingles).
    */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val withToks = docs.select(col(idCol),
      TextStats.tokens(col(textCol)).as("_toks"))
    val toks = col("_toks")
    val withBigrams = withToks.select(col(idCol), col("_toks"),
      when(size(toks) >= 2,
        sort_array(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
        .otherwise(array(lit(""))).as("_bg"))
    // longest equal-run in the sorted array = the max bigram count
    val maxRun = aggregate(col("_bg"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))
    withBigrams.select(col(idCol),
      round(size(array_distinct(toks)).cast("double") / size(toks), 6)
        .as("distinct_ratio"),
      round(maxRun.cast("double") / size(col("_bg")), 6)
        .as("top_bigram_frac"))
  }

  /** Deterministic stratified sample: the k smallest-md5(id) rows per
    * stratum — the distributed, RNG-free version of "sample k docs per
    * language/source". One window shuffle on the stratum key; the
    * rank is a running top-k, not a full sort of each stratum
    * (WindowExec with rank + filter k prunes eagerly under AQE).
    * Engine-portable: md5 order is the same everywhere.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, k: Int,
                       idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Per-stratum TOKEN-budget sampling: keep the maximal prefix of
    * each stratum — in deterministic md5(id) order — whose cumulative
    * token count fits the stratum's budget. This is how real data
    * mixes are specified ("200 B tokens of web, 50 B of code"):
    * budgets bound TOKENS, not row counts, so document-length skew
    * cannot silently change the mix. Deterministic on any cluster
    * layout (the hash order is data-derived, like `stratifiedSample`);
    * one window shuffle on the stratum key. Once a document overflows
    * the budget, every later document in hash order is excluded too
    * (prefix semantics — the cumulative sum is monotone), which keeps
    * the selection reproducible and oracle-expressible.
    */
  def tokenBudgetSample(df: DataFrame, budgets: Map[String, Long],
                        stratumCol: String = "lang",
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        defaultBudget: Long = 0L): DataFrame = {
    require(budgets.values.forall(_ >= 0L), s"budgets must be >= 0: $budgets")
    require(defaultBudget >= 0L, s"defaultBudget must be >= 0: $defaultBudget")
    // a stratum ABSENT from `budgets` gets `defaultBudget` — with the
    // default 0 it is DROPPED entirely. That is deliberate (a token
    // mix is a closed allocation: an unlisted source contributes
    // nothing), but it must be explicit — a caller who wants unlisted
    // strata to pass through sets defaultBudget = Long.MaxValue, and
    // any oracle replaying this must spell the same ELSE branch
    // (explicit WHEN per stratum, ELSE <defaultBudget>)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (stratum, b)) =>
      when(col(stratumCol) === stratum, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(TextStats.tokenCount(col(textCol))).over(w))
      .filter(col("_cum") <= budget)
      .drop("_cum")
  }

  /** Greedy sequence packing: assign every document to a fixed
    * token-budget BIN by its running token offset within a stratum —
    * the batch-packing step before training, where documents are
    * concatenated into fixed context windows and each document's bin
    * is the window its first token lands in (offset packing; a
    * document longer than the budget spans bins but is assigned where
    * it starts). Deterministic in (stratum, id) order. Integer
    * arithmetic only (`div`), so the assignment is engine-exact.
    *
    * Shape: ONE window sum partitioned on the stratum key — the same
    * exchange as any grouped aggregate, no global ordering anywhere,
    * so packing 100 TB parallelizes across strata (use the
    * shard/source id as the stratum at corpus scale; a single global
    * sequence would serialize the window into one partition).
    * Returns (idCol, stratumCol, n_tokens, bin).
    */
  def packByTokenBudget(docs: DataFrame, budget: Long,
                        stratumCol: String = "lang",
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(stratumCol),
        TextStats.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(_cum - n_tokens) div ${budget}L"))
      .select(col(idCol), col(stratumCol), col("n_tokens"), col("bin"))
  }

  /** Packing-contamination audit — when [[packByTokenBudget]]'s packs
    * are trained WITHOUT document-boundary attention masks, every
    * token attends (causally) to all earlier tokens in the pack,
    * including other documents': per stratum, how many of the pack's
    * causal attention pairs cross a document boundary. cross_pairs =
    * Σ_doc n_tokens × (tokens packed before it in the same pack);
    * total_pairs = Σ_pack T(T−1)/2 — all integer arithmetic (the
    * product of consecutive integers is even, so the halving is
    * exact), one contamination ratio per stratum at the end. The
    * number that decides whether the trainer needs block-diagonal
    * masks or the packs need re-cutting. Windows are PARTITIONED by
    * (stratum, pack) / stratum only.
    */
  def packingContamination(docs: DataFrame, budget: Long,
                           stratumCol: String = "lang",
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    import graft.engine.Ranks.idiv
    val packed = packByTokenBudget(docs, budget, stratumCol, idCol, textCol)
    val wp = Window.partitionBy(col(stratumCol), col("bin"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrefix = packed
      .withColumn("_prefix", sum("n_tokens").over(wp) - col("n_tokens"))
    val perPack = withPrefix.groupBy(col(stratumCol), col("bin"))
      .agg(count(lit(1)).as("_nd"), sum("n_tokens").as("_tt"),
        sum(col("n_tokens") * col("_prefix")).as("_cross"))
    perPack.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_packs"),
        sum("_nd").cast("long").as("n_docs"),
        sum("_tt").cast("long").as("n_tokens"),
        sum("_cross").cast("long").as("cross_pairs"),
        sum(idiv(col("_tt") * (col("_tt") - 1L), lit(2L))).cast("long")
          .as("total_pairs"))
      .select(col(stratumCol), col("n_packs"), col("n_docs"),
        col("n_tokens"), col("cross_pairs"), col("total_pairs"),
        when(col("total_pairs") > 0L,
          round(col("cross_pairs").cast("double") / col("total_pairs"), 6))
          .as("contamination"))
      .orderBy(stratumCol)
  }

  /** Token-budget water-filling — the mixture planner's core
    * allocation: given per-source token masses and a corpus budget
    * (`budgetFrac` of the total), the proportional-fair allocation
    * caps every source at a common water level c with
    * Σ min(t_s, c) ≤ budget — small sources keep everything, the
    * level trims only the heavy tail (the max-min-fair answer; plain
    * proportional scaling would starve small sources).
    *
    * Exact integer plan: sources rank/prefix-sum by token mass via
    * `Ranks.rowNumberWithRunningSum` (ordered window over the
    * source-mass VALUE dictionary only); the pivot row is the max
    * rank whose "fill everyone up to my mass" cost fits the budget
    * (cum + (n−rk)·t ≤ B, a per-row integer predicate + one max);
    * the level is the integer floor division of the remaining budget
    * over the remaining sources. NULL level = nothing needs
    * trimming (B ≥ total). Output is source-dictionary-sized.
    */
  def budgetWaterfill(docs: DataFrame, budgetFrac: Double,
                      groupCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      s"budgetWaterfill: budgetFrac in (0,1], got $budgetFrac")
    import graft.engine.Ranks
    val per = docs.groupBy(col(groupCol).as("grp"))
      .agg(sum(TextStats.tokenCount(col(textCol))).cast("long").as("t"))
    val ranked = Ranks.rowNumberWithRunningSum(per, "t", "grp",
      outRank = "rk", outCum = "cum", withTotal = false)
    val tot = per.agg(sum("t").cast("long").as("_tt"),
      count(lit(1)).cast("long").as("_n"))
    val w = ranked.crossJoin(broadcast(tot))
      .withColumn("_b",
        floor(col("_tt").cast("double") * lit(budgetFrac)).cast("long"))
      .withColumn("_used_here",
        col("cum") + (col("_n") - col("rk")) * col("t"))
    val pick = w.filter(col("_used_here") <= col("_b"))
      .agg(max("rk").as("_prk"), max("cum").as("_pcum"))
    w.crossJoin(broadcast(pick))
      .withColumn("cap",
        when(col("_prk").isNull, Ranks.idiv(col("_b"), col("_n")))
          .when(col("_prk") === col("_n"), lit(null).cast("long"))
          .otherwise(Ranks.idiv(col("_b") - col("_pcum"),
            col("_n") - col("_prk"))))
      .select(col("grp"), col("t").as("n_tokens"), col("_b").as("budget"),
        col("cap"),
        least(col("t"), coalesce(col("cap"), col("t"))).as("allocation"),
        (col("t") - least(col("t"), coalesce(col("cap"), col("t"))))
          .as("trimmed"),
        round((col("t") - least(col("t"), coalesce(col("cap"), col("t"))))
          .cast("double") / col("t"), 6).as("trim_frac"))
      .orderBy("grp")
  }

  /** Content-defined chunking (rolling-hash CDC): a chunk boundary
    * falls wherever the hash of the `w`-token window starting at a
    * position divides `divisor` — so boundaries depend only on LOCAL
    * content, and inserting text into a document shifts chunk
    * boundaries only until the next boundary instead of re-chunking
    * everything (the property fixed-size chunking lacks, and the
    * reason CDC is the dedup-friendly splitter: shifted copies still
    * share almost all chunk fingerprints). Mean chunk length ≈
    * `divisor` tokens. Engine-portable hash (md5-hex7), so the whole
    * operator oracles (q102).
    *
    * Shape: boundary flags are computed inside each row's own token
    * array (map-only); the only exchange is the per-document window
    * for the running boundary count + the chunk aggregate — both
    * partition on the doc id. Returns
    * (idCol, chunk_id, n_tokens, chunk_text, chunk_hash).
    */
  def cdcChunks(docs: DataFrame, w: Int = 3, divisor: Long = 16,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 1 && divisor >= 1, s"need w >= 1, divisor >= 1 (w=$w, d=$divisor)")
    val withToks = docs.select(col(idCol), TextStats.tokens(col(textCol)).as("_toks"))
    val toks = col("_toks")
    // flag(pos) = 1 iff the window STARTING at pos hashes to 0 mod
    // divisor; tail positions with no full window never flag
    val flags = when(size(toks) >= w,
      concat(
        transform(sequence(lit(1), size(toks) - lit(w - 1)),
          i => (conv(substring(md5(array_join(slice(toks, i, lit(w)), " ")), 1, 7), 16, 10)
            .cast("long") % lit(divisor) === lit(0L)).cast("int")),
        array_repeat(lit(0), lit(w - 1))))
      .otherwise(transform(toks, _ => lit(0)))
    val posed = withToks
      .select(col(idCol),
        posexplode(zip_with(toks, flags,
          (t, f) => struct(t.as("tok"), f.as("flag")))).as(Seq("pos", "_z")))
      .select(col(idCol), col("pos"), col("_z.tok").as("tok"),
        col("_z.flag").as("flag"))
    // a boundary token CLOSES its chunk: chunk id = boundaries strictly
    // before this position
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    posed
      .withColumn("chunk_id", coalesce(sum(col("flag")).over(byDoc), lit(0)).cast("long"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  /** Packed-row manifest: the emit side of `packByTokenBudget` — one
    * row per (stratum, bin) with the ordered provenance list of
    * packed documents and the bin's token payload. This is the
    * manifest a training-data writer consumes to materialize fixed
    * context windows (the text itself stays columnar; concatenation
    * happens at the final serialization, not in the engine).
    * Same single stratum exchange as the packing pass; the manifest
    * is bins-sized, orders of magnitude smaller than the corpus.
    */
  def packedRowManifest(docs: DataFrame, budget: Long,
                        stratumCol: String = "lang",
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    packByTokenBudget(docs, budget, stratumCol, idCol, textCol)
      .groupBy(col(stratumCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        // numeric sort, string join — a lexicographic sort would put
        // "10" before "9" and break cross-engine determinism
        array_join(
          transform(array_sort(collect_list(struct(col(idCol)))),
            s => s.getField(idCol).cast("string")),
          ",").as("doc_ids"))

  /** Fixed-size token chunking with overlap — the context-window
    * splitter every LLM data pipeline runs before tokenization.
    * Emits (id, chunk_id, chunk_text, n_tokens); the last chunk keeps
    * its ragged tail (standard behavior — no padding here).
    *
    * Shape: per-row sequence of chunk starts → posexplode → slice.
    * Purely narrow (no shuffle): chunking 100 TB is a map-only job.
    * `stride = chunkSize - overlap` rows per chunk start.
    */
  def chunk(docs: DataFrame, chunkSize: Int, overlap: Int = 0,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val withToks = docs.select(col(idCol),
      TextStats.tokens(col(textCol)).as("_toks"))
    val toks = col("_toks")
    // starts: 1, 1+stride, 1+2·stride, … while start <= |tokens|
    // (1-based for slice); ceil division keeps the ragged tail
    val nChunks = ceil((size(toks) - lit(overlap)).cast("double") / stride)
      .cast("int")
    val starts = transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
      i => i * stride + 1)
    withToks
      .select(col(idCol), col("_toks"),
        posexplode(starts).as(Seq("chunk_id", "start")))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("_toks"), col("start"), lit(chunkSize)), " ")
          .as("chunk_text"),
        least(size(col("_toks")) - col("start") + 1, lit(chunkSize))
          .cast("long").as("n_tokens"))
  }

  /** Weighted domain mixing — the "sample sources at different rates"
    * step of training-data assembly (e.g. books 2×-epoch'd, web 0.3×):
    * keep a row iff its deterministic hash coin lands under the
    * stratum's rate. The coin is the first 15 md5 hex chars of the id
    * (a uniform draw in [0, 2^60)), so the sample is RNG-free,
    * partition-invariant, engine-portable — and REPRODUCIBLE: the
    * same corpus + rates give the same mixture on any cluster.
    * Unlisted strata default to rate 0 (dropped). Purely narrow —
    * a map-side filter at any scale.
    */
  def weightedSample(df: DataFrame, stratumCol: String,
                     rates: Map[String, Double],
                     idCol: String = "doc_id"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1]: $rates")
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    val coin = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    df.filter(coin < rate)
  }

  /** Boilerplate-line removal (the CCNet/RefinedWeb line-dedup gate):
    * a "line" (here a fixed `lineSize`-token span — the same split
    * math as `chunk`, pinned against SQL in q64/q81) is boilerplate
    * when it occurs in ≥ `minDf` distinct documents, optionally
    * scoped per `groupCol` (domain-scoped nav/footer stripping);
    * boilerplate lines are dropped and each document reassembled in
    * original line order. Returns (id, clean_text, n_lines,
    * n_removed).
    *
    * Shape: lines explode map-side; the document-frequency table is
    * one hash aggregate on the 64-bit line hash (fixed-width key, as
    * everywhere in dedup — exact absent a 64-bit collision); the
    * mark join keys on the SAME hash so it reuses the aggregate's
    * partitioning; reassembly is one aggregate on the doc id. No
    * per-line state ever reaches the driver, so the gate is three
    * shuffles at any corpus size.
    */
  def stripBoilerplate(docs: DataFrame, lineSize: Int = 8, minDf: Long = 2,
                       groupCol: Option[String] = None,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(lineSize > 0, s"lineSize must be > 0: $lineSize")
    require(minDf >= 2, s"minDf < 2 would strip every line: $minDf")
    val gcols = groupCol.toSeq
    val withToks = docs.select(
      (col(idCol) +: gcols.map(col)) :+ TextStats.tokens(col(textCol)).as("_toks"): _*)
    val toks = col("_toks")
    val nLines = greatest(
      ceil(size(toks).cast("double") / lineSize).cast("int"), lit(1))
    val starts = transform(sequence(lit(0), nLines - 1), i => i * lineSize + 1)
    val lines = withToks
      .select((col(idCol) +: gcols.map(col)) ++
        Seq(col("_toks"), posexplode(starts).as(Seq("line_id", "_start"))): _*)
      .select((col(idCol) +: gcols.map(col)) ++ Seq(col("line_id"),
        array_join(slice(col("_toks"), col("_start"), lit(lineSize)), " ")
          .as("line")): _*)
      .withColumn("_h", xxhash64(col("line")))
    val dfKeys = gcols :+ "_h"
    val dfTab = lines.groupBy(dfKeys.map(col): _*)
      .agg(countDistinct(col(idCol)).as("_df"))
    val kept = lines.join(dfTab, dfKeys).filter(col("_df") < minDf)
    val total = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val keptAgg = kept.groupBy(col(idCol)).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("line_id"), col("line")))),
        s => s.getField("line")), " ").as("clean_text"),
      count(lit(1)).as("_n_kept"))
    total.join(keptAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("_n_kept"), lit(0L))).as("n_removed"))
  }

  /** Cross-modal alignment: documents joined to their embedding row
    * (id-aligned tables), the standard shape for "filter text by
    * embedding-space property" or "aggregate text stats per embedding
    * cluster". Broadcast when one side is dimension-sized; hash join
    * on the shared id otherwise — either way one (or zero) shuffles.
    */
  def withEmbeddings(docs: DataFrame, embeddings: DataFrame,
                     docId: String = "doc_id",
                     vecId: String = "vec_id"): DataFrame =
    docs.join(embeddings.withColumnRenamed(vecId, docId), docId)

  /** The COMPOSED corpus-prep pipeline — the end-to-end shape a
    * training-data run actually executes, chained from the individual
    * operators so each stage keeps its own scale posture:
    *
    *  1. quality gate (`TextStats.qualityScore` ≥ threshold) —
    *     map-only, drops junk before anything pays for it;
    *  2. exact dedup (keep min-id per content fingerprint) — one
    *     shuffle on the md5 key;
    *  3. near-dup dedup on the survivors — MinHash/LSH candidates →
    *     exact-Jaccard verify (`minhashVerifiedPairs`), greedy
    *     keep-earliest (`applyNearDedup`);
    *  4. PII redaction (`Privacy.redact`) — map-only on what remains.
    *
    * Ordering is deliberate: the gates that shrink the corpus run
    * before the pair-generating stages, and redaction runs LAST so
    * dedup fingerprints see the original bytes (two docs differing
    * only in their PII should near-dup-collide, not exact-collide).
    * Returns (idCol, keepCols..., redacted) — `keepCols` are the
    * metadata columns carried through to the output.
    */
  def prepare(docs: DataFrame, minQuality: Double = 0.85,
              n: Int = 3, k: Int = 32, bands: Int = 8,
              minJaccard: Double = 0.5,
              idCol: String = "doc_id", textCol: String = "text",
              keepCols: Seq[String] = Seq("lang")): DataFrame = {
    val gated = docs.filter(TextStats.qualityScore(col(textCol)) >= minQuality)
    val keepExact = gated
      .groupBy(TextStats.fingerprint(col(textCol)).as("_fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    // cache the exact-dedup survivors: they root THREE subtrees (LSH
    // signatures, verify-join shingles, and the final anti-join's
    // left side), and uncached each one replays the scan + quality
    // gate + fingerprint aggregate + semi-join (measured ~1 s per
    // extra replay at sf0.1). A composed pipeline owns its
    // intermediate's lifecycle, so the cache is released as soon as
    // the result materializes — standard cache-fork-unpersist.
    val exactKept = gated.join(keepExact, Seq(idCol), "left_semi").cache()
    val pairs = Dedup.minhashVerifiedPairs(exactKept, n, k, bands, minJaccard,
      idCol, textCol)
    val out = Dedup.applyNearDedup(exactKept, pairs, idCol)
      .select(col(idCol) +: keepCols.map(col) :+
        Privacy.redact(col(textCol)).as("redacted"): _*)
    // materialize through the cache once, then let the blocks go: the
    // localCheckpoint truncates `out`'s lineage so nothing downstream
    // re-reads the unpersisted cache
    val snap = out.trackedLocalCheckpoint()
    exactKept.unpersist()
    snap
  }

  /** Deterministic stratum-free train/val/test assignment: one md5
    * hash coin per id against CUMULATIVE split boundaries. Every row
    * gets exactly one split (disjoint + exhaustive by construction),
    * assignment is reproducible across runs/engines, and per-stratum
    * proportions hold automatically because the coin is independent
    * of every data column — no per-source bookkeeping, no shuffle
    * (map-only), no state: the property that matters when a 100 TB
    * corpus is split incrementally shard by shard.
    */
  def hashSplit(df: DataFrame, splits: Seq[(String, Double)],
                idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val coin = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    // last bucket catches everything (avoid boundary-exclusion rows)
    val splitCol = splits.init.zip(bounds.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), hi), els) =>
        when(coin < hi, lit(name)).otherwise(els)
      }
    df.withColumn("split", splitCol)
  }

  /** Leakage-safe train/val/test split: the coin flips on the
    * content FINGERPRINT (md5 of whitespace-normalized text — q34's
    * exact-dup key), not the doc id, so every copy of a duplicated
    * document lands on the SAME side — the split-level fix for
    * eval contamination by exact dups (the SemDeDup/decontamination
    * literature's first rule). Emits the per-split audit:
    *
    *   - `n_docs`, `n_clusters` (distinct fingerprints), and
    *     `n_dup_docs` (members of multi-copy clusters) per split
    *   - `leaked_clusters`: fingerprints straddling splits — ZERO by
    *     construction, the pinned invariant
    *   - `id_coin_leaked`: the counterfactual — how many clusters
    *     the q123 doc-id coin WOULD have split across sides; the
    *     number this operator exists to zero out
    *
    * Scale: fingerprint + both coins are map-only expressions
    * ([[hashSplit]]'s incremental-shard property is preserved — any
    * shard splits independently); the audit is one fingerprint-keyed
    * aggregation + one split rollup, both dictionary-bound.
    */
  def leakageSafeSplit(docs: DataFrame,
                       splits: Seq[(String, Double)] =
                         Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val withFp = docs.withColumn("fp",
      md5(regexp_replace(lower(col(textCol)), "\\s+", " ")))
    val s1 = hashSplit(withFp, splits, "fp")
      .withColumnRenamed("split", "fp_split")
    val cl = hashSplit(s1, splits, idCol)
      .select(col(idCol), col("fp"), col("fp_split").as("split"),
        col("split").as("id_split"))
    val g = cl.groupBy("fp").agg(count(lit(1)).as("nc"),
      countDistinct("split").as("ns"), countDistinct("id_split").as("nis"))
    val leak = g.agg(
      sum(when(col("ns") > 1, 1L).otherwise(0L)).cast("long")
        .as("leaked_clusters"),
      sum(when(col("nis") > 1, 1L).otherwise(0L)).cast("long")
        .as("id_coin_leaked"))
    cl.join(g.select(col("fp"), col("nc")), "fp")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("fp").as("n_clusters"),
        sum(when(col("nc") > 1, 1L).otherwise(0L)).cast("long")
          .as("n_dup_docs"))
      .crossJoin(broadcast(leak))
      .orderBy("split")
  }

  /** Deterministic per-epoch training order — the "shuffle the
    * corpus differently every epoch" primitive, RNG-free so any
    * worker can recompute any shard's order: the epoch-e order key
    * is md5(e:id), a fresh pseudo-random permutation per epoch that
    * replays bit-identically anywhere.
    *
    * Scalable ranking WITHOUT a global sort: global rank =
    * first-hex-char bucket offset + within-bucket row_number. The
    * per-(epoch, bucket) windows sort 1/16th of an epoch each, and
    * the bucket-offset table (16 rows/epoch, from bucket SIZES) rides
    * as a broadcast — the two-phase distributed ranking pattern. The
    * composition equals a single global ROW_NUMBER over (key, id)
    * because the bucket char IS the key's first char (pinned by
    * spec differential).
    *
    * Returns (epoch, rank, idCol): rank 1..n within each epoch.
    */
  def epochShuffle(df: DataFrame, idCol: String = "doc_id",
                   nEpochs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nEpochs >= 1 && nEpochs <= 1000,
      s"epochShuffle: nEpochs 1..1000, got $nEpochs")
    val epochs = df.sparkSession.range(1, nEpochs + 1)
      .select(col("id").as("epoch"))
    val keyed = df.select(col(idCol).as("_id")).crossJoin(broadcast(epochs))
      .withColumn("_k", md5(concat(col("epoch").cast("string"), lit(":"),
        col("_id").cast("string"))))
      .withColumn("_b", substring(col("_k"), 1, 1))
    val wB = Window.partitionBy("epoch", "_b").orderBy(col("_k"), col("_id"))
    val ranked = keyed.withColumn("_rn", row_number().over(wB))
    val wOff = Window.partitionBy("epoch").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("epoch", "_b").agg(count(lit(1)).as("_s"))
      .withColumn("_off", coalesce(sum("_s").over(wOff), lit(0L)))
      .select("epoch", "_b", "_off")
    ranked.join(broadcast(offsets), Seq("epoch", "_b"))
      .select(col("epoch"), (col("_off") + col("_rn")).cast("long").as("rank"),
        col("_id").as(idCol))
  }

  /** Mixture-rate solver — closes the mixture loop (report →
    * RATES → weightedSample/tokenBudgetSample): given per-source
    * token counts, target mixture shares, and a total token budget,
    * the per-source sampling rate is
    * rate_s = min(1, budget·share_s / tokens_s) — capped at 1 when a
    * source is too small to fill its share (the report's job is to
    * surface exactly that). Pure arithmetic over a sources-sized
    * frame; emits the rate and the expected token yield.
    */
  def mixtureRates(tokensBySource: DataFrame, targets: Map[String, Double],
                   budgetTokens: Long,
                   sourceCol: String = "source",
                   tokensCol: String = "total_tokens"): DataFrame = {
    require(targets.values.forall(_ >= 0) &&
      math.abs(targets.values.sum - 1.0) < 1e-9,
      s"target shares must be non-negative and sum to 1: $targets")
    val share = targets.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    tokensBySource.select(col(sourceCol), col(tokensCol),
      round(share, 6).as("target_share"),
      round(least(lit(1.0),
        (lit(budgetTokens.toDouble) * share) / col(tokensCol).cast("double")),
        6).as("rate"))
      .withColumn("expected_tokens",
        // floor(x + 0.5): identical half-up in every engine (double
        // ROUND half-rule differs between engines at exact .5)
        floor(col("rate") * col(tokensCol).cast("double") + 0.5).cast("long"))
  }

  /** DoReMi-style one-round domain reweighting (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining"): per-domain CLIPPED excess loss of the proxy
    * model over the reference model, one multiplicative-weights
    * update from the uniform prior, uniform-smoothed:
    *   excess_d = mean_i max(proxy_i − ref_i, 0)
    *   w_d ∝ exp(η·excess_d)
    *   final_d = (1−ε)·w_d/Σw + ε/|D|
    * — the domain-mixture optimizer that complements the static
    * mixture machinery ([[mixtureRates]] consumes the weights this
    * emits as target shares; q124/q139/q312 apply them).
    *
    * Determinism: per-example clipped excesses are 1e-6-quantized
    * BIGINTs before the domain sum (order-free); the mean and the
    * single exp() are one deterministic double expression per DOMAIN
    * (dictionary-scale, mirrored verbatim by the oracle). The MW
    * score is computed MAX-NORMALIZED — exp(η·(excess − max excess))
    * ∈ (0, 1] via a 1-row broadcast of the max — which leaves the
    * normalized weights mathematically unchanged (the softmax shift
    * identity) and is overflow-free for ANY clipped excess, where
    * the unshifted exp would silently saturate BIGINT past
    * η·excess ≈ 22.9 (clipped excess is unbounded input). Scores
    * are then 1e-9-quantized before the normalizing sum so the
    * denominator is an exact integer ≥ 1e9 (the max domain scores
    * exactly 1e9); a domain more than ~20.7 nats of η-excess below
    * the max quantizes to score 0 — its true relative weight is
    * below 1e-9 — and keeps only the smoothing mass. The final
    * weight is one double expression, rounded 6. NULL-domain rows
    * and NULL / non-finite losses drop (a NaN excess would otherwise
    * quantize to a silent zero — the Evals finite rule).
    *
    * Scale shape: ONE domain-keyed aggregate over a map-side clipped
    * projection + a 1-row broadcast total. No windows, no joins at
    * data scale.
    */
  def doremiRound(examples: DataFrame, domainCol: String = "source",
                  proxyCol: String = "proxy_loss",
                  refCol: String = "ref_loss",
                  eta: Double = 1.0, smooth: Double = 0.0): DataFrame = {
    require(eta > 0, s"doremiRound: eta must be > 0, got $eta")
    require(smooth >= 0 && smooth < 1,
      s"doremiRound: smooth must be in [0, 1), got $smooth")
    // finite check on the raw excess before the clip+quantize:
    // greatest(NaN, 0) is NaN in Spark (NaN orders greatest) and
    // cast(NaN as long) is 0, so a NaN loss would silently count as
    // a zero-excess example instead of dropping
    val base = examples.select(col(domainCol).as("_d"),
        (col(proxyCol).cast("double") - col(refCol).cast("double"))
          .as("_x"))
      .filter(col("_d").isNotNull && Evals.finite(col("_x")))
      .select(col("_d"),
        round(lit(1e6) * greatest(col("_x"), lit(0.0))).cast("long")
          .as("_q"))
    val dom = base.groupBy("_d")
      .agg(count(lit(1)).as("n_examples"), sum("_q").as("_sq"))
      .select(col("_d"), col("n_examples"),
        (col("_sq").cast("double") / 1e6 / col("n_examples"))
          .as("_mx"))
      .trackedPersist() // domain dictionary; feeds max + scores
    val mxm = dom.agg(max("_mx").as("_mxm"))
    val sc = dom.crossJoin(broadcast(mxm))
      .select(col("_d"), col("n_examples"), col("_mx"),
        round(lit(1e9) * exp(lit(eta) * (col("_mx") - col("_mxm"))))
          .cast("long").as("_s"))
      .trackedPersist() // feeds total + output
    val tot = sc.agg(sum("_s").as("_ts"),
      count(lit(1)).as("n_domains"))
    sc.crossJoin(broadcast(tot))
      .select(col("_d").as(domainCol), col("n_examples"),
        round(col("_mx"), 6).as("excess_loss"),
        round(lit(1.0 - smooth) * col("_s") / col("_ts") +
          lit(smooth) / col("n_domains"), 6).as("weight"))
      .orderBy(domainCol)
  }

  /** Per-source corpus report card — the one-page summary a data
    * lead reads before touching mixture weights: doc count, token
    * totals/means, mean quality, language spread, vocabulary size.
    * Shape: one groupBy(source) pass over map-side per-doc stats
    * (quality summed as exact DECIMAL so the mean is partition-order
    * independent), plus one token-explode distinct count for vocab.
    */
  def sourceReport(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = docs.select(col("source"), col("lang"),
      TextStats.tokenCount(col("text")).as("_nt"),
      TextStats.qualityScore(col("text")).cast(DecimalType(18, 6)).as("_q"))
    val agg = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("_nt")).as("total_tokens"),
      round(sum(col("_nt")).cast("double") / count(lit(1)), 6).as("mean_tokens"),
      round(sum(col("_q")).cast("double") / count(lit(1)), 6).as("mean_quality"),
      count_distinct(col("lang")).cast("long").as("n_langs"))
    val vocab = docs
      .select(col("source"), explode(TextStats.tokens(col("text"))).as("_t"))
      .groupBy("source").agg(count_distinct(col("_t")).cast("long").as("vocab"))
    agg.join(vocab, "source")
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * for every anchor doc, `k` pseudo-random negative doc ids drawn
    * by an md5 hash coin over (id, j) — reproducible across runs and
    * engines, no RNG state. A negative that lands on its own anchor
    * shifts by one (mod n). Requires contiguous ids [0, n) — the
    * corpus-prepare output's row_number convention; the inner join
    * back to the corpus both validates existence and attaches the
    * negative's payload columns.
    *
    * Scale: map-only sample generation (k rows per anchor) + one
    * join keyed on the negative id.
    */
  def negativeSamples(docs: DataFrame, k: Int, nDocs: Long,
                      idCol: String = "doc_id",
                      payload: Seq[String] = Seq("source")): DataFrame = {
    require(k >= 1, s"negativeSamples: k must be >= 1 (got $k)")
    val raw = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      col("j").cast("string"))), 1, 15), 16, 10).cast("long") % nDocs
    val neg = when(raw === col(idCol), (raw + 1) % nDocs).otherwise(raw)
    val anchors = docs.select(col(idCol),
      explode(sequence(lit(1), lit(k))).as("j"))
      .select(col(idCol), col("j"), neg.as("neg_id"))
    val negSide = docs.select(
      (col(idCol).as("neg_id") +: payload.map(c => col(c).as(s"neg_$c"))): _*)
    anchors.join(negSide, "neg_id")
      .select(Seq(col(idCol), col("j"), col("neg_id")) ++
        payload.map(c => col(s"neg_$c")): _*)
  }

  /** Corpus snapshot diff — the versioning primitive for incremental
    * refreshes: classify every doc id across two snapshots as
    * added / removed / changed / unchanged by comparing content
    * fingerprints (md5 of normalized text) under a full-outer join.
    *
    * Scale: one shuffle join on the id key; the fingerprint is
    * computed map-side on each snapshot, so the join carries
    * (id, 32-byte fp) — not document text. Downstream policy
    * (re-embed changed docs, tombstone removed ones, route added
    * ones through dedup-vs-index) consumes the status column.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val a = oldSnap.select(col(idCol),
      TextStats.fingerprint(col(textCol)).as("_fp_old"))
    val b = newSnap.select(col(idCol),
      TextStats.fingerprint(col(textCol)).as("_fp_new"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_new").isNull, "removed")
          .when(col("_fp_old") =!= col("_fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * each row draws key = u^(1/w) from its deterministic md5 coin u
    * and the top-`k` keys win — inclusion probability proportional to
    * weight, no sequential pass, no RNG state. The weighted
    * complement to `stratifiedSample`'s uniform draw (weight = doc
    * length → length-proportional corpus subsampling; weight =
    * quality → quality-tilted).
    *
    * Distributed shape: map-only key computation + one TakeOrdered
    * top-k — no shuffle at all. Ranking uses round(key, 9) with id
    * tie-break so a last-ulp pow() difference between engines cannot
    * reorder the cut.
    */
  def weightedSampleES(df: DataFrame, weightCol: String, k: Int,
                       idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, "weightedSampleES: k must be >= 1")
    // coin in (0, 1]: 15 md5 hex digits → [0, 2^60) → shift by 1
    val coin = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + 1.0) / lit(1152921504606846976.0) // 2^60
    val key = round(pow(coin, lit(1.0) / col(weightCol).cast("double")), 9)
    df.withColumn("es_key", key)
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Per-group quantile normalization: each row's value mapped to its
    * within-group rank fraction (row_number−1)/(n−1) under the
    * (value, id) total order — making scores COMPARABLE ACROSS
    * sources whose raw scales differ (the calibration step before
    * any cross-source quality threshold). Strict row_number ordering
    * (not rank) keeps the output deterministic under ties; integer
    * rank arithmetic keeps it engine-exact.
    *
    * One group-keyed window shuffle; at 100 TB the same mapping comes
    * from approx_percentile cuts (sketch pass + map-only lookup).
    */
  def quantileNormalize(df: DataFrame, valueCol: String, groupCol: String,
                        idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))
    val n = Window.partitionBy(groupCol)
    df.withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(n))
      .withColumn("qnorm",
        when(col("_n") > 1,
          round((col("_rn") - 1).cast("double") / (col("_n") - 1), 6))
          .otherwise(lit(0.0)))
      .drop("_rn", "_n")
  }

  /** Temperature-scaled mixture shares (the multilingual α-sampling
    * rule: share_s ∝ p_s^α with p_s the source's natural token
    * fraction): α = 1 reproduces the natural mix, α → 0 approaches
    * uniform — the standard low-resource up-sampling knob. Composes
    * with the q124 budget solver: rate_s = min(1, budget·share_s /
    * tokens_s).
    *
    * Determinism: p_s are exact integer ratios; the single pow per
    * source is quantized to 1e-9 units (BIGINT) before normalization,
    * so shares are ratios of exact integers — engine-identical.
    */
  def temperatureShares(tokensBySource: DataFrame, alpha: Double,
                        budgetTokens: Long,
                        sourceCol: String = "source",
                        tokensCol: String = "total_tokens"): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"temperatureShares: alpha must be in (0, 1], got $alpha")
    val tot = tokensBySource.agg(sum(col(tokensCol)).as("_n"))
    val weighted = tokensBySource.crossJoin(broadcast(tot))
      .withColumn("w_u",
        round(pow(col(tokensCol).cast("double") / col("_n"), alpha) * 1e9)
          .cast("long"))
    val wsum = weighted.agg(sum("w_u").as("_ws"))
    weighted.crossJoin(broadcast(wsum))
      .select(col(sourceCol), col(tokensCol),
        round(col("w_u").cast("double") / col("_ws"), 6).as("share"),
        round(least(lit(1.0),
          lit(budgetTokens.toDouble)
            * (col("w_u").cast("double") / col("_ws"))
            / col(tokensCol).cast("double")), 6).as("rate"))
      .withColumn("expected_tokens",
        floor(col("rate") * col(tokensCol).cast("double") + 0.5).cast("long"))
  }

  /** Curriculum schedule: split the corpus into `nEpochs` equal-count
    * epochs ordered cleanest-first (quality desc, id tiebreak) — the
    * standard easy→hard curriculum, with per-epoch acceptance stats
    * (doc count, quality range, token payload) as the schedule's
    * report card.
    *
    * Scale: the epoch assignment routes through
    * [[graft.engine.Ranks.ntileExact]] — the only ordered window runs
    * over the bounded quality-VALUE dictionary (cumulative counts
    * broadcast back; ties ranked under a window PARTITIONED by the
    * value), bit-identical to `ntile(n) OVER (ORDER BY quality DESC,
    * id)` with no single-reducer row-scale sort.
    */
  def curriculumEpochs(docs: DataFrame, nEpochs: Int = 5,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val scored = docs.select(col(idCol),
      TextStats.qualityScore(col(textCol)).as("quality"),
      TextStats.tokenCount(col(textCol)).as("_toks"))
    graft.engine.Ranks
      .ntileExact(scored, nEpochs, "quality", idCol,
        valueDesc = true, out = "epoch")
      .groupBy("epoch").agg(
        count(lit(1)).as("n_docs"),
        min("quality").as("q_lo"), max("quality").as("q_hi"),
        sum("_toks").as("n_tokens"))
      .orderBy("epoch")
  }

  /** Universe (key-consistent) sampling: keep a row iff the md5 coin
    * of its KEY is below `rate`. Sampling two tables by the SAME
    * join-key coin preserves the join — every sampled child row's
    * parent is sampled too — which independent Bernoulli sampling
    * destroys (P(both sides) = rate²). This is the correct way to
    * downsample a fact/dimension star for dev runs and join-aware
    * estimation; map-only, no coordination between tables.
    */
  def universeSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate > 0 && rate <= 1, s"rate must be in (0,1], got $rate")
    val coin = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0)
    df.filter(coin < rate)
  }

  /** N-gram novelty of the held-out splits against train — the
    * eval-leakage readout for the [[hashSplit]] partition: what
    * fraction of each non-train split's DISTINCT word n-grams never
    * occurs in train? Low novelty means eval metrics are measuring
    * memorization of shared phrasing, not generalization (the
    * document-level twin is q88/q142 decontamination; this is the
    * finer phrase-level audit).
    *
    * Shape: shingling is map-side; the split label derives from the
    * doc-id hash coin alone (no join back to a split table); one
    * distinct per side and one left-anti join keyed by shingle. At
    * 100 TB put a bloom filter of train shingles in front of the
    * anti join (q80's pattern) — the exact join then touches only
    * probable-novel grams.
    */
  def ngramNovelty(docs: DataFrame, n: Int, splits: Seq[(String, Double)],
                   trainSplit: String = "train",
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val grams = hashSplit(
      Dedup.shingles(docs, n, idCol, textCol), splits, idCol)
      .select(col("split"), col("shingle")).distinct()
    val train = grams.filter(col("split") === trainSplit).select("shingle")
    val eval = grams.filter(col("split") =!= trainSplit)
    eval.join(train.withColumn("_seen", lit(1)), Seq("shingle"), "left")
      .groupBy("split")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_rate",
        round(col("n_novel").cast("double") / col("n_ngrams"), 6))
      .orderBy("split")
  }

  /** Order-independent dataset fingerprint manifest — verifiable
    * dataset versioning for a training corpus: every row contributes
    * a leaf hash (id + content), each of `shards` logical shards
    * reports (count, digest) where the digest is the BIT-XOR multiset
    * hash of its leaves, and shard −1 is the corpus root (xor of
    * shard digests = xor of all leaves). Any single-row change,
    * addition, or deletion flips the affected shard's digest AND the
    * root; comparing two manifests localizes the difference to a
    * shard without touching row data.
    *
    * XOR multiset hashing (vs an ordered Merkle chain) is what makes
    * this SCALE-NATIVE: the digest is a plain commutative aggregate —
    * one hash-aggregation pass, no ordered concatenation, no
    * per-shard array materialization — and insertion order, partition
    * count, and merge order cannot change it. Logical shards key on
    * `id mod shards` (engine-portable), not physical partitions.
    */
  def fingerprintManifest(docs: DataFrame, shards: Int = 16,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    require(shards >= 1, s"fingerprintManifest: shards >= 1, got $shards")
    val leaves = docs.select(
      pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        md5(col(textCol)))), 1, 15), 16, 10).cast("long").as("leaf"))
    val sh = leaves.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(leaf)").as("digest"))
    val root = sh.agg(sum("n_docs").cast("long").as("n_docs"),
        expr("bit_xor(digest)").as("digest"))
      .select(lit(-1L).as("shard"), col("n_docs"), col("digest"))
    sh.unionByName(root).orderBy("shard")
  }

  /** Padding-waste audit for length-bucketed batching. Training
    * batches pad every sequence to its bucket boundary, so the
    * bucketing scheme decides how many FLOP-carrying tokens are
    * padding: per scheme — next-power-of-two (clamped to
    * [minBucket, ∞)), fixed stride-64 ceil, and pad-to-global-max —
    * report docs, real tokens, padded tokens, and the waste fraction.
    * The audit is one map-only pass over per-doc token counts plus a
    * 3-row aggregate; the global max attaches via a broadcast 1-row
    * cross join. All bucket arithmetic is closed-form over doubles
    * whose inputs are small ints (log2/pow/ceil are IEEE-identical
    * cross-engine), so the oracle replays it bit-exactly.
    */
  def paddingWasteAudit(docs: DataFrame, minBucket: Int = 16,
                        textCol: String = "text"): DataFrame = {
    require(minBucket >= 1, s"paddingWasteAudit: minBucket >= 1, got $minBucket")
    val n = TextStats.tokenCount(col(textCol))
    val toks = docs.select(n.as("n_toks"))
    val mx = toks.agg(max("n_toks").cast("long").as("_max")).select("_max")
    val schemes = toks.crossJoin(broadcast(mx)).select(
      col("n_toks"),
      greatest(lit(minBucket.toLong),
        pow(lit(2.0), ceil(log2(col("n_toks").cast("double"))))
          .cast("long")).as("pow2"),
      (ceil(col("n_toks").cast("double") / lit(64.0)).cast("long") * 64L)
        .as("fixed64"),
      col("_max").as("global_max"))
    val long = schemes.select(col("n_toks"), explode(map(
      lit("pow2"), col("pow2"),
      lit("fixed64"), col("fixed64"),
      lit("global_max"), col("global_max"))).as(Seq("scheme", "bucket")))
    long.groupBy("scheme")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").cast("long").as("tokens_real"),
        sum("bucket").cast("long").as("tokens_padded"))
      .select(col("scheme"), col("n_docs"), col("tokens_real"),
        col("tokens_padded"),
        round((col("tokens_padded") - col("tokens_real")).cast("double") /
          col("tokens_padded").cast("double"), 6).as("waste_frac"))
      .orderBy("scheme")
  }

  /** Purged time-based train/test split audit (the leakage-safe
    * temporal split of de Prado's purged k-fold, reduced to one
    * boundary): the boundary T sits at `splitFrac` of the observed
    * time span, rows in the `embargoUs` window before T are PURGED
    * (dropped from train so near-boundary leakage can't ride on
    * autocorrelation), and the audit counts, per event type, the
    * train/test/purged rows plus the entities appearing on BOTH
    * sides — the residual leakage a time split cannot remove but
    * must REPORT. Span endpoints attach via a broadcast 1-row cross
    * join; everything else is one keyed aggregate.
    */
  def purgedTimeSplit(events: DataFrame, splitFrac: Double, embargoUs: Long,
                      tsCol: String = "ts", typeCol: String = "event_type",
                      entityCol: String = "user_id"): DataFrame = {
    require(splitFrac > 0.0 && splitFrac < 1.0,
      s"purgedTimeSplit: splitFrac in (0,1), got $splitFrac")
    require(embargoUs >= 0L, s"purgedTimeSplit: embargoUs >= 0, got $embargoUs")
    val us = unix_micros(col(tsCol))
    val span = events.agg(min(us).as("_lo"), max(us).as("_hi"))
    val labeled = events.select(col(typeCol).cast("string").as("etype"),
        col(entityCol).as("entity"), us.as("_us"))
      .crossJoin(broadcast(span))
      // floor, not a double→long cast: Spark's cast truncates while
      // DuckDB's rounds — floor is the one op both define identically
      .withColumn("_t", col("_lo") + floor((col("_hi") - col("_lo"))
        .cast("double") * lit(splitFrac)).cast("long"))
      .withColumn("split",
        when(col("_us") >= col("_t"), lit("test"))
          .when(col("_us") >= col("_t") - lit(embargoUs), lit("purged"))
          .otherwise(lit("train")))
    val counts = labeled.groupBy("etype").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "purged", 1L).otherwise(0L)).as("n_purged"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val leaky = labeled.filter(col("split") =!= "purged")
      .select(col("etype"), col("entity"), col("split")).distinct()
      .groupBy("etype", "entity")
      .agg(count(lit(1)).as("_sides"))
      .groupBy("etype")
      .agg(sum(when(col("_sides") === 2, 1L).otherwise(0L))
        .as("n_leaky_entities"),
        count(lit(1)).as("n_entities"))
    counts.join(leaky, Seq("etype"))
      .select(col("etype"), col("n_train"), col("n_purged"), col("n_test"),
        col("n_entities"), col("n_leaky_entities"),
        round(col("n_leaky_entities").cast("double") /
          col("n_entities").cast("double"), 6).as("leaky_frac"))
      .orderBy("etype")
  }

  /** Deterministic training-order shuffle + shard balance audit. A
    * 100 TB pre-training corpus is not shuffled with `ORDER BY
    * rand()` — a global sort is a full-corpus range exchange through
    * ONE total order, and rand() is unreproducible across retries.
    * The scale-native shuffle is a HASH order: `order_key =
    * md5(doc_id:seed)` gives every doc a stable pseudo-random
    * position, the key's 60-bit prefix mod nShards gives
    * size-balanced shard assignment, and the writer repartitions by
    * shard + sortWithinPartitions(order_key) — every shard writes in
    * parallel with no global exchange, and the same seed replays the
    * same epoch order byte-for-byte (epoch 2 = new seed).
    *
    * This is the dictionary-scale audit a pipeline materializes per
    * epoch: per shard — doc count, token sum, the shard's first/last
    * order keys (replay-determinism witnesses: re-running the epoch
    * must reproduce them exactly), token share, and skew vs uniform
    * (share × nShards; a healthy hash shuffle holds max skew ≈ 1).
    */
  def trainingShuffleShards(docs: DataFrame, nShards: Int, seed: String,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"trainingShuffleShards: nShards >= 1, got $nShards")
    val key = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val keyed = docs.select(
      pmod(conv(substring(key, 1, 15), 16, 10).cast("long"),
        lit(nShards.toLong)).as("shard"),
      key.as("order_key"),
      TextStats.tokenCount(col(textCol)).as("_n_toks"))
    val per = keyed.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("_n_toks").cast("long").as("n_tokens"),
      min("order_key").as("first_key"),
      max("order_key").as("last_key"))
    val tot = per.agg(sum("n_tokens").cast("long").as("_total"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("first_key"), col("last_key"),
        round(col("n_tokens").cast("double") / col("_total").cast("double"),
          6).as("token_share"),
        round(col("n_tokens").cast("double") * nShards /
          col("_total").cast("double"), 6).as("skew"))
      .orderBy("shard")
  }

  /** Manifest diff — the read side of [[fingerprintManifest]]: given
    * two manifests (two corpus versions / two replicas of a copy
    * job), report per shard whether content or count diverged. The
    * whole comparison touches 2·(shards+1) rows — dataset equality
    * and change LOCALIZATION without reading any row data, which is
    * the point of shipping the manifest with the dataset.
    */
  def manifestDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("shard"), col("n_docs").as("n_docs_a"),
        col("digest").as("digest_a"))
      .join(b.select(col("shard"), col("n_docs").as("n_docs_b"),
        col("digest").as("digest_b")), Seq("shard"), "full_outer")
      .select(col("shard"), col("n_docs_a"), col("n_docs_b"),
        col("digest_a"), col("digest_b"),
        (!(col("n_docs_a") <=> col("n_docs_b")) ||
          !(col("digest_a") <=> col("digest_b"))).as("changed"))
      .orderBy("shard")

  /** Deterministic per-domain frequency cap (the C4/Dolma "at most N
    * pages per domain" policy) as an audit: within each domain keep
    * the first `cap` docs by md5(id:seed) order — RNG-free, so the
    * kept set is a pure function of (corpus, seed) and identical
    * across retries and partitionings — and report per domain how
    * many docs/tokens the cap keeps vs drops. Scale shape: one
    * domain-keyed shuffle; the rank is a PARTITIONED window over
    * per-domain frames (never a global sort), and the audit output
    * is domain-dictionary-sized. A giant domain makes a wide frame,
    * but that frame is exactly the data the policy must order; the
    * cap itself then bounds everything downstream.
    */
  def domainFrequencyCap(docs: DataFrame, cap: Int, seed: String,
                         domainCol: String = "source",
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(cap >= 1, s"domainFrequencyCap: cap >= 1, got $cap")
    val ranked = docs.select(col(domainCol).as("domain"), col(idCol),
        TextStats.tokenCount(col(textCol)).as("_n_toks"),
        md5(concat(col(idCol).cast("string"), lit(":" + seed))).as("_k"))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain")
          .orderBy(col("_k"), col(idCol))))
    ranked.groupBy("domain").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_rn") <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_rn") > cap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("_rn") <= cap, col("_n_toks")).otherwise(0L))
          .cast("long").as("tokens_kept"),
        sum(when(col("_rn") > cap, col("_n_toks")).otherwise(0L))
          .cast("long").as("tokens_dropped"))
      .select(col("domain"), col("n_docs"), col("n_kept"),
        col("n_dropped"), col("tokens_kept"), col("tokens_dropped"),
        round(col("n_kept").cast("double") / col("n_docs").cast("double"),
          6).as("retention"))
      .orderBy("domain")
  }

  /** Iterative proportional fitting (IPF / raking, Deming & Stephan
    * 1940) of the (row × col) doc-count table to UNIFORM target
    * marginals over the observed labels — the classic survey-weighting
    * move applied to corpus mixture rebalancing: "reweight my corpus
    * so every language AND every source carries equal mass, moving
    * each cell as little as possible". Each iteration scales rows to
    * their target mass, then columns to theirs; the result converges
    * to the max-entropy table with those marginals (zero cells stay
    * zero — IPF cannot invent mass where none was observed, and a
    * label missing entirely from the data is simply not a target).
    *
    * Output per cell: observed `n_docs`, the raked weight
    * `raked_docs` (same total mass as the input), and the per-doc
    * sampling `rate` = raked/observed a downstream sampler consumes.
    *
    * Engine-exactness: cell weights live on an integer micro-grid
    * (1e-6 docs) and every scaling step is floor(w·T/S + 0.5) with
    * the double arithmetic in the same operand order as the oracle —
    * marginal sums are exact BIGINT sums, so the fixed-iteration
    * trajectory is bit-identical across engines.
    *
    * Scale shape: ONE data-scale shuffle (the groupBy(row, col)
    * rollup); everything after operates on the cell table, which is
    * |rows|·|cols| — a deployment constant (languages × sources).
    * Each iteration is two dictionary-sized aggregates + broadcast
    * joins; `iterations` is a small fixed constant, so plan depth is
    * bounded and needs no lineage cuts.
    */
  def ipfRake(docs: DataFrame, rowCol: String, colCol: String,
              iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"ipfRake: iterations >= 1, got $iterations")
    val cells = docs.groupBy(rowCol, colCol).agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum("n").as("_tot"),
      countDistinct(col(rowCol)).as("_nr"),
      countDistinct(col(colCol)).as("_nc"))
    // targets in micro-units: uniform share of the total mass per
    // observed row / col label (floor(x + 0.5): engine-stable half-up)
    var w = cells.crossJoin(broadcast(tot))
      .withColumn("_t_row", floor(col("_tot").cast("double") * 1000000.0 /
        col("_nr").cast("double") + 0.5).cast("long"))
      .withColumn("_t_col", floor(col("_tot").cast("double") * 1000000.0 /
        col("_nc").cast("double") + 0.5).cast("long"))
      .withColumn("w", col("n") * lit(1000000L))
      .select(col(rowCol), col(colCol), col("n"), col("w"),
        col("_t_row"), col("_t_col"))
    // ledger-checkpoint the cell table once (it feeds every
    // iteration), then cut lineage per iteration: each scaling step
    // references the running frame TWICE (marginal aggregate + join),
    // so an uncut loop doubles the plan per half-step — the
    // exponential-replay class the graph loops already guard against.
    // The frame is dictionary-sized, so each cut is a trivial job.
    w = w.trackedLocalCheckpoint()
    for (_ <- 1 to iterations) {
      val rs = w.groupBy(rowCol).agg(sum("w").as("_s"))
      w = w.join(broadcast(rs), Seq(rowCol))
        .withColumn("w", floor(col("w").cast("double") * col("_t_row") /
          col("_s") + 0.5).cast("long"))
        .drop("_s")
      val cs = w.groupBy(colCol).agg(sum("w").as("_s"))
      w = w.join(broadcast(cs), Seq(colCol))
        .withColumn("w", floor(col("w").cast("double") * col("_t_col") /
          col("_s") + 0.5).cast("long"))
        .drop("_s")
        .trackedLocalCheckpoint()
    }
    w.select(col(rowCol), col(colCol), col("n").as("n_docs"),
      round(col("w").cast("double") / 1000000.0, 6).as("raked_docs"),
      round(col("w").cast("double") /
        (col("n").cast("double") * 1000000.0), 6).as("rate"))
      .orderBy(rowCol, colCol)
  }
}
