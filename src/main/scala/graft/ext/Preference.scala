package graft.ext

import graft.engine.TrackedCache.Trackable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-data QA for RLHF / reward-model corpora.
  *
  * A preference dataset is a set of prompts, each with a small roster
  * of candidate responses and pairwise human votes ("A beats B").
  * Before a reward model ever sees it, two defects need auditing:
  *
  *  - **Intransitivity**: A>B, B>C, C>A inside one prompt — noise or
  *    annotator disagreement that a Bradley–Terry fit will silently
  *    average away. Counted here exactly, as directed 3-cycles in the
  *    per-prompt preference digraph.
  *  - **Degenerate rosters**: prompts with fewer than two responses
  *    produce no training signal at all.
  *
  * Scale shape: every join is an equi-join on the prompt id, and the
  * per-prompt roster is bounded by construction (a prompt has k
  * responses, k small — 4..16 in practice), so the pair fan-out is
  * ≤ k(k−1)/2 per prompt and the cycle join ≤ k³ per prompt — all
  * linear in the number of prompts, shuffle keyed on the prompt id.
  * No global windows: the Copeland winner per prompt comes from a
  * bounded per-prompt aggregation.
  *
  * No analogue in the reference (bcgov/lmo_data_catalog) — this is
  * part of the training-data extension surface.
  */
object Preference {

  /** Deterministic synthetic vote: the longer response wins (a crude
    * but monotone quality proxy), flipped with probability
    * 1/`noiseMod` by an engine-portable md5 coin over the ordered
    * pair — the same construction a DuckDB oracle replays verbatim.
    * `noiseMod = 0` disables flips (a perfectly transitive corpus).
    */
  private def flipCoin(a: Column, b: Column, seed: String, noiseMod: Int): Column =
    if (noiseMod == 0) lit(false)
    else conv(substring(md5(concat(a.cast("string"), lit(":"),
      b.cast("string"), lit(":" + seed))), 1, 7), 16, 10)
      .cast("long") % noiseMod === 0

  /** Pairwise votes within each prompt roster: one row per unordered
    * response pair (a < b by id), with `winner`/`loser` decided by
    * the quality column (ties broken toward the smaller id) and then
    * possibly flipped by the noise coin. Input: one row per response
    * with (promptCol, idCol, qualityCol).
    */
  def pairwiseVotes(responses: DataFrame, promptCol: String, idCol: String,
                    qualityCol: String, seed: String,
                    noiseMod: Int = 5): DataFrame = {
    val a = responses.select(col(promptCol).as("prompt_id"),
      col(idCol).as("id_a"), col(qualityCol).as("_qa"))
    val b = responses.select(col(promptCol).as("prompt_id"),
      col(idCol).as("id_b"), col(qualityCol).as("_qb"))
    val pairs = a.join(b, Seq("prompt_id")).filter(col("id_a") < col("id_b"))
    val aWinsBase = (col("_qa") > col("_qb")) ||
      (col("_qa") === col("_qb")) // tie → smaller id (= id_a) wins
    val flip = flipCoin(col("id_a"), col("id_b"), seed, noiseMod)
    val aWins = when(flip, !aWinsBase).otherwise(aWinsBase)
    pairs.select(col("prompt_id"),
      when(aWins, col("id_a")).otherwise(col("id_b")).as("winner"),
      when(aWins, col("id_b")).otherwise(col("id_a")).as("loser"))
  }

  /** Per-prompt Bradley–Terry strength fit over a (prompt_id, winner,
    * loser) vote table — the model a reward-model pipeline actually
    * trains on preference data, here fit exactly by the MM iteration
    * of Hunter, "MM algorithms for generalized Bradley-Terry models"
    * (Annals of Statistics 32(1), 2004): with strengths π,
    * P(i beats j) = π_i/(π_i+π_j) and the update
    * π_i ← W_i / Σ_j n_ij/(π_i+π_j).
    *
    * Engine-exactness (the q331 IPF discipline): strengths live as
    * 1e-6-quantized BIGINT micro-units; every per-pair term is
    * rounded to an integer BEFORE the per-node sum, so each
    * iteration's sums are integer additions — order-independent,
    * replayable bit-exactly by the unrolled DuckDB oracle. One
    * uniform pseudo-comparison per roster pair (λ=1 smoothing, split
    * evenly) keeps every numerator/denominator ≥ 1 — zero-win
    * responses get finite strengths and never-voted pairs still
    * couple the prompt's comparison graph. In doubled-count units
    * that is `m_ij = 2·n_ij + 2` comparisons and
    * `A_i = 2·W_i + (k−1)` wins (both integers even when k is even).
    * After each update, strengths renormalize to Σπ = k per prompt.
    *
    * Output: one row per response — (prompt_id, rid, wins, n_games,
    * strength, rank), strength normalized to mean 1 within the
    * prompt, rank by strength (ties toward the smaller rid).
    *
    * Scale shape: the pair table is the bounded k(k−1)/2-per-prompt
    * roster self-join; each of the `iterations` rounds is two
    * prompt-keyed equi-joins + one integer hash aggregate, every
    * frame roster- or pair-sized, ledger-CHECKPOINTED per round: the
    * strength frame is referenced twice per iteration (π_i and π_j
    * lookups), so an uncut loop doubles the logical plan per round
    * and canonicalization alone goes exponential — a persist caches
    * the data but not the plan (the q311/q331 exponential-replay
    * guard, here demanded by measurement: the uncut 5-round loop
    * spun >10 min in doCanonicalize at sf0.01). The only window is
    * the final per-prompt rank over bounded rosters.
    */
  def bradleyTerry(responses: DataFrame, votes0: DataFrame,
                   promptCol: String, idCol: String,
                   iterations: Int = 5,
                   micro: Long = 1000000L): DataFrame = {
    require(iterations >= 1,
      s"bradleyTerry: iterations >= 1, got $iterations")
    val roster = responses.select(col(promptCol).as("prompt_id"),
      col(idCol).as("rid"))
    // Votes whose winner OR loser is missing from the roster must not
    // count: winCnt/gameCnt/A_i are vote-derived but the smoothed pair
    // table is roster-derived, so an out-of-roster vote would inflate
    // the MM numerator while its game never enters the denominator —
    // overstating the in-roster side's strength. Two prompt-keyed
    // semi-joins validate the ledger before anything is counted.
    val votes = votes0
      .join(roster.select(col("prompt_id"), col("rid").as("winner")),
        Seq("prompt_id", "winner"), "left_semi")
      .join(roster.select(col("prompt_id"), col("rid").as("loser")),
        Seq("prompt_id", "loser"), "left_semi")
      .trackedPersist()
    val kTab = roster.groupBy("prompt_id").agg(count(lit(1)).as("_k"))
    // real vote counts per unordered pair, then λ=1 smoothing over
    // EVERY roster pair (voted or not) in doubled units
    val votedPairs = votes.select(col("prompt_id"),
        least(col("winner"), col("loser")).as("i"),
        greatest(col("winner"), col("loser")).as("j"))
      .groupBy("prompt_id", "i", "j").agg(count(lit(1)).as("_nv"))
    val pairs = roster.select(col("prompt_id"), col("rid").as("i"))
      .join(roster.select(col("prompt_id"), col("rid").as("j")),
        Seq("prompt_id"))
      .filter(col("i") < col("j"))
      .join(votedPairs, Seq("prompt_id", "i", "j"), "left")
      .select(col("prompt_id"), col("i"), col("j"),
        (coalesce(col("_nv"), lit(0L)) * 2 + 2).as("m"))
      .trackedLocalCheckpoint()
    val winCnt = votes.groupBy("prompt_id", "winner")
      .agg(count(lit(1)).as("_w")).withColumnRenamed("winner", "rid")
    val gameCnt = votes.select(col("prompt_id"), col("winner").as("rid"))
      .unionByName(votes.select(col("prompt_id"), col("loser").as("rid")))
      .groupBy("prompt_id", "rid").agg(count(lit(1)).as("_g"))
    val stats = roster
      .join(kTab, Seq("prompt_id"))
      .join(winCnt, Seq("prompt_id", "rid"), "left")
      .join(gameCnt, Seq("prompt_id", "rid"), "left")
      .select(col("prompt_id"), col("rid"), col("_k"),
        coalesce(col("_w"), lit(0L)).as("wins"),
        coalesce(col("_g"), lit(0L)).as("n_games"),
        (coalesce(col("_w"), lit(0L)) * 2 + col("_k") - 1).as("_a"))
      .trackedLocalCheckpoint()
    var pi = stats.select(col("prompt_id"), col("rid"),
      lit(micro).as("_p"))
    // checkpoint EVERY round. r18 tried every-2nd-round batching
    // (halve the eager actions; one lazy round bounds the plan growth)
    // and REVERTED it on measurement: the unchecked round's frames are
    // referenced twice by the next round's _pi/_pj joins, so its whole
    // ~7-stage chain executes TWICE inside the following checkpoint —
    // costlier than the one action saved (q338 3.0 → 5.6 s, q342
    // 3.8 → 6.5 s min-of-2 in-battery, reproduced across two runs).
    for (it <- 1 to iterations) {
      val terms = pairs
        .join(pi.select(col("prompt_id"), col("rid").as("i"),
          col("_p").as("_pi")), Seq("prompt_id", "i"))
        .join(pi.select(col("prompt_id"), col("rid").as("j"),
          col("_p").as("_pj")), Seq("prompt_id", "j"))
        .withColumn("_t",
          round(lit(1e12) * col("m") / (col("_pi") + col("_pj")))
            .cast("long"))
      val denom = terms.select(col("prompt_id"), col("i").as("rid"), col("_t"))
        .unionByName(terms.select(col("prompt_id"), col("j").as("rid"),
          col("_t")))
        .groupBy("prompt_id", "rid").agg(sum("_t").as("_d"))
      val raw = stats.join(denom, Seq("prompt_id", "rid"), "left")
        .withColumn("_praw", coalesce(
          round(col("_a").cast("double") * 1e12 / col("_d")).cast("long"),
          lit(micro)))
      val tot = raw.groupBy("prompt_id").agg(sum("_praw").as("_s"))
      pi = raw.join(tot, Seq("prompt_id"))
        .select(col("prompt_id"), col("rid"),
          round(col("_praw").cast("double") * col("_k") * micro
            / col("_s")).cast("long").as("_p"))
        .trackedLocalCheckpoint()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("prompt_id").orderBy(col("_p").desc, col("rid"))
    stats.join(pi, Seq("prompt_id", "rid"))
      .select(col("prompt_id"), col("rid"), col("wins"), col("n_games"),
        round(col("_p").cast("double") / micro, 6).as("strength"),
        // "bt_rank", not "rank": the name doubles as the oracle's
        // output alias, where RANK is a reserved window keyword
        row_number().over(w).cast("long").as("bt_rank"))
      .orderBy("prompt_id", "rid")
  }

  /** DPO-style training-pair construction from a fitted
    * [[bradleyTerry]] frame (Rafailov et al. 2023 consume exactly
    * this shape: one (chosen, rejected) response pair per prompt):
    * per prompt, chosen = the rank-1 response, rejected = the
    * bottom-ranked one (both tie-broken toward the smaller rid by
    * bt_rank's own ordering), kept only when the roster has ≥ 2
    * responses and the strength margin clears `minMargin` — the
    * standard guard against training on pairs the preference data
    * cannot actually order.
    *
    * Engine-exactness: the margin is compared in integer micro-units
    * recovered from the 6-decimal strengths (round(s·10⁶) is exact —
    * strengths ARE micro-grid values), so the threshold can never
    * flip on a float ulp.
    *
    * Scale shape: one prompt-keyed min/max-struct aggregate over the
    * fitted frame — no windows, no joins beyond what the fit itself
    * did; output is one row per surviving prompt.
    */
  def dpoPairs(fitted: DataFrame, minMargin: Double = 0.25): DataFrame = {
    require(minMargin >= 0, s"dpoPairs: minMargin >= 0, got $minMargin")
    val micro = round(col("strength") * 1e6).cast("long")
    fitted
      .select(col("prompt_id"), col("rid"), col("wins"), col("bt_rank"),
        micro.as("_p"))
      .groupBy("prompt_id")
      .agg(count(lit(1)).as("_k"),
        min(struct(col("bt_rank"), col("rid"), col("wins"), col("_p")))
          .as("_ch"),
        max(struct(col("bt_rank"), col("rid"), col("wins"), col("_p")))
          .as("_rj"))
      .filter(col("_k") >= 2L &&
        col("_ch._p") - col("_rj._p") >= math.round(minMargin * 1e6))
      .select(col("prompt_id"),
        col("_ch.rid").as("chosen_id"), col("_rj.rid").as("rejected_id"),
        col("_ch.wins").as("chosen_wins"), col("_rj.wins").as("rejected_wins"),
        round((col("_ch._p") - col("_rj._p")).cast("double") / 1e6, 6)
          .as("margin"))
      .orderBy("prompt_id")
  }

  /** Covariate-bias audit of a (prompt_id, winner, loser) vote table
    * — THE reward-hacking diagnostic for preference data (length bias
    * being the canonical instance: reward models trained on votes
    * where the longer response usually wins learn to reward length
    * itself). For every vote, look up both sides' covariate (e.g.
    * response length), bucket the absolute gap (`gap div bucketWidth`,
    * capped at `maxBucket`), and report per bucket how often the
    * HIGHER-covariate side won. A flat ~0.5 curve means the covariate
    * is preference-neutral; a curve rising with the gap quantifies
    * the bias a fit would absorb. Equal-covariate votes are excluded
    * ("higher side" is undefined there).
    *
    * Scale shape: two (prompt, id)-keyed equi-joins to attach the
    * covariates + one bucket-keyed aggregate; no windows.
    */
  def voteCovariateBias(responses: DataFrame, votes: DataFrame,
                        promptCol: String, idCol: String, covCol: String,
                        bucketWidth: Long = 100L,
                        maxBucket: Long = 10L): DataFrame = {
    require(bucketWidth >= 1 && maxBucket >= 0,
      s"voteCovariateBias: bucketWidth >= 1, maxBucket >= 0")
    val cov = responses.select(col(promptCol).as("prompt_id"),
      col(idCol).as("rid"), col(covCol).cast("long").as("_cv"))
    val joined = votes
      .join(cov.select(col("prompt_id"), col("rid").as("winner"),
        col("_cv").as("_cw")), Seq("prompt_id", "winner"))
      .join(cov.select(col("prompt_id"), col("rid").as("loser"),
        col("_cv").as("_cl")), Seq("prompt_id", "loser"))
      .filter(col("_cw") =!= col("_cl"))
    joined
      .select(least(expr(s"abs(_cw - _cl) div $bucketWidth"),
          lit(maxBucket)).as("gap_bucket"),
        (col("_cw") > col("_cl")).cast("long").as("_hw"))
      .groupBy("gap_bucket")
      .agg(count(lit(1)).as("n_votes"), sum("_hw").as("higher_wins"))
      .select(col("gap_bucket"), col("n_votes"), col("higher_wins"),
        round(col("higher_wins").cast("double") / col("n_votes"), 6)
          .as("higher_win_rate"))
      .orderBy("gap_bucket")
  }

  /** One Elo update's transfer, in rating micro-units: the winner
    * gains d = round(K · E[loser]) where the expected score is the
    * RATIONAL Bradley–Terry form E[loser] = r_l/(r_w + r_l) — the
    * online stochastic-gradient update of the Hunter-2004 BT model
    * with the rating itself as the strength. The classic Elo-1978
    * logistic 1/(1+10^((r_w−r_l)/400)) is deliberately NOT used on
    * the data path: pow() is transcendental and cross-engine
    * bit-divergence in the last ulp would compound over a sequential
    * fold (the ndcgWeights/rboWeights no-cross-engine-log
    * discipline); the rational form is one double division + one
    * multiply + one round, bit-identical in any IEEE engine. Computed
    * ONCE per battle and applied ± symmetrically, so the update is
    * exactly zero-sum before the floor.
    */
  private[ext] def eloDelta(rw: Long, rl: Long, kMicro: Long): Long =
    math.round(kMicro.toDouble * (rl.toDouble / (rw + rl).toDouble))

  /** SEQUENTIAL Elo/arena rating fold over a battle ledger — the
    * batch twin of [[graft.ext.Streaming.eloRatingStream]] and the
    * oracle-checked semantics both must land on. Elo is
    * order-SENSITIVE by definition (each update depends on the
    * ratings as of that battle), so unlike every aggregate in this
    * engine the fold demands a total order: battles fold in
    * (league, seq) order, seq unique per league (ties would make the
    * result nondeterministic — (winner, loser) breaks them
    * defensively). Ratings start at `startMicro`, move by
    * [[eloDelta]], and the loser is floored at `floorMicro` (the
    * USCF rating-floor practice; without it a cold roster member can
    * be driven toward 0 where the rational expected score
    * degenerates).
    *
    * Output: one row per (league, participant) — wins, n_games,
    * rating (micro-units rounded back to 6 decimals).
    *
    * Scale shape: the ONLY distributed primitive is
    * repartition(league) + sortWithinPartitions(league, seq) + one
    * mapPartitions fold — the standard sessionizer shape: leagues
    * are hash-co-located and contiguous, state is one small
    * (player → rating, wins, games) map per league, work is linear
    * in battles with no window and no driver collect. The sequential
    * dependency is per-league, so leagues parallelize perfectly;
    * a single league's history is inherently sequential — that is
    * Elo's semantics, not a plan defect.
    */
  def eloFold(battles: DataFrame, leagueCol: String = "league",
              seqCol: String = "seq", winnerCol: String = "winner",
              loserCol: String = "loser",
              kMicro: Long = 32000000L,
              startMicro: Long = 1500000000L,
              floorMicro: Long = 100000000L): DataFrame = {
    require(kMicro > 0 && startMicro > floorMicro && floorMicro > 0,
      "eloFold: kMicro > 0 and startMicro > floorMicro > 0")
    val spark = battles.sparkSession
    import spark.implicits._
    val sorted = battles.select(
        col(leagueCol).cast("long").as("_lg"),
        col(seqCol).cast("long").as("_seq"),
        col(winnerCol).cast("long").as("_w"),
        col(loserCol).cast("long").as("_l"))
      .repartition(col("_lg"))
      .sortWithinPartitions("_lg", "_seq", "_w", "_l")
      .as[(Long, Long, Long, Long)]
    val folded = sorted.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      var curLeague = 0L
      var open = false
      var st = scala.collection.mutable.LinkedHashMap
        .empty[Long, Array[Long]] // player -> (rating, wins, games)
      def flush(): Unit = if (open) {
        st.foreach { case (p, a) =>
          out += ((curLeague, p, a(1), a(2), a(0)))
        }
        st = scala.collection.mutable.LinkedHashMap.empty
      }
      while (it.hasNext) {
        val (lg, _, w, l) = it.next()
        if (!open || lg != curLeague) { flush(); curLeague = lg; open = true }
        val aw = st.getOrElseUpdate(w, Array(startMicro, 0L, 0L))
        val al = st.getOrElseUpdate(l, Array(startMicro, 0L, 0L))
        val d = eloDelta(aw(0), al(0), kMicro)
        aw(0) += d
        al(0) = math.max(al(0) - d, floorMicro)
        aw(1) += 1; aw(2) += 1; al(2) += 1
      }
      flush()
      out.iterator
    }
    folded.toDF("league", "model_id", "wins", "n_games", "_rm")
      .select(col("league"), col("model_id"), col("wins"), col("n_games"),
        round(col("_rm").cast("double") / 1e6, 6).as("rating"))
      .orderBy("league", "model_id")
  }

  /** Per-prompt audit of a (prompt_id, winner, loser) vote table:
    *
    *  - `n_resp` / `n_pairs` — roster and vote sizes;
    *  - `n_cycles` — exact directed-3-cycle count (each cycle
    *    produces three rotations in the join, divided back out);
    *  - `consistency` — 1 − cycles / C(n_resp, 3), NULL when fewer
    *    than 3 responses (no triads to violate);
    *  - `best_id` / `best_wins` — the Copeland winner (most pairwise
    *    wins, ties toward the smaller id).
    *
    * `responses` supplies the roster (so 0- and 1-response prompts
    * surface instead of vanishing from the vote table).
    */
  def audit(responses: DataFrame, votes0: DataFrame, promptCol: String,
            idCol: String): DataFrame = {
    // the vote table feeds five consumers (pair counts, three cycle
    // rotations, win counts) — materialize once on the ledger
    val votes = votes0.trackedPersist()
    val roster = responses.select(col(promptCol).as("prompt_id"),
      col(idCol).as("rid"))
    val nResp = roster.groupBy("prompt_id")
      .agg(count(lit(1)).as("n_resp"))
    val nPairs = votes.groupBy("prompt_id").agg(count(lit(1)).as("n_pairs"))

    // 3-cycles: w→l edges; x→y→z→x found once per rotation (3×)
    val e1 = votes.select(col("prompt_id"), col("winner").as("x"), col("loser").as("y"))
    val e2 = votes.select(col("prompt_id"), col("winner").as("y"), col("loser").as("z"))
    val e3 = votes.select(col("prompt_id"), col("winner").as("z"), col("loser").as("x2"))
    val cycles = e1.join(e2, Seq("prompt_id", "y"))
      .join(e3, Seq("prompt_id", "z"))
      .filter(col("x2") === col("x"))
      .groupBy("prompt_id").agg((count(lit(1)) / 3).cast("long").as("n_cycles"))

    // Copeland winner: per-prompt max wins, ties toward the smaller id.
    // Wins are counted over the roster (zero-win responses included)
    // so a prompt whose votes all flipped still names a best response.
    val wins = roster.join(
        votes.groupBy("prompt_id", "winner").agg(count(lit(1)).as("w"))
          .withColumnRenamed("winner", "rid"),
        Seq("prompt_id", "rid"), "left")
      .select(col("prompt_id"), col("rid"), coalesce(col("w"), lit(0L)).as("w"))
    val best = wins.groupBy("prompt_id").agg(
      min(struct((lit(Long.MaxValue) - col("w")).as("nw"), col("rid").as("rid")))
        .as("_b"))
      .select(col("prompt_id"), col("_b.rid").as("best_id"),
        (lit(Long.MaxValue) - col("_b.nw")).as("best_wins"))

    val triads = (col("n_resp") * (col("n_resp") - 1) * (col("n_resp") - 2) / 6)
      .cast("long")
    nResp.join(nPairs, Seq("prompt_id"), "left")
      .join(cycles, Seq("prompt_id"), "left")
      .join(best, Seq("prompt_id"), "left")
      .select(col("prompt_id"),
        col("n_resp"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_cycles"), lit(0L)).as("n_cycles"),
        when(triads > 0,
          round(lit(1.0) - coalesce(col("n_cycles"), lit(0L)).cast("double") /
            triads.cast("double"), 6)).as("consistency"),
        col("best_id"), col("best_wins"))
      .orderBy("prompt_id")
  }

  /** Wilson score interval leaderboard over a battle ledger — the
    * uncertainty-aware win-rate table every public arena publishes
    * next to its point estimates (Wilson 1927; the interval every
    * "lower bound of CI" ranking uses, e.g. Reddit's best-comment
    * sort per Miller 2009). Per participant with w wins in n games,
    * p̂ = w/n and
    *
    *   lo, hi = (p̂ + z²/2n ∓ z·sqrt(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
    *
    * `pess_rank` orders by the LOWER bound (pessimistic ranking): a
    * 3-0 newcomer ranks below a 70-30 veteran, which the raw win
    * rate gets backwards.
    *
    * Engine exactness: z enters as z² (default 3.8416 = 1.96², the
    * 95% normal quantile) so the only non-arithmetic op is sqrt —
    * IEEE-754 requires sqrt correctly rounded, so the whole
    * expression is bit-identical cross-engine when mirrored
    * operation-for-operation (the no-transcendentals discipline:
    * exp/ln/pow are NOT correctly rounded; sqrt is).
    *
    * Scale shape: two vote-keyed count aggregates + one full outer
    * join on the participant id; `pess_rank` comes from
    * [[graft.engine.Ranks.rowNumberExact]] (dictionary-cumulative +
    * value-partitioned tie window) — no partition-less row-scale
    * window even if the roster ever stopped being small.
    */
  def wilsonLeaderboard(votes: DataFrame, winnerCol: String = "winner",
                        loserCol: String = "loser",
                        z2: Double = 3.8416): DataFrame = {
    require(z2 > 0, s"wilsonLeaderboard: z2 must be > 0, got $z2")
    // a NULL participant is not a model: it would otherwise survive
    // both count aggregates as a null-keyed row and (null-safe full
    // join) split into TWO phantom leaderboard rows — the bonCurve
    // NULL lesson
    val v = votes.filter(col(winnerCol).isNotNull &&
      col(loserCol).isNotNull)
    val w = v.groupBy(col(winnerCol).as("model_id"))
      .agg(count(lit(1)).as("_w"))
    val l = v.groupBy(col(loserCol).as("model_id"))
      .agg(count(lit(1)).as("_l"))
    val counts = w.join(l, Seq("model_id"), "full")
      .select(col("model_id"),
        coalesce(col("_w"), lit(0L)).as("wins"),
        (coalesce(col("_w"), lit(0L)) + coalesce(col("_l"), lit(0L)))
          .as("n_games"))
    val n = col("n_games").cast("double")
    val phat = col("wins").cast("double") / n
    val z2l = lit(z2)
    val center = phat + z2l / (lit(2.0) * n)
    val half = sqrt(z2l) *
      sqrt(phat * (lit(1.0) - phat) / n + z2l / (lit(4.0) * n * n))
    val denom = lit(1.0) + z2l / n
    val scored = counts.select(col("model_id"), col("wins"),
      col("n_games"),
      round(phat, 6).as("win_rate"),
      round((center - half) / denom, 6).as("wilson_lo"),
      round((center + half) / denom, 6).as("wilson_hi"))
    graft.engine.Ranks.rowNumberExact(scored, "wilson_lo", "model_id",
        valueDesc = true, out = "pess_rank", withTotal = false)
      .orderBy("model_id")
  }

  /** Length-debiased win rate by covariate stratification — the
    * adjusted LEADERBOARD that [[voteCovariateBias]]'s audit calls
    * for (the stratified-standardization cousin of AlpacaEval 2.0's
    * length-controlled win rate, Dubois et al. 2024, without the
    * logistic GLM: direct standardization keeps every number
    * rational, where a sigmoid fit would put exp() — not correctly
    * rounded cross-engine — into the oracle path): each battle is
    * read from BOTH participants' perspectives; battles stratify by
    * the clamped length-difference bucket
    * floor((len_self − len_opponent)/`bucketWidth`) ∈ [−`maxAbsBucket`,
    * `maxAbsBucket`]; the adjusted rate is the EQUAL-WEIGHT mean of
    * the per-stratum win rates over the model's OBSERVED strata
    * (absent strata are absent, not imputed — documented, the
    * standard small-sample caveat of direct standardization).
    * A verbosity-biased judge inflates raw win rates of long models;
    * within a stratum the length edge is constant, so the stratified
    * mean removes exactly the between-stratum (length) component.
    *
    * Per-stratum rates are 1e-9-quantized BIGINTs before the
    * cross-stratum mean (integer sums shuffle-order-free — the chrF
    * discipline); the mean is ONE mirrored double division pair.
    *
    * Scale shape: one union to participant grain, one (model,
    * bucket) count aggregate, one model rollup. Strata are a bounded
    * dictionary (2·maxAbsBucket+1); no windows, no joins beyond the
    * final model-keyed merge of raw and adjusted.
    */
  def stratifiedWinRate(votes: DataFrame, winnerCol: String = "winner",
                        loserCol: String = "loser",
                        winnerLenCol: String = "winner_len",
                        loserLenCol: String = "loser_len",
                        bucketWidth: Long = 10L,
                        maxAbsBucket: Long = 2L): DataFrame = {
    require(bucketWidth > 0 && maxAbsBucket >= 0,
      s"stratifiedWinRate: need bucketWidth > 0, maxAbsBucket >= 0")
    def bucket(d: Column): Column =
      greatest(least(floor(d.cast("double") / bucketWidth).cast("long"),
        lit(maxAbsBucket)), lit(-maxAbsBucket))
    // NULL participants/lengths carry no assignable stratum — filter,
    // don't let them form null-keyed phantom rows (the bonCurve rule)
    val v = votes.filter(col(winnerCol).isNotNull &&
      col(loserCol).isNotNull && col(winnerLenCol).isNotNull &&
      col(loserLenCol).isNotNull)
    val asWinner = v.select(col(winnerCol).as("model_id"),
      bucket(col(winnerLenCol) - col(loserLenCol)).as("b"),
      lit(1L).as("w"))
    val asLoser = v.select(col(loserCol).as("model_id"),
      bucket(col(loserLenCol) - col(winnerLenCol)).as("b"),
      lit(0L).as("w"))
    val strata = asWinner.unionByName(asLoser)
      .groupBy("model_id", "b")
      .agg(sum(col("w")).as("_sw"), count(lit(1)).as("_sn"))
      .select(col("model_id"), col("_sw"), col("_sn"),
        round(lit(1e9) * col("_sw") / col("_sn")).cast("long").as("_q"))
    strata.groupBy("model_id")
      .agg(sum(col("_sw")).as("wins"), sum(col("_sn")).as("n_games"),
        count(lit(1)).as("n_strata"), sum(col("_q")).as("_qs"))
      .select(col("model_id"), col("wins"), col("n_games"),
        round(col("wins").cast("double") / col("n_games"), 6)
          .as("win_rate"),
        col("n_strata"),
        round(col("_qs").cast("double") / col("n_strata") / 1e9, 6)
          .as("adj_win_rate"))
      .orderBy("model_id")
  }
}
