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
}
