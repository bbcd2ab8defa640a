package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text classifier over hashed bag-of-words features — the
  * fastText-shaped quality/domain filter every large corpus pipeline
  * runs (CCNet trains one against wiki; quality-filter distillation
  * trains one against an expensive teacher heuristic or LLM labels,
  * then scores the whole corpus with the cheap student).
  *
  * Features are BINARY PRESENCE of md5-hashed token buckets (the
  * fastText-style default for short documents): with ~tens of active
  * buckets per doc the margin moves in O(active · lr) per iteration,
  * where TF-normalized features (x ~ 1/n_tokens) would need 50×
  * the iterations to learn anything beyond the base rate.
  *
  * Design for 100 TB:
  *  - the hashing trick means no vocabulary to build, broadcast, or
  *    keep in sync;
  *  - the model is ONE dense double[dim] + bias — KB-sized, baked
  *    into a codegen'd projection as literals;
  *  - scoring is two narrow aggregations (token explode → per-doc
  *    distinct buckets → fold), no join with any corpus-sized side;
  *  - training is batch gradient descent: each iteration is one
  *    distributed pass producing a dim-sized gradient (the ONLY
  *    driver-side data), so iterations scale like any aggregate and
  *    the driver never holds more than the model.
  *
  * Determinism contract (oracle parity): the per-doc contribution
  * fold sums in ascending-bucket order via an explicit sorted list —
  * never a float `sum()` whose partial-aggregation order varies — so
  * scores are bit-identical across runs and engines (the md5-bucket
  * arithmetic is the q71 hash-coin pattern).
  */
object Classifier {

  final case class Model(dim: Int, weights: Array[Double], bias: Double)

  /** Feature bucket of a token: first 15 hex chars of md5 (60 bits,
    * non-negative) mod dim — replayable in any SQL engine with md5.
    */
  def bucket(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 15), 16, 10).cast("long") % dim

  /** (id, bucket) distinct presence features. */
  def features(docs: DataFrame, dim: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      TextStats.tokens(col(textCol)).as("_toks"))
    toks.select(col(idCol), explode(col("_toks")).as("token"))
      .select(col(idCol), bucket(col("token"), dim).as("bucket"))
      .distinct()
  }

  private def weightMap(model: Model): Column =
    map((0 until model.dim).flatMap(j =>
      Seq(lit(j.toLong), lit(model.weights(j)))): _*)

  /** Past this many buckets the literal weight map stops being a
    * reasonable expression (2·dim literals in the plan — the same
    * plan/codegen ceiling as the IVF literal-argmin tree), and the
    * margin switches to a broadcast join against the weights as
    * data. Both paths fold contributions in ascending-bucket order,
    * so they are bit-identical (pinned in ClassifierSpec).
    */
  val LiteralDimThreshold: Int = 4096

  /** z = bias + Σ_{present buckets} w[bucket], folded in ascending-
    * bucket order (deterministic under any partitioning). Returns
    * (id, [carry...], [_bs,] z): `carry` columns (the label during
    * training) ride through the aggregation, and `keepBuckets` also
    * returns the sorted bucket array (the training statistics need
    * it) — ONE fold definition serves scoring and training, which is
    * what keeps the determinism contract in one place.
    */
  private def margin(feats: DataFrame, model: Model, idCol: String,
                     carry: Seq[String] = Nil,
                     viaJoin: Option[Boolean] = None,
                     keepBuckets: Boolean = false): DataFrame = {
    val keys = (Seq(idCol) ++ carry).map(col)
    val bs = if (keepBuckets) Seq(col("_bs")) else Nil
    if (!viaJoin.getOrElse(model.dim > LiteralDimThreshold)) {
      val wMap = weightMap(model)
      feats
        .groupBy(keys: _*)
        .agg(array_sort(collect_list(col("bucket"))).as("_bs"))
        .select(keys ++ bs :+
          (lit(model.bias) +
            aggregate(transform(col("_bs"), b => element_at(wMap, b)),
              lit(0.0), (acc, x) => acc + x)).as("z"): _*)
    } else {
      val spark = feats.sparkSession
      import spark.implicits._
      val wDf = model.weights.toIndexedSeq.zipWithIndex
        .map { case (w, j) => (j.toLong, w) }.toDF("bucket", "_w")
      feats.join(broadcast(wDf), "bucket")
        .groupBy(keys: _*)
        .agg(array_sort(collect_list(struct(col("bucket"), col("_w")))).as("_bw"))
        .select(keys ++ Seq(transform(col("_bw"), e => e.getField("bucket")).as("_bs"))
          .filter(_ => keepBuckets) :+
          (lit(model.bias) +
            aggregate(transform(col("_bw"), e => e.getField("_w")),
              lit(0.0), (acc, x) => acc + x)).as("z"): _*)
    }
  }

  /** Score every doc with a trained model: (id, score, pred) where
    * score = σ(z) and pred = score ≥ 0.5. `viaJoin` forces the
    * literal-map (false) or broadcast-join (true) margin path; the
    * default auto-switches on `LiteralDimThreshold`.
    */
  def score(docs: DataFrame, model: Model, idCol: String = "doc_id",
            textCol: String = "text",
            viaJoin: Option[Boolean] = None): DataFrame = {
    val feats = features(docs, model.dim, idCol, textCol)
    margin(feats, model, idCol, viaJoin = viaJoin)
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("score"))
      .withColumn("pred", col("score") >= 0.5)
  }

  /** Train against a 0/1 label column by IRLS (Newton's method for
    * logistic regression): each iteration is one distributed pass
    * reducing the corpus to dim-sized sufficient statistics — the
    * gradient Σ(p−y)·x and the Hessian Σ p(1−p)·x xᵀ — followed by a
    * (dim+1)² Newton solve on the driver.
    *
    * Why not gradient descent: hashed presence features are heavily
    * co-activated (most docs share the common buckets), so the
    * Hessian is badly conditioned — fixed-step and Adagrad batch GD
    * both measurably oscillate on this objective and need ~200
    * passes for what IRLS closes in two. 200 Spark passes is the
    * wrong trade at any scale; curvature belongs in the optimizer,
    * not in more cluster round-trips.
    *
    * Scale shape: the Hessian pass explodes each doc's active-bucket
    * PAIRS (ā² rows per doc, map-side combined to ≤ dim² per
    * partition) — the standard sufficient-statistic trade for
    * dim ≲ 10³; past that (real fastText vocab hashing) you'd switch
    * to minibatch SGD, which this corpus-distillation surface does
    * not need. Driver state: (dim+1)² doubles (~0.5 MB at 256).
    */
  def train(docs: DataFrame, labelCol: String, dim: Int = 256,
            iters: Int = 4, l2: Double = 1e-3,
            idCol: String = "doc_id", textCol: String = "text"): Model = {
    val D = dim + 1 // + bias coordinate
    val feats = features(docs, dim, idCol, textCol)
      .join(docs.select(col(idCol), col(labelCol).cast("double").as("_y")), idCol)
      .localCheckpoint() // reused every iteration; truncate lineage once
    var model = Model(dim, new Array[Double](dim), 0.0)
    val n = docs.count().toDouble
    for (_ <- 0 until iters) {
      // one thin row per doc: active buckets, residual r = p − y,
      // curvature s = p(1−p) — the SAME margin fold scoring uses
      val perDoc = margin(feats, model, idCol, carry = Seq("_y"),
        keepBuckets = true)
        .select(col("_bs"), col("_y"),
          (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"))
        .select(col("_bs"), (col("p") - col("_y")).as("r"),
          (col("p") * (lit(1.0) - col("p"))).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      // dim-sized: gradient and the bias row of the Hessian
      val vec = perDoc.select(explode(col("_bs")).as("bucket"), col("r"), col("s"))
        .groupBy("bucket")
        .agg(sum(col("r")).as("g"), sum(col("s")).as("hb"))
        .collect().map(r => r.getAs[Long]("bucket").toInt ->
          (r.getAs[Double]("g"), r.getAs[Double]("hb"))).toMap
      // dim²-sized: co-activation Hessian
      val pairs = perDoc.select(explode(flatten(transform(col("_bs"), b1 =>
        transform(col("_bs"), b2 => struct(b1.as("b1"), b2.as("b2")))))).as("_p"),
        col("s"))
        .groupBy(col("_p.b1").as("b1"), col("_p.b2").as("b2"))
        .agg(sum(col("s")).as("h"))
        .collect()
      val scalars = perDoc.agg(sum(col("r")), sum(col("s"))).head()
      perDoc.unpersist(blocking = false)
      // assemble normalized, regularized Newton system on the driver
      val g = new Array[Double](D)
      val h = Array.ofDim[Double](D, D)
      vec.foreach { case (j, (gj, hbj)) =>
        g(j) = gj / n; h(j)(dim) = hbj / n; h(dim)(j) = hbj / n
      }
      pairs.foreach(r => h(r.getAs[Long]("b1").toInt)(r.getAs[Long]("b2").toInt) =
        r.getAs[Double]("h") / n)
      g(dim) = scalars.getDouble(0) / n
      h(dim)(dim) = scalars.getDouble(1) / n
      for (j <- 0 until dim) { g(j) += l2 * model.weights(j); h(j)(j) += l2 }
      h(dim)(dim) += 1e-9 // keep the unregularized bias row nonsingular
      val delta = solve(h, g)
      val w = Array.tabulate(dim)(j => model.weights(j) - delta(j))
      model = Model(dim, w, model.bias - delta(dim))
    }
    // the model lives on the driver — the feature checkpoint's blocks
    // have no consumer left; free them now instead of leaking them
    // into the session (they are invisible to DataFrame.unpersist)
    org.apache.spark.sql.GraftBridge.leafRdds(feats)
      .foreach(_.unpersist(blocking = false))
    model
  }

  /** Gaussian elimination with partial pivoting (destructive on its
    * inputs) — the (dim+1)² Newton solve. ~D³/3 flops: trivial for
    * the dim ≲ 10³ this trainer targets.
    */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val m = b.length
    for (k <- 0 until m) {
      var piv = k
      for (i <- k + 1 until m) if (math.abs(a(i)(k)) > math.abs(a(piv)(k))) piv = i
      val t = a(k); a(k) = a(piv); a(piv) = t
      val tb = b(k); b(k) = b(piv); b(piv) = tb
      for (i <- k + 1 until m) {
        val f = a(i)(k) / a(k)(k)
        if (f != 0.0) {
          for (j <- k until m) a(i)(j) -= f * a(k)(j)
          b(i) -= f * b(k)
        }
      }
    }
    val x = new Array[Double](m)
    for (i <- m - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until m) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  /** Mean log-loss of a model against labels (training diagnostics /
    * spec assertions).
    */
  def logLoss(docs: DataFrame, model: Model, labelCol: String,
              idCol: String = "doc_id", textCol: String = "text"): Double = {
    val eps = 1e-12
    score(docs, model, idCol, textCol)
      .join(docs.select(col(idCol), col(labelCol).cast("double").as("_y")), idCol)
      .select((-(col("_y") * log(col("score") + eps) +
        (lit(1.0) - col("_y")) * log(lit(1.0) - col("score") + eps))).as("ll"))
      .agg(avg("ll")).head().getDouble(0)
  }

  /** ROC AUC of a score against a binary label by the Mann–Whitney
    * rank-sum identity — the threshold-free readout for ANY corpus
    * filter score (quality classifier, heuristic, reward model)
    * against held-out labels, without materializing a ROC curve.
    *
    * Exact-tie handling in pure integers: scores are quantized to
    * micro-units, grouped to distinct values, and each value's
    * average-rank contribution enters as `p · (2·r_lo + t + 1)`
    * (p = positives at the value, t = ties, r_lo = rows strictly
    * below) — twice the classical midrank sum, so it stays BIGINT.
    * AUC = (Σ − np·(np+1)) / (2·np·nn), rounded to 6. Every quantity
    * up to the final division is an integer either engine reproduces
    * exactly; a degenerate label side (np or nn = 0) answers null
    * rather than 0/0.
    *
    * Scale shape: one hash aggregation to distinct score values (the
    * only corpus-sized shuffle), then an ordered prefix-sum window
    * over DISTINCT VALUES ONLY. Micro-quantization bounds that
    * cardinality; for truly continuous scores at 100 TB, coarsen the
    * quantization (1e-4 ≈ 20k distinct values for scores in [0,1] —
    * window input is KBs regardless of corpus size).
    */
  /** Reliability diagram + expected calibration error for a
    * probabilistic score against a binary label — the third leg of
    * the evaluation stool next to AUC (ranking) and κ (agreement):
    * does 0.8 MEAN 80%?
    *
    * Scores quantize to micro-units per row; bins are score-order
    * ntiles with id tie-break. Per bin, confidence − accuracy has the
    * EXACT integer numerator `sy·1e6 − ssm` over `n·1e6`, so the ECE
    * numerator Σ|sy·1e6 − ssm| is a BIGINT and the final ECE is one
    * division — no float accumulation anywhere. Bin assignment is
    * `Ranks.ntileExact` — identical to `ntile(bins) OVER (ORDER BY
    * sm, id)` bit-for-bit, but the only ordered window runs over the
    * bounded score-value dictionary (micro-quantization caps it at
    * ~1e6 entries for scores in [0,1]), never a single-reducer sort
    * of the corpus.
    */
  def calibrationBins(scored: DataFrame, labelCol: String, scoreCol: String,
                      idCol: String = "doc_id", bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = scored.select(col(idCol).as("id"),
      round(col(scoreCol).cast("double") * 1e6).cast("long").as("sm"),
      col(labelCol).cast("long").as("y"))
    val binned = graft.engine.Ranks.ntileExact(q, bins, "sm", "id", out = "bin")
    val g = binned.groupBy("bin").agg(count(lit(1)).as("n"),
      sum("sm").as("ssm"), sum("y").as("sy"))
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("_nt", sum("n").over(w))
      .withColumn("_enum", sum(abs(col("sy") * lit(1000000L) - col("ssm"))).over(w))
      .select(col("bin"), col("n"),
        round(col("ssm").cast("double") / (col("n") * lit(1000000.0)), 6)
          .as("confidence"),
        round(col("sy").cast("double") / col("n"), 6).as("accuracy"),
        round(col("_enum").cast("double") / (col("_nt") * lit(1000000.0)), 6)
          .as("ece"))
      .orderBy("bin")
  }

  /** Brier score with the Murphy decomposition — the calibration
    * summary that splits a probabilistic classifier's squared error
    * into reliability (miscalibration, lower is better), resolution
    * (how much the forecasts separate the classes, higher is
    * better), and uncertainty (the base rate's irreducible floor):
    * Brier ≈ REL − RES + UNC. Complements q181's ECE table: ECE
    * ranks bins, this one number-izes the whole forecast quality.
    *
    * Bins are FIXED-WIDTH over [0,1] (integer arithmetic on the
    * micro-quantized score — deliberately not quantiles, so no
    * ordered window anywhere). Sufficient statistics per bin are
    * exact integers (micro-score sums, label sums, DECIMAL(38,0)
    * squared-error sums); the per-bin REL/RES terms are
    * 1e-9-quantized doubles of identical shape in both engines, and
    * every cross-bin sum is order-free. One doc rollup + one
    * bin-dictionary rollup + a broadcast 1-row total attach.
    */
  def brierDecomposition(scored: DataFrame, labelCol: String,
                         scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"brierDecomposition: bins must be >= 2, got $bins")
    val dec = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val q = scored.select(
      round(col(scoreCol).cast("double") * 1e6).cast("long").as("sm"),
      col(labelCol).cast("long").as("y"))
    val binned = q.withColumn("bin",
      least(floor(col("sm").cast("double") * bins / 1e6),
        lit(bins - 1L)).cast("long"))
    val err = col("sm") - col("y") * lit(1000000L)
    val g = binned.groupBy("bin").agg(count(lit(1)).as("n"),
      sum("sm").as("ssm"), sum("y").as("sy"),
      sum(dec(err * err)).as("sq"))
    val tot = g.agg(sum("n").cast("long").as("nt"),
      sum("sy").cast("long").as("syt"), sum(dec(col("sq"))).as("sqt"))
    val pbar = col("ssm").cast("double") / (col("n").cast("double") * lit(1e6))
    val ybarB = col("sy").cast("double") / col("n").cast("double")
    val ybar = col("syt").cast("double") / col("nt").cast("double")
    val dRel = pbar - ybarB
    val dRes = ybarB - ybar
    val terms = g.crossJoin(broadcast(tot)).select(
      col("n"), col("nt"), col("syt"), col("sqt"),
      round(lit(1e9) * col("n").cast("double") * (dRel * dRel))
        .cast("long").as("rel_u"),
      round(lit(1e9) * col("n").cast("double") * (dRes * dRes))
        .cast("long").as("res_u"))
    terms.groupBy("nt", "syt", "sqt")
      .agg(count(lit(1)).as("n_bins"),
        sum("rel_u").as("srel"), sum("res_u").as("sres"))
      .select(col("nt").as("n"), col("n_bins"),
        round(col("sqt").cast("double") / 1e12 / col("nt"), 6).as("brier"),
        round(col("srel").cast("double") / 1e9 / col("nt"), 6)
          .as("reliability"),
        round(col("sres").cast("double") / 1e9 / col("nt"), 6)
          .as("resolution"),
        round((col("syt").cast("double") / col("nt").cast("double")) *
          (lit(1.0) - col("syt").cast("double") / col("nt").cast("double")),
          6).as("uncertainty"))
  }

  /** Split-conformal prediction report (Vovk et al.; the
    * distribution-free coverage recipe): an md5-coin half of the
    * scored frame becomes the CALIBRATION set, whose nonconformity
    * scores (1 − p(true class), on the 1e-6 micro-grid) yield the
    * threshold `qhat` at nearest rank ⌈(n+1)(1−α)⌉ — computed from
    * the value DICTIONARY via [[graft.engine.Ranks.nearestRank]],
    * never a row-scale sort. The other half is EVALUATED: a class
    * joins a row's prediction set when its nonconformity ≤ qhat, and
    * the report checks the conformal guarantee (coverage ≥ 1 − α in
    * expectation) plus the efficiency diagnostics a modeler actually
    * reads: mean prediction-set size, share of empty sets (score
    * too confident to cover either class) and share of {0,1} sets
    * (score too uncertain to commit).
    *
    * Scale shape: one map pass for scores/coins, one dictionary
    * aggregate for qhat, one reduce for the eval report — no global
    * ordered window anywhere.
    */
  def conformalSplit(scored: DataFrame, labelCol: String,
                     scoreCol: String, alpha: Double = 0.1,
                     idCol: String = "doc_id",
                     calSeed: String = "cal1"): DataFrame = {
    import graft.engine.TrackedCache.Trackable
    require(alpha > 0 && alpha < 1, s"conformalSplit: 0 < alpha < 1")
    val coin = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(s":$calSeed"))), 1, 15), 16, 10).cast("long")
    val sm = round(col(scoreCol).cast("double") * 1e6).cast("long")
    val base = scored.select(col(idCol),
      col(labelCol).cast("long").as("_y"), sm.as("_sm"),
      (coin % 2 === 0).as("_is_cal"))
      .withColumn("_nc", when(col("_y") === 1L,
        lit(1000000L) - col("_sm")).otherwise(col("_sm")))
      .trackedPersist()
    // rank NULL when ⌈(n_cal+1)(1−α)⌉ > n_cal ⇒ qhat NULL ⇒ every
    // class joins every set (the conformal infinite-threshold case —
    // clamping to the max calibration score would under-cover)
    val qh = graft.engine.Ranks.nearestRank(
      base.filter(col("_is_cal")), "_nc",
      Seq("qhat" -> { n =>
        val r = ceil((n + lit(1L)).cast("double") * lit(1.0 - alpha))
          .cast("long")
        when(r <= n, r)
      }))
    val ev = base.filter(!col("_is_cal"))
      .crossJoin(broadcast(qh))
      .select(col("n_total").as("n_cal"), col("qhat"),
        col("_y"), col("_nc"), col("_sm"),
        (col("qhat").isNull || lit(1000000L) - col("_sm") <= col("qhat"))
          .cast("long").as("_in1"),
        (col("qhat").isNull || col("_sm") <= col("qhat"))
          .cast("long").as("_in0"))
    ev.groupBy("n_cal", "qhat")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("qhat").isNull || col("_nc") <= col("qhat"), 1L)
          .otherwise(0L)).as("_cov"),
        sum(col("_in1") + col("_in0")).as("_size"),
        sum(when(col("_in1") + col("_in0") === 0L, 1L).otherwise(0L))
          .as("_empty"),
        sum(when(col("_in1") + col("_in0") === 2L, 1L).otherwise(0L))
          .as("_both"))
      .select(round(lit(1.0 - alpha), 6).as("target_coverage"),
        col("n_cal"), col("qhat").as("qhat_micro"), col("n_eval"),
        round(col("_cov").cast("double") / col("n_eval"), 6).as("coverage"),
        round(col("_size").cast("double") / col("n_eval"), 6)
          .as("avg_set_size"),
        round(col("_empty").cast("double") / col("n_eval"), 6)
          .as("share_empty"),
        round(col("_both").cast("double") / col("n_eval"), 6)
          .as("share_both"))
  }

  /** Conformalized quantile regression (Romano–Patterson–Candès,
    * "Conformalized Quantile Regression", NeurIPS 2019) — the
    * continuous-target twin of [[conformalSplit]], completing the
    * conformal pair. The underlying "quantile regressor" is the
    * exact per-group nearest-rank quantile pair
    * [q_lo, q_hi] = [⌈n·α/2⌉-th, ⌈n·(1−α/2)⌉-th value] fit on an
    * md5-coin TRAIN half (coins 0–1 of 4); the CALIBRATION quarter
    * (coin 2) scores each row with the CQR nonconformity
    * E = max(q_lo − y, y − q_hi) — NEGATIVE when the raw interval
    * already covers, which is what lets conformalization SHRINK an
    * over-wide regressor, not just pad a narrow one; qhat is the
    * ⌈(n_cal+1)(1−α)⌉ nearest rank of E; the EVAL quarter (coin 3)
    * reports per-group coverage and width of the conformalized
    * interval [q_lo − qhat, q_hi + qhat], which carries the
    * distribution-free ≥ 1−α marginal-coverage guarantee. When the
    * calibration set is too small for that rank to exist
    * (⌈(n_cal+1)(1−α)⌉ > n_cal), the theory demands an INFINITE
    * interval to keep the guarantee — reported as NULL qhat_cents /
    * NULL width with coverage 1, never a silently under-covering
    * clamp to the max calibration score.
    *
    * Engine-exactness: targets live on the integer cent grid
    * (round(y·100) as BIGINT), so quantiles, scores, qhat, and the
    * coverage predicate are all integer comparisons — bit-replayable
    * by the DuckDB oracle.
    *
    * Scale shape: one map pass for cents + coins; the per-group
    * quantiles come from [[graft.engine.Ranks.nearestRankBy]]
    * (group-partitioned cumulative counts over the value DICTIONARY)
    * and qhat from [[graft.engine.Ranks.nearestRank]] on the
    * calibration-score dictionary — no row-scale sort or global
    * window anywhere; both attaches are broadcast dictionary rows;
    * one final per-group reduce. */
  def cqr(df: DataFrame, groupCol: String, targetCol: String,
          idCol: String, alpha: Double = 0.2,
          seed: String = "cqr1"): DataFrame = {
    import graft.engine.TrackedCache.Trackable
    require(alpha > 0 && alpha < 1, s"cqr: 0 < alpha < 1, got $alpha")
    val coin = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(s":$seed"))), 1, 15), 16, 10).cast("long") % 4
    val base = df
      .filter(col(idCol).isNotNull && col(groupCol).isNotNull &&
        col(targetCol).isNotNull)
      .select(col(groupCol).as("_g"),
        round(col(targetCol).cast("double") * 100).cast("long").as("_yc"),
        coin.as("_coin"))
      .trackedPersist()
    val qts = graft.engine.Ranks.nearestRankBy(
      base.filter(col("_coin") <= 1L), Seq("_g"), "_yc",
      Seq(
        "_qlo" -> (n => greatest(
          ceil(n.cast("double") * lit(alpha / 2)).cast("long"), lit(1L))),
        "_qhi" -> (n => least(
          ceil(n.cast("double") * lit(1.0 - alpha / 2)).cast("long"), n))))
      .withColumnRenamed("n_total", "_n_train")
    val cal = base.filter(col("_coin") === 2L)
      .join(broadcast(qts), Seq("_g"))
      .select(greatest(col("_qlo") - col("_yc"),
        col("_yc") - col("_qhi")).as("_e"))
    // rank NULL when it exceeds n_cal ⇒ qhat NULL ⇒ infinite interval
    val qh = graft.engine.Ranks.nearestRank(cal, "_e",
      Seq("_qhat" -> { n =>
        val r = ceil((n + lit(1L)).cast("double") * lit(1.0 - alpha))
          .cast("long")
        when(r <= n, r)
      }))
      .withColumnRenamed("n_total", "_n_cal")
    base.filter(col("_coin") === 3L)
      .join(broadcast(qts), Seq("_g"))
      .crossJoin(broadcast(qh))
      .groupBy("_g", "_n_train", "_qlo", "_qhi", "_n_cal", "_qhat")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("_qhat").isNull ||
          (col("_yc") >= col("_qlo") - col("_qhat") &&
            col("_yc") <= col("_qhi") + col("_qhat")), 1L).otherwise(0L))
          .as("_cov"))
      .select(col("_g").as(groupCol), col("_n_train").as("n_train"),
        round(col("_qlo").cast("double") / 100, 6).as("q_lo"),
        round(col("_qhi").cast("double") / 100, 6).as("q_hi"),
        col("_n_cal").as("n_cal"), col("_qhat").as("qhat_cents"),
        col("n_eval"),
        round(col("_cov").cast("double") / col("n_eval"), 6).as("coverage"),
        when(col("_qhat").isNotNull,
          round((col("_qhi") - col("_qlo") + lit(2L) * col("_qhat"))
            .cast("double") / 100, 6)).as("width"))
      .orderBy(groupCol)
  }

  def rankAuc(df: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df
      .select(round(col(scoreCol).cast("double") * 1e6).cast("long").as("sm"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy("sm")
      .agg(count(lit(1)).as("t"), sum("y").as("p"))
    val w = Window.orderBy("sm").rowsBetween(Window.unboundedPreceding, -1)
    val tot = g
      .withColumn("r_lo", coalesce(sum("t").over(w), lit(0L)))
      .agg(sum("p").as("np"), sum(col("t") - col("p")).as("nn"),
        sum(col("p") * (lit(2L) * col("r_lo") + col("t") + lit(1L))).as("s2"))
    tot.select(col("np").as("n_pos"), col("nn").as("n_neg"),
      when(col("np") > 0 && col("nn") > 0,
        round((col("s2") - col("np") * (col("np") + lit(1L))).cast("double")
          / (lit(2.0) * col("np") * col("nn")), 6)).as("auc"))
  }

  /** Isotonic recalibration by Pool-Adjacent-Violators (Ayer et al.
    * 1955; Zadrozny & Elkan 2002, "Transforming classifier scores
    * into accurate multiclass probability estimates") — the standard
    * nonparametric recalibration MAP the diagnostics family (ECE
    * q181, Brier q335-adjacent, conformal, rank-AUC) measures the
    * need for: per group, fit the least-squares NONDECREASING step
    * function from score to empirical positive rate and emit its
    * blocks. A consumer recalibrates a score by looking up the block
    * whose [score_lo, score_hi] brackets it (nearest block below for
    * gaps) and reading `fitted`.
    *
    * Shape: scores are 1/`buckets`-quantized (round-half-up to the
    * bucket grid, clamped to [0, buckets]) and pre-pooled per
    * (group, bucket) — the standard tie-pooling that leaves the
    * isotonic fit unchanged while bounding the sequential stage by
    * the BUCKET DICTIONARY, never the row count. The PAV fold then
    * runs per group inside one mapPartitions pass over the
    * repartition(group) + sortWithinPartitions(group, bucket) frame
    * (the eloFold sessionizer shape): state is the block stack,
    * bounded by `buckets`+1; groups parallelize perfectly; the
    * sequential dependency is PAV's semantics, not a plan defect.
    *
    * Exactness: a block merges into its left neighbor whenever
    * left.mean >= right.mean, compared as the EXACT integer
    * cross-product sy_l·n_r >= sy_r·n_l (BigInt — no double enters
    * any merge decision; merging EQUAL means too makes adjacent
    * block means strictly increasing, so the emitted blocks are the
    * canonical coarsest solution). The only doubles are the reported
    * score bounds and fitted = round(n_pos/n, 6), one division each.
    *
    * Laws the spec pins: fitted strictly increases within a group;
    * an already-isotonic input is a fixed point (every bucket its
    * own block); each block's fitted is the weighted mean of its
    * pooled buckets; block (n, n_pos) totals partition the input.
    *
    * Output: one row per (group, block) — group, block_id (1-based
    * in score order), score_lo, score_hi, n, n_pos, fitted.
    */
  def isotonicCalibration(scored: DataFrame, labelCol: String,
                          scoreCol: String, groupCol: String,
                          buckets: Int = 1000): DataFrame = {
    require(buckets >= 1 && buckets <= 1000000,
      s"isotonicCalibration: buckets in [1, 1e6], got $buckets")
    // Finite-score rule (shared with the Evals family): NaN passes
    // bucketize silently — greatest(NaN, 0) is NaN and
    // least(NaN, buckets) returns buckets, so a NaN score would land
    // in the TOP bucket (+Inf likewise, -Inf in bucket 0). Drop
    // non-finite scores before quantizing, like every other quantizer.
    val q = scored
      .filter(Evals.finite(col(scoreCol).cast("double")))
      .select(col(groupCol).cast("string").as("_g"),
        bucketize(col(scoreCol), buckets).as("_b"),
        col(labelCol).cast("long").as("_y"))
      .filter(col("_g").isNotNull && col("_b").isNotNull &&
        col("_y").isNotNull)
    // the ONLY row-scale shuffle: rows → (group, bucket) dictionary
    val agg = q.groupBy("_g", "_b")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_sy"))
    pavFold(agg)
      .select(col("_g").as(groupCol), col("block_id"),
        round(col("_blo").cast("double") / buckets, 6).as("score_lo"),
        round(col("_bhi").cast("double") / buckets, 6).as("score_hi"),
        col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("fitted"))
      .orderBy(groupCol, "block_id")
  }

  /** The shared score → bucket quantization: round-half-up onto the
    * 1/`buckets` grid, clamped to [0, buckets]. */
  private def bucketize(score: Column, buckets: Int): Column =
    least(greatest(round(score.cast("double") * buckets),
      lit(0.0)), lit(buckets.toDouble)).cast("long")

  /** The PAV fold over a (group, bucket) dictionary frame with
    * columns (_g, _b, _n, _sy) — shared by [[isotonicCalibration]]
    * (block output) and [[calibrationGain]] (apply + report).
    * Returns (_g, block_id, _blo, _bhi, n, n_pos). */
  private def pavFold(dict: DataFrame): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val sorted = dict
      .repartition(col("_g"))
      .sortWithinPartitions("_g", "_b")
      .select(col("_g"), col("_b"), col("_n"), col("_sy"))
      .as[(String, Long, Long, Long)]
    val folded = sorted.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long, Long, Long)]
      // block stack: (bucket_lo, bucket_hi, n, sy)
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var curGroup: String = null
      var open = false
      def flush(): Unit = if (open) {
        var i = 0
        while (i < stack.length) {
          val (lo, hi, n, sy) = stack(i)
          out += ((curGroup, i + 1L, lo, hi, n, sy))
          i += 1
        }
        stack.clear()
      }
      while (it.hasNext) {
        val (g, b, n, sy) = it.next()
        if (!open || g != curGroup) { flush(); curGroup = g; open = true }
        stack += ((b, b, n, sy))
        // pool while the left mean >= the right mean — exact
        // integer rational comparison, equal means pooled too
        while (stack.length >= 2 && {
          val l = stack(stack.length - 2); val r = stack.last
          BigInt(l._4) * r._3 >= BigInt(r._4) * l._3
        }) {
          val r = stack.remove(stack.length - 1)
          val l = stack.remove(stack.length - 1)
          stack += ((l._1, r._2, l._3 + r._3, l._4 + r._4))
        }
      }
      flush()
      out.iterator
    }
    folded.toDF("_g", "block_id", "_blo", "_bhi", "n", "n_pos")
  }

  /** Calibration gain report — FIT the [[isotonicCalibration]] PAV
    * map and APPLY it back to the same panel, reporting each group's
    * Brier score before and after:
    *   brier_raw = mean (score − y)²,
    *   brier_cal = mean (fitted(score) − y)².
    * The companion law (spec-pinned, and a theorem when scores sit
    * on the bucket grid): PAV minimizes squared error among
    * monotone bucket-constant maps and the raw grid score IS one,
    * so brier_cal ≤ brier_raw on the fitting panel — always. The
    * gap is the miscalibration the map removed; ~0 means the scores
    * were already calibrated.
    *
    * IN-SAMPLE by design: the map is fitted and applied on the same
    * panel (every bucket is inside a block by construction, so the
    * lookup is exact — no gap semantics needed; out-of-sample
    * application wants a holdout split upstream, q123/q241).
    *
    * Determinism: per-row raw squared errors are 1e-6-quantized
    * BIGINTs before the bucket rollup; the per-bucket calibrated
    * error collapses exactly over binary labels —
    * Σ_bucket (fitted − y)² = n·fitted² − 2·fitted·sy + sy — one
    * double expression per BUCKET (6-dp fitted), 1e-6-quantized
    * before the group sum. Both sums are order-free; the reported
    * Briers are one division each, rounded 6.
    *
    * Scale shape: ONE row-scale (group, bucket) rollup (shared by
    * the fit and the apply — the panel is scanned once), the
    * dictionary-scale PAV fold, one dictionary range join
    * (bucket dict × blocks, both bounded by `buckets` per group),
    * one group rollup. No windows.
    */
  def calibrationGain(scored: DataFrame, labelCol: String,
                      scoreCol: String, groupCol: String,
                      buckets: Int = 1000): DataFrame = {
    import graft.engine.TrackedCache.Trackable
    require(buckets >= 1 && buckets <= 1000000,
      s"calibrationGain: buckets in [1, 1e6], got $buckets")
    // Same finite-score rule as isotonicCalibration: without it a
    // NaN score both lands in the top bucket AND quantizes its raw
    // Brier term round(1e6·(NaN−y)²) to 0 on the long cast — a row
    // scored as zero raw error while still counting in n, which can
    // break the brier_cal ≤ brier_raw law.
    val q = scored
      .filter(Evals.finite(col(scoreCol).cast("double")))
      .select(col(groupCol).cast("string").as("_g"),
        bucketize(col(scoreCol), buckets).as("_b"),
        col(labelCol).cast("long").as("_y"),
        col(scoreCol).cast("double").as("_s"))
      .filter(col("_g").isNotNull && col("_b").isNotNull &&
        col("_y").isNotNull)
    // ONE row-scale rollup feeds both the PAV fit and the apply
    val dict = q.groupBy("_g", "_b")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_sy"),
        sum(round(lit(1e6) * (col("_s") - col("_y")) *
          (col("_s") - col("_y"))).cast("long")).as("_qraw"))
      .trackedPersist()
    val blocks = pavFold(dict.select("_g", "_b", "_n", "_sy"))
    // dictionary range join: every bucket lies inside exactly one
    // block of its own group's fit (both sides bucket-bounded)
    val fitted = round(col("n_pos").cast("double") / col("n"), 6)
    val applied = dict.join(blocks.withColumnRenamed("_g", "_bg"),
        col("_g") === col("_bg") &&
          col("_b") >= col("_blo") && col("_b") <= col("_bhi"))
      .select(col("_g"), col("_n"), col("_qraw"),
        round(lit(1e6) * (fitted * fitted * col("_n") -
          lit(2.0) * fitted * col("_sy") + col("_sy"))).cast("long")
          .as("_qcal"))
    val nBlocks = blocks.groupBy(col("_g"))
      .agg(max("block_id").as("n_blocks"))
    applied.groupBy("_g")
      .agg(sum("_n").as("n"),
        coalesce(sum("_qraw"), lit(0L)).as("_sraw"),
        coalesce(sum("_qcal"), lit(0L)).as("_scal"))
      .join(nBlocks, Seq("_g"))
      .select(col("_g").as(groupCol), col("n"), col("n_blocks"),
        round(col("_sraw").cast("double") / 1e6 / col("n"), 6)
          .as("brier_raw"),
        round(col("_scal").cast("double") / 1e6 / col("n"), 6)
          .as("brier_cal"))
      .orderBy(groupCol)
  }

  /** OUT-OF-SAMPLE calibration apply — the production half of
    * [[isotonicCalibration]]: take a FITTED block map (that
    * operator's output, fitted on a training panel) and apply it to a
    * HOLDOUT panel, reporting each group's holdout Brier before and
    * after. This implements the gap semantics the isotonic docstring
    * promises ("nearest block below for gaps"): a holdout score
    * bucketizes onto the same 1/`buckets` grid, and its fitted value
    * comes from
    *   - the block whose [score_lo, score_hi] bucket range brackets
    *     it (the exact case — every train bucket is inside a block);
    *   - else the NEAREST BLOCK BELOW (greatest block_lo ≤ bucket —
    *     a gap between blocks, or beyond the last block);
    *   - else (bucket below the FIRST block) the first block.
    * The rule is the step-function reading of the isotonic fit:
    * constant on each block, extended left/right as a constant —
    * monotone in the score by construction. `n_gap` counts the
    * holdout ROWS served by the gap/extension path (bucket outside
    * every block's range) — the drift diagnostic: a holdout that
    * keeps landing off the fitted support wants a refit.
    *
    * Unlike [[calibrationGain]] (in-sample, where brier_cal ≤
    * brier_raw is a theorem), NO such law holds out-of-sample — the
    * gap IS the honest generalization readout (spec pins the gap
    * semantics instead).
    *
    * Groups present in the holdout but absent from `blocks` have no
    * map and DROP (inner join on the group — apply is defined only
    * for fitted groups; count them upstream if needed).
    *
    * Determinism: the identical quantizations as [[calibrationGain]]
    * — per-row raw squared errors 1e-6-quantized BIGINTs in the
    * bucket rollup; per-bucket calibrated error collapses to
    * n·f² − 2·f·sy + sy over the 6-dp block `fitted`, 1e-6-quantized
    * before the group sum; final Briers one division each, rounded 6.
    *
    * Scale shape: ONE row-scale (group, bucket) holdout rollup, one
    * dictionary join to the block map (group-equi with a ≤-filter,
    * both sides bucket-bounded per group), an argmax-by-struct pick
    * of the nearest block below, a 1-row-per-group first-block
    * attach, one group rollup. No windows, no row-scale join.
    */
  def applyCalibration(blocks: DataFrame, holdout: DataFrame,
                       labelCol: String, scoreCol: String,
                       groupCol: String,
                       buckets: Int = 1000): DataFrame = {
    import graft.engine.TrackedCache.Trackable
    require(buckets >= 1 && buckets <= 1000000,
      s"applyCalibration: buckets in [1, 1e6], got $buckets")
    // block map in bucket coordinates: score_lo/score_hi are
    // blo/buckets rounded 6, so round(score·buckets) recovers the
    // exact integer bucket bound for buckets ≤ 1e6
    val blk = blocks.select(
        col(groupCol).cast("string").as("_bg"),
        round(col("score_lo").cast("double") * buckets).cast("long")
          .as("_blo"),
        round(col("score_hi").cast("double") * buckets).cast("long")
          .as("_bhi"),
        col("fitted").cast("double").as("_f"))
      .trackedPersist() // feeds the lookup join, the first-block
                        // fallback, and the per-group block count
    val firstBlk = blk.groupBy("_bg")
      .agg(min(struct(col("_blo"), col("_f"))).as("_m"),
        count(lit(1)).as("n_blocks"))
      .select(col("_bg"), col("_m._f").as("_f0"), col("n_blocks"))
    // the calibrationGain holdout rollup (same finite-score rule)
    val q = holdout
      .filter(Evals.finite(col(scoreCol).cast("double")))
      .select(col(groupCol).cast("string").as("_g"),
        bucketize(col(scoreCol), buckets).as("_b"),
        col(labelCol).cast("long").as("_y"),
        col(scoreCol).cast("double").as("_s"))
      .filter(col("_g").isNotNull && col("_b").isNotNull &&
        col("_y").isNotNull)
    val dict = q.groupBy("_g", "_b")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_sy"),
        sum(round(lit(1e6) * (col("_s") - col("_y")) *
          (col("_s") - col("_y"))).cast("long")).as("_qraw"))
    // nearest block below: among blocks with _blo ≤ bucket, the one
    // with the greatest _blo (argmax by struct — _blo is unique per
    // group). Buckets below the first block match nothing (left
    // join) and fall back to the first block's fitted.
    val looked = dict
      .join(blk, col("_g") === col("_bg") && col("_blo") <= col("_b"),
        "left")
      .groupBy("_g", "_b", "_n", "_sy", "_qraw")
      .agg(max(struct(col("_blo"), col("_bhi"), col("_f"))).as("_mb"))
      .select(col("_g"), col("_b"), col("_n"), col("_sy"),
        col("_qraw"), col("_mb._bhi").as("_hi"), col("_mb._f").as("_fb"))
      .join(firstBlk.withColumnRenamed("_bg", "_g"), Seq("_g"))
    val f = coalesce(col("_fb"), col("_f0"))
    val gapRow = col("_fb").isNull || col("_b") > col("_hi")
    looked
      .select(col("_g"), col("_n"), col("_qraw"), col("n_blocks"),
        when(gapRow, col("_n")).otherwise(0L).as("_ngap"),
        round(lit(1e6) * (f * f * col("_n") -
          lit(2.0) * f * col("_sy") + col("_sy"))).cast("long")
          .as("_qcal"))
      .groupBy("_g")
      .agg(sum("_n").as("n"), max("n_blocks").as("n_blocks"),
        sum("_ngap").as("n_gap"),
        coalesce(sum("_qraw"), lit(0L)).as("_sraw"),
        coalesce(sum("_qcal"), lit(0L)).as("_scal"))
      .select(col("_g").as(groupCol), col("n"), col("n_blocks"),
        col("n_gap"),
        round(col("_sraw").cast("double") / 1e6 / col("n"), 6)
          .as("brier_raw"),
        round(col("_scal").cast("double") / 1e6 / col("n"), 6)
          .as("brier_cal"))
      .orderBy(groupCol)
  }
}
