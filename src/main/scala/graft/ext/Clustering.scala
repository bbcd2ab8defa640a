package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.engine.TrackedCache.Trackable

/** Distributed k-means (Lloyd's) over an embedding column — the
  * semantic-bucketing primitive a training-data pipeline uses to
  * stratify a corpus by topic before mixing/sampling (cf. cluster-
  * based data selection; the reference has no ML surface, this is
  * part of the LLM-pipeline extension layer next to
  * [[Similarity]]/[[Quantization]]).
  *
  * Determinism design (the whole point — a k-means whose assignments
  * hash-match a single-threaded SQL replay):
  *
  *  - Init: the embeddings of the `k` smallest ids, coordinates
  *    quantized to 1e-6 (`round(x·1e6)/1e6`) — no RNG, no
  *    kmeans||-style sampling.
  *  - Assignment: squared-L2 distance via [[graft.functions.VectorOps.l2sq]]
  *    (left-to-right double accumulation, bit-identical to the
  *    oracle's `list_sum(list_transform(...))`), then quantized to
  *    integer micro-units; argmin tie-breaks on centroid id. Both
  *    engines compare identical BIGINTs.
  *  - Update: per-dimension mean computed as an INTEGER sum of
  *    per-element micro-units divided by the member count, re-rounded
  *    to 1e-6. Integer sums are associative, so Spark's partial
  *    aggregation (any partitioning) and a sequential fold agree
  *    exactly; the division + round are single correctly-rounded
  *    IEEE ops. Centroids therefore stay on the 1e-6 lattice every
  *    iteration — the state either engine reproduces bit-for-bit.
  *
  * Scale shape (100 TB): model state is k×dim doubles (driver-held,
  * broadcast as literals — kilobytes). Each iteration is ONE map-side
  * assignment pass (codegen'd native expression, no shuffle) plus ONE
  * aggregation keyed by (cluster, dim): partial aggregation collapses
  * every partition to ≤ k·dim rows before the exchange, so the
  * shuffle is O(k·dim·partitions) regardless of row count. The
  * driver collects k·dim rows per iteration — never data. Empty
  * clusters drop out (documented Lloyd's behavior) rather than being
  * re-seeded, keeping the replay exact.
  */
object Clustering {

  /** Quantize a double column to the 1e-6 lattice (HALF_UP, matching
    * DuckDB `round`).
    */
  private def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 1e6) / 1e6

  /** Run `iters` Lloyd iterations from the deterministic init and
    * return per-cluster stats of the FINAL assignment:
    * (cluster, n_members, inertia, top_label, top_label_n).
    *
    * `inertia` is the exact micro-unit sum of member distances to the
    * final centroid, surfaced as a 6-dp double; `top_label` is the
    * majority `labelCol` in the cluster (ties → smaller label) — the
    * purity readout that tells you whether semantic buckets track the
    * labeled taxonomy.
    */
  def kmeans(emb: DataFrame, k: Int, iters: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             labelCol: String = "label"): DataFrame = {
    require(k > 0 && iters >= 0, s"kmeans: need k>0, iters>=0; got k=$k iters=$iters")
    val spark = emb.sparkSession

    // One projected, cached base: (id, v: array<double>, label).
    // Each Lloyd pass re-reads this (iters+1 passes total); at corpus
    // scale swap .cache for a checkpoint/parquet materialization —
    // the pass structure is unchanged.
    val base = emb.select(
      col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"),
      col(labelCol).as("label")).trackedPersist()

    // Deterministic init: k smallest ids, micro-quantized. The sort
    // is k rows after a TakeOrdered-able filter-free limit — cheap.
    var centroids: Array[(Long, Array[Double])] =
      base.orderBy("vec_id").limit(k)
        .select(col("vec_id"), transform(col("v"), q6(_)).as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    def withAssignment(df: DataFrame): DataFrame = {
      // argmin over k centroid literals: array_min of (dm, cid)
      // structs — lexicographic struct ordering = tie-break on cid.
      val cands = centroids.map { case (cid, cv) =>
        struct(
          round(graft.functions.VectorOps.l2sq(col("v"), lit(cv)) * 1e6)
            .cast("long").as("dm"),
          lit(cid).as("cid"))
      }
      df.withColumn("_best", array_min(array(cands.toIndexedSeq: _*)))
        .withColumn("cl", col("_best.cid"))
        .withColumn("dm", col("_best.dm"))
        .drop("_best")
    }

    for (_ <- 1 to iters) {
      val updated = withAssignment(base)
        .select(col("cl"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cl", "i")
        .agg(sum(round(col("x") * 1e6).cast("long")).as("sm"),
          count(lit(1)).as("n"))
        .select(col("cl"), col("i"),
          (round(col("sm").cast("double") / col("n")) / 1e6).as("c"))
        .collect()
      centroids = updated.groupBy(_.getLong(0)).toArray
        .map { case (cid, rows) =>
          val coords = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
          (cid, coords)
        }
        .sortBy(_._1)
    }

    val fin = withAssignment(base)
    val sz = fin.groupBy("cl")
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("dm")).cast("double") / 1e6, 6).as("inertia"))
    val tl = fin.groupBy("cl", "label").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cl")
          .orderBy(col("c").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("cl"), col("label").as("top_label"), col("c").as("top_label_n"))
    val out = sz.join(tl, "cl")
      .select(col("cl").as("cluster"), col("n_members"), col("inertia"),
        col("top_label"), col("top_label_n"))
      .orderBy("cluster")
    // base stays cached until the caller executes `out` (unpersisting
    // here would force the two final-pass branches to rescan the
    // source); Spark evicts it LRU afterwards.
    out
  }

  /** Rank-1 alternating least squares over an implicit (user, item,
    * weight) matrix — the one-factor collaborative signal ("latent
    * item quality weighted by heavy users") and the deterministic
    * seed of a matrix-factorization pipeline (public ALS literature;
    * closed-form per side at rank 1, so NO linear solver is needed:
    * u_c = Σ_b r·v / Σ_b v², then v_b = Σ_c r·u / Σ_c u², both over
    * OBSERVED entries only). One full alternation from v₀ ≡ 1:
    *
    *   1. u-step: with v₀ constant the solve is the per-user mean
    *      weight, rounded to an exact BIGINT.
    *   2. u normalizes to MILLI units by the global max (bounds the
    *      v-step's Σ r·u products inside BIGINT at 100 TB user
    *      counts — the quantization that makes the sums order-free).
    *   3. v-step: exact integer numerator/denominator sums, one
    *      fixed double division, rounded to BIGINT.
    *   4. v reports micro-normalized by its max (exact BIGINT / 1e6,
    *      no decimal rounding boundary).
    *
    * Scale: the ratings aggregation is the only data-sized shuffle;
    * u/v frames are user-/item-dictionary-sized, the user factor
    * joins back by broadcast, and each step is one hash aggregation.
    */
  def alsRankOne(ratings: DataFrame, userCol: String, itemCol: String,
                 cents: Column): DataFrame = {
    val r = ratings.groupBy(col(userCol).as("c"), col(itemCol).as("b"))
      .agg(sum(cents).as("r"))
      .trackedPersist()
    val u0 = r.groupBy("c").agg(
      round(sum("r").cast("double") / count(lit(1))).cast("long").as("u"))
    val um = u0.agg(max(abs(col("u"))).cast("long").as("m"))
    val un = u0.crossJoin(broadcast(um))
      .select(col("c"),
        round(col("u").cast("double") * lit(1e3) / col("m")).cast("long")
          .as("un"))
    val v1 = r.join(broadcast(un), "c")
      .groupBy("b").agg(count(lit(1)).as("n_users"),
        round(sum(col("r") * col("un")).cast("double") * lit(1e3) /
          sum(col("un") * col("un")).cast("double")).cast("long").as("v"))
    val vm = v1.agg(max(abs(col("v"))).cast("long").as("m"))
    v1.crossJoin(broadcast(vm))
      .select(col("b"), col("n_users"),
        (round(col("v").cast("double") * lit(1e6) / col("m")).cast("long")
          .cast("double") / 1e6).as("v_score"))
      .orderBy(col("v_score").desc, col("b"))
  }
}
