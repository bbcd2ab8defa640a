package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the standard
  * large-corpus compression + ANN scheme (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split the
  * d-dim vector into `m` subspaces of d/m dims, k-means each subspace
  * independently, store each vector as `m` small code ids. At
  * float32×64 dims → 8 bytes/vector that is a 32× memory cut, which
  * at 100 TB of embeddings is the difference between an index that
  * fits the cluster and one that does not. Search uses asymmetric
  * distance (ADC): one m×k lookup table per query, approximate
  * distance = sum of m table entries — no float vector is touched at
  * query time.
  *
  * Scale design:
  *  - training: ALL m subspaces train in the same distributed jobs
  *    (subvector explode → broadcast codebook join → per-(vec, sub)
  *    argmin as a partial-aggregable min-struct — not a window), so
  *    iteration cost is m-independent: two shuffles per Lloyd's
  *    round, driver state = m·k·(d/m) floats (the codebook, KB-sized).
  *  - encoding: map-heavy — one broadcast join + two aggregations
  *    keyed by (vec, sub) / vec; output is corpus-sized but 32×
  *    thinner than the input.
  *  - ADC search: the lookup table is query-local (driver/broadcast
  *    literal), the scan is map-only over the codes table + TakeOrdered
  *    top-k. No shuffle at all.
  *
  * Arithmetic contract (oracle parity): all distances are double,
  * accumulated sequentially over ascending index — identical IEEE op
  * order to the DuckDB replay (`list_sum(list_transform(...))`), so
  * results are hash-comparable bit-for-bit.
  */
object Quantization {

  /** Per-subspace codebooks as (sub, code, comps) rows. */
  type Codebooks = Seq[(Int, Int, Seq[Float])]

  /** Squared L2 between a subvector column and a literal centroid,
    * double math, ascending-index sequential sum (oracle op order).
    */
  private def sqDistLit(subvec: org.apache.spark.sql.Column, cent: Seq[Float]) = {
    val centArr = array(cent.map(c => lit(c.toDouble)): _*)
    aggregate(
      zip_with(subvec, centArr, (a, b) => {
        val d = a.cast("double") - b
        d * d
      }),
      lit(0.0), (acc, x) => acc + x)
  }

  /** (vec, sub, subvec) long form: one generator over the vector
    * column — m rows per vector, each d/m wide.
    */
  private def subvectors(embeddings: DataFrame, m: Int, dim: Int,
                         idCol: String, vecCol: String): DataFrame = {
    val d = dim / m
    embeddings.select(col(idCol), inline(array((0 until m).map(s =>
      struct(lit(s).as("sub"),
        slice(col(vecCol), s * d + 1, d).as("subvec"))): _*)))
  }

  /** Codebooks as a small DataFrame for the broadcast-join paths. */
  private def codebookDf(spark: SparkSession, cb: Codebooks): DataFrame = {
    import spark.implicits._
    cb.toDF("sub", "code", "comps")
  }

  /** (vec, sub, code) assignment: broadcast the codebooks, score each
    * (subvec, candidate code), take the (score, code)-min per
    * (vec, sub) as a partial-aggregable min-struct. Tie-break on code
    * id — the same total order the SQL replay's row_number uses.
    * `carrySubvec` rides the subvector through the min-struct (the
    * (score, code) prefix is already unique per group), so training's
    * mean step needs NO join back to the subvector table.
    */
  private def assign(sv: DataFrame, cbDf: DataFrame, idCol: String,
                     carrySubvec: Boolean = false): DataFrame = {
    val scored = sv.join(broadcast(cbDf), "sub")
      .select(col(idCol), col("sub"), col("code"), col("subvec"),
        aggregate(
          zip_with(col("subvec"), col("comps"), (a, b) => {
            val d = a.cast("double") - b.cast("double")
            d * d
          }),
          lit(0.0), (acc, x) => acc + x).as("score"))
    val payload =
      if (carrySubvec) struct(col("score"), col("code"), col("subvec"))
      else struct(col("score"), col("code"))
    val best = scored.groupBy(col(idCol), col("sub"))
      .agg(min(payload).as("_best"))
      .select(Seq(col(idCol), col("sub"),
        col("_best.code").as("code"), col("_best.score").as("score")) ++
        (if (carrySubvec) Seq(col("_best.subvec").as("subvec")) else Nil): _*)
    best
  }

  /** Train m per-subspace codebooks with `kCodes` centroids each,
    * Lloyd's iterations shared across subspaces. Seeds are the first
    * `kCodes` vectors in md5-of-id order (deterministic, same rows
    * for every subspace — the `kmeansCentroids` convention).
    */
  def trainPqCodebooks(embeddings: DataFrame, m: Int = 8, kCodes: Int = 16,
                       iters: Int = 3, idCol: String = "vec_id",
                       vecCol: String = "embedding"): Codebooks = {
    val spark = embeddings.sparkSession
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"PQ: m=$m must divide dim=$dim")
    val d = dim / m
    val seeds = embeddings
      .select(col(idCol).cast("string").as("_id"), col(vecCol).as("_v"))
      .orderBy(md5(col("_id")), col("_id")).limit(kCodes).collect()
      .map(_.getSeq[Float](1))
    var cb: Codebooks = for {
      s <- 0 until m; (vec, c) <- seeds.zipWithIndex
    } yield (s, c, vec.slice(s * d, (s + 1) * d))
    val sv = subvectors(embeddings, m, dim, idCol, vecCol)
    for (_ <- 0 until iters) {
      val assigned = assign(sv, codebookDf(spark, cb), idCol, carrySubvec = true)
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("subvec")).as(Seq("i", "x")))
        .groupBy("sub", "code", "i")
        .agg(avg(col("x").cast("double")).as("mu"))
        .collect()
        .groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")))
      cb = cb.map { case (s, c, old) =>
        means.get((s, c)) match {
          case Some(rows) =>
            val v = new Array[Float](d)
            rows.foreach(r => v(r.getAs[Int]("i")) = r.getAs[Double]("mu").toFloat)
            (s, c, v.toSeq)
          case None => (s, c, old)
        }
      }
    }
    cb
  }

  /** Encode every vector as its m code ids (ascending subspace
    * order) plus the reconstruction SSE (sum of the m per-subspace
    * quantization errors, ascending-subspace sequential sum).
    */
  def pqEncode(embeddings: DataFrame, cb: Codebooks,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    val m = cb.map(_._1).max + 1
    val sv = subvectors(embeddings, m, dim, idCol, vecCol)
    assign(sv, codebookDf(spark, cb), idCol)
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("sub"), col("code"), col("score"))))
        .as("_sc"))
      .select(col(idCol),
        transform(col("_sc"), e => e.getField("code")).as("codes"),
        aggregate(transform(col("_sc"), e => e.getField("score")),
          lit(0.0), (acc, x) => acc + x).as("recon_sse"))
  }

  /** ADC top-k for one query vector over a PQ-encoded corpus: build
    * the m×k distance lookup table from the RAW query (driver-side,
    * KB-sized), then approximate distance = sum over subspaces of
    * lut(sub, codes[sub]) — a map-only scan of the codes table, no
    * vector data read, TakeOrdered top-k.
    */
  def pqAdcTopK(codes: DataFrame, query: Seq[Float], cb: Codebooks, k: Int,
                idCol: String = "vec_id",
                codesCol: String = "codes"): DataFrame = {
    val m = cb.map(_._1).max + 1
    val kCodes = cb.map(_._2).max + 1
    // LUT keys pack as sub·1024 + code; a larger codebook would
    // silently collide into the wrong subspace's distances
    require(kCodes <= 1024,
      s"pqAdcTopK: codebook has $kCodes codes per subspace; the packed " +
        "LUT supports at most 1024")
    require(query.length % m == 0,
      s"pqAdcTopK: query dim ${query.length} not divisible by m=$m")
    val d = query.length / m
    // lookup table: identical op order to sqDistLit / the SQL replay
    val lut: Map[(Int, Int), Double] = cb.map { case (s, c, cent) =>
      var acc = 0.0
      var i = 0
      while (i < d) {
        val diff = query(s * d + i).toDouble - cent(i).toDouble
        acc += diff * diff
        i += 1
      }
      (s, c) -> acc
    }.toMap
    val lutMap = map((0 until m).flatMap { s =>
      (0 until kCodes).flatMap(c =>
        Seq(lit(s * 1024 + c), lit(lut.getOrElse((s, c), Double.MaxValue))))
    }: _*)
    // rank on the ROUNDED distance (ties → id): the rounded value is
    // what the result carries, so ranking on it keeps the top-k and
    // its order identical to any replay that rounds the same way
    codes.select(col(idCol),
      round(aggregate(
        transform(sequence(lit(0), lit(m - 1)),
          s => element_at(lutMap, s * 1024 + element_at(col(codesCol), s + 1))),
        lit(0.0), (acc, x) => acc + x), 6).as("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(k)
  }

  /** Per-dimension [min, max] of an embedding column — the parameter
    * table for scalar (int8) quantization. One explode + one
    * dimension-keyed aggregation; the result is dim-sized (64 rows),
    * broadcast everywhere it is consumed.
    */
  def sqMinMax(embeddings: DataFrame,
               embCol: String = "embedding"): DataFrame =
    embeddings.select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("pos").agg(
        min(col("v").cast("double")).as("vmin"),
        max(col("v").cast("double")).as("vmax"))

  /** Scalar int8 quantization error audit: quantize each dimension to
    * an 8-bit code against the per-dimension [min, max] range,
    * dequantize, and report per-vector max/mean absolute error — the
    * acceptance gate before swapping a float32 corpus for its 4×
    * smaller int8 twin (the simpler, higher-fidelity sibling of PQ:
    * 4× vs 32×, but error bounded per DIMENSION at range/510).
    *
    * code = clamp(round((v−min)/(max−min)·255), 0, 255) (constant
    * dims → code 0, zero error); dequant = min + code/255·(max−min).
    *
    * Determinism: per-element errors are doubles from identical
    * inputs (bit-identical across engines); per-vector MEAN sums are
    * quantized to 1e-9 units (BIGINT) first, so accumulation order —
    * Spark partial aggregation vs DuckDB's fold — cannot perturb the
    * result. MAX needs no such care (max is order-free).
    *
    * Scale: explode → broadcast-join the 64-row param table →
    * re-aggregate by vector id. Two shuffles, both keyed on the
    * natural ids; no window, no driver data path.
    */
  /** Dequantized (scalar-quantization round-tripped) embeddings as
    * ordered array<double> — the vectors a scalar-quantized index
    * actually searches with. `levels` = code scale (255 = int8,
    * 15 = int4, ...). Explode → broadcast param join → order-stable
    * array rebuild (sort_array over (pos, value) structs, so the
    * result is partitioning-independent).
    */
  def sqDequantize(embeddings: DataFrame, idCol: String = "vec_id",
                   embCol: String = "embedding",
                   levels: Int = 255): DataFrame = {
    val params = sqMinMax(embeddings, embCol)
    val ex = embeddings
      .select(col(idCol), posexplode(col(embCol)).as(Seq("pos", "vf")))
      .withColumn("v", col("vf").cast("double"))
      .join(broadcast(params), "pos")
    val code = when(col("vmax") > col("vmin"),
        least(greatest(round((col("v") - col("vmin"))
          / (col("vmax") - col("vmin")) * levels), lit(0.0)),
          lit(levels.toDouble)))
      .otherwise(lit(0.0))
    ex.withColumn("deqv",
        col("vmin") + code / levels.toDouble * (col("vmax") - col("vmin")))
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("deqv"))))
        .as("_p"))
      .select(col(idCol),
        transform(col("_p"), p => p.getField("deqv")).as("dv"))
  }

  /** Retrieval-order fidelity of scalar int8 quantization: Kendall's
    * tau between the EXACT cosine ranking and the ranking the
    * dequantized vectors induce, over the exact top-`k` of one query.
    * This is the decision metric for "can the index run int8?" —
    * q128's error bound says the geometry moved a little; this says
    * whether the ORDER a search returns moved.
    *
    * All rank arithmetic is integer (row_number over rounded cosines
    * with id tiebreak → concordant/discordant pair counts), so the
    * statistic is engine-exact. Cost: one brute top-k (the audit is
    * query-local), then k² pair comparisons — trivially bounded.
    */
  def quantRankFidelity(embeddings: DataFrame, queryId: Long, k: Int = 20,
                        idCol: String = "vec_id",
                        embCol: String = "embedding",
                        levels: Int = 255): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val query = embeddings.filter(col(idCol) === queryId)
      .select(col(embCol).as("qv"))
    // a missing query id would silently produce a row of nulls that
    // reads as a fidelity score — fail loudly instead
    require(!query.isEmpty,
      s"quantRankFidelity: query id $queryId not present in $idCol")
    val top = Similarity.knnBruteForce(embeddings, query, k, idCol, embCol)
      .withColumn("rank_e",
        row_number().over(Window.orderBy(col("cos_sim").desc, col(idCol))))
    val dq = sqDequantize(embeddings, idCol, embCol, levels)
    val qdq = dq.filter(col(idCol) === queryId).select(col("dv").as("qdv"))
    val ranked = top.join(dq, idCol).crossJoin(broadcast(qdq))
      .withColumn("cos_q", round(Similarity.cosine(col("dv"), col("qdv")), 6))
      .withColumn("rank_q",
        row_number().over(Window.orderBy(col("cos_q").desc, col(idCol))))
      .select(col(idCol), col("rank_e"), col("rank_q"))
    val a = ranked.select(col("rank_e").as("re1"), col("rank_q").as("rq1"))
    val b = ranked.select(col("rank_e").as("re2"), col("rank_q").as("rq2"))
    a.crossJoin(b).filter(col("re1") < col("re2"))
      .agg(
        sum(when(col("rq1") < col("rq2"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("rq1") > col("rq2"), 1L).otherwise(0L)).as("discordant"))
      .select(lit(k.toLong).as("n_items"), col("concordant"), col("discordant"),
        round((col("concordant") - col("discordant")).cast("double")
          / (k.toLong * (k - 1) / 2), 6).as("tau"))
  }

  def sqQuantError(embeddings: DataFrame, idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame = {
    val params = sqMinMax(embeddings, embCol)
    val ex = embeddings
      .select(col(idCol), posexplode(col(embCol)).as(Seq("pos", "vf")))
      .withColumn("v", col("vf").cast("double"))
      .join(broadcast(params), "pos")
    val code = when(col("vmax") > col("vmin"),
        least(greatest(round((col("v") - col("vmin"))
          / (col("vmax") - col("vmin")) * 255), lit(0.0)), lit(255.0)))
      .otherwise(lit(0.0))
    val deq = col("vmin") + code / 255.0 * (col("vmax") - col("vmin"))
    ex.withColumn("err_u", round(abs(col("v") - deq) * 1e9).cast("long"))
      .groupBy(idCol).agg(
        max("err_u").as("_mx"), sum("err_u").as("_su"),
        count(lit(1)).as("_n"))
      .select(col(idCol),
        round(col("_mx").cast("double") / 1e9, 6).as("max_abs_err"),
        round(col("_su").cast("double") / col("_n") / 1e9, 6)
          .as("mean_abs_err"))
  }
}
