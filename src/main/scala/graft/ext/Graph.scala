package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  /** Undirected, deduplicated, self-loop-free edge set (both
    * directions materialized) with per-source degree attached:
    * (src, dst, deg). This is the reusable adjacency for iterative
    * algorithms — build once, cache, iterate.
    */
  def undirectedAdjacency(edges: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
                         col(dstCol).cast("string").as("dst"))
      .where(col("src") =!= col("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    und.join(deg, "src")
  }

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
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    // plan shape (verified via explain at sf0.1): ranks is node-sized
    // → every iteration joins as BroadcastHashJoin over the CACHED
    // adjacency, so the edge table never re-shuffles; per-iteration
    // cost is one broadcast + one Exchange (the contribution groupBy).
    // For billion-node graphs where ranks outgrows broadcast, Spark
    // falls back to a shuffle join keyed on src — still one
    // edge-shuffle per iteration, no plan change needed here.
    val adj = undirectedAdjacency(edges, srcCol, dstCol)
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
    ranks
  }
}
