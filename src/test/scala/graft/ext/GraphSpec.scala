package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 3) =
    Graph.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("pageRank: star graph concentrates rank on the hub") {
    val star = Seq("a", "b", "c", "d").map(x => (x, "hub"))
    val r = ranks(star)
    assert(r("hub") > r("a"))
    // leaves are symmetric — identical rank (exact: integer-unit sums)
    assert(r("a") === r("b"))
    assert(r("c") === r("d"))
  }

  test("pageRank: total rank ≈ node count (no dangling mass)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
    val r = ranks(edges, iters = 5)
    assert(r.size === 4)
    assert(math.abs(r.values.sum - 4.0) < 1e-6)
  }

  test("pageRank: bit-identical under repartitioning") {
    val edges = (0 until 200).map(i => (s"n${i % 37}", s"n${(i * 7 + 3) % 37}"))
      .filter { case (a, b) => a != b }
    val base = ranks(edges)
    val shuffled = Graph.pageRank(
        edges.toDF("src", "dst").repartition(7), iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(base === shuffled)
  }

  test("pageRank: long runs (checkpoint-cut lineage) conserve total rank") {
    // 7 iterations crosses the every-5-iterations localCheckpoint cut.
    // (n11's only edge is a self-loop → it drops out of the graph, so
    // the participating-node count comes from the adjacency, not 23.)
    val edges = (0 until 100).map(i => (s"n${i % 23}", s"n${(i * 5 + 2) % 23}"))
      .filter { case (a, b) => a != b }
    val nodes = Graph.undirectedAdjacency(edges.toDF("src", "dst"))
      .select("src").distinct().count()
    val r = ranks(edges, iters = 7)
    assert(r.size === nodes)
    assert(math.abs(r.values.sum - nodes.toDouble) < 1e-6)
  }

  test("undirectedAdjacency: symmetric, deduplicated, no self-loops") {
    val adj = Graph.undirectedAdjacency(
      Seq(("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")).toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(adj === Set(("a", "b", 1L), ("b", "a", 1L)))
  }
}
