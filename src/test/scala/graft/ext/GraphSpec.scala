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

  private def triStats(edges: Seq[(String, String)]) =
    Graph.triangleStats(edges.toDF("src", "dst")).collect().head

  test("triangleStats: K4 has 4 triangles, cc = 1") {
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
                   if a < b } yield (a, b)
    val r = triStats(k4)
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_wedges") === 12L) // 4 · C(3,2)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("global_cc") === 1.0)
  }

  test("triangleStats: path graph has zero triangles") {
    val r = triStats(Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Double]("global_cc") === 0.0)
  }

  test("triangleStats: duplicate/reversed/self-loop edges collapse; bowtie = 2") {
    // two triangles sharing node c, with noise edges
    val bowtie = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"),
      ("c", "d"), ("d", "e"), ("c", "e"), ("e", "c"), ("c", "c"))
    val r = triStats(bowtie)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 2L)
  }

  test("triangleStats: count invariant under repartitioning") {
    // ring + embedded K5 so triangles exist by construction
    val edges = ((0 until 300).map(i => (s"n${i % 29}", s"n${(i * 11 + 5) % 29}")) ++
      (for { a <- 0 until 5; b <- 0 until 5 if a < b } yield (s"n$a", s"n$b")))
      .filter { case (a, b) => a != b }
    val base = triStats(edges).getAs[Long]("n_triangles")
    val rep = Graph.triangleStats(edges.toDF("src", "dst").repartition(7))
      .collect().head.getAs[Long]("n_triangles")
    assert(base === rep && base > 0L)
  }

  test("coOccurrenceEdges: pairs within groups only, canonical a<b") {
    val df = Seq((1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "w"), (3, "q"))
      .toDF("g", "item")
    val got = Graph.coOccurrenceEdges(df, "g", "item").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("x", "y"), ("x", "z"), ("y", "z"), ("w", "x")))
  }

  test("bfsHops: hand-checked hop labels on a path with a branch") {
    // s - a - b - c ;  a - d    seeds = {s}
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("a", "d"))
    val out = Graph.bfsHops(edges.toDF("src", "dst"),
        Seq("s").toDF("node"), maxHops = 3).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("s" -> 0, "a" -> 1, "b" -> 2, "d" -> 2, "c" -> 3))
  }

  test("bfsHops: maxHops truncates; isolated seed stays at hop 0") {
    val edges = Seq(("a", "b"), ("b", "c"))
    val out = Graph.bfsHops(edges.toDF("src", "dst"),
        Seq("a", "zzz").toDF("node"), maxHops = 1).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("a" -> 0, "zzz" -> 0, "b" -> 1))
  }

  test("personalizedPageRank: rank concentrates around the seeds") {
    // chain: s - a - b - c - d  with seed {s}
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("c", "d"))
    val r = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        Seq("s").toDF("node"), iterations = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("s") > r("a") && r("a") > r("c"),
      s"rank must decay with distance from the seed: $r")
    assert(r("d") < r("b"))
  }

  test("personalizedPageRank: uniform teleport over multiple seeds; repartition-stable") {
    val edges = (0 until 200).map(i => (s"n${i % 23}", s"n${(i * 7 + 3) % 23}"))
      .filter { case (a, b) => a != b }
    val seeds = Seq("n1", "n2").toDF("node")
    val base = Graph.personalizedPageRank(edges.toDF("src", "dst"), seeds, 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val rep = Graph.personalizedPageRank(
        edges.toDF("src", "dst").repartition(7), seeds, 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(base === rep)
    // non-seed nodes get rank ONLY through walks (no base teleport)
    assert(base.values.sum <= 1.0 + 1e-6)
  }

  test("labelPropagation: majority wins, ties to the smallest label") {
    // x has neighbors: two 'a'-labeled, one 'b' → a
    // y has one 'a', one 'b' → tie → a (smallest)
    val edges = Seq(("s1", "x"), ("s2", "x"), ("s3", "x"),
      ("s1", "y"), ("s3", "y"))
    val seeds = Seq(("s1", "a"), ("s2", "a"), ("s3", "b"))
      .toDF("node", "label")
    val out = Graph.labelPropagation(edges.toDF("src", "dst"), seeds, 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("x") === "a")
    assert(out("y") === "a")
  }

  test("labelPropagation: seeds stay clamped; round 2 reaches two hops") {
    // seed s(label z) - m - far : far only labelable in round 2
    val edges = Seq(("s", "m"), ("m", "far"))
    val seeds = Seq(("s", "z"), ("m", "q")).toDF("node", "label")
    val r1 = Graph.labelPropagation(edges.toDF("src", "dst"), seeds, 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // m is itself a seed → clamped at q even though s says z
    assert(r1("m") === "q")
    assert(r1("far") === "q")
    val unlabeledMid = Seq(("s", "z")).toDF("node", "label")
    val oneRound = Graph.labelPropagation(edges.toDF("src", "dst"),
      unlabeledMid, 1).collect().map(r => r.getString(0)).toSet
    assert(!oneRound.contains("far")) // one round: only m reached
    val twoRounds = Graph.labelPropagation(edges.toDF("src", "dst"),
      unlabeledMid, 2).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(twoRounds("far") === "z")
  }

  test("degreeAssortativity: star graph → exactly -1") {
    val star = Seq("a", "b", "c", "d", "e").map(x => (x, "hub"))
    val r = Graph.degreeAssortativity(star.toDF("src", "dst")).collect().head
    assert(r.getAs[Long]("n_nodes") === 6L)
    assert(r.getAs[Long]("n_edges") === 5L)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("degreeAssortativity: matches a local replay on a mixed graph") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("e", "a"), ("f", "b"))
    val out = Graph.degreeAssortativity(edges.toDF("src", "dst"))
      .collect().head.getAs[Double]("assortativity")
    // local Newman r over the canonical edge set
    val und = edges.map { case (x, y) => if (x < y) (x, y) else (y, x) }.distinct
    val deg = und.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val m = und.size.toDouble
    val sp = und.map { case (u, v) => deg(u) * deg(v) }.sum.toDouble
    val s1 = und.map { case (u, v) => deg(u) + deg(v) }.sum.toDouble
    val s2 = und.map { case (u, v) => deg(u) * deg(u) + deg(v) * deg(v) }
      .sum.toDouble
    val mean = s1 / (2 * m)
    val expect = math.rint(1e6 *
      (sp / m - mean * mean) / (s2 / (2 * m) - mean * mean)) / 1e6
    assert(out === expect)
  }

  test("undirectedAdjacency: symmetric, deduplicated, no self-loops") {
    val adj = Graph.undirectedAdjacency(
      Seq(("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")).toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(adj === Set(("a", "b", 1L), ("b", "a", 1L)))
  }

  test("coOccurrenceEdges: maxItemDf drops hot items; capped ⊆ uncapped") {
    // item "hot" is in every group; others in one or two
    val rows = Seq(("g1", "hot"), ("g1", "a"), ("g1", "b"),
      ("g2", "hot"), ("g2", "b"), ("g2", "c"),
      ("g3", "hot"), ("g3", "a")).toDF("g", "item")
    val full = Graph.coOccurrenceEdges(rows, "g", "item")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val capped = Graph.coOccurrenceEdges(rows, "g", "item", Some(2L))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.subsetOf(full))
    assert(!capped.exists(e => e._1 == "hot" || e._2 == "hot"))
    // non-hot co-occurrence survives the cap
    assert(capped === Set(("a", "b"), ("b", "c")))
  }

  // ——— kcorePeel ———

  // triangle abc (all deg 2) + pendant chain c–d–e (d deg 2, e deg 1)
  private val kcoreEdges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
    ("c", "d"), ("d", "e"))

  test("kcorePeel: known 2-core survives, pendants peel off in order") {
    val out = Graph.kcorePeel(kcoreEdges.toDF("src", "dst"), k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // round 0: raw graph; round 1: e (deg 1) peeled, edge d–e drops;
    // round 2: d (now deg 1) peeled, edge c–d drops; round 3: stable
    // triangle = the exact 2-core
    assert(out === Array((0L, 5L, 5L), (1L, 4L, 4L), (2L, 3L, 3L),
      (3L, 3L, 3L)))
  }

  test("kcorePeel: monotone shrink; k above max degree peels everything") {
    val out = Graph.kcorePeel(kcoreEdges.toDF("src", "dst"), k = 4, rounds = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.head === ((5L, 5L)))
    assert(out.tail.forall(_ === ((0L, 0L))))
    val shrink = Graph.kcorePeel(kcoreEdges.toDF("src", "dst"), 2, 3)
      .collect().map(_.getLong(1))
    assert(shrink.zip(shrink.tail).forall { case (a, b) => b <= a })
  }

  test("kcorePeel: deterministic unpersist — no cached generations survive") {
    val edges = (0 until 60).map(i => (s"n${i % 13}", s"n${(i * 5 + 1) % 13}"))
      .toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Graph.kcorePeel(edges, k = 2, rounds = 5).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"kcorePeel leaked cached RDDs: $leaked")
  }

  test("labelPropagation/bfsHops: executor storage does not grow with rounds") {
    val edges = (0 until 100).map(i => (s"n${i % 23}", s"n${(i * 7 + 2) % 23}"))
      .toDF("src", "dst")
    val seeds = Seq(("n0", "x"), ("n1", "y")).toDF("node", "label")
    def newRddsAfter(body: => Unit): Int = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      body
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    }
    // superseded generations are freed each round, so the number of
    // surviving cached/checkpointed RDDs is the same at 1 round and 5
    val lp1 = newRddsAfter(Graph.labelPropagation(edges, seeds, 1).collect())
    val lp5 = newRddsAfter(Graph.labelPropagation(edges, seeds, 5).collect())
    assert(lp5 <= lp1 + 1, s"labelPropagation storage grew with rounds: $lp1 → $lp5")
    // bfsHops keeps one checkpoint per frontier — all of them ARE the
    // result (no duplicated visited generations): growth is ≤ 1/hop
    val b1 = newRddsAfter(Graph.bfsHops(edges, seeds.select("node"), 1).collect())
    val b4 = newRddsAfter(Graph.bfsHops(edges, seeds.select("node"), 4).collect())
    assert(b4 - b1 <= 3, s"bfsHops leaked beyond per-hop frontiers: $b1 → $b4")
  }

  test("hits: hand-computed bipartite star, one iteration exact") {
    // h1→a1, h2→a1, h3→a1, h1→a2:
    //   authority pass: a1 ← 3 hubs, a2 ← 1 → L1-normalized 0.75/0.25
    //   hub pass: h1 ← a1+a2 = 1.0, h2 = h3 ← a1 = 0.75
    //             → totals 2.5 → 0.4 / 0.3 / 0.3
    val edges = Seq(("h1", "a1"), ("h2", "a1"), ("h3", "a1"), ("h1", "a2"))
      .toDF("src", "dst")
    val got = Graph.hits(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got("a1") === ((0.75, 0.0)))
    assert(got("a2") === ((0.25, 0.0)))
    assert(got("h1") === ((0.0, 0.4)))
    assert(got("h2") === ((0.0, 0.3)))
    assert(got("h3") === ((0.0, 0.3)))
  }

  test("hits: L1 normalization holds and scores are deterministic across runs") {
    val edges = (0 until 200).map(i => (s"u${i % 17}", s"v${(i * 5 + 3) % 13}"))
      .toDF("src", "dst")
    val r1 = Graph.hits(edges, iterations = 2).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val r2 = Graph.hits(edges, iterations = 2).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(r1 === r2, "hits not deterministic across runs")
    // each half-step divides by the exact integer total, so both
    // score vectors sum to 1 within round-9 quantization slack
    val aSum = r1.map(_._2).sum
    val hSum = r1.map(_._3).sum
    assert(math.abs(aSum - 1.0) < 1e-6, s"authority mass $aSum != 1")
    assert(math.abs(hSum - 1.0) < 1e-6, s"hub mass $hSum != 1")
  }

  test("linkPrediction: hand-computed path graph; existing edges excluded") {
    // path a—b—c—d: candidates are (a,c) via b, (b,d) via c — each
    // cn=1 through a degree-2 center → AA = 1/ln 2; plus (a,d)? no —
    // a and d share no neighbor. Edges themselves must not appear.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val out = Graph.linkPrediction(edges).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(out.keySet === Set(("a", "c"), ("b", "d")))
    val expAa = math.round(1e6 / math.log(2.0)) / 1e6
    val ((cn, du, dv, jac, gotAa)) = out(("a", "c"))
    assert(cn === 1L)
    assert((du, dv) === ((1L, 2L))) // deg(a)=1, deg(c)=2
    assert(jac === 0.5)             // 1 / (1 + 2 − 1)
    assert(math.abs(gotAa - expAa) < 1e-9)
  }

  test("linkPrediction: triangle has no candidates; cn counts all shared neighbors") {
    // triangle abc (no non-adjacent pairs) + square wxyz where (w,y)
    // and (x,z) are the two diagonals, each with cn=2
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val sq = Seq(("w", "x"), ("x", "y"), ("y", "z"), ("w", "z"))
    val out = Graph.linkPrediction((tri ++ sq).toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out.keySet === Set(("w", "y"), ("x", "z")))
    assert(out.values.toSet === Set(2L))
  }

  test("linkPrediction: maxCenterDeg removes hub-mediated candidates only") {
    // star center h with 4 leaves + path p—q—r: capping at deg ≤ 3
    // drops the hub's C(4,2)=6 leaf pairs, keeps (p,r) via q
    val star = Seq("l1", "l2", "l3", "l4").map(("h", _))
    val path = Seq(("p", "q"), ("q", "r"))
    val df = (star ++ path).toDF("src", "dst")
    val full = Graph.linkPrediction(df).collect()
    assert(full.length === 6 + 1)
    val capped = Graph.linkPrediction(df, maxCenterDeg = Some(3L)).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(capped.toSet === Set(("p", "r")))
  }

  test("modularity: two cliques joined by one bridge score near-optimal") {
    // K4 ∪ K4 + 1 bridge: m = 13; with the true 2-community labels
    // Q = 2·(6/13 − (13/26)²) = 12/13 − 1/2 ≈ 0.423
    def clique(ns: Seq[String]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val left = Seq("a1", "a2", "a3", "a4")
    val right = Seq("b1", "b2", "b3", "b4")
    val edges = (clique(left) ++ clique(right) :+ ("a1", "b1"))
      .toDF("src", "dst")
    val labels = (left.map((_, "L")) ++ right.map((_, "R")))
      .toDF("node", "label")
    val out = Graph.modularity(edges, labels).collect()
    assert(out.map(_.getAs[String]("community")).sorted === Array("L", "R"))
    val q = out.map(_.getAs[Double]("dq")).sum
    assert(math.abs(q - (12.0 / 13 - 0.5)) < 1e-6, s"Q=$q")
    out.foreach { r =>
      assert(r.getAs[Long]("n_nodes") === 4L)
      assert(r.getAs[Long]("within_edges") === 6L)
      assert(r.getAs[Long]("degree_sum") === 13L) // 2·6 within + bridge
    }
  }

  test("modularity: everything in one community scores exactly zero") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val labels = Seq("a", "b", "c", "d").map((_, "all")).toDF("node", "label")
    val out = Graph.modularity(edges, labels).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("dq") === 0.0) // L_c/m = 1, (d_c/2m)² = 1
  }

  test("louvainMoveGain: the mislabeled clique node tops the move list") {
    // two K4s; a1 LABELED into the other clique's community R:
    // ΔQ(a1→L) = 3/12 − 3·(9−15+3)/(2·144) = 0.28125
    def clique(ns: Seq[String]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val left = Seq("a1", "a2", "a3", "a4")
    val right = Seq("b1", "b2", "b3", "b4")
    val edges = (clique(left) ++ clique(right)).toDF("src", "dst")
    val labels = (Seq(("a1", "R")) ++ left.tail.map((_, "L")) ++
      right.map((_, "R"))).toDF("node", "label")
    val out = Graph.louvainMoveGain(edges, labels).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("node") === "a1")
    assert(top.getAs[String]("from_community") === "R")
    assert(top.getAs[String]("to_community") === "L")
    assert(top.getAs[Double]("dq") === 0.28125)
    // no other move should beat fixing the mislabel
    assert(out.tail.forall(_.getAs[Double]("dq") < 0.28125))
  }

  test("louvainMoveGain: a clean partition with no cross edges offers no moves") {
    def clique(ns: Seq[String]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(Seq("a1", "a2", "a3")) ++
      clique(Seq("b1", "b2", "b3"))).toDF("src", "dst")
    val labels = (Seq("a1", "a2", "a3").map((_, "L")) ++
      Seq("b1", "b2", "b3").map((_, "R"))).toDF("node", "label")
    assert(Graph.louvainMoveGain(edges, labels).collect().isEmpty)
  }

  test("modularity: unlabeled nodes become singleton communities") {
    val edges = Seq(("a", "b"), ("b", "x")).toDF("src", "dst")
    val labels = Seq(("a", "g"), ("b", "g")).toDF("node", "label")
    val out = Graph.modularity(edges, labels).collect()
      .map(r => r.getAs[String]("community") -> r).toMap
    assert(out.keySet === Set("g", "x"))
    assert(out("x").getAs[Long]("n_nodes") === 1L)
    assert(out("x").getAs[Long]("within_edges") === 0L)
    assert(out("g").getAs[Long]("within_edges") === 1L)
    // contributions still sum to the partition's Q over m=2 edges:
    // Q = (1/2 − (3/4)²) + (0 − (1/4)²) = −1/8
    val q = out.values.map(_.getAs[Double]("dq")).sum
    assert(math.abs(q - (-0.125)) < 1e-6, s"Q=$q")
  }

  test("deterministicWalks: every hop follows an edge, replay is exact, " +
    "seed changes the path") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .toDF("src", "dst")
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.toSet
    val w1 = Graph.deterministicWalks(edges, steps = 3, seed = "s1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    // one row per (start node, step): 4 nodes × 3 steps
    assert(w1.length === 12)
    assert(w1.map(t => (t._1, t._2)).distinct.length === 12)
    // hop validity: reconstruct each walk and check every transition
    // is a real undirected edge
    for ((start, path) <- w1.groupBy(_._1)) {
      val ordered = start +: path.sortBy(_._2).map(_._3).toSeq
      ordered.sliding(2).foreach { case Seq(u, v) =>
        assert(und.contains((u, v)), s"walk from $start hops $u->$v")
      }
    }
    // replay: identical; reseed: some trajectory differs
    val w1b = Graph.deterministicWalks(edges, steps = 3, seed = "s1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(w1.sorted.toSeq === w1b.sorted.toSeq)
    val w2 = Graph.deterministicWalks(edges, steps = 3, seed = "s2")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(w1.sorted.toSeq !== w2.sorted.toSeq)
  }

  test("node2vecWalks: hop validity, exact replay, and the p/q bias " +
    "steers step 2 (back vs common vs far) under extreme weights") {
    // triangle a-b-c plus pendant b-d: from prev=a, cur=b the
    // candidates are a (back), c (common neighbor of a), d (far)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"))
      .toDF("src", "dst")
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"))
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.toSet
    // find a seed whose step-1 from "a" goes to "b" so the candidate
    // classes are all distinct (a's neighbors: b, c)
    val seed = (1 to 20).map(i => s"t$i").find { sd =>
      Graph.node2vecWalks(edges, steps = 1, seed = sd).collect()
        .exists(r => r.getString(0) == "a" && r.getString(2) == "b")
    }.get
    def step2(wB: Int, wC: Int, wF: Int): String =
      Graph.node2vecWalks(edges, steps = 2, seed = seed,
        wBack = wB, wCommon = wC, wFar = wF).collect()
        .filter(r => r.getString(0) == "a" && r.getInt(1) == 2)
        .map(_.getString(2)).head
    // extreme weights force each class deterministically: the md5
    // coin mod total lands inside the ~sole massive bucket
    assert(step2(1000000, 1, 1) === "a") // return bias (small p)
    assert(step2(1, 1000000, 1) === "c") // BFS bias (common neighbor)
    assert(step2(1, 1, 1000000) === "d") // DFS bias (small q)
    // hop validity + replay on default weights
    val w1 = Graph.node2vecWalks(edges, steps = 3, seed = "s1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(w1.length === 12)
    for ((start, path) <- w1.groupBy(_._1)) {
      val ordered = start +: path.sortBy(_._2).map(_._3).toSeq
      ordered.sliding(2).foreach { case Seq(u, v) =>
        assert(und.contains((u, v)), s"walk from $start hops $u->$v")
      }
    }
    val w1b = Graph.node2vecWalks(edges, steps = 3, seed = "s1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(w1.sorted.toSeq === w1b.sorted.toSeq)
  }

  test("negativeSamples: one draw per (pair, j) even when intervals " +
    "span many buckets, exact replay, collision flag") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"))
      .toDF("src", "dst")
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "d"))
      .toDF("u", "v")
    // tiny bucketWidth forces every interval to span many buckets —
    // the dedup-critical path of the grid join: still exactly one
    // matching node per coin
    val out = Graph.negativeSamples(edges, pairs, k = 3, seed = "t1",
      bucketWidth = 7L).collect()
    assert(out.length === 9) // 3 pairs × 3 draws
    assert(out.map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .distinct.length === 9)
    val nodes = Set("a", "b", "c", "d")
    out.foreach { r =>
      assert(nodes.contains(r.getString(3)))
      val expectCollision = r.getString(3) == r.getString(0) ||
        r.getString(3) == r.getString(1)
      assert(r.getBoolean(4) === expectCollision)
    }
    // replay invariance: bucket width is an implementation knob, not
    // semantics — the drawn negatives must be identical for any width
    val wide = Graph.negativeSamples(edges, pairs, k = 3, seed = "t1")
      .collect().map(_.toSeq)
    assert(wide.toSeq === out.map(_.toSeq).toSeq)
    // a different seed moves at least one draw
    val reseeded = Graph.negativeSamples(edges, pairs, k = 3, seed = "t2")
      .collect().map(_.toSeq)
    assert(reseeded.toSeq !== wide.toSeq)
  }

  test("walkSkipGramPairs: window band, start at step 0, revisit " +
    "self-pairs dropped, multiplicity counted") {
    // hand trajectory a→b→c→d: window 2 pairs are (a,b),(a,c),(b,c),
    // (b,d),(c,d) — (a,d) is 3 hops apart and excluded
    val path = Seq(("a", 1, "b"), ("a", 2, "c"), ("a", 3, "d"))
      .toDF("start", "step", "node")
    val p1 = Graph.walkSkipGramPairs(path, window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_cooc"))
      .toMap
    assert(p1 === Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L))
    // revisit walk a→b→a: the (a,a) step-0↔step-2 self-pair is
    // dropped; (a,b) appears from both sides of the revisit
    val revisit = Seq(("a", 1, "b"), ("a", 2, "a"))
      .toDF("start", "step", "node")
    val p2 = Graph.walkSkipGramPairs(revisit, window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_cooc"))
      .toMap
    assert(p2 === Map(("a", "b") -> 2L))
  }
}
