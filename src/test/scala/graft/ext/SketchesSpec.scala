package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error-contract laws for the sketch aggregates at a size where the
  * sketches actually engage (100k rows — HLL leaves sparse mode,
  * the GK summary compresses).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct count stays within 3·rsd at 100k rows, any partitioning") {
    // known cardinality: id % 40000 has exactly 40000 distinct values
    val df = spark.range(100000).select((col("id") % 40000).as("v"))
    for (parts <- Seq(1, 13)) {
      val approx = df.repartition(parts)
        .select(approx_count_distinct(col("v"), 0.05)).head().getLong(0)
      assert(math.abs(approx - 40000L) <= (3 * 0.05 * 40000).toLong,
        s"parts=$parts approx=$approx")
    }
  }

  test("HLL merge is partition-invariant (registers merge by max)") {
    val df = spark.range(100000).select((col("id") % 12345).as("v"))
    val a = df.repartition(1).select(approx_count_distinct(col("v"), 0.05)).head().getLong(0)
    val b = df.repartition(17).select(approx_count_distinct(col("v"), 0.05)).head().getLong(0)
    assert(a === b)
  }

  test("percentile_approx lands between exact quantiles at p ∓ rank-eps") {
    // skewed long-tail lengths, grouped — the corpus-stats shape
    val df = spark.range(100000)
      .select((col("id") % 5).as("g"),
        (pow(col("id") % 1000 + 1, 1.5)).cast("long").as("n"))
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    def arr(ps: Seq[Double]) = ps.mkString("array(", ",", ")")
    val rows = df.groupBy("g").agg(
      expr(s"percentile_approx(n, ${arr(probs)}, 10000)").as("ap"),
      expr(s"percentile(n, ${arr(probs.map(p => p - 0.02))})").as("lo"),
      expr(s"percentile(n, ${arr(probs.map(p => math.min(p + 0.02, 1.0)))})").as("hi"))
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val ap = r.getSeq[Long](1); val lo = r.getSeq[Double](2); val hi = r.getSeq[Double](3)
      probs.indices.foreach { i =>
        assert(ap(i) >= lo(i) - 1e-9 && ap(i) <= hi(i) + 1e-9,
          s"g=${r.get(0)} p=${probs(i)} ap=${ap(i)} not in [${lo(i)}, ${hi(i)}]")
      }
    }
  }

  test("vocabChecked / docLengthChecked contracts hold on real docs") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val v = Sketches.vocabChecked(docs).collect()
    assert(v.nonEmpty)
    v.foreach(r => assert(r.getAs[Boolean]("hll_within_3rsd"), r.toString))
    val q = Sketches.docLengthChecked(docs, Seq(0.25, 0.5, 0.75, 0.95)).collect()
    assert(q.nonEmpty)
    q.foreach(r => assert(r.getAs[Boolean]("approx_in_rank_bounds"), r.toString))
  }

  test("kmvOverlap: EXACT Jaccard when the pair union fits inside k") {
    import spark.implicits._
    // A = {a..f} (6), B = {d..i} (6), shared {d,e,f} → J = 3/9
    val docs = Seq(
      ("sA", "a b c d e f"),
      ("sB", "d e f g h i")
    ).toDF("source", "text")
    val out = Sketches.kmvOverlap(docs, k = 64).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === (("sA", "sB")))
    assert(r.getAs[Long]("n_sketch") === 9L)
    assert(r.getAs[Long]("n_both") === 3L)
    assert(r.getAs[Double]("est_jaccard") === 0.333333)
  }

  test("kmvOverlap: estimate within KMV error bounds on a large planted overlap") {
    import spark.implicits._
    // 2000-token vocabularies with exactly 1000 shared → J = 1/3
    val shared = (0 until 1000).map(i => s"sh$i")
    val onlyA = (0 until 1000).map(i => s"av$i")
    val onlyB = (0 until 1000).map(i => s"bv$i")
    val docs = Seq(
      ("sA", (shared ++ onlyA).mkString(" ")),
      ("sB", (shared ++ onlyB).mkString(" "))
    ).toDF("source", "text")
    val r = Sketches.kmvOverlap(docs, k = 256).collect().head
    assert(r.getAs[Long]("n_sketch") === 256L)
    val est = r.getAs[Double]("est_jaccard")
    // std error ≈ sqrt(J(1−J)/k) ≈ 0.029; allow 4σ
    assert(math.abs(est - 1.0 / 3) < 0.12, s"est $est vs 0.333")
  }

  test("kmvOverlap: deterministic under repartitioning") {
    import spark.implicits._
    val docs = (0 until 60).map(i =>
      (s"s${i % 4}", (0 until 50).map(j => s"t${(i * j) % 431}").mkString(" ")))
      .toDF("source", "text")
    val a = Sketches.kmvOverlap(docs, k = 32).collect().toSeq
    val b = Sketches.kmvOverlap(docs.repartition(7), k = 32).collect().toSeq
    assert(a === b)
  }
}
