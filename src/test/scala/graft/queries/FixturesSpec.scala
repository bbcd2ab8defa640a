package graft.queries

import graft.SparkSpec
import graft.ext.{Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** The scalar oracle references must reproduce the distributed
  * pipelines exactly — that equality is what the q61/q44 DuckDB
  * hash-checks stand on.
  */
class FixturesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("scalar simhash reference equals the native expression on real docs") {
    val native = docs.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    val scalar = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> Fixtures.simhashScalar(r.getString(1))
    }.toMap
    assert(native.size === scalar.size)
    native.foreach { case (id, sh) => assert(scalar(id) === sh, s"doc $id") }
  }

  test("scalar multimodal reference equals the distributed pipeline") {
    val dist = Multimodal.featurePipeline(docs)
      .select($"media_id", $"frame", $"feat_norm")
      .as[(Long, Int, Double)].collect().toSet
    val scalar = Fixtures.multimodalFixture(docs)
      .as[(Long, Int, Double)].collect().toSet
    assert(dist === scalar)
  }

  test("artifact writes are gated off outside Verify") {
    assert(!Fixtures.enabled)
  }

  // ——— FP sign-boundary margins for the artifact-backed oracles ———
  // q42/q48's DuckDB twins recompute dot products with their own
  // summation order; a ⟨v,h⟩ exactly at 0 (signature bit) or a
  // near-tie in the centroid argmin could flip between engines. These
  // tests pin, for the SHIPPED test data, that every sign/argmin
  // decision clears reorder-error by orders of magnitude (double
  // reorder error over 64 terms is ~1e-13; we demand 1e-9).

  private def embRows = {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    e.sortBy(_._1)
  }

  test("q42: every hyperplane dot product clears the sign boundary") {
    val planes = graft.ext.Similarity.hyperplaneRows(4 * 8)
      .map { case (p, comps) => p -> comps.toArray }
    var minAbs = Double.MaxValue
    embRows.foreach { case (_, v) =>
      planes.foreach { case (_, h) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * h(i); i += 1 }
        minAbs = math.min(minAbs, math.abs(s))
      }
    }
    info(f"min |<v,h>| over all (vector, plane) pairs: $minAbs%.3e")
    assert(minAbs > 1e-9, f"sign margin $minAbs%.3e too small — oracle bit could flip")
  }

  // (q87's oracle replays the SAME kmeansCentroids(8, 3) assignment
  // argmin over the same vectors, so this margin covers it too)
  test("q48: centroid argmin and probe cut clear their tie boundaries") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cents = graft.ext.Similarity.kmeansCentroids(e, kCells = 8, iters = 3)
      .map { case (c, comps) => c -> comps.map(_.toDouble).toArray }
    def score(v: Array[Double], c: Array[Double]): Double = {
      var dot = 0.0; var nc = 0.0; var i = 0
      while (i < v.length) { dot += v(i) * c(i); nc += c(i) * c(i); i += 1 }
      -2.0 * dot + nc // same argmin objective as the q48 oracle SQL
    }
    // assignment argmin: gap between best and second-best cell per vector
    var minGap = Double.MaxValue
    val rows = embRows
    rows.foreach { case (_, v) =>
      val ss = cents.map { case (_, c) => score(v, c) }.sorted
      minGap = math.min(minGap, ss(1) - ss(0))
    }
    info(f"min argmin gap over all vectors: $minGap%.3e")
    assert(minGap > 1e-9, f"argmin gap $minGap%.3e too small — oracle cell could flip")
    // probe cut (LIMIT 3 on query-to-centroid distance): the 3rd/4th
    // nearest centroids to the query must be separated
    val q = rows.find(_._1 == 0L).get._2
    val d = cents.map { case (_, c) =>
      var s = 0.0; var i = 0
      while (i < q.length) { val t = c(i) - q(i); s += t * t; i += 1 }
      s
    }.sorted
    info(f"probe cut gap (4th - 3rd nearest): ${d(3) - d(2)}%.3e")
    assert(d(3) - d(2) > 1e-9, "probe boundary tie — oracle probe set could differ")
  }
}
