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
}
