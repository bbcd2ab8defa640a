package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class OrcSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("orc_spec").toString

  test("corpus round-trip: content-identical through ORC") {
    val docs = Tables.load(spark, sf001, "documents")
    val path = tmp()
    Orc.write(docs, path)
    val back = Orc.read(spark, path)
    assert(back.schema === docs.schema)
    val a = docs.orderBy("doc_id").collect()
    val b = back.orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("partitioned layout prunes partitions; filters push into ORC") {
    val docs = Tables.load(spark, sf001, "documents")
    val path = tmp()
    Orc.write(docs, path, partitionBy = Seq("lang"))
    val q = Orc.read(spark, path)
      .filter(col("lang") === "en" && col("doc_id") < 100)
      .select("doc_id", "n_chars")
    val plan = q.queryExecution.executedPlan.toString
    // partition filter on lang + data filter pushed to the ORC reader
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      plan)
    assert(plan.contains("PartitionFilters"), plan)
    // and only the pruned column set is read
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), plan)
    // correctness of the pruned read
    val expect = docs.filter(col("lang") === "en" && col("doc_id") < 100).count()
    assert(q.count() === expect)
  }
}
