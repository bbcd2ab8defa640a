package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must reproduce the classic in-memory
  * algorithm exactly: same merge sequence, same segmentation.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train matches the reference merge sequence on a crafted corpus") {
    // classic BPE example shape: "low lower lowest newest widest"
    val text = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val words = text.split(" ").groupBy(identity)
      .map { case (w, a) => w -> a.length.toLong }
    val want = BpeReference.train(words, 8)
    val got = Bpe.train(docs, 8)
    assert(got === want)
    // "es" then "est" (9 weighted occurrences) must dominate early
    assert(got.take(2) === Seq(("e", "s"), ("es", "t")))
  }

  test("train matches the reference on real documents; segmentation agrees") {
    val docs = Tables.load(spark, sf001, "documents").limit(50)
    val words = docs
      .select(explode(TextStats.tokens($"text")).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val want = BpeReference.train(words, 10)
    val got = Bpe.train(docs, 10)
    assert(got === want)
    // segmentation with the trained merges reproduces the distributed
    // vocab's final symbol state
    val finalVocab = {
      var v = Bpe.initVocab(docs)
      got.foreach { case (p1, p2) =>
        v = v.withColumn("syms", Bpe.mergeColumn(p1, p2))
      }
      v.select($"w", $"syms").as[(String, Seq[String])].collect().toMap
    }
    finalVocab.foreach { case (w, syms) =>
      assert(Bpe.segment(w, got) === syms, s"word '$w'")
    }
  }

  test("tokenizeBpe: corpus inference agrees with driver-side segmentation") {
    val docs = Tables.load(spark, sf001, "documents").limit(30)
    val merges = Bpe.train(docs, 12)
    assert(merges.length === 12)
    val out = Bpe.tokenizeBpe(docs, merges)
      .orderBy("doc_id", "pos", "spos").collect()
    // reassemble each (doc, word position)'s subwords; they must equal
    // segment(word) and concatenate back to the word itself
    val byWordPos = out.groupBy(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos")))
    val words = docs.select($"doc_id",
        posexplode(TextStats.tokens($"text")).as(Seq("pos", "w")))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos")) -> r.getAs[String]("w"))
      .toMap
    assert(byWordPos.keySet === words.keySet)
    byWordPos.foreach { case (key, rows) =>
      val subs = rows.sortBy(_.getAs[Int]("spos")).map(_.getAs[String]("subword")).toSeq
      assert(subs === Bpe.segment(words(key), merges), s"at $key")
      assert(subs.mkString === words(key))
    }
    // merges actually compress: fewer subwords than characters overall
    val nSubwords = out.length
    val nChars = words.values.map(_.length).sum
    assert(nSubwords < nChars)
  }

  test("train stops early when every word is a single symbol") {
    val docs = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, 10)
    assert(merges === Seq(("a", "b"))) // one merge, then no pairs remain
  }
}
