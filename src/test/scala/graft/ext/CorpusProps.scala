package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Spark-backed randomized laws for the round-6 corpus operators —
  * few samples (each is a set of Spark jobs), wide input space.
  */
object CorpusProps extends Properties("corpus") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // small alphabet → hash collisions and repeated tokens actually occur
  private val token: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val doc: Gen[String] =
    Gen.choose(20, 80).flatMap(n => Gen.listOfN(n, token).map(_.mkString(" ")))

  property("cdcChunks reassembles losslessly and survives prefix insertion") =
    forAll(doc, Gen.choose(1, 5)) { (text, prefixLen) =>
      val prefix = (1 to prefixLen).map(i => s"zzz$i").mkString(" ")
      val docs = Seq((0L, text), (1L, s"$prefix $text")).toDF("doc_id", "text")
      val chunks = Corpus.cdcChunks(docs, w = 3, divisor = 8).collect()
      val c0 = chunks.filter(_.getLong(0) == 0L).sortBy(_.getAs[Long]("chunk_id"))
      // lossless reassembly in chunk order
      val reassembled = c0.map(_.getAs[String]("chunk_text")).mkString(" ")
      val tokens = text.toLowerCase.split("\\s+").mkString(" ")
      val lossless = reassembled == tokens
      // shift robustness: chunks after the first boundary survive the
      // prefix (when the doc has more than one chunk at all)
      val h0 = c0.map(_.getAs[String]("chunk_hash")).toSet
      val h1 = chunks.filter(_.getLong(0) == 1L).map(_.getAs[String]("chunk_hash")).toSet
      val survives = h0.size <= 1 || h0.intersect(h1).size >= h0.size - 1
      lossless && survives
    }

  property("bpe train equals the in-memory reference on random corpora") =
    forAll(Gen.choose(0L, 1000000L), Gen.choose(2, 6)) { (seed, nMerges) =>
      val rnd = new scala.util.Random(seed)
      val words = (1 to 30).map(_ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val text = words.mkString(" ")
      val docs = Seq((0L, text)).toDF("doc_id", "text")
      val wordCounts = text.split(" ").groupBy(identity)
        .map { case (w, a) => w -> a.length.toLong }
      Bpe.train(docs, nMerges) == BpeReference.train(wordCounts, nMerges)
    }

  property("budgetWaterfill equals the in-memory water level on random masses") =
    forAll(Gen.choose(0L, 1000000L), Gen.choose(2, 8),
        Gen.choose(0.05, 1.0)) { (seed, nSrc, frac) =>
      val rnd = new scala.util.Random(seed)
      // random per-source masses realized as docs of w-token texts
      val masses = (0 until nSrc).map(i => s"s$i" -> (1 + rnd.nextInt(40)))
      val docs = masses.zipWithIndex.map { case ((src, m), i) =>
        (i.toLong, src, Seq.fill(m)("w").mkString(" ")) }
        .toDF("doc_id", "source", "text")
      val out = Corpus.budgetWaterfill(docs, frac).collect()
        .map(r => r.getString(0) -> r).toMap
      // in-memory reference: same integer pivot arithmetic
      val t = masses.toMap.map { case (k, v) => k -> v.toLong }
      val total = t.values.sum
      val b = math.floor(total.toDouble * frac).toLong
      val sorted = t.toSeq.sortBy { case (k, v) => (v, k) }
      val n = sorted.size.toLong
      var cum = 0L; var prk = 0L; var pcum = 0L
      sorted.zipWithIndex.foreach { case ((_, v), i) =>
        cum += v
        if (cum + (n - (i + 1)) * v <= b) { prk = i + 1; pcum = cum }
      }
      val cap: Option[Long] =
        if (prk == 0L) Some(b / n)
        else if (prk == n) None
        else Some((b - pcum) / (n - prk))
      val allocOk = t.forall { case (k, v) =>
        out(k).getAs[Long]("allocation") == math.min(v, cap.getOrElse(v)) }
      // conservation: never exceed the budget; full budget ⇒ no trim
      val spent = out.values.map(_.getAs[Long]("allocation")).sum
      allocOk && spent <= b && (cap.nonEmpty || spent == total)
    }

  property("domainFrequencyCap is partitioning-invariant and conserves") =
    forAll(Gen.choose(0L, 1000000L), Gen.choose(1, 6)) { (seed, cap) =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 40).map(i =>
        (i.toLong, s"d${rnd.nextInt(4)}",
          Seq.fill(1 + rnd.nextInt(6))("w").mkString(" ")))
      val d1 = rows.toDF("doc_id", "source", "text")
      val d2 = rows.toDF("doc_id", "source", "text").repartition(7)
      val a = Corpus.domainFrequencyCap(d1, cap, "s").collect().map(_.toSeq)
      val b = Corpus.domainFrequencyCap(d2, cap, "s").collect().map(_.toSeq)
      val invariant = a.toSeq == b.toSeq
      val conserves = Corpus.domainFrequencyCap(d1, cap, "s").collect()
        .forall { r => r.getAs[Long]("n_kept") ==
          math.min(r.getAs[Long]("n_docs"), cap.toLong) }
      invariant && conserves
    }

}
