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
      Bpe.train(docs, nMerges) == referenceTrain(wordCounts, nMerges)
    }

  /** Plain-Scala BPE reference (same tie-break as the trainer). */
  private def referenceTrain(words: Map[String, Long],
                             nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] =
      words.filter(_._1.nonEmpty).map { case (w, c) => w.map(_.toString) -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (p1, p2) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((p1, p2))
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (out.nonEmpty && out.last == p1 && x == p2) {
              out.remove(out.length - 1); out += (p1 + p2)
            } else out += x
          }
          out.toSeq -> c
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    merges.toSeq
  }
}
