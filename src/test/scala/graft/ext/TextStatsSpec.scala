package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token and stopword counting") {
    val df = Seq("The quick fox and the lazy dog").toDF("text")
    val r = df.select(
      TextStats.tokenCount($"text").as("n"),
      TextStats.stopwordCount($"text").as("stop"),
      TextStats.punctCount($"text").as("punct")).head()
    assert(r.getAs[Long]("n") === 7)
    assert(r.getAs[Long]("stop") === 3) // the, and, the
    assert(r.getAs[Long]("punct") === 0)
  }

  test("subword count approximates a BPE pre-tokenizer's view") {
    val df = Seq("don't stop-me now!").toDF("text")
    val n = df.select(TextStats.subwordCount($"text").as("n")).head().getLong(0)
    // don | ' | t | stop | - | me | now | ! → 8 pieces
    assert(n === 8)
  }

  test("fingerprint is whitespace/case-normalized") {
    val df = Seq(("A  B\tC", "a b c")).toDF("t1", "t2")
    val r = df.select(
      (TextStats.fingerprint($"t1") === TextStats.fingerprint($"t2")).as("eq")).head()
    assert(r.getAs[Boolean]("eq"))
  }

  test("langId picks the language whose markers dominate") {
    val df = Seq(
      ("en", "the cat and the dog is walking of course"),
      ("de", "der hund und die katze ist schnell"),
      ("zh", "这是一个的测试我有"),
      ("es", "el perro y la casa es de madera")
    ).toDF("expected", "text")
    val got = df.select($"expected", TextStats.langId($"text").as("got"))
      .as[(String, String)].collect()
    got.foreach { case (exp, pred) => assert(pred === exp, s"expected $exp got $pred") }
  }

  test("unigram logprob: common-token docs score above rare-token docs") {
    val docs = Seq(
      (0L, "the the the the"),          // most frequent token
      (1L, "rare1 rare2 rare3 rare4")   // singletons
    ).toDF("doc_id", "text")
    val m = TextStats.unigramLogProb(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob"))).toMap
    assert(m(0L)._1 === 4L && m(1L)._1 === 4L)
    assert(m(0L)._2 > m(1L)._2)  // ln(4/8) > ln(1/8)
    assert(m(0L)._2 === math.round(math.log(0.5) * 1e6) / 1e6)
  }

  test("gopher rules: clean prose passes, each degenerate shape fails its gate") {
    val longProse = ("the quick brown fox jumps over a lazy dog and " +
      "that sentence repeats with more plain words to have length ") * 5
    val docs = Seq(
      (0L, longProse),                                       // passes all
      (1L, "too short to count"),                            // n_words
      (2L, Seq.fill(60)("- bullet line").mkString("\n")),    // bullets
      (3L, (("#### " * 20) + longProse)),                    // symbols
      (4L, Seq.fill(60)("1 2 3 4 5 6 7 8 9 10").mkString(" ")) // no alpha
    ).toDF("doc_id", "text")
    val out = TextStats.gopherQuality(docs).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("pass")).toSeq ===
      Seq(true, false, false, false, false))
    val bulletDoc = out(2)
    assert(bulletDoc.getAs[Double]("bullet_line_frac") === 1.0)
    assert(out(4).getAs[Double]("alpha_word_frac") === 0.0)
  }

  test("quality score is bounded [0,1] and penalizes junk") {
    val df = Seq(
      ("good", "this is a perfectly reasonable sentence with enough words to score well and a few more tokens for length"),
      ("junk", "!!! ??? ... ,,, ;;; :::")
    ).toDF("kind", "text")
    val m = df.select($"kind", TextStats.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(m("good") > m("junk"))
  }
}
