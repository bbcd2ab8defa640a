package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Spark-backed randomized laws for the r14 eval-suite additions.
  * Each property checks the DISTRIBUTED operator against an
  * INDEPENDENT single-threaded Scala reference implementation of the
  * published formula (the strongest spec form available when a law
  * alone under-constrains the arithmetic). Rounding mirrors the
  * operators exactly: BigDecimal HALF_UP, never math.rint
  * (HALF_EVEN) — Spark's round() is HALF_UP.
  */
object EvalSuiteProps extends Properties("r14_eval_suite") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def q9(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  // ——— WER vs an independent textbook Levenshtein DP ———

  private def levRef(a: Seq[String], b: Seq[String]): Long = {
    var prev = (0 to b.length).map(_.toLong).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Long](b.length + 1)
      cur(0) = i.toLong
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  private val tokSeq: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd")))

  property("wer: the prefix-min DP equals the textbook row DP on " +
    "random token pairs") =
    forAll(tokSeq, tokSeq) { (ca, ra) =>
      val df = Seq((0L, ca.mkString(" "), ra.mkString(" ")))
        .toDF("pair_id", "cand_text", "ref_text")
      val out = TextStats.wer(df).head()
      out.getAs[Long]("edits") == levRef(ca, ra) &&
        out.getAs[Double]("wer") ==
          r6(levRef(ca, ra).toDouble / ra.length)
    }

  // ——— self-BLEU vs the brute k² multi-reference clip ———

  private def selfBleuRef(resps: Seq[Seq[String]]): (Double, Option[Double]) = {
    def grams(t: Seq[String], n: Int): Map[String, Long] =
      (if (n == 1) t
       else if (t.size < 2) Seq.empty[String] // sliding(2) on a
       else t.sliding(2).map(_.mkString(" ")).toSeq) // 1-seq yields it
        .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    def qn(n: Int): Seq[Option[Long]] = resps.indices.map { i =>
      val total = if (n == 1) resps(i).size else resps(i).size - 1
      if (total <= 0) None
      else {
        val mine = grams(resps(i), n)
        val clip = mine.map { case (g, c) =>
          val refMax = resps.indices.filter(_ != i)
            .map(j => grams(resps(j), n).getOrElse(g, 0L))
            .foldLeft(0L)(math.max)
          math.min(c, refMax)
        }.sum
        Some(q9(1e9 * clip / total))
      }
    }
    val q1 = qn(1).map(_.get) // n=1 total ≥ 1 always
    val p1 = r6(q1.sum.toDouble / resps.size / 1e9)
    val q2 = qn(2).flatten
    val p2 = if (q2.isEmpty) None
      else Some(r6(q2.sum.toDouble / q2.size / 1e9))
    (p1, p2)
  }

  private val rosterGen: Gen[List[List[String]]] =
    Gen.choose(2, 5).flatMap(k => Gen.listOfN(k,
      Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c")))))

  property("selfBleu: the top-2 clip statistic equals the brute " +
    "k-squared max-over-others reference") =
    forAll(rosterGen) { roster =>
      val df = roster.zipWithIndex
        .map { case (t, i) => (0L, i.toLong, t.mkString(" ")) }
        .toDF("prompt_id", "resp_id", "text")
      val out = TextStats.selfBleu(df).head()
      graft.engine.TrackedCache.release()
      val (p1, p2) = selfBleuRef(roster)
      out.getAs[Double]("self_p1") == p1 &&
        Option(out.getAs[java.lang.Double]("self_p2"))
          .map(_.doubleValue) == p2
    }

  // ——— Dawid–Skene round vs a plain-Scala replay ———

  private def dsRef(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    val byItem = rows.groupBy(_._1)
    def majority(votes: Seq[Long]): Long = {
      val c = votes.groupBy(identity).map { case (l, o) => l -> o.size }
      val mx = c.values.max
      c.filter(_._2 == mx).keys.min
    }
    val maj = byItem.map { case (i, rs) => i -> majority(rs.map(_._3)) }
    val wt = rows.groupBy(_._2).map { case (a, rs) =>
      val h = rs.count(r => r._3 == maj(r._1))
      a -> q9(1e6 * h.toDouble / rs.size)
    }
    byItem.map { case (i, rs) =>
      val s = rs.groupBy(_._3).map { case (l, o) =>
        l -> o.map(r => wt(r._2)).sum }
      val mx = s.values.max
      i -> (maj(i), s.filter(_._2 == mx).keys.min)
    }
  }

  private val panelGen: Gen[List[(Long, Long, Long)]] = for {
    items <- Gen.choose(2, 6)
    annos <- Gen.choose(2, 5)
    labels <- Gen.listOfN(items * annos, Gen.choose(0L, 2L))
  } yield (for (i <- 0 until items; a <- 0 until annos)
    yield (i.toLong, a.toLong, labels(i * annos + a))).toList

  property("dawidSkeneRound: majority and weighted labels equal the " +
    "plain-Scala replay on random panels") =
    forAll(panelGen) { rows =>
      val df = rows.toDF("item_id", "annotator_id", "label")
      val out = Evals.dawidSkeneRound(df).collect()
        .map(r => r.getAs[Long]("item_id") ->
          (r.getAs[Long]("majority_label"),
            r.getAs[Long]("weighted_label"))).toMap
      graft.engine.TrackedCache.release()
      out == dsRef(rows)
    }

  // ——— Wilson leaderboard vs the mirrored scalar formula ———

  private def wilsonRef(w: Long, n: Long): (Double, Double) = {
    val nd = n.toDouble
    val p = w.toDouble / nd
    val center = p + 3.8416 / (2.0 * nd)
    val half = math.sqrt(3.8416) *
      math.sqrt(p * (1.0 - p) / nd + 3.8416 / (4.0 * nd * nd))
    val denom = 1.0 + 3.8416 / nd
    (r6((center - half) / denom), r6((center + half) / denom))
  }

  private val votesGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 3L); b <- Gen.choose(0L, 3L)
      if a != b
    } yield (a, b)))

  property("wilsonLeaderboard: intervals equal the mirrored scalar " +
    "formula, bounded in [0,1], containing the point estimate") =
    forAll(votesGen) { votes =>
      val df = votes.toDF("winner", "loser")
      val wins = votes.groupBy(_._1).map { case (m, v) => m -> v.size.toLong }
      val games = (votes.map(_._1) ++ votes.map(_._2))
        .groupBy(identity).map { case (m, v) => m -> v.size.toLong }
      Preference.wilsonLeaderboard(df).collect().forall { r =>
        val m = r.getAs[Long]("model_id")
        val (lo, hi) = wilsonRef(wins.getOrElse(m, 0L), games(m))
        r.getAs[Double]("wilson_lo") == lo &&
          r.getAs[Double]("wilson_hi") == hi &&
          lo >= 0.0 && hi <= 1.0 &&
          lo <= r.getAs[Double]("win_rate") &&
          r.getAs[Double]("win_rate") <= hi
      }
    }

  // ——— stratified win rate vs a plain-Scala replay ———

  private def swrRef(votes: Seq[(Long, Long, Long, Long)]): Map[Long, Double] = {
    def bucket(d: Long): Long =
      math.max(math.min(math.floor(d.toDouble / 10).toLong, 2L), -2L)
    val part = votes.flatMap { case (w, l, wl, ll) =>
      Seq((w, bucket(wl - ll), 1L), (l, bucket(ll - wl), 0L)) }
    part.groupBy(_._1).map { case (m, rs) =>
      val qs = rs.groupBy(_._2).map { case (_, sr) =>
        q9(1e9 * sr.map(_._3).sum.toDouble / sr.size) }.toSeq
      m -> r6(qs.sum.toDouble / qs.size / 1e9)
    }
  }

  private val lenVotesGen: Gen[List[(Long, Long, Long, Long)]] =
    Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 3L); b <- Gen.choose(0L, 3L)
      if a != b
      la <- Gen.choose(5L, 60L); lb <- Gen.choose(5L, 60L)
    } yield (a, b, la, lb)))

  property("stratifiedWinRate: adjusted rates equal the plain-Scala " +
    "stratified replay on random ledgers") =
    forAll(lenVotesGen) { votes =>
      val df = votes.toDF("winner", "loser", "winner_len", "loser_len")
      val out = Preference.stratifiedWinRate(df).collect()
        .map(r => r.getAs[Long]("model_id") ->
          r.getAs[Double]("adj_win_rate")).toMap
      out == swrRef(votes)
    }
}
