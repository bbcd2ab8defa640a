package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Spark-backed randomized laws for the r15 reliability/significance
  * additions — the EvalSuiteProps discipline: each DISTRIBUTED
  * operator is checked against an INDEPENDENT single-threaded Scala
  * reference of the published formula. References hold every
  * intermediate in exact integer arithmetic (mirroring the operators'
  * DECIMAL(38,0) discipline) so the final comparison is equality
  * after one HALF_UP round, not a tolerance band — except ordinal α,
  * whose 1e-6 per-unit quantization is compared at 2e-6.
  */
object ReliabilityProps extends Properties("r15_reliability") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def release(): Unit = graft.engine.TrackedCache.release()

  // complete n×k integer-score panels (units 0..n-1, raters 0..k-1)
  private val panelGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(2, 8)
    k <- Gen.choose(2, 4)
    xs <- Gen.listOfN(n * k, Gen.choose(0L, 9L))
  } yield (for (i <- 0 until n; j <- 0 until k)
    yield (i.toLong, j.toLong, xs(i * k + j))).toSeq

  // ——— weighted Cohen's κ vs the exact-integer formula ———

  private def wkRef(rows: Seq[(Long, Long)]): (Option[Double], Option[Double]) = {
    val n = rows.size.toLong
    val ra = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val rb = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    def kap(w: (Long, Long) => Long): Option[Double] = {
      val swo = rows.map { case (i, j) => w(i, j) }.sum
      val swe = (for ((i, ni) <- ra.toSeq; (j, nj) <- rb.toSeq)
        yield ni * nj * w(i, j)).sum
      if (swe == 0L) None
      else Some(r6((swe - n * swo).toDouble / swe))
    }
    (kap((i, j) => math.abs(i - j)),
      kap((i, j) => (i - j) * (i - j)))
  }

  private val pairsGen: Gen[Seq[(Long, Long)]] =
    Gen.choose(2, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 4L))))

  property("weightedKappa: linear and quadratic equal the integer " +
    "formula on random ordinal panels") =
    forAll(pairsGen) { rows =>
      val out = TextStats.weightedKappa(rows.toDF("a", "b"), "a", "b")
        .collect().head
      release()
      val (refL, refQ) = wkRef(rows)
      def get(c: String): Option[Double] =
        if (out.isNullAt(out.fieldIndex(c))) None
        else Some(out.getAs[Double](c))
      get("kappa_linear") == refL && get("kappa_quadratic") == refQ
    }

  // ——— Cronbach's α vs the exact-integer variance forms ———

  private def cronbachRef(rows: Seq[(Long, Long, Long)]): Option[Double] = {
    val n = rows.map(_._1).distinct.size.toLong
    val k = rows.map(_._2).distinct.size.toLong
    val sA = rows.groupBy(_._2).values.map { g =>
      val sx = g.map(_._3).sum
      val sxx = g.map(r => r._3 * r._3).sum
      g.size.toLong * sxx - sx * sx
    }.sum
    val totals = rows.groupBy(_._1).values.map(_.map(_._3).sum).toSeq
    val b = n * totals.map(t => t * t).sum - {
      val st = totals.sum; st * st
    }
    if (k < 2 || b == 0L) None
    else Some(r6((k * (b - sA)).toDouble / ((k - 1) * b).toDouble))
  }

  property("cronbachAlpha: equals the integer variance-form formula " +
    "on random complete panels") =
    forAll(panelGen) { rows =>
      val out = TextStats.cronbachAlpha(rows.toDF("u", "j", "x"),
        "u", "j", "x").collect().head
      release()
      val ref = cronbachRef(rows)
      val got = if (out.isNullAt(out.fieldIndex("alpha"))) None
        else Some(out.getAs[Double]("alpha"))
      got == ref
    }

  // ——— ICC(2,1) vs the exact-integer ANOVA collapse ———

  private def iccRef(rows: Seq[(Long, Long, Long)]): Option[Double] = {
    val n = rows.map(_._1).distinct.size.toLong
    val k = rows.map(_._2).distinct.size.toLong
    val bigN = n * k
    val s = rows.map(_._3).sum
    val sxx = rows.map(r => r._3 * r._3).sum
    val stt = rows.groupBy(_._1).values
      .map(g => { val t = g.map(_._3).sum; t * t }).sum
    val sgg = rows.groupBy(_._2).values
      .map(g => { val t = g.map(_._3).sum; t * t }).sum
    val t = bigN * sxx - s * s
    val r = n * stt - s * s
    val c = k * sgg - s * s
    val e = t - r - c
    val num = n * (r * (k - 1) - e)
    val den = n * r * (k - 1) + n * (k - 1) * e + k * (c * (n - 1) - e)
    if (n < 2 || k < 2 || den == 0L) None
    else Some(r6(num.toDouble / den.toDouble))
  }

  property("icc21: equals the integer two-way-ANOVA collapse on " +
    "random complete panels") =
    forAll(panelGen) { rows =>
      val out = TextStats.icc21(rows.toDF("u", "j", "x"),
        "u", "j", "x").collect().head
      release()
      val ref = iccRef(rows)
      val got = if (out.isNullAt(out.fieldIndex("icc"))) None
        else Some(out.getAs[Double]("icc"))
      got == ref
    }

  // ——— ordinal Krippendorff's α vs the brute pairwise φ metric ———

  private def ordAlphaRef(rows: Seq[(Long, Long)]): Option[Double] = {
    val byU = rows.zipWithIndex.map { case ((u, c), i) => (u, c, i) }
      .groupBy(_._1).filter(_._2.size >= 2)
    val pairable = byU.values.flatten.map(_._2).toSeq
    val nTot = pairable.size
    if (nTot < 2) return None
    val marg = pairable.groupBy(identity)
      .map { case (c, v) => c -> v.size.toLong }
    val cats = marg.keys.toSeq.sorted
    val cum = cats.scanLeft(0L)((a, c) => a + marg(c)).tail
    val phi = cats.zip(cum)
      .map { case (c, nc) => c -> (nc - marg(c) / 2.0) }.toMap
    val dO = byU.values.map { rs =>
      val xs = rs.map(r => phi(r._2)).toSeq
      val ss = (for (i <- xs.indices; j <- xs.indices if i != j)
        yield { val d = xs(i) - xs(j); d * d }).sum
      ss / (xs.size - 1).toDouble
    }.sum / nTot
    val all = pairable.map(phi)
    val dE = (for (i <- all.indices; j <- all.indices if i != j)
      yield { val d = all(i) - all(j); d * d }).sum /
      (nTot.toDouble * (nTot - 1))
    if (dE == 0.0) None else Some(1.0 - dO / dE)
  }

  private val ordGen: Gen[Seq[(Long, Long)]] =
    Gen.choose(4, 24).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 4L))))

  property("krippendorffAlphaOrdinal: within quantization of the " +
    "brute pairwise reference on random sparse panels") =
    forAll(ordGen) { rows =>
      val out = TextStats.krippendorffAlphaOrdinal(
        rows.toDF("u", "c"), "u", "c", "t").collect().head
      release()
      val ref = ordAlphaRef(rows)
      val got = if (out.isNullAt(out.fieldIndex("alpha"))) None
        else Some(out.getAs[Double]("alpha"))
      (got, ref) match {
        case (Some(g), Some(r)) => math.abs(g - r) < 2e-6
        case (a, b) => a == b
      }
    }

  // ——— McNemar + Cochran's Q vs integer formulas, and Q(k=2) ———

  private val outcomesGen: Gen[Seq[(Boolean, Boolean)]] =
    Gen.choose(2, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))))

  property("mcNemar: chi2 equals the discordant-count formula and " +
    "Cochran's Q on the same panel in long form") =
    forAll(outcomesGen) { pairs =>
      val df = pairs.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, a, b) }.toDF("t", "a", "b")
      val out = Evals.mcNemar(df, "t", "a", "b").collect().head
      val ao = pairs.count { case (a, b) => a && !b }.toLong
      val bo = pairs.count { case (a, b) => !a && b }.toLong
      val disc = ao + bo
      val refChi = if (disc == 0L) None
        else Some(r6(((ao - bo) * (ao - bo)).toDouble / disc))
      val gotChi = if (out.isNullAt(out.fieldIndex("chi2"))) None
        else Some(out.getAs[Double]("chi2"))
      val longRows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
        Seq((i.toLong, 0L, a), (i.toLong, 1L, b)) }
      val q = Evals.cochranQ(longRows.toDF("t", "s", "c"),
        "t", "s", "c").collect().head
      release()
      val gotQ = if (q.isNullAt(q.fieldIndex("q"))) None
        else Some(q.getAs[Double]("q"))
      gotChi == refChi && gotQ == refChi
    }
}
