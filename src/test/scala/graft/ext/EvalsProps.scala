package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Spark-backed randomized laws for the eval-suite operators — few
  * samples (each is a set of Spark jobs), wide input space.
  */
object EvalsProps extends Properties("evals") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // one task with n samples, c of them correct
  private val taskGen: Gen[(Int, Int)] = for {
    n <- Gen.choose(1, 12)
    c <- Gen.choose(0, n)
  } yield (n, c)

  property("passAtK: pass@1 = c/n exactly, monotone in k, bounded in " +
    "[0,1], and degenerate at c=0 / c=n") =
    forAll(taskGen) { case (n, c) =>
      val df = (0 until n).map(i => (0L, i < c)).toDF("task_id", "correct")
      val r = Evals.passAtK(df, "task_id", "correct",
        ks = Seq(1, 2, 4, 8)).head()
      val ps = Seq(3, 4, 5, 6).zip(Seq(1, 2, 4, 8)).flatMap {
        case (idx, k) => if (r.isNullAt(idx)) None
        else Some(k -> r.getDouble(idx))
      }
      val nullRight = Seq(1, 2, 4, 8).forall(k =>
        (k <= n) == ps.exists(_._1 == k))
      val p1Exact = math.abs(ps.head._2 -
        math.rint(c.toDouble / n * 1e6) / 1e6) < 1e-9
      val monotone = ps.map(_._2).sliding(2)
        .forall(s => s.length < 2 || s(0) <= s(1))
      val bounded = ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 }
      val degenerate = (c != 0 || ps.forall(_._2 == 0.0)) &&
        (c != n || ps.forall(_._2 == 1.0))
      nullRight && p1Exact && monotone && bounded && degenerate
    }

  private val rosterGen: Gen[List[Long]] =
    Gen.choose(2, 8).flatMap(k =>
      Gen.listOfN(k, Gen.choose(0L, 50L)))

  property("bonCurve: e_max_1 = mean, curve nondecreasing in n, capped " +
    "by the max, and e_max_k = max when n reaches the roster size") =
    forAll(rosterGen) { rewards =>
      val k = rewards.size
      val df = rewards.zipWithIndex
        .map { case (r, i) => (0L, i.toLong, r) }
        .toDF("prompt_id", "doc_id", "reward")
      val ns = Seq(1, 2, 4).filter(_ <= k) :+ k
      val row = Evals.bonCurve(df, "prompt_id", "doc_id", "reward",
        ns = ns.distinct).head()
      val es = (0 until ns.distinct.size).map(i => row.getDouble(3 + i))
      val mean = math.rint(rewards.sum.toDouble / k * 1e6) / 1e6
      val emax = rewards.max.toDouble
      math.abs(es.head - mean) < 1e-9 &&
        es.sliding(2).forall(s => s.length < 2 || s(0) <= s(1) + 1e-9) &&
        es.forall(_ <= emax + 1e-9) &&
        math.abs(es.last - emax) < 1e-9
    }

  property("grpoAdvantages: zero-sum per prompt and invariant under " +
    "positive affine reward transforms") =
    forAll(rosterGen, Gen.choose(1L, 5L), Gen.choose(-20L, 20L)) {
      (rewards, a, b) =>
        val base = rewards.zipWithIndex
          .map { case (r, i) => (0L, i.toLong, r) }
          .toDF("prompt_id", "doc_id", "reward")
        val shifted = rewards.zipWithIndex
          .map { case (r, i) => (0L, i.toLong, a * r + b) }
          .toDF("prompt_id", "doc_id", "reward")
        def advs(df: org.apache.spark.sql.DataFrame): Seq[Option[Double]] =
          Evals.grpoAdvantages(df, "prompt_id", "doc_id", "reward")
            .collect().toSeq
            .map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
        val x = advs(base)
        val y = advs(shifted)
        val zeroSum = x.flatten.isEmpty || math.abs(x.flatten.sum) < 1e-4
        // identical NULL pattern and near-identical values (the two
        // runs round AFTER their own single division, so allow an ulp
        // of slack at the 1e-6 grid)
        val invariant = x.size == y.size && x.zip(y).forall {
          case (None, None) => true
          case (Some(u), Some(v)) => math.abs(u - v) <= 1e-6 + 1e-9
          case _ => false
        }
        zeroSum && invariant
    }
}
