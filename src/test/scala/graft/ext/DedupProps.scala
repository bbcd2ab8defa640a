package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Randomized algebraic laws for the dedup audit operators. */
object DedupProps extends Properties("dedup") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val pair: Gen[(Long, Long)] = for {
    a <- Gen.choose(0L, 8L)
    b <- Gen.choose(0L, 8L)
    if a != b
  } yield (a, b)
  private val pairSet: Gen[List[(Long, Long)]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, pair))

  property("pairSetAgreement: swap symmetry, self-agreement, and " +
    "inclusion-exclusion over random pair sets") =
    forAll(pairSet, pairSet) { (pa, pb) =>
      val a = pa.toDF("id_a", "id_b")
      val b = pb.toDF("id_a", "id_b")
      val ab = Dedup.pairSetAgreement(a, b, "x", "y").head()
      val ba = Dedup.pairSetAgreement(b, a, "y", "x").head()
      def g(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
      val swapped = g(ab, "n_a") == g(ba, "n_b") &&
        g(ab, "n_b") == g(ba, "n_a") &&
        g(ab, "n_both") == g(ba, "n_both") &&
        g(ab, "n_a_only") == g(ba, "n_b_only")
      // inclusion-exclusion: union = a + b − both, and the reference
      // normalized-set sizes match the in-memory computation
      def norm(ps: List[(Long, Long)]) =
        ps.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
      val (na, nb) = (norm(pa), norm(pb))
      val exact = g(ab, "n_a") == na.size && g(ab, "n_b") == nb.size &&
        g(ab, "n_both") == na.intersect(nb).size
      // self-agreement is perfect whenever the set is non-empty
      val self = Dedup.pairSetAgreement(a, a, "x", "x").head()
      val selfOk =
        if (na.isEmpty) self.isNullAt(self.fieldIndex("pair_jaccard"))
        else self.getAs[Double]("pair_jaccard") == 1.0 &&
          g(self, "n_a_only") == 0L
      swapped && exact && selfOk
    }
}
