package graft.engine

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized equivalence laws for the distributed exact-rank
  * machinery: for ANY frame (heavy ties, singletons, short frames),
  * any bucket count, either direction, `Ranks` must be bit-identical
  * to the partition-less Window forms it replaces. Few samples (each
  * case runs Spark jobs), wide input space.
  */
object RanksProps extends Properties("ranks") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // tiny value domain → real tie blocks; ids unique by construction
  private val frame: Gen[Seq[(Long, Long)]] =
    Gen.choose(1, 80).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0L, 9L)).map(_.zipWithIndex
        .map { case (v, i) => (i.toLong, v) })
    }

  property("ntileExact == ntile(n) OVER (ORDER BY v [DESC], id)") =
    forAll(frame, Gen.choose(1, 12), Gen.oneOf(true, false)) { (rows, n, desc) =>
      val df = rows.toDF("id", "v")
      val exact = Ranks.ntileExact(df, n, "v", "id", valueDesc = desc)
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      val ord = if (desc) Window.orderBy(col("v").desc, col("id"))
        else Window.orderBy(col("v"), col("id"))
      val naive = df.withColumn("bucket", ntile(n).over(ord).cast("long"))
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      exact == naive
    }

  property("rowNumberExact == row_number() and nearestRank == rank pick") =
    forAll(frame) { rows =>
      val df = rows.toDF("id", "v")
      val exact = Ranks.rowNumberExact(df, "v", "id")
        .select("id", "_rn").as[(Long, Long)].collect().toMap
      val naive = df.withColumn("_rn",
          row_number().over(Window.orderBy("v", "id")).cast("long"))
        .select("id", "_rn").as[(Long, Long)].collect().toMap
      val sortedVals = rows.map(_._2).sorted
      val n = sortedVals.length
      val (p50, p90) = ((n + 1) / 2, (9 * n + 9) / 10)
      val got = Ranks.nearestRank(df, "v", Seq(
          "p50" -> (c => Ranks.idiv(c + lit(1L), lit(2L))),
          "p90" -> (c => Ranks.idiv(lit(9L) * c + lit(9L), lit(10L)))))
        .select("n_total", "p50", "p90").as[(Long, Long, Long)].head()
      exact == naive &&
        got == ((n.toLong, sortedVals(p50 - 1), sortedVals(p90 - 1)))
    }
}
