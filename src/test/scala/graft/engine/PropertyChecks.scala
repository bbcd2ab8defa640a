package graft.engine

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Property-based pins (SURVEY.md §5 item 4). Pure-function
  * properties run at full sample counts; Spark-backed properties use
  * few samples (each is a Spark job).
  */
object NamingProps extends Properties("naming") {

  property("cleanName is idempotent") = forAll(Gen.asciiPrintableStr) { s =>
    Naming.cleanName(Naming.cleanName(s)) == Naming.cleanName(s)
  }

  property("titleCase is idempotent") = forAll(Gen.alphaNumStr) { s =>
    Naming.titleCase(Naming.titleCase(s)) == Naming.titleCase(s)
  }

  property("cleanName output is a valid snake identifier") =
    forAll(Gen.asciiPrintableStr) { s =>
      val c = Naming.cleanName(s)
      c.isEmpty || c.matches("[a-z][a-z0-9_]*|x[0-9][a-z0-9_]*")
    }
}

object HorizonProps extends Properties("horizon") {

  private val series: Gen[Seq[Double]] =
    Gen.listOfN(11, Gen.choose(1.0, 1e6)).map(_.toSeq)

  property("CAGR compounding: (1+c10)^10 == (1+c1)^5 * (1+c2)^5") =
    forAll(series) { vals =>
      val v0 = vals(0); val v5 = vals(5); val v10 = vals(10)
      val c1 = math.pow(v5 / v0, 0.2) - 1
      val c2 = math.pow(v10 / v5, 0.2) - 1
      val c10 = math.pow(v10 / v0, 0.1) - 1
      val lhs = math.pow(1 + c10, 10)
      val rhs = math.pow(1 + c1, 5) * math.pow(1 + c2, 5)
      math.abs(lhs - rhs) <= 1e-9 * math.max(math.abs(lhs), 1.0)
    }

  property("horizon sums: 10-year = 1st + 2nd (disjoint ranges)") =
    forAll(series) { vals =>
      val s1 = vals.slice(1, 6).sum
      val s2 = vals.slice(6, 11).sum
      val s10 = vals.slice(1, 11).sum
      math.abs(s10 - (s1 + s2)) <= 1e-6
    }
}

/** Spark-backed: unpivot∘pivot identity over generated wide tables. */
object ReshapeProps extends Properties("reshape") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private val wideGen: Gen[(Seq[String], Seq[Seq[Double]])] = for {
    nYears <- Gen.choose(2, 6)
    years = (2024 until 2024 + nYears).map(_.toString)
    nRows <- Gen.choose(1, 8)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nYears, Gen.choose(-1e6, 1e6)))
  } yield (years, rows.map(_.toSeq).toSeq)

  property("pivotExplicit(unpivotByPrefix(df)) == df") = forAll(wideGen) {
    case (years, rows) =>
      val spark = SparkSpec.spark
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(StructField("id", StringType) +:
        years.map(y => StructField(y, DoubleType)))
      val data = rows.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(s"row$i" +: r)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2), schema)
      val back = Reshape.pivotExplicit(
        Reshape.unpivotByPrefix(df, "2"), Seq("id"), "year", years)
      val orig = df.orderBy("id").collect().map(_.toSeq).toSeq
      val got = back.orderBy("id").collect().map(_.toSeq).toSeq
      Prop(got == orig) :| s"got $got want $orig"
  }
}
