package graft.fixtures

import java.io.{File, PrintWriter}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.engine.{Ingest, Pipelines}

/** Deterministic LMO-shaped fixture inputs (FIXTURES.md): the four raw
  * tables the reference reads, with every semantic trap represented —
  * preamble rows, "x" NA token, trailing empty row/column, the
  * `Job Openings = Expansion + Replacement` invariant
  * (hoo_text.R:6), a description containing ": " (split-once), a NOC
  * missing from clusters (inner-join filter), and HOO columns whose
  * region parts align with the jo Geographic Area roster.
  */
object LmoFixtures {

  val fyod = 2024
  val years: Seq[Int] = fyod to fyod + 10
  val areas = Seq("British Columbia", "Cariboo", "Kootenay", "North", "South East")
  val industries = Seq("All industries", "Construction", "Health care")
  val nocs = Seq(
    "#T" -> "All occupations",
    "#00011" -> "Senior managers - public administration",
    "#10011" -> "Admin managers: finance",     // ": " in description!
    "#21234" -> "Software developers",
    "#31301" -> "Registered nurses",
    "#41200" -> "University professors")       // absent from clusters

  /** Realistic-cardinality roster (the production LMO export is
    * ~500 NOCs × ~60 industries × ~10 geographic areas): used by
    * `tools.LmoScale` to prove the pipelines at real size.
    */
  def scaledRoster(nNoc: Int, nInd: Int, nRegion: Int)
      : (Seq[(String, String)], Seq[String], Seq[String]) = {
    val bigNocs = ("#T" -> "All occupations") +:
      (0 until nNoc).map(i => f"#${10000 + i}%05d" -> s"Occupation $i")
    val bigInds = "All industries" +: (1 until nInd).map(i => s"Industry $i")
    val bigAreas = ("British Columbia" +:
      (1 until nRegion).map(i => s"Region $i")) ++ Seq("North", "South East")
    (bigNocs, bigInds, bigAreas)
  }

  private def round2(d: Double): Double = math.round(d * 100.0) / 100.0

  /** Stable pseudo-random in [0,1) from a key — no RNG state. */
  private def u(key: String): Double =
    (math.abs(scala.util.hashing.MurmurHash3.stringHash(key).toLong) % 100000L) / 100000.0

  private def series(key: String): Seq[Double] = {
    val base = 50.0 + 100.0 * u(key + "|base")
    val growth = 0.95 + 0.1 * u(key + "|growth")
    years.indices.map(i => round2(base * math.pow(growth, i)))
  }

  private def wideSchema: StructType = StructType(
    Seq("NOC", "Description", "Industry", "Variable", "Geographic Area")
      .map(StructField(_, StringType)) ++
      years.map(y => StructField(y.toString, DoubleType)))

  def employment(spark: SparkSession): DataFrame = {
    val rows = for {
      (noc, desc) <- nocs
      ind <- industries
      area <- areas
    } yield Row.fromSeq(Seq(noc, desc, ind, "Employment", area) ++
      series(s"emp|$noc|$ind|$area"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), wideSchema)
  }

  def jobOpenings(spark: SparkSession): DataFrame = {
    val rows = for {
      (noc, desc) <- nocs
      ind <- industries
      area <- areas
      exp = series(s"jo-exp|$noc|$ind|$area")
      rep = series(s"jo-rep|$noc|$ind|$area")
      (variable, vals) <- Seq(
        "Expansion Demand" -> exp,
        "Replacement Demand" -> rep,
        // invariant (hoo_text.R:6): JO = Expansion + Replacement
        "Job Openings" -> exp.zip(rep).map { case (a, b) => round2(a + b) })
    } yield Row.fromSeq(Seq(noc, desc, ind, variable, area) ++ vals)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), wideSchema)
  }

  val incomeCol = "2021 Census Median Employment Income (Employed)"

  /** The Excel-equivalent occupational-characteristics table: one
    * `Occ Group: HOO <area> 2024E` column per jo Geographic Area, and
    * a nullable income (the "x" NA token in the raw CSV).
    */
  def occChar(spark: SparkSession): DataFrame = {
    val hooColNames = areas.map(a => s"Occ Group: HOO $a ${fyod}E")
    val schema = StructType(
      Seq(StructField("NOC", StringType), StructField("Description", StringType)) ++
        hooColNames.map(StructField(_, StringType)) :+
        StructField(incomeCol, DoubleType))
    val rows = nocs.filterNot(_._1 == "#T").map { case (noc, desc) =>
      val flags = areas.map(a =>
        if (u(s"hoo|$noc|$a") < 0.5) "HOO" else s"Non-HOO")
      val income: Any =
        if (noc == "#31301") null else round2(40000 + 60000 * u(s"inc|$noc"))
      Row.fromSeq(Seq(noc, desc) ++ flags :+ income)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** clusters.csv: NOC cell is "<code>: <description>"; one NOC from
    * jo is deliberately absent (dropped by the inner join, :339).
    */
  def clusters(spark: SparkSession): DataFrame = {
    import spark.implicits._
    nocs.filterNot(n => n._1 == "#T" || n._1 == "#41200")
      .map { case (noc, desc) =>
        (s"${noc.stripPrefix("#")}: $desc",
          s"cluster_${(u(s"cl|$noc") * 5).toInt}")
      }.toDF("NOC", "new_cluster")
  }

  def inputs(spark: SparkSession): Pipelines.LmoInputs =
    Pipelines.LmoInputs(employment(spark), jobOpenings(spark),
      occChar(spark), clusters(spark))

  /** Distributed generation at realistic cardinality: dimension
    * frames cross-joined and valued by hash expressions — no
    * driver-side row lists, so the same code generates 100 TB.
    */
  def scaledInputs(spark: SparkSession, nNoc: Int, nInd: Int,
                   nRegion: Int): Pipelines.LmoInputs = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val yrs = LmoFixtures.years // `years` is shadowed by functions.years
    val (nocsR, inds, areasR) = scaledRoster(nNoc, nInd, nRegion)
    val nocDf = nocsR.toDF("NOC", "Description")
    val indDf = inds.toDF("Industry")
    val areaDf = areasR.toDF("Geographic Area")
    val base = nocDf.crossJoin(indDf).crossJoin(areaDf).repartition(32)

    def valCol(seed: String, i: Int) = round(
      pmod(xxhash64(concat_ws("|", col("NOC"), col("Industry"),
        col("Geographic Area"), lit(seed))), lit(10000L)).cast("double") / 100.0
        + i * 3.0 + 50.0, 2)

    val head = Seq(col("NOC"), col("Description"), col("Industry"),
      col("Variable"), col("Geographic Area"))
    val employmentDf = base.withColumn("Variable", lit("Employment"))
      .select(head ++ yrs.zipWithIndex.map { case (y, i) =>
        valCol("emp", i).as(y.toString) }: _*)
    def joVariant(variable: String, mk: Int => org.apache.spark.sql.Column) =
      base.withColumn("Variable", lit(variable))
        .select(head ++ yrs.zipWithIndex.map { case (y, i) =>
          mk(i).as(y.toString) }: _*)
    val ed = joVariant("Expansion Demand", i => valCol("ed", i))
    val rd = joVariant("Replacement Demand", i => valCol("rd", i))
    val joSum = joVariant("Job Openings",
      i => round(valCol("ed", i) + valCol("rd", i), 2))
    val joDf = ed.unionByName(rd).unionByName(joSum)

    val hooCols = areasR.map(a => s"Occ Group: HOO $a ${fyod}E")
    val occ0 = nocDf.filter(col("NOC") =!= "#T")
    val occDf = hooCols.zip(areasR).foldLeft(occ0) { case (df, (c, a)) =>
      df.withColumn(c, when(pmod(xxhash64(col("NOC"), lit(a)), lit(2L)) === 0,
        lit("HOO")).otherwise(lit("Non-HOO")))
    }.withColumn(incomeCol,
      round(pmod(xxhash64(col("NOC"), lit("inc")), lit(60000L)).cast("double") + 40000.0, 2))

    val clustersDf = nocDf.filter(col("NOC") =!= "#T")
      .select(concat(regexp_replace(col("NOC"), "#", ""), lit(": "),
        col("Description")).as("NOC"),
        concat(lit("cluster_"), pmod(xxhash64(col("NOC")), lit(5L))).as("new_cluster"))

    Pipelines.LmoInputs(employmentDf, joDf, occDf, clustersDf)
  }

  // ——— raw CSV form (exercises the full ingest path S1-S4) ———

  private def csvEscape(v: Any): String = v match {
    case null => ""
    case s: String if s.contains(",") || s.contains("\"") =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  private def writeCsv(df: DataFrame, file: File, preamble: Seq[String],
                       naToken: Option[String], trailingJunk: Boolean): Unit = {
    val w = new PrintWriter(file, "UTF-8")
    preamble.foreach(w.println)
    val cols = df.columns
    val header = cols.mkString(",") + (if (trailingJunk) "," else "")
    w.println(header)
    df.collect().foreach { r =>
      val cells = cols.indices.map { i =>
        if (r.isNullAt(i)) naToken.getOrElse("")
        else csvEscape(r.get(i))
      }
      w.println(cells.mkString(",") + (if (trailingJunk) "," else ""))
    }
    if (trailingJunk) w.println(cols.map(_ => "").mkString(",") + ",")
    w.close()
  }

  /** Write the four raw inputs the way the reference receives them:
    * 3-line preamble + trailing empty row/col on the 4castviewer
    * exports, "x" NA token on the characteristics file (whose very
    * FILENAME is discovered by glob, 01_source_me.R:93-95).
    */
  def writeRawCsvs(spark: SparkSession, dir: File): Unit = {
    dir.mkdirs()
    val preamble = Seq("Export from 4castviewer", "BC Labour Market Outlook", "")
    writeCsv(employment(spark), new File(dir, "employment.csv"),
      preamble, None, trailingJunk = true)
    writeCsv(jobOpenings(spark), new File(dir, "job_openings.csv"),
      preamble, None, trailingJunk = true)
    writeCsv(occChar(spark), new File(dir, s"Occupational Characteristics $fyod.csv"),
      preamble, Some("x"), trailingJunk = false)
    writeCsv(clusters(spark), new File(dir, "clusters.csv"),
      Seq.empty, None, trailingJunk = false)
  }

  /** Read the raw CSVs back through the engine ingest path —
    * skip-preamble, NA token, remove_empty, glob discovery.
    */
  def ingest(spark: SparkSession, dir: File): Pipelines.LmoInputs = {
    def read(name: String, na: String = ""): DataFrame =
      Ingest.removeEmpty(Ingest.readCsv(spark, new File(dir, name).getAbsolutePath,
        skip = 3, nullValue = na))
    val occPath = Ingest.resolveFiles(spark, s"$dir/*Occupational Characteristics*")
      .headOption.getOrElse(sys.error("no Occupational Characteristics file found"))
    Pipelines.LmoInputs(
      employment = read("employment.csv"),
      jobOpenings = read("job_openings.csv"),
      occChar = Ingest.removeEmpty(Ingest.readCsv(spark, occPath, skip = 3, nullValue = "x")),
      clusters = Ingest.readCsv(spark, new File(dir, "clusters.csv").getAbsolutePath))
  }
}
