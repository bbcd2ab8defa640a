package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{Archive, Xlsx}

/** The reference's ten catalog artifacts (SURVEY.md §2.11), rebuilt as
  * lazy Spark plans, parameterized by `fyod`
  * (/root/reference/01_source_me.R:1).
  *
  * Execution shape per artifact: scan → unpivot (narrow Expand) →
  * filter (pushed to the scan by Catalyst) → ONE conditional-agg
  * shuffle for the horizon stats + ONE pivot shuffle for the wide
  * years, joined on the group keys (equal partitioning, exchange
  * reused) → driver-side collect ONLY at the report-sized workbook
  * sink. The reference's nest→map→unnest round trips
  * (01_source_me.R:104-110 etc.) do not exist here — see Horizon.
  *
  * Deliberate divergences from the reference, per SURVEY.md §7.4:
  *  - HOO sheets are joined to regions BY NORMALIZED NAME with an
  *    asserted bijection, not by positional alignment of two
  *    independently sorted lists (01_source_me.R:189,196-197 — fragile).
  *  - The "2024E" suffix stripped from HOO column names
  *    (01_source_me.R:172-173 hard-codes the year) is generalized to
  *    any " <yyyy>E" suffix.
  *  - Horizon stat columns keep their canonical names ("1st 5-year
  *    CAGR", …) instead of passing through the reference's blanket
  *    str_to_title (which ICU-mangles them to "1St 5-Year Cagr").
  */
object Pipelines {

  /** Inputs as named DataFrames (post-ingest; see Ingest for the
    * skip-preamble / NA-token / remove_empty read path).
    */
  final case class LmoInputs(employment: DataFrame, jobOpenings: DataFrame,
                             occChar: DataFrame, clusters: DataFrame)

  final case class Artifact(fileName: String, sheets: Seq[Xlsx.Sheet])

  private val groupKeys = Seq("noc", "description", "industry", "variable", "geographic_area")
  private val northSouthEast = Seq("North", "South East")

  def joColName(fyod: Int): String = s"LMO Job Openings $fyod-${fyod + 10}"

  /** unpivot years → clean_names (the shared head of tbbl1/2/3/5/7/8,
    * 01_source_me.R:101-102 etc.).
    */
  def longForm(src: DataFrame): DataFrame =
    Naming.cleanNames(Reshape.unpivotByPrefix(src, "2"))

  /** The shared horizon-report shape: filter the long form, compute
    * CAGRs or horizon sums per group, pivot years wide (first-seen =
    * chronological order), attach stats, publication-rename.
    *
    * `strictParity = true` reproduces the reference's published
    * headers byte-for-byte, INCLUDING the `str_to_title` mangle of
    * the stat columns ("1st 5-year CAGR" → "1St 5-Year Cagr",
    * 01_source_me.R:112); the default keeps canonical stat names
    * (divergence #3 above) — both contracts are golden-pinned.
    *
    * Output carries a deterministic total order on the group keys so
    * downstream sinks (and their golden hashes) never depend on
    * incidental shuffle order.
    */
  def horizonTable(src: DataFrame, fyod: Int, useCagrs: Boolean,
                   strictParity: Boolean = false)
                  (filter: DataFrame => DataFrame): DataFrame = {
    val filtered = filter(longForm(src))
    val stats =
      if (useCagrs) Horizon.cagrs(filtered, groupKeys, fyod)
      else Horizon.horizonSums(filtered, groupKeys, fyod)
    val years = src.columns.filter(_.startsWith("2")).toSeq
    val wide = Reshape.pivotExplicit(filtered, groupKeys, "year", years)
    val statNames = stats.columns.filterNot(groupKeys.contains).toSeq
    val joined = wide.join(stats, groupKeys)
    val renamed =
      if (strictParity)
        // reference contract: EVERY column through str_to_title
        groupKeys.map(k => col(k).as(Naming.strictPublicationName(k))) ++
          years.map(y => col(y)) ++
          statNames.map(s => col(s).as(Naming.strictPublicationName(s)))
      else
        // publication names on keys+years only; stat columns keep
        // their canonical display names (divergence #3 above)
        groupKeys.map(k => col(k).as(Naming.publicationName(k))) ++
          years.map(y => col(y)) ++ statNames.map(s => col(s))
    val out = joined.select(renamed: _*).withColumnRenamed("Noc", "NOC")
    val keyNames = out.columns.take(groupKeys.size).toSeq
    out.orderBy(keyNames.map(col): _*)
  }

  /** "data" sheet + one sheet per region (split(), 01_source_me.R:140-145),
    * each region sheet dropping `dropCols`.
    */
  private def withRegionSheets(table: DataFrame, dropCols: Seq[String],
                               pct: Boolean): Seq[Xlsx.Sheet] = {
    val cached = table.cache()
    Xlsx.Sheet("data", cached, pct) +:
      Reshape.splitByKey(cached, "Geographic Area").map { case (region, df) =>
        Xlsx.Sheet(region, df.drop(dropCols: _*), pct)
      }
  }

  // ——— artifact 1: Employment by Industry and Occupation for BC (:100-118) ———
  def employmentByIndustryOccupationBC(in: LmoInputs, fyod: Int): Artifact =
    Artifact("Employment by Industry and Occupation for BC.xlsx", Seq(
      Xlsx.Sheet("data",
        horizonTable(in.employment, fyod, useCagrs = true)(
          _.filter(col("geographic_area") === "British Columbia")),
        pctLast3 = true)))

  // ——— artifact 2: Employment by Industry for BC and Regions (:121-147) ———
  def employmentByIndustryRegions(in: LmoInputs, fyod: Int): Artifact = {
    val t = horizonTable(in.employment, fyod, useCagrs = true)(
      _.filter(col("noc") === "#T" && !col("geographic_area").isin(northSouthEast: _*)))
    Artifact("Employment by Industry for BC and Regions.xlsx",
      withRegionSheets(t, Seq("NOC", "Description", "Variable"), pct = true))
  }

  // ——— artifact 3: Job Openings by Industry and Occupation for BC (:150-167) ———
  def joByIndustryOccupationBC(in: LmoInputs, fyod: Int): Artifact =
    Artifact("Job Openings by Industry and Occupation for BC.xlsx", Seq(
      Xlsx.Sheet("Sheet 1",
        horizonTable(in.jobOpenings, fyod, useCagrs = false)(
          _.filter(col("geographic_area") === "British Columbia" &&
            col("variable") === "Job Openings")))))

  // ——— artifact 4: High Opportunity Occupations BC and Regions (:170-203) ———
  def highOpportunityOccupations(in: LmoInputs, fyod: Int): Artifact = {
    val occChar = in.occChar
    val hooCols = occChar.columns.filter(_.matches(".*Group: HOO.*")).toSeq // F6, :170
    val sheetNames = hooCols.map(c =>
      c.replaceAll("Occ Group: ", "").replaceAll(" \\d{4}E$", ""))          // :172-173
    val joCol = joColName(fyod)
    val regionalJo = longForm(in.jobOpenings)                               // :182-187
      .filter(col("industry") === "All industries" && col("variable") === "Job Openings")
      .groupBy(col("noc").as("NOC"), col("geographic_area").as("Geographic Area"))
      .agg(sum(col("value")).as(joCol))
      .cache() // reused by every region branch (the reference re-filters per region)
    val regions = regionalJo.select("Geographic Area").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    // Sheet names keep the "HOO " prefix ("HOO British Columbia",
    // :172-173); the join region is the name minus that prefix.
    // Divergence #1: assert the name bijection instead of trusting
    // positional co-sorting of two independently derived lists.
    require(sheetNames.map(_.stripPrefix("HOO ")).sorted == regions,
      s"HOO columns ↔ region roster mismatch: ${sheetNames.sorted} vs $regions")
    val income = "2021 Census Median Employment Income (Employed)"
    val regionSheets = sheetNames.sorted.map { sheetName =>
      val region = sheetName.stripPrefix("HOO ")
      val hooCol = hooCols(sheetNames.indexOf(sheetName))
      val kept = occChar                                                    // keep_only_hoo, :73-77
        .filter(!col(hooCol).rlike("Non"))
        .select(col("NOC"), col("Description"), col(income))
        .withColumn("TEER", substring(col("NOC"), 3, 1))                    // :76
        .select("NOC", "Description", "TEER", income)
      val joined = Joins.naturalLeft(kept,                                  // add_jo, :78-84
        regionalJo.filter(col("Geographic Area") === region))
        .drop("Geographic Area")
      Xlsx.Sheet(sheetName,
        Reshape.relocateAfter(joined, Seq(joCol), "Description").orderBy("NOC"))
    }
    Artifact("High Opportunity Occupations BC and Regions.xlsx",
      Xlsx.Sheet("Data Dictionary", dataDictionary(occChar.sparkSession, fyod)) +: regionSheets)
  }

  /** The HOO data dictionary sheet (/root/reference/hoo_text.R): a
    * 1-column (" ") tibble of 8 documentation strings, two of them
    * parameterized by the horizon years.
    */
  def dataDictionary(spark: SparkSession, fyod: Int): DataFrame = {
    val tyfn = fyod + 10
    import spark.implicits._
    Seq(
      "Data Dictionary",
      s"These data sets contain lists of occupations that are deemed to be high opportunity occupations (HOO) over the 10 year forecast period ($fyod-$tyfn)",
      "Lists are provided for the 7 economic regions. Additionally, the lists provide estimates for Job Openings (for the 10 year forecast period), as well as the most recent Income data provided by Census 2021.",
      "NOC: Denotes a 5-digit code according to the National Occupation Classification 2021 system from Statistics Canada.",
      "Description: Denotes the occupation title according to the National Occupation Classification 2021 system from Statisitics Canada.",
      s"LMO Job Openings $fyod-$tyfn: The sum of expansion and replacement job openings. A job opening is the addition of a new job position through economic growth or a position that needs to be filled due  to someone exiting the labour force permanently.",
      "TEER:  the type and/or amount of training, education, experience and responsibility typically required to work in an occupation. The NOC consists of six TEER categories, identified 0 through 5, which represent the second digit of the NOC code.",
      "2021 Census Median Employment Income (Employed)"
    ).toDF(" ")
  }

  // ——— artifact 5: JO by Type, Ind and Occ for BC and Regions (:207-229) ———
  // (the region filter is commented out in the reference — all areas kept)
  def joByTypeIndustryOccupation(in: LmoInputs, fyod: Int): Artifact =
    Artifact("JO by Type, Ind and Occ for BC and Regions.xlsx", Seq(
      Xlsx.Sheet("Sheet 1",
        horizonTable(in.jobOpenings, fyod, useCagrs = false)(
          _.filter(col("variable").isin("Job Openings", "Expansion Demand",
            "Replacement Demand"))))))

  // ——— artifact 6: Employment by Ind and Occ for BC and Regions (:232-240) ———
  // long format, ORIGINAL column names (no clean_names), Date/Value
  def employmentLongBCRegions(in: LmoInputs): Artifact = {
    val long = Reshape.unpivotByPrefix(
      in.employment.filter(!col("Geographic Area").isin(northSouthEast: _*)),
      "2", nameCol = "Date", valueCol = "Value")
    // deterministic total order on the identifying columns so sink
    // bytes (and golden hashes) never pin incidental shuffle order
    val keys = long.columns.filterNot(_ == "Value").toSeq
    Artifact("Employment by Ind and Occ for BC and Regions.xlsx", Seq(
      Xlsx.Sheet("Sheet 1", long.orderBy(keys.map(col): _*))))
  }

  // ——— artifact 7: Employment by Occupation for BC and Regions (:243-270) ———
  def employmentByOccupationRegions(in: LmoInputs, fyod: Int): Artifact = {
    val t = horizonTable(in.employment, fyod, useCagrs = true)(
      _.filter(col("industry") === "All industries" &&
        !col("geographic_area").isin(northSouthEast: _*)))
    Artifact("Employment by Occupation for BC and Regions.xlsx",
      withRegionSheets(t, Seq("Industry", "Variable"), pct = true))
  }

  // ——— artifact 8: Job Openings by Type and Occ for BC and Regions (:273-302) ———
  def joByTypeOccupationRegions(in: LmoInputs, fyod: Int): Artifact = {
    val t = horizonTable(in.jobOpenings, fyod, useCagrs = false)(
      _.filter(col("industry") === "All industries" &&
        col("variable").isin("Job Openings", "Expansion Demand", "Replacement Demand") &&
        !col("geographic_area").isin(northSouthEast: _*)))
    // asTable = TRUE in the reference (:300-302): each sheet carries
    // an Excel table part over its data range
    Artifact("Job Openings by Type and Occ for BC and Regions.xlsx",
      withRegionSheets(t, Seq("Industry"), pct = false)
        .map(_.copy(asTable = true)))
  }

  // ——— artifact 9: the long CSV → zip (:305-317) ———
  def joLongDump(in: LmoInputs): DataFrame = {
    val long = Reshape.unpivotByPrefix(in.jobOpenings, "2")
      .filter(!col("Geographic Area").isin(northSouthEast: _*))
    val keys = long.columns.filterNot(_ == "value").toSeq
    long.orderBy(keys.map(col): _*)
  }

  // ——— artifact 10: Job Openings by NOC and Skill Cluster (:325-346) ———
  def joBySkillCluster(in: LmoInputs, fyod: Int): Artifact = {
    val jo10 = Reshape.unpivotByPrefix(
      in.jobOpenings
        .filter(col("Industry") === "All industries" &&
          col("Geographic Area") === "British Columbia" &&
          col("Variable") === "Job Openings")
        .drop("Industry", "Geographic Area", "Variable"),
      "2", valueCol = "jo")
      .groupBy("NOC", "Description").agg(sum(col("jo")).as("jo"))
    val clusters = Reshape.separate(                                        // :334-337
      in.clusters.select(col("NOC"), col("new_cluster")),
      "NOC", ("NOC", "Description"), ": ")
      .withColumn("NOC", concat(lit("#"), col("NOC")))
    val joined = Joins.naturalInner(jo10, broadcast(clusters))              // :339
    Artifact("Job Openings by NOC and Skill Cluster.xlsx", Seq(
      Xlsx.Sheet("Sheet 1", joined.select(
        col("NOC"), col("Description"),
        col("new_cluster").as("Occ Group: Skills Cluster"),
        col("jo").as(joColName(fyod)))
        .orderBy("NOC"))))
  }

  /** Build every workbook artifact (1-8, 10). */
  def allWorkbooks(in: LmoInputs, fyod: Int): Seq[Artifact] = Seq(
    employmentByIndustryOccupationBC(in, fyod),
    employmentByIndustryRegions(in, fyod),
    joByIndustryOccupationBC(in, fyod),
    highOpportunityOccupations(in, fyod),
    joByTypeIndustryOccupation(in, fyod),
    employmentLongBCRegions(in),
    employmentByOccupationRegions(in, fyod),
    joByTypeOccupationRegions(in, fyod),
    joBySkillCluster(in, fyod))

  /** Data-plane output: every artifact's primary table lands as
    * Parquet (SCALE.md — the workbook is the human artifact; machine
    * consumers read columnar). Region-keyed tables are partitioned by
    * Geographic Area for downstream partition pruning.
    */
  def writeDataPlane(in: LmoInputs, fyod: Int, dir: java.io.File): Seq[String] = {
    dir.mkdirs()
    allWorkbooks(in, fyod).map { a =>
      val name = a.fileName.stripSuffix(".xlsx")
      val table = a.sheets.find(_.name == "data").getOrElse(a.sheets.last).df
      val writer = table.write.mode("overwrite")
      if (table.columns.contains("Geographic Area"))
        writer.partitionBy("Geographic Area").parquet(s"$dir/$name")
      else writer.parquet(s"$dir/$name")
      name
    }
  }

  /** Run the whole catalog to an output directory — the reference's
    * `source("01_source_me.R")` equivalent.
    */
  def buildAll(in: LmoInputs, fyod: Int, outDir: java.io.File): Seq[String] = {
    outDir.mkdirs()
    // the two fact inputs feed 9 of the 10 artifacts — cache once
    // instead of re-scanning/re-parsing per artifact
    val cached = in.copy(employment = in.employment.cache(),
      jobOpenings = in.jobOpenings.cache())
    try {
      val written = allWorkbooks(cached, fyod).map { a =>
        Xlsx.write(a.sheets, new java.io.File(outDir, a.fileName))
        a.fileName
      }
      val zipName = "JO by Type, Ind and Occ for BC and Regions (long).zip"
      Archive.writeCsvZip(joLongDump(cached), new java.io.File(outDir, zipName),
        "JO by Type, Ind and Occ for BC and Regions (long).csv")
      written :+ zipName
    } finally {
      cached.employment.unpersist()
      cached.jobOpenings.unpersist()
    }
  }
}
