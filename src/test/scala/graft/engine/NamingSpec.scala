package graft.engine

import graft.SparkSpec

/** Pins the reference's naming contract (SURVEY.md §2.2 P5):
  * janitor::clean_names and stringr::str_to_title semantics.
  */
class NamingSpec extends SparkSpec {

  test("cleanName replicates janitor::clean_names") {
    assert(Naming.cleanName("Geographic Area") === "geographic_area")
    assert(Naming.cleanName("NOC") === "noc")
    assert(Naming.cleanName("2021 Census Median Employment Income (Employed)")
      === "x2021_census_median_employment_income_employed")
    assert(Naming.cleanName("1st 5-year CAGR") === "x1st_5_year_cagr")
    assert(Naming.cleanName("  trailing__junk  ") === "trailing_junk")
  }

  test("degenerate inputs: empty and symbol-only strings") {
    assert(Naming.cleanName("") === "")
    assert(Naming.cleanName("!!!") === "")
    assert(Naming.titleCase("") === "")
  }

  test("titleCase replicates stringr::str_to_title") {
    assert(Naming.titleCase("geographic area") === "Geographic Area")
    assert(Naming.titleCase("1st 5-year cagr") === "1st 5-Year Cagr")
    assert(Naming.titleCase("o'brien's job") === "O'brien's Job")
    assert(Naming.titleCase("ALL CAPS IN") === "All Caps In")
  }

  test("publication rename round trip: first column forced to NOC") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("noc", "x2024_value")
    val out = Naming.publicationNames(df)
    assert(out.columns.toSeq === Seq("NOC", "X2024 Value"))
  }

  test("cleanNames on a DataFrame") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("Geographic Area", "Job Openings 2024")
    assert(Naming.cleanNames(df).columns.toSeq
      === Seq("geographic_area", "job_openings_2024"))
  }
}
