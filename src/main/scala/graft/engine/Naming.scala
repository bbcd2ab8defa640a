package graft.engine

import org.apache.spark.sql.DataFrame

/** Column-name transforms replicating the reference's publication
  * naming contract (SURVEY.md §2.2 P5; reference `01_source_me.R:102`
  * janitor::clean_names, `:112` str_to_title/str_replace_all, `:114`
  * first column forced to "NOC").
  *
  * These are driver-side metadata operations — pure `select`/`toDF`
  * renames, zero plan nodes, zero shuffles — so they cost nothing at
  * any scale.
  */
object Naming {

  /** janitor::clean_names semantics: lowercase, any run of
    * non-alphanumeric characters becomes a single `_`, leading/trailing
    * `_` stripped, and a leading digit gets an `x` prefix.
    * E.g. "2021 Census Median Employment Income (Employed)" →
    * "x2021_census_median_employment_income_employed".
    */
  def cleanName(s: String): String = {
    val base = s.toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    if (base.headOption.exists(_.isDigit)) "x" + base else base
  }

  /** stringr::str_to_title semantics: every word capitalized, rest
    * lowercased; word = maximal run of letters/digits/apostrophes.
    */
  def titleCase(s: String): String = {
    val sb = new StringBuilder
    var atWordStart = true
    s.foreach { c =>
      if (c.isLetter) {
        sb.append(if (atWordStart) c.toUpper else c.toLower)
        atWordStart = false
      } else {
        sb.append(c)
        atWordStart = !(c.isDigit || c == '\'')
      }
    }
    sb.toString
  }

  /** snake_case → "Title Case With Spaces" (reference `:112`). */
  def publicationName(s: String): String = titleCase(s.replace("_", " "))

  /** ICU/stringr title-case semantics, for strict reference parity:
    * the first CASED letter of each word is uppercased even when
    * preceded by digits, and hyphens break words — so
    * "1st 5-year CAGR" → "1St 5-Year Cagr", exactly the mangle the
    * reference's blanket `str_to_title` (01_source_me.R:112) applies
    * to the published artifact headers. `titleCase` above is the
    * canonical-name variant that leaves "1st" alone.
    */
  def titleCaseIcu(s: String): String = {
    val sb = new StringBuilder
    var seenCased = false // a cased letter already emitted in this word
    s.foreach { c =>
      if (c.isLetter) {
        sb.append(if (!seenCased) c.toUpper else c.toLower)
        seenCased = true
      } else {
        sb.append(c)
        if (!c.isDigit) seenCased = false
      }
    }
    sb.toString
  }

  /** The reference's exact published-header transform (`:112`):
    * underscores → spaces, then ICU title case.
    */
  def strictPublicationName(s: String): String = titleCaseIcu(s.replace("_", " "))

  def cleanNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(cleanName).toIndexedSeq: _*)

  /** Publication rename: every column title-cased with spaces, and the
    * first column forced to the given literal (default "NOC",
    * reference `:114`).
    */
  def publicationNames(df: DataFrame, firstCol: Option[String] = Some("NOC")): DataFrame = {
    val renamed = df.columns.map(publicationName)
    val cols = firstCol match {
      case Some(f) if renamed.nonEmpty => f +: renamed.tail.toSeq
      case _                           => renamed.toSeq
    }
    df.toDF(cols: _*)
  }
}
