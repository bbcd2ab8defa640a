package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token
  * counting, quality scoring, fingerprinting, language ID. Everything
  * is built from `org.apache.spark.sql.functions` (codegen'd or
  * JVM-native higher-order functions) — no UDFs — so the whole surface
  * stays inside Catalyst and scales linearly with zero shuffles.
  */
object TextStats {

  /** Whitespace tokenization (lowercased). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** A BPE-ish subword proxy: alnum runs + single punctuation marks
    * each count as one token (roughly what a byte-pair tokenizer's
    * pre-tokenizer sees).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(t) > 0 && t =!= " ")).cast("long")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** # tokens that are stopwords (with multiplicity — array_intersect
    * would dedup and undercount).
    */
  def stopwordCount(text: Column, stops: Seq[String] = defaultStopwords): Column = {
    val stopArr = array(stops.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stopArr, t))).cast("long")
  }

  def stopwordRatio(text: Column, stops: Seq[String] = defaultStopwords): Column =
    stopwordCount(text, stops).cast("double") / tokenCount(text)

  /** # of punctuation characters (explicit class for oracle parity). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("long")

  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: long-enough, low punctuation
    * density, sane stopword ratio — the usual cheap pre-filter before
    * expensive dedup/scoring stages.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctOk = lit(1.0) - least(punctCount(text).cast("double") / tokenCount(text), lit(1.0))
    val stopOk = when(stopwordRatio(text).between(0.01, 0.6), lit(1.0)).otherwise(lit(0.5))
    round((lenScore + punctOk + stopOk) / lit(3.0), 6)
  }

  /** Content-defined fingerprint: md5 of the whitespace-normalized,
    * lowercased text. Stable across engines (md5 is standard), used as
    * the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** 64-bit rolling-style document fingerprint via xxhash64 over the
    * normalized text (cheap, codegen'd; NOT portable to the oracle —
    * covered by rows-only checks and unit tests).
    */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** Character-n-gram language ID heuristic: score each candidate
    * language by hits of its characteristic stopwords/character
    * n-grams in the text, pick the argmax (ties → alphabetical).
    * Pure column expressions — runs distributed, no shuffle.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", "th", "ing"),
    "de" -> Seq(" der ", " und ", " die ", " ist ", "sch", "ei"),
    "es" -> Seq(" el ", " la ", " de ", " es ", "ción", "ll"),
    "fr" -> Seq(" le ", " la ", " et ", " est ", "eau", "ou"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我"))

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => when(contains(lower(text), lit(m)), 1).otherwise(0))
      .reduce(_ + _)

  def langId(text: Column): Column = {
    // array_max compares structs field-by-field: score first, then
    // -index so score ties resolve to the alphabetically-first lang.
    val scored = langMarkers.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, ms), i) =>
        struct(langScore(text, ms).as("score"), lit(-i).as("tie"),
          lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }
}
