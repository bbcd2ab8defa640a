package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-data pipelines: regex
  * batteries over the text column, all narrow map-side expressions —
  * no shuffle, codegen'd, linear at any corpus size.
  *
  * The patterns are deliberately written in the common subset of
  * Java regex and RE2 (no lookarounds, no backrefs) so the SAME
  * pattern string runs in Spark and in the DuckDB oracle (q76) —
  * single-sourced from these constants.
  */
object Privacy {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Re))

  def hasPii(text: Column): Column =
    (emailCount(text) + phoneCount(text) + ipCount(text)) > 0

  /** Replace every PII match with a typed placeholder. Emails go
    * first: once collapsed to [EMAIL] their digit runs can no longer
    * shadow the phone/IP patterns.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
}
