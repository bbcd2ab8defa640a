package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain operators for web-corpus curation: host extraction,
  * registered-domain rollup, per-domain stats, and domain blocklist
  * filtering — the provenance gates every web-scrape pipeline runs
  * before (and after) content-level filtering.
  *
  * All regex is written in the Java ∩ RE2 subset (no lookarounds, no
  * backrefs) and single-sourced from these constants into the q84
  * oracle, exactly like `Privacy`'s patterns. Everything here is a
  * map-side projection or one hash aggregate — linear at any scale.
  */
object Urls {

  /** Capture group 1 = the host: scheme, optional userinfo, then
    * everything up to the first '/', ':', '?' or '#'.
    */
  val HostRe = "^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

  /** Capture group 1 = the last two dot-labels of a host. This is the
    * naive registered-domain approximation (real curation loads the
    * Public Suffix List, which is data, not code — 'example.co.uk'
    * rolls up to 'co.uk' here); documented, deterministic, and
    * engine-portable.
    */
  val RegisteredDomainRe = "([^.]+\\.[^.]+)$"

  def host(url: Column): Column = regexp_extract(url, HostRe, 1)

  def registeredDomain(hostCol: Column): Column =
    regexp_extract(hostCol, RegisteredDomainRe, 1)

  /** Per-registered-domain corpus stats: doc count + token mass —
    * the table a curation run eyeballs (and thresholds) first.
    * One hash aggregate on the domain.
    */
  def domainStats(docs: DataFrame, urlCol: String = "url",
                  textCol: String = "text"): DataFrame =
    docs.select(registeredDomain(host(col(urlCol))).as("domain"),
        TextStats.tokenCount(col(textCol)).as("_tok"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("sum_tokens"))

  /** Drop documents whose registered domain is blocklisted. The
    * blocklist is dimension-sized (thousands of domains), so it
    * broadcasts: a left-anti broadcast join — map-side at any corpus
    * size, and unlike `isin` it composes with a blocklist that lives
    * in a table rather than in code.
    */
  def applyBlocklist(docs: DataFrame, blocked: DataFrame,
                     urlCol: String = "url"): DataFrame =
    docs.join(
      broadcast(blocked.toDF("_blocked_domain")),
      registeredDomain(host(col(urlCol))) === col("_blocked_domain"),
      "left_anti")
}
