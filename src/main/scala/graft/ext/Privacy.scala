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

  /** PII-density audit per corpus slice — the triage view BEFORE
    * redaction: which sources carry how much detectable PII, both as
    * a document rate and as hits per kilochar (length-normalized, so
    * a long clean doc doesn't mask a short leaky one). Pure map-side
    * regex counts + one group rollup — linear at any corpus size.
    */
  def piiDensity(docs: org.apache.spark.sql.DataFrame,
                 groupCol: String = "source",
                 textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    docs.groupBy(col(groupCol).as("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(hasPii(t), 1L).otherwise(0L)).as("n_docs_with_pii"),
        sum(emailCount(t).cast("long")).as("n_emails"),
        sum(phoneCount(t).cast("long")).as("n_phones"),
        sum(ipCount(t).cast("long")).as("n_ips"),
        sum(length(t).cast("long")).as("_chars"))
      .select(col("source"), col("n_docs"), col("n_docs_with_pii"),
        col("n_emails"), col("n_phones"), col("n_ips"),
        round(col("n_docs_with_pii").cast("double") / col("n_docs"), 6)
          .as("pii_doc_rate"),
        round((col("n_emails") + col("n_phones") + col("n_ips"))
          .cast("double") * 1000.0 / col("_chars"), 6).as("pii_per_kchar"))
      .orderBy("source")
  }

  /** Token-blocklist safety filter per group — the denylist pass
    * every corpus runs before training (profanity, policy terms,
    * poisoned markers). Whole-token matching on the corpus's
    * standard tokenization (lower + \s+ split), NOT substring
    * matching, so "class" never trips a "ass" entry.
    *
    * Map-only: the blocklist rides as an array literal inside two
    * codegen'd expressions (arrays_overlap flag + filter-count), so
    * the pass is one projection + one group-sized aggregation — no
    * join, no shuffle beyond the final per-group rollup. For
    * blocklists too large for a literal (>10⁴ terms), switch to a
    * broadcast semi-join on exploded tokens.
    */
  /** k-anonymity / l-diversity audit — the release-safety check for
    * any dataset carrying quasi-identifiers (the columns an attacker
    * can link externally: region, segment, zip, age band). Groups by
    * the QI columns and reports every equivalence class that is
    * k-risky (fewer than `k` records share the QI combination — the
    * class re-identifies its members) or l-risky (fewer than `l`
    * distinct sensitive values — knowing the class reveals the
    * sensitive attribute even without row-level re-identification).
    * Classes of size 1 are the uniqueness/re-identification worst
    * case and always appear (k ≥ 2).
    *
    * One QI-keyed aggregation; the distinct-sensitive count rides in
    * the same groupBy (Expand + two exchanges — Spark's standard
    * count-distinct shape). Output is class-dictionary-sized; at
    * 100 TB the QI dictionary, not the row count, bounds the result.
    */
  def kAnonymityAudit(df: org.apache.spark.sql.DataFrame,
                      quasiIds: Seq[String], sensitiveCol: String,
                      k: Int, l: Int): org.apache.spark.sql.DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymityAudit: need quasi-identifier columns")
    require(k >= 1 && l >= 1, s"kAnonymityAudit: k, l >= 1, got k=$k l=$l")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_risky", col("n") < k)
      .withColumn("l_risky", col("n_sensitive") < l)
      .where(col("k_risky") || col("l_risky"))
  }

  def blocklistStats(docs: org.apache.spark.sql.DataFrame,
                     blocklist: Seq[String], groupCol: String = "source",
                     textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(blocklist.nonEmpty, "blocklistStats: empty blocklist")
    val bl = array(blocklist.map(lit): _*)
    // tokens materialized in their OWN projection first — the HOF
    // lambda below re-evaluates its input per element otherwise
    val toks = docs.select(col(groupCol).as("grp"),
      split(lower(col(textCol)), "\\s+").as("_ts"))
    toks
      .select(col("grp"),
        arrays_overlap(col("_ts"), bl).as("_flag"),
        size(filter(col("_ts"), t => array_contains(bl, t))).as("_hits"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_flag"), 1L).otherwise(0L)).cast("long").as("n_flagged"),
        sum("_hits").cast("long").as("n_hits"))
      .withColumn("flag_rate",
        round(col("n_flagged").cast("double") / col("n_docs"), 6))
      .orderBy("grp")
  }
  /** Laplace-mechanism noisy counts with a DETERMINISTIC seeded
    * draw — the release mechanics of a differentially-private count
    * query (sensitivity 1, noise b = 1/ε via the standard inverse-CDF
    * −b·sign(u−½)·ln(1−2|u−½|)), with the uniform u derived from the
    * battery's md5 coin (key ⊕ salt) instead of a secret RNG. The
    * operator demonstrates calibrated-release plumbing and is
    * replayable under the oracle; a production deployment swaps the
    * md5 coin for a real entropy source and this function does not
    * pretend otherwise (a knowable seed is NOT differential privacy).
    *
    * Determinism: the ln term is a fixed expression of the md5
    * uniform, 1e6-quantized; the noisy count is exact integer
    * micro-arithmetic from there. Scale: one map-combinable count
    * per key, noise applied on the key dictionary.
    */
  def dpCounts(df: org.apache.spark.sql.DataFrame, keyCol: Column,
               epsilon: Double = 1.0,
               salt: String = "dp1"): org.apache.spark.sql.DataFrame = {
    require(epsilon > 0.0, s"dpCounts: epsilon must be > 0, got $epsilon")
    val counts = df.select(keyCol.cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_true"))
    val u = conv(substring(md5(concat(col("k"), lit(":" + salt))), 1, 15),
      16, 10).cast("double") / lit(1152921504606846976.0) // 2^60
    val noiseU = round(lit(-1.0 / epsilon) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))) * lit(1e6)).cast("long")
    counts.withColumn("noise_u", noiseU)
      .select(col("k").as("key"), col("n_true"),
        lit(epsilon).as("epsilon"),
        (col("noise_u").cast("double") / 1e6).as("noise"),
        ((col("n_true") * lit(1000000L) + col("noise_u")).cast("double") /
          1e6).as("n_noisy"))
      .orderBy("key")
  }

  /** Redaction-completeness audit — the post-pass every redaction
    * pipeline owes its compliance review: re-scan the REDACTED text
    * with the same detectors and report, per slice, the before/after
    * hit counts and the bytes removed. `hits_after` > 0 is the
    * finding (a pattern that re-matches its own replacement, or an
    * overlap the replacement order mishandles); the audit makes the
    * completeness LAW a table instead of a hope. Two map-side regex
    * passes + one group rollup.
    */
  def redactionAudit(docs: org.apache.spark.sql.DataFrame,
                     groupCol: String = "source",
                     textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val r = redact(t)
    docs.groupBy(col(groupCol).as("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(emailCount(t).cast("long")).as("emails_before"),
        sum(phoneCount(t).cast("long")).as("phones_before"),
        sum(ipCount(t).cast("long")).as("ips_before"),
        sum((emailCount(r) + phoneCount(r) + ipCount(r)).cast("long"))
          .as("hits_after"),
        sum((length(t) - length(r)).cast("long")).as("chars_delta"))
      .orderBy("source")
  }

  /** t-closeness audit — the release-safety check k-anonymity (q229)
    * and l-diversity cannot give: a class can be large and diverse
    * yet still LEAK because its sensitive-value mix differs sharply
    * from the population's (the classic "this zip code is 90%
    * high-risk" disclosure). Per QI equivalence class, the
    * variational distance ½·Σ_v |p_class(v) − p_global(v)| between
    * the class's categorical sensitive distribution and the global
    * one; classes with distance > t are t-risky.
    *
    * Exactness: the per-(class, value) terms — including the ZERO
    * cells the absent-value grid supplies, which carry |0 − p_g| —
    * are 1e-9-quantized BIGINTs, and the t flag compares integer
    * mass against round(t·2e9), so the verdict can't wobble on a
    * rounding edge. Scale: class-dictionary × value-dictionary grid
    * (a broadcast of the bounded value dictionary), one left join
    * against the observed cells, one class rollup.
    */
  def tClosenessAudit(df: org.apache.spark.sql.DataFrame,
                      quasiIds: Seq[String], sensitiveCol: String,
                      t: Double): org.apache.spark.sql.DataFrame = {
    require(quasiIds.nonEmpty, "tClosenessAudit: need quasi-identifiers")
    require(t > 0.0 && t < 1.0, s"tClosenessAudit: t in (0,1), got $t")
    val qi = quasiIds.map(col)
    val cls = df.groupBy(qi: _*).agg(count(lit(1)).as("n"))
    val vals = df.groupBy(col(sensitiveCol).as("_v"))
      .agg(count(lit(1)).as("_g"))
    val tot = df.agg(count(lit(1)).as("_nn"))
    val cv = df.groupBy(qi :+ col(sensitiveCol).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val grid = cls
      .crossJoin(broadcast(vals))
      .crossJoin(broadcast(tot))
      .join(cv, quasiIds :+ "_v", "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val tU = math.round(t * 2e9)
    val terms = grid.withColumn("_t_u",
      round(lit(1e9) * abs(col("_c").cast("double") / col("n") -
        col("_g").cast("double") / col("_nn"))).cast("long"))
    terms.groupBy(qi :+ col("n"): _*)
      .agg(sum("_t_u").as("_su"))
      .select(qi ++ Seq(col("n"),
        round(col("_su").cast("double") / 2e9, 6).as("distance"),
        (col("_su") > tU).as("t_risky")): _*)
      .orderBy(qi: _*)
  }

  /** Leaked-credential detector patterns — like the PII battery,
    * written in the Java-regex ∩ RE2 subset (no lookarounds) so the
    * same strings run in Spark and the DuckDB oracle. Three disjoint
    * classes: bare lowercase-hex digests (API tokens, leaked hashes),
    * `sk_`-prefixed keys (payment-processor style), and long
    * mixed-alphabet base64-ish runs (service-account blobs). The
    * classes can't shadow each other: `_` is a word char so the hex
    * run inside `sk_…` has no leading boundary, and the b64 class
    * requires length ≥ 40 with at least one uppercase char.
    */
  val HexSecretRe = "\\b[a-f0-9]{32,}\\b"
  val PrefixedKeyRe = "\\bsk_[A-Za-z0-9]{16,}\\b"
  val B64SecretRe = "[A-Z+/][A-Za-z0-9+/]{39,}"

  /** Secret/credential scan per corpus slice — the secrets-hygiene
    * triage a training corpus runs alongside PII detection: which
    * sources carry machine credentials (hex digests, `sk_` keys,
    * base64 blobs), at what document rate, and what fraction of their
    * bytes is secret material (the memorization-risk proxy). Matched
    * BYTES are counted with a replace-diff (`len(text) −
    * len(regexp_replace(text, pat, ''))`) — pure codegen'd regex, no
    * HOF, no UDF. One map-side projection + one group rollup: linear
    * at any corpus size, output source-dictionary-sized.
    */
  def secretScan(docs: org.apache.spark.sql.DataFrame,
                 groupCol: String = "source",
                 textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    def chars(pat: String): Column =
      (length(t) - length(regexp_replace(t, pat, ""))).cast("long")
    val nHex = regexp_count(t, lit(HexSecretRe))
    val nKey = regexp_count(t, lit(PrefixedKeyRe))
    val nB64 = regexp_count(t, lit(B64SecretRe))
    docs.groupBy(col(groupCol).as("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(nHex + nKey + nB64 > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(nHex.cast("long")).as("n_hex"),
        sum(nKey.cast("long")).as("n_key"),
        sum(nB64.cast("long")).as("n_b64"),
        sum(chars(HexSecretRe) + chars(PrefixedKeyRe) + chars(B64SecretRe))
          .cast("long").as("secret_chars"),
        sum(length(t).cast("long")).as("_chars"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        col("n_hex"), col("n_key"), col("n_b64"), col("secret_chars"),
        round(col("secret_chars").cast("double") / col("_chars"), 6)
          .as("secret_char_frac"))
      .orderBy("source")
  }
}
