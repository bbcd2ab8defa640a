package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    (1L, "reach me at jane.doe+spam@mail.example.org thanks"),
    (2L, "call 555-867-5309 or 555-000-1111 today"),
    (3L, "server at 192.168.1.100 timed out"),
    (4L, "plain text with no sensitive content at all"),
    (5L, "a@b.co 10.0.0.1 555-123-4567 everything at once")
  ).toDF("id", "text")

  test("counts per kind") {
    val got = samples.select($"id",
      Privacy.emailCount($"text").as("e"),
      Privacy.phoneCount($"text").as("p"),
      Privacy.ipCount($"text").as("i"))
      .as[(Long, Int, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) === ((1, 0, 0)))
    assert(got(2L) === ((0, 2, 0)))
    assert(got(3L) === ((0, 0, 1)))
    assert(got(4L) === ((0, 0, 0)))
    assert(got(5L) === ((1, 1, 1)))
  }

  test("redaction replaces every match and nothing else") {
    val got = samples.select($"id", Privacy.redact($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "reach me at [EMAIL] thanks")
    assert(got(2L) === "call [PHONE] or [PHONE] today")
    assert(got(3L) === "server at [IP] timed out")
    assert(got(4L) === "plain text with no sensitive content at all")
    assert(got(5L) === "[EMAIL] [IP] [PHONE] everything at once")
  }

  test("hasPii gates documents") {
    val flagged = samples.filter(Privacy.hasPii($"text"))
      .select("id").as[Long].collect().toSet
    assert(flagged === Set(1L, 2L, 3L, 5L))
  }

  test("blocklistStats: whole-token matching — substrings never trip") {
    val docs = Seq(
      ("a", "the class was fine"),        // "ass" must NOT match inside class
      ("a", "what an ass he was ass"),    // 2 hits, 1 flagged doc
      ("a", "ASS uppercase matches"),     // lower() normalizes
      ("b", "clean text here")
    ).toDF("source", "text")
    val out = Privacy.blocklistStats(docs, Seq("ass")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_docs") === 3L)
    assert(out("a").getAs[Long]("n_flagged") === 2L)
    assert(out("a").getAs[Long]("n_hits") === 3L)
    assert(out("a").getAs[Double]("flag_rate") === 0.666667)
    assert(out("b").getAs[Long]("n_flagged") === 0L)
    assert(out("b").getAs[Double]("flag_rate") === 0.0)
  }

  test("blocklistStats: multi-term list counts every occurrence") {
    val docs = Seq(("s", "bad worse bad"), ("s", "worse")).toDF("source", "text")
    val out = Privacy.blocklistStats(docs, Seq("bad", "worse")).collect().head
    assert(out.getAs[Long]("n_flagged") === 2L)
    assert(out.getAs[Long]("n_hits") === 4L)
  }

  test("blocklistStats: empty blocklist fails loudly") {
    val docs = Seq(("s", "x")).toDF("source", "text")
    intercept[IllegalArgumentException](Privacy.blocklistStats(docs, Seq.empty))
  }

  test("kAnonymityAudit: hand-built classes — k flags size, l flags diversity") {
    // class (r1, s1): 3 members, 3 distinct sensitive → safe at k=3, l=3
    // class (r1, s2): 2 members → k-risky; 2 distinct → l-risky
    // class (r2, s1): 3 members, 1 distinct sensitive → l-risky only
    val rows = Seq(
      ("r1", "s1", 10L), ("r1", "s1", 20L), ("r1", "s1", 30L),
      ("r1", "s2", 10L), ("r1", "s2", 20L),
      ("r2", "s1", 7L), ("r2", "s1", 7L), ("r2", "s1", 7L)
    ).toDF("region", "segment", "sens")
    val out = Privacy.kAnonymityAudit(rows, Seq("region", "segment"), "sens",
        k = 3, l = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(!out.contains(("r1", "s1")), "safe class must not be reported")
    assert(out(("r1", "s2")).getAs[Boolean]("k_risky"))
    assert(out(("r1", "s2")).getAs[Boolean]("l_risky"))
    assert(!out(("r2", "s1")).getAs[Boolean]("k_risky"))
    assert(out(("r2", "s1")).getAs[Boolean]("l_risky"))
    assert(out(("r2", "s1")).getAs[Long]("n_sensitive") === 1L)
  }

  test("kAnonymityAudit: singleton classes always surface at k >= 2") {
    val rows = Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("qi", "sens")
    val out = Privacy.kAnonymityAudit(rows, Seq("qi"), "sens", k = 2, l = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.contains("a"), "the unique record is the worst re-id case")
    assert(out("a").getAs[Long]("n") === 1L)
  }
  test("dpCounts: deterministic replay, exact micro ledger, non-zero noise") {
    val df = (0 until 100).map(i => s"k${i % 4}").toDF("k")
    val a = Privacy.dpCounts(df, col("k")).collect()
    val b = Privacy.dpCounts(df, col("k")).collect()
    assert(a.toSeq === b.toSeq, "seeded draw must replay identically")
    assert(a.length === 4)
    a.foreach { r =>
      assert(r.getAs[Long]("n_true") === 25L)
      // noisy = true + noise exactly, in micro units
      val lhs = math.round(r.getAs[Double]("n_noisy") * 1e6)
      val rhs = r.getAs[Long]("n_true") * 1000000L +
        math.round(r.getAs[Double]("noise") * 1e6)
      assert(lhs === rhs, r.toString)
    }
    assert(a.exists(r => math.abs(r.getAs[Double]("noise")) > 1e-6),
      "the Laplace draw should not be identically zero")
  }

  test("dpCounts: tighter epsilon draws proportionally larger noise") {
    val df = (0 until 50).map(i => s"g${i % 5}").toDF("k")
    val n1 = Privacy.dpCounts(df, col("k"), epsilon = 1.0).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("noise")).toMap
    val n01 = Privacy.dpCounts(df, col("k"), epsilon = 0.1).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("noise")).toMap
    n1.foreach { case (k, v) =>
      // same uniform, 10x the scale (up to the 1e-6 quantization)
      assert(math.abs(n01(k) - v * 10) < 2e-5, s"$k: $v vs ${n01(k)}")
    }
  }

  test("piiDensity: planted leaks count exactly; clean sources read zero") {
    import spark.implicits._
    val docs = Seq(
      ("leaky", "write to a@b.com and c@d.org today"),   // 2 emails
      ("leaky", "call 555-123-4567 now"),                // 1 phone
      ("clean", "nothing sensitive here at all"),
      ("clean", "still nothing")
    ).toDF("source", "text")
    val out = Privacy.piiDensity(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val leaky = out("leaky")
    assert(leaky.getAs[Long]("n_docs") === 2L)
    assert(leaky.getAs[Long]("n_docs_with_pii") === 2L)
    assert(leaky.getAs[Long]("n_emails") === 2L)
    assert(leaky.getAs[Long]("n_phones") === 1L)
    assert(leaky.getAs[Double]("pii_doc_rate") === 1.0)
    assert(leaky.getAs[Double]("pii_per_kchar") > 0.0)
    val clean = out("clean")
    assert(clean.getAs[Long]("n_docs_with_pii") === 0L)
    assert(clean.getAs[Double]("pii_doc_rate") === 0.0)
    assert(clean.getAs[Double]("pii_per_kchar") === 0.0)
  }

  test("redactionAudit: completeness law as a table — zero residual " +
    "hits, exact byte delta") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "mail a@b.com and 555-123-4567 plus 10.0.0.1 end"),
      ("s1", "clean text"),
      ("s2", "only c@d.org here")
    ).toDF("source", "text")
    val out = Privacy.redactionAudit(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s1").getAs[Long]("emails_before") === 1L)
    assert(out("s1").getAs[Long]("phones_before") === 1L)
    assert(out("s1").getAs[Long]("ips_before") === 1L)
    assert(out("s1").getAs[Long]("hits_after") === 0L)
    assert(out("s2").getAs[Long]("hits_after") === 0L)
    // byte delta: (7-7 email [EMAIL]=7 vs a@b.com=7) + (12-7 phone)
    // + (8-4 ip) = 0 + 5 + 4 = 9
    assert(out("s1").getAs[Long]("chars_delta") === 9L)
    assert(out("s2").getAs[Long]("chars_delta") ===
      ("c@d.org".length - "[EMAIL]".length).toLong)
  }

  test("tClosenessAudit: hand variational distances, zero cells " +
    "counted, integer-mass t verdict") {
    import spark.implicits._
    // A: 3x/1y, C: 2x only → global 5x/1y over 6
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("C", "x"), ("C", "x")).toDF("qi", "sens")
    val out = Privacy.tClosenessAudit(df, Seq("qi"), "sens", t = 0.1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n") === 4L)
    assert(out("A").getAs[Double]("distance") === 0.083333)
    assert(!out("A").getAs[Boolean]("t_risky"))
    // C never saw 'y': the zero cell contributes |0 - 1/6|
    assert(out("C").getAs[Double]("distance") === 0.166667)
    assert(out("C").getAs[Boolean]("t_risky"))
    // identical mixes everywhere → distance 0, nothing risky
    val flat = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("qi", "sens")
    val fr = Privacy.tClosenessAudit(flat, Seq("qi"), "sens", t = 0.1)
      .collect()
    assert(fr.forall(_.getAs[Double]("distance") === 0.0))
    assert(fr.forall(!_.getAs[Boolean]("t_risky")))
  }

  test("secretScan: disjoint detector classes, byte accounting, " +
    "no cross-class shadowing") {
    import spark.implicits._
    val hex32 = "0123456789abcdef0123456789abcdef" // 32 lowercase hex
    val docs = Seq(
      ("s1", s"leaked digest $hex32 in log"),         // hex only
      ("s1", s"token sk_$hex32 found"),               // sk_ key only
      ("s2", "blob K" + ("AbCd1234" * 5) + " end"),   // 41-char b64-ish
      ("s2", "short aaaa1111 run and sk_tooShort1 nope"), // clean
      ("s3", "nothing secret here")                   // clean
    ).toDF("source", "text")
    val out = Privacy.secretScan(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // s1: one hex doc + one key doc; the sk_ hex body must NOT also
    // count as a bare hex digest (underscore kills the boundary)
    assert(out("s1").getAs[Long]("n_hex") === 1L)
    assert(out("s1").getAs[Long]("n_key") === 1L)
    assert(out("s1").getAs[Long]("n_b64") === 0L)
    assert(out("s1").getAs[Long]("n_flagged") === 2L)
    // hex match = 32 bytes, key match = 3 + 32 bytes
    assert(out("s1").getAs[Long]("secret_chars") === (32L + 35L))
    // s2: exactly one b64 blob (K + 40 chars), the short runs stay clean
    assert(out("s2").getAs[Long]("n_b64") === 1L)
    assert(out("s2").getAs[Long]("n_hex") === 0L)
    assert(out("s2").getAs[Long]("n_key") === 0L)
    assert(out("s2").getAs[Long]("n_flagged") === 1L)
    assert(out("s2").getAs[Long]("secret_chars") === 41L)
    // s3: fully clean
    assert(out("s3").getAs[Long]("n_flagged") === 0L)
    assert(out("s3").getAs[Long]("secret_chars") === 0L)
    assert(out("s3").getAs[Double]("secret_char_frac") === 0.0)
  }
}
