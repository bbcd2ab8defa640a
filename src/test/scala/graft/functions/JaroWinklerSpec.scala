package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the kernel to the ORACLE's observed values (each expected
  * number below was read off `jaro_winkler_similarity` directly), so
  * a semantic drift in either implementation breaks here before it
  * breaks a hash compare.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic reference pairs match the oracle bit-for-bit") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("DUNBAR", "DUNCAN") === 0.8444444444444443)
    assert(jw("jon", "john") === 0.9333333333333333)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
    assert(jw("DwAyNE", "DuANE") === 0.8400000000000001)
  }

  test("odd mismatch count truncates the half-transposition (oracle law)") {
    // 3 mismatched matched-positions → t = 1, not 1.5
    assert(jw("pqrstu", "qrpstu") === 0.9444444444444445)
    assert(jw("pqrstu", "qprstu") === 0.9444444444444445)
  }

  test("no prefix boost at or below jaro 0.7") {
    // shared 4-char prefix but jaro 2/3 → boost must NOT fire
    assert(jw("abcdefgh", "abcdxxxx") === 0.6666666666666666)
    assert(jw("abcdef", "abzzzz") === 0.5555555555555555)
  }

  test("degenerate inputs: empty → 0, equal → 1, window-0 swap → 0") {
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("a", "a") === 1.0)
    assert(jw("aaaa", "aaaa") === 1.0)
    assert(jw("ab", "ba") === 0.0)
  }

  test("expression: null-intolerant, codegen path equals interpreted eval") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      (null, "x"), ("y", null)).toDF("a", "b")
    val out = df.select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    assert(out(0).getDouble(0) === 0.9611111111111111)
    assert(out(1).getDouble(0) === 0.8133333333333332)
    assert(out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("jaroWinklerPairs: dictionary self-join finds planted near-names") {
    val df = Seq("acme corp", "acme corp.", "zenith ltd", "acme group",
      "zebra inc").flatMap(n => Seq.fill(3)(n)).toDF("name")
    val pairs = graft.ext.Dedup.jaroWinklerPairs(df, "name", 0.9).collect()
    assert(pairs.exists(r => r.getString(0) == "acme corp" &&
      r.getString(1) == "acme corp."))
    // dictionary semantics: triplicated rows add no pairs
    val once = graft.ext.Dedup.jaroWinklerPairs(
      df.distinct(), "name", 0.9).collect()
    assert(pairs.toSeq.map(_.toString).sorted === once.toSeq.map(_.toString).sorted)
  }

  test("jaroWinklerPairs: first-char blocking is a subset that keeps same-block pairs") {
    val df = Seq("alpha", "alpah", "blpha", "beta", "betta").toDF("name")
    val full = graft.ext.Dedup.jaroWinklerPairs(df, "name", 0.8)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val blocked = graft.ext.Dedup.jaroWinklerPairs(df, "name", 0.8,
      blockOnFirstChar = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked.subsetOf(full))
    assert(blocked.contains(("alpah", "alpha")))
    assert(blocked.contains(("beta", "betta")))
    // the cross-block pair is the documented blocking loss
    assert(full.contains(("alpha", "blpha")) && !blocked.contains(("alpha", "blpha")))
  }

  test("jaroWinklerPairs: unblocked cross join refuses oversized dictionaries") {
    val df = (1 to 20).map(i => s"name$i").toDF("name")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Dedup.jaroWinklerPairs(df, "name", 0.9, maxNames = 10L)
    }
    assert(e.getMessage.contains("blockOnFirstChar=true"))
    // the blocked path is the scale route: ungated at any size
    graft.ext.Dedup.jaroWinklerPairs(df, "name", 0.9,
      blockOnFirstChar = true, maxNames = 10L).collect()
  }

  test("blockingQuality: differential vs jaroWinklerPairs; exact pair algebra") {
    // the blocking-loss fixture from the subset test, plus singles
    val df = Seq("alpha", "alpah", "blpha", "beta", "betta", "carol")
      .toDF("name")
    val q = graft.ext.Dedup.blockingQuality(df, "name", 0.8).head()
    val pairs = graft.ext.Dedup.jaroWinklerPairs(df, "name", 0.8).collect()
    val inBlk = pairs.count(r => r.getString(0).head == r.getString(1).head)
    assert(q.getAs[Long]("n_names") === 6L)
    assert(q.getAs[Long]("n_all_pairs") === 15L)
    // blocks: a=2, b=3, c=1 → 1 + 3 + 0 = 4 blocked pairs
    assert(q.getAs[Long]("n_block_pairs") === 4L)
    assert(q.getAs[Long]("n_true") === pairs.length.toLong)
    assert(q.getAs[Long]("n_true_in_block") === inBlk.toLong)
    assert(q.getAs[Double]("reduction_ratio") === 0.733333)
    // the alpha↔blpha cross-block match drives completeness below 1
    assert(q.getAs[Double]("pair_completeness") < 1.0)
  }

  test("blockingQuality: no true pairs → completeness NULL, gate still enforced") {
    val df = Seq("aaaa", "zzzz").toDF("name")
    val q = graft.ext.Dedup.blockingQuality(df, "name", 0.9).head()
    assert(q.getAs[Long]("n_true") === 0L)
    assert(q.isNullAt(q.fieldIndex("pair_completeness")))
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.blockingQuality(
        (1 to 20).map(i => s"n$i").toDF("name"), "name", 0.9, maxNames = 5L)
    }
  }
}
