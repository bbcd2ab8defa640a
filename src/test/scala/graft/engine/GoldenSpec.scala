package graft.engine

import graft.SparkSpec
import graft.fixtures.LmoFixtures
import java.security.MessageDigest

/** Golden end-to-end pipeline test (SURVEY.md §5 item 3): rebuild all
  * ten artifacts from the raw fixture CSVs and compare each file's
  * sha256 against checked-in goldens. The sinks are byte-reproducible
  * (fixed zip timestamps), so any semantic change anywhere in
  * ingest → pipelines → sinks flips a hash.
  *
  * Regenerate after an INTENDED change:
  *   sbt "runMain graft.tools.LmoRun /tmp/lmo_golden"
  *   then re-hash into src/test/resources/lmo_goldens.json.
  */
class GoldenSpec extends SparkSpec {

  test("all ten artifacts match their checked-in sha256 goldens") {
    val goldenSrc = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/lmo_goldens.json"), "UTF-8").mkString
    // minimal flat {"name": "hex"} parse — no JSON library on the classpath
    val golden = """"([^"]+)"\s*:\s*"([0-9a-f]{64})"""".r
      .findAllMatchIn(goldenSrc).map(m => m.group(1) -> m.group(2)).toMap
    assert(golden.size === 10, s"expected 10 goldens, got ${golden.size}")

    val raw = java.nio.file.Files.createTempDirectory("golden_raw").toFile
    LmoFixtures.writeRawCsvs(spark, raw)
    val in = LmoFixtures.ingest(spark, raw)
    val out = java.nio.file.Files.createTempDirectory("golden_out").toFile
    Pipelines.buildAll(in, LmoFixtures.fyod, out)

    golden.foreach { case (name, expected) =>
      val f = new java.io.File(out, name)
      assert(f.exists, s"artifact missing: $name")
      val got = MessageDigest.getInstance("SHA-256")
        .digest(java.nio.file.Files.readAllBytes(f.toPath))
        .map("%02x".format(_)).mkString
      assert(got === expected, s"artifact bytes changed: $name")
    }
  }
}
