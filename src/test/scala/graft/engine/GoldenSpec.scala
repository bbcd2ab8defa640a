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

    // read(write(x)) == x — semantic round trip through the repo's
    // own XLSX reader, not just byte pinning: every sheet of every
    // workbook parses back to the exact cell grid that was written
    Pipelines.allWorkbooks(in, LmoFixtures.fyod).foreach { a =>
      val f = new java.io.File(out, a.fileName)
      val names = graft.sources.XlsxReader.sheetNames(f.getPath)
      assert(names === a.sheets.map(s => graft.sinks.Xlsx.sanitizeName(s.name)),
        s"${a.fileName}: sheet roster changed in round trip")
      a.sheets.foreach { sheet =>
        val grid = graft.sources.XlsxReader.readSheet(
          f.getPath, Some(graft.sinks.Xlsx.sanitizeName(sheet.name)))
        val header = grid.head.map(_.map(_.toString).getOrElse(""))
        assert(header === sheet.df.columns.toSeq,
          s"${a.fileName}/${sheet.name}: header mismatch")
        val expectedRows = sheet.df.collect()
        assert(grid.tail.size === expectedRows.length,
          s"${a.fileName}/${sheet.name}: row count mismatch")
        grid.tail.zip(expectedRows).zipWithIndex.foreach { case ((got, exp), ri) =>
          exp.toSeq.zipWithIndex.foreach { case (ev, ci) =>
            val gv = if (ci < got.size) got(ci) else None
            (ev, gv) match {
              case (null, None) => ()
              case (null, Some(g)) =>
                fail(s"${a.fileName}/${sheet.name} r$ri c$ci: phantom value '$g'")
              case (n: Number, Some(d: Double)) =>
                assert(math.abs(n.doubleValue - d) <= math.abs(n.doubleValue) * 1e-12,
                  s"${a.fileName}/${sheet.name} r$ri c$ci: $n vs $d")
              case (b: Boolean, Some(g: Boolean)) => assert(b === g)
              case (s, Some(g)) =>
                assert(s.toString === g.toString,
                  s"${a.fileName}/${sheet.name} r$ri c$ci: '$s' vs '$g'")
              case (s, None) =>
                fail(s"${a.fileName}/${sheet.name} r$ri c$ci: lost value '$s'")
            }
          }
        }
      }
    }
  }
}
