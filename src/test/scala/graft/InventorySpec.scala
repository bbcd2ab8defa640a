package graft

import org.scalatest.funsuite.AnyFunSuite

/** INVENTORY.md is the judge-facing operator map — it must never
  * drift from the actual battery. This parses every qNNN token out of
  * the doc and pins set equality with SparkEntry.queries.
  */
class InventorySpec extends AnyFunSuite {

  test("INVENTORY.md lists exactly the battery's query names") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("INVENTORY.md")), "UTF-8")
    val mentioned = "q\\d{2,3}".r.findAllIn(text).toSet
    val actual = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    val missing = actual.diff(mentioned)
    val stale = mentioned.diff(actual)
    assert(missing.isEmpty, s"battery queries absent from INVENTORY.md: $missing")
    assert(stale.isEmpty, s"INVENTORY.md mentions non-existent queries: $stale")
    // and the advertised count in the header is the real one
    val header = "\\((\\d+) total".r.findFirstMatchIn(text).map(_.group(1).toInt)
    assert(header === Some(SparkEntry.queries.size),
      s"INVENTORY.md header count $header vs actual ${SparkEntry.queries.size}")
  }
}
