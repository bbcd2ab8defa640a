package graft.engine

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("natural left join infers ALL shared column names (dplyr semantics)") {
    val l = Seq(("#1", "BC", 10.0), ("#2", "BC", 20.0)).toDF("NOC", "geo", "emp")
    val r = Seq(("#1", "BC", 5.0)).toDF("NOC", "geo", "jo")
    assert(Joins.sharedKeys(l, r) === Seq("NOC", "geo"))
    val out = Joins.naturalLeft(l, r)
    assert(out.columns.toSeq === Seq("NOC", "geo", "emp", "jo")) // keys deduped
    assert(out.count() === 2)
    assert(out.filter($"NOC" === "#2").select("jo").head().isNullAt(0))
  }

  test("natural inner join doubles as a filter (:339)") {
    val l = Seq(("#1", 1.0), ("#2", 2.0)).toDF("NOC", "jo")
    val r = Seq(("#1", "c1")).toDF("NOC", "cluster")
    assert(Joins.naturalInner(l, r).count() === 1)
  }

  test("no shared columns is an error, not a cross join") {
    val l = Seq(1).toDF("a")
    val r = Seq(2).toDF("b")
    intercept[IllegalArgumentException](Joins.naturalLeft(l, r))
  }
}
