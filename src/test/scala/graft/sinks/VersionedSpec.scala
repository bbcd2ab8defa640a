package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase() =
    java.nio.file.Files.createTempDirectory("versioned").toString

  test("write/read round trip per version; versions list ascending") {
    val base = freshBase()
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val v2 = Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("id", "v")
    Versioned.write(v1, base, 1)
    Versioned.write(v2, base, 2)
    assert(Versioned.versions(spark, base) === Seq(1, 2))
    assert(Versioned.latestVersion(spark, base) === Some(2))
    assert(Versioned.read(spark, base, 1).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
    assert(Versioned.read(spark, base, 2).collect().map(_.getLong(0)).sorted
      === Array(1L, 3L, 4L))
  }

  test("diff: added and removed keys between versions") {
    val base = freshBase()
    Versioned.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), base, 1)
    Versioned.write(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), base, 2)
    val d = Versioned.diff(spark, base, 1, 2, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(d === Map(3L -> "added", 1L -> "removed"))
  }

  test("re-writing a version is idempotent and never touches others") {
    val base = freshBase()
    Versioned.write(Seq((1L, "x")).toDF("id", "v"), base, 1)
    Versioned.write(Seq((2L, "y")).toDF("id", "v"), base, 2)
    // overwrite v2 with new content; v1 must be untouched
    Versioned.write(Seq((9L, "z")).toDF("id", "v"), base, 2)
    assert(Versioned.read(spark, base, 1).collect().map(_.getLong(0)).toSeq
      === Seq(1L))
    assert(Versioned.read(spark, base, 2).collect().map(_.getLong(0)).toSeq
      === Seq(9L))
    assert(Versioned.versions(spark, base) === Seq(1, 2))
  }

  test("empty base answers no versions; version 0 rejected") {
    val base = freshBase()
    assert(Versioned.versions(spark, base + "/nope") === Seq.empty)
    assert(Versioned.latestVersion(spark, base + "/nope") === None)
    intercept[IllegalArgumentException] {
      Versioned.write(Seq((1L, "x")).toDF("id", "v"), base, 0)
    }
  }
}
