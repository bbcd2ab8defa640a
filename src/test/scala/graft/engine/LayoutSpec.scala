package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is a bijection on 16-bit pairs (sampled) and inverts") {
    val pairs = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    val df = pairs.toDF("x", "y")
      .withColumn("z", Layout.zValue($"x", $"y"))
    assert(df.select("z").distinct().count() === pairs.length.toLong)
    df.collect().foreach { r =>
      val z = r.getAs[Long]("z")
      assert(Layout.unspread16(z) === r.getAs[Int]("x"))
      assert(Layout.unspread16(z >> 1) === r.getAs[Int]("y"))
    }
  }

  test("z-clustered files prune a 2nd-dimension slab; x-sorted files cannot") {
    // uniform 256×256 grid → 16 files per layout. Query: y ∈ [0,15]
    // (a 1/16 slab on the NON-sorted dimension of the x layout).
    // File-level min/max bounds — exactly what parquet footers give a
    // scan — admit every x-sorted file but only the z files whose
    // curve segment touches the slab.
    val grid = (for (x <- 0 until 256; y <- 0 until 256) yield (x, y))
      .toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val xDir = java.nio.file.Files.createTempDirectory("xsort").toString
    Layout.writeZOrdered(grid, "x", "y", zDir, numFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)
    def filesTouchingSlab(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("y").as("lo"), max("y").as("hi"))
        .filter($"lo" <= 15 && $"hi" >= 0)
        .count()
    val zTouched = filesTouchingSlab(zDir)
    val xTouched = filesTouchingSlab(xDir)
    // z-curve: 16 equal segments = 4×4 aligned 64×64 tiles → the slab
    // hits only the bottom row (4); the x layout hits all 16
    assert(xTouched === 16L, s"x-sorted touched $xTouched")
    assert(zTouched <= 5L, s"z-ordered touched $zTouched")
    // clustering must not lose or duplicate rows
    assert(spark.read.parquet(zDir).count() === 256L * 256L)
  }

  test("compactionPlan: offset-division packing, hand-checked") {
    import spark.implicits._
    val files = Seq(("f1", 5L), ("f2", 4L), ("f3", 3L), ("f4", 2L), ("f5", 1L))
      .toDF("name", "bytes")
    val plan = Layout.compactionPlan(files, "bytes", targetBytes = 6L,
        orderBy = Seq(col("bytes").desc, col("name")))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("bin")).toMap
    // offsets (size-desc order): f1@0 f2@5 f3@9 f4@12 f5@14, target 6
    assert(plan === Map("f1" -> 0L, "f2" -> 0L, "f3" -> 1L,
      "f4" -> 2L, "f5" -> 2L))
  }

  test("compactionPlan: bin payloads bounded by target + largest entry") {
    import spark.implicits._
    val files = (1 to 200).map(i => (s"f$i", (i * 37 % 90 + 10).toLong))
      .toDF("name", "bytes")
    val target = 256L
    val maxEntry = 99L
    val binTotals = Layout.compactionPlan(files, "bytes", target,
        orderBy = Seq(col("bytes").desc, col("name")))
      .groupBy("bin").agg(org.apache.spark.sql.functions.sum("bytes").as("t"))
      .collect().map(_.getLong(1))
    // offset-division: a bin's entries all START within one target
    // stride, so payload < target + its last entry's size
    assert(binTotals.forall(_ < target + maxEntry))
    assert(binTotals.sum === files.agg(org.apache.spark.sql.functions.sum("bytes"))
      .head().getLong(0))
  }
}
