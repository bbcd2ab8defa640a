package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned parquet snapshots with time-travel reads — the minimal
  * lakehouse-table primitive (write v1, v2, …; read any version;
  * diff versions) underneath the corpus-versioning ops (q113
  * snapshot diff, q102 CDC chunks). Layout:
  *
  * {{{ base/v=N/part-*.parquet }}}
  *
  * Versions are explicit directories, never inferred from mtimes;
  * `versions` lists them from the filesystem, so a reader needs no
  * side manifest. At warehouse scale this is the seam where a real
  * table format (commit log, schema evolution, compaction) slots in —
  * the API (write/read/latest/diff) is the stable part.
  */
object Versioned {

  private def path(base: String, version: Int) = s"$base/v=$version"

  /** Write snapshot `version`. Overwrites an existing directory for
    * that version only (idempotent re-runs), never other versions.
    */
  def write(df: DataFrame, base: String, version: Int): Unit = {
    require(version >= 1, s"versions are 1-based, got $version")
    df.write.mode(SaveMode.Overwrite).parquet(path(base, version))
  }

  /** All versions present under `base`, ascending. */
  def versions(spark: SparkSession, base: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, base: String): Option[Int] =
    versions(spark, base).lastOption

  /** Time-travel read of snapshot `version`. */
  def read(spark: SparkSession, base: String, version: Int): DataFrame =
    spark.read.parquet(path(base, version))

  /** Rows added/removed between two versions keyed by `keyCols`
    * (full-row comparison of the keyed projection): status ∈
    * {added, removed}. Two anti-joins on the key — the storage-level
    * twin of `Corpus.snapshotDiff`.
    */
  def diff(spark: SparkSession, base: String, fromV: Int, toV: Int,
           keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = read(spark, base, fromV).select(keyCols.map(col): _*)
    val b = read(spark, base, toV).select(keyCols.map(col): _*)
    b.join(a, keyCols, "left_anti").withColumn("status", lit("added"))
      .unionByName(
        a.join(b, keyCols, "left_anti").withColumn("status", lit("removed")))
  }
}
