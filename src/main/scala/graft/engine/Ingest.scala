package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-side operators (SURVEY.md §2.1).
  *
  * S1/S3: CSV with a metadata preamble to skip and a custom NA token
  * (`vroom(..., skip=3)` `01_source_me.R:87,90`; `read_excel(...,
  * skip=3, na="x")` `:93-97` — the Excel input is ingested from its
  * CSV/Parquet equivalent since no Excel reader exists on the
  * classpath).
  *
  * S4: `janitor::remove_empty()` (`:88`, `:91`) — drop rows and
  * columns that are entirely null.
  */
object Ingest {

  /** CSV read with `skip` physical lines dropped before the header.
    *
    * Spark CSV has no skip-N-lines option, so the preamble is dropped
    * on the text layer: each file is read as lines with
    * `zipWithIndex` (per-file, so multi-file globs skip the preamble
    * in EVERY file), then the remaining lines are parsed by the
    * regular CSV reader — schema inference, quoting, nullValue all
    * intact. Reads stay distributed; only file listing touches the
    * driver.
    */
  def readCsv(spark: SparkSession, path: String, skip: Int = 0,
              nullValue: String = "", header: Boolean = true): DataFrame = {
    import spark.implicits._
    val reader = spark.read
      .option("header", header)
      .option("inferSchema", true)
      .option("nullValue", nullValue)
      .option("emptyValue", "")
    if (skip == 0) reader.csv(path)
    else {
      val files = resolveFiles(spark, path)
      require(files.nonEmpty, s"readCsv: no files match $path")
      // parse PER FILE then union: each file carries its own preamble
      // AND header, so a naive union of stripped lines would leave the
      // 2nd..nth headers embedded as data rows
      def stripped(f: String, nSkip: Int): Dataset[String] =
        spark.sparkContext.textFile(f)
          .zipWithIndex()
          .filter(_._2 >= nSkip.toLong)
          .map(_._1)
          .toDS()
      // infer the schema ONCE over the union of all stripped lines —
      // per-file inference would let files whose columns infer
      // differently (all-null → string, int vs double) silently widen
      // or fail at unionByName, diverging from a single-read parse.
      // Files 2..n also drop their header line so repeated header
      // tokens can't force numeric columns to string during inference.
      val extra = if (header) 1 else 0
      val inferenceLines = (stripped(files.head, skip) +:
        files.tail.map(f => stripped(f, skip + extra))).reduce(_ union _)
      val schema = reader.csv(inferenceLines).schema
      val fixed = spark.read
        .option("header", header)
        .option("nullValue", nullValue)
        .option("emptyValue", "")
        .schema(schema)
      files.map(f => fixed.csv(stripped(f, skip))).reduce(_ unionByName _)
    }
  }

  /** Glob discovery on the driver (the reference discovers its Excel
    * input by filename pattern, `:93-95`).
    */
  def resolveFiles(spark: SparkSession, pathOrGlob: String): Seq[String] = {
    val hadoopPath = new org.apache.hadoop.fs.Path(pathOrGlob)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(hadoopPath)).map(_.toSeq).getOrElse(Nil)
    val expanded = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile) else Seq(st)
    }
    expanded.map(_.getPath.toString).sorted
  }

  /** Drop rows where every column is null (`remove_empty("rows")`). */
  def removeEmptyRows(df: DataFrame): DataFrame = df.na.drop("all")

  /** Drop columns where every row is null (`remove_empty("cols")`).
    * One aggregate pass computes per-column non-null counts — a single
    * job over the data; do it once at ingest and cache the result.
    */
  def removeEmptyCols(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.toIndexedSeq.map(c =>
      count(col(c)).as(c)): _*).head()
    val keep = df.columns.zipWithIndex
      .collect { case (c, i) if counts.getLong(i) > 0L => c }
    df.select(keep.toIndexedSeq.map(col): _*)
  }

  def removeEmpty(df: DataFrame): DataFrame =
    removeEmptyCols(removeEmptyRows(df))
}
