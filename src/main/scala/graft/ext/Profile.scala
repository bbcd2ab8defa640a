package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling and data-quality operators — the "catalog metadata
  * generation" side of the reference (its data-dictionary sheet,
  * 01_source_me.R:170-203, is a hand-maintained static table; here the
  * profile is COMPUTED from the data, which is what a catalog prep
  * pipeline needs at scale).
  *
  * Scale design: `profileTable` is ONE aggregation pass over the
  * table — every per-column statistic is a partial-aggregable
  * expression, so the map side combines locally and the single
  * reduce sees one row per partition. Exact NDV (the oracle path)
  * adds Spark's Expand-based multi-count-distinct (still one
  * shuffle); the default scale path uses HLL approx_count_distinct
  * which stays fully combinable. `checkExpectations` folds all
  * row-level rules into the same one-pass shape; only referential
  * rules add (broadcast-able) anti-join jobs.
  */
object Profile {

  /** Render a column's min/max as an engine-portable string:
    * integers plain, doubles as micro-units (x·1e6 rounded to long —
    * sidesteps float-to-string formatting differences), timestamps
    * as 'yyyy-MM-dd HH:mm:ss', strings as-is.
    */
  private def portable(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      round(c.cast("double") * 1000000).cast("long").cast("string")
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** Table profile: per column
    * (column_name, data_type, n_rows, n_nulls, n_distinct, min_value,
    * max_value, avg_len). `avg_len` is the mean string length for
    * string columns (round 6), null otherwise.
    *
    * `exactNdv = false` (the 100 TB default) keeps EVERYTHING in one
    * aggregation pass — HLL sketches are just more agg buffers.
    * `exactNdv = true` (the oracle path) must NOT use Spark's
    * multi-count-distinct rewrite: n distinct aggregates in one agg
    * plan via Expand (row count × (n+1), all agg buffers live across
    * the expansion) measured 108 s on an 11-column 600k-row table.
    * Instead each TYPE FAMILY of columns melts to (column, value)
    * rows — a generator over only that family's columns, so the
    * parquet scans read disjoint column subsets (≈ one full-table
    * read in total) — and a single-distinct-column group count needs
    * no Expand at all. Same table, same stats: 108 s → ~2 s.
    */
  def profileTable(df: DataFrame, exactNdv: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}!n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}!nulls"),
        (if (exactNdv) lit(null).cast("long")
         else approx_count_distinct(c)).as(s"${f.name}!ndv"),
        portable(min(c), f.dataType).as(s"${f.name}!min"),
        portable(max(c), f.dataType).as(s"${f.name}!max"),
        (f.dataType match {
          case StringType => round(avg(length(c)), 6)
          case _          => lit(null).cast("double")
        }).as(s"${f.name}!len"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("data_type"),
        col(s"`${f.name}!n`").as("n_rows"),
        col(s"`${f.name}!nulls`").as("n_nulls"),
        col(s"`${f.name}!ndv`").cast("long").as("n_distinct"),
        col(s"`${f.name}!min`").as("min_value"),
        col(s"`${f.name}!max`").as("max_value"),
        col(s"`${f.name}!len`").as("avg_len"))
    }: _*)
    val base = wide.select(inline(rows))
    if (!exactNdv) base.orderBy("column_name")
    else {
      val ndv = exactNdvByColumn(df)
      base.drop("n_distinct")
        .join(broadcast(ndv), Seq("column_name"), "left")
        // an all-null column yields no melt row: COUNT(DISTINCT) = 0
        .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
        .select("column_name", "data_type", "n_rows", "n_nulls",
          "n_distinct", "min_value", "max_value", "avg_len")
        .orderBy("column_name")
    }
  }

  /** Exact per-column NDV: melt each type family's columns to
    * (column_name, value) with a generator, count distinct values per
    * column. One job per family; each scan is pruned to that family's
    * columns. Nulls excluded (COUNT(DISTINCT) semantics).
    */
  private def exactNdvByColumn(df: DataFrame): DataFrame = {
    val families: Map[DataType, Seq[StructField]] =
      df.schema.fields.toSeq.groupBy { f =>
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => LongType
          case FloatType | DoubleType                        => DoubleType
          case dt                                            => dt
        }
      }
    val parts = families.toSeq.map { case (family, cols) =>
      val melted = df.select(inline(array(cols.map(f =>
        struct(lit(f.name).as("column_name"),
          col(f.name).cast(family).as("v"))): _*)))
      melted.filter(col("v").isNotNull)
        .groupBy("column_name")
        .agg(count_distinct(col("v")).cast("long").as("n_distinct"))
    }
    parts.reduce(_ unionAll _)
  }

  /** A declarative data-quality expectation. Row-level kinds
    * (NotNull/Range/Regex/InSet) evaluate in one shared aggregation
    * pass; Unique evaluates in the same pass (n − ndv); ForeignKey
    * adds one anti-join job per rule (its dimension side is the
    * broadcast-able one in a healthy star schema).
    */
  sealed trait Expectation { def id: String; def column: String; def kind: String }
  final case class NotNull(id: String, column: String) extends Expectation {
    val kind = "not_null"
  }
  final case class Range(id: String, column: String, lo: Double, hi: Double)
      extends Expectation { val kind = "range" }
  final case class Regex(id: String, column: String, pattern: String)
      extends Expectation { val kind = "regex" }
  final case class InSet(id: String, column: String, values: Seq[String])
      extends Expectation { val kind = "in_set" }
  final case class Unique(id: String, column: String) extends Expectation {
    val kind = "unique"
  }
  final case class ForeignKey(id: String, column: String, dim: DataFrame,
                              dimColumn: String) extends Expectation {
    val kind = "foreign_key"
  }

  /** Violation count expression for a row-level rule (null never
    * violates Range/Regex/InSet — nullability is NotNull's job, the
    * usual expectation-library contract).
    */
  private def violations(e: Expectation): Column = e match {
    case NotNull(_, c)      => sum(when(col(c).isNull, 1L).otherwise(0L))
    case Range(_, c, lo, hi) =>
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
    case Regex(_, c, p) =>
      sum(when(col(c).isNotNull && !col(c).rlike(p), 1L).otherwise(0L))
    case InSet(_, c, vs) =>
      sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
    case Unique(_, c) => count(col(c)) - count_distinct(col(c))
    case _: ForeignKey =>
      throw new IllegalArgumentException("foreign_key is not row-level")
  }

  /** Evaluate expectations against `df`:
    * (rule_id, kind, column, n_violations, pass), ordered by rule_id.
    * All non-FK rules share ONE aggregation pass; each FK rule is one
    * left-anti count against its dimension.
    */
  def checkExpectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "checkExpectations: no rules given")
    require(rules.map(_.id).distinct.size == rules.size,
      "checkExpectations: duplicate rule ids")
    val (fkRules, rowRules) = rules.partition(_.isInstanceOf[ForeignKey])
    val spark = df.sparkSession
    import spark.implicits._

    val rowPart: Option[DataFrame] = if (rowRules.isEmpty) None else {
      val aggs = rowRules.map(e => violations(e).as(e.id))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val rows = array(rowRules.map { e =>
        struct(lit(e.id).as("rule_id"), lit(e.kind).as("kind"),
          lit(e.column).as("column_name"),
          col(s"`${e.id}`").cast("long").as("n_violations"))
      }: _*)
      Some(wide.select(inline(rows)))
    }
    val fkParts: Seq[DataFrame] = fkRules.map { case fk: ForeignKey =>
      val orphans = df.select(col(fk.column)).filter(col(fk.column).isNotNull)
        .join(broadcast(fk.dim.select(col(fk.dimColumn).as(fk.column)).distinct()),
          Seq(fk.column), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      orphans.select(lit(fk.id).as("rule_id"), lit(fk.kind).as("kind"),
        lit(fk.column).as("column_name"),
        col("n_violations").cast("long").as("n_violations"))
    }
    val all = (rowPart.toSeq ++ fkParts).reduce(_ unionAll _)
    all.withColumn("pass", col("n_violations") === 0L).orderBy("rule_id")
  }

  /** Robust per-group anomaly detection: flag rows whose value
    * deviates from the group median by more than `threshold` robust
    * z-units (MAD scaled by 1.4826 ≈ consistency with σ under
    * normality). Medians/MADs resist the very outliers being hunted —
    * the reason this beats mean/stddev z-scores for data-quality
    * triage.
    *
    * Two percentile aggregations (group-keyed shuffles) + broadcast
    * joins of the group-count-sized stats. Exact interpolated
    * percentiles here (the oracle path); at 100 TB swap in
    * `approx_percentile`, which is one pass and mergeable — the same
    * exact-vs-sketch trade as `profileTable`'s NDV.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  threshold: Double = 3.0,
                  scale: Double = 1.4826): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(percentile(col(valueCol), lit(0.5)).as("_med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("_ad", abs(col(valueCol) - col("_med")))
    val mad = dev.groupBy(groupCol)
      .agg(percentile(col("_ad"), lit(0.5)).as("_mad"))
    // MAD = 0 (majority-constant group): the quotient is null under
    // non-ANSI division, which would silently UNFLAG the most extreme
    // rows. Degenerate-scale rule: any deviation from the median is
    // anomalous, reported with rz = null (no finite robust z exists).
    dev.join(broadcast(mad), groupCol)
      .withColumn("rz",
        when(col("_mad") > 0,
          (col(valueCol) - col("_med")) / (lit(scale) * col("_mad"))))
      .filter((col("_mad") > 0 && abs(col("rz")) > threshold) ||
        (col("_mad") === 0 && col(valueCol) =!= col("_med")))
      .drop("_med", "_ad", "_mad")
  }
}
