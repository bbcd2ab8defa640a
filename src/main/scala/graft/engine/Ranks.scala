package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT rank machinery. The naive form of ntile /
  * global row_number is a partition-less Window — a single-reducer
  * sort of the whole frame, the one plan shape that cannot survive a
  * 100× scale-up. These helpers compute the SAME answer from a
  * decomposition whose only ordered window runs over the bounded
  * VALUE DICTIONARY:
  *
  *   global_rank(row) = (# rows with a strictly smaller value)   — a
  *                      cumulative count over the value dictionary,
  *                      broadcast back —
  *                    + rank of the row among its value's ties     — a
  *                      Window PARTITIONED by value (parallel).
  *
  * The ntile bucket then follows from the rank and the total count by
  * SQL-standard arithmetic (first N mod n buckets get one extra row),
  * so the result is bit-identical to `ntile(n) OVER (ORDER BY v, id)`
  * in any engine while every corpus-sized operation stays a hash
  * aggregation or a partitioned window.
  */
object Ranks {

  /** Exact integer floor-division of two non-negative long columns.
    * `(a - a mod b)` is divisible by `b`, so the double division is
    * exact for any realistic row count (< 2^53). */
  def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Exact global rank (1-based, `row_number` semantics) over
    * `ORDER BY valueCol [DESC], idCol` without a partition-less
    * row-scale Window. Appends `out` (LongType) and — when
    * `withTotal` — `_n_total` (LongType, the frame's row count);
    * callers that don't need the total pass `withTotal = false` and
    * save the 1-row broadcast crossJoin. `idCol` must be unique per
    * row (it is the tie-break that makes row_number deterministic). */
  def rowNumberExact(df: DataFrame, valueCol: String, idCol: String,
                     valueDesc: Boolean = false,
                     out: String = "_rn",
                     withTotal: Boolean = true): DataFrame = {
    val dict = df.groupBy(col(valueCol)).agg(count(lit(1)).as("_c"))
    val ord = if (valueDesc) col(valueCol).desc else col(valueCol).asc
    val wd = Window.orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = dict
      .withColumn("_below", coalesce(sum("_c").over(wd), lit(0L)))
      .select(col(valueCol).as("_rv"), col("_below"))
    val tieOrd = Window.partitionBy(col(valueCol)).orderBy(col(idCol))
    // NULL-SAFE equi-join (still hash-joinable): a plain USING join
    // would silently DROP rows whose value is null instead of ranking
    // them — nulls form a dictionary group like any other value.
    // (Cross-engine note: Spark sorts nulls FIRST ascending, DuckDB
    // LAST — oracle-facing callers must not feed nullable values.)
    val joined = df.join(broadcast(below), col(valueCol) <=> col("_rv"))
      .drop("_rv")
    val withTot =
      if (withTotal)
        joined.crossJoin(broadcast(
          dict.agg(sum("_c").cast("long").as("_n_total"))))
      else joined
    withTot
      .withColumn(out, col("_below") + row_number().over(tieOrd).cast("long"))
      .drop("_below")
  }

  /** Exact ntile(n) over `ORDER BY valueCol [DESC], idCol` — appends
    * `out` as LongType. Matches `CAST(ntile(n) OVER (ORDER BY v, id)
    * AS BIGINT)` exactly, including tie splitting across bucket
    * boundaries and the short-frame (N < n) case, with no
    * partition-less Window over the row-scale frame. */
  def ntileExact(df: DataFrame, n: Int, valueCol: String, idCol: String,
                 valueDesc: Boolean = false,
                 out: String = "bucket"): DataFrame = {
    require(n >= 1, s"ntileExact: n must be >= 1, got $n")
    val ranked = rowNumberExact(df, valueCol, idCol, valueDesc, out = "_rn")
    // SQL ntile: q = N div n rows per bucket, the first r = N mod n
    // buckets take one extra row. greatest(q, 1) guards the (never
    // selected when q = 0) divisor under ANSI arithmetic.
    val nn = lit(n.toLong)
    val q = idiv(col("_n_total"), nn)
    val r = pmod(col("_n_total"), nn)
    val cut = r * (q + lit(1L))
    ranked
      .withColumn(out,
        when(col("_rn") <= cut, idiv(col("_rn") - lit(1L), q + lit(1L)) + lit(1L))
          .otherwise(r + idiv(col("_rn") - cut - lit(1L), greatest(q, lit(1L)))
            + lit(1L)))
      .drop("_rn", "_n_total")
  }

  /** Exact global rank AND running sum of the value column over
    * `ORDER BY valueCol [DESC], idCol` — the pair whale-share /
    * concentration curves need. Appends `outRank`, `outCum` (both
    * LongType; `outCum` = sum of `valueCol` over ranks 1..rank) and,
    * when `withTotal`, `_n_total`. Within a tie group every row carries the SAME value,
    * so the running sum decomposes exactly like the rank: (sum over
    * strictly-prior dictionary values, broadcast back) + value × tie
    * position. Bit-identical to `sum(v) OVER (ORDER BY v [DESC], id
    * ROWS UNBOUNDED PRECEDING)` with no row-scale global sort.
    * `valueCol` must be integral (it is summed as LongType). */
  def rowNumberWithRunningSum(df: DataFrame, valueCol: String, idCol: String,
                              valueDesc: Boolean = false,
                              outRank: String = "_rn",
                              outCum: String = "_cum",
                              withTotal: Boolean = true): DataFrame = {
    val v = col(valueCol).cast("long")
    val dict = df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("_c"), (v * count(lit(1))).as("_vs"))
    val ord = if (valueDesc) col(valueCol).desc else col(valueCol).asc
    val wd = Window.orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = dict
      .withColumn("_below", coalesce(sum("_c").over(wd), lit(0L)))
      .withColumn("_sum_before", coalesce(sum("_vs").over(wd), lit(0L)))
      .select(col(valueCol).as("_rv"), col("_below"), col("_sum_before"))
    val tieOrd = Window.partitionBy(col(valueCol)).orderBy(col(idCol))
    val joined = df.join(broadcast(below), col(valueCol) <=> col("_rv"))
      .drop("_rv")
    val withTot =
      if (withTotal)
        joined.crossJoin(broadcast(
          dict.agg(sum("_c").cast("long").as("_n_total"))))
      else joined
    withTot
      .withColumn("_tie", row_number().over(tieOrd).cast("long"))
      .withColumn(outRank, col("_below") + col("_tie"))
      .withColumn(outCum, col("_sum_before") + v * col("_tie"))
      .drop("_below", "_sum_before", "_tie")
  }

  /** Scale-safe exact top-k: `ORDER BY … LIMIT k`, which Spark plans
    * as TakeOrderedAndProject — per-partition top-k then a k-row
    * merge, never a full global sort. Use this instead of the
    * `row_number().over(Window.orderBy(…)) <= k` idiom, which IS the
    * single-reducer sort this object exists to avoid. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame = {
    require(k >= 1, s"topK: k must be >= 1, got $k")
    df.orderBy(order: _*).limit(k)
  }

  /** Exact nearest-rank quantile selection over a value column: for
    * each requested rank expression (a function of the total count
    * `n`), the value at that 1-based position of the ascending sort —
    * computed from cumulative counts over the VALUE DICTIONARY (the
    * element at rank k is the smallest value whose cumulative count
    * reaches k), never a row-scale sort. Returns one row:
    * `n_total` plus one LongType column per entry in `ranks`
    * (name -> rank-of-n expression, evaluated against `col("_n")`). */
  def nearestRank(df: DataFrame, valueCol: String,
                  ranks: Seq[(String, Column => Column)]): DataFrame = {
    val dict = df.groupBy(col(valueCol)).agg(count(lit(1)).as("_c"))
    val cum = dict.withColumn("_cum",
      sum("_c").over(Window.orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val tot = dict.agg(sum("_c").cast("long").as("_n"))
    val sels = ranks.map { case (name, rk) =>
      min(when(col("_cum") >= rk(col("_n")), col(valueCol))).as(name)
    }
    cum.crossJoin(broadcast(tot))
      .agg(max("_n").as("n_total"), sels: _*)
  }

  /** Grouped twin of [[nearestRank]]: exact nearest-rank selection
    * WITHIN each key group, from per-group cumulative counts over the
    * (key, value) dictionary. Both windows are PARTITIONED by the key
    * (no global ordering anywhere) and run on the dictionary, not the
    * rows. Returns one row per key: the key columns, `n_total` (the
    * group's row count) and one column per rank entry (name ->
    * rank-of-n expression, evaluated against the group's `_n`). */
  def nearestRankBy(df: DataFrame, keyCols: Seq[String], valueCol: String,
                    ranks: Seq[(String, Column => Column)]): DataFrame = {
    val ks = keyCols.map(col)
    val dict = df.groupBy(ks :+ col(valueCol): _*)
      .agg(count(lit(1)).as("_c"))
    val part = Window.partitionBy(ks: _*)
    val cum = dict
      .withColumn("_cum", sum("_c").over(part.orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_n", sum("_c").over(part))
    val sels = ranks.map { case (name, rk) =>
      min(when(col("_cum") >= rk(col("_n")), col(valueCol))).as(name)
    }
    cum.groupBy(ks: _*).agg(max("_n").cast("long").as("n_total"), sels: _*)
  }
}
