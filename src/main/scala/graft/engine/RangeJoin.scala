package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each left point row to EVERY right
  * interval containing it — `l.ts BETWEEN r.start AND r.end`, plus
  * optional equi keys. The one-to-many sibling of the as-of join
  * (engine.AsOf matches only the latest).
  *
  * Spark plans a raw BETWEEN predicate as BroadcastNestedLoop (or a
  * cartesian on two big sides) — O(|L|·|R|) comparisons, a
  * scale-killer. The standard fix (what commercial engines expose as
  * a "range join hint", and DuckDB solves with IEJoin) recast as
  * plain relational algebra:
  *
  *  1. pick a bin width W (≈ typical interval length);
  *  2. explode each interval to the bins it overlaps —
  *     floor(start/W) .. floor(end/W), ~(len/W + 1) rows;
  *  3. map each point to its single bin floor(ts/W);
  *  4. equi-join on (keys..., bin) — hash shuffle, AQE-skew-safe —
  *     and verify the exact BETWEEN on the survivors.
  *
  * Every qualifying (point, interval) pair meets in EXACTLY one bin
  * (the point's), so no dedup pass is needed. Cost is
  * |L| + |R|·(len/W + 1) shuffled rows instead of |L|·|R|
  * comparisons; W trades replication (small W) against bin
  * selectivity (large W).
  */
object RangeJoin {

  /** @param left      point side
    * @param right     interval side
    * @param on        equi-join keys present on both sides
    * @param ts        left timestamp column (TimestampType)
    * @param start,end right interval bound columns (TimestampType,
    *                  inclusive; rows with null/inverted bounds drop)
    * @param binWidth  bin width as a duration in seconds
    */
  def binned(left: DataFrame, right: DataFrame, on: Seq[String],
             ts: String, start: String, end: String,
             binWidth: Long = 3600L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collisions = right.columns.toSet.intersect(left.columns.toSet) -- on
    require(collisions.isEmpty, s"rename right columns first: $collisions")
    val w = binWidth * 1000000L // micros
    def bin(c: Column): Column = floor(unix_micros(c) / w)
    // SQL comparison semantics: null bounds never match; inverted
    // intervals are empty
    val r = right
      .filter(col(start).isNotNull && col(end).isNotNull &&
        col(start) <= col(end))
      .withColumn("_bin",
        explode(sequence(bin(col(start)), bin(col(end)))))
    val l = left
      .filter(col(ts).isNotNull)
      .withColumn("_bin", bin(col(ts)))
    l.join(r, on :+ "_bin")
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("_bin")
  }
}
