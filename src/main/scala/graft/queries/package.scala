package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** One harness-checked query: a Spark DataFrame program and, when
    * SQL-expressible, the equivalent DuckDB oracle SQL over the same
    * parquet tables. `sql = None` → the driver records a weaker
    * rows-only check.
    */
  final case class Q(name: String,
                     fn: (SparkSession, String) => DataFrame,
                     sql: Option[String])

  object Q {
    def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, Some(sql))
  }

  /** Money columns in the testdata are exact 2-decimal doubles
    * (verified per column). Casting to DECIMAL(18,2) is therefore
    * EXACT, and summing in decimal is associative — the only way a
    * distributed Spark sum and a single-threaded DuckDB sum are
    * guaranteed bit-identical regardless of partial-aggregation
    * order. Final results are cast back to double so output schemas
    * match the oracle's `CAST(... AS DOUBLE)`.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum surfaced as double. Oracle equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")
}
