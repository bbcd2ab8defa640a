package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SCALE.md): deterministic salting for hot
  * keys, complementing AQE's runtime skew-join splitting. AQE handles
  * skew it can SEE (post-shuffle partition sizes); salting is the
  * plan-level tool when a key's row count is pathological enough that
  * even one split partition busts memory, or when AQE is off.
  */
object Skew {

  /** Deterministic salt in [0, n): hashed from the given column (use a
    * high-cardinality payload column, NOT the group key — salting by
    * the key would put every copy of the hot key in one salt bucket).
    */
  def saltOf(c: Column, n: Int): Column = pmod(xxhash64(c), lit(n.toLong)).cast("int")

  /** Two-phase salted aggregation: partial aggregate on (keys, salt)
    * spreads a hot key over `n` reducers, the final aggregate on keys
    * combines the n partials. Works for any algebraic aggregate;
    * `sum`s here. Identical results to the direct aggregation (pinned
    * in ScaleSpec) — decimal inputs keep it bit-identical.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltSrc: Column, n: Int): DataFrame =
    df.withColumn("_salt", saltOf(saltSrc, n))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))

  /** Salted equi-join for a skewed LEFT side against a smaller right
    * side: left rows get a deterministic salt, the right side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now land on `n` different
    * reducers. Right-side blowup is n× (choose n = skew factor, keep
    * the right side small or pre-filtered).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSrc: Column, n: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("_salt", saltOf(saltSrc, n))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1)))).withColumn("_salt", col("_salt").cast("int"))
    saltedLeft.join(replicatedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
