package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Joins, Reshape}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-domain batteries; each entry pairs a
  * Spark DataFrame program with (where SQL-expressible) DuckDB oracle
  * SQL over the same parquet tables, compared by the driver at sf0.01.
  */
object SparkEntry {

  private val batteries: Seq[Q] =
    Relational.queries ++ TextQueries.queries ++ SimilarityQueries.queries ++
      CorpusQueries.queries

  /** Flagship query (SURVEY.md §3.3, Pipeline C analogue:
    * filter → unpivot → aggregate → broadcast natural inner join →
    * renamed projection) on sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    // "job openings" analogue: one variable sliced out of a measures table
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "A")                    // :326-328 filter
    val long = Reshape.unpivot(li,                            // :330 pivot_longer
      ids = Seq("l_orderkey", "l_partkey"),
      values = Seq("l_quantity", "l_extendedprice"),
      nameCol = "measure", valueCol = "value")
    val agg = long.filter(col("measure") === "l_quantity")
      .groupBy(col("l_partkey").as("partkey"))                // :331-332 grouped sum
      .agg(sum(col("value")).as("qty"))
    // "clusters" analogue: small dimension, natural inner join (:339)
    val dim = Tables.load(spark, dir, "part")
      .select(col("p_partkey").as("partkey"), col("p_brand"), col("p_type"))
    Joins.naturalInner(agg, broadcast(dim))
      .groupBy(col("p_brand").as("Occ Group: Skills Cluster")) // :340-344 rename
      .agg(sum(col("qty")).as(s"LMO Job Openings 1995-2005"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    batteries.map(q => q.name -> q.fn).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted entries → rows-only check.
    */
  def oracleSql: Map[String, String] =
    batteries.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
