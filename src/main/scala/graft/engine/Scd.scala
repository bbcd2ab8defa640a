package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse mutation semantics Spark has no native operator for:
  * slowly-changing-dimension (type 2) snapshot merges and
  * MERGE-INTO-style upserts — both as pure, deterministic DataFrame
  * programs (no table format required; pairs with
  * [[graft.sinks.Versioned]] snapshots).
  *
  * Both are built from key-equi-joins only: one shuffle per side on
  * the key (or a broadcast when one side is dimension-sized), no
  * windows, no row-order sensitivity — every output cell is decided
  * by the (key, values) pair alone.
  */
object Scd {

  /** Two-snapshot SCD type-2 merge. For key sets O (old) / N (new)
    * and value comparison over `compareCols`:
    *
    *  - key only in O            → (old values, fromV, toV)   closed
    *  - key only in N            → (new values, toV,  null)   opened
    *  - in both, values changed  → (old values, fromV, toV) +
    *                               (new values, toV,  null)
    *  - in both, values equal    → (values,     fromV, null)  carried
    *
    * `valid_to` null = current. Comparison is null-safe equality on
    * every compare column (use exact integer/cent columns — the
    * caller quantizes).
    */
  def scd2(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String], fromV: Int, toV: Int): DataFrame = {
    val cols = keyCols ++ compareCols
    // a NULL in any key column can never equi-match, so a null-keyed
    // row would fall through both membership tests below and emit a
    // phantom closed+opened pair — drop such rows up front (the
    // AsOf.asofBackward contract): a key merge is undefined for rows
    // without a key
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val o = oldSnap.filter(keyNotNull)
      .select(cols.map(c => col(c).as("o_" + c)): _*)
    val n = newSnap.filter(keyNotNull)
      .select(cols.map(c => col(c).as("n_" + c)): _*)
    val joined = o.join(n,
      keyCols.map(k => col("o_" + k) === col("n_" + k)).reduce(_ && _),
      "full_outer")
    val inOld = col("o_" + keyCols.head).isNotNull
    val inNew = col("n_" + keyCols.head).isNotNull
    val same = compareCols.map(c => col("o_" + c) <=> col("n_" + c))
      .reduceOption(_ && _).getOrElse(lit(true))
    def oldRow = struct(cols.map(c => col("o_" + c).as(c)) :+
      lit(fromV).cast("long").as("valid_from") :+
      lit(toV).cast("long").as("valid_to"): _*)
    def carriedRow = struct(cols.map(c => col("o_" + c).as(c)) :+
      lit(fromV).cast("long").as("valid_from") :+
      lit(null).cast("long").as("valid_to"): _*)
    def newRow = struct(cols.map(c => col("n_" + c).as(c)) :+
      lit(toV).cast("long").as("valid_from") :+
      lit(null).cast("long").as("valid_to"): _*)
    val rows =
      when(inOld && !inNew, array(oldRow))
        .when(!inOld && inNew, array(newRow))
        .when(same, array(carriedRow))
        .otherwise(array(oldRow, newRow))
    joined.select(explode(rows).as("_r")).select(col("_r.*"))
  }

  /** Point-in-time (as-of) lookup against an SCD2 dimension — the
    * read side of [[scd2]]: each fact row joins the dimension version
    * whose validity interval contains the fact's as-of stamp
    * (`valid_from ≤ v` and `v < valid_to`, open-ended current rows
    * match everything from their open). LEFT join: a fact whose key
    * has NO active version at its stamp (member closed before, or
    * created after) keeps the row with NULL dimension values — the
    * "looked up a closed member" case a silent inner join would
    * drop. Scale shape: an equi-join on the key with the validity
    * predicate as the join's residual filter (never a nested loop);
    * per-key fan-out is bounded by the version count, and SCD2's
    * disjoint-interval invariant makes at most one version match.
    */
  def pitLookup(facts: DataFrame, dim: DataFrame, keyCols: Seq[String],
                asOfCol: String, fromCol: String = "valid_from",
                toCol: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty, "pitLookup: need key columns")
    val valCols = dim.columns.filterNot(keyCols.contains)
    // the output is facts.* ++ dim value columns under their original
    // names — an overlap would emit duplicate column names and make
    // every downstream col() reference ambiguous. Fail loudly instead.
    val clash = facts.columns.toSet
      .intersect(valCols.filterNot(_ == toCol).toSet)
    require(clash.isEmpty,
      s"pitLookup: fact/dimension column name clash on ${clash.mkString(", ")} — " +
        "rename or drop the overlapping columns on one side first")
    val d = dim.select(keyCols.map(c => col(c).as("_k_" + c)) ++
      valCols.map(c => col(c).as("_v_" + c)): _*)
    val cond = keyCols.map(k => col(k) === col("_k_" + k)).reduce(_ && _) &&
      col("_v_" + fromCol) <= col(asOfCol) &&
      (col("_v_" + toCol).isNull || col(asOfCol) < col("_v_" + toCol))
    facts.join(d, cond, "left")
      .select(facts.columns.toSeq.map(col) ++
        valCols.filterNot(_ == toCol).toSeq.map(c => col("_v_" + c).as(c)): _*)
  }

  /** MERGE-INTO semantics from a declarative change feed: `changes`
    * carries an `opCol` ∈ {'U','I','D'} (update / insert / delete)
    * plus the full row. Result = target with matched-U rows replaced,
    * matched-D rows dropped, and I rows appended (an I whose key
    * already exists upserts like a U — idempotent-feed friendly).
    * Unknown op values fail loudly; so does a feed carrying MORE than
    * one non-D row for the same key (two Us, or an I then a U) —
    * MERGE semantics are one surviving row per key, and with no
    * ordering column "which write wins" is undefined, so the feed is
    * rejected rather than silently emitting duplicate keys. Compact
    * the feed (last-writer-wins on YOUR order column) before calling.
    */
  def mergeUpsert(target: DataFrame, changes: DataFrame, keyCols: Seq[String],
                  opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dataCols = target.columns.toSeq
    val guarded = changes.withColumn(opCol,
      when(col(opCol).isin("U", "I", "D"), col(opCol))
        .otherwise(raise_error(concat(lit("mergeUpsert: unknown op '"),
          col(opCol).cast("string"), lit("'")))))
    val keyed = guarded.select((keyCols.map(col) :+ col(opCol)) ++
      dataCols.filterNot(keyCols.contains).map(col): _*)
    val survivors = target.join(
      keyed.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    // duplicate-key guard: a key-partitioned COUNT window (order-free,
    // so no row-order sensitivity enters) that raises inside the plan
    // — stays lazy, one extra in-partition pass over the feed only
    val perKey = count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*))
    val applied = keyed.filter(col(opCol) =!= "D")
      .withColumn("_nk", perKey)
      .withColumn("_dup_guard", when(col("_nk") > 1,
        raise_error(concat(lit("mergeUpsert: feed has multiple non-D rows " +
          "for key ("), concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
          lit(") — compact the feed to one row per key first"))))
        .otherwise(lit(0)))
      .filter(col("_dup_guard") === 0)
      .select(dataCols.map(col): _*)
    survivors.unionByName(applied)
  }
}
