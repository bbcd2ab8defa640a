package graft

import org.apache.spark.sql.types._

/** Guard against driver-side testdata schema drift (the round-8 lesson:
  * events.ts silently changed from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * and 35 queries died with opaque analysis errors). This spec pins the
  * post-`Tables.load` schema of every table at sf0.001 and fails with a
  * message NAMING the drifted column, so the next regeneration becomes
  * one actionable failure instead of a battery-wide breakage.
  */
class TestdataContractSpec extends SparkSpec {

  /** acceptable Spark types per column; timestamp-ish columns accept
    * either TZ flavour (the normalizer + UTC session make them equal)
    */
  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private def one(t: DataType): Set[DataType] = Set(t)

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq("n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq("c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq("s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq("p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq("o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq("l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> ts),
    // events.ts must be the NORMALIZED session-TZ timestamp — exactly
    // TimestampType, never NTZ or raw long — or every window collapses
    "events" -> Seq("event_id" -> one(LongType), "ts" -> one(TimestampType),
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Seq("doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq("vec_id" -> one(LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> one(IntegerType)))

  for (table <- Tables.all) test(s"testdata contract: $table") {
    val expected = contract(table)
    val got = Tables.load(spark, sf001, table).schema
    val gotMap = got.fields.map(f => f.name -> f.dataType).toMap
    val missing = expected.map(_._1).filterNot(gotMap.contains)
    assert(missing.isEmpty,
      s"table `$table` DRIFTED: missing columns ${missing.mkString(", ")}; " +
        s"loaded schema = ${got.simpleString}")
    val wrong = expected.collect {
      case (name, ok) if !ok.contains(gotMap(name)) =>
        s"$name: expected one of ${ok.map(_.simpleString).mkString("/")}, got ${gotMap(name).simpleString}"
    }
    assert(wrong.isEmpty,
      s"table `$table` DRIFTED: ${wrong.mkString("; ")}")
    val extra = got.fields.map(_.name).filterNot(expected.map(_._1).toSet)
    assert(extra.isEmpty,
      s"table `$table` DRIFTED: unexpected new columns ${extra.mkString(", ")}")
  }

  test("events streaming read path matches the batch schema exactly") {
    val batch = Tables.load(spark, sf001, "events").schema
    val stream = graft.ext.Streaming.readEvents(spark, s"$sf001/events.parquet").schema
    assert(stream === batch,
      s"streaming events schema ${stream.simpleString} != batch ${batch.simpleString}")
  }
}
