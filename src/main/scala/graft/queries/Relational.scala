package graft.queries

import graft.Tables
import graft.engine.{Horizon, Joins, Reshape}
import graft.engine.TrackedCache.Trackable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator battery (SURVEY.md §2.1-§2.8), one
  * harness-checked query per operator family, expressed over the
  * TPC-H-ish testdata tables.
  *
  * Determinism contract with the DuckDB oracle:
  *  - every aggregate over money columns goes through DECIMAL(18,2)
  *    (exact — see graft.queries package doc) and is surfaced as
  *    DOUBLE;
  *  - every query ends in a total ORDER BY (unique tiebreak keys);
  *  - counts are BIGINT on both sides;
  *  - pow()/division results are round()-ed to 6 decimals on both
  *    sides (last-ulp libm differences).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared gaps-and-islands oracle for sessionization: q23 runs the
    * declarative session_window form, q92 the arbitrary-state
    * (flatMapGroupsWithState batch twin) form — identical output by
    * construction, both hash-checked against this SQL. A session
    * closes when the next event is >= gap after the last (window end
    * is exclusive), hence >= in the island test.
    */
  private val sessionizeSql: String =
    """WITH m AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |), s AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m
      |)
      |SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(MAX(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val queries: Seq[Q] = Seq(

    // ——— A1 grouped aggregation (TPC-H Q1 shape) ———
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ——— P1/F1 scan + projection + filter (pushdown-visible) ———
    Q("q02_scan_project_filter",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 200000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ——— F2 IN-list ———
    Q("q03_filter_inlist",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderpriority")
    },

    // ——— F3 negated IN-list (reference `!geographic_area %in%`, :125) ———
    Q("q04_filter_not_inlist",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer
        |WHERE c_mktsegment NOT IN ('AUTOMOBILE', 'HOUSEHOLD')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .filter(!col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
        .orderBy("c_mktsegment")
    },

    // ——— F4 regex match (reference `!grepl("Non", ...)`, :74) ———
    Q("q05_filter_regex",
      """SELECT p_partkey, p_name, p_brand
        |FROM part
        |WHERE NOT regexp_matches(p_name, '(green|blue)')
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .filter(!col("p_name").rlike("(green|blue)"))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    },

    // ——— P7/X1/X2 derived columns: substring, concat ———
    Q("q06_derived_columns",
      """SELECT c_custkey,
        |  substring(c_name, 3, 3) AS name_mid,
        |  concat('#', c_name) AS tagged,
        |  upper(c_mktsegment) AS seg
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        substring(col("c_name"), 3, 3).as("name_mid"),
        concat(lit("#"), col("c_name")).as("tagged"),
        upper(col("c_mktsegment")).as("seg"))
        .orderBy("c_custkey")
    },

    // ——— A4 distinct + sort (region roster, :189) ———
    Q("q07_distinct_sort",
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment") { (s, dir) =>
      t(s, dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")
    },

    // ——— R1 unpivot / melt (pivot_longer, :101) ———
    Q("q08_unpivot",
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |)
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin) { (s, dir) =>
      // `value` in the sort: (l_orderkey, l_linenumber) is NOT unique
      // in the synthetic lineitem — rows tied on all sort keys must be
      // identical rows for the order-sensitive compare to be total
      Reshape.unpivot(
        t(s, dir, "lineitem"),
        ids = Seq("l_orderkey", "l_linenumber"),
        values = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        nameCol = "measure", valueCol = "value")
        .orderBy("l_orderkey", "l_linenumber", "measure", "value")
    },

    // ——— R2 pivot / widen (pivot_wider, :108) ———
    Q("q09_pivot",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .orderBy("l_returnflag")
    },

    // ——— R4 separate: split at FIRST separator (:336) ———
    Q("q10_separate",
      """SELECT o_orderkey,
        |  split_part(o_orderpriority, '-', 1) AS prio_code,
        |  CASE WHEN strpos(o_orderpriority, '-') > 0
        |       THEN substring(o_orderpriority, strpos(o_orderpriority, '-') + 1)
        |       ELSE NULL END AS prio_name
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Reshape.separate(
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        "o_orderpriority", ("prio_code", "prio_name"), "-")
        .select("o_orderkey", "prio_code", "prio_name")
        .orderBy("o_orderkey")
    },

    // ——— A2 per-group CAGR (cagrs(), :50-62) over yearly order totals ———
    Q("q11_cagr",
      """WITH yearly AS (
        |  SELECT o_orderpriority, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS value
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT o_orderpriority,
        |  ROUND(POWER(CAST(MAX(CASE WHEN year = 2000 THEN value END) AS DOUBLE)
        |            / CAST(MAX(CASE WHEN year = 1995 THEN value END) AS DOUBLE), 0.2) - 1, 6)
        |    AS "1st 5-year CAGR"
        |FROM yearly
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val yearly = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("year"))
        .agg(sum(dec2(col("o_totalprice"))).as("value"))
      Horizon.cagrs(yearly, Seq("o_orderpriority"), fyod = 1995)
        .select(col("o_orderpriority"),
          round(col(Horizon.cagr1Name), 6).as(Horizon.cagr1Name))
        .orderBy("o_orderpriority")
    },

    // ——— A3 horizon sums, base year EXCLUDED (sums(), :63-71) ———
    Q("q12_horizon_sums",
      """WITH yearly AS (
        |  SELECT o_orderpriority, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS value
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN year BETWEEN 1996 AND 2000 THEN value END) AS DOUBLE) AS "1st 5-year Sum",
        |  CAST(SUM(CASE WHEN year BETWEEN 2001 AND 2005 THEN value END) AS DOUBLE) AS "2nd 5-year Sum",
        |  CAST(SUM(CASE WHEN year BETWEEN 1996 AND 2005 THEN value END) AS DOUBLE) AS "10-year Sum"
        |FROM yearly
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val yearly = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("year"))
        .agg(sum(dec2(col("o_totalprice"))).as("value"))
      Horizon.horizonSums(yearly, Seq("o_orderpriority"), fyod = 1995)
        .select(col("o_orderpriority"),
          col(Horizon.sum1Name).cast("double").as(Horizon.sum1Name),
          col(Horizon.sum2Name).cast("double").as(Horizon.sum2Name),
          col(Horizon.sum10Name).cast("double").as(Horizon.sum10Name))
        .orderBy("o_orderpriority")
    },

    // ——— J1 natural left join with inferred keys (add_jo, :78-84) ———
    Q("q13_natural_left_join",
      """SELECT c.c_custkey AS custkey, c.c_name AS name, c.c_acctbal AS acctbal,
        |       o.n_orders, o.total_spent
        |FROM customer c
        |LEFT JOIN (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |  FROM orders GROUP BY o_custkey
        |) o ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").select(
        col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      val ordAgg = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
        .withColumnRenamed("o_custkey", "custkey")
      Joins.naturalLeft(cust, ordAgg).orderBy("custkey")
    },

    // ——— J2 inner equi-join, broadcast dims (three-way) ———
    Q("q14_join_broadcast",
      """SELECT p.p_brand, n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY p.p_brand, n.n_name
        |ORDER BY p.p_brand, n.n_name""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val part = broadcast(t(s, dir, "part"))
      val supp = broadcast(t(s, dir, "supplier"))
      val nat = broadcast(t(s, dir, "nation"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy("p_brand", "n_name")
        .agg(
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("p_brand", "n_name")
    },

    // ——— semi join (EXISTS) ———
    Q("q15_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // ——— anti join (NOT EXISTS) ———
    Q("q16_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // ——— set ops: UNION DISTINCT then EXCEPT ———
    Q("q17_setops",
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |)
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey").as("k"))
      f.union(open).distinct().except(auto).orderBy("k")
    },

    // ——— window: ranking (top-3 orders per customer) ———
    Q("q18_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    // ——— window: running sum (frame, exact decimal state) ———
    Q("q19_window_running",
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running", sum(dec2(col("value"))).over(w).cast("double"))
        .select("user_id", "event_id", "running")
        .orderBy("user_id", "event_id")
    },

    // ——— window: lead/lag/first (event-to-event deltas) ———
    Q("q66_window_leadlag",
      """SELECT user_id, event_id,
        |  CAST(COALESCE(LAG(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS DOUBLE) AS prev_value,
        |  CAST(COALESCE(LEAD(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS DOUBLE) AS next_value,
        |  CAST(FIRST_VALUE(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS first_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          coalesce(lag(dec2(col("value")), 1).over(w), lit(0)).cast("double")
            .as("prev_value"),
          coalesce(lead(dec2(col("value")), 1).over(w), lit(0)).cast("double")
            .as("next_value"),
          first(dec2(col("value"))).over(wf).cast("double").as("first_value"))
        .orderBy("user_id", "event_id")
    },

    // ——— window: time-RANGE frame (trailing 1-hour sum per user) —
    //     ordered on epoch micros so peer groups agree across engines ———
    Q("q67_range_window",
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS hour_sum
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          sum(dec2(col("value"))).over(w).cast("double").as("hour_sum"))
        .orderBy("user_id", "event_id")
    },

    // ——— datetime function battery (trunc/extract/add/diff) ———
    Q("q68_datetime",
      """SELECT o_orderkey,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST(EXTRACT(hour FROM o_orderdate) AS BIGINT) AS hr,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS days_since
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // DuckDB dayofweek: Sunday = 0; Spark dayofweek: Sunday = 1
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          hour(col("o_orderdate")).cast("long").as("hr"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey")
    },

    // ——— rollup (hierarchy totals the reference consumes pre-built) ———
    Q("q20_rollup",
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
      // Spark 4.1's DetectAmbiguousSelfJoin false-positives on ANY
      // rollup/cube above a join (the Expand node re-emits the
      // grouping attributes, which the detector misreads as a self
      // join). Plan semantics are unambiguous — disable the check for
      // THIS dataframe's (eager) analysis only, then restore, so the
      // rest of the session keeps the guard.
      val key = "spark.sql.analyzer.failAmbiguousSelfJoin"
      val saved = s.conf.getOption(key)
      s.conf.set(key, "false")
      try {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup("r_name", "n_name")
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("bal"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      } finally {
        saved match {
          case Some(v) => s.conf.set(key, v)
          case None    => s.conf.unset(key)
        }
      }
    },

    // ——— top-k (order by + limit, deterministic tiebreak) ———
    Q("q21_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    },

    // ——— time-bucketed aggregation (batch form of the streaming agg) ———
    Q("q22_events_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
      // hour emitted as a string: timestamp columns round-trip through
      // parquet with engine-specific tz annotations; strings compare
      // identically everywhere (session TZ is UTC on both sides).
      t(s, dir, "events")
        .withColumn("hour", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("hour", "event_type")
    },

    // ——— session windows (batch form of the streaming sessionize;
    //     oracle = gaps-and-islands SQL). Spark closes a session when
    //     the next event is >= gap after the last (window end is
    //     exclusive), hence >= in the oracle's island test. ———
    Q("q23_sessionize", sessionizeSql) { (s, dir) =>
      graft.ext.Streaming.sessionize(t(s, dir, "events"), "5 minutes")
        .orderBy("user_id", "session_start")
    },

    // ——— STREAMING execution against the batch oracle: the hourly
    //     aggregate runs as a real Structured Streaming query
    //     (readStream file source → window agg → memory sink,
    //     complete mode so every window emits) and its output must
    //     hash-match q22's SQL — the strongest form of the
    //     batch/stream equivalence laws in StreamingSpec. ———
    Q("q100_streaming_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
      val q = graft.ext.Streaming.runToMemory(
        graft.ext.Streaming.hourlyAgg(stream), "q100_hourly",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      s.table("q100_hourly").orderBy("hour", "event_type")
    },

    // ——— STREAMING sessionization against the batch oracle: session
    //     windows as a real streaming query, complete mode (every
    //     session emits regardless of watermark), hash-matched to
    //     q23's gaps-and-islands SQL. ———
    Q("q101_streaming_sessions", sessionizeSql) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
      val q = graft.ext.Streaming.runToMemory(
        graft.ext.Streaming.sessionize(stream, "5 minutes"), "q101_sessions",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      s.table("q101_sessions").orderBy("user_id", "session_start")
    },

    // ——— STREAMING stateful dedup against the batch oracle: real
    //     streaming execution (file source → dropDuplicates state
    //     store → append-mode memory sink); each (user, type) pair
    //     emits exactly once, on first arrival — the result table IS
    //     the distinct set, hash-matched to plain SELECT DISTINCT.
    //     The bounded-state production form (watermark horizon +
    //     dropDuplicatesWithinWatermark, `Streaming.dedupStream`) is
    //     law-tested in StreamingSpec; this entry runs the exact
    //     finite-replay form so the oracle is exact. ———
    Q("q111_streaming_dedup",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
        .select("user_id", "event_type")
      val q = graft.ext.Streaming.runToMemory(
        stream.dropDuplicates("user_id", "event_type"), "q111_dedup",
        org.apache.spark.sql.streaming.OutputMode.Append)
      q.stop()
      s.table("q111_dedup").orderBy("user_id", "event_type")
    },

    // ——— robust anomaly detection: per-event-type median/MAD z-score
    //     (resists the outliers being hunted, unlike mean/stddev);
    //     exact interpolated percentiles for the oracle, the
    //     approx_percentile sketch is the documented 100 TB swap. ———
    Q("q117_mad_anomalies",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1
        |), dev AS (
        |  SELECT e.event_id, e.event_type, e.value, s.med,
        |    ABS(e.value - s.med) AS ad
        |  FROM events e JOIN med s USING (event_type)
        |), mad AS (
        |  SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1
        |)
        |SELECT d.event_id, d.event_type,
        |  ROUND(d.value, 6) AS value,
        |  CASE WHEN m.mad > 0
        |       THEN ROUND((d.value - d.med) / (1.4826 * m.mad), 6) END AS rz
        |FROM dev d JOIN mad m USING (event_type)
        |WHERE (m.mad > 0 AND ABS((d.value - d.med) / (1.4826 * m.mad)) > 3)
        |   OR (m.mad = 0 AND d.value <> d.med)
        |ORDER BY d.event_id""".stripMargin) { (s, dir) =>
      graft.ext.Profile.madOutliers(t(s, dir, "events"), "value", "event_type",
        threshold = 3.0)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"), round(col("rz"), 6).as("rz"))
        .orderBy("event_id")
    },

    // ——— ordered event funnel (view → click → purchase, each step
    //     strictly after the last): ONE shuffle + a sorted-array fold
    //     per user — not a per-step chain of aggregate+join rounds.
    //     The oracle derives the same semantics via stage-wise
    //     min-joins, so two independent formulations must agree. ———
    Q("q115_funnel",
      """WITH users AS (SELECT DISTINCT user_id FROM events
        |       WHERE event_type IN ('view', 'click', 'purchase')),
        |s0 AS (SELECT user_id, MIN(ts) t FROM events
        |       WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
        |       JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
        |                AND e.ts <= s0.t + INTERVAL 24 HOUR
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |                AND e.ts <= s1.t + INTERVAL 24 HOUR
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT u.user_id,
        |  strftime(s0.t, '%Y-%m-%d %H:%M:%S') AS t_view,
        |  strftime(s1.t, '%Y-%m-%d %H:%M:%S') AS t_click,
        |  strftime(s2.t, '%Y-%m-%d %H:%M:%S') AS t_purchase,
        |  CAST(CASE WHEN s2.t IS NOT NULL THEN 3
        |            WHEN s1.t IS NOT NULL THEN 2
        |            WHEN s0.t IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
        |FROM users u
        |LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
        |LEFT JOIN s2 USING (user_id)
        |ORDER BY u.user_id""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.funnel(t(s, dir, "events"),
        steps = Seq("view", "click", "purchase"), maxGap = Some("24 hours"))
        .select(col("user_id"),
          date_format(timestamp_micros(col("t0")), "yyyy-MM-dd HH:mm:ss").as("t_view"),
          date_format(timestamp_micros(col("t1")), "yyyy-MM-dd HH:mm:ss").as("t_click"),
          date_format(timestamp_micros(col("t2")), "yyyy-MM-dd HH:mm:ss").as("t_purchase"),
          col("stage"))
        .orderBy("user_id")
    },

    // ——— the SAME sessionization through the ARBITRARY-STATE path
    //     (flatMapGroupsWithState's batch twin; shared merge core with
    //     the streaming operator) — q23's declarative session_window
    //     and this stateful form must agree row-for-row, so both run
    //     against the identical gaps-and-islands oracle. ———
    Q("q92_sessionize_stateful", sessionizeSql) { (s, dir) =>
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.ext.Streaming.SessEvent]
      graft.ext.Streaming.sessionizeStatefulBatch(ev, "5 minutes")
        .toDF()
        .orderBy("user_id", "session_start")
    },

    // ——— SQL front end: the same engine driven through spark.sql over
    //     registered views (the oracle runs a dialect-shared text) ———
    Q("q26_sql_frontend",
      """SELECT c.c_mktsegment, o.o_orderpriority,
        |  CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY c.c_mktsegment, o.o_orderpriority
        |ORDER BY c.c_mktsegment, o.o_orderpriority""".stripMargin) { (s, dir) =>
      Seq("customer", "orders", "lineitem").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT c.c_mktsegment, o.o_orderpriority,
          |  CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
          |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
          |FROM customer c
          |JOIN orders o ON c.c_custkey = o.o_custkey
          |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |GROUP BY c.c_mktsegment, o.o_orderpriority
          |ORDER BY c.c_mktsegment, o.o_orderpriority""".stripMargin)
    },

    // ——— exact interpolated percentiles (same linear-interpolation
    //     definition as DuckDB quantile_cont) ———
    Q("q24_percentiles",
      """SELECT o_orderpriority,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // ——— cube (all grouping-set combinations) ———
    Q("q25_cube",
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ——— grouping sets (finer than rollup/cube; via the SQL surface,
    //     which is the only Spark API for arbitrary set lists) ———
    Q("q27_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // ——— JSON extraction from the props payload column ———
    Q("q28_json_extract",
      """SELECT CAST(CAST(json_extract(props, '$.k') AS VARCHAR) AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1
        |ORDER BY k""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("k")
    },

    // ——— date-part seasonality (month/year extraction) ———
    Q("q29_monthly_seasonality",
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY yr, mo""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("yr", "mo")
    },

    // ——— null-handling functions (nullif/coalesce/greatest/least;
    //     the testdata has no natural nulls, so nullif plants them) ———
    Q("q56_null_handling",
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_discount, 0.0) AS disc_or_null,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_coalesced,
        |  greatest(l_quantity, l_discount * 100) AS g,
        |  least(l_tax, l_discount) AS l,
        |  CAST(count(nullif(l_discount, 0.0)) OVER () AS BIGINT) AS n_nonzero
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_discount, l_quantity, l_tax""".stripMargin) { (s, dir) =>
      // sort includes the source measures: (l_orderkey, l_linenumber)
      // is not unique in the synthetic lineitem (the q56 tie-order
      // mismatch caught this); ties on all five keys are identical
      // output rows. The global count comes via a broadcast scalar —
      // a global window AFTER the sort would re-exchange and could
      // scramble the order. Helper sort columns are dropped by a
      // Project above the Sort, which preserves order.
      val li = t(s, dir, "lineitem")
      val nNonzero = li.agg(
        count(nullif(col("l_discount"), lit(0.0))).as("n_nonzero"))
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_coalesced"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"),
        col("l_discount").as("_s1"), col("l_quantity").as("_s2"),
        col("l_tax").as("_s3"))
        .crossJoin(broadcast(nNonzero))
        .orderBy("l_orderkey", "l_linenumber", "_s1", "_s2", "_s3")
        .drop("_s1", "_s2", "_s3")
    },

    // ——— statistical aggregates (stddev/var/corr/covar) ———
    Q("q53_stats_agg",
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |  ROUND(var_samp(l_discount), 6) AS var_disc,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("covar_qty_price"))
        .orderBy("l_returnflag")
    },

    // ——— string-function battery (trim/pad/case/replace/reverse) ———
    Q("q54_string_funcs",
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  trim(concat('  ', c_name, '  ')) AS trimmed,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  reverse(c_name) AS rev,
        |  replace(c_name, '#', '-') AS repl,
        |  CAST(length(c_name) AS BIGINT) AS len
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        reverse(col("c_name")).as("rev"),
        regexp_replace(col("c_name"), "#", "-").as("repl"),
        length(col("c_name")).cast("long").as("len"))
        .orderBy("c_custkey")
    },

    // ——— histogram binning (explicit floor arithmetic — DuckDB 1.0
    //     has no width_bucket; IEEE division+floor is bit-identical
    //     on both sides) ———
    Q("q52_histogram",
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("bucket",
          floor(col("o_totalprice") / lit(50000.0)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("bucket")
    },

    // ——— deterministic bottom-k-by-hash sample (custom
    //     TypedImperativeAggregate; mergeable, RNG-free) ———
    Q("q51_bottomk_sample",
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
        |    md5(CAST(o_orderkey AS VARCHAR)) AS h
        |  FROM orders
        |)
        |SELECT o_orderpriority,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY h, o_orderkey)
        |    AS sample_ids
        |FROM ranked WHERE rn <= 5
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      // array output rendered as a CSV string: the harness compare
      // cannot hash array cells, and the join preserves the sketch's
      // canonical (hash, id) order on both sides
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(array_join(graft.functions.BottomKSample
          .bottomKSample(col("o_orderkey"), 5).cast("array<string>"), ",")
          .as("sample_ids"))
        .orderBy("o_orderpriority")
    },

    // ——— range (interval) join: every purchase matched to EVERY
    //     signup window containing it. Spark would plan the raw
    //     BETWEEN as a nested-loop join; engine.RangeJoin bins the
    //     intervals into an equi-join (one hash shuffle + exact
    //     verify). Oracle = the plain BETWEEN join. ———
    Q("q69_range_join",
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id, ts AS start_ts, ts + INTERVAL 1 HOUR AS end_ts,
        |         value AS signup_value
        |  FROM events WHERE event_type = 'signup'
        |)
        |SELECT p.event_id, p.user_id, p.value, s.signup_value,
        |  strftime(s.start_ts, '%Y-%m-%d %H:%M:%S') AS window_start
        |FROM p JOIN s ON p.user_id = s.user_id
        |             AND p.ts BETWEEN s.start_ts AND s.end_ts
        |ORDER BY p.event_id, window_start, signup_value""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("end_ts"),
          col("value").as("signup_value"))
      graft.engine.RangeJoin.binned(purchases, signups,
        on = Seq("user_id"), ts = "ts", start = "start_ts", end = "end_ts",
        binWidth = 3600L)
        .select(col("event_id"), col("user_id"), col("value"),
          col("signup_value"),
          date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss").as("window_start"))
        .orderBy("event_id", "window_start", "signup_value")
    },

    // ——— as-of join (engine operator Spark lacks; DuckDB's native
    //     ASOF JOIN is the oracle): each purchase matched to the
    //     user's most recent signup at-or-before it ———
    Q("q46_asof_join",
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id, ts, value AS signup_value FROM events WHERE event_type = 'signup'
        |)
        |SELECT p.event_id, p.user_id, p.value, s.signup_value,
        |  strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("signup_value"))
      // the NATIVE custom operator (LogicalPlan+Strategy+Exec) — its
      // row-for-row agreement with engine.AsOf is pinned in
      // AsOfJoinNativeSpec; here it faces DuckDB's ASOF JOIN directly
      graft.plans.AsOfJoinNative.asofBackward(purchases, signups,
        on = "user_id", leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("signup_value"))
        .select(col("event_id"), col("user_id"), col("value"), col("signup_value"),
          date_format(col("ts_matched"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
        .orderBy("event_id")
    },

    // ——— skew-salted two-phase aggregation. Salting is result-
    //     transparent (decimal sums are associative), so the oracle is
    //     the PLAIN group-by — the hash compare proves the salted
    //     plan changes nothing while spreading a hot key over n
    //     reducers (plan + bit-exactness also pinned in ScaleSpec). ———
    Q("q78_salted_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_quantity,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val salted = graft.engine.Skew.saltedSum(
        li.withColumn("_q", dec2(col("l_quantity"))),
        keys = Seq("l_returnflag"), valueCol = "_q",
        saltSrc = col("l_orderkey"), n = 16)
      val counts = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      salted.join(counts, "l_returnflag")
        .select(col("l_returnflag"),
          col("sum__q").cast("double").as("sum_l_quantity"), col("n"))
        .orderBy("l_returnflag")
    },

    // ——— Morton (Z-order) layout key: interleaved-bit clustering
    //     key as pure shift/mask arithmetic — the file-skipping
    //     lever for 2-D selective scans (engine.Layout.writeZOrdered
    //     turns it into tight per-file footer stats; pruning law in
    //     LayoutSpec). Oracle replays the spread bit-for-bit. ———
    Q("q85_zorder_key",
      """WITH m AS (
        |  SELECT l_orderkey, l_linenumber,
        |    l_partkey % 256 AS x, l_suppkey % 256 AS y
        |  FROM lineitem
        |), s0 AS (
        |  SELECT *, x & 65535 AS xs, y & 65535 AS ys FROM m
        |), s1 AS (
        |  SELECT * REPLACE ((xs | (xs << 8)) & 16711935 AS xs,
        |                    (ys | (ys << 8)) & 16711935 AS ys) FROM s0
        |), s2 AS (
        |  SELECT * REPLACE ((xs | (xs << 4)) & 252645135 AS xs,
        |                    (ys | (ys << 4)) & 252645135 AS ys) FROM s1
        |), s3 AS (
        |  SELECT * REPLACE ((xs | (xs << 2)) & 858993459 AS xs,
        |                    (ys | (ys << 2)) & 858993459 AS ys) FROM s2
        |), s4 AS (
        |  SELECT * REPLACE ((xs | (xs << 1)) & 1431655765 AS xs,
        |                    (ys | (ys << 1)) & 1431655765 AS ys) FROM s3
        |)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
        |  CAST(xs | (ys << 1) AS BIGINT) AS zval
        |FROM s4
        |ORDER BY zval, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 256).cast("long").as("x"),
          (col("l_suppkey") % 256).cast("long").as("y"))
        .withColumn("zval", graft.engine.Layout.zValue(col("x"), col("y")))
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(20)
    },

    // ——— Bloom-filter semi-join reduction. The Bloom pre-filter is
    //     result-transparent (false positives die in the exact semi
    //     join, false negatives are impossible — BloomFilterSpec law),
    //     so the oracle is the PLAIN semi join: the hash compare
    //     proves the reduced plan changes nothing while the fact side
    //     drops non-joining rows before the shuffle. ———
    Q("q80_bloom_semi_join",
      """WITH urgent AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |)
        |SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM urgent)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      graft.engine.BloomReduce.semiJoin(
        t(s, dir, "lineitem"), urgent,
        factKey = "l_orderkey", keyCol = "o_orderkey",
        numBits = 1L << 18, numHashes = 7)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ——— data-catalog column profiler: per-column stats computed in
    //     ONE aggregation pass (every stat partial-aggregable; exact
    //     NDV here for the oracle, HLL sketches on the scale path).
    //     Numeric min/max rendered as micro-unit longs, timestamps as
    //     formatted strings — engine-portable rendering, applied
    //     AFTER the typed min/max. ———
    Q("q104_profile", {
      val intCols = Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int")
      val dblCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val parts =
        intCols.map { case (c, dt) =>
          s"""SELECT '$c' AS column_name, '$dt' AS data_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_value,
             |  CAST(MAX($c) AS VARCHAR) AS max_value,
             |  CAST(NULL AS DOUBLE) AS avg_len
             |FROM lineitem""".stripMargin
        } ++ dblCols.map { c =>
          s"""SELECT '$c', 'double', CAST(COUNT(*) AS BIGINT),
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(COUNT(DISTINCT $c) AS BIGINT),
             |  CAST(CAST(ROUND(MIN($c) * 1000000) AS BIGINT) AS VARCHAR),
             |  CAST(CAST(ROUND(MAX($c) * 1000000) AS BIGINT) AS VARCHAR),
             |  CAST(NULL AS DOUBLE)
             |FROM lineitem""".stripMargin
        } ++ strCols.map { c =>
          s"""SELECT '$c', 'string', CAST(COUNT(*) AS BIGINT),
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(COUNT(DISTINCT $c) AS BIGINT),
             |  MIN($c), MAX($c),
             |  ROUND(AVG(LENGTH($c)), 6)
             |FROM lineitem""".stripMargin
        } :+
          s"""SELECT 'l_shipdate', 'timestamp_ntz', CAST(COUNT(*) AS BIGINT),
             |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
             |  strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
             |  strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S'),
             |  CAST(NULL AS DOUBLE)
             |FROM lineitem""".stripMargin
      parts.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY column_name")
    }) { (s, dir) =>
      graft.ext.Profile.profileTable(t(s, dir, "lineitem"), exactNdv = true)
    },

    // ——— declarative data-quality expectations: row-level rules
    //     (not_null / range / regex / in_set) + uniqueness share ONE
    //     aggregation pass; referential rules are broadcast anti-join
    //     counts. Mix chosen so both outcomes appear: r2 (qty ≤ 30)
    //     and r5 (orderkey unique in lineitem) genuinely FAIL. ———
    Q("q105_expectations",
      """WITH v AS (
        |SELECT 'r1_notnull' AS rule_id, 'not_null' AS kind,
        |  'l_orderkey' AS column_name,
        |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT) AS n_violations
        |UNION ALL
        |SELECT 'r2_range', 'range', 'l_quantity',
        |  CAST((SELECT COUNT(*) FROM lineitem
        |        WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)) AS BIGINT)
        |UNION ALL
        |SELECT 'r3_regex', 'regex', 'l_returnflag',
        |  CAST((SELECT COUNT(*) FROM lineitem
        |        WHERE l_returnflag IS NOT NULL
        |          AND NOT regexp_matches(l_returnflag, '^[ARN]$')) AS BIGINT)
        |UNION ALL
        |SELECT 'r4_inset', 'in_set', 'l_linestatus',
        |  CAST((SELECT COUNT(*) FROM lineitem
        |        WHERE l_linestatus IS NOT NULL AND l_linestatus NOT IN ('O','F')) AS BIGINT)
        |UNION ALL
        |SELECT 'r5_unique', 'unique', 'l_orderkey',
        |  CAST((SELECT COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) FROM lineitem) AS BIGINT)
        |UNION ALL
        |SELECT 'r6_fk_orders', 'foreign_key', 'l_orderkey',
        |  CAST((SELECT COUNT(*) FROM lineitem l
        |        WHERE l.l_orderkey IS NOT NULL
        |          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        |UNION ALL
        |SELECT 'r7_fk_part', 'foreign_key', 'l_partkey',
        |  CAST((SELECT COUNT(*) FROM lineitem l
        |        WHERE l.l_partkey IS NOT NULL
        |          AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
        |)
        |SELECT rule_id, kind, column_name, n_violations,
        |  n_violations = 0 AS pass
        |FROM v ORDER BY rule_id""".stripMargin) { (s, dir) =>
      import graft.ext.Profile._
      checkExpectations(t(s, dir, "lineitem"), Seq(
        NotNull("r1_notnull", "l_orderkey"),
        Range("r2_range", "l_quantity", 1, 30),
        Regex("r3_regex", "l_returnflag", "^[ARN]$"),
        InSet("r4_inset", "l_linestatus", Seq("O", "F")),
        Unique("r5_unique", "l_orderkey"),
        ForeignKey("r6_fk_orders", "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
        ForeignKey("r7_fk_part", "l_partkey", t(s, dir, "part"), "p_partkey")))
    },

    // ——— snapshot drift: Population Stability Index of the n_chars
    //     distribution per source vs the src0 baseline. Per-bin terms
    //     quantized to 1e-6 units before the sum → aggregation-order-
    //     free, exactly replayed by the oracle. ———
    Q("q125_psi_drift",
      """WITH binned AS (
        |  SELECT source AS grp,
        |    CAST(LEAST(FLOOR(CAST(n_chars AS DOUBLE) / 60), 9) AS INT) AS bin
        |  FROM documents
        |), counts AS (
        |  SELECT grp, bin, CAST(COUNT(*) AS BIGINT) AS c FROM binned GROUP BY 1, 2
        |), spine AS (
        |  SELECT g.grp, b.bin FROM (SELECT DISTINCT grp FROM counts) g
        |  CROSS JOIN (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin) b
        |), filled AS (
        |  SELECT s.grp, s.bin, COALESCE(c.c, 0) AS c
        |  FROM spine s LEFT JOIN counts c ON s.grp = c.grp AND s.bin = c.bin
        |), tot AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM filled GROUP BY 1),
        |sm AS (
        |  SELECT f.grp, f.bin,
        |    (CAST(f.c AS DOUBLE) + 0.5) / (CAST(t.n AS DOUBLE) + 5.0) AS p
        |  FROM filled f JOIN tot t USING (grp)
        |), base AS (SELECT bin, p AS q FROM sm WHERE grp = 'src0')
        |SELECT sm.grp AS source,
        |  ROUND(CAST(SUM(CAST(round((sm.p - b.q) * ln(sm.p / b.q) * 1e6)
        |    AS BIGINT)) AS DOUBLE) / 1e6, 6) AS psi
        |FROM sm JOIN base b USING (bin)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Profile.psiDrift(t(s, dir, "documents"), "n_chars", "source",
        baseline = "src0", binWidth = 60.0, nBins = 10)
        .select(col("grp").as("source"), round(col("psi"), 6).as("psi"))
        .orderBy("source")
    },

    // ——— importance propagation: 3-iteration PageRank on the
    //     undirected part↔supplier graph from lineitem. Per-edge
    //     contributions quantized to 1e-12 BIGINT units, so the
    //     iteration is bit-reproducible under ANY partitioning and
    //     the oracle replays it CTE-by-CTE. ———
    Q("q126_pagerank",
      """WITH e0 AS (
        |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM lineitem
        |), und AS (
        |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
        |), deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
        |adj AS (SELECT u.src, u.dst, d.deg FROM und u JOIN deg d USING (src)),
        |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM deg),
        |c1 AS (SELECT a.dst AS node,
        |         CAST(SUM(CAST(round(r.pr / a.deg * 1e12) AS BIGINT)) AS BIGINT) AS cs
        |       FROM adj a JOIN r0 r ON a.src = r.node GROUP BY 1),
        |r1 AS (SELECT node,
        |         round(0.15 + 0.85 * (CAST(cs AS DOUBLE) / 1e12), 9) AS pr FROM c1),
        |c2 AS (SELECT a.dst AS node,
        |         CAST(SUM(CAST(round(r.pr / a.deg * 1e12) AS BIGINT)) AS BIGINT) AS cs
        |       FROM adj a JOIN r1 r ON a.src = r.node GROUP BY 1),
        |r2 AS (SELECT node,
        |         round(0.15 + 0.85 * (CAST(cs AS DOUBLE) / 1e12), 9) AS pr FROM c2),
        |c3 AS (SELECT a.dst AS node,
        |         CAST(SUM(CAST(round(r.pr / a.deg * 1e12) AS BIGINT)) AS BIGINT) AS cs
        |       FROM adj a JOIN r2 r ON a.src = r.node GROUP BY 1),
        |r3 AS (SELECT node,
        |         round(0.15 + 0.85 * (CAST(cs AS DOUBLE) / 1e12), 9) AS pr FROM c3)
        |SELECT node, round(pr, 6) AS pr FROM r3
        |ORDER BY pr DESC, node LIMIT 20""".stripMargin) { (s, dir) =>
      // distinct the INTEGER key pairs before tagging (guide §2.3:
      // narrower types, aggregate before you shuffle): the graph
      // operators dedupe their edge input anyway, so dedup here is
      // result-identical (injective tagging) while the heavy distinct
      // runs over 16-byte int pairs instead of row-scale strings —
      // measured 3.1 s → sub-second adjacency build at sf0.1
      val edges = t(s, dir, "lineitem")
        .select(col("l_partkey").as("_pk"), col("l_suppkey").as("_sk"))
        .distinct()
        .select(concat(lit("p"), col("_pk").cast("string")).as("src"),
          concat(lit("s"), col("_sk").cast("string")).as("dst"))
      graft.ext.Graph.pageRank(edges, iterations = 3)
        .select(col("node"), round(col("rank"), 6).as("pr"))
        .orderBy(col("pr").desc, col("node"))
        .limit(20)
    },

    // ——— heavy-tail guard: per-source winsorized means of n_chars
    //     (clip at the exact interpolated p05/p95, micro-unit sums
    //     for order-free means). ———
    Q("q129_winsorize",
      """WITH b AS (
        |  SELECT source, round(quantile_cont(n_chars, 0.05), 4) AS w_lo,
        |         round(quantile_cont(n_chars, 0.95), 4) AS w_hi
        |  FROM documents GROUP BY 1
        |), cl AS (
        |  SELECT d.source, b.w_lo, b.w_hi,
        |    LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), b.w_lo), b.w_hi) AS wv
        |  FROM documents d JOIN b USING (source)
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(w_lo) AS w_lo, MIN(w_hi) AS w_hi,
        |  ROUND(CAST(SUM(CAST(round(wv * 10000) AS BIGINT)) AS DOUBLE)
        |    / COUNT(*) / 1e4, 6) AS mean_winsorized
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Profile.winsorize(
          t(s, dir, "documents").select("source", "n_chars"),
          "n_chars", "source", lo = 0.05, hi = 0.95)
        .groupBy("source").agg(
          count(lit(1)).as("n"),
          min("w_lo").as("w_lo"), min("w_hi").as("w_hi"),
          round(sum(round(col("winsorized") * 10000).cast("long")).cast("double")
            / count(lit(1)) / 1e4, 6).as("mean_winsorized"))
        .orderBy("source")
    },

    // ——— ingestion-hygiene rate limit: flag events past the 2/hour
    //     per-user quota; (ts, event_id) total order makes the flag
    //     set deterministic. ———
    Q("q143_rate_limit",
      """SELECT event_id, user_id,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
        |  CAST(seq AS BIGINT) AS seq
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS seq
        |  FROM events
        |)
        |WHERE seq > 2
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.rateLimitFlags(t(s, dir, "events"), maxPerHour = 2)
        .orderBy("event_id")
    },

    // ——— per-user inter-arrival cadence: NEAREST-RANK median/p95
    //     gap in microseconds — pure integer selection (interpolating
    //     percentiles differ by 1 ulp between engines at 1e11 µs) —
    //     the bot/churn profile. ———
    Q("q150_interarrival",
      """WITH g AS (
        |  SELECT user_id, event_id,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events
        |)
        |, r AS (
        |  SELECT user_id, gap,
        |    row_number() OVER (PARTITION BY user_id ORDER BY gap, event_id)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM g WHERE gap IS NOT NULL
        |)
        |SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_gaps,
        |  CAST(MAX(CASE WHEN rn = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)
        |    THEN gap END) AS BIGINT) AS median_gap_us,
        |  CAST(MAX(CASE WHEN rn = CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT)
        |    THEN gap END) AS BIGINT) AS p95_gap_us
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.interArrivalStats(t(s, dir, "events"))
        .orderBy("user_id")
    },

    // ——— per-source Pearson r between doc length and quality score
    //     from exact integer sufficient sums (quality is round-6 →
    //     its 1e-6 quantization is exact) — the length-vs-quality
    //     confounding check for the report card. ———
    Q("q161_length_quality_corr",
      """WITH base AS (
        |  SELECT doc_id, source, n_chars, text,
        |    len(string_split_regex(lower(text), '\s+')) AS n,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_n,
        |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_n
        |  FROM documents
        |), ql AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x,
        |    CAST(round(ROUND((least(length(text) / 200.0, 1.0)
        |         + (1.0 - least(CAST(punct_n AS DOUBLE) / n, 1.0))
        |         + (CASE WHEN CAST(stop_n AS DOUBLE) / n BETWEEN 0.01 AND 0.6
        |                 THEN 1.0 ELSE 0.5 END)) / 3.0, 6) * 1e6) AS BIGINT)
        |      AS yu
        |  FROM base
        |), s AS (
        |  SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yu) AS BIGINT) AS sy,
        |    CAST(SUM(x * yu) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(yu * yu) AS BIGINT) AS syy
        |  FROM ql GROUP BY 1
        |)
        |SELECT grp, n,
        |  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
        |        AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
        |    THEN ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
        |  END AS r
        |FROM s ORDER BY grp""".stripMargin) { (s, dir) =>
      val scored = t(s, dir, "documents").select(col("source"), col("n_chars"),
        graft.ext.TextStats.qualityScore(col("text")).as("quality"))
      graft.ext.Profile.pearsonCorr(scored, "n_chars", "quality", "source")
        .orderBy("grp")
    },

    // ——— deterministic A/B readout: md5-coin 50/50 user split,
    //     conversion = ≥ 14 purchases (every user purchases at least
    //     once on this data — a count threshold keeps the readout
    //     non-degenerate); rates, lift, pooled z from exact integer
    //     counts, replayable forever. ———
    Q("q158_ab_lift",
      """WITH users AS (
        |  SELECT user_id AS u,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14 THEN 1 ELSE 0 END AS conv,
        |    CASE WHEN CAST(CAST(concat('0x',
        |        substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |        AS DOUBLE) / 1152921504606846976.0 < 0.5
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id
        |), c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_a,
        |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_b
        |  FROM users
        |)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
        |  ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
        |  ROUND(CAST(conv_b AS DOUBLE) / n_b
        |      - CAST(conv_a AS DOUBLE) / n_a, 6) AS lift,
        |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
        |    ROUND((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
        |      / sqrt(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)), 6)
        |  END AS z
        |FROM c""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.abLift(t(s, dir, "events"), convType = "purchase",
        minEvents = 14)
    },

    // ——— first-order Markov transition matrix over per-user event
    //     sequences — behavioral fingerprint; integer pair counts. ———
    Q("q156_transition_matrix",
      """WITH p AS (
        |  SELECT lag(event_type, 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events
        |), c AS (
        |  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |), rt AS (
        |  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n FROM c GROUP BY 1
        |)
        |SELECT c.prev_type, c.next_type, c.n,
        |  ROUND(CAST(c.n AS DOUBLE) / rt.row_n, 6) AS p
        |FROM c JOIN rt USING (prev_type)
        |ORDER BY c.prev_type, c.next_type""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.transitionMatrix(t(s, dir, "events"))
        .orderBy("prev_type", "next_type")
    },

    // ——— deterministic Poisson-bootstrap CI for per-source mean
    //     n_chars (B = 100 md5-coin replicates; replicate means are
    //     ratios of exact integer sums; CI bounds by NEAREST-RANK) —
    //     error bars for every corpus report metric. ———
    Q("q157_bootstrap_ci",
      """WITH reps AS (
        |  SELECT d.source AS grp, d.doc_id, CAST(d.n_chars AS BIGINT) AS v,
        |    r.i AS rb
        |  FROM documents d
        |  CROSS JOIN (SELECT CAST(unnest(range(0, 100)) AS INT) AS i) r
        |), wtd AS (
        |  SELECT grp, rb, v,
        |    CASE WHEN u < 0.3678794412 THEN 0 WHEN u < 0.7357588823 THEN 1
        |         WHEN u < 0.9196986029 THEN 2 WHEN u < 0.9810118431 THEN 3
        |         WHEN u < 0.9963401532 THEN 4 WHEN u < 0.9994058152 THEN 5
        |         ELSE 6 END AS wt
        |  FROM (
        |    SELECT *, CAST(CAST(concat('0x', substring(md5(
        |        CAST(doc_id AS VARCHAR) || ':' || CAST(rb AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
        |    FROM reps)
        |), m AS (
        |  SELECT grp, rb,
        |    CAST(SUM(wt * v) AS DOUBLE) / CAST(SUM(wt) AS BIGINT) AS mv
        |  FROM wtd GROUP BY 1, 2 HAVING SUM(wt) > 0
        |), r2 AS (
        |  SELECT grp, mv,
        |    row_number() OVER (PARTITION BY grp ORDER BY mv, rb) AS rn,
        |    COUNT(*) OVER (PARTITION BY grp) AS nb
        |  FROM m
        |), ci AS (
        |  SELECT grp,
        |    MAX(CASE WHEN rn = GREATEST(
        |        CAST(ceil(CAST(0.025 AS DOUBLE) * nb) AS BIGINT), 1)
        |      THEN mv END) AS ci_lo,
        |    MAX(CASE WHEN rn = CAST(ceil(CAST(0.975 AS DOUBLE) * nb) AS BIGINT)
        |      THEN mv END) AS ci_hi
        |  FROM r2 GROUP BY 1
        |), base AS (
        |  SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    ROUND(CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
        |      AS mean
        |  FROM documents GROUP BY 1
        |)
        |SELECT b.grp AS source, b.n_rows, b.mean,
        |  ROUND(c.ci_lo, 6) AS ci_lo, ROUND(c.ci_hi, 6) AS ci_hi
        |FROM base b JOIN ci c USING (grp)
        |ORDER BY source""".stripMargin) { (s, dir) =>
      graft.ext.Profile.bootstrapMeanCi(t(s, dir, "documents"),
          "n_chars", "source", idCol = "doc_id", b = 100)
        .select(col("grp").as("source"), col("n_rows"), col("mean"),
          col("ci_lo"), col("ci_hi"))
        .orderBy("source")
    },

    // ——— cohort retention: users by first-activity day × day offset
    //     → distinct active users. Pure integer/date arithmetic. ———
    Q("q147_cohort_retention",
      """WITH f AS (
        |  SELECT user_id AS u, MIN(CAST(ts AS DATE)) AS cohort
        |  FROM events GROUP BY 1
        |), act AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events
        |)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users
        |FROM act JOIN f USING (u)
        |GROUP BY cohort, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.cohortRetention(t(s, dir, "events"))
        .orderBy("cohort_day", "day_offset")
    },

    // ——— the SAME rate-limit audit under STREAMING EXECUTION (the
    //     4th streaming-under-oracle entry): readStream → per-key
    //     stateful counters (flatMapGroupsWithState) → memory sink,
    //     hash-matched to q143's batch SQL. Single-file AvailableNow
    //     delivery is in-order, which is the equivalence contract. ———
    Q("q151_streaming_ratelimit",
      """SELECT event_id, user_id,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
        |  CAST(seq AS BIGINT) AS seq
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS seq
        |  FROM events
        |)
        |WHERE seq > 2
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("ts"))
        .as[graft.ext.Streaming.RateEvent]
      val q = graft.ext.Streaming.runToMemory(
        graft.ext.Streaming.rateLimitStateful(stream, maxPerHour = 2).toDF(),
        "q151_rl",
        org.apache.spark.sql.streaming.OutputMode.Append)
      q.stop()
      s.table("q151_rl").orderBy("event_id")
    },

    // ——— volume-spike monitoring: hourly counts per event type vs
    //     their ±6 h centered moving average; spikes = count > 2× MA.
    //     Integer counts + exact windowed AVG → deterministic. ———
    Q("q144_volume_spikes",
      """WITH hc AS (
        |  SELECT event_type AS grp, date_trunc('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), ma AS (
        |  SELECT grp, h, n,
        |    AVG(n) OVER (PARTITION BY grp ORDER BY h
        |      ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS ma
        |  FROM hc
        |)
        |SELECT grp, strftime(h, '%Y-%m-%d %H:00:00') AS hour, n,
        |  ROUND(ma, 6) AS ma
        |FROM ma
        |WHERE n >= 5 AND CAST(n AS DOUBLE) > 2.0 * ma
        |ORDER BY grp, hour""".stripMargin) { (s, dir) =>
      graft.ext.Profile.volumeSpikes(t(s, dir, "events"),
          groupCol = "event_type", tsCol = "ts",
          halfWindow = 6, factor = 2.0, minCount = 5)
        .orderBy("grp", "hour")
    },

    // ——— equi-depth histogram of n_chars: ntile deciles over the
    //     (value, id) total order — the skew-proof binning for the
    //     monitoring path; micro-exact means. ———
    Q("q135_equidepth_bins",
      """WITH b AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
        |  FROM documents
        |)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(v) AS lo, MAX(v) AS hi,
        |  ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Profile.equidepthBins(t(s, dir, "documents"),
        "n_chars", "doc_id", nBins = 10)
    },

    // ——— chi-square independence of source × lang (full marginal
    //     grid: empty cells contribute e; 1e-6-quantized term sums). ———
    Q("q136_chi2_independence",
      """WITH cells AS (
        |  SELECT source AS a, lang AS b, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2
        |), rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
        |ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT a) AS BIGINT) AS ka,
        |  CAST(COUNT(DISTINCT b) AS BIGINT) AS kb FROM cells),
        |grid AS (
        |  SELECT rt.a, ct.b, rt.ra, ct.cb, COALESCE(c.o, 0) AS o
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN cells c ON c.a = rt.a AND c.b = ct.b
        |), terms AS (
        |  SELECT o, CAST(ra AS DOUBLE) * cb / nt.n AS e, nt.n, nt.ka, nt.kb
        |  FROM grid CROSS JOIN nt
        |)
        |SELECT MAX(n) AS n, (MAX(ka) - 1) * (MAX(kb) - 1) AS dof,
        |  ROUND(CAST(SUM(CAST(round((o - e) * (o - e) / e * 1e6) AS BIGINT))
        |    AS DOUBLE) / 1e6, 6) AS chi2
        |FROM terms""".stripMargin) { (s, dir) =>
      graft.ext.Profile.chiSquareIndependence(t(s, dir, "documents"),
        "source", "lang")
    },

    // ——— exact two-sample Kolmogorov–Smirnov drift between two
    //     sources' n_chars distributions — pure INTEGER arithmetic
    //     (cross-multiplied cumulative counts), so max and arg-value
    //     are bit-exact in both engines. ———
    Q("q132_ks_drift",
      """WITH v AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v, source AS grp FROM documents
        |  WHERE source IN ('src0', 'src1')
        |), pv AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN grp = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS da,
        |    CAST(SUM(CASE WHEN grp = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS db
        |  FROM v GROUP BY 1
        |), cum AS (
        |  SELECT v,
        |    CAST(SUM(da) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(SUM(db) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        |  FROM pv
        |), tot AS (SELECT MAX(ca) AS n_a, MAX(cb) AS n_b FROM cum)
        |SELECT t.n_a, t.n_b,
        |  ROUND(CAST(ABS(c.ca * t.n_b - c.cb * t.n_a) AS DOUBLE)
        |    / (t.n_a * t.n_b), 6) AS ks_stat,
        |  c.v AS at_value
        |FROM cum c CROSS JOIN tot t
        |ORDER BY ABS(c.ca * t.n_b - c.cb * t.n_a) DESC, c.v ASC
        |LIMIT 1""".stripMargin) { (s, dir) =>
      graft.ext.Profile.ksDrift(t(s, dir, "documents"), "n_chars", "source",
        groupA = "src0", groupB = "src1")
    },

    // ——— ROC AUC by Mann–Whitney rank-sum: does event value rank
    //     purchases above non-purchases? Exact midrank tie handling
    //     in BIGINTs (scores micro-quantized, per-distinct-value
    //     contribution p·(2·r_lo+t+1)); the threshold-free audit for
    //     any corpus-filter score. ———
    Q("q165_classifier_auc",
      """WITH s AS (
        |  SELECT CAST(round(value * 1000000) AS BIGINT) AS sm,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), g AS (
        |  SELECT sm, CAST(COUNT(*) AS BIGINT) AS t, CAST(SUM(y) AS BIGINT) AS p
        |  FROM s GROUP BY 1
        |), w AS (
        |  SELECT t, p, CAST(COALESCE(SUM(t) OVER (ORDER BY sm
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS r_lo
        |  FROM g
        |)
        |SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
        |  CAST(SUM(t - p) AS BIGINT) AS n_neg,
        |  CASE WHEN SUM(p) > 0 AND SUM(t - p) > 0 THEN
        |    ROUND(CAST(SUM(p * (2 * r_lo + t + 1)) - SUM(p) * (SUM(p) + 1)
        |        AS DOUBLE) / (2.0 * SUM(p) * SUM(t - p)), 6)
        |  END AS auc
        |FROM w""".stripMargin) { (s, dir) =>
      graft.ext.Classifier.rankAuc(t(s, dir, "events"), "value",
        col("event_type") === "purchase")
    },

    // ——— Kaplan–Meier risk table over per-user activity spans
    //     (right-censored if still active within 7 days of
    //     observation end). Sufficient statistics only — n_risk /
    //     n_events / n_censored are exact integers; the cumulative
    //     survival product is deliberately left to the reader (its
    //     running Π is order-sequential float arithmetic). ———
    Q("q166_kaplan_meier",
      """WITH h AS (SELECT MAX(epoch_us(ts)) AS obs_end FROM events),
        |pe AS (
        |  SELECT user_id,
        |    CAST(floor((MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
        |      / 86400000000.0) AS BIGINT) AS d,
        |    CASE WHEN MAX(epoch_us(ts)) >= h.obs_end - 7 * 86400000000
        |      THEN 0 ELSE 1 END AS ev
        |  FROM events CROSS JOIN h GROUP BY user_id, h.obs_end
        |), byd AS (
        |  SELECT d, CAST(COUNT(*) AS BIGINT) AS t,
        |    CAST(SUM(ev) AS BIGINT) AS n_events
        |  FROM pe GROUP BY 1
        |), wd AS (
        |  SELECT d, t, n_events,
        |    CAST(COALESCE(SUM(t) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS before_n,
        |    CAST(SUM(t) OVER () AS BIGINT) AS total_n
        |  FROM byd
        |)
        |SELECT d AS duration_days, total_n - before_n AS n_risk, n_events,
        |  t - n_events AS n_censored,
        |  ROUND(1.0 - CAST(n_events AS DOUBLE) / (total_n - before_n), 6)
        |    AS factor
        |FROM wd WHERE n_events > 0
        |ORDER BY duration_days""".stripMargin) { (s, dir) =>
      graft.ext.Profile.kaplanMeier(t(s, dir, "events"), "user_id", "ts",
        censorDays = 7)
    },

    // ——— Benford first-digit audit of l_extendedprice: fabricated-
    //     data smell test. Digit from the integer part as a string
    //     (no log10 on the data path); the nine Benford constants are
    //     driver-computed once and injected as literals into BOTH
    //     plans; χ² terms micro-quantized to BIGINT. ———
    Q("q167_benford",
      s"""WITH d AS (
         |  SELECT CAST(substring(CAST(CAST(floor(CAST(l_extendedprice AS DOUBLE))
         |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM lineitem WHERE CAST(l_extendedprice AS DOUBLE) >= 1.0
         |), g AS (
         |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1
         |), w AS (
         |  SELECT digit, n_obs, CAST(SUM(n_obs) OVER () AS BIGINT) AS nt FROM g
         |), e AS (
         |  SELECT digit, n_obs,
         |    (CASE digit ${benfordCaseSql} END) * CAST(nt AS DOUBLE) AS exp_n
         |  FROM w
         |), t2 AS (
         |  SELECT digit, n_obs, exp_n,
         |    CAST(round((n_obs - exp_n) * (n_obs - exp_n) / exp_n * 1000000)
         |      AS BIGINT) AS term
         |  FROM e
         |)
         |SELECT digit, n_obs, ROUND(exp_n, 6) AS exp_n,
         |  ROUND(CAST(SUM(term) OVER () AS DOUBLE) / 1000000, 6) AS chi2
         |FROM t2 ORDER BY digit""".stripMargin) { (s, dir) =>
      graft.ext.Profile.benford(t(s, dir, "lineitem"), "l_extendedprice")
    },

    // ——— EWMA (α = 1/2) of daily counts per event type: the dyadic α
    //     turns the recursion into an INTEGER prefix sum divided by a
    //     power of two — the whole smoothed trend line is exact in
    //     both engines, no float accumulation anywhere. ———
    Q("q171_ewma",
      """WITH daily AS (
        |  SELECT event_type AS grp, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), idx AS (
        |  SELECT grp, day, n,
        |    CAST(row_number() OVER (PARTITION BY grp ORDER BY day) - 1
        |      AS BIGINT) AS t
        |  FROM daily
        |), wtd AS (
        |  SELECT grp, day, n, t,
        |    CASE WHEN t = 0 THEN 2
        |         ELSE (CAST(1 AS BIGINT) << CAST(t AS INT)) END AS w
        |  FROM idx
        |), s AS (
        |  SELECT grp, day, n, t,
        |    CAST(SUM(w * n) OVER (PARTITION BY grp ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sw
        |  FROM wtd
        |)
        |SELECT grp, strftime(day, '%Y-%m-%d') AS day, n,
        |  ROUND(CAST(sw AS DOUBLE)
        |    / CAST((CAST(1 AS BIGINT) << CAST(t + 1 AS INT)) AS DOUBLE), 6)
        |    AS ewma
        |FROM s ORDER BY grp, day""".stripMargin) { (s, dir) =>
      graft.ext.Profile.ewmaDaily(t(s, dir, "events"), "event_type", "ts")
    },

    // ——— fuzzy entity resolution over the part-name dictionary:
    //     Jaro–Winkler pairs ≥ 0.75 via the native codegen'd kernel,
    //     semantics pinned to the oracle's implementation (truncated
    //     half-transpositions, >0.7 prefix boost). The join runs on
    //     DISTINCT names — the dictionary, not the rows. ———
    Q("q172_jw_name_match",
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part
        |           WHERE p_name IS NOT NULL)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  ROUND(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE ROUND(jaro_winkler_similarity(a.name, b.name), 6) >= 0.75
        |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
      graft.ext.Dedup.jaroWinklerPairs(t(s, dir, "part"), "p_name",
        threshold = 0.75)
    },

    // ——— skyline / Pareto frontier: customers unbeaten on BOTH total
    //     spend and account balance. Sort-based single pass over the
    //     DISTINCT cent-integer point set (after dedup the dominance
    //     rule collapses to y > max-preceding-y), membership joined
    //     back to rows. Spark has no skyline operator — this is the
    //     composed form. ———
    Q("q173_skyline",
      """WITH cv AS (
        |  SELECT c.c_custkey,
        |    CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
        |      AS BIGINT) AS spend_cents,
        |    CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_custkey, c.c_acctbal
        |), pts AS (SELECT DISTINCT spend_cents AS x, bal_cents AS y FROM cv),
        |sky AS (
        |  SELECT x, y FROM (
        |    SELECT x, y, MAX(y) OVER (ORDER BY x DESC, y DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxy
        |    FROM pts)
        |  WHERE maxy IS NULL OR y > maxy
        |)
        |SELECT cv.c_custkey,
        |  ROUND(CAST(cv.spend_cents AS DOUBLE) / 100, 2) AS spend,
        |  ROUND(CAST(cv.bal_cents AS DOUBLE) / 100, 2) AS acctbal
        |FROM cv JOIN sky ON cv.spend_cents = sky.x AND cv.bal_cents = sky.y
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val spend = t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_acctbal"))
        .agg(coalesce(sum(round(col("o_totalprice") * 100).cast("long")),
          lit(0L)).as("spend_cents"))
        .select(col("c_custkey"), col("spend_cents"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      graft.ext.Skyline.frontier(spend, "spend_cents", "bal_cents")
        .select(col("c_custkey"),
          round(col("spend_cents").cast("double") / 100, 2).as("spend"),
          round(col("bal_cents").cast("double") / 100, 2).as("acctbal"))
        .orderBy("c_custkey")
    },

    // ——— last-touch attribution: purchase value credited to the
    //     user's latest preceding non-purchase touch within 7 days.
    //     The pick is a window max of struct(micros, event_id, type)
    //     — lookback applied AFTER (if the latest touch is stale,
    //     every earlier one is staler). Cents-exact. ———
    Q("q174_attribution",
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |), e AS (
        |  SELECT event_id AS eid, user_id, epoch_us(ts) AS us, event_type AS ty
        |  FROM events WHERE event_type <> 'purchase'
        |), pick AS (
        |  SELECT p.event_id, e.ty, e.us AS tus,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY e.us DESC, e.eid DESC) AS rn
        |  FROM p JOIN e ON e.user_id = p.user_id
        |    AND (e.us < p.us OR (e.us = p.us AND e.eid < p.event_id))
        |), att AS (
        |  SELECT p.event_id, p.cents,
        |    CASE WHEN k.ty IS NOT NULL AND p.us - k.tus <= 604800000000
        |      THEN k.ty ELSE 'none' END AS touch_type
        |  FROM p LEFT JOIN (SELECT event_id, ty, tus FROM pick WHERE rn = 1) k
        |    USING (event_id)
        |)
        |SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  ROUND(CAST(SUM(cents) AS DOUBLE) / 100, 2) AS attributed_value
        |FROM att GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.lastTouchAttribution(t(s, dir, "events"),
        convType = "purchase", lookback = "7 days")
    },

    // ——— RFM segmentation: per-user recency/frequency/monetary from
    //     purchase events, quintile scores with user-id tie-break
    //     (5 = best on every axis); integers + cents throughout. ———
    Q("q177_rfm",
      """WITH conv AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |), h AS (SELECT MAX(us) AS obs_end FROM conv),
        |pu AS (
        |  SELECT user_id,
        |    CAST(floor((h.obs_end - MAX(us)) / 86400000000.0) AS BIGINT)
        |      AS recency_days,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM conv CROSS JOIN h GROUP BY user_id, h.obs_end
        |)
        |SELECT user_id, recency_days, frequency,
        |  ROUND(CAST(cents AS DOUBLE) / 100, 2) AS monetary,
        |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT)
        |    AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY cents, user_id) AS BIGINT) AS m_score
        |FROM pu ORDER BY user_id""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.rfm(t(s, dir, "events"), convType = "purchase")
    },

    // ——— day-of-week seasonality profile per event type: the weekly
    //     rhythm baseline under the spike alarm (dow 0 = Sunday,
    //     conventions aligned explicitly; integer counts, one exact
    //     division, peak_rank tie → smaller dow). ———
    Q("q182_dow_seasonality",
      """WITH daily AS (
        |  SELECT event_type AS grp, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), dw AS (
        |  SELECT grp, CAST(dayofweek(day) AS BIGINT) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(n) AS BIGINT) AS total_events
        |  FROM daily GROUP BY 1, 2
        |)
        |SELECT grp, dow, n_days, total_events,
        |  ROUND(CAST(total_events AS DOUBLE) / n_days, 6) AS avg_per_day,
        |  CAST(row_number() OVER (PARTITION BY grp
        |    ORDER BY total_events DESC, dow) AS BIGINT) AS peak_rank
        |FROM dw ORDER BY grp, dow""".stripMargin) { (s, dir) =>
      graft.ext.Profile.dowSeasonality(t(s, dir, "events"), "event_type", "ts")
    },

    // ——— daily-activity streaks (gaps-and-islands via day −
    //     row_number): per-user active days, streak count, longest
    //     streak. No self-join — two aggregations + one per-user
    //     rank window. ———
    Q("q183_streaks",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), d AS (
        |  SELECT user_id, datediff('day', DATE '1970-01-01', day) AS dn FROM ud
        |), isl AS (
        |  SELECT user_id,
        |    dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS isl
        |  FROM d
        |), g AS (
        |  SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(MAX(len) AS BIGINT) AS longest_streak
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.activityStreaks(t(s, dir, "events"))
    },

    // ——— DAU / trailing-7-day WAU / stickiness: sliding DISTINCT via
    //     bounded 7× contribution fan-out of the thin (user, day)
    //     pairs — the scalable form of a window that SQL cannot
    //     express directly. ———
    Q("q184_dau_wau",
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events
        |), dau AS (
        |  SELECT day, CAST(COUNT(DISTINCT u) AS BIGINT) AS dau
        |  FROM ud GROUP BY 1
        |), cover AS (
        |  SELECT DISTINCT u, day + CAST(off AS INT) AS day
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
        |), wau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM cover GROUP BY 1
        |)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
        |  ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        |FROM dau d JOIN wau w USING (day)
        |ORDER BY day""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.dauWau(t(s, dir, "events"))
    },

    // ——— DAU under STREAMING execution: stateful dropDuplicates on
    //     (user, day) feeding a Complete-mode count — distinct
    //     aggregates don't exist in Structured Streaming, so the
    //     dedup-then-count split IS the streaming form. AvailableNow
    //     + Complete emits the full final table → hash-equal to the
    //     batch DAU oracle. ———
    Q("q187_streaming_dau",
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
        .select(col("user_id"), to_date(col("ts")).as("_day"))
        .dropDuplicates("user_id", "_day")
        .groupBy("_day").agg(count(lit(1)).as("dau"))
      val q = graft.ext.Streaming.runToMemory(stream, "q187_dau",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      s.table("q187_dau")
        .select(date_format(col("_day"), "yyyy-MM-dd").as("day"), col("dau"))
        .orderBy("day")
    },

    // ——— CSV round trip UNDER the oracle: the per-nation rollup is
    //     written through the CSV sink, read back through the CSV
    //     source (explicit schema), and hash-compared to the direct
    //     computation — the sink/source contract itself is in the
    //     correctness gate (types chosen lossless: string + bigint). ———
    Q("q189_csv_roundtrip",
      """SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val agg = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_customers"))
      val path = s"${graft.queries.Fixtures.dir}/csv_roundtrip"
      agg.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("nation STRING, n_customers BIGINT")
        .csv(path)
        .orderBy("nation")
    },

    // ——— SCD type-2 snapshot merge over a deterministic change feed
    //     (updates %10, deletes %17∖%10, inserts %23 as new keys):
    //     closed / opened / changed-pair / carried rows with version
    //     validity — the dimension-history operator Spark lacks. ———
    Q("q190_scd2",
      s"""$scd2Cte
        |SELECT k, bal, valid_from, valid_to FROM scd
        |ORDER BY k, valid_from""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "customer").select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
      val n = o.filter(!(col("k") % 17 === 3 && col("k") % 10 =!= 0))
        .select(col("k"),
          when(col("k") % 10 === 0, col("bal") + 10000)
            .otherwise(col("bal")).as("bal"))
        .unionByName(o.filter(col("k") % 23 === 5)
          .select((col("k") + 1000000).as("k"), lit(0L).as("bal")))
      graft.engine.Scd.scd2(o, n, keyCols = Seq("k"),
          compareCols = Seq("bal"), fromV = 1, toV = 2)
        .orderBy("k", "valid_from")
    },

    // ——— point-in-time lookup against q190's SCD2 dimension (the
    //     read side of the warehouse pattern): each order joins the
    //     version active at its as-of stamp (1 + orderkey % 2); keys
    //     with no active version keep the row with NULL values (the
    //     closed-member case an inner join would silently drop).
    //     Equi-join on the key with the validity residual — never a
    //     nested loop; ≤ one version matches by the SCD2 invariant. ———
    Q("q329_scd2_pit_lookup",
      s"""$scd2Cte, f AS (
        |  SELECT o_orderkey, o_custkey AS k,
        |    CAST(1 + o_orderkey % 2 AS BIGINT) AS asof_v
        |  FROM orders
        |)
        |SELECT f.o_orderkey, f.k, f.asof_v, scd.bal, scd.valid_from
        |FROM f LEFT JOIN scd ON scd.k = f.k
        |  AND scd.valid_from <= f.asof_v
        |  AND (scd.valid_to IS NULL OR f.asof_v < scd.valid_to)
        |ORDER BY f.o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "customer").select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
      val n = o.filter(!(col("k") % 17 === 3 && col("k") % 10 =!= 0))
        .select(col("k"),
          when(col("k") % 10 === 0, col("bal") + 10000)
            .otherwise(col("bal")).as("bal"))
        .unionByName(o.filter(col("k") % 23 === 5)
          .select((col("k") + 1000000).as("k"), lit(0L).as("bal")))
      val dim = graft.engine.Scd.scd2(o, n, keyCols = Seq("k"),
        compareCols = Seq("bal"), fromV = 1, toV = 2)
      val facts = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey").as("k"),
        (lit(1L) + col("o_orderkey") % 2).as("asof_v"))
      graft.engine.Scd.pitLookup(facts, dim, keyCols = Seq("k"),
          asOfCol = "asof_v")
        .orderBy("o_orderkey")
    },

    // ——— MERGE INTO (upsert) semantics from a declarative U/I/D
    //     change feed over the same deterministic derivation: matched
    //     updates replace, deletes drop, inserts append. ———
    Q("q191_merge_upsert",
      """WITH t AS (
        |  SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
        |    c_mktsegment AS mkt
        |  FROM customer
        |)
        |SELECT k, CASE WHEN k % 10 = 0 THEN bal + 10000 ELSE bal END AS bal, mkt
        |FROM t WHERE NOT (k % 17 = 3 AND k % 10 <> 0)
        |UNION ALL
        |SELECT k + 1000000, CAST(0 AS BIGINT), 'NEW' FROM t WHERE k % 23 = 5
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val target = t(s, dir, "customer").select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal"),
        col("c_mktsegment").as("mkt"))
      val updates = target.filter(col("k") % 10 === 0)
        .select(col("k"), (col("bal") + 10000).as("bal"), col("mkt"),
          lit("U").as("op"))
      val deletes = target.filter(col("k") % 17 === 3 && col("k") % 10 =!= 0)
        .select(col("k"), col("bal"), col("mkt"), lit("D").as("op"))
      val inserts = target.filter(col("k") % 23 === 5)
        .select((col("k") + 1000000).as("k"), lit(0L).as("bal"),
          lit("NEW").as("mkt"), lit("I").as("op"))
      graft.engine.Scd.mergeUpsert(target,
          updates.unionByName(deletes).unionByName(inserts), Seq("k"))
        .orderBy("k")
    },

    // ——— streaming MERGE-INTO maintenance (q191's upsert kept
    //     current from the event stream): per micro-batch last-writer
    //     compaction + MERGE-WHEN-NEWER guard + Scd.mergeUpsert,
    //     target ledger-checkpointed per batch. Final mirror ==
    //     one-shot last-event-per-user compaction — the oracle. ———
    Q("q322_streaming_upsert",
      """SELECT user_id, ROUND(value, 6) AS value FROM (
        |  SELECT user_id, value, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |WHERE rk = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
      graft.ext.Streaming.upsertMaintenanceStream(stream)
        .select(col("user_id"), round(col("value"), 6).as("value"))
        .orderBy("user_id")
    },

    // ——— universe (key-consistent) sampling: both sides of the
    //     orders⋈lineitem join keep the SAME md5-coin 10% of order
    //     keys, so the sampled join is the join of the samples —
    //     what independent Bernoulli sampling cannot give. ———
    Q("q192_universe_sample",
      """WITH so AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE CAST(CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) AS DOUBLE) / 1152921504606846976.0 < 0.1
        |), sl AS (
        |  SELECT l_orderkey, l_extendedprice FROM lineitem
        |  WHERE CAST(CAST(concat('0x', substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) AS DOUBLE) / 1152921504606846976.0 < 0.1
        |)
        |SELECT o.o_orderstatus AS status,
        |  CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  ROUND(CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |    AS DOUBLE) / 100, 2) AS revenue
        |FROM so o JOIN sl l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.ext.Corpus
      val so = Corpus.universeSample(t(s, dir, "orders"), "o_orderkey", 0.1)
      val sl = Corpus.universeSample(t(s, dir, "lineitem"), "l_orderkey", 0.1)
      so.join(sl, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus").as("status"))
        .agg(countDistinct("o_orderkey").as("n_orders"),
          count(lit(1)).as("n_items"),
          round(sum(round(col("l_extendedprice") * 100).cast("long"))
            .cast("double") / 100, 2).as("revenue"))
        .orderBy("status")
    },

    // ——— ABC / Pareto contribution analysis of parts by revenue:
    //     class boundaries checked as integer cross-multiplications
    //     (cum·100 ≤ 80·total) — no float share comparisons. ———
    Q("q193_abc_analysis",
      """WITH per AS (
        |  SELECT l_partkey AS entity,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem GROUP BY 1
        |), c AS (
        |  SELECT entity, cents,
        |    CAST(SUM(cents) OVER (ORDER BY cents DESC, entity
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(cents) OVER () AS BIGINT) AS total
        |  FROM per
        |), k AS (
        |  SELECT CASE WHEN (cum - cents) * 100 < total * 80 THEN 'A'
        |              WHEN (cum - cents) * 100 < total * 95 THEN 'B'
        |              ELSE 'C' END AS abc_class,
        |    cents, total
        |  FROM c
        |)
        |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |  ROUND(CAST(SUM(cents) AS DOUBLE) / 100, 2) AS class_value,
        |  ROUND(CAST(SUM(cents) AS DOUBLE) / MAX(total), 6) AS value_share
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Profile.abcAnalysis(t(s, dir, "lineitem"), "l_partkey",
        round(col("l_extendedprice") * 100).cast("long"))
    },

    // ——— exact triangle census of the co-purchase graph via the
    //     degree-ordered orientation: wedges counted only at their
    //     lowest-(deg,id)-rank corner, so hub out-degrees stay
    //     O(sqrt(E)) and the wedge join never melts a reducer. ———
    Q("q194_triangles",
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS g, CAST(l_partkey AS VARCHAR) AS item
        |  FROM lineitem
        |), und AS (
        |  SELECT DISTINCT a.item AS u, b.item AS v
        |  FROM it a JOIN it b USING (g) WHERE a.item < b.item
        |), deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        |  GROUP BY 1
        |), ranked AS (
        |  SELECT node, deg, row_number() OVER (ORDER BY deg, node) AS rk FROM deg
        |), o AS (
        |  SELECT CASE WHEN ru.rk < rv.rk THEN ru.rk ELSE rv.rk END AS lo,
        |         CASE WHEN ru.rk < rv.rk THEN rv.rk ELSE ru.rk END AS hi
        |  FROM und e JOIN ranked ru ON e.u = ru.node
        |             JOIN ranked rv ON e.v = rv.node
        |), wed AS (
        |  SELECT w1.lo, w1.hi AS h1, w2.hi AS h2
        |  FROM o w1 JOIN o w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
        |), tri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM wed
        |  WHERE EXISTS (SELECT 1 FROM o WHERE o.lo = wed.h1 AND o.hi = wed.h2)
        |), s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |         CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
        |         CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
        |  FROM ranked
        |)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  round(3.0 * n_triangles / n_wedges, 6) AS global_cc
        |FROM s, tri""".stripMargin) { (s, dir) =>
      val edges = graft.ext.Graph.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      graft.ext.Graph.triangleStats(edges)
    },

    // ——— supply-chain blast radius: 3-hop min-hop BFS over the
    //     part↔supplier bipartite graph from one nation's suppliers;
    //     each hop is one frontier⋈adjacency join + visited
    //     anti-join — no driver-side frontier. ———
    Q("q195_bfs_hops",
      """WITH e0 AS (
        |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM lineitem
        |), und AS (
        |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
        |), h0 AS (
        |  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |  FROM supplier WHERE s_nationkey = 3
        |), h1 AS (
        |  SELECT DISTINCT u.dst AS node FROM und u JOIN h0 ON u.src = h0.node
        |  WHERE u.dst NOT IN (SELECT node FROM h0)
        |), h2 AS (
        |  SELECT DISTINCT u.dst AS node FROM und u JOIN h1 ON u.src = h1.node
        |  WHERE u.dst NOT IN (SELECT node FROM h0 UNION ALL SELECT node FROM h1)
        |), h3 AS (
        |  SELECT DISTINCT u.dst AS node FROM und u JOIN h2 ON u.src = h2.node
        |  WHERE u.dst NOT IN (SELECT node FROM h0 UNION ALL
        |                      SELECT node FROM h1 UNION ALL SELECT node FROM h2)
        |)
        |SELECT hop, n_nodes FROM (
        |  SELECT 0 AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM h0 UNION ALL
        |  SELECT 1, CAST(COUNT(*) AS BIGINT) FROM h1 UNION ALL
        |  SELECT 2, CAST(COUNT(*) AS BIGINT) FROM h2 UNION ALL
        |  SELECT 3, CAST(COUNT(*) AS BIGINT) FROM h3)
        |WHERE n_nodes > 0 ORDER BY hop""".stripMargin) { (s, dir) =>
      // distinct the INTEGER key pairs before tagging (guide §2.3:
      // narrower types, aggregate before you shuffle): the graph
      // operators dedupe their edge input anyway, so dedup here is
      // result-identical (injective tagging) while the heavy distinct
      // runs over 16-byte int pairs instead of row-scale strings —
      // measured 3.1 s → sub-second adjacency build at sf0.1
      val edges = t(s, dir, "lineitem")
        .select(col("l_partkey").as("_pk"), col("l_suppkey").as("_sk"))
        .distinct()
        .select(concat(lit("p"), col("_pk").cast("string")).as("src"),
          concat(lit("s"), col("_sk").cast("string")).as("dst"))
      val seeds = t(s, dir, "supplier").filter(col("s_nationkey") === 3)
        .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"))
      graft.ext.Graph.bfsHops(edges, seeds, maxHops = 3)
        .groupBy("hop").agg(count(lit(1)).as("n_nodes"))
        .orderBy("hop")
    },

    // ——— Theil–Sen robust daily trend per event type: the median of
    //     micro-quantized pairwise slopes; quadratic only in DAYS per
    //     group (dictionary-sized), nearest-rank selection over
    //     integers. ———
    Q("q198_theil_sen",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a.grp,
        |    CAST(round(1e6 * (b.n - a.n) / (b.day - a.day)) AS BIGINT) AS slope_u
        |  FROM daily a JOIN daily b ON a.grp = b.grp AND a.day < b.day
        |), r AS (
        |  SELECT grp, slope_u,
        |    row_number() OVER (PARTITION BY grp ORDER BY slope_u) AS rn,
        |    COUNT(*) OVER (PARTITION BY grp) AS np
        |  FROM pairs
        |), nd AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
        |)
        |SELECT r.grp, nd.n_days, CAST(r.np AS BIGINT) AS n_pairs,
        |  round(CAST(slope_u AS DOUBLE) / 1e6, 6) AS slope_per_day
        |FROM r JOIN nd ON r.grp = nd.grp
        |WHERE rn = (np + 1) // 2
        |ORDER BY r.grp""".stripMargin) { (s, dir) =>
      graft.ext.Profile.theilSenDaily(t(s, dir, "events"), "event_type", "ts")
    },

    // ——— CUSUM drift detector per event type in closed window form:
    //     S_t = P_t − min(0, running-min P) over integer micro-unit
    //     prefix sums — the max(0, ·) recursion without recursion. ———
    Q("q199_cusum",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT grp, day, n,
        |    CAST(round(1e6 * SUM(n) OVER (PARTITION BY grp) /
        |      COUNT(*) OVER (PARTITION BY grp)) AS BIGINT) AS mean_u
        |  FROM daily
        |), pp AS (
        |  SELECT grp, day, mean_u,
        |    SUM(n * 1000000 - mean_u) OVER (PARTITION BY grp ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM m
        |), ss AS (
        |  SELECT grp, day, mean_u, p,
        |    p - LEAST(0, MIN(p) OVER (PARTITION BY grp ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
        |  FROM pp
        |), sm AS (
        |  SELECT grp, day, mean_u, s,
        |    MAX(s) OVER (PARTITION BY grp) AS smax
        |  FROM ss
        |)
        |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  round(CAST(MAX(s) AS DOUBLE) / 1e6, 6) AS max_cusum,
        |  CAST(MIN(CASE WHEN s = smax THEN day END) AS BIGINT) AS peak_day,
        |  CAST(SUM(CASE WHEN s > mean_u * 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarms
        |FROM sm GROUP BY grp ORDER BY grp""".stripMargin) { (s, dir) =>
      graft.ext.Profile.cusumDaily(t(s, dir, "events"), "event_type", "ts",
        hMeans = 5)
    },

    // ——— market-basket association rules over order baskets: exact
    //     integer supports (pair fan-out bounded by basket size),
    //     confidence/lift one rounded division each, top-20 by
    //     lift. ———
    Q("q203_assoc_rules",
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS g, CAST(l_partkey AS VARCHAR) AS item
        |  FROM lineitem
        |), nb AS (
        |  SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS n_baskets FROM it
        |), isupp AS (
        |  SELECT item, CAST(COUNT(*) AS BIGINT) AS supp FROM it GROUP BY 1
        |), ps AS (
        |  SELECT a.item AS ante, b.item AS cons,
        |    CAST(COUNT(*) AS BIGINT) AS supp_pair
        |  FROM it a JOIN it b ON a.g = b.g AND a.item <> b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |)
        |SELECT ps.ante, ps.cons, ps.supp_pair,
        |  sa.supp AS supp_a, sb.supp AS supp_b,
        |  ROUND(CAST(ps.supp_pair AS DOUBLE) / sa.supp, 6) AS confidence,
        |  ROUND(CAST(nb.n_baskets AS DOUBLE) * ps.supp_pair /
        |    (sa.supp * sb.supp), 6) AS lift
        |FROM ps JOIN isupp sa ON sa.item = ps.ante
        |        JOIN isupp sb ON sb.item = ps.cons
        |CROSS JOIN nb
        |ORDER BY lift DESC, ante, cons LIMIT 20""".stripMargin) { (s, dir) =>
      graft.ext.Profile.associationRules(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minPairSupport = 3L)
        .orderBy(col("lift").desc, col("ante"), col("cons"))
        .limit(20)
    },

    // ——— stream-stream interval join UNDER the oracle (the sixth
    //     streaming entry): purchases joined to the same user's
    //     signups within 1 h before, executed as a real
    //     watermark-bounded stream-stream join (Append +
    //     AvailableNow) and hash-compared to the batch interval-join
    //     SQL. Watermarks + the time-range predicate are what bound
    //     the join state on unbounded streams. ———
    Q("q204_streaming_join",
      """WITH p AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id AS u, ts AS sts FROM events WHERE event_type = 'signup'
        |)
        |SELECT p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_time,
        |  strftime(s.sts, '%Y-%m-%d %H:%M:%S') AS s_time,
        |  CAST(round(p.value * 100) AS BIGINT) AS cents
        |FROM p JOIN s ON p.user_id = s.u
        |  AND s.sts >= p.ts - INTERVAL 1 HOUR AND s.sts <= p.ts
        |ORDER BY 1, 2, 3, 4""".stripMargin) { (s, dir) =>
      val ev = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
      val joined = graft.ext.Streaming.purchaseSignupJoin(ev, "1 hour")
      val q = graft.ext.Streaming.runToMemory(joined, "q204_join",
        org.apache.spark.sql.streaming.OutputMode.Append)
      q.stop()
      s.table("q204_join")
        .select(col("user_id"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_time"),
          date_format(col("s_ts"), "yyyy-MM-dd HH:mm:ss").as("s_time"),
          round(col("value") * 100).cast("long").as("cents"))
        .orderBy("user_id", "p_time", "s_time", "cents")
    },

    // ——— stream-stream LEFT-OUTER interval join under the oracle
    //     (q204's outer twin — the state-LIFECYCLE surface): every
    //     purchase emits, the unmatched ones with NULL s_time once
    //     the watermark proves no in-window signup can still arrive.
    //     A far-future sentinel (user −1, +30 days, filtered from the
    //     result) advances both watermarks past every real row, so
    //     the bounded replay's null emission is exactly the batch
    //     LEFT JOIN the oracle runs. ———
    Q("q290_streaming_join_outer",
      """WITH p AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id AS u, ts AS sts FROM events WHERE event_type = 'signup'
        |)
        |SELECT p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_time,
        |  strftime(s.sts, '%Y-%m-%d %H:%M:%S') AS s_time,
        |  CAST(round(p.value * 100) AS BIGINT) AS cents
        |FROM p LEFT JOIN s ON p.user_id = s.u
        |  AND s.sts >= p.ts - INTERVAL 1 HOUR AND s.sts <= p.ts
        |ORDER BY user_id, p_time, s_time NULLS FIRST, cents""".stripMargin) { (s, dir) =>
      val staged = graft.ext.Streaming.stageEventsWithSentinel(
        s, s"$dir/events.parquet")
      val ev = graft.ext.Streaming.readEvents(s, staged)
      val joined = graft.ext.Streaming.purchaseSignupJoinLeftOuter(ev, "1 hour")
      val q = graft.ext.Streaming.runToMemory(joined, "q290_join_outer",
        org.apache.spark.sql.streaming.OutputMode.Append)
      q.stop()
      s.table("q290_join_outer")
        .where(col("user_id") >= 0) // sink-side sentinel drop (see op note)
        .select(col("user_id"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_time"),
          date_format(col("s_ts"), "yyyy-MM-dd HH:mm:ss").as("s_time"),
          round(col("value") * 100).cast("long").as("cents"))
        .orderBy(col("user_id"), col("p_time"),
          col("s_time").asc_nulls_first, col("cents"))
    },

    // ——— exact Kendall τ-b between daily view and purchase volumes
    //     ("do view-heavy days convert?"): every day pair classified
    //     by integer sign tests; C/D exclude pairs tied on either
    //     axis, tie terms count ALL pairs tied on that axis (the
    //     standard n1/n2); √ of exact integers is IEEE-identical. ———
    Q("q206_kendall_tau",
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
        |), cls AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN a.x <> b.x AND a.y <> b.y
        |      AND ((a.x < b.x) = (a.y < b.y)) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(SUM(CASE WHEN a.x <> b.x AND a.y <> b.y
        |      AND ((a.x < b.x) <> (a.y < b.y)) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        |    CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
        |  FROM daily a JOIN daily b ON a.day < b.day
        |), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
        |SELECT n_days, (n_days * (n_days - 1)) // 2 AS n_pairs,
        |  c AS concordant, d AS discordant, tx AS ties_x, ty AS ties_y,
        |  round(CAST(c - d AS DOUBLE) /
        |    sqrt(CAST(((n_days * (n_days - 1)) // 2 - tx) *
        |              ((n_days * (n_days - 1)) // 2 - ty) AS DOUBLE)), 6)
        |    AS tau_b
        |FROM nd, cls""".stripMargin) { (s, dir) =>
      graft.ext.Profile.kendallTauDaily(t(s, dir, "events"), "ts",
        "event_type", "view", "purchase")
    },

    // ——— Lorenz-curve deciles of part revenue (ascending), exact
    //     cent sums, cumulative shares — the inequality table behind
    //     the Gini number. ———
    Q("q208_lorenz_deciles",
      """WITH per AS (
        |  SELECT l_partkey AS entity,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem GROUP BY 1
        |), d AS (
        |  SELECT entity, cents,
        |    ntile(10) OVER (ORDER BY cents, entity) AS dec
        |  FROM per
        |), g AS (
        |  SELECT dec, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |    CAST(SUM(cents) AS BIGINT) AS dcents
        |  FROM d GROUP BY 1
        |)
        |SELECT CAST(dec AS BIGINT) AS decile, n_entities,
        |  ROUND(CAST(dcents AS DOUBLE) / 100, 2) AS decile_value,
        |  ROUND(CAST(SUM(dcents) OVER (ORDER BY dec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / SUM(dcents) OVER (), 6) AS cum_share
        |FROM g ORDER BY decile""".stripMargin) { (s, dir) =>
      graft.ext.Profile.lorenzDeciles(t(s, dir, "lineitem"), "l_partkey",
        round(col("l_extendedprice") * 100).cast("long"))
    },

    // ——— streaming leaderboard (seventh streaming entry): top-10
    //     purchasers by exact cent total as a Complete-mode streaming
    //     aggregation — the continuously-maintained top-k shape; the
    //     final Complete table is hash-equal to the batch rollup, and
    //     the top-k cut happens ON the final table. ———
    Q("q209_streaming_topk",
      """SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1
        |ORDER BY cents DESC, user_id LIMIT 10""".stripMargin) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
      val q = graft.ext.Streaming.runToMemory(stream, "q209_topk",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      s.table("q209_topk")
        .orderBy(col("cents").desc, col("user_id")).limit(10)
    },

    // ——— degree assortativity of the co-purchase graph (Newman's r):
    //     per-edge degree sums as exact BIGINTs, r one fixed IEEE
    //     expression — hubs-to-hubs vs hubs-to-leaves in one number. ———
    Q("q210_assortativity",
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS g, CAST(l_partkey AS VARCHAR) AS item
        |  FROM lineitem
        |), und AS (
        |  SELECT DISTINCT a.item AS u, b.item AS v
        |  FROM it a JOIN it b USING (g) WHERE a.item < b.item
        |), deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        |  GROUP BY 1
        |), j AS (
        |  SELECT du.deg AS du, dv.deg AS dv
        |  FROM und e JOIN deg du ON e.u = du.node
        |             JOIN deg dv ON e.v = dv.node
        |), a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(du * dv) AS BIGINT) AS sp,
        |    CAST(SUM(du + dv) AS BIGINT) AS s1,
        |    CAST(SUM(du * du + dv * dv) AS BIGINT) AS s2
        |  FROM j
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
        |SELECT n_nodes, m AS n_edges,
        |  round((CAST(sp AS DOUBLE) / m -
        |      (CAST(s1 AS DOUBLE) / (2 * m)) * (CAST(s1 AS DOUBLE) / (2 * m)))
        |    / (CAST(s2 AS DOUBLE) / (2 * m) -
        |      (CAST(s1 AS DOUBLE) / (2 * m)) * (CAST(s1 AS DOUBLE) / (2 * m))),
        |    6) AS assortativity
        |FROM n, a""".stripMargin) { (s, dir) =>
      val edges = graft.ext.Graph.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      graft.ext.Graph.degreeAssortativity(edges)
    },

    // ——— entity resolution over the part-name dictionary: native
    //     Jaro–Winkler pairs at 0.85 → connected components →
    //     canonical form + sorted member roster per cluster; the
    //     oracle replays the closure with a recursive CTE. ———
    Q("q211_entity_resolution",
      """WITH RECURSIVE n AS (
        |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
        |), e AS (
        |  SELECT a.name AS na, b.name AS nb FROM n a JOIN n b ON a.name < b.name
        |  WHERE ROUND(jaro_winkler_similarity(a.name, b.name), 6) >= 0.85
        |), edges AS (
        |  SELECT na AS src, nb AS dst FROM e
        |  UNION SELECT nb AS src, na AS dst FROM e
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
        |), clusters AS (
        |  SELECT id, least(id, MIN(dst)) AS cluster FROM (
        |    SELECT src AS id, dst FROM reach) GROUP BY id
        |)
        |SELECT cluster AS canonical, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  string_agg(id, ',' ORDER BY id) AS members
        |FROM clusters GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Dedup.entityClusters(t(s, dir, "part"), "p_name",
        threshold = 0.85)
    },

    // ——— as-of NEAREST join (sensor-alignment variant of q46): each
    //     purchase matched to the closest signup on EITHER side, ties
    //     to the earlier match; one shuffle, two in-partition window
    //     sweeps. Distances compare in exact epoch micros. ———
    Q("q213_asof_nearest",
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT user_id, ts, value AS signup_value FROM events
        |  WHERE event_type = 'signup'
        |), b AS (
        |  SELECT p.event_id, p.user_id, p.ts, p.value,
        |    s.ts AS b_ts, s.signup_value AS b_val
        |  FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
        |), f AS (
        |  SELECT p.event_id, s.ts AS f_ts, s.signup_value AS f_val
        |  FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts <= s.ts
        |), m AS (
        |  SELECT b.event_id, b.user_id, b.value, b.ts, b.b_ts, b.b_val,
        |    f.f_ts, f.f_val,
        |    CASE WHEN b.b_ts IS NULL AND f.f_ts IS NULL THEN NULL
        |         WHEN f.f_ts IS NULL THEN TRUE
        |         WHEN b.b_ts IS NULL THEN FALSE
        |         WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
        |              <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN TRUE
        |         ELSE FALSE END AS take_back
        |  FROM b JOIN f USING (event_id)
        |)
        |SELECT event_id, user_id, value,
        |  CASE WHEN take_back THEN b_val ELSE f_val END AS signup_value,
        |  strftime(CASE WHEN take_back THEN b_ts ELSE f_ts END,
        |    '%Y-%m-%d %H:%M:%S') AS matched_ts,
        |  CASE WHEN take_back IS NULL THEN NULL
        |       WHEN take_back THEN 'backward' ELSE 'forward' END AS direction
        |FROM m ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("signup_value"))
      graft.engine.AsOf.asofNearest(purchases, signups,
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightPayload = Seq("signup_value"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("signup_value"),
          date_format(col("ts_matched"), "yyyy-MM-dd HH:mm:ss").as("matched_ts"),
          col("direction"))
        .orderBy("event_id")
    },

    // ——— personalized PageRank from one nation's suppliers over the
    //     part↔supplier graph: teleport mass 1/|seeds|, same integer
    //     micro-unit contribution sums as q126; damping constants
    //     emitted at %.17g into BOTH plans. ———
    Q("q214_ppr", {
      val oneMinusD = "%.17g".format(1.0 - 0.85)
      val d = "%.17g".format(0.85)
      def iter(i: Int): String =
        s"""c$i AS (
           |  SELECT a.dst AS node,
           |    CAST(SUM(CAST(round(r.pr / a.deg * 1e12) AS BIGINT)) AS BIGINT)
           |      AS cs
           |  FROM adj a JOIN r${i - 1} r ON a.src = r.node GROUP BY 1),
           |r$i AS (
           |  SELECT b.node,
           |    round($oneMinusD * b.s + $d * (COALESCE(c.cs, 0) / 1e12), 9)
           |      AS pr
           |  FROM base b LEFT JOIN c$i c ON b.node = c.node)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
         |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
         |  FROM lineitem
         |), und AS (
         |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
         |), deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |adj AS (SELECT u.src, u.dst, d.deg FROM und u JOIN deg d USING (src)),
         |sd AS (
         |  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
         |  FROM supplier WHERE s_nationkey = 3
         |), ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM sd),
         |base AS (
         |  SELECT d.src AS node,
         |    CASE WHEN sd.node IS NOT NULL THEN 1.0 / ns.ns ELSE 0.0 END AS s
         |  FROM (SELECT DISTINCT src FROM adj) d
         |  LEFT JOIN sd ON d.src = sd.node CROSS JOIN ns
         |), r0 AS (SELECT node, s AS pr FROM base),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT node, round(pr, 6) AS pr FROM r3
         |ORDER BY pr DESC, node LIMIT 20""".stripMargin }) { (s, dir) =>
      // distinct the INTEGER key pairs before tagging (guide §2.3:
      // narrower types, aggregate before you shuffle): the graph
      // operators dedupe their edge input anyway, so dedup here is
      // result-identical (injective tagging) while the heavy distinct
      // runs over 16-byte int pairs instead of row-scale strings —
      // measured 3.1 s → sub-second adjacency build at sf0.1
      val edges = t(s, dir, "lineitem")
        .select(col("l_partkey").as("_pk"), col("l_suppkey").as("_sk"))
        .distinct()
        .select(concat(lit("p"), col("_pk").cast("string")).as("src"),
          concat(lit("s"), col("_sk").cast("string")).as("dst"))
      val seeds = t(s, dir, "supplier").filter(col("s_nationkey") === 3)
        .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"))
      graft.ext.Graph.personalizedPageRank(edges, seeds, iterations = 3)
        .select(col("node"), round(col("rank"), 6).as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
    },

    // ——— semi-supervised label propagation: suppliers of nations
    //     < 12 seed their nation label; two clamped majority-vote
    //     rounds (ties → smallest label) spread it across the
    //     part↔supplier graph — fully deterministic, replayed
    //     round-by-round by the oracle. ———
    Q("q215_label_prop",
      """WITH e0 AS (
        |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM lineitem
        |), und AS (
        |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
        |), l0 AS (
        |  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node,
        |    'n' || CAST(s_nationkey AS VARCHAR) AS label
        |  FROM supplier WHERE s_nationkey < 12
        |), v1 AS (
        |  SELECT u.dst AS node, l.label, COUNT(*) AS votes
        |  FROM und u JOIN l0 l ON u.src = l.node
        |  WHERE u.dst NOT IN (SELECT node FROM l0)
        |  GROUP BY 1, 2
        |), w1 AS (
        |  SELECT node, label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY node
        |      ORDER BY votes DESC, label) AS rk FROM v1) WHERE rk = 1
        |), l1 AS (SELECT * FROM l0 UNION ALL SELECT * FROM w1),
        |v2 AS (
        |  SELECT u.dst AS node, l.label, COUNT(*) AS votes
        |  FROM und u JOIN l1 l ON u.src = l.node
        |  WHERE u.dst NOT IN (SELECT node FROM l1)
        |  GROUP BY 1, 2
        |), w2 AS (
        |  SELECT node, label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY node
        |      ORDER BY votes DESC, label) AS rk FROM v2) WHERE rk = 1
        |), l2 AS (SELECT * FROM l1 UNION ALL SELECT * FROM w2)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM l2 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // distinct the INTEGER key pairs before tagging (guide §2.3:
      // narrower types, aggregate before you shuffle): the graph
      // operators dedupe their edge input anyway, so dedup here is
      // result-identical (injective tagging) while the heavy distinct
      // runs over 16-byte int pairs instead of row-scale strings —
      // measured 3.1 s → sub-second adjacency build at sf0.1
      val edges = t(s, dir, "lineitem")
        .select(col("l_partkey").as("_pk"), col("l_suppkey").as("_sk"))
        .distinct()
        .select(concat(lit("p"), col("_pk").cast("string")).as("src"),
          concat(lit("s"), col("_sk").cast("string")).as("dst"))
      val seeds = t(s, dir, "supplier").filter(col("s_nationkey") < 12)
        .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"),
          concat(lit("n"), col("s_nationkey").cast("string")).as("label"))
      graft.ext.Graph.labelPropagation(edges, seeds, rounds = 2)
        .groupBy("label").agg(count(lit(1)).as("n_nodes"))
        .orderBy("label")
    },

    // ——— time-weighted average value per user (TWAP): each event's
    //     weight is its holding duration in exact epoch micros;
    //     Σ(cents·dur)/Σdur is one rounded division of BIGINTs. ———
    Q("q216_twap",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), d AS (
        |  SELECT user_id, cents,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t) - t AS dur
        |  FROM e
        |)
        |SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  round(CAST(SUM(cents * dur) AS DOUBLE) / SUM(dur), 6) AS twap_cents
        |FROM d WHERE dur IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Profile.twap(t(s, dir, "events"), "user_id", "ts",
        round(col("value") * 100).cast("long"))
    },

    // ——— top session journeys: event-type paths per q23 session
    //     (gaps-and-islands, same boundary rule), within-session
    //     order pinned by (ts, event_id), top-10 by frequency. ———
    Q("q217_top_paths",
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |             >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |), s AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m
        |), p AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.topSessionPaths(t(s, dir, "events"),
        gapMinutes = 5, k = 10)
    },

    // ——— per-brand OLS of quantity ~ whole-dollar price from exact
    //     integer sums (n, Σx, Σy, Σxy, Σx², Σy² in one pass):
    //     slope/intercept/R² are a fixed IEEE expression over them. ———
    Q("q218_ols_by_group",
      """WITH b AS (
        |  SELECT p.p_brand AS grp,
        |    CAST(round(l.l_extendedprice) AS BIGINT) AS x,
        |    CAST(l.l_quantity AS BIGINT) AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |), a AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM b GROUP BY 1
        |), c AS (
        |  SELECT grp, n,
        |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      AS denx,
        |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      AS deny,
        |    sx, sy
        |  FROM a
        |)
        |SELECT grp, n,
        |  CAST(floor(num / denx * 1e6 + 0.5) AS BIGINT) AS slope_micro,
        |  CAST(floor((CAST(sy AS DOUBLE) - (num / denx) * sx) / n * 1e6
        |    + 0.5) AS BIGINT) AS intercept_micro,
        |  CAST(floor(num * num / (denx * deny) * 1e6 + 0.5) AS BIGINT)
        |    AS r2_micro
        |FROM c ORDER BY grp""".stripMargin) { (s, dir) =>
      val joined = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
      graft.ext.Profile.olsByGroup(joined, "p_brand",
        round(col("l_extendedprice")), col("l_quantity"))
    },

    // ——— calendar gap filling with forward fill over the sparse
    //     minute-0 slice: complete day spine per event type, gaps
    //     carry the last observed daily total forward, fill flag
    //     kept — the densify-before-modeling step. ———
    Q("q219_forward_fill",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE minute(ts) = 0 GROUP BY 1, 2
        |), bounds AS (
        |  SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
        |), spine AS (
        |  SELECT g.grp, CAST(unnest(range(b.lo, b.hi + 1)) AS BIGINT) AS day
        |  FROM (SELECT DISTINCT grp FROM daily) g CROSS JOIN bounds b
        |)
        |SELECT s.grp, s.day,
        |  last_value(d.cents IGNORE NULLS) OVER (PARTITION BY s.grp
        |    ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS cents,
        |  CAST(CASE WHEN d.cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
        |FROM spine s LEFT JOIN daily d ON s.grp = d.grp AND s.day = d.day
        |ORDER BY s.grp, s.day""".stripMargin) { (s, dir) =>
      graft.ext.Profile.forwardFillDaily(
        t(s, dir, "events").filter(minute(col("ts")) === 0),
        "event_type", "ts", round(col("value") * 100).cast("long"))
    },

    // ——— conversion latency signup→purchase: nearest-rank p50/p90
    //     over exact epoch-micro delays of first-signup to first
    //     subsequent purchase; non-converters drop (q115 counts
    //     them). ———
    Q("q220_conversion_latency",
      """WITH su AS (
        |  SELECT user_id AS ent, MIN(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), pu AS (
        |  SELECT e.user_id AS ent, MIN(e.ts) AS p_ts, MIN(su.s_ts) AS s_ts
        |  FROM events e JOIN su ON e.user_id = su.ent
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
        |  GROUP BY 1
        |), d AS (
        |  SELECT epoch_us(p_ts) - epoch_us(s_ts) AS delay FROM pu
        |), r AS (
        |  SELECT delay, row_number() OVER (ORDER BY delay) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM d
        |)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_entities,
        |  round(CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN delay END)
        |    AS DOUBLE) / 1e6, 6) AS p50_seconds,
        |  round(CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN delay END)
        |    AS DOUBLE) / 1e6, 6) AS p90_seconds
        |FROM r""".stripMargin) { (s, dir) =>
      graft.ext.Profile.conversionLatency(t(s, dir, "events"), "user_id",
        "ts", "event_type", "signup", "purchase")
    },

    // ——— supplier-concentration HHI per part: Σshare² as one exact
    //     integer ratio Σw²/(Σw)², multi-supplier parts only, top-20
    //     most concentrated. ———
    Q("q221_supplier_hhi",
      """WITH q AS (
        |  SELECT l_partkey AS grp, l_suppkey AS member,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2
        |), h AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_members,
        |    CAST(SUM(w * w) AS BIGINT) AS sq, CAST(SUM(w) AS BIGINT) AS tot
        |  FROM q GROUP BY 1
        |)
        |SELECT grp, n_members,
        |  round(CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)),
        |    6) AS hhi
        |FROM h WHERE n_members >= 2
        |ORDER BY hhi DESC, grp LIMIT 20""".stripMargin) { (s, dir) =>
      graft.ext.Profile.concentrationHHI(t(s, dir, "lineitem"),
          "l_partkey", "l_suppkey", col("l_quantity").cast("long"))
        .orderBy(col("hhi").desc, col("grp")).limit(20)
    },

    // ——— mergeable-rollup law UNDER the oracle: monthly stats built
    //     by MERGING daily partial states (sum/count/min/max re-agg)
    //     hash-equal to the direct monthly computation from raw rows.
    //     This is the incremental-pipeline invariant — at 100 TB you
    //     re-aggregate yesterday's partials, never yesterday's rows;
    //     the oracle computes the DIRECT form, so the gate proves the
    //     merge changes nothing. ———
    Q("q222_rollup_merge",
      """SELECT event_type,
        |  strftime(CAST(ts AS DATE), '%Y-%m') AS month,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // stage 1: daily partial states (what an incremental pipeline
      // persists); stage 2: monthly = MERGE of partials — counts and
      // sums re-sum, mins/maxes re-min/max. No raw row is touched in
      // stage 2.
      val daily = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n"), sum("c").as("cents"),
          min("c").as("min_cents"), max("c").as("max_cents"))
      daily
        .groupBy(col("event_type"),
          date_format(col("day"), "yyyy-MM").as("month"))
        .agg(sum("n").cast("long").as("n"),
          sum("cents").cast("long").as("cents"),
          min("min_cents").cast("long").as("min_cents"),
          max("max_cents").cast("long").as("max_cents"))
        .orderBy("event_type", "month")
    },

    // ——— peak concurrent sessions per day: +1/−1 interval sweep over
    //     the q23 sessions, CLIPPED at day boundaries so the running
    //     sum partitions by day (parallel) instead of one global
    //     ordered task; ties settle ends before starts. ———
    Q("q223_peak_concurrency",
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |             >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m
        |), sess AS (
        |  SELECT epoch_us(MIN(ts)) AS lo,
        |         epoch_us(MAX(ts)) + 300000000 AS hi
        |  FROM g GROUP BY user_id, sid
        |), clipped AS (
        |  SELECT unnest(range(lo // 86400000000, (hi - 1) // 86400000000 + 1))
        |      AS day, lo, hi
        |  FROM sess
        |), c2 AS (
        |  SELECT day, GREATEST(lo, day * 86400000000) AS cs,
        |         LEAST(hi, (day + 1) * 86400000000) AS ce
        |  FROM clipped
        |), sweep AS (
        |  SELECT day, cs AS t, 1 AS d FROM c2
        |  UNION ALL SELECT day, ce AS t, -1 AS d FROM c2
        |), r AS (
        |  SELECT day, d, SUM(d) OVER (PARTITION BY day ORDER BY t, d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM sweep
        |)
        |SELECT day, CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sessions,
        |  CAST(MAX(run) AS BIGINT) AS peak
        |FROM r GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.peakConcurrency(t(s, dir, "events"))
    },

    // ——— day-over-day trending brand ranks: rank per shipping day by
    //     count (ties to smaller brand), delta vs the brand's previous
    //     OBSERVED day; top-5 emitted, ranks computed over the full
    //     dictionary-sized daily aggregate. ———
    Q("q224_trending",
      """WITH daily AS (
        |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day, p.p_brand AS item, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT day, item, n, CAST(row_number() OVER (PARTITION BY day
        |    ORDER BY n DESC, item) AS BIGINT) AS rnk
        |  FROM daily
        |), lagged AS (
        |  SELECT day, item, n, rnk,
        |    CAST(lag(rnk) OVER (PARTITION BY item ORDER BY day) AS BIGINT)
        |      AS prev_rnk
        |  FROM ranked
        |)
        |SELECT day, item, n, rnk, prev_rnk,
        |  CAST(prev_rnk - rnk AS BIGINT) AS rank_delta
        |FROM lagged WHERE rnk <= 5
        |ORDER BY day, rnk""".stripMargin) { (s, dir) =>
      val joined = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
      graft.ext.Profile.trendingRanks(joined,
        datediff(to_date(col("l_shipdate")), lit("1970-01-01")), "p_brand")
    },

    // ——— interval-union coverage per supplier: order→ship day spans
    //     merged by the running-max gaps-and-islands rule (lag(end)
    //     alone is wrong when an interval swallows the next); raw
    //     count vs merged islands vs covered days, top-20. ———
    Q("q225_interval_coverage",
      """WITH iv AS (
        |  SELECT l_suppkey AS key,
        |    LEAST(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT),
        |          CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT))
        |      AS s,
        |    GREATEST(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT),
        |             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT))
        |      AS e
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), m AS (
        |  SELECT key, s, e,
        |    CASE WHEN MAX(e) OVER (PARTITION BY key ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR s > MAX(e) OVER (PARTITION BY key ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS nw
        |  FROM iv
        |), g AS (
        |  SELECT key, s, e, SUM(nw) OVER (PARTITION BY key ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM m
        |), isle AS (
        |  SELECT key, isl, COUNT(*) AS n_iv, MIN(s) AS i_s, MAX(e) AS i_e
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT key, CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(i_e - i_s + 1) AS BIGINT) AS covered
        |FROM isle GROUP BY key
        |ORDER BY covered DESC, key LIMIT 20""".stripMargin) { (s, dir) =>
      val iv = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("key"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("d1"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01")).as("d2"))
      graft.ext.Profile.intervalCoverage(iv, "key",
          least(col("d1"), col("d2")), greatest(col("d1"), col("d2")))
        .orderBy(col("covered").desc, col("key")).limit(20)
    },

    // ——— STREAMING stream-static enrichment against the batch
    //     oracle: the event stream broadcast-joins the customer
    //     dimension every micro-batch (the "attach attributes at
    //     ingest" shape — state stays bounded by the window agg
    //     alone), then hourly counts + exact decimal sums per market
    //     segment; Complete mode so every window emits. ———
    Q("q227_streaming_enrich",
      """SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  c.c_mktsegment AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2
        |ORDER BY hour, segment""".stripMargin) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"))
      val q = graft.ext.Streaming.runToMemory(
        graft.ext.Streaming.enrichedHourly(stream, dim, "user_id", "segment"),
        "q227_enrich", org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      s.table("q227_enrich").orderBy("hour", "segment")
    },

    // ——— HITS hubs & authorities on the directed part→supplier
    //     graph, two iterations: per half-step, integer micro-unit
    //     contribution sums L1-normalized by the exact BIGINT total
    //     (a scalar subquery in the replay) — the oracle replays
    //     half-step by half-step, q126-style. Top-20 authorities. ———
    Q("q228_hits",
      """WITH e0 AS (
        |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM lineitem
        |), h0 AS (
        |  SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS h FROM e0
        |), a1q AS (
        |  SELECT e.dst AS node,
        |    CAST(SUM(CAST(round(h.h * 1e12) AS BIGINT)) AS BIGINT) AS q
        |  FROM e0 e JOIN h0 h ON e.src = h.node GROUP BY 1
        |), a1 AS (
        |  SELECT node, round(CAST(q AS DOUBLE) /
        |    CAST((SELECT SUM(q) FROM a1q) AS DOUBLE), 9) AS a FROM a1q
        |), h1q AS (
        |  SELECT e.src AS node,
        |    CAST(SUM(CAST(round(a.a * 1e12) AS BIGINT)) AS BIGINT) AS q
        |  FROM e0 e JOIN a1 a ON e.dst = a.node GROUP BY 1
        |), h1 AS (
        |  SELECT node, round(CAST(q AS DOUBLE) /
        |    CAST((SELECT SUM(q) FROM h1q) AS DOUBLE), 9) AS h FROM h1q
        |), a2q AS (
        |  SELECT e.dst AS node,
        |    CAST(SUM(CAST(round(h.h * 1e12) AS BIGINT)) AS BIGINT) AS q
        |  FROM e0 e JOIN h1 h ON e.src = h.node GROUP BY 1
        |), a2 AS (
        |  SELECT node, round(CAST(q AS DOUBLE) /
        |    CAST((SELECT SUM(q) FROM a2q) AS DOUBLE), 9) AS a FROM a2q
        |), h2q AS (
        |  SELECT e.src AS node,
        |    CAST(SUM(CAST(round(a.a * 1e12) AS BIGINT)) AS BIGINT) AS q
        |  FROM e0 e JOIN a2 a ON e.dst = a.node GROUP BY 1
        |), h2 AS (
        |  SELECT node, round(CAST(q AS DOUBLE) /
        |    CAST((SELECT SUM(q) FROM h2q) AS DOUBLE), 9) AS h FROM h2q
        |), fo AS (
        |  SELECT COALESCE(a.node, h.node) AS node,
        |    COALESCE(a.a, 0.0) AS a, COALESCE(h.h, 0.0) AS h
        |  FROM a2 a FULL OUTER JOIN h2 h ON a.node = h.node
        |)
        |SELECT node, round(a, 6) AS a, round(h, 6) AS h
        |FROM fo ORDER BY a DESC, node LIMIT 20""".stripMargin) { (s, dir) =>
      // distinct the INTEGER key pairs before tagging (guide §2.3:
      // narrower types, aggregate before you shuffle): the graph
      // operators dedupe their edge input anyway, so dedup here is
      // result-identical (injective tagging) while the heavy distinct
      // runs over 16-byte int pairs instead of row-scale strings —
      // measured 3.1 s → sub-second adjacency build at sf0.1
      val edges = t(s, dir, "lineitem")
        .select(col("l_partkey").as("_pk"), col("l_suppkey").as("_sk"))
        .distinct()
        .select(concat(lit("p"), col("_pk").cast("string")).as("src"),
          concat(lit("s"), col("_sk").cast("string")).as("dst"))
      graft.ext.Graph.hits(edges, iterations = 2)
        .select(col("node"), round(col("a"), 6).as("a"),
          round(col("h"), 6).as("h"))
        .orderBy(col("a").desc, col("node")).limit(20)
    },

    // ——— k-anonymity / l-diversity release audit: every
    //     (nation, segment) quasi-identifier class with fewer than
    //     k=10 members or fewer than l=3 distinct account-balance
    //     bands is a re-identification / attribute-disclosure risk.
    //     acctbal is an exact 2-decimal double, so the /2000 + floor
    //     banding is the same IEEE arithmetic in both engines. ———
    Q("q229_k_anonymity",
      """SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT))
        |    AS BIGINT) AS n_sensitive,
        |  (COUNT(*) < 10) AS k_risky,
        |  (COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) < 3)
        |    AS l_risky
        |FROM customer
        |GROUP BY 1, 2
        |HAVING COUNT(*) < 10
        |    OR COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) < 3
        |ORDER BY nation, segment""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
        .withColumn("sens", floor(col("c_acctbal") / 2000).cast("long"))
      graft.ext.Privacy.kAnonymityAudit(c,
          Seq("c_nationkey", "c_mktsegment"), "sens", k = 10, l = 3)
        .select(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"), col("n"), col("n_sensitive"),
          col("k_risky"), col("l_risky"))
        .orderBy("nation", "segment")
    },

    // ——— t-closeness release audit (the disclosure k/l-diversity
    //     misses): per nation class, variational distance between its
    //     market-segment mix and the population's — zero cells
    //     included via the class×value grid; 1e-9-quantized terms and
    //     an integer-mass t compare, so the verdict can't wobble. ———
    Q("q323_t_closeness",
      """WITH cls AS (
        |  SELECT c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1
        |), vals AS (
        |  SELECT c_mktsegment AS v, CAST(COUNT(*) AS BIGINT) AS g
        |  FROM customer GROUP BY 1
        |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM customer),
        |cv AS (
        |  SELECT c_nationkey AS nation, c_mktsegment AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM customer GROUP BY 1, 2
        |), grid AS (
        |  SELECT cls.nation, cls.n, vals.v, vals.g, tot.nn,
        |    COALESCE(cv.c, 0) AS c
        |  FROM cls CROSS JOIN vals CROSS JOIN tot
        |  LEFT JOIN cv ON cv.nation = cls.nation AND cv.v = vals.v
        |), terms AS (
        |  SELECT nation, n,
        |    CAST(round(1e9 * abs(CAST(c AS DOUBLE) / n
        |      - CAST(g AS DOUBLE) / nn)) AS BIGINT) AS t_u
        |  FROM grid
        |)
        |SELECT nation, n,
        |  round(CAST(SUM(t_u) AS DOUBLE) / 2e9, 6) AS distance,
        |  (SUM(t_u) > 400000000) AS t_risky
        |FROM terms GROUP BY 1, 2
        |ORDER BY nation""".stripMargin) { (s, dir) =>
      graft.ext.Privacy.tClosenessAudit(t(s, dir, "customer"),
          Seq("c_nationkey"), "c_mktsegment", t = 0.2)
        .select(col("c_nationkey").as("nation"), col("n"),
          col("distance"), col("t_risky"))
        .orderBy("nation")
    },

    // ——— blocking-quality scorecard for entity resolution: how much
    //     does first-char blocking shrink the pair space (reduction
    //     ratio) and how many JW ≥ 0.75 true matches does it keep
    //     (pair completeness)? Block pairs from block SIZES; the
    //     truth side is the deliberate gated O(n²) dictionary scan
    //     (q172's kernel and rounding). ———
    Q("q231_blocking_quality",
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part
        |           WHERE p_name IS NOT NULL),
        |cnt AS (SELECT COUNT(*) AS c FROM n),
        |blk AS (SELECT substr(name, 1, 1) AS b, COUNT(*) AS s
        |        FROM n GROUP BY 1),
        |bp AS (SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT)
        |         AS n_block_pairs FROM blk),
        |tp AS (
        |  SELECT COUNT(*) AS n_true,
        |    CAST(COALESCE(SUM(CASE WHEN substr(a.name, 1, 1) =
        |      substr(b.name, 1, 1) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |      AS n_true_in_block
        |  FROM n a JOIN n b ON a.name < b.name
        |  WHERE ROUND(jaro_winkler_similarity(a.name, b.name), 6) >= 0.75
        |)
        |SELECT CAST(cnt.c AS BIGINT) AS n_names,
        |  CAST(cnt.c * (cnt.c - 1) // 2 AS BIGINT) AS n_all_pairs,
        |  bp.n_block_pairs,
        |  CAST(tp.n_true AS BIGINT) AS n_true,
        |  tp.n_true_in_block,
        |  ROUND(1.0 - CAST(bp.n_block_pairs AS DOUBLE)
        |    / CAST(cnt.c * (cnt.c - 1) // 2 AS DOUBLE), 6)
        |    AS reduction_ratio,
        |  CASE WHEN tp.n_true = 0 THEN NULL
        |       ELSE ROUND(CAST(tp.n_true_in_block AS DOUBLE)
        |         / CAST(tp.n_true AS DOUBLE), 6) END AS pair_completeness
        |FROM cnt, bp, tp""".stripMargin) { (s, dir) =>
      graft.ext.Dedup.blockingQuality(t(s, dir, "part"), "p_name",
        threshold = 0.75)
    },

    // ——— functional-dependency audit: does LHS determine RHS, and
    //     if not, how many rows must go (the g3 error — the MINIMUM
    //     deletions for the FD to hold: per violating group, size
    //     minus the plurality RHS count)? One true key FD, one false
    //     single-column FD, one false composite-LHS FD over a derived
    //     band; all-integer counts, one rounded division each. ———
    Q("q233_fd_discovery",
      """WITH fd1v AS (
        |  SELECT c_custkey AS k, c_nationkey AS v, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2
        |), fd1g AS (
        |  SELECT k, COUNT(*) AS nr, CAST(SUM(n) AS BIGINT) AS rws,
        |    CAST(MAX(n) AS BIGINT) AS mx
        |  FROM fd1v GROUP BY 1
        |), fd1 AS (
        |  SELECT 'custkey->nationkey' AS fd,
        |    CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(SUM(rws - mx) AS BIGINT) AS g3_rows,
        |    (SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0) AS holds,
        |    ROUND(1.0 - CAST(SUM(rws - mx) AS DOUBLE)
        |      / CAST(SUM(rws) AS DOUBLE), 6) AS confidence
        |  FROM fd1g
        |), fd2v AS (
        |  SELECT c_mktsegment AS k, c_nationkey AS v, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2
        |), fd2g AS (
        |  SELECT k, COUNT(*) AS nr, CAST(SUM(n) AS BIGINT) AS rws,
        |    CAST(MAX(n) AS BIGINT) AS mx
        |  FROM fd2v GROUP BY 1
        |), fd2 AS (
        |  SELECT 'mktsegment->nationkey' AS fd,
        |    CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(SUM(rws - mx) AS BIGINT) AS g3_rows,
        |    (SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0) AS holds,
        |    ROUND(1.0 - CAST(SUM(rws - mx) AS DOUBLE)
        |      / CAST(SUM(rws) AS DOUBLE), 6) AS confidence
        |  FROM fd2g
        |), fd3v AS (
        |  SELECT c_nationkey AS k1, c_mktsegment AS k2,
        |    CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS v, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2, 3
        |), fd3g AS (
        |  SELECT k1, k2, COUNT(*) AS nr, CAST(SUM(n) AS BIGINT) AS rws,
        |    CAST(MAX(n) AS BIGINT) AS mx
        |  FROM fd3v GROUP BY 1, 2
        |), fd3 AS (
        |  SELECT 'nation_segment->bal_band' AS fd,
        |    CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(SUM(rws - mx) AS BIGINT) AS g3_rows,
        |    (SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0) AS holds,
        |    ROUND(1.0 - CAST(SUM(rws - mx) AS DOUBLE)
        |      / CAST(SUM(rws) AS DOUBLE), 6) AS confidence
        |  FROM fd3g
        |)
        |SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
        |UNION ALL SELECT * FROM fd3
        |ORDER BY fd""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
        .withColumn("bal_band", floor(col("c_acctbal") / 2000).cast("long"))
      graft.ext.Profile.fdAudit(c, Seq(
        ("custkey->nationkey", Seq("c_custkey"), "c_nationkey"),
        ("mktsegment->nationkey", Seq("c_mktsegment"), "c_nationkey"),
        ("nation_segment->bal_band", Seq("c_nationkey", "c_mktsegment"),
          "bal_band")))
    },

    // ——— single-changepoint detection (binary-segmentation step 1)
    //     per event type: the split of the ordered daily-count
    //     series maximizing between-segment SS, from PREFIX SUMS
    //     only (no quadratic segment scan); argmax on the micro-
    //     quantized gain, ties to the earliest day; strength = the
    //     one-split R². ———
    Q("q234_changepoint",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), c AS (
        |  SELECT grp, day, y,
        |    CAST(row_number() OVER w AS BIGINT) AS t,
        |    CAST(SUM(y) OVER w AS BIGINT) AS s_l,
        |    CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS nd,
        |    CAST(SUM(y) OVER (PARTITION BY grp) AS BIGINT) AS s,
        |    CAST(SUM(y * y) OVER (PARTITION BY grp) AS BIGINT) AS ss
        |  FROM daily
        |  WINDOW w AS (PARTITION BY grp ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), g AS (
        |  SELECT *, s - s_l AS s_r,
        |    CAST(round((CAST(s_l AS DOUBLE) * s_l / t
        |      + CAST(s - s_l AS DOUBLE) * (s - s_l) / (nd - t)) * 1e3)
        |      AS BIGINT) AS gain_u
        |  FROM c WHERE t < nd
        |), b AS (
        |  SELECT *, row_number() OVER (PARTITION BY grp
        |    ORDER BY gain_u DESC, t) AS rk
        |  FROM g
        |)
        |SELECT grp, nd AS n_days, day AS split_day,
        |  ROUND(CAST(s_l AS DOUBLE) / t, 6) AS mean_left,
        |  ROUND(CAST(s_r AS DOUBLE) / (nd - t), 6) AS mean_right,
        |  CASE WHEN CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / nd = 0
        |    THEN NULL
        |    ELSE ROUND((CAST(gain_u AS DOUBLE) / 1e3
        |        - CAST(s AS DOUBLE) * s / nd)
        |      / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / nd), 6)
        |  END AS strength
        |FROM b WHERE rk = 1 ORDER BY grp""".stripMargin) { (s, dir) =>
      graft.ext.Profile.changepointDaily(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— link prediction on the sampled co-purchase graph: score
    //     non-adjacent part pairs at distance 2 by common neighbors
    //     + Adamic–Adar (micro-quantized 1/ln(deg) per wedge — the
    //     sum is order-free) + Jaccard; candidates ONLY from the
    //     wedge join (pairs with cn ≥ 1), existing edges anti-joined
    //     away, top-50 by AA. The 1-in-20 order sample keeps this
    //     synthetic graph's uniform density realistic (q202's
    //     documented-sample pattern). ———
    Q("q235_link_prediction",
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS g, CAST(l_partkey AS VARCHAR) AS item
        |  FROM lineitem WHERE l_orderkey % 20 = 0
        |), e AS (
        |  SELECT DISTINCT a.item AS u, b.item AS v
        |  FROM it a JOIN it b USING (g) WHERE a.item < b.item
        |), und AS (
        |  SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v AS src, u AS dst FROM e
        |), deg AS (
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1
        |), ctr AS (
        |  SELECT und.src AS w, und.dst AS n,
        |    CAST(round(1e6 / ln(CAST(deg.deg AS DOUBLE))) AS BIGINT) AS c_u
        |  FROM und JOIN deg ON und.src = deg.src AND deg.deg >= 2
        |), wed AS (
        |  SELECT a.n AS u, b.n AS v, a.c_u
        |  FROM ctr a JOIN ctr b ON a.w = b.w AND a.n < b.n
        |), sc AS (
        |  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
        |    CAST(SUM(c_u) AS BIGINT) AS aa_u
        |  FROM wed GROUP BY 1, 2
        |), ne AS (
        |  SELECT sc.* FROM sc LEFT JOIN e
        |    ON sc.u = e.u AND sc.v = e.v
        |  WHERE e.u IS NULL
        |)
        |SELECT ne.u, ne.v, ne.cn, du.deg AS deg_u, dv.deg AS deg_v,
        |  CAST(CAST(round(ne.cn * 1e6 / (du.deg + dv.deg - ne.cn))
        |    AS BIGINT) AS DOUBLE) / 1e6 AS jaccard,
        |  CAST(ne.aa_u AS DOUBLE) / 1e6 AS adamic_adar
        |FROM ne JOIN deg du ON ne.u = du.src
        |        JOIN deg dv ON ne.v = dv.src
        |ORDER BY ne.aa_u DESC, ne.u, ne.v LIMIT 50""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 20 === 0)
      val edges = graft.ext.Graph.coOccurrenceEdges(li,
        "l_orderkey", "l_partkey")
      graft.ext.Graph.linkPrediction(edges, topK = 50)
    },

    // ——— shuffle-skew audit: would a shuffle on this key melt a
    //     reducer at 1000 executors? Rows bucketed by the engine-
    //     portable md5-hex7 hash into 32 buckets; straggler factor
    //     (max/mean bucket), hottest single key, and cardinality per
    //     candidate key — the pre-flight check before picking a join
    //     / repartition key. Ratios are micro-quantized BIGINTs. ———
    Q("q236_shuffle_skew",
      """WITH a1k AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1
        |), a1b AS (
        |  SELECT CAST(concat('0x', substring(md5(k), 1, 7)) AS BIGINT) % 32
        |    AS bucket, CAST(SUM(n) AS BIGINT) AS bn
        |  FROM a1k GROUP BY 1
        |), a1 AS (
        |  SELECT 'lineitem.l_orderkey' AS key_label,
        |    t.nr AS n_rows, tk.nk AS n_keys, t.bu AS buckets_used,
        |    t.mx AS max_bucket_rows,
        |    CAST(CAST(round(t.mx * 32 * 1e6 / t.nr) AS BIGINT) AS DOUBLE)
        |      / 1e6 AS skew_x,
        |    tk.mk AS top_key_rows,
        |    CAST(CAST(round(tk.mk * 1e6 / t.nr) AS BIGINT) AS DOUBLE)
        |      / 1e6 AS top_key_share
        |  FROM (SELECT CAST(SUM(bn) AS BIGINT) nr,
        |          CAST(COUNT(*) AS BIGINT) bu, CAST(MAX(bn) AS BIGINT) mx
        |        FROM a1b) t,
        |       (SELECT CAST(MAX(n) AS BIGINT) mk,
        |          CAST(COUNT(*) AS BIGINT) nk FROM a1k) tk
        |), a2k AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS k, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1
        |), a2b AS (
        |  SELECT CAST(concat('0x', substring(md5(k), 1, 7)) AS BIGINT) % 32
        |    AS bucket, CAST(SUM(n) AS BIGINT) AS bn
        |  FROM a2k GROUP BY 1
        |), a2 AS (
        |  SELECT 'lineitem.l_partkey' AS key_label,
        |    t.nr, tk.nk, t.bu, t.mx,
        |    CAST(CAST(round(t.mx * 32 * 1e6 / t.nr) AS BIGINT) AS DOUBLE)
        |      / 1e6,
        |    tk.mk,
        |    CAST(CAST(round(tk.mk * 1e6 / t.nr) AS BIGINT) AS DOUBLE) / 1e6
        |  FROM (SELECT CAST(SUM(bn) AS BIGINT) nr,
        |          CAST(COUNT(*) AS BIGINT) bu, CAST(MAX(bn) AS BIGINT) mx
        |        FROM a2b) t,
        |       (SELECT CAST(MAX(n) AS BIGINT) mk,
        |          CAST(COUNT(*) AS BIGINT) nk FROM a2k) tk
        |), a3k AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS k, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1
        |), a3b AS (
        |  SELECT CAST(concat('0x', substring(md5(k), 1, 7)) AS BIGINT) % 32
        |    AS bucket, CAST(SUM(n) AS BIGINT) AS bn
        |  FROM a3k GROUP BY 1
        |), a3 AS (
        |  SELECT 'lineitem.l_suppkey' AS key_label,
        |    t.nr, tk.nk, t.bu, t.mx,
        |    CAST(CAST(round(t.mx * 32 * 1e6 / t.nr) AS BIGINT) AS DOUBLE)
        |      / 1e6,
        |    tk.mk,
        |    CAST(CAST(round(tk.mk * 1e6 / t.nr) AS BIGINT) AS DOUBLE) / 1e6
        |  FROM (SELECT CAST(SUM(bn) AS BIGINT) nr,
        |          CAST(COUNT(*) AS BIGINT) bu, CAST(MAX(bn) AS BIGINT) mx
        |        FROM a3b) t,
        |       (SELECT CAST(MAX(n) AS BIGINT) mk,
        |          CAST(COUNT(*) AS BIGINT) nk FROM a3k) tk
        |), a4k AS (
        |  SELECT CAST(o_custkey AS VARCHAR) AS k, COUNT(*) AS n
        |  FROM orders GROUP BY 1
        |), a4b AS (
        |  SELECT CAST(concat('0x', substring(md5(k), 1, 7)) AS BIGINT) % 32
        |    AS bucket, CAST(SUM(n) AS BIGINT) AS bn
        |  FROM a4k GROUP BY 1
        |), a4 AS (
        |  SELECT 'orders.o_custkey' AS key_label,
        |    t.nr, tk.nk, t.bu, t.mx,
        |    CAST(CAST(round(t.mx * 32 * 1e6 / t.nr) AS BIGINT) AS DOUBLE)
        |      / 1e6,
        |    tk.mk,
        |    CAST(CAST(round(tk.mk * 1e6 / t.nr) AS BIGINT) AS DOUBLE) / 1e6
        |  FROM (SELECT CAST(SUM(bn) AS BIGINT) nr,
        |          CAST(COUNT(*) AS BIGINT) bu, CAST(MAX(bn) AS BIGINT) mx
        |        FROM a4b) t,
        |       (SELECT CAST(MAX(n) AS BIGINT) mk,
        |          CAST(COUNT(*) AS BIGINT) nk FROM a4k) tk
        |)
        |SELECT * FROM a1 UNION ALL SELECT * FROM a2
        |UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4
        |ORDER BY key_label""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val or = t(s, dir, "orders")
      Seq(
        graft.ext.Profile.shuffleSkewAudit(li, "l_orderkey",
          "lineitem.l_orderkey"),
        graft.ext.Profile.shuffleSkewAudit(li, "l_partkey",
          "lineitem.l_partkey"),
        graft.ext.Profile.shuffleSkewAudit(li, "l_suppkey",
          "lineitem.l_suppkey"),
        graft.ext.Profile.shuffleSkewAudit(or, "o_custkey",
          "orders.o_custkey"))
        .reduce(_ unionByName _).orderBy("key_label")
    },

    // ——— golden-record survivorship: q211's JW-0.85 name clusters,
    //     then every part row of a cluster merges into ONE canonical
    //     record — plurality brand/mfgr (ties to smallest value, the
    //     modeShare convention), max retailprice/size, row + name
    //     lineage counts; singleton names survive as their own
    //     golden record. The master-data-management close of the
    //     blocking → matching → clustering chain. ———
    Q("q237_golden_record",
      """WITH RECURSIVE n AS (
        |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
        |), e AS (
        |  SELECT a.name AS na, b.name AS nb FROM n a JOIN n b ON a.name < b.name
        |  WHERE ROUND(jaro_winkler_similarity(a.name, b.name), 6) >= 0.85
        |), edges AS (
        |  SELECT na AS src, nb AS dst FROM e
        |  UNION SELECT nb AS src, na AS dst FROM e
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
        |), cl AS (
        |  SELECT id, least(id, MIN(dst)) AS cluster FROM (
        |    SELECT src AS id, dst FROM reach) GROUP BY id
        |), asg AS (
        |  SELECT n.name, COALESCE(cl.cluster, n.name) AS cluster
        |  FROM n LEFT JOIN cl ON n.name = cl.id
        |), rws AS (
        |  SELECT a.cluster, p.p_name, p.p_brand, p.p_type,
        |    p.p_retailprice, p.p_size
        |  FROM part p JOIN asg a ON p.p_name = a.name
        |), base AS (
        |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names,
        |    MAX(p_retailprice) AS max_retailprice,
        |    CAST(MAX(p_size) AS BIGINT) AS max_size
        |  FROM rws GROUP BY 1
        |), bm AS (
        |  SELECT cluster, p_brand AS brand FROM (
        |    SELECT cluster, p_brand,
        |      row_number() OVER (PARTITION BY cluster
        |        ORDER BY COUNT(*) DESC, p_brand) AS rk
        |    FROM rws GROUP BY cluster, p_brand)
        |  WHERE rk = 1
        |), mm AS (
        |  SELECT cluster, p_type AS ptype FROM (
        |    SELECT cluster, p_type,
        |      row_number() OVER (PARTITION BY cluster
        |        ORDER BY COUNT(*) DESC, p_type) AS rk
        |    FROM rws GROUP BY cluster, p_type)
        |  WHERE rk = 1
        |)
        |SELECT base.cluster AS canonical, base.n_rows, base.n_names,
        |  base.max_retailprice, base.max_size, bm.brand, mm.ptype
        |FROM base JOIN bm USING (cluster) JOIN mm USING (cluster)
        |ORDER BY canonical""".stripMargin) { (s, dir) =>
      graft.ext.Dedup.goldenRecords(
        t(s, dir, "part").withColumn("p_size", col("p_size").cast("long")),
        "p_name", threshold = 0.85,
        modeCols = Seq(("p_brand", "brand"), ("p_type", "ptype")),
        maxCols = Seq(("p_retailprice", "max_retailprice"),
          ("p_size", "max_size")))
    },

    // ——— rank-1 ALS on the customer×brand spend matrix: closed-form
    //     per side (no solver at rank 1), one alternation from
    //     v₀ ≡ 1 — u = per-customer mean cents, milli-normalized by
    //     the global max (keeps Σ r·u inside BIGINT at any user
    //     count), then the exact-integer v-step; brands report the
    //     micro-normalized latent score. ———
    Q("q239_als_rank1",
      """WITH r AS (
        |  SELECT o.o_custkey AS c, p.p_brand AS b,
        |    CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |                JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY 1, 2
        |), u0 AS (
        |  SELECT c, CAST(round(CAST(SUM(r) AS DOUBLE) / COUNT(*))
        |    AS BIGINT) AS u
        |  FROM r GROUP BY 1
        |), um AS (SELECT CAST(MAX(abs(u)) AS BIGINT) AS m FROM u0),
        |un AS (
        |  SELECT c, CAST(round(CAST(u0.u AS DOUBLE) * 1e3 / um.m)
        |    AS BIGINT) AS un
        |  FROM u0, um
        |), v1 AS (
        |  SELECT r.b, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(round(CAST(SUM(r.r * un.un) AS DOUBLE) * 1e3 /
        |      CAST(SUM(un.un * un.un) AS DOUBLE)) AS BIGINT) AS v
        |  FROM r JOIN un ON r.c = un.c GROUP BY 1
        |), vm AS (SELECT CAST(MAX(abs(v)) AS BIGINT) AS m FROM v1)
        |SELECT v1.b, v1.n_users,
        |  CAST(CAST(round(CAST(v1.v AS DOUBLE) * 1e6 / vm.m) AS BIGINT)
        |    AS DOUBLE) / 1e6 AS v_score
        |FROM v1, vm ORDER BY v_score DESC, v1.b""".stripMargin) { (s, dir) =>
      val ratings = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "part")),
          col("p_partkey") === col("l_partkey"))
      graft.ext.Clustering.alsRankOne(ratings, "o_custkey", "p_brand",
        round(col("l_extendedprice") * 100).cast("long"))
    },

    // ——— join-size pre-flight: the EXACT equi-join output
    //     cardinality Σ n_a(k)·n_b(k) from the two key dictionaries
    //     — never running the join — plus the hottest key pair and
    //     the amplification factor vs the larger input. The "will
    //     this join explode" companion to q236's skew audit. ———
    Q("q242_join_explosion",
      """WITH j1 AS (
        |  SELECT 'orders*lineitem@orderkey' AS join_label,
        |    sz.n_left, sz.n_right, t.n_keys_matched, t.out_rows,
        |    CAST(CAST(round(t.out_rows * 1e6 /
        |      greatest(sz.n_left, sz.n_right)) AS BIGINT) AS DOUBLE) / 1e6
        |      AS amplification,
        |    t.top_key, t.top_key_rows
        |  FROM (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys_matched,
        |      CAST(SUM(p) AS BIGINT) AS out_rows,
        |      MAX(CASE WHEN rk = 1 THEN k END) AS top_key,
        |      CAST(MAX(CASE WHEN rk = 1 THEN p END) AS BIGINT)
        |        AS top_key_rows
        |    FROM (
        |      SELECT k, p, row_number() OVER (ORDER BY p DESC, k DESC) AS rk
        |      FROM (
        |        SELECT a.k, a.na * b.nb AS p
        |        FROM (SELECT CAST(o_orderkey AS VARCHAR) k, COUNT(*) na
        |              FROM orders GROUP BY 1) a
        |        JOIN (SELECT CAST(l_orderkey AS VARCHAR) k, COUNT(*) nb
        |              FROM lineitem GROUP BY 1) b ON a.k = b.k))) t,
        |    (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) n_left,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) n_right) sz
        |), j2 AS (
        |  SELECT 'part*lineitem@partkey' AS join_label,
        |    sz.n_left, sz.n_right, t.n_keys_matched, t.out_rows,
        |    CAST(CAST(round(t.out_rows * 1e6 /
        |      greatest(sz.n_left, sz.n_right)) AS BIGINT) AS DOUBLE) / 1e6,
        |    t.top_key, t.top_key_rows
        |  FROM (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys_matched,
        |      CAST(SUM(p) AS BIGINT) AS out_rows,
        |      MAX(CASE WHEN rk = 1 THEN k END) AS top_key,
        |      CAST(MAX(CASE WHEN rk = 1 THEN p END) AS BIGINT)
        |        AS top_key_rows
        |    FROM (
        |      SELECT k, p, row_number() OVER (ORDER BY p DESC, k DESC) AS rk
        |      FROM (
        |        SELECT a.k, a.na * b.nb AS p
        |        FROM (SELECT CAST(p_partkey AS VARCHAR) k, COUNT(*) na
        |              FROM part GROUP BY 1) a
        |        JOIN (SELECT CAST(l_partkey AS VARCHAR) k, COUNT(*) nb
        |              FROM lineitem GROUP BY 1) b ON a.k = b.k))) t,
        |    (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM part) n_left,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) n_right) sz
        |), j3 AS (
        |  SELECT 'customer*orders@custkey' AS join_label,
        |    sz.n_left, sz.n_right, t.n_keys_matched, t.out_rows,
        |    CAST(CAST(round(t.out_rows * 1e6 /
        |      greatest(sz.n_left, sz.n_right)) AS BIGINT) AS DOUBLE) / 1e6,
        |    t.top_key, t.top_key_rows
        |  FROM (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys_matched,
        |      CAST(SUM(p) AS BIGINT) AS out_rows,
        |      MAX(CASE WHEN rk = 1 THEN k END) AS top_key,
        |      CAST(MAX(CASE WHEN rk = 1 THEN p END) AS BIGINT)
        |        AS top_key_rows
        |    FROM (
        |      SELECT k, p, row_number() OVER (ORDER BY p DESC, k DESC) AS rk
        |      FROM (
        |        SELECT a.k, a.na * b.nb AS p
        |        FROM (SELECT CAST(c_custkey AS VARCHAR) k, COUNT(*) na
        |              FROM customer GROUP BY 1) a
        |        JOIN (SELECT CAST(o_custkey AS VARCHAR) k, COUNT(*) nb
        |              FROM orders GROUP BY 1) b ON a.k = b.k))) t,
        |    (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) n_left,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) n_right) sz
        |)
        |SELECT * FROM j1 UNION ALL SELECT * FROM j2
        |UNION ALL SELECT * FROM j3
        |ORDER BY join_label""".stripMargin) { (s, dir) =>
      Seq(
        graft.ext.Profile.joinSizeAudit(t(s, dir, "orders"), "o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey", "orders*lineitem@orderkey"),
        graft.ext.Profile.joinSizeAudit(t(s, dir, "part"), "p_partkey",
          t(s, dir, "lineitem"), "l_partkey", "part*lineitem@partkey"),
        graft.ext.Profile.joinSizeAudit(t(s, dir, "customer"), "c_custkey",
          t(s, dir, "orders"), "o_custkey", "customer*orders@custkey"))
        .reduce(_ unionByName _).orderBy("join_label")
    },

    // ——— additive seasonal decomposition per event type: trend =
    //     centered 7-observed-day MA (edges drop), seasonal =
    //     day-of-week mean of the detrended series with dow as the
    //     pure-integer (epoch_day + 4) % 7, residual = the exact
    //     BIGINT leftover — "weekends are slow" separated from
    //     "something broke on the 14th". ———
    Q("q243_seasonal_decompose",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), tr AS (
        |  SELECT grp, day, y,
        |    COUNT(*) OVER w AS wn,
        |    CAST(round(CAST(SUM(y) OVER w AS DOUBLE) * 1e6 / 7)
        |      AS BIGINT) AS t_u
        |  FROM daily
        |  WINDOW w AS (PARTITION BY grp ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), d AS (
        |  SELECT grp, day, y, t_u, y * 1000000 - t_u AS d_u,
        |    CAST((day + 4) % 7 AS BIGINT) AS dow
        |  FROM tr WHERE wn = 7
        |), s AS (
        |  SELECT grp, dow,
        |    CAST(round(CAST(SUM(d_u) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |      AS s_u
        |  FROM d GROUP BY 1, 2
        |)
        |SELECT d.grp, d.day, d.dow, d.y,
        |  CAST(d.t_u AS DOUBLE) / 1e6 AS trend,
        |  CAST(s.s_u AS DOUBLE) / 1e6 AS seasonal,
        |  CAST(d.d_u - s.s_u AS DOUBLE) / 1e6 AS residual
        |FROM d JOIN s ON d.grp = s.grp AND d.dow = s.dow
        |ORDER BY d.grp, d.day""".stripMargin) { (s, dir) =>
      graft.ext.Profile.seasonalDecompose(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— modularity of the brand partition over the co-purchase
    //     graph (Newman–Girvan Q): per community, exact within-edge
    //     and degree-sum BIGINTs and the 1e9-quantized contribution
    //     dq; Σ dq = Q — "are brand communities better than
    //     chance?", the scoring half q215's label prop lacks. ———
    Q("q244_modularity",
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS g, CAST(l_partkey AS VARCHAR) AS item
        |  FROM lineitem
        |), und AS (
        |  SELECT DISTINCT a.item AS u, b.item AS v
        |  FROM it a JOIN it b USING (g) WHERE a.item < b.item
        |), lab AS (
        |  SELECT CAST(p_partkey AS VARCHAR) AS node, p_brand AS lab FROM part
        |), tagged AS (
        |  SELECT COALESCE(lu.lab, e.u) AS cu, COALESCE(lv.lab, e.v) AS cv
        |  FROM und e LEFT JOIN lab lu ON e.u = lu.node
        |             LEFT JOIN lab lv ON e.v = lv.node
        |), m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM tagged),
        |degc AS (
        |  SELECT community, CAST(COUNT(*) AS BIGINT) AS degree_sum FROM (
        |    SELECT cu AS community FROM tagged
        |    UNION ALL SELECT cv FROM tagged) GROUP BY 1
        |), wth AS (
        |  SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS within_edges
        |  FROM tagged WHERE cu = cv GROUP BY 1
        |), nodes AS (
        |  SELECT COALESCE(l.lab, n.node) AS community,
        |    CAST(COUNT(*) AS BIGINT) AS n_nodes
        |  FROM (SELECT u AS node FROM und UNION SELECT v FROM und) n
        |  LEFT JOIN lab l ON n.node = l.node GROUP BY 1
        |)
        |SELECT d.community, COALESCE(nodes.n_nodes, 0) AS n_nodes,
        |  COALESCE(wth.within_edges, 0) AS within_edges, d.degree_sum,
        |  CAST(CAST(round(CAST(COALESCE(wth.within_edges, 0) AS DOUBLE)
        |        * 1e9 / m.m) AS BIGINT)
        |    - CAST(round(CAST(d.degree_sum AS DOUBLE) * d.degree_sum * 1e9
        |        / (4.0 * m.m * m.m)) AS BIGINT) AS DOUBLE) / 1e9 AS dq
        |FROM degc d LEFT JOIN wth USING (community)
        |  LEFT JOIN nodes USING (community), m
        |ORDER BY community""".stripMargin) { (s, dir) =>
      val edges = graft.ext.Graph.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      val labels = t(s, dir, "part")
        .select(col("p_partkey").as("node"), col("p_brand").as("label"))
      graft.ext.Graph.modularity(edges, labels)
    },

    // ——— autocorrelation of the daily event-count series at lags
    //     1..7 per event type: pairs aligned on ACTUAL day numbers,
    //     Pearson r from six exact BIGINT sufficient statistics —
    //     "does Monday predict next Monday" with no gap-filling. ———
    Q("q245_acf",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), l AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lg),
        |pairs AS (
        |  SELECT d.grp, l.lg, d.y AS x, p.y AS yl
        |  FROM daily d CROSS JOIN l
        |  JOIN daily p ON p.grp = d.grp AND p.day = d.day - l.lg
        |), a AS (
        |  SELECT grp, lg, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yl) AS BIGINT) AS sy,
        |    CAST(SUM(x * yl) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(yl * yl) AS BIGINT) AS syy
        |  FROM pairs GROUP BY 1, 2
        |)
        |SELECT grp, lg AS "lag", n_pairs,
        |  CASE WHEN n_pairs * sxx = sx * sx OR n_pairs * syy = sy * sy
        |    THEN NULL
        |    ELSE round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
        |           CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
        |  END AS acf
        |FROM a ORDER BY grp, "lag"""".stripMargin) { (s, dir) =>
      graft.ext.Profile.acfDaily(t(s, dir, "events"), "event_type", "ts")
    },

    // ——— mutual information between categorical dimensions (plus
    //     marginal entropies and sqrt-NMI): segment×nation and
    //     status×priority — "which dimension explains which", the
    //     quantified companion to q136's chi² verdict. ———
    Q("q246_mutual_info",
      """WITH src1 AS (
        |  SELECT CAST(c_mktsegment AS VARCHAR) AS x,
        |    CAST(n_name AS VARCHAR) AS y
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |), c1 AS (
        |  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM src1 GROUP BY 1, 2
        |), mx1 AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM c1 GROUP BY 1),
        |my1 AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM c1 GROUP BY 1),
        |n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c1),
        |j1 AS (
        |  SELECT MAX(n1.n) AS n,
        |    CAST(SUM(CAST(round(CAST(c AS DOUBLE) / n1.n *
        |      ln(CAST(c AS DOUBLE) * n1.n / (CAST(cx AS DOUBLE) * cy))
        |      * 1e9) AS BIGINT)) AS BIGINT) AS mi_u
        |  FROM c1 JOIN mx1 USING (x) JOIN my1 USING (y) CROSS JOIN n1
        |), hx1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_x,
        |    CAST(SUM(CAST(round(CAST(cx AS DOUBLE) / n1.n * -1.0 *
        |      ln(CAST(cx AS DOUBLE) / n1.n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS hx_u
        |  FROM mx1 CROSS JOIN n1
        |), hy1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_y,
        |    CAST(SUM(CAST(round(CAST(cy AS DOUBLE) / n1.n * -1.0 *
        |      ln(CAST(cy AS DOUBLE) / n1.n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS hy_u
        |  FROM my1 CROSS JOIN n1
        |), r1 AS (
        |  SELECT 'mktsegment*nation' AS pair, n, n_x, n_y,
        |    CAST(mi_u AS DOUBLE) / 1e9 AS mi,
        |    CAST(hx_u AS DOUBLE) / 1e9 AS h_x,
        |    CAST(hy_u AS DOUBLE) / 1e9 AS h_y,
        |    CASE WHEN hx_u <= 0 OR hy_u <= 0 THEN NULL
        |      ELSE round(CAST(mi_u AS DOUBLE) /
        |        sqrt(CAST(hx_u AS DOUBLE) * CAST(hy_u AS DOUBLE)), 6)
        |    END AS nmi
        |  FROM j1 CROSS JOIN hx1 CROSS JOIN hy1
        |), src2 AS (
        |  SELECT CAST(o_orderstatus AS VARCHAR) AS x,
        |    CAST(o_orderpriority AS VARCHAR) AS y FROM orders
        |), c2 AS (
        |  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM src2 GROUP BY 1, 2
        |), mx2 AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM c2 GROUP BY 1),
        |my2 AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM c2 GROUP BY 1),
        |n2 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c2),
        |j2 AS (
        |  SELECT MAX(n2.n) AS n,
        |    CAST(SUM(CAST(round(CAST(c AS DOUBLE) / n2.n *
        |      ln(CAST(c AS DOUBLE) * n2.n / (CAST(cx AS DOUBLE) * cy))
        |      * 1e9) AS BIGINT)) AS BIGINT) AS mi_u
        |  FROM c2 JOIN mx2 USING (x) JOIN my2 USING (y) CROSS JOIN n2
        |), hx2 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_x,
        |    CAST(SUM(CAST(round(CAST(cx AS DOUBLE) / n2.n * -1.0 *
        |      ln(CAST(cx AS DOUBLE) / n2.n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS hx_u
        |  FROM mx2 CROSS JOIN n2
        |), hy2 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_y,
        |    CAST(SUM(CAST(round(CAST(cy AS DOUBLE) / n2.n * -1.0 *
        |      ln(CAST(cy AS DOUBLE) / n2.n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS hy_u
        |  FROM my2 CROSS JOIN n2
        |), r2 AS (
        |  SELECT 'status*priority' AS pair, n, n_x, n_y,
        |    CAST(mi_u AS DOUBLE) / 1e9 AS mi,
        |    CAST(hx_u AS DOUBLE) / 1e9 AS h_x,
        |    CAST(hy_u AS DOUBLE) / 1e9 AS h_y,
        |    CASE WHEN hx_u <= 0 OR hy_u <= 0 THEN NULL
        |      ELSE round(CAST(mi_u AS DOUBLE) /
        |        sqrt(CAST(hx_u AS DOUBLE) * CAST(hy_u AS DOUBLE)), 6)
        |    END AS nmi
        |  FROM j2 CROSS JOIN hx2 CROSS JOIN hy2
        |)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |ORDER BY pair""".stripMargin) { (s, dir) =>
      val cn = t(s, dir, "customer").join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      graft.ext.Profile.mutualInformation(cn,
          col("c_mktsegment"), col("n_name"), "mktsegment*nation")
        .unionByName(graft.ext.Profile.mutualInformation(t(s, dir, "orders"),
          col("o_orderstatus"), col("o_orderpriority"), "status*priority"))
        .orderBy("pair")
    },

    // ——— storage-encoding advisor over orders: exact NDV, null
    //     fraction, byte totals, dictionary-size estimate and the
    //     bucket-local run structure under the key order → pick
    //     RLE / DICTIONARY / PLAIN per column, the writer's row-group
    //     decision made inspectable. ———
    Q("q247_encoding_audit", {
      val cols = Seq("o_custkey", "o_orderdate", "o_orderpriority",
        "o_orderstatus")
      val per = cols.map { c =>
        s"""sel_$c AS (
           |  SELECT o_orderkey AS k, o_orderkey // 1024 AS bkt,
           |    CAST($c AS VARCHAR) AS v FROM orders
           |), r_$c AS (
           |  SELECT v, CASE WHEN row_number() OVER w <> 1
           |      AND v IS NOT DISTINCT FROM lag(v) OVER w THEN 0 ELSE 1
           |    END AS chg
           |  FROM sel_$c WINDOW w AS (PARTITION BY bkt ORDER BY k)
           |), p_$c AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_nulls,
           |    CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
           |    CAST(COALESCE(SUM(strlen(v)), 0) AS BIGINT)
           |      AS raw_bytes,
           |    CAST(SUM(chg) AS BIGINT) AS n_runs
           |  FROM r_$c
           |), d_$c AS (
           |  SELECT CAST(COALESCE(SUM(strlen(v)), 0) AS BIGINT)
           |    AS distinct_bytes
           |  FROM (SELECT DISTINCT v FROM sel_$c WHERE v IS NOT NULL)
           |)""".stripMargin
      }.mkString(",\n")
      val rows = cols.map { c =>
        s"""SELECT '$c' AS column_name, n_rows, n_nulls, ndv, raw_bytes,
           |  distinct_bytes + 4 * n_rows AS dict_bytes, n_runs,
           |  round(CAST(n_rows AS DOUBLE) / n_runs, 6) AS avg_run_len,
           |  CASE WHEN n_rows >= 2 * n_runs THEN 'rle'
           |    WHEN ndv * 10 <= n_rows THEN 'dictionary'
           |    ELSE 'plain' END AS recommended
           |FROM p_$c CROSS JOIN d_$c""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $per\n$rows\nORDER BY column_name"
    }) { (s, dir) =>
      graft.ext.Profile.encodingAudit(t(s, dir, "orders"), "o_orderkey",
        Seq("o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus"))
    },

    // ——— per-user half-life decay engagement score: an event w
    //     whole weeks before the corpus max day weighs 2^−w — each
    //     contribution an exact BIGINT shift (no pow(), no float
    //     accumulation), top-100 users by recency-weighted value. ———
    Q("q248_decay_score",
      """WITH e AS (
        |  SELECT CAST(user_id AS VARCHAR) AS entity,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), r AS (SELECT CAST(MAX(day) AS BIGINT) AS ref_day FROM e),
        |c AS (
        |  SELECT entity, day, cents,
        |    least((r.ref_day - day) // 7, 20) AS w
        |  FROM e, r
        |), s AS (
        |  SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(MAX(day) AS BIGINT) AS last_day,
        |    CAST(SUM(cents * (CAST(1 AS BIGINT) <<
        |      CAST(20 - w AS INTEGER))) AS BIGINT) AS score_u
        |  FROM c GROUP BY 1
        |)
        |SELECT entity, n_events, last_day,
        |  round(CAST(score_u AS DOUBLE) / 104857600.0, 6) AS score
        |FROM s ORDER BY score DESC, entity LIMIT 100""".stripMargin) {
      (s, dir) =>
      graft.ext.Profile.decayScores(t(s, dir, "events"), "user_id", "ts",
        round(col("value") * 100))
    },

    // ——— two-step Markov transitions P² over q156's per-user chain:
    //     each P(i,k)·P(k,j) product term 1e9-quantized from exact
    //     BIGINT counts, summed exactly — "where will this user be
    //     two events from now", squared on the |types|² dictionary. ———
    Q("q249_markov_2step",
      """WITH p0 AS (
        |  SELECT lag(event_type, 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS i,
        |    event_type AS j
        |  FROM events
        |), c AS (
        |  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p0 WHERE i IS NOT NULL GROUP BY 1, 2
        |), rt AS (SELECT i, CAST(SUM(n) AS BIGINT) AS row_n FROM c GROUP BY 1),
        |p AS (SELECT c.i, c.j, c.n, rt.row_n FROM c JOIN rt USING (i)),
        |sq AS (
        |  SELECT a.i, b.j, CAST(COUNT(*) AS BIGINT) AS n_paths,
        |    CAST(SUM(CAST(round((CAST(a.n AS DOUBLE) / a.row_n) *
        |      (CAST(b.n AS DOUBLE) / b.row_n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS p2_u
        |  FROM p a JOIN p b ON a.j = b.i GROUP BY 1, 2
        |)
        |SELECT i AS prev_type, j AS next2_type, n_paths,
        |  CAST(p2_u AS DOUBLE) / 1e9 AS p2
        |FROM sq ORDER BY prev_type, next2_type""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.transitionMatrix2(t(s, dir, "events"))
    },

    // ——— information gain / gain ratio of candidate features for
    //     predicting order status: the decision-stump feature-
    //     selection score, every entropy term 1e9-quantized from
    //     exact counts — q136's chi² asks "dependent?", this asks
    //     "how many bits does the feature buy?". ———
    Q("q250_info_gain",
      """WITH src AS (
        |  SELECT o_orderstatus AS l, o_orderpriority AS f1,
        |    c_mktsegment AS f2
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), lab AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS cl FROM src GROUP BY 1),
        |n AS (SELECT CAST(SUM(cl) AS BIGINT) AS n FROM lab),
        |hl AS (
        |  SELECT MAX(n.n) AS n,
        |    CAST(SUM(CAST(round(CAST(cl AS DOUBLE) / n.n * -1.0 *
        |      ln(CAST(cl AS DOUBLE) / n.n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS hl_u
        |  FROM lab CROSS JOIN n
        |), cells1 AS (
        |  SELECT f1 AS v, l, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM src GROUP BY 1, 2
        |), mv1 AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM cells1 GROUP BY 1),
        |cond1 AS (
        |  SELECT CAST(SUM(CAST(round(CAST(c AS DOUBLE) / n.n * -1.0 *
        |    ln(CAST(c AS DOUBLE) / cv) * 1e9) AS BIGINT)) AS BIGINT) AS hc_u
        |  FROM cells1 JOIN mv1 USING (v) CROSS JOIN n
        |), hf1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
        |    CAST(SUM(CAST(round(CAST(cv AS DOUBLE) / n.n * -1.0 *
        |      ln(CAST(cv AS DOUBLE) / n.n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS hf_u
        |  FROM mv1 CROSS JOIN n
        |), r1 AS (
        |  SELECT 'o_orderpriority' AS feature, hl.n, hf1.n_values,
        |    CAST(hl.hl_u AS DOUBLE) / 1e9 AS h_label,
        |    CAST(cond1.hc_u AS DOUBLE) / 1e9 AS h_cond,
        |    CAST(hl.hl_u - cond1.hc_u AS DOUBLE) / 1e9 AS info_gain,
        |    CASE WHEN hf1.hf_u <= 0 THEN NULL
        |      ELSE round(CAST(hl.hl_u - cond1.hc_u AS DOUBLE) /
        |        CAST(hf1.hf_u AS DOUBLE), 6) END AS gain_ratio
        |  FROM cond1 CROSS JOIN hf1 CROSS JOIN hl
        |), cells2 AS (
        |  SELECT f2 AS v, l, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM src GROUP BY 1, 2
        |), mv2 AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM cells2 GROUP BY 1),
        |cond2 AS (
        |  SELECT CAST(SUM(CAST(round(CAST(c AS DOUBLE) / n.n * -1.0 *
        |    ln(CAST(c AS DOUBLE) / cv) * 1e9) AS BIGINT)) AS BIGINT) AS hc_u
        |  FROM cells2 JOIN mv2 USING (v) CROSS JOIN n
        |), hf2 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
        |    CAST(SUM(CAST(round(CAST(cv AS DOUBLE) / n.n * -1.0 *
        |      ln(CAST(cv AS DOUBLE) / n.n) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS hf_u
        |  FROM mv2 CROSS JOIN n
        |), r2 AS (
        |  SELECT 'c_mktsegment' AS feature, hl.n, hf2.n_values,
        |    CAST(hl.hl_u AS DOUBLE) / 1e9 AS h_label,
        |    CAST(cond2.hc_u AS DOUBLE) / 1e9 AS h_cond,
        |    CAST(hl.hl_u - cond2.hc_u AS DOUBLE) / 1e9 AS info_gain,
        |    CASE WHEN hf2.hf_u <= 0 THEN NULL
        |      ELSE round(CAST(hl.hl_u - cond2.hc_u AS DOUBLE) /
        |        CAST(hf2.hf_u AS DOUBLE), 6) END AS gain_ratio
        |  FROM cond2 CROSS JOIN hf2 CROSS JOIN hl
        |)
        |SELECT * FROM r2 UNION ALL SELECT * FROM r1
        |ORDER BY feature""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "orders").join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      graft.ext.Profile.infoGain(src, col("o_orderstatus"),
        Seq("o_orderpriority" -> col("o_orderpriority"),
            "c_mktsegment" -> col("c_mktsegment")))
    },

    // ——— SAX symbolization + motif mining of the daily series per
    //     event type (Lin/Keogh 2003): z rounded to 6 BEFORE the
    //     quartile-breakpoint compare (no ulp can flip a symbol),
    //     top-3 3-symbol motifs — "what shape does a week have". ———
    Q("q251_sax_motifs",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(y) AS BIGINT) AS sx, CAST(SUM(y * y) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1
        |), z AS (
        |  SELECT d.grp, d.day,
        |    CASE WHEN st.nd * st.sxx = st.sx * st.sx THEN 0.0
        |      ELSE round(
        |        (CAST(d.y AS DOUBLE) - CAST(st.sx AS DOUBLE) / st.nd) /
        |        (sqrt(CAST(st.nd * st.sxx - st.sx * st.sx AS DOUBLE)) /
        |          CAST(st.nd AS DOUBLE)), 6)
        |    END AS zz
        |  FROM daily d JOIN st USING (grp)
        |), sym AS (
        |  SELECT grp, day,
        |    CASE WHEN zz < -0.6745 THEN 'a' WHEN zz < 0.0 THEN 'b'
        |      WHEN zz < 0.6745 THEN 'c' ELSE 'd' END AS s
        |  FROM z
        |), g AS (
        |  SELECT grp, s || lead(s, 1) OVER w || lead(s, 2) OVER w AS motif,
        |    lead(s, 2) OVER w AS s3
        |  FROM sym WINDOW w AS (PARTITION BY grp ORDER BY day)
        |), c AS (
        |  SELECT grp, motif, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |  FROM g WHERE s3 IS NOT NULL GROUP BY 1, 2
        |), r AS (
        |  SELECT grp, motif, n_occurrences, row_number() OVER (
        |    PARTITION BY grp ORDER BY n_occurrences DESC, motif) AS rk
        |  FROM c
        |)
        |SELECT grp, CAST(rk AS BIGINT) AS rk, motif, n_occurrences
        |FROM r WHERE rk <= 3 ORDER BY grp, rk""".stripMargin) { (s, dir) =>
      graft.ext.Profile.saxMotifs(t(s, dir, "events"), "event_type", "ts")
    },

    // ——— seasonal-naive forecast backtest: hold out the last 7
    //     observed days per event type, forecast each as the same-dow
    //     training mean (micro-exact), report per-day |error| — the
    //     baseline every anomaly alert must beat. ———
    Q("q252_forecast_backtest",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), d2 AS (
        |  SELECT grp, day, CAST((day + 4) % 7 AS BIGINT) AS dow, y FROM daily
        |), cut AS (
        |  SELECT grp, CAST(MAX(day) - 7 AS BIGINT) AS cut FROM d2 GROUP BY 1
        |), tr AS (
        |  SELECT d.grp, d.dow,
        |    CAST(round(CAST(SUM(d.y) AS DOUBLE) * 1e6 / COUNT(*)) AS BIGINT)
        |      AS f_u
        |  FROM d2 d JOIN cut USING (grp) WHERE d.day <= cut.cut
        |  GROUP BY 1, 2
        |)
        |SELECT d.grp, d.day, d.dow, d.y,
        |  CAST(tr.f_u AS DOUBLE) / 1e6 AS forecast,
        |  CAST(abs(d.y * 1000000 - tr.f_u) AS DOUBLE) / 1e6 AS abs_err
        |FROM d2 d JOIN cut USING (grp)
        |  LEFT JOIN tr ON tr.grp = d.grp AND tr.dow = d.dow
        |WHERE d.day > cut.cut
        |ORDER BY d.grp, d.day""".stripMargin) { (s, dir) =>
      graft.ext.Profile.seasonalNaiveBacktest(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— weekly churn / retention: distinct actives per epoch-week,
    //     carried-over vs lapsed against the previous week via one
    //     co-partitioned self-join — exact BIGINT counts, NULL rates
    //     where there is no predecessor week. ———
    Q("q253_churn_rates",
      """WITH uw AS (
        |  SELECT DISTINCT CAST(user_id AS VARCHAR) AS u,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
        |      AS week
        |  FROM events
        |), act AS (
        |  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM uw GROUP BY 1
        |), ret AS (
        |  SELECT a.week + 1 AS week, CAST(COUNT(*) AS BIGINT) AS n_retained
        |  FROM uw a JOIN uw b ON b.u = a.u AND b.week = a.week + 1
        |  GROUP BY 1
        |), prev AS (
        |  SELECT week + 1 AS week, n_active AS n_prev FROM act
        |)
        |SELECT act.week, act.n_active, prev.n_prev,
        |  CASE WHEN prev.n_prev IS NOT NULL
        |    THEN COALESCE(ret.n_retained, 0) END AS n_retained,
        |  CASE WHEN prev.n_prev IS NOT NULL
        |    THEN prev.n_prev - COALESCE(ret.n_retained, 0) END AS n_churned,
        |  CASE WHEN prev.n_prev IS NOT NULL THEN
        |    round(CAST(prev.n_prev - COALESCE(ret.n_retained, 0) AS DOUBLE)
        |      / prev.n_prev, 6) END AS churn_rate,
        |  CASE WHEN prev.n_prev IS NOT NULL THEN
        |    round(CAST(COALESCE(ret.n_retained, 0) AS DOUBLE)
        |      / prev.n_prev, 6) END AS retention_rate
        |FROM act LEFT JOIN prev USING (week) LEFT JOIN ret USING (week)
        |ORDER BY week""".stripMargin) { (s, dir) =>
      graft.ext.Profile.weeklyChurn(t(s, dir, "events"), "user_id", "ts")
    },

    // ——— one-way ANOVA: η² + F for "does the grouping explain the
    //     money column" — group sums exact BIGINT, squared sums via
    //     DECIMAL(38,0)/HUGEINT, per-group variance fractions
    //     1e12-quantized before the cross-group sum. ———
    Q("q254_anova",
      """WITH b1 AS (
        |  SELECT CAST(o_orderpriority AS VARCHAR) AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
        |), g1 AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(v) AS BIGINT) AS sg FROM b1 GROUP BY 1
        |), t1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
        |    SUM(CAST(v AS HUGEINT) * v) AS q FROM b1
        |), d1 AS (
        |  SELECT g1.ng, t1.n,
        |    CAST(CAST(t1.n AS HUGEINT) * t1.q -
        |      CAST(t1.s AS HUGEINT) * t1.s AS DOUBLE) AS sst_raw,
        |    CAST(CAST(g1.sg AS HUGEINT) * t1.n -
        |      CAST(t1.s AS HUGEINT) * g1.ng AS DOUBLE) AS dev
        |  FROM g1 CROSS JOIN t1
        |), a1 AS (
        |  SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS k,
        |    MAX(sst_raw) AS sst_raw,
        |    CAST(SUM(CASE WHEN sst_raw > 0 THEN
        |      CAST(round(dev * dev / (CAST(ng AS DOUBLE) *
        |        CAST(n AS DOUBLE) * sst_raw) * 1e12) AS BIGINT)
        |      END) AS BIGINT) AS eta_u
        |  FROM d1
        |), r1 AS (
        |  SELECT 'priority~totalprice' AS analysis, n, k,
        |    CASE WHEN sst_raw > 0
        |      THEN round(CAST(eta_u AS DOUBLE) / 1e12, 6) END AS eta2,
        |    CASE WHEN sst_raw > 0 AND k > 1 AND eta_u < 1000000000000
        |        AND n > k THEN
        |      round((CAST(eta_u AS DOUBLE) / 1e12 / CAST(k - 1 AS DOUBLE)) /
        |        ((1.0 - CAST(eta_u AS DOUBLE) / 1e12) /
        |          CAST(n - k AS DOUBLE)), 6) END AS f_stat
        |  FROM a1
        |), b2 AS (
        |  SELECT CAST(c_mktsegment AS VARCHAR) AS g,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer
        |), g2 AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(v) AS BIGINT) AS sg FROM b2 GROUP BY 1
        |), t2 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
        |    SUM(CAST(v AS HUGEINT) * v) AS q FROM b2
        |), d2 AS (
        |  SELECT g2.ng, t2.n,
        |    CAST(CAST(t2.n AS HUGEINT) * t2.q -
        |      CAST(t2.s AS HUGEINT) * t2.s AS DOUBLE) AS sst_raw,
        |    CAST(CAST(g2.sg AS HUGEINT) * t2.n -
        |      CAST(t2.s AS HUGEINT) * g2.ng AS DOUBLE) AS dev
        |  FROM g2 CROSS JOIN t2
        |), a2 AS (
        |  SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS k,
        |    MAX(sst_raw) AS sst_raw,
        |    CAST(SUM(CASE WHEN sst_raw > 0 THEN
        |      CAST(round(dev * dev / (CAST(ng AS DOUBLE) *
        |        CAST(n AS DOUBLE) * sst_raw) * 1e12) AS BIGINT)
        |      END) AS BIGINT) AS eta_u
        |  FROM d2
        |), r2 AS (
        |  SELECT 'segment~acctbal' AS analysis, n, k,
        |    CASE WHEN sst_raw > 0
        |      THEN round(CAST(eta_u AS DOUBLE) / 1e12, 6) END AS eta2,
        |    CASE WHEN sst_raw > 0 AND k > 1 AND eta_u < 1000000000000
        |        AND n > k THEN
        |      round((CAST(eta_u AS DOUBLE) / 1e12 / CAST(k - 1 AS DOUBLE)) /
        |        ((1.0 - CAST(eta_u AS DOUBLE) / 1e12) /
        |          CAST(n - k AS DOUBLE)), 6) END AS f_stat
        |  FROM a2
        |)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |ORDER BY analysis""".stripMargin) { (s, dir) =>
      graft.ext.Profile.anovaOneWay(t(s, dir, "orders"),
          col("o_orderpriority"), round(col("o_totalprice") * 100),
          "priority~totalprice")
        .unionByName(graft.ext.Profile.anovaOneWay(t(s, dir, "customer"),
          col("c_mktsegment"), round(col("c_acctbal") * 100),
          "segment~acctbal"))
        .orderBy("analysis")
    },

    // ——— before/after Poisson rate shift per event type: split the
    //     day span at its integer midpoint, exact counts per half,
    //     rate ratio + Wald z — "did this stream speed up or die". ———
    Q("q255_rate_shift",
      """WITH d AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM events
        |), sp AS (
        |  SELECT CAST(MIN(day) AS BIGINT) AS mind,
        |    CAST(MAX(day) AS BIGINT) AS maxd,
        |    CAST((MIN(day) + MAX(day)) // 2 AS BIGINT) AS mid
        |  FROM d
        |), h AS (
        |  SELECT grp, CAST(MAX(sp.mid - sp.mind + 1) AS BIGINT) AS t1,
        |    CAST(MAX(sp.maxd - sp.mid) AS BIGINT) AS t2,
        |    CAST(SUM(CASE WHEN day <= sp.mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN day > sp.mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2
        |  FROM d CROSS JOIN sp GROUP BY 1
        |)
        |SELECT grp, t1 AS days_pre, t2 AS days_post, n1 AS n_pre,
        |  n2 AS n_post,
        |  round(CAST(n1 AS DOUBLE) / t1, 6) AS rate_pre,
        |  round(CAST(n2 AS DOUBLE) / t2, 6) AS rate_post,
        |  CASE WHEN n1 > 0 THEN round((CAST(n2 AS DOUBLE) / t2) /
        |    (CAST(n1 AS DOUBLE) / t1), 6) END AS rate_ratio,
        |  CASE WHEN n1 + n2 > 0 THEN round(
        |    (CAST(n2 AS DOUBLE) / t2 - CAST(n1 AS DOUBLE) / t1) /
        |    sqrt(CAST(n1 AS DOUBLE) / t1 / t1 +
        |      CAST(n2 AS DOUBLE) / t2 / t2), 6) END AS z
        |FROM h ORDER BY grp""".stripMargin) { (s, dir) =>
      graft.ext.Profile.rateShift(t(s, dir, "events"), "event_type", "ts")
    },

    // ——— Hill tail-index estimator over the top-500 order totals:
    //     TakeOrdered cut, 1e9-quantized log terms, α̂ = k/Σln —
    //     the tail-risk companion to Zipf/Benford/Lorenz. ———
    Q("q256_hill_tail",
      """WITH top AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
        |    o_orderkey AS kk
        |  FROM orders ORDER BY c DESC, kk LIMIT 501
        |), xt AS (
        |  SELECT CAST(MIN(c) AS BIGINT) AS x_tail,
        |    CAST(COUNT(*) AS BIGINT) AS n_top FROM top
        |), su AS (
        |  SELECT CAST(SUM(CAST(round(ln(CAST(c AS DOUBLE) / xt.x_tail)
        |    * 1e9) AS BIGINT)) AS BIGINT) AS sum_u
        |  FROM top CROSS JOIN xt
        |)
        |SELECT 'o_totalprice' AS measure,
        |  CAST(xt.n_top - 1 AS BIGINT) AS k,
        |  xt.n_top, xt.x_tail,
        |  CASE WHEN su.sum_u > 0 THEN
        |    round(CAST(xt.n_top - 1 AS DOUBLE) /
        |      (CAST(su.sum_u AS DOUBLE) / 1e9), 6) END AS alpha
        |FROM xt CROSS JOIN su""".stripMargin) { (s, dir) =>
      graft.ext.Profile.hillTail(t(s, dir, "orders"),
        round(col("o_totalprice") * 100), col("o_orderkey"), 500,
        "o_totalprice")
    },

    // ——— Flesch reading-ease / FK grade per source with a
    //     vowel-group syllable proxy: three regex counts per doc
    //     (identical char-class patterns both engines), per-doc
    //     1e6-quantized scores, per-source integer means. ———
    Q("q257_readability",
      """WITH c AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS sent,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syl
        |  FROM documents
        |), t AS (
        |  SELECT source, w, syl,
        |    CAST(round((206.835 - 1.015 * (CAST(w AS DOUBLE) / sent) -
        |      84.6 * (CAST(syl AS DOUBLE) / greatest(w, 1))) * 1e6)
        |      AS BIGINT) AS fre_u,
        |    CAST(round((0.39 * (CAST(w AS DOUBLE) / sent) +
        |      11.8 * (CAST(syl AS DOUBLE) / greatest(w, 1)) - 15.59) * 1e6)
        |      AS BIGINT) AS fk_u
        |  FROM c
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS n_words,
        |  CAST(SUM(syl) AS BIGINT) AS n_syllables,
        |  CAST(CAST(round(CAST(SUM(fre_u) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |    AS DOUBLE) / 1e6 AS avg_fre,
        |  CAST(CAST(round(CAST(SUM(fk_u) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |    AS DOUBLE) / 1e6 AS avg_fk_grade
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Profile.readability(t(s, dir, "documents"))
    },

    // ——— zone-map skip audit over lineitem's 1024-key buckets: how
    //     many simulated row groups a min/max zone map skips per
    //     range predicate, plus the rows-scanned-if-sorted
    //     counterfactual — the quantified case for q85's Z-order. ———
    Q("q258_zonemap_skip", {
      val preds = Seq(
        ("l_extprice<2000", "CAST(round(l_extendedprice * 100) AS BIGINT)",
          "-9223372036854775807", "199999"),
        ("l_orderkey=1024", "l_orderkey", "1024", "1024"),
        ("l_quantity>=45", "CAST(l_quantity AS BIGINT)", "45",
          "9223372036854775807"))
      val ctes = preds.zipWithIndex.map { case ((_, vexpr, lo, hi), i) =>
        s"""z$i AS (
           |  SELECT b, CAST(MIN(v) AS BIGINT) AS zmin,
           |    CAST(MAX(v) AS BIGINT) AS zmax,
           |    CAST(COUNT(*) AS BIGINT) AS rows_,
           |    CAST(SUM(CASE WHEN v >= $lo AND v <= $hi THEN 1 ELSE 0 END)
           |      AS BIGINT) AS m
           |  FROM (SELECT l_orderkey // 1024 AS b, $vexpr AS v
           |        FROM lineitem) GROUP BY 1
           |), a$i AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           |    CAST(SUM(CASE WHEN zmax < $lo OR zmin > $hi THEN 1 ELSE 0
           |      END) AS BIGINT) AS n_skippable,
           |    CAST(SUM(CASE WHEN zmax < $lo OR zmin > $hi THEN 0
           |      ELSE rows_ END) AS BIGINT) AS rows_scanned,
           |    CAST(SUM(m) AS BIGINT) AS rows_matching
           |  FROM z$i
           |)""".stripMargin
      }.mkString(",\n")
      val rows = preds.zipWithIndex.map { case ((name, _, _, _), i) =>
        s"""SELECT '$name' AS predicate, n_buckets, n_skippable,
           |  round(CAST(n_skippable AS DOUBLE) / n_buckets, 6) AS skip_frac,
           |  rows_scanned, rows_matching,
           |  ((rows_matching + 1023) // 1024) * 1024
           |    AS est_sorted_scan_rows
           |FROM a$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $ctes\n$rows\nORDER BY predicate"
    }) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      graft.ext.Profile.zonemapSkipAudit(li, "l_orderkey", Seq(
        ("l_extprice<2000", round(col("l_extendedprice") * 100),
          -9223372036854775807L, 199999L),
        ("l_orderkey=1024", col("l_orderkey"), 1024L, 1024L),
        ("l_quantity>=45", col("l_quantity"), 45L, 9223372036854775807L)))
    },

    // ——— point-in-time feature extraction (the feature-store
    //     backfill join): per purchase anchor, the same user's
    //     event-type counts in the strict 24h window BEFORE it —
    //     leakage-safe by construction, label in exact cents. ———
    Q("q259_pit_features",
      """WITH a AS (
        |  SELECT event_id AS anchor_id, user_id, epoch_us(ts) AS a_us,
        |    CAST(round(value * 100) AS BIGINT) AS label_cents
        |  FROM events WHERE event_type = 'purchase'
        |), h AS (
        |  SELECT user_id, epoch_us(ts) AS h_us, event_type AS h_type
        |  FROM events
        |)
        |SELECT a.anchor_id, a.user_id, a.label_cents,
        |  CAST(SUM(CASE WHEN h.h_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN h.h_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error,
        |  CAST(SUM(CASE WHEN h.h_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN h.h_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN h.h_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view
        |FROM a LEFT JOIN h ON h.user_id = a.user_id
        |  AND h.h_us >= a.a_us - 86400000000 AND h.h_us < a.a_us
        |GROUP BY 1, 2, 3
        |ORDER BY anchor_id""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.pitFeatures(t(s, dir, "events"))
    },

    // ——— Davies–Bouldin cluster-separation audit over the labeled
    //     embeddings: per label the intra-cluster scatter and the
    //     worst (sᵢ+sⱼ)/dᵢⱼ neighbor ratio, every distance built
    //     from quantized BIGINT sums — "which labels bleed". ———
    Q("q260_davies_bouldin",
      """WITH e AS (
        |  SELECT CAST(label AS VARCHAR) AS lab, vec_id AS vid,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), cent AS (
        |  SELECT lab, i, SUM(x) / COUNT(*) AS m FROM e GROUP BY 1, 2
        |), d2 AS (
        |  SELECT e.lab, e.vid,
        |    CAST(SUM(CAST(round((e.x - c.m) * (e.x - c.m) * 1e12)
        |      AS BIGINT)) AS BIGINT) AS d2_u
        |  FROM e JOIN cent c ON e.lab = c.lab AND e.i = c.i GROUP BY 1, 2
        |), v AS (
        |  SELECT lab, CAST(round(sqrt(CAST(d2_u AS DOUBLE) / 1e12) * 1e9)
        |    AS BIGINT) AS v_u FROM d2
        |), sc AS (
        |  SELECT lab, CAST(COUNT(*) AS BIGINT) AS n_members,
        |    CAST(round(CAST(SUM(v_u) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |      AS s_u
        |  FROM v GROUP BY 1
        |), dd AS (
        |  SELECT a.lab AS la, b.lab AS lb,
        |    CAST(round(sqrt(CAST(SUM(CAST(round((a.m - b.m) * (a.m - b.m)
        |      * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) * 1e9) AS BIGINT)
        |      AS d_u
        |  FROM cent a JOIN cent b ON a.i = b.i AND a.lab <> b.lab
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT dd.la, dd.lb,
        |    CAST(round(CAST(sa.s_u + sb.s_u AS DOUBLE) / dd.d_u * 1e6)
        |      AS BIGINT) AS r_u
        |  FROM dd JOIN sc sa ON dd.la = sa.lab JOIN sc sb ON dd.lb = sb.lab
        |  WHERE dd.d_u > 0
        |), w AS (
        |  SELECT la, r_u, lb FROM (
        |    SELECT la, lb, r_u, row_number() OVER (
        |      PARTITION BY la ORDER BY r_u DESC, lb DESC) AS rk FROM r)
        |  WHERE rk = 1
        |)
        |SELECT sc.lab AS label, sc.n_members,
        |  CAST(sc.s_u AS DOUBLE) / 1e9 AS scatter,
        |  w.lb AS worst_label, CAST(w.r_u AS DOUBLE) / 1e6 AS r_max
        |FROM sc LEFT JOIN w ON sc.lab = w.la
        |ORDER BY label""".stripMargin) { (s, dir) =>
      graft.ext.Similarity.daviesBouldin(t(s, dir, "embeddings"))
    },

    // ——— Calinski–Harabasz variance-ratio index over the labeled
    //     embeddings — the BETWEEN/WITHIN companion verdict to q260's
    //     Davies–Bouldin (CH up + DB down = well-separated labels);
    //     exact per-dim means, 1e12-quantized squares in
    //     HUGEINT/DECIMAL sums, one rounded division. ———
    Q("q297_calinski_harabasz",
      """WITH e AS (
        |  SELECT CAST(label AS VARCHAR) AS lab, vec_id AS vid,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), cent AS (
        |  SELECT lab, i, SUM(x) / COUNT(*) AS m,
        |    CAST(COUNT(*) AS BIGINT) AS nm
        |  FROM e GROUP BY 1, 2
        |), gm AS (
        |  SELECT i, SUM(x) / COUNT(*) AS g FROM e GROUP BY 1
        |), ws AS (
        |  SELECT COALESCE(SUM(CAST(CAST(round((e.x - c.m) * (e.x - c.m)
        |    * 1e12) AS BIGINT) AS HUGEINT)), 0) AS w_u
        |  FROM e JOIN cent c ON e.lab = c.lab AND e.i = c.i
        |), bs AS (
        |  SELECT COALESCE(SUM(CAST(c.nm AS HUGEINT) *
        |    CAST(CAST(round((c.m - g.g) * (c.m - g.g) * 1e12) AS BIGINT)
        |      AS HUGEINT)), 0) AS b_u
        |  FROM cent c JOIN gm g ON c.i = g.i
        |), counts AS (
        |  SELECT CAST(COUNT(DISTINCT vid) AS BIGINT) AS n_points,
        |    CAST(COUNT(DISTINCT lab) AS BIGINT) AS n_clusters
        |  FROM e
        |)
        |SELECT n_points, n_clusters,
        |  round(CAST(b_u AS DOUBLE) / 1e12, 6) AS between_ss,
        |  round(CAST(w_u AS DOUBLE) / 1e12, 6) AS within_ss,
        |  CASE WHEN n_clusters >= 2 AND n_points > n_clusters
        |      AND CAST(w_u AS DOUBLE) > 0 THEN
        |    round(CAST(b_u * CAST(n_points - n_clusters AS HUGEINT) AS DOUBLE)
        |      / CAST(w_u * CAST(n_clusters - 1 AS HUGEINT) AS DOUBLE), 6)
        |  END AS ch_index
        |FROM counts CROSS JOIN ws CROSS JOIN bs""".stripMargin) { (s, dir) =>
      graft.ext.Similarity.calinskiHarabasz(t(s, dir, "embeddings"))
    },

    // ——— Laplace-mechanism noisy counts with the battery's
    //     deterministic md5 coin as the uniform draw: calibrated
    //     1/ε noise via the inverse CDF, replayable under the
    //     oracle (a knowable seed is NOT DP — stated in the doc). ———
    Q("q261_dp_counts",
      """WITH c AS (
        |  SELECT CAST(event_type AS VARCHAR) AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_true
        |  FROM events GROUP BY 1
        |), n AS (
        |  SELECT k, n_true,
        |    CAST(round(-1.0 * sign(u - 0.5) *
        |      ln(1.0 - 2.0 * abs(u - 0.5)) * 1e6) AS BIGINT) AS noise_u
        |  FROM (
        |    SELECT k, n_true,
        |      CAST(CAST(concat('0x', substring(md5(k || ':dp1'), 1, 15))
        |        AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
        |    FROM c)
        |)
        |SELECT k AS key, n_true, 1.0 AS epsilon,
        |  CAST(noise_u AS DOUBLE) / 1e6 AS noise,
        |  CAST(n_true * 1000000 + noise_u AS DOUBLE) / 1e6 AS n_noisy
        |FROM n ORDER BY key""".stripMargin) { (s, dir) =>
      graft.ext.Privacy.dpCounts(t(s, dir, "events"), col("event_type"))
    },

    // ——— inclusion-dependency / FK-candidate discovery across the
    //     star schema (+ one planted negative): containment and
    //     coverage from key dictionaries only — the referential half
    //     of q233's FD audit. ———
    Q("q262_fk_discovery", {
      val pairs = Seq(
        ("customer.c_nationkey->nation.n_nationkey",
          "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
          "lineitem", "l_partkey", "part", "p_partkey"),
        ("orders.o_custkey->customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"),
        ("part.p_size->nation.n_nationkey",
          "part", "p_size", "nation", "n_nationkey"))
      pairs.map { case (label, ct, cc, pt, pc) =>
        s"""SELECT '$label' AS candidate, cd.ndv_child, pd.ndv_parent,
           |  m.n_matched,
           |  CASE WHEN cd.ndv_child > 0 THEN
           |    round(CAST(m.n_matched AS DOUBLE) / cd.ndv_child, 6)
           |  END AS containment,
           |  CASE WHEN pd.ndv_parent > 0 THEN
           |    round(CAST(m.n_matched AS DOUBLE) / pd.ndv_parent, 6)
           |  END AS coverage,
           |  cd.ndv_child > 0 AND m.n_matched = cd.ndv_child
           |    AS is_fk_candidate
           |FROM (SELECT CAST(COUNT(DISTINCT $cc) AS BIGINT) AS ndv_child
           |      FROM $ct WHERE $cc IS NOT NULL) cd,
           |  (SELECT CAST(COUNT(DISTINCT $pc) AS BIGINT) AS ndv_parent
           |   FROM $pt WHERE $pc IS NOT NULL) pd,
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_matched FROM
           |    (SELECT DISTINCT CAST($cc AS VARCHAR) AS k FROM $ct
           |     WHERE $cc IS NOT NULL) ck
           |   WHERE ck.k IN (SELECT CAST($pc AS VARCHAR) FROM $pt
           |     WHERE $pc IS NOT NULL)) m""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY candidate"
    }) { (s, dir) =>
      graft.ext.Profile.fkDiscovery(Seq(
        ("customer.c_nationkey->nation.n_nationkey",
          t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        ("orders.o_custkey->customer.c_custkey",
          t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        ("part.p_size->nation.n_nationkey",
          t(s, dir, "part"), "p_size",
          t(s, dir, "nation"), "n_nationkey")))
    },

    // ——— linear interpolation of calendar gaps in the daily series
    //     per event type: full calendar explode, two IGNORE NULLS
    //     window passes for the neighbors, micro-exact fill;
    //     edges stay NULL (q219 forward-fill extrapolates). ———
    Q("q263_interpolate",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), cal AS (
        |  SELECT grp, CAST(unnest(range(mind, maxd + 1)) AS BIGINT) AS day
        |  FROM (SELECT grp, MIN(day) AS mind, MAX(day) AS maxd
        |        FROM daily GROUP BY 1)
        |), j AS (
        |  SELECT c.grp, c.day, d.y
        |  FROM cal c LEFT JOIN daily d ON d.grp = c.grp AND d.day = c.day
        |), f AS (
        |  SELECT grp, day, y,
        |    last_value(y IGNORE NULLS) OVER wp AS yp,
        |    last_value(CASE WHEN y IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wp AS dp,
        |    first_value(y IGNORE NULLS) OVER wn AS yn,
        |    first_value(CASE WHEN y IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wn AS dn
        |  FROM j
        |  WINDOW wp AS (PARTITION BY grp ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY grp ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT grp, day, y IS NOT NULL AS observed,
        |  CAST(CASE WHEN y IS NOT NULL THEN y * 1000000
        |    WHEN yp IS NOT NULL AND yn IS NOT NULL THEN
        |      CAST(round((CAST(yp AS DOUBLE) + CAST(yn - yp AS DOUBLE) *
        |        (CAST(day - dp AS DOUBLE) / (dn - dp))) * 1e6) AS BIGINT)
        |  END AS DOUBLE) / 1e6 AS y_filled
        |FROM f ORDER BY grp, day""".stripMargin) { (s, dir) =>
      graft.ext.Profile.interpolateDaily(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— cross-correlation between event types' daily series at
    //     lags 0..3: "do clicks lead purchases" — q245's acf across
    //     series, exact BIGINT sufficient statistics per pair. ———
    Q("q264_cross_correlation",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), l AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS lg),
        |a AS (
        |  SELECT d.grp AS ga, l.lg, d.y AS x, d.day - l.lg AS prev_day
        |  FROM daily d CROSS JOIN l
        |), p AS (
        |  SELECT a.ga, b.grp AS gb, a.lg, a.x, b.y AS yl
        |  FROM a JOIN daily b ON b.day = a.prev_day
        |  WHERE b.grp <> a.ga
        |), agg AS (
        |  SELECT ga, gb, lg, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yl) AS BIGINT) AS sy,
        |    CAST(SUM(x * yl) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(yl * yl) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2, 3
        |)
        |SELECT ga, gb, lg AS "lag", n_pairs,
        |  CASE WHEN n_pairs * sxx = sx * sx OR n_pairs * syy = sy * sy
        |    THEN NULL
        |    ELSE round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
        |           CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
        |  END AS xcorr
        |FROM agg ORDER BY ga, gb, "lag"""".stripMargin) { (s, dir) =>
      graft.ext.Profile.crossCorrelation(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— cohort LTV curves: users keyed by first-activity epoch
    //     week, per-cell exact cents, cumulative revenue window on
    //     the cohort×week dictionary — the money view of q147. ———
    Q("q265_cohort_ltv",
      """WITH b AS (
        |  SELECT user_id AS u,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
        |      AS week,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), f AS (
        |  SELECT u, CAST(MIN(week) AS BIGINT) AS cohort_week
        |  FROM b GROUP BY 1
        |), sz AS (
        |  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        |  FROM f GROUP BY 1
        |), cells AS (
        |  SELECT f.cohort_week, b.week - f.cohort_week AS weeks_since,
        |    CAST(COUNT(DISTINCT b.u) AS BIGINT) AS active_users,
        |    CAST(SUM(b.cents) AS BIGINT) AS rev_cents
        |  FROM b JOIN f ON b.u = f.u GROUP BY 1, 2
        |), cum AS (
        |  SELECT cohort_week, weeks_since, active_users, rev_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week
        |      ORDER BY weeks_since
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM cells
        |)
        |SELECT c.cohort_week, c.weeks_since, sz.cohort_size,
        |  c.active_users, c.rev_cents, c.cum_cents,
        |  round(CAST(c.cum_cents AS DOUBLE) / sz.cohort_size / 100.0, 6)
        |    AS ltv_per_user
        |FROM cum c JOIN sz USING (cohort_week)
        |ORDER BY cohort_week, weeks_since""".stripMargin) { (s, dir) =>
      graft.ext.Streaming.cohortLtv(t(s, dir, "events"))
    },

    // ——— Burrows' Delta stylometry between sources: top-40 corpus
    //     words, per-word z-scores across sources (1e6-quantized
    //     relative frequencies), pairwise mean |z-diff| — who writes
    //     like whom. ———
    Q("q266_burrows_delta",
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(lower(text), '\s+'))
        |    AS w
        |  FROM documents
        |), counts AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2
        |), tot AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY 1
        |), topw AS (
        |  SELECT w FROM (
        |    SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM counts GROUP BY 1)
        |  ORDER BY cw DESC, w LIMIT 40
        |), f AS (
        |  SELECT t.source, tw.w,
        |    CAST(round(CAST(COALESCE(c.c, 0) AS DOUBLE) / t.n * 1e6)
        |      AS BIGINT) AS f_u
        |  FROM tot t CROSS JOIN topw tw
        |  LEFT JOIN counts c ON c.source = t.source AND c.w = tw.w
        |), st AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ns,
        |    CAST(SUM(f_u) AS BIGINT) AS sf,
        |    CAST(SUM(f_u * f_u) AS BIGINT) AS sff
        |  FROM f GROUP BY 1
        |), z AS (
        |  SELECT f.source, f.w,
        |    CASE WHEN st.ns * st.sff = st.sf * st.sf THEN 0
        |      ELSE CAST(round(
        |        (CAST(f.f_u AS DOUBLE) - CAST(st.sf AS DOUBLE) / st.ns) /
        |        (sqrt(CAST(st.ns * st.sff - st.sf * st.sf AS DOUBLE)) /
        |          CAST(st.ns AS DOUBLE)) * 1e6) AS BIGINT)
        |    END AS z_u
        |  FROM f JOIN st USING (w)
        |)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(CAST(round(CAST(SUM(abs(a.z_u - b.z_u)) AS DOUBLE) /
        |    COUNT(*)) AS BIGINT) AS DOUBLE) / 1e6 AS delta
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.ext.TextStats.burrowsDelta(t(s, dir, "documents"))
    },

    // ——— Poisson overdispersion audit per event type: variance/mean
    //     dispersion and the chi-square index from exact sums,
    //     integer-threshold verdict — is the burstiness just noise. ———
    Q("q267_overdispersion",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), a AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(y) AS BIGINT) AS sx, CAST(SUM(y * y) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1
        |), d AS (
        |  SELECT *, CASE WHEN nd > 1 AND sx > 0 THEN
        |    CAST(round(CAST(nd * sxx - sx * sx AS DOUBLE) /
        |      CAST((nd - 1) * sx AS DOUBLE) * 1e6) AS BIGINT) END AS disp_u
        |  FROM a
        |)
        |SELECT grp, nd AS n_days,
        |  round(CAST(sx AS DOUBLE) / nd, 6) AS mean_per_day,
        |  CASE WHEN nd > 1 THEN round(CAST(nd * sxx - sx * sx AS DOUBLE) /
        |    CAST(nd * (nd - 1) AS DOUBLE), 6) END AS variance,
        |  CAST(disp_u AS DOUBLE) / 1e6 AS dispersion,
        |  CASE WHEN nd > 1 THEN round(CAST(nd * sxx - sx * sx AS DOUBLE)
        |    / sx, 6) END AS chi2_index,
        |  CASE WHEN disp_u IS NULL THEN NULL
        |    WHEN disp_u > 1200000 THEN 'overdispersed'
        |    WHEN disp_u < 800000 THEN 'underdispersed'
        |    ELSE 'poisson-like' END AS verdict
        |FROM d ORDER BY grp""".stripMargin) { (s, dir) =>
      graft.ext.Profile.overdispersion(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— Simpson's-paradox check: pooled vs per-brand OLS slope of
    //     line price (cents) on quantity, quantized-sign opposition
    //     flag — the aggregation-reversal warning. ———
    Q("q268_simpson_check",
      """WITH b AS (
        |  SELECT p.p_brand AS grp, CAST(l.l_quantity AS BIGINT) AS x,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |), st AS (
        |  SELECT grp AS stratum, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM b GROUP BY 1
        |  UNION ALL
        |  SELECT '__pooled__', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(x) AS BIGINT), CAST(SUM(y) AS BIGINT),
        |    CAST(SUM(x * y) AS BIGINT), CAST(SUM(x * x) AS BIGINT)
        |  FROM b
        |), sl AS (
        |  SELECT stratum, n, CASE WHEN n * sxx <> sx * sx THEN
        |    CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |      (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) *
        |        CAST(sx AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) END
        |      AS slope_micro
        |  FROM st
        |), pm AS (
        |  SELECT slope_micro AS pooled_micro FROM sl
        |  WHERE stratum = '__pooled__'
        |)
        |SELECT sl.stratum, sl.n,
        |  CAST(sl.slope_micro AS DOUBLE) / 1e6 AS slope,
        |  CASE WHEN sl.slope_micro IS NOT NULL
        |      AND pm.pooled_micro IS NOT NULL
        |      AND sl.stratum <> '__pooled__'
        |    THEN sign(sl.slope_micro) * sign(pm.pooled_micro) < 0 END
        |    AS opposes_pooled
        |FROM sl, pm ORDER BY stratum""".stripMargin) { (s, dir) =>
      graft.ext.Profile.simpsonCheck(
        t(s, dir, "lineitem").join(broadcast(t(s, dir, "part")),
          col("p_partkey") === col("l_partkey")),
        "p_brand", col("l_quantity"), round(col("l_extendedprice") * 100))
    },

    // ——— JSONL source/sink round-trip: per-doc projection written
    //     as JSON lines, read back with an explicit schema, rolled
    //     up — the third interchange format (CSV q189, xlsx golden)
    //     under the oracle. ———
    Q("q269_jsonl_roundtrip",
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val proj = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val path = s"${graft.queries.Fixtures.dir}/jsonl_roundtrip"
      proj.write.mode(org.apache.spark.sql.SaveMode.Overwrite).json(path)
      s.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT").json(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("lang")
    },

    // ——— optimizer-stats quality audit: NDV / min-max uniform
    //     estimates vs true counts with the q-error — which columns
    //     need histograms instead of NDV. ———
    Q("q270_cardinality_est", {
      def eqSql(name: String, colName: String, v: String) =
        s"""SELECT '$name' AS predicate, n AS n_rows,
           |  CAST(round(CAST(n AS DOUBLE) / ndv) AS BIGINT) AS est_rows,
           |  actual_rows,
           |  CASE WHEN actual_rows > 0 THEN round(greatest(
           |    CAST(CAST(round(CAST(n AS DOUBLE) / ndv) AS BIGINT)
           |      AS DOUBLE) / actual_rows,
           |    CAST(actual_rows AS DOUBLE) /
           |      CAST(round(CAST(n AS DOUBLE) / ndv) AS BIGINT)), 6)
           |  END AS q_error
           |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(COUNT(DISTINCT CAST($colName AS VARCHAR)) AS BIGINT)
           |    AS ndv,
           |  CAST(SUM(CASE WHEN CAST($colName AS VARCHAR) = '$v'
           |    THEN 1 ELSE 0 END) AS BIGINT) AS actual_rows
           |  FROM orders)""".stripMargin
      def rgSql(name: String, vexpr: String, lo: Long, hi: Long) =
        s"""SELECT '$name' AS predicate, n AS n_rows,
           |  CAST(round(CAST(n AS DOUBLE) *
           |    CAST(greatest(least(mx, $hi) - greatest(mn, $lo) + 1, 0)
           |      AS DOUBLE) / CAST(mx - mn + 1 AS DOUBLE)) AS BIGINT)
           |    AS est_rows,
           |  actual_rows,
           |  CASE WHEN actual_rows > 0 THEN round(greatest(
           |    CAST(CAST(round(CAST(n AS DOUBLE) *
           |      CAST(greatest(least(mx, $hi) - greatest(mn, $lo) + 1, 0)
           |        AS DOUBLE) / CAST(mx - mn + 1 AS DOUBLE)) AS BIGINT)
           |      AS DOUBLE) / actual_rows,
           |    CAST(actual_rows AS DOUBLE) /
           |      CAST(round(CAST(n AS DOUBLE) *
           |        CAST(greatest(least(mx, $hi) - greatest(mn, $lo) + 1, 0)
           |          AS DOUBLE) / CAST(mx - mn + 1 AS DOUBLE)) AS BIGINT)),
           |    6) END AS q_error
           |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(MIN($vexpr) AS BIGINT) AS mn,
           |  CAST(MAX($vexpr) AS BIGINT) AS mx,
           |  CAST(SUM(CASE WHEN $vexpr >= $lo AND $vexpr <= $hi
           |    THEN 1 ELSE 0 END) AS BIGINT) AS actual_rows
           |  FROM orders)""".stripMargin
      Seq(eqSql("prio_urgent", "o_orderpriority", "1-URGENT"),
        rgSql("custkey_0_500", "CAST(o_custkey AS BIGINT)", 0L, 500L),
        eqSql("status_F", "o_orderstatus", "F"),
        rgSql("total_10k_50k",
          "CAST(round(o_totalprice * 100) AS BIGINT)",
          1000000L, 5000000L))
        .mkString("\nUNION ALL\n") + "\nORDER BY predicate"
    }) { (s, dir) =>
      graft.ext.Profile.cardinalityAudit(t(s, dir, "orders"), Seq(
        ("prio_urgent", col("o_orderpriority"), Left("1-URGENT")),
        ("custkey_0_500", col("o_custkey"), Right((0L, 500L))),
        ("status_F", col("o_orderstatus"), Left("F")),
        ("total_10k_50k", round(col("o_totalprice") * 100),
          Right((1000000L, 5000000L)))))
    },

    // ——— join-order advisor: exact intermediate cardinality of each
    //     star-join order from key dictionaries alone (q242's trick
    //     applied to plan choice) + the shared exact final size. ———
    Q("q271_join_order_advisor",
      """WITH fa AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS ka,
        |    CAST(COUNT(*) AS BIGINT) AS nf FROM lineitem GROUP BY 1
        |), fb AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS kb,
        |    CAST(COUNT(*) AS BIGINT) AS nf FROM lineitem GROUP BY 1
        |), da AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS ka,
        |    CAST(COUNT(*) AS BIGINT) AS na FROM orders GROUP BY 1
        |), db AS (
        |  SELECT CAST(p_partkey AS VARCHAR) AS kb,
        |    CAST(COUNT(*) AS BIGINT) AS nb FROM part GROUP BY 1
        |), ia AS (
        |  SELECT CAST(COALESCE(SUM(fa.nf * da.na), 0) AS BIGINT)
        |    AS intermediate FROM fa JOIN da USING (ka)
        |), ib AS (
        |  SELECT CAST(COALESCE(SUM(fb.nf * db.nb), 0) AS BIGINT)
        |    AS intermediate FROM fb JOIN db USING (kb)
        |), fin AS (
        |  SELECT CAST(COALESCE(SUM(f.nf * da.na * db.nb), 0) AS BIGINT)
        |    AS final_rows
        |  FROM (SELECT CAST(l_orderkey AS VARCHAR) AS ka,
        |      CAST(l_partkey AS VARCHAR) AS kb,
        |      CAST(COUNT(*) AS BIGINT) AS nf
        |    FROM lineitem GROUP BY 1, 2) f
        |  JOIN da USING (ka) JOIN db USING (kb)
        |), rows_ AS (
        |  SELECT 'orders*fact first' AS plan, intermediate FROM ia
        |  UNION ALL SELECT 'part*fact first', intermediate FROM ib
        |), best AS (
        |  SELECT plan AS best_plan FROM (
        |    SELECT plan, row_number() OVER (ORDER BY intermediate, plan)
        |      AS rk FROM rows_) WHERE rk = 1
        |)
        |SELECT r.plan, r.intermediate, fin.final_rows,
        |  r.plan = best.best_plan AS recommended
        |FROM rows_ r, fin, best ORDER BY plan""".stripMargin) { (s, dir) =>
      graft.ext.Profile.joinOrderAudit(t(s, dir, "lineitem"),
        "l_orderkey", t(s, dir, "orders"), "o_orderkey", "orders",
        "l_partkey", t(s, dir, "part"), "p_partkey", "part")
    },

    // ——— Mann–Whitney U rank-sum test (acctbal across two customer
    //     segments): average ranks carried as exact 2×rank integers
    //     over the value dictionary, tie-corrected z — the
    //     nonparametric shift test beside q132's KS. ———
    Q("q272_mann_whitney",
      """WITH base AS (
        |  SELECT CAST(c_mktsegment AS VARCHAR) AS g,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer
        |  WHERE CAST(c_mktsegment AS VARCHAR) IN ('AUTOMOBILE', 'BUILDING')
        |), dict AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM base GROUP BY 1
        |), rk AS (
        |  SELECT *, ca + cb AS cnt,
        |    CAST(SUM(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM dict
        |), a AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb,
        |    CAST(SUM(ca * (2 * cum - cnt + 1)) AS BIGINT) AS r2a,
        |    CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
        |  FROM rk
        |)
        |SELECT 'AUTOMOBILE' AS group_a, 'BUILDING' AS group_b,
        |  na AS n_a, nb AS n_b,
        |  (CAST(r2a AS DOUBLE) - CAST(na AS DOUBLE) * (na + 1)) / 2.0
        |    AS u_stat,
        |  CASE WHEN na > 0 AND nb > 0 AND ties <
        |      ((na + nb) * (na + nb) * (na + nb) - (na + nb)) THEN
        |    round(((CAST(r2a AS DOUBLE) - CAST(na AS DOUBLE) * (na + 1))
        |        / 2.0 - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) /
        |      sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
        |        ((CAST(na + nb AS DOUBLE) + 1.0) - CAST(ties AS DOUBLE) /
        |          (CAST(na + nb AS DOUBLE) *
        |            (CAST(na + nb AS DOUBLE) - 1.0)))), 6) END AS z
        |FROM a""".stripMargin) { (s, dir) =>
      graft.ext.Profile.mannWhitney(t(s, dir, "customer"),
        col("c_mktsegment"), round(col("c_acctbal") * 100),
        "AUTOMOBILE", "BUILDING")
    },

    // ——— partitioner-choice audit: hash (md5 bucket) vs range
    //     (dictionary-cumulative even split) fill of 32 output
    //     partitions for the user key — straggler factors per
    //     strategy, the pre-write distribution check. ———
    Q("q273_partitioner_choice",
      """WITH keys AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1
        |), hb AS (
        |  SELECT CAST(concat('0x', substring(md5(k), 1, 7)) AS BIGINT) % 32
        |    AS b, CAST(SUM(c) AS BIGINT) AS rows_
        |  FROM keys GROUP BY 1
        |), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM keys),
        |r AS (
        |  SELECT c, CAST(SUM(c) OVER (ORDER BY k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cumEnd
        |  FROM keys
        |), rb AS (
        |  SELECT CAST((cumEnd - 1) // ((tot.n + 31) // 32) AS BIGINT) AS b,
        |    CAST(SUM(c) AS BIGINT) AS rows_
        |  FROM r, tot GROUP BY 1
        |), s1 AS (
        |  SELECT 'hash' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |    CAST(MAX(rows_) AS BIGINT) AS max_rows,
        |    round(CAST(SUM(rows_) AS DOUBLE) / 32, 6) AS mean_rows,
        |    round(CAST(MAX(rows_) AS DOUBLE) /
        |      (CAST(SUM(rows_) AS DOUBLE) / 32), 6) AS straggler_factor
        |  FROM hb
        |), s2 AS (
        |  SELECT 'range' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |    CAST(MAX(rows_) AS BIGINT) AS max_rows,
        |    round(CAST(SUM(rows_) AS DOUBLE) / 32, 6) AS mean_rows,
        |    round(CAST(MAX(rows_) AS DOUBLE) /
        |      (CAST(SUM(rows_) AS DOUBLE) / 32), 6) AS straggler_factor
        |  FROM rb
        |)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |ORDER BY strategy""".stripMargin) { (s, dir) =>
      graft.ext.Profile.partitionerAudit(t(s, dir, "events"), "user_id")
    },

    // ——— Kruskal–Wallis H across all five customer segments:
    //     q272's rank machinery generalized to k samples, per-group
    //     terms 1e6-quantized, tie-corrected H. ———
    Q("q274_kruskal_wallis",
      """WITH cells AS (
        |  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS v,
        |    CAST(c_mktsegment AS VARCHAR) AS g,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM customer GROUP BY 1, 2
        |), dict AS (
        |  SELECT v, CAST(SUM(c) AS BIGINT) AS cnt FROM cells GROUP BY 1
        |), av AS (
        |  SELECT v, 2 * CAST(SUM(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - cnt + 1 AS avg2
        |  FROM dict
        |), pg AS (
        |  SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
        |    CAST(SUM(c * avg2) AS BIGINT) AS r2g
        |  FROM cells JOIN av USING (v) GROUP BY 1
        |), gl AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
        |  FROM dict
        |), tm AS (
        |  SELECT MAX(gl.n) AS n, CAST(COUNT(*) AS BIGINT) AS k,
        |    MAX(gl.ties) AS ties,
        |    CAST(SUM(CAST(round(3.0 * CAST(r2g AS DOUBLE) *
        |      CAST(r2g AS DOUBLE) /
        |      (CAST(gl.n AS DOUBLE) * CAST(gl.n + 1 AS DOUBLE) *
        |        CAST(ng AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS t_u
        |  FROM pg CROSS JOIN gl
        |)
        |SELECT 'acctbal~segment' AS measure, n, k, ties,
        |  CASE WHEN n > k THEN round(CAST(t_u AS DOUBLE) / 1e6 -
        |    3.0 * CAST(n + 1 AS DOUBLE), 6) END AS h,
        |  CASE WHEN n > k AND ties < n * n * n - n THEN
        |    round((CAST(t_u AS DOUBLE) / 1e6 -
        |      3.0 * CAST(n + 1 AS DOUBLE)) /
        |      (1.0 - CAST(ties AS DOUBLE) /
        |        CAST(n * n * n - n AS DOUBLE)), 6) END AS h_tie_corrected
        |FROM tm""".stripMargin) { (s, dir) =>
      graft.ext.Profile.kruskalWallis(t(s, dir, "customer"),
        col("c_mktsegment"), round(col("c_acctbal") * 100),
        "acctbal~segment")
    },

    // ——— Spearman ρ of quantity vs line price: each side's average
    //     ranks from its own value dictionary (2×rank BIGINTs),
    //     Pearson over exact rank integers with DECIMAL/HUGEINT
    //     cross-products — q206's τ at a fraction of the pair cost. ———
    Q("q275_spearman",
      """WITH b AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem
        |), dxx AS (
        |  SELECT x, 2 * CAST(SUM(cnt) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - cnt + 1 AS a2x
        |  FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM b
        |    GROUP BY 1)
        |), dyy AS (
        |  SELECT y, 2 * CAST(SUM(cnt) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - cnt + 1 AS a2y
        |  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM b
        |    GROUP BY 1)
        |), r AS (
        |  SELECT a2x, a2y FROM b JOIN dxx USING (x) JOIN dyy USING (y)
        |), a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a2x) AS BIGINT) AS sx, CAST(SUM(a2y) AS BIGINT) AS sy,
        |    SUM(CAST(a2x * a2y AS HUGEINT)) AS sxy,
        |    SUM(CAST(a2x * a2x AS HUGEINT)) AS sxx,
        |    SUM(CAST(a2y * a2y AS HUGEINT)) AS syy
        |  FROM r
        |)
        |SELECT 'quantity~extprice' AS pair, n,
        |  CASE WHEN CAST(CAST(n AS HUGEINT) * sxx -
        |      CAST(sx AS HUGEINT) * sx AS DOUBLE) > 0
        |    AND CAST(CAST(n AS HUGEINT) * syy -
        |      CAST(sy AS HUGEINT) * sy AS DOUBLE) > 0 THEN
        |    round(CAST(CAST(n AS HUGEINT) * sxy -
        |        CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |      sqrt(CAST(CAST(n AS HUGEINT) * sxx -
        |          CAST(sx AS HUGEINT) * sx AS DOUBLE) *
        |        CAST(CAST(n AS HUGEINT) * syy -
        |          CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6) END AS rho
        |FROM a""".stripMargin) { (s, dir) =>
      graft.ext.Profile.spearman(t(s, dir, "lineitem"),
        col("l_quantity"), round(col("l_extendedprice") * 100),
        "quantity~extprice")
    },

    // ——— effect sizes between two customer segments: Cohen's d
    //     (pooled variance via HUGEINT squared sums) and Cliff's
    //     delta EXACT from dictionary cumulative counts — magnitude,
    //     not just significance. ———
    Q("q276_effect_size",
      """WITH base AS (
        |  SELECT CAST(c_mktsegment AS VARCHAR) AS g,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer
        |  WHERE CAST(c_mktsegment AS VARCHAR) IN ('AUTOMOBILE', 'BUILDING')
        |), m AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS s, SUM(CAST(v AS HUGEINT) * v) AS q
        |  FROM base GROUP BY 1
        |), wide AS (
        |  SELECT a.n AS na, a.s AS sa, a.q AS qa,
        |    b.n AS nb, b.s AS sb, b.q AS qb
        |  FROM (SELECT * FROM m WHERE g = 'AUTOMOBILE') a,
        |       (SELECT * FROM m WHERE g = 'BUILDING') b
        |), dcum AS (
        |  SELECT v, ca, cb, CAST(SUM(cb) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cumB
        |  FROM (SELECT v,
        |      CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
        |        AS BIGINT) AS ca,
        |      CAST(SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
        |        AS BIGINT) AS cb
        |    FROM base GROUP BY 1)
        |), cl AS (
        |  SELECT CAST(COALESCE(SUM(ca * ((cumB - cb) -
        |    (wide.nb - cumB))), 0) AS BIGINT) AS cl
        |  FROM dcum, wide
        |)
        |SELECT 'AUTOMOBILE' AS group_a, 'BUILDING' AS group_b,
        |  na AS n_a, nb AS n_b,
        |  round(CAST(sa AS DOUBLE) / na, 6) AS mean_a,
        |  round(CAST(sb AS DOUBLE) / nb, 6) AS mean_b,
        |  CASE WHEN na > 1 AND nb > 1 AND
        |    sqrt((CAST(CAST(na AS HUGEINT) * qa -
        |        CAST(sa AS HUGEINT) * sa AS DOUBLE) / CAST(na AS DOUBLE) +
        |      CAST(CAST(nb AS HUGEINT) * qb -
        |        CAST(sb AS HUGEINT) * sb AS DOUBLE) / CAST(nb AS DOUBLE)) /
        |      CAST(na + nb - 2 AS DOUBLE)) > 0 THEN
        |    round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
        |      sqrt((CAST(CAST(na AS HUGEINT) * qa -
        |          CAST(sa AS HUGEINT) * sa AS DOUBLE) / CAST(na AS DOUBLE) +
        |        CAST(CAST(nb AS HUGEINT) * qb -
        |          CAST(sb AS HUGEINT) * sb AS DOUBLE) / CAST(nb AS DOUBLE)) /
        |        CAST(na + nb - 2 AS DOUBLE)), 6) END AS cohens_d,
        |  round(CAST(cl AS DOUBLE) / (CAST(na AS DOUBLE) * nb), 6)
        |    AS cliffs_delta
        |FROM wide, cl""".stripMargin) { (s, dir) =>
      graft.ext.Profile.effectSizes(t(s, dir, "customer"),
        col("c_mktsegment"), round(col("c_acctbal") * 100),
        "AUTOMOBILE", "BUILDING")
    },

    // ——— Benjamini–Hochberg FDR over q255's per-type rate-shift z:
    //     two-sided p via the Abramowitz–Stegun normal-tail
    //     polynomial on the already-rounded z, step-up adjustment —
    //     which rate shifts survive running five tests at once. ———
    Q("q277_bh_fdr",
      """WITH d AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM events
        |), sp AS (
        |  SELECT CAST(MIN(day) AS BIGINT) AS mind,
        |    CAST(MAX(day) AS BIGINT) AS maxd,
        |    CAST((MIN(day) + MAX(day)) // 2 AS BIGINT) AS mid
        |  FROM d
        |), h AS (
        |  SELECT grp, CAST(MAX(sp.mid - sp.mind + 1) AS BIGINT) AS t1,
        |    CAST(MAX(sp.maxd - sp.mid) AS BIGINT) AS t2,
        |    CAST(SUM(CASE WHEN day <= sp.mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN day > sp.mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2
        |  FROM d CROSS JOIN sp GROUP BY 1
        |), zz AS (
        |  SELECT grp AS key, CASE WHEN n1 + n2 > 0 THEN round(
        |    (CAST(n2 AS DOUBLE) / t2 - CAST(n1 AS DOUBLE) / t1) /
        |    sqrt(CAST(n1 AS DOUBLE) / t1 / t1 +
        |      CAST(n2 AS DOUBLE) / t2 / t2), 6) END AS z
        |  FROM h
        |), tt AS (
        |  SELECT key, z,
        |    1.0 / (1.0 + 0.2316419 * abs(z)) AS t,
        |    exp(abs(z) * abs(z) * -0.5) * 0.3989422804014327 AS pdf
        |  FROM zz WHERE z IS NOT NULL
        |), p AS (
        |  SELECT key, z, round(2.0 * (pdf * (t * (0.319381530 +
        |    t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 +
        |    t * 1.330274429)))))), 9) AS p_raw
        |  FROM tt
        |), q AS (
        |  SELECT key, z, p_raw,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS m,
        |    CAST(row_number() OVER (ORDER BY p_raw, key) AS BIGINT)
        |      AS rank
        |  FROM p
        |), adj AS (
        |  SELECT key, z, p_raw, rank,
        |    round(least(min(p_raw * m / rank) OVER (ORDER BY rank DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0), 9)
        |      AS p_adj
        |  FROM q
        |)
        |SELECT key, z, p_raw, rank, p_adj, p_adj <= 0.05 AS significant
        |FROM adj ORDER BY rank""".stripMargin) { (s, dir) =>
      val z = graft.ext.Profile.rateShift(t(s, dir, "events"),
        "event_type", "ts")
      graft.ext.Profile.bhAdjust(z, "grp", "z")
    },

    // ——— seasonality-aware anomaly days: q243's exact residuals
    //     scored against each type's own MAD×1.4826 scale — "broke
    //     on the 14th" after "weekends are slow" is subtracted. ———
    Q("q278_seasonal_anomalies",
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), tr AS (
        |  SELECT grp, day, y,
        |    COUNT(*) OVER w AS wn,
        |    CAST(round(CAST(SUM(y) OVER w AS DOUBLE) * 1e6 / 7)
        |      AS BIGINT) AS t_u
        |  FROM daily
        |  WINDOW w AS (PARTITION BY grp ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), d AS (
        |  SELECT grp, day, y, t_u, y * 1000000 - t_u AS d_u,
        |    CAST((day + 4) % 7 AS BIGINT) AS dow
        |  FROM tr WHERE wn = 7
        |), s AS (
        |  SELECT grp, dow,
        |    CAST(round(CAST(SUM(d_u) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |      AS s_u
        |  FROM d GROUP BY 1, 2
        |), sd AS (
        |  SELECT d.grp, d.day, d.y,
        |    CAST(d.d_u - s.s_u AS DOUBLE) / 1e6 AS residual,
        |    d.d_u - s.s_u AS res_u
        |  FROM d JOIN s ON d.grp = s.grp AND d.dow = s.dow
        |), md AS (
        |  SELECT grp, CAST(round(CAST(abs(res_u) AS DOUBLE) * 1.4826)
        |    AS BIGINT) AS sigma_u
        |  FROM (SELECT grp, res_u,
        |      row_number() OVER (PARTITION BY grp
        |        ORDER BY abs(res_u), day) AS rn,
        |      COUNT(*) OVER (PARTITION BY grp) AS n
        |    FROM sd)
        |  WHERE rn = (n + 1) // 2
        |)
        |SELECT sd.grp, sd.day, sd.y, sd.residual,
        |  CASE WHEN md.sigma_u > 0 THEN
        |    round(CAST(sd.res_u AS DOUBLE) / md.sigma_u, 6) END AS score,
        |  md.sigma_u > 0 AND CAST(abs(sd.res_u) AS DOUBLE) >
        |    3.0 * CAST(md.sigma_u AS DOUBLE) AS is_anomaly
        |FROM sd JOIN md USING (grp)
        |ORDER BY sd.grp, sd.day""".stripMargin) { (s, dir) =>
      graft.ext.Profile.seasonalAnomalies(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— one Louvain local-move pass over the brand partition of
    //     the co-purchase graph: exact ΔQ(i→c) per neighboring
    //     community from BIGINT degree/edge counts, top-20 improving
    //     moves — "these nodes are mislabeled", no iteration. ———
    Q("q279_louvain_move",
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS g, CAST(l_partkey AS VARCHAR) AS item
        |  FROM lineitem
        |), und AS (
        |  SELECT DISTINCT a.item AS u, b.item AS v
        |  FROM it a JOIN it b USING (g) WHERE a.item < b.item
        |), lab AS (
        |  SELECT CAST(p_partkey AS VARCHAR) AS node, p_brand AS lab FROM part
        |), und2 AS (
        |  SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v, u FROM und
        |), m AS (SELECT CAST(COUNT(*) / 2 AS BIGINT) AS m FROM und2),
        |deg AS (
        |  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM und2 GROUP BY 1
        |), comm AS (
        |  SELECT d.node, COALESCE(l.lab, d.node) AS c
        |  FROM deg d LEFT JOIN lab l ON d.node = l.node
        |), sigma AS (
        |  SELECT c.c, CAST(COUNT(*) AS BIGINT) AS sigma_tot
        |  FROM und2 e JOIN comm c ON e.src = c.node GROUP BY 1
        |), kic AS (
        |  SELECT e.src AS node, cd.c AS cn, CAST(COUNT(*) AS BIGINT) AS kic
        |  FROM und2 e JOIN comm cd ON e.dst = cd.node GROUP BY 1, 2
        |), kici AS (
        |  SELECT k.node, k.kic AS kici
        |  FROM kic k JOIN comm o ON k.node = o.node AND k.cn = o.c
        |), cand AS (
        |  SELECT k.node, o.c AS ci, k.cn, COALESCE(ki.kici, 0) AS kici,
        |    dg.k, k.kic, st.sigma_tot AS st_to, sf.sigma_tot AS st_from,
        |    m.m
        |  FROM kic k JOIN comm o ON k.node = o.node AND k.cn <> o.c
        |  LEFT JOIN kici ki ON ki.node = k.node
        |  JOIN deg dg ON dg.node = k.node
        |  JOIN sigma st ON st.c = k.cn
        |  JOIN sigma sf ON sf.c = o.c
        |  CROSS JOIN m
        |)
        |SELECT node, ci AS from_community, cn AS to_community, k, kic,
        |  CAST(CAST(round((CAST(kic - kici AS DOUBLE) / m -
        |    CAST(k AS DOUBLE) * CAST(st_to - st_from + k AS DOUBLE) /
        |    (2.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))) * 1e9)
        |    AS BIGINT) AS DOUBLE) / 1e9 AS dq
        |FROM cand
        |ORDER BY dq DESC, node, to_community LIMIT 20""".stripMargin) {
      (s, dir) =>
      val edges = graft.ext.Graph.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      val labels = t(s, dir, "part")
        .select(col("p_partkey").as("node"), col("p_brand").as("label"))
      graft.ext.Graph.louvainMoveGain(edges, labels)
    },

    // ——— embedding drift between the two vec_id-parity halves:
    //     per-dimension exact centroid means, pooled-std-standardized
    //     shift (1e12-quantized squares) — the distribution monitor
    //     q125's scalar PSI can't see. ———
    Q("q280_embedding_drift",
      """WITH e AS (
        |  SELECT (vec_id % 2 = 0) AS half_a,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), st AS (
        |  SELECT half_a, i, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
        |    CAST(SUM(CAST(round(x * x * 1e12) AS BIGINT)) AS BIGINT)
        |      AS sxx_u
        |  FROM e GROUP BY 1, 2
        |), a AS (
        |  SELECT i, n AS na, sx AS sxa, sxx_u AS qa_u FROM st WHERE half_a
        |), b AS (
        |  SELECT i, n AS nb, sx AS sxb, sxx_u AS qb_u FROM st
        |  WHERE NOT half_a
        |)
        |SELECT a.i, na, nb, round(sxa / na, 6) AS mean_a,
        |  round(sxb / nb, 6) AS mean_b,
        |  round(abs(sxa / na - sxb / nb), 6) AS abs_gap,
        |  CASE WHEN na > 1 AND nb > 1 AND
        |    sqrt(((CAST(qa_u AS DOUBLE) / 1e12 -
        |        sxa * sxa / CAST(na AS DOUBLE)) +
        |      (CAST(qb_u AS DOUBLE) / 1e12 -
        |        sxb * sxb / CAST(nb AS DOUBLE))) /
        |      CAST(na + nb - 2 AS DOUBLE)) > 0 THEN
        |    round((sxa / na - sxb / nb) /
        |      sqrt(((CAST(qa_u AS DOUBLE) / 1e12 -
        |          sxa * sxa / CAST(na AS DOUBLE)) +
        |        (CAST(qb_u AS DOUBLE) / 1e12 -
        |          sxb * sxb / CAST(nb AS DOUBLE))) /
        |        CAST(na + nb - 2 AS DOUBLE)), 6) END AS std_shift
        |FROM a JOIN b USING (i) ORDER BY i""".stripMargin) { (s, dir) =>
      graft.ext.Similarity.embeddingDrift(t(s, dir, "embeddings"))
    },

    // ——— mixed-language document detection: q38's marker classifier
    //     per 32-token chunk (q64's windows), plurality language and
    //     share per doc, integer-threshold mixed flag — the docs a
    //     whole-document classifier papers over. ———
    Q("q281_lang_purity", {
      val langs = graft.ext.TextStats.langMarkers.toSeq.sortBy(_._1)
      val scoreCols = langs.map { case (lang, ms) =>
        val terms = ms.map(m =>
          s"(CASE WHEN contains(lower(chunk_text), '${m.replace("'", "''")}') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"($terms) AS s_$lang"
      }.mkString(",\n          ")
      val names = langs.map { case (l, _) => s"s_$l" }
      val pick = langs.map { case (l, _) => s"WHEN s_$l THEN '$l'" }
        .mkString(" ")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts
         |  FROM documents
         |), starts AS (
         |  SELECT doc_id, ts, unnest(range(0, GREATEST(
         |    CAST(ceil(CAST(len(ts) AS DOUBLE) / 32) AS INT), 1)))
         |    AS chunk_id
         |  FROM toks
         |), chunks AS (
         |  SELECT doc_id,
         |    array_to_string(ts[chunk_id * 32 + 1 : chunk_id * 32 + 32],
         |      ' ') AS chunk_text
         |  FROM starts
         |), scored AS (
         |  SELECT doc_id,
         |          $scoreCols
         |  FROM chunks
         |), cls AS (
         |  SELECT doc_id,
         |    CASE greatest(${names.mkString(", ")}) $pick END AS cl
         |  FROM scored
         |), byl AS (
         |  SELECT doc_id, cl, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM cls GROUP BY 1, 2
         |), top AS (
         |  SELECT doc_id, c, cl FROM (
         |    SELECT doc_id, cl, c, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY c DESC, cl DESC) AS rk
         |    FROM byl) WHERE rk = 1
         |), agg AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chunks,
         |    CAST(COUNT(*) AS BIGINT) AS n_langs
         |  FROM byl GROUP BY 1
         |)
         |SELECT agg.doc_id, agg.n_chunks, agg.n_langs, top.cl AS top_lang,
         |  round(CAST(top.c AS DOUBLE) / agg.n_chunks, 6) AS top_share,
         |  agg.n_langs > 1 AND top.c * 10 < agg.n_chunks * 8 AS is_mixed
         |FROM agg JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      graft.ext.TextStats.langPurity(t(s, dir, "documents"))
    },

    // ——— outlier ensemble over order totals: z-score, MAD and Tukey
    //     IQR detectors voting, cutoffs from exact moments and
    //     nearest-rank dictionary quantiles — consensus beats any
    //     single assumption. ———
    Q("q282_outlier_votes",
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT)
        |    AS v
        |  FROM orders
        |), mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
        |    SUM(CAST(v AS HUGEINT) * v) AS q
        |  FROM base
        |), dict AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM base
        |  GROUP BY 1),
        |rk AS (
        |  SELECT v, CAST(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        |  FROM dict
        |), med AS (
        |  SELECT CAST(MIN(v) AS BIGINT) AS median FROM rk, mom
        |  WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |), qq1 AS (
        |  SELECT CAST(MIN(v) AS BIGINT) AS q1 FROM rk, mom
        |  WHERE cum >= CAST(ceil(0.25 * n) AS BIGINT)
        |), qq3 AS (
        |  SELECT CAST(MIN(v) AS BIGINT) AS q3 FROM rk, mom
        |  WHERE cum >= CAST(ceil(0.75 * n) AS BIGINT)
        |), dev AS (
        |  SELECT abs(d.v - med.median) AS d, CAST(SUM(d.c) AS BIGINT) AS c
        |  FROM dict d, med GROUP BY 1
        |), mad AS (
        |  SELECT CAST(MIN(d) AS BIGINT) AS mad FROM (
        |    SELECT d, CAST(SUM(c) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |    FROM dev), mom
        |  WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |), cuts AS (
        |  SELECT CAST(mom.s AS DOUBLE) / mom.n AS mean,
        |    sqrt(CAST(CAST(mom.n AS HUGEINT) * mom.q -
        |        CAST(mom.s AS HUGEINT) * mom.s AS DOUBLE) /
        |      CAST(CAST(mom.n AS HUGEINT) * mom.n AS DOUBLE)) AS std,
        |    med.median, mad.mad, qq1.q1, qq3.q3
        |  FROM mom, med, mad, qq1, qq3
        |), fl AS (
        |  SELECT b.k, b.v,
        |    cuts.std > 0 AND abs(CAST(b.v AS DOUBLE) - cuts.mean) >
        |      3.0 * cuts.std AS flag_z,
        |    cuts.mad > 0 AND CAST(abs(b.v - cuts.median) AS DOUBLE) >
        |      3.0 * 1.4826 * CAST(cuts.mad AS DOUBLE) AS flag_mad,
        |    CAST(b.v AS DOUBLE) < CAST(cuts.q1 AS DOUBLE) -
        |        1.5 * CAST(cuts.q3 - cuts.q1 AS DOUBLE) OR
        |      CAST(b.v AS DOUBLE) > CAST(cuts.q3 AS DOUBLE) +
        |        1.5 * CAST(cuts.q3 - cuts.q1 AS DOUBLE) AS flag_iqr
        |  FROM base b, cuts
        |)
        |SELECT k, v, flag_z, flag_mad, flag_iqr,
        |  CAST(CAST(flag_z AS INT) + CAST(flag_mad AS INT) +
        |    CAST(flag_iqr AS INT) AS BIGINT) AS votes
        |FROM fl ORDER BY votes DESC, v DESC, k LIMIT 50""".stripMargin) {
      (s, dir) =>
      graft.ext.Profile.outlierVotes(t(s, dir, "orders"),
        col("o_orderkey"), round(col("o_totalprice") * 100))
    },

    // ——— feed freshness/completeness per event type: staleness vs
    //     the corpus max day and trailing-7-day coverage with an
    //     integer-threshold verdict — "is this feed alive". ———
    Q("q283_freshness_audit",
      """WITH gd AS (
        |  SELECT DISTINCT event_type AS grp,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM events
        |), g AS (SELECT CAST(MAX(day) AS BIGINT) AS maxd FROM gd),
        |a AS (
        |  SELECT grp, MAX(g.maxd) AS maxd, CAST(MAX(day) AS BIGINT)
        |      AS last_day,
        |    CAST(SUM(CASE WHEN day > g.maxd - 7 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS days_present_7d
        |  FROM gd CROSS JOIN g GROUP BY 1
        |)
        |SELECT grp, last_day, maxd - last_day AS staleness_days,
        |  days_present_7d, 7 - days_present_7d AS days_missing_7d,
        |  CASE WHEN maxd - last_day >= 2 THEN 'stale'
        |    WHEN 7 - days_present_7d >= 2 THEN 'gappy'
        |    WHEN maxd = last_day AND days_present_7d = 7 THEN 'fresh'
        |    ELSE 'ok' END AS verdict
        |FROM a ORDER BY grp""".stripMargin) { (s, dir) =>
      graft.ext.Profile.freshnessAudit(t(s, dir, "events"),
        "event_type", "ts")
    },

    // ——— ORC source/sink round-trip under the oracle: per-doc
    //     projection written with Spark's native ORC writer, read
    //     back with an explicit schema, rolled up — the fourth
    //     interchange format (CSV q189, xlsx goldens, JSONL q269). ———
    Q("q284_orc_roundtrip",
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val proj = t(s, dir, "documents").select("doc_id", "source", "n_chars")
      val path = s"${graft.queries.Fixtures.dir}/orc_roundtrip"
      proj.write.mode(org.apache.spark.sql.SaveMode.Overwrite).orc(path)
      s.read.schema("doc_id BIGINT, source STRING, n_chars BIGINT").orc(path)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("source")
    },

    // ——— STREAMING feed freshness: Complete-mode max(ts) per event
    //     type through a real readStream → memory sink, hash-matched
    //     to the batch max — one timestamp of state per key, the
    //     cheapest possible streaming aggregate. ———
    Q("q285_streaming_freshness",
      """SELECT event_type,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val stream = graft.ext.Streaming.readEvents(s, s"$dir/events.parquet")
      val q = graft.ext.Streaming.runToMemory(
        graft.ext.Streaming.freshness(stream), "q285_freshness",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      s.table("q285_freshness").orderBy("event_type")
    },

    // ——— weekly Gini of per-user activity: inequality DRIFT over
    //     time ("is engagement concentrating into whales"), exact
    //     rank·count sums per epoch week. ———
    Q("q286_weekly_gini",
      """WITH we AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
        |    AS week, CAST(user_id AS VARCHAR) AS u,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT week, x, CAST(row_number() OVER (
        |    PARTITION BY week ORDER BY x, u) AS BIGINT) AS i
        |  FROM we
        |), a AS (
        |  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(x) AS BIGINT) AS total_events,
        |    CAST(SUM(i * x) AS BIGINT) AS ix
        |  FROM r GROUP BY 1
        |)
        |SELECT week, n_users, total_events,
        |  CASE WHEN n_users > 0 AND total_events > 0 THEN
        |    round(2.0 * CAST(ix AS DOUBLE) /
        |      (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE)) -
        |      CAST(n_users + 1 AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
        |  END AS gini
        |FROM a ORDER BY week""".stripMargin) { (s, dir) =>
      graft.ext.Profile.weeklyGini(t(s, dir, "events"), "user_id", "ts")
    },

    // ——— heavy-hitter drift: exact top-10 users of each half of the
    //     day span joined BY RANK — who left the leaderboard, who
    //     entered, did #1 change. ———
    Q("q287_tophitter_drift",
      """WITH d AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM events
        |), sp AS (
        |  SELECT CAST((MIN(day) + MAX(day)) // 2 AS BIGINT) AS mid FROM d
        |), pre AS (
        |  SELECT rank, u AS user_pre, n AS n_pre FROM (
        |    SELECT u, CAST(COUNT(*) AS BIGINT) AS n,
        |      CAST(row_number() OVER (ORDER BY COUNT(*) DESC, u)
        |        AS BIGINT) AS rank
        |    FROM d, sp WHERE day <= sp.mid GROUP BY u)
        |  WHERE rank <= 10
        |), post AS (
        |  SELECT rank, u AS user_post, n AS n_post FROM (
        |    SELECT u, CAST(COUNT(*) AS BIGINT) AS n,
        |      CAST(row_number() OVER (ORDER BY COUNT(*) DESC, u)
        |        AS BIGINT) AS rank
        |    FROM d, sp WHERE day > sp.mid GROUP BY u)
        |  WHERE rank <= 10
        |)
        |SELECT COALESCE(pre.rank, post.rank) AS rank, user_pre, n_pre,
        |  user_post, n_post,
        |  NOT (user_pre IS NOT DISTINCT FROM user_post) AS user_changed
        |FROM pre FULL OUTER JOIN post ON pre.rank = post.rank
        |ORDER BY rank""".stripMargin) { (s, dir) =>
      graft.ext.Profile.topHitterDrift(t(s, dir, "events"), "user_id", "ts")
    },

    // ——— dow×hour activity heatmap with per-dow shares: the
    //     capacity-planning load view, exact counts + one rounded
    //     ratio per cell. ———
    Q("q288_dow_hour_heatmap",
      """WITH cells AS (
        |  SELECT CAST((CAST(CAST(ts AS DATE) - DATE '1970-01-01'
        |      AS BIGINT) + 4) % 7 AS BIGINT) AS dow,
        |    CAST(hour(ts) AS BIGINT) AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), dt AS (
        |  SELECT dow, CAST(SUM(n) AS BIGINT) AS dow_n FROM cells GROUP BY 1
        |)
        |SELECT c.dow, c.hour, c.n,
        |  round(CAST(c.n AS DOUBLE) / dt.dow_n, 6) AS share_of_dow
        |FROM cells c JOIN dt USING (dow)
        |ORDER BY dow, hour""".stripMargin) { (s, dir) =>
      graft.ext.Profile.dowHourHeatmap(t(s, dir, "events"), "ts")
    },

    // ——— whale concentration: exact share of all events from the
    //     top 1% / 10% / 50% most active users, nearest-rank cuts on
    //     the ranked entity dictionary — "how head-heavy", q208's
    //     Lorenz in three numbers. ———
    Q("q289_whale_shares",
      """WITH counts AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, CAST(COUNT(*) AS BIGINT)
        |    AS n
        |  FROM events GROUP BY 1
        |), ranked AS (
        |  SELECT n, CAST(row_number() OVER (ORDER BY n DESC, u) AS BIGINT)
        |      AS rk,
        |    CAST(SUM(n) OVER (ORDER BY n DESC, u
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM counts
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_entities,
        |    CAST(SUM(n) AS BIGINT) AS n_events
        |  FROM counts
        |)
        |SELECT p.p AS top_percent, r.rk AS n_top_entities, tot.n_entities,
        |  r.cum AS events_by_top, tot.n_events,
        |  round(CAST(r.cum AS DOUBLE) / tot.n_events, 6) AS share
        |FROM (SELECT CAST(unnest([1, 10, 50]) AS BIGINT) AS p) p
        |CROSS JOIN tot
        |JOIN ranked r
        |  ON r.rk = CAST(ceil(p.p / 100.0 * tot.n_entities) AS BIGINT)
        |ORDER BY top_percent""".stripMargin) { (s, dir) =>
      graft.ext.Profile.whaleShares(t(s, dir, "events"), "user_id")
    },

    // ——— deterministic random walks (DeepWalk/node2vec sampling
    //     stage) over the part↔supplier graph: step-t neighbor choice
    //     = md5(start:seed:t) mod degree over the sorted neighbor
    //     list — walks are a pure function of (graph, seed), so the
    //     oracle replays every trajectory. 3 node-keyed equi-join
    //     steps, no RNG, no expansion beyond one row per walk-step. ———
    Q("q310_randomwalk_pairs",
      s"""$walksCte
        |SELECT start, step, node FROM traj WHERE step >= 1
        |ORDER BY start, step""".stripMargin) { (s, dir) =>
      graft.ext.Graph.deterministicWalks(psEdges(s, dir), steps = 3,
        seed = "w1")
    },

    // ——— skip-gram pairs from the walks: (center, context, count)
    //     within 2 hops on the same walk, least/greatest-normalized,
    //     self-pairs (revisits) dropped — the word2vec-style table a
    //     graph-embedding trainer consumes. Pair fan-out bounded by
    //     C(steps+1, 2) per walk. ———
    Q("q311_walk_skipgram",
      s"""$walksCte,
        |pr AS (
        |  SELECT least(a.node, b.node) AS u, greatest(a.node, b.node) AS v
        |  FROM traj a JOIN traj b
        |    ON a.start = b.start AND b.step > a.step
        |    AND b.step - a.step <= 2
        |)
        |SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_cooc
        |FROM pr WHERE u <> v
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // materialize the trajectories ONCE: the skip-gram self-join
      // reads them from both sides (plus the step-0 start union),
      // and an unmaterialized walk chain would replay its 3 join
      // steps per reference
      val walks = graft.ext.Graph.deterministicWalks(psEdges(s, dir),
        steps = 3, seed = "w1").trackedLocalCheckpoint()
      graft.ext.Graph.walkSkipGramPairs(walks, window = 2)
    },

    // ——— node2vec biased walks: q310 upgraded to SECOND-ORDER
    //     sampling — from step 2 the neighbor choice at cur depends
    //     on prev with INTEGER weights (back=1, common-neighbor=4,
    //     far=2 ≈ p=4, q=2), cumulative-sum pick by the same md5
    //     coin. Integer cum/total keep the pick engine-exact; the
    //     only windows are per-walk candidate frames (bounded by max
    //     degree). The entry walks a 20%-of-parts subgraph roster
    //     (the way the ANN entries walk a query roster): second-order
    //     sampling's cost is linear in Σ deg(cur) BY DEFINITION —
    //     the full-graph cost curve is measured in SCALE.md, and
    //     q310/q311/q321 keep exercising the full graph. ———
    Q("q315_node2vec_walks",
      s"""$n2vCte
        |SELECT start, step, node FROM traj
        |ORDER BY start, step""".stripMargin) { (s, dir) =>
      graft.ext.Graph.node2vecWalks(psEdgesSampled(s, dir), steps = 3,
        seed = "n2v1")
    },

    // ——— deterministic unigram^0.75 negative sampling for the q311
    //     skip-gram pairs (the embedding trainer's third input): each
    //     node owns a cumulative-weight interval (Ranks running-sum
    //     decomposition, weight-dictionary window only); a draw is an
    //     md5 coin mod total looked up via a bucket-grid EQUI-join —
    //     the alias-table substitute that scales. Endpoint collisions
    //     flagged, not resampled. ———
    Q("q321_negative_samples",
      s"""$walksCte,
        |pr AS (
        |  SELECT least(a.node, b.node) AS u, greatest(a.node, b.node) AS v
        |  FROM traj a JOIN traj b
        |    ON a.start = b.start AND b.step > a.step
        |    AND b.step - a.step <= 2
        |), pairs AS (
        |  SELECT u, v FROM pr WHERE u <> v GROUP BY 1, 2
        |), wts AS (
        |  SELECT src AS node,
        |    CAST(round(1e6 * pow(CAST(deg AS DOUBLE), 0.75)) AS BIGINT) AS w
        |  FROM deg
        |), iv AS (
        |  SELECT node, w,
        |    SUM(w) OVER (ORDER BY w, node
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS lo,
        |    SUM(w) OVER (ORDER BY w, node
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        |  FROM wts
        |), tot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM wts),
        |coins AS (
        |  SELECT u, v, CAST(rj.j AS INT) AS j,
        |    CAST(concat('0x', substring(md5(u || '|' || v || '|'
        |      || CAST(rj.j AS VARCHAR) || ':ns1'), 1, 15)) AS BIGINT) % t AS c
        |  FROM pairs CROSS JOIN range(1, 3) rj(j) CROSS JOIN tot
        |)
        |SELECT coins.u, coins.v, coins.j, iv.node AS neg,
        |  (iv.node = coins.u OR iv.node = coins.v) AS is_collision
        |FROM coins JOIN iv ON coins.c >= iv.lo AND coins.c < iv.hi
        |ORDER BY u, v, j""".stripMargin) { (s, dir) =>
      val pairs = graft.ext.Graph.walkSkipGramPairs(
        graft.ext.Graph.deterministicWalks(psEdges(s, dir), steps = 3,
          seed = "w1").trackedLocalCheckpoint(), window = 2)
      graft.ext.Graph.negativeSamples(psEdges(s, dir), pairs, k = 2,
        seed = "ns1")
    }
  )

  /** The part↔supplier bipartite edge list the graph battery uses.
    * Distinct on the INTEGER key pairs before tagging (guide §2.3) —
    * result-identical for every consumer (they dedupe edges anyway;
    * tagging is injective) and the heavy distinct runs over 16-byte
    * int pairs instead of row-scale strings.
    */
  private def psEdges(s: SparkSession, dir: String) =
    t(s, dir, "lineitem")
      .select(col("l_partkey").as("_pk"), col("l_suppkey").as("_sk"))
      .distinct()
      .select(concat(lit("p"), col("_pk").cast("string")).as("src"),
        concat(lit("s"), col("_sk").cast("string")).as("dst"))

  /** q315's roster: the 20%-of-parts subgraph (hub degrees scale with
    * the slice, so the second-order candidate volume drops ~25×).
    */
  private def psEdgesSampled(s: SparkSession, dir: String) =
    t(s, dir, "lineitem").filter(col("l_partkey") % 5 === 0)
      .select(col("l_partkey").as("_pk"), col("l_suppkey").as("_sk"))
      .distinct()
      .select(concat(lit("p"), col("_pk").cast("string")).as("src"),
        concat(lit("s"), col("_sk").cast("string")).as("dst"))

  /** Oracle CTE chain replaying [[graft.ext.Graph.deterministicWalks]]
    * (3 steps, seed w1) on the part↔supplier graph, ending in
    * `traj(start, step, node)` with the start node at step 0.
    */
  private def walksCte: String =
    """WITH e0 AS (
      |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
      |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM lineitem
      |), und AS (
      |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
      |), deg AS (
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1
      |), adj AS (
      |  SELECT src, dst,
      |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
      |      AS BIGINT) AS idx
      |  FROM und
      |), s1 AS (
      |  SELECT f.src AS start, a.dst AS cur
      |  FROM deg f
      |  JOIN adj a ON a.src = f.src AND a.idx =
      |    CAST(concat('0x', substring(md5(f.src || ':w1:1'), 1, 15))
      |      AS BIGINT) % f.deg
      |), s2 AS (
      |  SELECT f.start, a.dst AS cur
      |  FROM s1 f
      |  JOIN deg d ON d.src = f.cur
      |  JOIN adj a ON a.src = f.cur AND a.idx =
      |    CAST(concat('0x', substring(md5(f.start || ':w1:2'), 1, 15))
      |      AS BIGINT) % d.deg
      |), s3 AS (
      |  SELECT f.start, a.dst AS cur
      |  FROM s2 f
      |  JOIN deg d ON d.src = f.cur
      |  JOIN adj a ON a.src = f.cur AND a.idx =
      |    CAST(concat('0x', substring(md5(f.start || ':w1:3'), 1, 15))
      |      AS BIGINT) % d.deg
      |), traj AS (
      |  SELECT src AS start, CAST(0 AS INT) AS step, src AS node FROM deg
      |  UNION ALL SELECT start, CAST(1 AS INT) AS step, cur FROM s1
      |  UNION ALL SELECT start, CAST(2 AS INT) AS step, cur FROM s2
      |  UNION ALL SELECT start, CAST(3 AS INT) AS step, cur FROM s3
      |)""".stripMargin

  /** Shared oracle CTE for the q190/q329 SCD2 dimension: two
    * deterministic customer snapshots merged into `scd(k, bal,
    * valid_from, valid_to)` (versions 1 and 2, NULL = current).
    */
  private def scd2Cte: String =
    """WITH o AS (
      |  SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer
      |), n AS (
      |  SELECT k, CASE WHEN k % 10 = 0 THEN bal + 10000 ELSE bal END AS bal
      |  FROM o WHERE NOT (k % 17 = 3 AND k % 10 <> 0)
      |  UNION ALL
      |  SELECT k + 1000000, CAST(0 AS BIGINT) FROM o WHERE k % 23 = 5
      |), j AS (
      |  SELECT o.k AS ok, o.bal AS obal, n.k AS nk, n.bal AS nbal
      |  FROM o FULL OUTER JOIN n ON o.k = n.k
      |), scd AS (
      |  SELECT ok AS k, obal AS bal, CAST(1 AS BIGINT) AS valid_from,
      |    CAST(2 AS BIGINT) AS valid_to
      |  FROM j WHERE ok IS NOT NULL AND nk IS NULL
      |  UNION ALL
      |  SELECT nk, nbal, 2, NULL FROM j WHERE ok IS NULL
      |  UNION ALL
      |  SELECT ok, obal, 1, 2
      |  FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND obal <> nbal
      |  UNION ALL
      |  SELECT nk, nbal, 2, NULL
      |  FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND obal <> nbal
      |  UNION ALL
      |  SELECT ok, obal, 1, NULL
      |  FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND obal = nbal
      |)""".stripMargin

  /** Oracle CTE chain replaying [[graft.ext.Graph.node2vecWalks]]
    * (3 steps, seed n2v1, weights back=1/common=4/far=2) on the
    * part↔supplier graph, ending in `traj(start, step, node)`.
    * Step 1 is first-order (identical to q310's s1 modulo seed);
    * steps 2-3 pick by integer cumulative weight over each walk's
    * candidate frame.
    */
  private def n2vCte: String = {
    def biasedStep(prev: String, t: Int): String =
      s"""c$t AS (
         |  SELECT f.start, f.prev, f.cur, a.dst,
         |    CAST(CASE WHEN a.dst = f.prev THEN 1
         |         WHEN ex.src IS NOT NULL THEN 4 ELSE 2 END AS BIGINT) AS w
         |  FROM $prev f
         |  JOIN adj a ON a.src = f.cur
         |  LEFT JOIN und ex ON ex.src = f.prev AND ex.dst = a.dst
         |), p$t AS (
         |  SELECT start, cur, dst, w,
         |    SUM(w) OVER (PARTITION BY start ORDER BY dst
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(w) OVER (PARTITION BY start) AS tot
         |  FROM c$t
         |), s$t AS (
         |  SELECT start, cur AS prev, dst AS cur FROM p$t
         |  WHERE CAST(concat('0x', substring(md5(start || ':n2v1:$t'), 1, 15))
         |      AS BIGINT) % tot >= cum - w
         |    AND CAST(concat('0x', substring(md5(start || ':n2v1:$t'), 1, 15))
         |      AS BIGINT) % tot < cum
         |)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
       |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem WHERE l_partkey % 5 = 0
       |), und AS (
       |  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
       |), deg AS (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1
       |), adj AS (
       |  SELECT src, dst,
       |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
       |      AS BIGINT) AS idx
       |  FROM und
       |), s1 AS (
       |  SELECT f.src AS start, f.src AS prev, a.dst AS cur
       |  FROM deg f
       |  JOIN adj a ON a.src = f.src AND a.idx =
       |    CAST(concat('0x', substring(md5(f.src || ':n2v1:1'), 1, 15))
       |      AS BIGINT) % f.deg
       |), ${biasedStep("s1", 2)}, ${biasedStep("s2", 3)}, traj AS (
       |  SELECT start, CAST(1 AS INT) AS step, cur AS node FROM s1
       |  UNION ALL SELECT start, CAST(2 AS INT) AS step, cur FROM s2
       |  UNION ALL SELECT start, CAST(3 AS INT) AS step, cur FROM s3
       |)""".stripMargin
  }

  /** The nine Benford expected shares log10(1+1/d), printed at 17
    * significant digits so the SQL literal parses back to the exact
    * double the Spark plan injects (determinism pattern: driver-
    * computed constants shared by both plans).
    */
  private def benfordCaseSql: String =
    (1 to 9).map(d =>
      f"WHEN $d THEN ${math.log10(1.0 + 1.0 / d)}%.17g").mkString(" ")
}
