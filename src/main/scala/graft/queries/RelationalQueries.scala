package graft.queries

import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Det._

/** TPC-H-style relational operator coverage over the driver's star schema.
  * Each query is written DataFrame-first (Catalyst plans the join strategy;
  * dimension tables are broadcast explicitly) with a DuckDB oracle.
  *
  * Capability coverage re-expressed from the reference's delegated query
  * surface (SURVEY.md §2.2): filter/projection/cast (reference
  * mini_tutorial.py:42, tests/test_sql.py:64-66), joins incl. semi/anti,
  * aggregation, windows, set ops, rollup, top-k — all supplied natively by
  * Spark per SURVEY.md §2.2 "delegated query surface".
  */
object RelationalQueries {

  private def ntz(s: String): Column = lit(LocalDateTime.parse(s + "T00:00"))

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: full-scan aggregation (TPC-H Q1 shape) ----
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") <= ntz("2001-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            dsum((col("l_extendedprice") * (lit(1) - col("l_discount"))) * (lit(1) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlSum("l_quantity")} AS sum_qty,
        ${sqlSum("l_extendedprice")} AS sum_base_price,
        ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        ${sqlSum("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)")} AS sum_charge,
        ${sqlAvg("l_quantity")} AS avg_qty,
        ${sqlAvg("l_extendedprice")} AS avg_price,
        ${sqlAvg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus"""),
      headline = true),

    // ---- q02: filter + projection + per-row arithmetic (scan pushdown) ----
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") >= ntz("1998-01-01") && col("l_shipdate") < ntz("1998-03-01")
            && col("l_quantity") > lit(45.0))
          .select(
            col("l_orderkey"),
            col("l_partkey"),
            col("l_linenumber").cast(LongType).as("l_linenumber"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            col("l_returnflag"))
      },
      Some("""SELECT l_orderkey, l_partkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        l_extendedprice * (1 - l_discount) AS revenue, l_returnflag
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-03-01'
          AND l_quantity > 45.0""")),

    // ---- q03: 3-way join + agg + deterministic top-k ----
    QueryDef(
      "q03_top_orders",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir).filter(col("o_orderdate") < ntz("2000-03-15"))
        val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ntz("2000-03-15"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"), col("revenue"))
      },
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, revenue FROM (
        SELECT l_orderkey, o_orderdate,
          ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2000-03-15' AND l_shipdate > TIMESTAMP '2000-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10)"""),
      headline = true),

    // ---- q04: semi-join (EXISTS) ----
    QueryDef(
      "q04_order_priority",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ntz("1997-01-01") && col("o_orderdate") < ntz("1997-04-01"))
        val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority""")),

    // ---- q05: 6-way star join (TPC-H Q5 shape) ----
    QueryDef(
      "q05_local_supplier_volume",
      (s, dir) => {
        val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val su = Tables.supplier(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ntz("1996-01-01") && col("o_orderdate") < ntz("1997-01-01"))
        val l = Tables.lineitem(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      },
      Some(s"""SELECT n_name, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name"""),
      headline = true),

    // ---- q06: selective filter + scalar aggregate ----
    QueryDef(
      "q06_revenue_forecast",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") >= ntz("1997-01-01") && col("l_shipdate") < ntz("1998-01-01")
            && col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07)
            && col("l_quantity") < lit(24.0))
          .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
               count(lit(1)).as("n_rows"))
      },
      Some(s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""")),

    // ---- q07: two-sided nation join with year extraction ----
    QueryDef(
      "q07_nation_volume",
      (s, dir) => {
        val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val su = Tables.supplier(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
            || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          ${sqlSum("l_extendedprice * (1 - l_discount)")} AS volume
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3""")),

    // ---- q09: product profit by nation/year ----
    QueryDef(
      "q09_product_profit",
      (s, dir) => {
        val p = Tables.part(s, dir).filter(col("p_type").isin("PROMO", "ECONOMY"))
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val su = Tables.supplier(s, dir)
        val n = Tables.nation(s, dir)
        l.join(p, col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) - col("p_retailprice") * col("l_quantity"))
            .as("sum_profit"))
      },
      Some(s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          ${sqlSum("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity")} AS sum_profit
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type IN ('PROMO', 'ECONOMY')
        GROUP BY 1, 2"""),
      headline = true),

    // ---- q10: returned items, top-20 customers ----
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ntz("1996-10-01") && col("o_orderdate") < ntz("1997-01-01"))
        val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        val n = Tables.nation(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
          ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---- q13: outer join + count distribution ----
    QueryDef(
      "q13_customer_distribution",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        GROUP BY c_count""")),

    // ---- q14: conditional aggregation ratio ----
    QueryDef(
      "q14_promo_revenue",
      (s, dir) => {
        val p = Tables.part(s, dir)
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= ntz("1997-06-01") && col("l_shipdate") < ntz("1997-07-01"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .agg(((lit(100.0) * dsum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))))
            / dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("promo_revenue_pct"))
      },
      Some(s"""SELECT (100.0 * ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")})
          / ${sqlSum("l_extendedprice * (1 - l_discount)")} AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'""")),

    // ---- q18: agg + HAVING + join-back, top-k ----
    QueryDef(
      "q18_large_orders",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val bigOrders = l.groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > lit(150.0))
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        bigOrders.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
          o_totalprice, sum_qty
        FROM (SELECT l_orderkey, ${sqlSum("l_quantity")} AS sum_qty
              FROM lineitem GROUP BY l_orderkey) big
          JOIN orders ON big.l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE sum_qty > 150.0
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      headline = true),

    // ---- ranked top-n per partition ----
    // Executed by the bounded-heap TopKPerKey operator, NOT a
    // Window.partitionBy full sort: a window ranks every row then throws
    // away all but 3 per key (full shuffle+sort of the table), while the
    // heap keeps 3 per key map-side before the shuffle — the plan that
    // survives a 100x scale-up. The rank is a cheap window over the
    // 3 x #keys survivors only. True frame-exact window coverage lives in
    // q21 (running total); the custom-operator surface itself in q59.
    QueryDef(
      "q20_window_rank",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val top = graft.plans.TopK.topKPerKey(li, Seq("l_suppkey"),
          Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        top.withColumn("rn", row_number().over(w).cast(LongType))
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_linenumber").cast(LongType).as("l_linenumber"),
            col("l_extendedprice"), col("rn"))
      },
      Some("""SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
          l_extendedprice, rn
        FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
              FROM lineitem)
        WHERE rn <= 3"""),
      headline = true),

    // ---- window: running total (frame-exact decimal accumulation) ----
    QueryDef(
      "q21_window_running_total",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(38, 10))).over(w).cast(DoubleType).as("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend
        FROM orders""")),

    // ---- distinct ----
    QueryDef(
      "q22_distinct_pairs",
      (s, dir) => Tables.orders(s, dir).select(col("o_orderpriority"), col("o_orderstatus")).distinct(),
      Some("SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders")),

    // ---- set ops: INTERSECT / EXCEPT ----
    QueryDef(
      "q23_setop_intersect",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val y95 = o.filter(col("o_orderdate") >= ntz("1995-01-01") && col("o_orderdate") < ntz("1996-01-01"))
          .select(col("o_custkey"))
        val y96 = o.filter(col("o_orderdate") >= ntz("1996-01-01") && col("o_orderdate") < ntz("1997-01-01"))
          .select(col("o_custkey"))
        y95.intersect(y96)
      },
      Some("""SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'""")),
    QueryDef(
      "q24_setop_except",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val y95 = o.filter(col("o_orderdate") >= ntz("1995-01-01") && col("o_orderdate") < ntz("1996-01-01"))
          .select(col("o_custkey"))
        val y96 = o.filter(col("o_orderdate") >= ntz("1996-01-01") && col("o_orderdate") < ntz("1997-01-01"))
          .select(col("o_custkey"))
        y95.except(y96)
      },
      Some("""SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'""")),

    // ---- anti join ----
    QueryDef(
      "q25_anti_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // ---- rollup ----
    QueryDef(
      "q26_rollup",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n_rows"), col("sum_qty"))
      },
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(l_linestatus, 'ALL') AS linestatus,
          COUNT(*) AS n_rows, ${sqlSum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // ---- conditional counts (CASE inside agg) ----
    QueryDef(
      "q27_conditional_counts",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_orderstatus"))
          .agg(
            count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"),
            count(when(col("o_orderpriority") === "5-LOW", lit(1))).as("n_low"),
            count(when(col("o_totalprice") > lit(250000.0), lit(1))).as("n_big"),
            count(lit(1)).as("n_total"))
      },
      Some("""SELECT o_orderstatus,
          COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
          COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low,
          COUNT(CASE WHEN o_totalprice > 250000.0 THEN 1 END) AS n_big,
          COUNT(*) AS n_total
        FROM orders GROUP BY o_orderstatus""")),

    // ---- disjunctive multi-range predicate join (TPC-H q19 shape) ----
    // OR-of-ANDs mixing join-side and both-side predicates — exercises
    // Catalyst's CNF conversion pushing the common p_partkey join plus the
    // per-side residuals
    QueryDef(
      "q75_disjunctive_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir)
        li.join(p, col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
              col("l_quantity").between(20, 30))))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      },
      Some(s"""SELECT COUNT(*) AS n,
          ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey AND (
          (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30))"""))
  )
}
