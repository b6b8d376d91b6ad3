package graft.operators

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface over the TPC-H-ish fixture tables: scan,
  * filter/project, joins of every flavor (shuffle, broadcast, semi, anti,
  * outer), aggregation (hash, rollup/cube, conditional, having), windows
  * (rank, lag), sorts/limits, set ops, scalar string/date functions,
  * subqueries.
  *
  * Oracle contract (driver DuckDB compare): identical column names in Spark
  * and SQL; every query ends in a total ORDER BY; doubles that are
  * order-of-summation-sensitive are rounded; integer-ish outputs cast to
  * BIGINT on both sides.
  *
  * Scale notes inline per query; general rules: filters/projections sit
  * directly on the parquet scan (pushdown verified via .explain), dimension
  * joins are broadcast, fact-fact joins shuffle on the join key only, and
  * aggregates are partial (map-side) by construction.
  */
object Relational {

  private val T = Tables

  val entries: Seq[Entry] = Seq(
    // q01: full-scan hash aggregate with partial agg; the classic pricing
    // summary. At 100 TB this is scan-bound — no shuffle besides the 6-group
    // final agg, so it scales linearly with executors.
    Entry(
      "q01_pricing_summary",
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 4).as("sum_qty"),
            round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
              .as("sum_disc_price"),
            round(
              sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
                (lit(1) + col("l_tax"))),
              4).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             | round(sum(l_quantity),4) AS sum_qty,
             | round(sum(l_extendedprice),4) AS sum_base_price,
             | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
             | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
             | round(avg(l_quantity),4) AS avg_qty,
             | round(avg(l_extendedprice),4) AS avg_price,
             | round(avg(l_discount),4) AS avg_disc,
             | count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // q02: filter+project — both should reach the parquet scan
    // (PushedFilters + 3-column ReadSchema in .explain).
    Entry(
      "q02_filter_project",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year"),
            col("o_totalprice"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year, o_totalprice
             |FROM orders WHERE o_orderstatus='F' AND o_totalprice>100000
             |ORDER BY o_orderkey""".stripMargin)),

    // q03: shipping-priority top-k — orders⋈lineitem shuffles on orderkey,
    // then a key-shuffle join against filtered customer. No broadcast hint:
    // customer grows with the corpus (~1/5 of it passes the segment filter),
    // so the choice is left to stats/AQE — broadcast when genuinely small,
    // shuffle join on custkey at 100 TB. Top-k via sort+limit (TakeOrdered
    // at the physical level, no full sort materialization).
    Entry(
      "q03_shipping_priority",
      (s, d) => {
        val cust = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = T.orders(s, d)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        val li = T.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
          .select(
            col("o_orderkey"),
            col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
             | strftime(o_orderdate, '%Y-%m-%d') AS orderdate
             |FROM customer JOIN orders ON c_custkey=o_custkey
             | JOIN lineitem ON l_orderkey=o_orderkey
             |WHERE c_mktsegment='BUILDING'
             | AND o_orderdate < TIMESTAMP '1998-01-01'
             | AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // q04: fact⋈dim join — no forced hint: part grows with the corpus, so
    // broadcast is a stats/AQE decision (taken at every SF we test, where
    // part is far under the threshold; a shuffle join on partkey at 100 TB).
    // The agg then shuffles only |brands| rows per partition.
    Entry(
      "q04_brand_revenue",
      (s, d) =>
        T.lineitem(s, d)
          .join(T.part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("p_brand")),
      Some("""SELECT p_brand,
             | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
             | count(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey=p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // q05: five-way join (region→nation→customer→orders→lineitem→supplier).
    // Broadcast hints ONLY on the true dims (nation: 25 rows, region: 5 —
    // bounded at any corpus size). Customer and supplier grow linearly with
    // the corpus, so their joins shuffle on the key and stats/AQE choose
    // broadcast only when a side is genuinely small. The c_nationkey=
    // s_nationkey local-supplier predicate follows TPC-H Q5.
    Entry(
      "q05_region_revenue",
      (s, d) => {
        val cust = T.customer(s, d)
          .join(broadcast(
            T.nation(s, d)
              .join(T.region(s, d).filter(col("r_name") === "ASIA"),
                    col("n_regionkey") === col("r_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
        T.lineitem(s, d)
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(T.supplier(s, d),
                col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
             |FROM customer
             | JOIN nation ON c_nationkey=n_nationkey
             | JOIN region ON n_regionkey=r_regionkey
             | JOIN orders ON o_custkey=c_custkey
             | JOIN lineitem ON l_orderkey=o_orderkey
             | JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
             |WHERE r_name='ASIA'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // q06: highly selective scan-aggregate; every predicate pushes into the
    // parquet reader, result is a single row (coalesced on both sides).
    Entry(
      "q06_forecast_revenue",
      (s, d) =>
        T.lineitem(s, d)
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(round(coalesce(sum(col("l_extendedprice") * col("l_discount")), lit(0.0)), 4)
            .as("revenue")),
      Some("""SELECT round(coalesce(sum(l_extendedprice*l_discount),0),4) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             | AND l_shipdate < TIMESTAMP '1997-01-01'
             | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // q07: ranking window — one shuffle on the partition key, rank computed
    // within sorted partitions; the rn<=3 filter cannot push below the window
    // but AQE keeps partitions balanced.
    Entry(
      "q07_window_top_orders",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             | SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
             | FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // q08: global top-k — physical plan is TakeOrderedAndProject (per-
    // partition heap + driver merge), not a full sort; O(k) memory at any SF.
    Entry(
      "q08_sort_limit",
      (s, d) =>
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // q09: distinct aggregate (expands to a two-phase agg under the hood).
    Entry(
      "q09_count_distinct",
      (s, d) =>
        T.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(
            countDistinct(col("c_nationkey")).as("n_nations"),
            count(lit(1)).as("n_cust"))
          .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
             | count(*) AS n_cust
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // q10-q12: set operations (UNION/INTERSECT/EXCEPT, all distinct).
    Entry(
      "q10_union_nations",
      (s, d) =>
        T.customer(s, d)
          .select(col("c_nationkey").cast("long").as("nationkey"))
          .union(T.supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
          .distinct()
          .orderBy(col("nationkey")),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             |UNION
             |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
             |ORDER BY nationkey""".stripMargin)),
    Entry(
      "q11_intersect_nations",
      (s, d) =>
        T.customer(s, d)
          .select(col("c_nationkey").cast("long").as("nationkey"))
          .intersect(T.supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             |INTERSECT
             |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
             |ORDER BY nationkey""".stripMargin)),
    Entry(
      "q12_except_nations",
      (s, d) =>
        T.customer(s, d)
          .select(col("c_nationkey").cast("long").as("nationkey"))
          .except(T.supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             |EXCEPT
             |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // q13/q14: hierarchical aggregates. NULL grouping markers are coalesced
    // to 'ALL' on both sides so null-ordering differences can't bite.
    Entry(
      "q13_rollup_customers",
      (s, d) =>
        T.customer(s, d)
          .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 4).as("acctbal"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("r_name"),
            coalesce(col("n_name"), lit("ALL")).as("n_name"),
            col("n_cust"),
            col("acctbal"))
          .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT coalesce(r_name,'ALL') AS r_name, coalesce(n_name,'ALL') AS n_name,
             | count(*) AS n_cust, round(sum(c_acctbal),4) AS acctbal
             |FROM customer JOIN nation ON c_nationkey=n_nationkey
             | JOIN region ON n_regionkey=r_regionkey
             |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin)),
    Entry(
      "q14_cube_orders",
      (s, d) =>
        T.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
            col("n"),
            col("total"))
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT coalesce(o_orderstatus,'ALL') AS o_orderstatus,
             | coalesce(o_orderpriority,'ALL') AS o_orderpriority,
             | count(*) AS n, round(sum(o_totalprice),2) AS total
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY 1, 2""".stripMargin)),

    // q15/q16: semi/anti join — the EXISTS/NOT EXISTS shapes; broadcast-able
    // when the probe side is the small one.
    Entry(
      "q15_semi_join",
      (s, d) =>
        T.customer(s, d)
          .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
             |ORDER BY c_custkey""".stripMargin)),
    Entry(
      "q16_anti_join",
      (s, d) =>
        T.customer(s, d)
          .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // q17: left outer join + aggregate, zero-order customers kept.
    Entry(
      "q17_outer_join_agg",
      (s, d) =>
        T.customer(s, d)
          .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             | round(coalesce(sum(o_totalprice),0),2) AS spend
             |FROM customer LEFT JOIN orders ON c_custkey=o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // q18: scalar subquery — expressed as a broadcast cross join of the
    // 1-row aggregate, which is exactly what Catalyst rewrites scalar
    // subqueries into.
    Entry(
      "q18_scalar_subquery",
      (s, d) => {
        val avgPrice = T.orders(s, d).agg(avg(col("o_totalprice")).as("ap"))
        T.orders(s, d)
          .crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("ap"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // q19: IN-subquery as a left-semi join on the filtered dim — no forced
    // hint (part grows with the corpus; stats/AQE pick broadcast when the
    // filtered side is small, shuffle semi-join on partkey otherwise).
    Entry(
      "q19_in_subquery",
      (s, d) =>
        T.lineitem(s, d)
          .join(
            T.part(s, d).filter(col("p_size") > 40).select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"),
            "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),4) AS qty
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q20: scalar string-function battery (all codegen'd built-ins).
    Entry(
      "q20_string_funcs",
      (s, d) =>
        T.customer(s, d)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("uname"),
            length(col("c_name")).cast("long").as("name_len"),
            substring(col("c_mktsegment"), 1, 3).as("seg3"),
            concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"),
            lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, upper(c_name) AS uname,
             | length(c_name) AS name_len, substr(c_mktsegment,1,3) AS seg3,
             | c_mktsegment || '#' || c_name AS tagged,
             | lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
             | regexp_extract(c_name, '([0-9]+)', 1) AS digits
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // q21: date-part extraction + aggregate.
    Entry(
      "q21_date_funcs",
      (s, d) =>
        T.orders(s, d)
          .groupBy(
            year(col("o_orderdate")).cast("long").as("y"),
            quarter(col("o_orderdate")).cast("long").as("q"),
            month(col("o_orderdate")).cast("long").as("m"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
          .orderBy(col("y"), col("q"), col("m")),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             | CAST(quarter(o_orderdate) AS BIGINT) AS q,
             | CAST(month(o_orderdate) AS BIGINT) AS m,
             | count(*) AS n, round(sum(o_totalprice),2) AS rev
             |FROM orders GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin)),

    // q22: conditional (pivot-style) aggregation without a shuffle per pivot
    // value — one pass, N conditional sums.
    Entry(
      "q22_case_agg",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_linestatus"))
          .agg(
            round(sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0)), 4)
              .as("qty_r"),
            round(sum(when(col("l_returnflag") === "A", col("l_quantity")).otherwise(0.0)), 4)
              .as("qty_a"),
            round(sum(when(col("l_returnflag") === "N", col("l_extendedprice")).otherwise(0.0)), 4)
              .as("price_n"))
          .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
             | round(sum(CASE WHEN l_returnflag='R' THEN l_quantity ELSE 0 END),4) AS qty_r,
             | round(sum(CASE WHEN l_returnflag='A' THEN l_quantity ELSE 0 END),4) AS qty_a,
             | round(sum(CASE WHEN l_returnflag='N' THEN l_extendedprice ELSE 0 END),4) AS price_n
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // q23: HAVING (post-aggregation filter).
    Entry(
      "q23_having",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 3)
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, count(*) AS n_orders FROM orders
             |GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey""".stripMargin)),

    // q24: lag window — consecutive-order price delta per customer.
    Entry(
      "q24_window_lag",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        T.orders(s, d)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2)
              .as("delta"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             | round(o_totalprice - lag(o_totalprice) OVER (
             |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // q170: PIVOT — the day × event_type revenue matrix (the dashboard /
    // report shape every BI layer asks for). `RelationalGroupedDataset
    // .pivot` with an EXPLICIT value list — the value-DISCOVERY form (scan
    // once to collect distinct values, again to pivot) is banned at
    // 100 TB, and the explicit list is also what keeps the output schema
    // static for the oracle. Catalyst compiles this to the two-phase
    // shape: a (day, type) pre-aggregate (map-side partials collapse the
    // corpus BEFORE its exchange, which then carries only days×types
    // group rows) followed by a day-keyed pivot_first aggregate — both
    // exchanges are GROUP-sized, never corpus-sized, and width is free
    // (suite-pinned: one scan, exactly the two group-sized hash
    // exchanges). Semantically identical to the manual sum(CASE WHEN...)
    // plan — the oracle states that identity. Integer cents end-to-end;
    // /100.0 only at emission.
    Entry(
      "q170_pivot_matrix",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val daily = Tables.events(s, d)
          .select(
            expr(s"ts div ${24L * 3600 * 1000 * 1000 * 1000}").as("day"),
            col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val wide = daily
          .groupBy(col("day"))
          .pivot("event_type", types)
          .agg(sum(col("cents")))
        types.foldLeft(wide) { (df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L)) / 100.0)
        }.orderBy(col("day"))
      },
      Some("""WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
             |    event_type, CAST(round(value*100) AS BIGINT) AS cents
             |  FROM events)
             |SELECT day,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN cents END), 0)
             |    / 100.0 AS DOUBLE) AS click,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN cents END), 0)
             |    / 100.0 AS DOUBLE) AS error,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN cents END), 0)
             |    / 100.0 AS DOUBLE) AS purchase,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN cents END), 0)
             |    / 100.0 AS DOUBLE) AS signup,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN cents END), 0)
             |    / 100.0 AS DOUBLE) AS view
             |FROM e GROUP BY day ORDER BY day""".stripMargin)),

    // q171: UNPIVOT (melt) — the inverse reshaping: lineitem's four
    // per-row measures melted to (key, measure, value) long format — the
    // shape feature stores and plotting layers ingest. `Dataset.unpivot`
    // compiles to a map-side EXPAND (4 output rows per input, zero
    // shuffles before the final aggregate) — reshaping is free of
    // exchanges at any scale; the rollup here (per-measure totals) then
    // collapses through one 4-group aggregate. Cent/basis-point integers
    // end-to-end so the oracle's UNION ALL formulation matches exactly.
    Entry(
      "q171_unpivot_melt",
      (s, d) => {
        val src = Tables.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
            // round() first: l_quantity is integral-valued so the raw cast
            // was value-safe, but PlanGuardSuite bans bare double→long casts
            // (Spark truncates, DuckDB rounds — the q231 class)
            round(col("l_quantity")).cast("long").as("quantity"),
            round(col("l_discount") * 10000).cast("long").as("discount_bp"),
            round(col("l_tax") * 10000).cast("long").as("tax_bp"))
        src
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("price_cents"), col("quantity"), col("discount_bp"), col("tax_bp")),
            "measure",
            "v")
          .groupBy(col("measure"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
          .orderBy(col("measure"))
      },
      Some("""WITH src AS (SELECT l_orderkey, l_linenumber,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
             |    CAST(l_quantity AS BIGINT) AS quantity,
             |    CAST(round(l_discount*10000) AS BIGINT) AS discount_bp,
             |    CAST(round(l_tax*10000) AS BIGINT) AS tax_bp
             |  FROM lineitem),
             |m AS (
             |  SELECT 'price_cents' AS measure, price_cents AS v FROM src
             |  UNION ALL SELECT 'quantity', quantity FROM src
             |  UNION ALL SELECT 'discount_bp', discount_bp FROM src
             |  UNION ALL SELECT 'tax_bp', tax_bp FROM src)
             |SELECT measure, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(v) AS BIGINT) AS total
             |FROM m GROUP BY measure ORDER BY measure""".stripMargin))
  )
}
