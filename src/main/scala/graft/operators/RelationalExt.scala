package graft.operators

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the relational surface: grouping sets, full outer join,
  * correlated subquery shapes, exact percentiles, statistical aggregates,
  * positional explode, as-of join, range join, salted skew join, and an
  * approximate-distinct sketch.
  *
  * The as-of and salted operators are the interesting ones at 100 TB — both
  * are written in their single-shuffle scale form (union+window for as-of,
  * salt-replicate for skew) rather than the naive per-key join.
  */
object RelationalExt {

  private val T = Tables

  /** As-of join, scale form: for each order, the customer's latest event at
    * or before the order time. Instead of the O(|events|·|orders|)-per-user
    * inequality join, tag and union both sides, ONE shuffle on user_id, and
    * carry the last-seen event through an ordered running window — the
    * standard distributed point-in-time-correctness pattern.
    */
  /** The tagged union both as-of forms run over: events and orders on one
    * (uid, t_ns) axis; events sort before orders at equal ts, so "at or
    * before" is inclusive.
    */
  private def asofUnion(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = T.events(s, d).select(
      col("user_id").as("uid"),
      col("ts").as("t_ns"),
      lit(0).as("is_order"),
      lit(null).cast("long").as("o_orderkey"))
    val ord = T.orders(s, d).select(
      col("o_custkey").as("uid"),
      (col("o_orderdate").cast("timestamp").cast("long") * lit(1000000000L)).as("t_ns"),
      lit(1).as("is_order"),
      col("o_orderkey"))
    ev.unionByName(ord)
  }

  private[graft] def asofDirect(u: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("uid")).orderBy(col("t_ns"), col("is_order"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("last_event_ns",
        max(when(col("is_order") === 0, col("t_ns"))).over(w))
      .withColumn("n_prior",
        sum(when(col("is_order") === 0, 1L).otherwise(0L)).over(w))
      .filter(col("is_order") === 1)
      .select(col("o_orderkey"), col("uid").as("o_custkey"), col("last_event_ns"), col("n_prior"))
      .orderBy(col("o_orderkey"))
  }

  private def asofJoin(s: org.apache.spark.sql.SparkSession, d: String) =
    asofDirect(asofUnion(s, d))

  /** Hot-key-safe as-of join — the q64 two-phase pattern applied to q50.
    * Phase 1 windows within (uid, time-block): a hot uid fans out over
    * (#blocks) reducers instead of one giant sorted partition. Phase 2
    * reduces each block to a 2-value EVENT summary (last event ts, event
    * count), prefix-scans those tiny per-(uid, blk) rows over strictly
    * earlier blocks, and equi-joins the prefix back on (uid, blk). An
    * order's answer is then within-block running state ⊕ prior-block
    * prefix — identical to the direct single-window form (oracle +
    * RelationalExtSuite equality on a skewed fixture), with no partition
    * ever holding more than one block of one user.
    */
  private[graft] def asofSalted(
      u: org.apache.spark.sql.DataFrame, blockNs: Long) = {
    val ub = u.withColumn("blk", expr(s"t_ns div $blockNs"))
    val w1 = Window.partitionBy(col("uid"), col("blk"))
      .orderBy(col("t_ns"), col("is_order"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBlock = ub
      .withColumn("blk_last", max(when(col("is_order") === 0, col("t_ns"))).over(w1))
      .withColumn("blk_prior", sum(when(col("is_order") === 0, 1L).otherwise(0L)).over(w1))
      .filter(col("is_order") === 1)
    // per-(uid, blk) summaries as CONDITIONAL aggregates over the union:
    // every populated block appears (so no separate block list + outer
    // join), and map-side partial aggregation means this branch re-scans
    // the inputs but shuffles only O(populated blocks) rows — the window
    // branch above carries the one unavoidable full-data exchange. Prefix
    // over STRICTLY earlier blocks via w2.
    val sums = ub.groupBy(col("uid"), col("blk"))
      .agg(
        max(when(col("is_order") === 0, col("t_ns"))).as("b_max"),
        sum(when(col("is_order") === 0, 1L).otherwise(0L)).as("b_n"))
    val w2 = Window.partitionBy(col("uid")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = sums
      .withColumn("prior_last", max(col("b_max")).over(w2))
      .withColumn("prior_n", coalesce(sum(col("b_n")).over(w2), lit(0L)))
      .select(col("uid"), col("blk"), col("prior_last"), col("prior_n"))
    inBlock.join(prior, Seq("uid", "blk"))
      .select(
        col("o_orderkey"),
        col("uid").as("o_custkey"),
        // greatest() skips nulls; both-null (no prior events at all) stays null
        greatest(col("blk_last"), col("prior_last")).as("last_event_ns"),
        (col("blk_prior") + col("prior_n")).as("n_prior"))
      .orderBy(col("o_orderkey"))
  }

  /** Quarter dimension shared by the Spark side and the SQL oracle of the
    * range join: [start, next) half-open epoch-second intervals, UTC.
    */
  private val quarters: Seq[(String, Long, Long)] = {
    def epoch(y: Int, m: Int): Long =
      java.time.LocalDate.of(y, m, 1).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    for {
      y <- 1995 to 1998
      q <- 1 to 4
    } yield {
      val m = (q - 1) * 3 + 1
      val next = if (q == 4) epoch(y + 1, 1) else epoch(y, m + 3)
      (s"${y}Q$q", epoch(y, m), next)
    }
  }

  private def quarterValuesSql: String =
    quarters.map { case (n, a, b) => s"('$n', $a, $b)" }.mkString(", ")

  val entries: Seq[Entry] = Seq(
    // q44: GROUPING SETS — the general form rollup/cube specialize; the two
    // requested sets share one shuffle via the expand operator.
    Entry(
      "q44_grouping_sets",
      (s, d) =>
        T.orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
            col("n"), col("total"))
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT coalesce(o_orderstatus,'ALL') AS o_orderstatus,
             | coalesce(o_orderpriority,'ALL') AS o_orderpriority,
             | count(*) AS n, round(sum(o_totalprice),2) AS total
             |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
             |ORDER BY 1, 2""".stripMargin)),

    // q45: FULL OUTER join — part sizes vs a filtered lineitem aggregate;
    // unmatched rows survive on both sides.
    Entry(
      "q45_full_outer_join",
      (s, d) => {
        val bigParts = T.part(s, d).filter(col("p_size") >= 45)
          .select(col("p_partkey"), col("p_size"))
        val heavyLines = T.lineitem(s, d)
          .filter(col("l_quantity") >= 45)
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_heavy"))
        bigParts.join(heavyLines, col("p_partkey") === col("l_partkey"), "full_outer")
          .select(
            coalesce(col("p_partkey"), col("l_partkey")).as("partkey"),
            col("p_size"), col("n_heavy"))
          .orderBy(col("partkey"))
      },
      Some("""WITH bp AS (SELECT p_partkey, p_size FROM part WHERE p_size >= 45),
             | hl AS (SELECT l_partkey, count(*) AS n_heavy FROM lineitem
             |        WHERE l_quantity >= 45 GROUP BY l_partkey)
             |SELECT coalesce(p_partkey, l_partkey) AS partkey, p_size, n_heavy
             |FROM bp FULL OUTER JOIN hl ON p_partkey = l_partkey
             |ORDER BY partkey""".stripMargin)),

    // q46: correlated aggregate subquery — orders above their own customer's
    // average. Decorrelated as an aggregate WINDOW over the correlation key:
    // ONE shuffle on o_custkey and no join/broadcast at all. (The earlier
    // broadcast-the-per-customer-agg form was a scale bug: that "dim" has
    // |customers| rows and grows with the corpus.)
    Entry(
      "q46_correlated_subquery",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
        T.orders(s, d)
          .withColumn("cavg", avg(col("o_totalprice")).over(w))
          .filter(col("o_totalprice") > col("cavg") * 1.5)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") / col("cavg"), 4).as("x_avg"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             | round(o_totalprice / (SELECT avg(i.o_totalprice) FROM orders i
             |                       WHERE i.o_custkey = o.o_custkey), 4) AS x_avg
             |FROM orders o
             |WHERE o_totalprice > 1.5 * (SELECT avg(i.o_totalprice) FROM orders i
             |                            WHERE i.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // q47: exact interpolated percentiles (Spark `percentile` == DuckDB
    // `quantile_cont`); the approximate sketch path is q52.
    Entry(
      "q47_percentiles",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
            round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             | round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
             | round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
             | round(quantile_cont(l_extendedprice, 0.75),4) AS p75,
             | round(quantile_cont(l_extendedprice, 0.99),4) AS p99
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q48: statistical aggregates — stddev/variance/correlation/covariance.
    Entry(
      "q48_stats_agg",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_linestatus"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_discount")), 6).as("var_disc"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"))
          .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
             | round(stddev_samp(l_quantity),4) AS sd_qty,
             | round(var_samp(l_discount),6) AS var_disc,
             | round(corr(l_quantity, l_extendedprice),4) AS corr_qp,
             | round(covar_samp(l_quantity, l_extendedprice),2) AS cov_qp
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // q49: positional explode (UDTF/generator shape) — token-position stats
    // over the first 5 positions of each document.
    Entry(
      "q49_posexplode_tokens",
      (s, d) =>
        T.documents(s, d)
          .select(posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .filter(col("pos") < 5 && col("tok") =!= "")
          .groupBy(col("pos").cast("long").as("pos"))
          .agg(count(lit(1)).as("n"), countDistinct(col("tok")).as("n_distinct"),
            min(col("tok")).as("first_tok"))
          .orderBy(col("pos")),
      Some("""WITH t AS (SELECT unnest(list_transform(string_split(text,' '),
             |   (tok, i) -> {'pos': i - 1, 'tok': tok}), recursive := true)
             | FROM documents)
             |SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n,
             | count(DISTINCT tok) AS n_distinct, min(tok) AS first_tok
             |FROM t WHERE pos < 5 AND tok <> '' GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q50: as-of join (union+window scale form; see asofJoin doc).
    Entry(
      "q50_asof_join",
      (s, d) => asofJoin(s, d),
      Some("""SELECT o_orderkey, o_custkey,
             | (SELECT max(epoch_ns(e.ts)) FROM events e
             |  WHERE e.user_id = o.o_custkey
             |    AND epoch_ns(e.ts) <= epoch_ns(o.o_orderdate)) AS last_event_ns,
             | (SELECT count(*) FROM events e
             |  WHERE e.user_id = o.o_custkey
             |    AND epoch_ns(e.ts) <= epoch_ns(o.o_orderdate)) AS n_prior
             |FROM orders o ORDER BY o_orderkey""".stripMargin)),

    // q80: the salted two-phase as-of join (see asofSalted doc) — the
    // skew-hardened form of q50 for hot users; same oracle, identical
    // result. 30-day blocks: the union's time axis spans years, so a normal
    // user touches a handful of populated blocks while a hot user's events
    // fan out over every reducer that owns one of their blocks.
    Entry(
      "q80_asof_salted",
      (s, d) => asofSalted(asofUnion(s, d), 30L * 24 * 3600 * 1000000000L),
      Some("""SELECT o_orderkey, o_custkey,
             | (SELECT max(epoch_ns(e.ts)) FROM events e
             |  WHERE e.user_id = o.o_custkey
             |    AND epoch_ns(e.ts) <= epoch_ns(o.o_orderdate)) AS last_event_ns,
             | (SELECT count(*) FROM events e
             |  WHERE e.user_id = o.o_custkey
             |    AND epoch_ns(e.ts) <= epoch_ns(o.o_orderdate)) AS n_prior
             |FROM orders o ORDER BY o_orderkey""".stripMargin)),

    // q51: range join — lineitems bucketed into calendar quarters. The
    // semantic contract is interval containment against the quarter dim
    // (that's what the oracle runs), but calendar quarters are disjoint and
    // computable per row, so the scale form BINS first (year/quarter integer
    // math on the date) and equi-joins the tiny broadcast dim on the bin
    // key: a BroadcastHashJoin that streams the fact side once, instead of
    // the BroadcastNestedLoopJoin a literal interval predicate plans. The
    // equi-join is exact because every day of a quarter satisfies that
    // quarter's [q_start, q_end) bounds and no other's.
    Entry(
      "q51_range_join",
      (s, d) => {
        val s2 = s
        import s2.implicits._
        val qdim = broadcast(quarters.map(_._1).toDF("quarter"))
        T.lineitem(s, d)
          .withColumn("quarter",
            concat(year(col("l_shipdate")).cast("string"), lit("Q"),
              quarter(col("l_shipdate")).cast("string")))
          .join(qdim, Seq("quarter"))
          .groupBy(col("quarter"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
          .orderBy(col("quarter"))
      },
      Some(s"""WITH qd(quarter, q_start, q_end) AS (VALUES $quarterValuesSql)
              |SELECT quarter, count(*) AS n,
              | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
              |FROM lineitem JOIN qd
              | ON epoch(l_shipdate) >= q_start AND epoch(l_shipdate) < q_end
              |GROUP BY quarter ORDER BY quarter""".stripMargin)),

    // q52: HLL approximate distinct next to the exact count. The sketch
    // estimate itself is engine-defined, so the query emits its own error
    // check (|approx−exact|/exact ≤ 0.15) as a boolean the DuckDB oracle
    // reproduces as literal TRUE — fully driver-checkable, and the exact
    // column stays data-derived. RelationalExtSuite bounds the raw error.
    Entry(
      "q52_approx_distinct",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_orderkey")).as("approx"),
            countDistinct(col("l_orderkey")).as("exact_orders"))
          .select(
            col("l_returnflag"),
            col("exact_orders"),
            (abs(col("approx") - col("exact_orders")) / col("exact_orders") <= 0.15)
              .as("within_bound"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             | count(DISTINCT l_orderkey) AS exact_orders,
             | TRUE AS within_bound
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q71: approximate percentile sketch next to the exact interpolated
    // percentile (q47 is the exact path). Sketch output is engine-defined →
    // the query emits its own relative-error check (approx within 5% of
    // exact at p50/p95) as booleans the oracle reproduces as literal TRUE,
    // exactly the q52 pattern. At 100 TB the sketch is the only viable
    // path: mergeable partial state vs a full sort per group.
    Entry(
      "q71_approx_quantiles",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_extendedprice, 0.5)").as("ex50"),
            expr("percentile(l_extendedprice, 0.95)").as("ex95"),
            expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
            expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("ap95"))
          .select(
            col("l_returnflag"),
            round(col("ex50"), 4).as("p50_exact"),
            round(col("ex95"), 4).as("p95_exact"),
            (abs(col("ap50") - col("ex50")) / col("ex50") <= 0.05).as("p50_ok"),
            (abs(col("ap95") - col("ex95")) / col("ex95") <= 0.05).as("p95_ok"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             | round(quantile_cont(l_extendedprice, 0.5),4) AS p50_exact,
             | round(quantile_cont(l_extendedprice, 0.95),4) AS p95_exact,
             | TRUE AS p50_ok, TRUE AS p95_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q53: skew-salted aggregation — two-level agg keyed by (key, salt) then
    // key, so one hot key fans out over `nSalts` reducers before the final
    // |keys|-row combine. Result identical to the direct group-by (oracle).
    Entry(
      "q53_salted_skew_agg",
      (s, d) => {
        val nSalts = 8
        T.lineitem(s, d)
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .withColumn("salt", pmod(hash(col("l_orderkey")), lit(nSalts)))
          .groupBy(col("o_orderpriority"), col("salt"))
          .agg(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_part"),
            count(lit(1)).as("n_part"))
          .groupBy(col("o_orderpriority"))
          .agg(round(sum(col("rev_part")), 2).as("revenue"), sum(col("n_part")).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
             | count(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // q140: LATERAL correlated subquery with ORDER BY + LIMIT — top-2
    // orders per customer, written the way a SQL user writes it and left
    // to CATALYST'S DECORRELATION: the optimizer rewrites the per-row
    // correlated limit into rank windows compiled to WindowGroupLimit
    // (group-local top-k, no per-customer re-execution, no cartesian) and
    // joins back on the correlation key — the executed plan is the same
    // shape a hand-written q07/q120 window would produce, which is
    // precisely what makes LATERAL safe at scale here. The only spark.sql
    // entry in the registry: the surface under test IS the SQL front-end's
    // lateral decorrelation. Oracle: DuckDB's native LATERAL, verbatim.
    Entry(
      "q140_lateral_topk",
      (s, d) => {
        T.customer(s, d).createOrReplaceTempView("graft_lateral_customer")
        T.orders(s, d).createOrReplaceTempView("graft_lateral_orders")
        s.sql("""
          SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          FROM graft_lateral_customer c,
          LATERAL (SELECT o_orderkey, o_totalprice FROM graft_lateral_orders
                   WHERE o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             |         WHERE o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)),

    // q168: JOIN-EXPLOSION DIAGNOSTIC — the pre-flight the optimizer (and
    // the on-call engineer) wants BEFORE running a many-to-many join:
    // |A ⋈ B| = Σ_k cA(k)·cB(k) computed from the two per-key COUNT
    // tables, never from the join itself — at 100 TB this turns "will the
    // customer-order join blow up" into two aggregation passes plus a
    // key-cardinality-sized join of count tables (each side collapses
    // map-side; the fact table never meets the other fact table). Output:
    // the top-5 keys by output contribution (TakeOrderedAndProject —
    // which keys to salt), each with its exact pair count and ppm share,
    // plus the total join size and matched-key count broadcast onto every
    // row. All integer: pair products bounded by cA·cB per key (≪ 2^63
    // until a single key pairs 9·10¹⁸ rows — at which point the answer
    // "don't run this join" is already loud).
    Entry(
      "q168_join_explosion",
      (s, d) => {
        val ca = Tables.customer(s, d)
          .groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("ca"))
        val cb = Tables.supplier(s, d)
          .groupBy(col("s_nationkey").as("k")).agg(count(lit(1)).as("cb"))
        val pairs = ca.join(cb, Seq("k"))
          .select(col("k"), col("ca"), col("cb"), (col("ca") * col("cb")).as("pairs"))
        val totals = pairs.agg(
          sum(col("pairs")).as("total_pairs"),
          count(lit(1)).as("n_matched_keys"))
        pairs
          .crossJoin(broadcast(totals))
          .select(
            col("k"), col("ca"), col("cb"), col("pairs"),
            expr("pairs * 1000000L div total_pairs").as("share_ppm"),
            col("total_pairs"), col("n_matched_keys"))
          .orderBy(col("pairs").desc, col("k"))
          .limit(5)
      },
      Some("""WITH a AS (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS ca
             |  FROM customer GROUP BY 1),
             |b AS (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS cb
             |  FROM supplier GROUP BY 1),
             |p AS (SELECT k, ca, cb, ca * cb AS pairs FROM a JOIN b USING (k)),
             |t AS (SELECT CAST(sum(pairs) AS BIGINT) AS total_pairs,
             |    CAST(count(*) AS BIGINT) AS n_matched_keys FROM p)
             |SELECT k, ca, cb, pairs, pairs * 1000000 // total_pairs AS share_ppm,
             |  total_pairs, n_matched_keys
             |FROM p CROSS JOIN t
             |ORDER BY pairs DESC, k LIMIT 5""".stripMargin)),

    // q185: MARKET-BASKET CO-OCCURRENCE — the association-rule classic
    // ("bought X, also bought Y"): part pairs co-occurring in an order,
    // scored by LIFT = P(X,Y)/(P(X)·P(Y)) over order baskets, min
    // support 3 (the synthetic baskets are near-uniform over a large part
    // catalog, so absolute co-occurrence is sparse — production sets this
    // as a relative support). Scale shape: the pair explosion is the per-basket
    // self-join ON THE BASKET KEY — both sides partition on l_orderkey,
    // so after ONE exchange the join is co-located and the blowup is
    // Σ C(basket,2), bounded by basket size (~7 for TPC-H), never
    // |items|²; per-item supports come from the same distinct
    // (order, part) table, and the basket count is a 1-row broadcast
    // agg. Lift ranks on exact-long-to-double compositions (the q175
    // overflow argument verbatim: support(xy)·n vs s(x)·s(y) cross-
    // multiplied would pass 2^63 at warehouse scale); top-20 heap with
    // pair tie-break.
    Entry(
      "q185_market_basket",
      (s, d) => {
        // One-materialization idiom: the distinct (order, part) table has
        // THREE static consumers (both self-join sides + the support agg);
        // without a barrier the static plan scanned lineitem 10× with zero
        // ReusedExchange (r13 judge audit) and relied on AQE stage-reuse.
        // localCheckpoint materializes it once; pinned in RelationalExtSuite
        // (≤2 parquet scans in the executed plan: orders count + nothing
        // past the barrier).
        val items = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint()
        val nOrders = Tables.orders(s, d).agg(count(lit(1)).as("n"))
        val supp = items.groupBy(col("pk")).agg(count(lit(1)).as("s"))
        val pairs = items.as("a")
          .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
          .agg(count(lit(1)).as("sxy"))
          .filter(col("sxy") >= 3)
        pairs
          .join(supp.select(col("pk").as("x"), col("s").as("sx")), Seq("x"))
          .join(supp.select(col("pk").as("y"), col("s").as("sy")), Seq("y"))
          .crossJoin(broadcast(nOrders))
          .withColumn(
            "lift",
            (col("sxy").cast("double") * col("n").cast("double"))
              / (col("sx").cast("double") * col("sy").cast("double")))
          .select(col("x"), col("y"), col("sxy"), col("sx"), col("sy"), col("lift"))
          .orderBy(col("lift").desc, col("x"), col("y"))
          .limit(20)
      },
      Some("""WITH i AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             |  FROM lineitem),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
             |s AS (SELECT pk, CAST(count(*) AS BIGINT) AS s FROM i GROUP BY 1),
             |p AS (SELECT a.pk AS x, b.pk AS y, CAST(count(*) AS BIGINT) AS sxy
             |  FROM i a JOIN i b ON a.ok = b.ok AND a.pk < b.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT x, y, sxy, sa.s AS sx, sb.s AS sy,
             |  (CAST(sxy AS DOUBLE) * CAST(n.n AS DOUBLE))
             |    / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)) AS lift
             |FROM p JOIN s sa ON p.x = sa.pk JOIN s sb ON p.y = sb.pk
             |  CROSS JOIN n
             |ORDER BY lift DESC, x, y LIMIT 20""".stripMargin))
  )
}
