package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Entry
import graft.{Tables => T}

/** Nonparametric two-sample drift tests — the statistically-grounded tier
  * of the drift-monitor family (q151 KL, q224 TVD, q227 QQ): the same
  * "did this slice stop looking like the corpus" question, answered with a
  * DISTRIBUTION-FREE test statistic and a significance threshold instead
  * of an unanchored distance. Both operators follow the q224 count-table
  * discipline: the corpus collapses through ONE (group, value) aggregation
  * exchange; every window runs over VALUE-DOMAIN-bounded partitions (the
  * distinct-value axis — fixed by the value domain, independent of corpus
  * row count); all test statistics are exact int64 cross-multiplication
  * arithmetic, so the cross-engine comparison is bit-exact. The only IEEE
  * ops are the final critical-value / z-score scalars, computed from exact
  * longs with identically-parenthesized expressions in both engines.
  *
  * Reference scope (JasperWoo/MapReduceCore): the reference ships no
  * statistics verbs — these are the acceptance checks its users run over
  * engine OUTPUT shards before promoting a corpus build; made first-class
  * here (same posture as the Integrity family, Integrity.scala:16-19).
  */
object StatTests {

  val entries: Seq[Entry] = Seq(

    // q231: KOLMOGOROV-SMIRNOV DRIFT AUDIT — for every source, the KS
    // statistic D = sup_v |F_src(v) − F_rest(v)| between the source's
    // doc-length distribution and the REST of the corpus (complement, not
    // the marginal — comparing a slice against a mixture containing
    // itself dilutes exactly the drift being measured), plus the location
    // ks_at where the gap peaks (the actionable part: WHERE the
    // distributions diverge) and the α=0.05 two-sample critical value
    // c(α)·sqrt(N/(n1·n2)), c(0.05)=1.358 (Smirnov's asymptotic form) —
    // so the output is a DECISION per source, scale-aware: the same D
    // that damns a 10⁶-doc source is noise for a 10²-doc one (the flaw of
    // raw-distance rankings like q224's, which this operator complements).
    // Integer-exact: with cum1 = n_src-docs ≤ v and cum2 = rest-docs ≤ v,
    // D·n1·n2 = max_v |cum1·n2 − cum2·n1| — pure int64 (≤ N² ≈ 2.5·10⁷ at
    // sf0.1; Decimal(38) past ~3·10⁹ docs), d_ppm by integer div. Plan:
    // ONE corpus-sized stage (the (source, n_chars) count exchange,
    // map-side partial); the marginal/totals are rollups OF that table;
    // cells = |sources|×|distinct lengths| (value-domain bounded) with
    // per-source windows over the value axis; the argmax location is a
    // max-then-match over the checkpointed cells table, never a sort.
    Entry(
      "q231_ks_drift",
      (s, d) => {
        val sb = T.documents(s, d)
          .select(col("source"), col("n_chars").as("v"))
          .groupBy(col("source"), col("v"))
          .agg(count(lit(1)).as("n_i"))
          .localCheckpoint() // consumers: marginal, totals, grand total, cells
        val marg = sb.groupBy(col("v")).agg(sum(col("n_i")).as("m_i"))
        val totals = sb.groupBy(col("source")).agg(sum(col("n_i")).as("n1"))
        val bigN = sb.agg(sum(col("n_i")).as("nn"))
        val w = Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cells = totals.crossJoin(broadcast(marg))
          .join(sb, Seq("source", "v"), "left")
          .withColumn("n_i", coalesce(col("n_i"), lit(0L)))
          .crossJoin(broadcast(bigN))
          .withColumn("cum1", sum(col("n_i")).over(w))
          .withColumn("cumt", sum(col("m_i")).over(w))
          .withColumn("dnum",
            abs(col("cum1") * (col("nn") - col("n1")) -
              (col("cumt") - col("cum1")) * col("n1")))
          .localCheckpoint() // consumers: per-source max + argmax location
        val mx = cells.groupBy(col("source"), col("n1"), col("nn"))
          .agg(max(col("dnum")).as("mx"))
        mx.join(cells.select(col("source"), col("v"), col("dnum")), Seq("source"))
          .filter(col("dnum") === col("mx"))
          .groupBy(col("source"), col("n1"), col("nn"), col("mx"))
          .agg(min(col("v")).as("ks_at"))
          .select(col("source"), col("n1").as("n_src"),
            expr("mx * 1000000L div (n1 * (nn - n1))").as("d_ppm"),
            col("ks_at"),
            expr("CAST(round(1358000.0 * sqrt(CAST(nn AS DOUBLE) / " +
              "(CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE)))) AS BIGINT)")
              .as("crit_ppm"))
          .withColumn("drifted", col("d_ppm") > col("crit_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH sb AS (SELECT source, n_chars AS v,
             |    CAST(count(*) AS BIGINT) AS n_i
             |  FROM documents GROUP BY 1, 2),
             |marg AS (SELECT v, CAST(sum(n_i) AS BIGINT) AS m_i
             |  FROM sb GROUP BY 1),
             |tot AS (SELECT source, CAST(sum(n_i) AS BIGINT) AS n1
             |  FROM sb GROUP BY 1),
             |bign AS (SELECT CAST(sum(n_i) AS BIGINT) AS nn FROM sb),
             |cells AS (SELECT t.source, t.n1, b.nn, m.v, m.m_i,
             |    CAST(coalesce(sb.n_i, 0) AS BIGINT) AS n_i
             |  FROM tot t CROSS JOIN marg m CROSS JOIN bign b
             |  LEFT JOIN sb ON sb.source = t.source AND sb.v = m.v),
             |cum AS MATERIALIZED (SELECT source, n1, nn, v,
             |    abs(sum(n_i) OVER w * (nn - n1)
             |      - (sum(m_i) OVER w - sum(n_i) OVER w) * n1) AS dnum
             |  FROM cells WINDOW w AS (PARTITION BY source ORDER BY v
             |    ROWS UNBOUNDED PRECEDING)),
             |mx AS (SELECT source, n1, nn, max(dnum) AS mx
             |  FROM cum GROUP BY 1, 2, 3),
             |sel AS (SELECT mx.source, mx.n1 AS n_src,
             |    mx.mx * 1000000 // (mx.n1 * (mx.nn - mx.n1)) AS d_ppm,
             |    CAST(min(cum.v) AS BIGINT) AS ks_at,
             |    CAST(round(1358000.0 * sqrt(CAST(mx.nn AS DOUBLE) /
             |      (CAST(mx.n1 AS DOUBLE) * CAST(mx.nn - mx.n1 AS DOUBLE))))
             |      AS BIGINT) AS crit_ppm
             |  FROM mx JOIN cum ON cum.source = mx.source AND cum.dnum = mx.mx
             |  GROUP BY 1, 2, 3, 5)
             |SELECT source, n_src, d_ppm, ks_at, crit_ppm,
             |  d_ppm > crit_ppm AS drifted
             |FROM sel ORDER BY source""".stripMargin)),

    // q232: PAIRWISE MANN-WHITNEY U DRIFT MATRIX — rank-sum comparison of
    // the event `value` distribution between every pair of event types:
    // "does type A systematically pay/score higher than type B", the
    // median-shift question KS's sup-gap doesn't answer. Rank-free
    // formulation (the part that scales): U never touches per-row ranks —
    // over the (type, value) COUNT table, 2·U₁ = Σ_v c1(v)·(2·cum2(<v) +
    // c2(v)), counting wins twice and ties once, exact int64 (≤ 2·n1·n2 ≈
    // 8·10⁸ at sf0.1). A per-row rank assignment would be a corpus-sized
    // global sort; this is a value-axis window over bounded partitions.
    // Tie correction Σ(t³−t) the same way. The normal-approximation
    // z = (U₁ − n1n2/2)/σ_tie is the one IEEE computation, from exact
    // longs, identically parenthesized in both engines, rounded 6dp.
    // Plan: ONE (type, cents) count exchange (map-side partial; the value
    // domain is fixed at any corpus size, so the count table is bounded);
    // the 10-pair × value-grid cells table takes two broadcast-sized
    // joins; windows partition per pair. Nothing corpus-sized moves after
    // the first exchange.
    Entry(
      "q232_mwu_matrix",
      (s, d) => {
        val ct = T.events(s, d)
          .select(col("event_type").as("g"),
            round(col("value") * 100).cast("long").as("v"))
          .groupBy(col("g"), col("v"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // consumers: type list, value grid, two cell joins
        val types = ct.select(col("g")).distinct()
        val pairs = types.select(col("g").as("ga"))
          .crossJoin(types.select(col("g").as("gb")))
          .filter(col("ga") < col("gb"))
        val vals = ct.select(col("v")).distinct()
        val cells = vals.crossJoin(broadcast(pairs))
          .join(ct.select(col("g").as("ga"), col("v"), col("c").as("c1")),
            Seq("ga", "v"), "left")
          .join(ct.select(col("g").as("gb"), col("v"), col("c").as("c2")),
            Seq("gb", "v"), "left")
          .select(col("ga"), col("gb"), col("v"),
            coalesce(col("c1"), lit(0L)).as("c1"),
            coalesce(col("c2"), lit(0L)).as("c2"))
        val wp = Window.partitionBy(col("ga"), col("gb")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val sc = cells
          .withColumn("cum2prev", coalesce(sum(col("c2")).over(wp), lit(0L)))
        val t = col("c1") + col("c2")
        sc.groupBy(col("ga"), col("gb"))
          .agg(
            sum(col("c1")).as("n1"),
            sum(col("c2")).as("n2"),
            sum(col("c1") * (col("cum2prev") * 2 + col("c2"))).as("u2"),
            sum(t * t * t - t).as("t3t"))
          .select(col("ga").as("type_a"), col("gb").as("type_b"),
            col("n1").as("n_a"), col("n2").as("n_b"),
            col("u2"), col("t3t"),
            round(
              (col("u2") - col("n1") * col("n2")).cast("double") /
                (lit(2.0) * sqrt(
                  (col("n1").cast("double") * col("n2").cast("double") / 12.0) *
                    ((col("n1") + col("n2") + 1).cast("double") -
                      col("t3t").cast("double") /
                        ((col("n1") + col("n2")).cast("double") *
                          (col("n1") + col("n2") - 1).cast("double"))))),
              6).as("z"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH e AS (SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
             |ct AS MATERIALIZED (SELECT g, v, CAST(count(*) AS BIGINT) AS c
             |  FROM e GROUP BY 1, 2),
             |ty AS (SELECT DISTINCT g FROM ct),
             |pr AS (SELECT a.g AS ga, b.g AS gb
             |  FROM ty a CROSS JOIN ty b WHERE a.g < b.g),
             |vals AS (SELECT DISTINCT v FROM ct),
             |cells AS (SELECT pr.ga, pr.gb, vals.v,
             |    CAST(coalesce(a.c, 0) AS BIGINT) AS c1,
             |    CAST(coalesce(b.c, 0) AS BIGINT) AS c2
             |  FROM pr CROSS JOIN vals
             |  LEFT JOIN ct a ON a.g = pr.ga AND a.v = vals.v
             |  LEFT JOIN ct b ON b.g = pr.gb AND b.v = vals.v),
             |sc AS (SELECT ga, gb, c1, c2,
             |    CAST(coalesce(sum(c2) OVER (PARTITION BY ga, gb ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cum2prev
             |  FROM cells),
             |ag AS (SELECT ga, gb,
             |    CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c2) AS BIGINT) AS n2,
             |    CAST(sum(c1 * (cum2prev * 2 + c2)) AS BIGINT) AS u2,
             |    CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
             |      AS BIGINT) AS t3t
             |  FROM sc GROUP BY 1, 2)
             |SELECT ga AS type_a, gb AS type_b, n1 AS n_a, n2 AS n_b, u2, t3t,
             |  round(CAST(u2 - n1 * n2 AS DOUBLE) /
             |    (2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0) *
             |      (CAST(n1 + n2 + 1 AS DOUBLE) -
             |        CAST(t3t AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) *
             |          CAST(n1 + n2 - 1 AS DOUBLE))))), 6) AS z
             |FROM ag ORDER BY type_a, type_b""".stripMargin)),

    // q235: K-ANONYMITY / L-DIVERSITY AUDIT + ONE GENERALIZATION STEP —
    // the privacy gate a corpus must pass before publication: under
    // quasi-identifiers (lang, 200-char length bucket), every equivalence
    // class must hold ≥ k=5 rows (k-anonymity: no row is re-identifiable
    // by its QI combination) and ≥ l=3 distinct values of the sensitive
    // attribute (source — l-diversity: a class whose rows all share one
    // sensitive value leaks it even at size ≥ k). Beside each class the
    // audit emits the SAME check after one generalization-ladder step
    // (bucket → bucket div 2, the standard Samarati/Sweeney coarsening) —
    // the actionable output: does the cheapest generalization already
    // repair the failing classes? Plan: the corpus collapses through ONE
    // (lang, bucket) exchange (map-side partial count + distinct-source
    // expand); the generalized level is a rollup OF the class table
    // (never a second scan); everything downstream is QI-domain-bounded.
    // All-integer compares, exact cross-engine.
    Entry(
      "q235_k_anonymity",
      (s, d) => {
        val cls = T.documents(s, d)
          .select(col("lang"), expr("n_chars div 200").as("bucket"),
            col("source"))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("class_size"),
            countDistinct(col("source")).as("n_sens"))
          .localCheckpoint() // consumers: audit rows + generalized rollup
        val gen = cls
          .groupBy(col("lang"), expr("bucket div 2").as("gb"))
          .agg(sum(col("class_size")).as("size_after_gen"))
        cls.withColumn("gb", expr("bucket div 2"))
          .join(broadcast(gen), Seq("lang", "gb"))
          .select(col("lang"), col("bucket"), col("class_size"), col("n_sens"),
            (col("class_size") >= 5).as("k_ok"),
            (col("n_sens") >= 3).as("l_ok"),
            col("size_after_gen"),
            (col("size_after_gen") >= 5).as("k_ok_after"))
          .orderBy(col("lang"), col("bucket"))
      },
      Some("""WITH cls AS MATERIALIZED (SELECT lang, n_chars // 200 AS bucket,
             |    CAST(count(*) AS BIGINT) AS class_size,
             |    CAST(count(DISTINCT source) AS BIGINT) AS n_sens
             |  FROM documents GROUP BY 1, 2),
             |gen AS (SELECT lang, bucket // 2 AS gb,
             |    CAST(sum(class_size) AS BIGINT) AS size_after_gen
             |  FROM cls GROUP BY 1, 2)
             |SELECT cls.lang, cls.bucket, cls.class_size, cls.n_sens,
             |  cls.class_size >= 5 AS k_ok,
             |  cls.n_sens >= 3 AS l_ok,
             |  gen.size_after_gen,
             |  gen.size_after_gen >= 5 AS k_ok_after
             |FROM cls JOIN gen
             |  ON gen.lang = cls.lang AND gen.gb = cls.bucket // 2
             |ORDER BY cls.lang, cls.bucket""".stripMargin))
  )
}
