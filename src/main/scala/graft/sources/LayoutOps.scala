package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.Tables
import graft.queries.Entry

/** Storage-layout operators, continued (Sources.scala hosts Z-order q101,
  * zone maps q249, compaction q75/q242): the HILBERT curve — the
  * clustering order production lakehouses are moving to (Databricks
  * liquid clustering) because, unlike Morton/Z-order, CONSECUTIVE curve
  * positions are always grid-ADJACENT (no diagonal jumps across the key
  * space), so files cut from curve ranges have strictly tighter bounding
  * boxes ⇒ tighter zone maps ⇒ more skipping.
  *
  * The curve is the classic per-level reflect+rotate recurrence unrolled
  * over the 6 bit levels of a 64×64 quantized grid — all integer bit
  * math, identical expression text both engines (Spark `^` = DuckDB
  * `xor`), and the suite proves the two defining properties from first
  * principles: the 4096-cell map is a BIJECTION, and every consecutive
  * pair of curve positions is grid-adjacent (the property Z-order lacks
  * and the reason the bbox metric below must win).
  */
object LayoutOps {

  /** One unrolled Hilbert level: d-contribution then the quadrant
    * reflect/rotate, expressed value-wise (the pre-swap complement folded
    * into the CASE arms — suite-proven equal to the textbook mutate+swap).
    */
  private def hilbertStep(df: DataFrame, s0: Long): DataFrame =
    df
      .withColumn("rx", expr(s"CAST((hx & $s0) > 0 AS BIGINT)"))
      .withColumn("ry", expr(s"CAST((hy & $s0) > 0 AS BIGINT)"))
      .withColumn("hd", expr(s"hd + ${s0 * s0}L * ((3L * rx) ^ ry)"))
      .withColumn("nx", expr("IF(ry = 1L, hx, IF(rx = 1L, 63L - hy, hy))"))
      .withColumn("ny", expr("IF(ry = 1L, hy, IF(rx = 1L, 63L - hx, hx))"))
      .withColumn("hx", col("nx")).withColumn("hy", col("ny"))
      .drop("rx", "ry", "nx", "ny")

  /** Hilbert position `hd` ∈ [0, 4096) for quantized coords in columns
    * (xc, yc) ∈ [0, 64)². Shared by the registered query and the suite's
    * first-principles property tests.
    */
  private[graft] def hilbertCode(
      df: DataFrame, xc: String, yc: String): DataFrame =
    Seq(32L, 16L, 8L, 4L, 2L, 1L)
      .foldLeft(df.withColumn("hx", col(xc)).withColumn("hy", col(yc))
        .withColumn("hd", lit(0L)))(hilbertStep)
      .drop("hx", "hy")

  /** q101's 6-bit Morton spread, for the in-query comparison. */
  private def spread6(in: Column): Column = {
    val s1 = in.bitwiseOR(shiftleft(in, 4)).bitwiseAND(lit(3855L))
    val s2 = s1.bitwiseOR(shiftleft(s1, 2)).bitwiseAND(lit(13107L))
    s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(21845L))
  }

  /** The 6 unrolled Hilbert levels as oracle CTE layers h1..h6 over h0.
    * The rotated coordinates get DISTINCT names (nhx/nhy/nhd) inside each
    * layer and are renamed back in an outer select (r18 advice: aliasing
    * the new value back to hx while the same SELECT's other expressions
    * reference hx relied on the engine resolving those to the FROM
    * columns rather than the lateral aliases — true in DuckDB today, but
    * an alias-shadowing edge no longer worth depending on).
    */
  private def hilbertSqlLayers: String =
    Seq(32, 16, 8, 4, 2, 1).zipWithIndex.map { case (s0, i) =>
      s"""h${i + 1} AS (SELECT a, b, ma, mb, qa, qb,
         |    nhx AS hx, nhy AS hy, nhd AS hd
         |  FROM (SELECT a, b, ma, mb, qa, qb,
         |    CASE WHEN (hy & $s0) > 0 THEN hx
         |      WHEN (hx & $s0) > 0 THEN 63 - hy ELSE hy END AS nhx,
         |    CASE WHEN (hy & $s0) > 0 THEN hy
         |      WHEN (hx & $s0) > 0 THEN 63 - hx ELSE hx END AS nhy,
         |    hd + ${s0 * s0} * xor(
         |      3 * (CASE WHEN (hx & $s0) > 0 THEN 1 ELSE 0 END),
         |      CASE WHEN (hy & $s0) > 0 THEN 1 ELSE 0 END) AS nhd
         |  FROM h$i))""".stripMargin
    }.mkString(",\n")

  val entries: Seq[Entry] = Seq(

    // q324: HILBERT vs Z-ORDER vs LINEAR LAYOUT — the q101 pruning
    // experiment extended with the locality metric that separates the two
    // curves: Σ per-file bounding-box AREA (exact integer; what zone maps
    // carry, and what decides every future box predicate, not just one).
    // File size is 24 curve positions — deliberately NOT a power of 4:
    // at power-of-4 chunk sizes both curves partition the grid into the
    // SAME aligned 4×4 blocks (measured: identical bbox_area at div 16)
    // because each visits every aligned sub-square completely before
    // leaving; real files sized by bytes never align, and there Morton's
    // diagonal jumps cost ~2× bbox area (624 k vs 317 k at sf0.001) while
    // Hilbert chunks stay edge-connected. 171 files per layout; the
    // centered 10%×10% box pruning stats ride along. Plan: one scan, the
    // 3× stack amplification paid before one bounded (layout, file)
    // exchange (≤ 513 groups), 1-row maxima broadcast.
    Entry(
      "q324_hilbert_layout",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("a"), col("l_partkey").as("b"))
        val mx = li.agg(max(col("a")).as("ma"), max(col("b")).as("mb"))
        val coded = hilbertCode(
          li.crossJoin(broadcast(mx))
            .withColumn("qa", expr("(a * 64) div (ma + 1)"))
            .withColumn("qb", expr("(b * 64) div (mb + 1)")),
          "qa", "qb")
          .withColumn("mcode",
            spread6(col("qa")).bitwiseOR(shiftleft(spread6(col("qb")), 1)))
          .withColumn("f_h", expr("hd div 24"))
          .withColumn("f_m", expr("mcode div 24"))
          .withColumn("f_l", expr("(a * 171) div (ma + 1)"))
        val stats = coded
          .select(col("a"), col("b"), col("ma"), col("mb"),
            expr("stack(3, 'hilbert', f_h, 'morton', f_m, 'linear', f_l)" +
              " AS (layout, f)"))
          .groupBy(col("layout"), col("f"))
          .agg(min(col("a")).as("mina"), max(col("a")).as("maxa"),
            min(col("b")).as("minb"), max(col("b")).as("maxb"),
            count(lit(1)).as("cnt"),
            max(col("ma")).as("ma"), max(col("mb")).as("mb"))
        val pruned = expr("maxa < (ma + 1) * 45 div 100") ||
          expr("mina > (ma + 1) * 55 div 100") ||
          expr("maxb < (mb + 1) * 45 div 100") ||
          expr("minb > (mb + 1) * 55 div 100")
        stats.groupBy(col("layout"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("cnt")).cast("long").as("n_rows"),
            sum(expr("(maxa - mina + 1L) * (maxb - minb + 1L)"))
              .as("bbox_area"),
            sum(when(pruned, 1L).otherwise(0L)).as("n_pruned_files"),
            sum(when(pruned, col("cnt")).otherwise(0L)).as("n_pruned_rows"))
          .orderBy(col("layout"))
      },
      Some(s"""WITH li AS (SELECT l_orderkey AS a, l_partkey AS b
             |    FROM lineitem),
             |mx AS (SELECT max(a) AS ma, max(b) AS mb FROM li),
             |h0 AS (SELECT a, b, ma, mb,
             |    (a * 64) // (ma + 1) AS qa, (b * 64) // (mb + 1) AS qb,
             |    (a * 64) // (ma + 1) AS hx, (b * 64) // (mb + 1) AS hy,
             |    0 AS hd FROM li, mx),
             |$hilbertSqlLayers,
             |s1 AS (SELECT *, (qa | (qa << 4)) & 3855 AS xa1,
             |    (qb | (qb << 4)) & 3855 AS xb1 FROM h6),
             |s2 AS (SELECT *, (xa1 | (xa1 << 2)) & 13107 AS xa2,
             |    (xb1 | (xb1 << 2)) & 13107 AS xb2 FROM s1),
             |s3 AS (SELECT *, (xa2 | (xa2 << 1)) & 21845 AS xa3,
             |    (xb2 | (xb2 << 1)) & 21845 AS xb3 FROM s2),
             |m AS (SELECT a, b, ma, mb, hd // 24 AS fh,
             |    (xa3 | (xb3 << 1)) // 24 AS fm,
             |    (a * 171) // (ma + 1) AS fl FROM s3),
             |u AS (SELECT 'hilbert' AS layout, fh AS f, a, b, ma, mb FROM m
             |  UNION ALL SELECT 'morton', fm, a, b, ma, mb FROM m
             |  UNION ALL SELECT 'linear', fl, a, b, ma, mb FROM m),
             |st AS (SELECT layout, f, min(a) AS mina, max(a) AS maxa,
             |    min(b) AS minb, max(b) AS maxb, count(*) AS cnt,
             |    max(ma) AS ma, max(mb) AS mb FROM u GROUP BY 1, 2),
             |pr AS (SELECT layout, cnt,
             |    (maxa - mina + 1) * (maxb - minb + 1) AS area,
             |    (maxa < (ma + 1) * 45 // 100 OR mina > (ma + 1) * 55 // 100
             |     OR maxb < (mb + 1) * 45 // 100
             |     OR minb > (mb + 1) * 55 // 100) AS pruned FROM st)
             |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
             |  CAST(sum(cnt) AS BIGINT) AS n_rows,
             |  CAST(sum(area) AS BIGINT) AS bbox_area,
             |  CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_pruned_files,
             |  CAST(sum(CASE WHEN pruned THEN cnt ELSE 0 END) AS BIGINT)
             |    AS n_pruned_rows
             |FROM pr GROUP BY layout ORDER BY layout""".stripMargin))
  )
}
