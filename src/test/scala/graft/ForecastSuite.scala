package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Time-series family (q237 ACF, q238 CUSUM, q239 Holt): every statistic is
  * replayed sequentially on the collected spine-filled series — the
  * distributed formulation must reproduce the textbook sequential one.
  */
class ForecastSuite extends SparkTestBase {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val DayNs = 24L * 3600 * 1000 * 1000 * 1000

  private def hourlySeries(): Array[Long] = {
    val by = Tables.events(spark, sf)
      .select(expr(s"ts div $HourNs"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (h, xs) => (h, xs.map(_._2).sum / 100) }
    (by.keys.min to by.keys.max).map(by.getOrElse(_, 0L)).toArray
  }

  test("q237 ACF: every lag ties to a brute Pearson over the spine series") {
    val rows = Registry.byName("q237_acf").q(spark, sf).collect()
    assert(rows.length == 24)
    val xs = hourlySeries()
    for (r <- rows) {
      val k = r.getLong(0).toInt
      val pairs = (k until xs.length).map(i => (xs(i), xs(i - k)))
      val n = pairs.length.toLong
      assert(r.getLong(1) == n, s"lag $k n_pairs")
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      assert(r.getLong(2) == n * sxy - sx * sy, s"lag $k exact numerator")
      val acf = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      assert(math.abs(r.getDouble(3) - acf) < 6e-7, s"lag $k acf value")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }

  test("q238 CUSUM: changepoint and means tie to a brute max-deviation sweep") {
    val r = Registry.byName("q238_cusum").q(spark, sf).collect().head
    val by = Tables.events(spark, sf)
      .select(expr(s"ts div $DayNs"), round(col("value") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
    val d0 = by.keys.min
    val xs = (d0 to by.keys.max).map(by.getOrElse(_, 0L)).toArray
    val n = xs.length.toLong
    val tt = xs.sum
    val prefixes = xs.scanLeft(0L)(_ + _).drop(1)
    val scores = prefixes.zipWithIndex.init // t = 1..n-1
      .map { case (p, i) => (i + 1L, p, math.abs(n * p - (i + 1L) * tt)) }
    val smax = scores.map(_._3).max
    val (tcp, pcp, _) = scores.filter(_._3 == smax).minBy(_._1)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == d0 + tcp - 1, "changepoint day")
    assert(r.getLong(2) == smax, "max scaled deviation")
    assert(r.getLong(3) == pcp * 1000000L / tcp, "mean before")
    assert(r.getLong(4) == (tt - pcp) * 1000000L / (n - tcp), "mean after")
    assert(r.getLong(5) == r.getLong(4) - r.getLong(3))
  }

  test("q239 Holt: level/trend/MAE equal the sequential textbook recurrence") {
    val rows = Registry.byName("q239_holt_linear").q(spark, sf).collect()
    assert(rows.length == 5)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr(s"ts div $DayNs"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (r <- rows) {
      val mine = ev.filter(_._1 == r.getString(0))
      val by = mine.groupBy(_._2).map { case (d, xs) => (d, xs.map(_._3).sum) }
      val xs = (by.keys.min to by.keys.max)
        .map(by.getOrElse(_, 0L) / 100.0).toArray
      assert(r.getLong(1) == xs.length.toLong)
      var (l, b) = (xs(0), 0.0)
      for (x <- xs.slice(1, xs.length - 7)) {
        val l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.25 * (l2 - l) + 0.75 * b
        l = l2
      }
      val mae = (1 to 7).map(h => math.abs(l + h * b - xs(xs.length - 8 + h))).sum / 7.0
      assert(math.abs(r.getDouble(2) - l) < 6e-7, s"${r.getString(0)} level")
      assert(math.abs(r.getDouble(3) - b) < 6e-7, s"${r.getString(0)} trend")
      assert(math.abs(r.getDouble(4) - mae) < 6e-5, s"${r.getString(0)} mae")
    }
  }

  test("q244 Holt-Winters: state and both MAEs equal the sequential recurrence") {
    val r = Registry.byName("q244_holt_winters").q(spark, sf).collect().head
    val by = Tables.events(spark, sf)
      .select(expr(s"ts div $HourNs"), round(col("value") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).map { case (h, xs) => (h, xs.map(_._2).sum) }
    val xs = (by.keys.min to by.keys.max)
      .map(by.getOrElse(_, 0L) / 100.0).toArray
    val n = xs.length
    assert(r.getLong(0) == n.toLong)
    // HW replay: textbook init, updates t=25..n-48 (0-based 24..n-49)
    val l0 = xs.take(24).foldLeft(0.0)(_ + _) / 24.0
    val b0 = (xs.slice(24, 48).foldLeft(0.0)(_ + _) / 24.0 -
      xs.take(24).foldLeft(0.0)(_ + _) / 24.0) / 24.0
    var s = (0 until 24).map(i => xs(i) - l0).toArray
    var (l, b) = (l0, b0)
    for (x <- xs.slice(24, n - 48)) {
      val l2 = 0.25 * (x - s(0)) + 0.75 * (l + b)
      val b2 = 0.0625 * (l2 - l) + 0.9375 * b
      s = s.drop(1) :+ (0.125 * (x - l2) + 0.875 * s(0))
      l = l2; b = b2
    }
    val maeHw = (1 to 48).map(h =>
      math.abs(l + h * b + s((h - 1) % 24) - xs(n - 48 + h - 1))).sum / 48.0
    // Holt baseline replay (q239's constants)
    var (hl, hb) = (xs(0), 0.0)
    for (x <- xs.slice(1, n - 48)) {
      val l2 = 0.5 * x + 0.5 * (hl + hb)
      hb = 0.25 * (l2 - hl) + 0.75 * hb
      hl = l2
    }
    val maeHolt = (1 to 48).map(h =>
      math.abs(hl + h * hb - xs(n - 48 + h - 1))).sum / 48.0
    assert(math.abs(r.getDouble(1) - l) < 6e-7, "level")
    assert(math.abs(r.getDouble(2) - b) < 6e-7, "trend")
    assert(math.abs(r.getDouble(3) - maeHw) < 6e-5, "mae_hw")
    assert(math.abs(r.getDouble(4) - maeHolt) < 6e-5, "mae_holt")
    assert(r.getBoolean(5) == (r.getDouble(3) < r.getDouble(4)))
    // the duel is live on this fixture: the 24 seasonal states must earn
    // their keep against the trend-only q239 baseline
    assert(r.getBoolean(5), "seasonality must beat trend-only on this fixture")
  }

  test("q248 MAD flags equal a sequential robust-statistics replay") {
    val rows = Registry.byName("q248_mad_outliers").q(spark, sf).collect()
    assert(rows.length == 5)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr(s"ts div $HourNs"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((xs.length - 1) / 2) // smallest x with 2*rank(<=x) >= n
    }
    for (r <- rows) {
      val mine = ev.filter(_._1 == r.getString(0))
      val by = mine.groupBy(_._2).map { case (h, xs) => (h, xs.map(_._3).sum) }
      val xs = (by.keys.min to by.keys.max).map(by.getOrElse(_, 0L)).toSeq
      assert(r.getLong(1) == xs.length.toLong, "n_hours")
      val med = lowerMedian(xs)
      assert(r.getLong(2) == med, s"${r.getString(0)} med")
      val ds = xs.map(x => math.abs(x - med))
      val mad = lowerMedian(ds)
      assert(r.getLong(3) == mad, s"${r.getString(0)} mad")
      assert(r.getLong(4) == ds.count(d => d * 2 > mad * 9).toLong,
        s"${r.getString(0)} n_flagged")
      assert(r.getLong(5) == ds.max, s"${r.getString(0)} max_dev")
      // robustness sanity: MAD threshold is below the max deviation only
      // when something actually strays — flags are consistent with it
      if (r.getLong(4) > 0) assert(ds.max * 2 > mad * 9)
    }
  }

  test("forecast plans: spine-bounded stages only; no cartesian products") {
    for (name <- Seq("q237_acf", "q238_cusum", "q239_holt_linear",
        "q244_holt_winters", "q248_mad_outliers")) {
      val df = Registry.byName(name).q(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name must not plan a cartesian product:\n$plan")
    }
  }
}
