package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Checks for the text-pipeline operators whose registered forms are
  * self-checks (oracle = literal TRUE), so the real bound needs a suite
  * assertion on the raw numbers.
  */
class TextOpsSuite extends SparkTestBase {

  test("q69 realized stratum fractions sit within the σ-scaled bound") {
    val rows = Registry.byName("q69_stratified_sample").q(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"stratum ${r.getString(0)}: frac_ok is false")
    }
    // recompute the raw deviations: each stratum's realized fraction must
    // sit within 4.5 binomial standard errors of its target — the same
    // σ-scaled bound the registered query emits, asserted here on the
    // numbers so a bound loosened in the query can't pass silently
    val fractions = Map(
      "en" -> 0.5, "de" -> 0.4, "es" -> 0.3, "fr" -> 0.2, "zh" -> 0.1)
    val docs = Tables.documents(spark, sf)
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals.keySet == fractions.keySet, s"unexpected strata: ${totals.keySet}")
    totals.foreach { case (lang, n) =>
      val f = fractions(lang)
      val dev = math.abs(sampled.getOrElse(lang, 0L).toDouble / n - f)
      val sigma = math.sqrt(f * (1 - f) / n)
      assert(dev <= 4.5 * sigma,
        f"$lang: |realized-target|=$dev%.4f > 4.5σ=${4.5 * sigma}%.4f (n=$n)")
    }
  }
}
