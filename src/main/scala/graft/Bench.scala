package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line out.
  * Results are fully materialized via the noop sink (no count-style column
  * pruning shortcuts), each query timed end-to-end including planning.
  */
object Bench {

  /** Headline subset: one representative per operator family — scan-agg,
    * top-k join, multiway join, selective scan, window, sessionization,
    * text stats, MinHash LSH, ANN top-k.
    */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q07_window_top_orders",
    "q25_events_hourly",
    "q26_sessionize",
    "q31_token_stats",
    "q35_dedup_exact",
    "q36_minhash_lsh",
    "q40_cosine_topk",
    "q41_ann_lsh")

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // optional: bench an explicit query list instead of the headline;
    // reject unknown names up front rather than crashing mid-run
    val names = if (args.nonEmpty) args.toSeq else headline
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.mkString(", ")}")
    val spark = Tables.localSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every bench table once (parquet footer reads), then run
    // every headline query once against the smallest fixture — same plans,
    // tiny data — so generated code is compiled and the JIT is warm before
    // anything is timed. Timed runs below still execute end-to-end on the
    // bench SF.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      names.foreach { name =>
        // NonFatal only — an OOM/interrupt must surface, and a query that
        // fails warm-up gets its name logged instead of silently running cold
        try exec(SparkEntry.queries(name)(spark, warmDir))
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
      }

    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { exec(fn(spark, sfDir)); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
