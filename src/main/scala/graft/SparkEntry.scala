package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Both maps are derived from the single [[graft.queries.Registry]] so the
  * query and oracle registries cannot drift.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q05 exercises scan → broadcast dims → shuffle join → agg → sort in one
    * plan.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Registry.byName("q05_region_revenue").q(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.entries.map(e => e.name -> e.q).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Since round 4 EVERY query has an oracle:
    * approximate/engine-defined ops register self-checks the SQL reproduces
    * (recall/error bounds as literal TRUE, golden digests for hash kernels).
    */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.entries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
