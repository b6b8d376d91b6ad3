package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

class SourcesSuite extends SparkTestBase {

  test("q57 partition-pruned read-back: scan touches only the filtered partition") {
    // run once to materialize the partitioned table
    Registry.byName("q57_partitioned_sink").q(spark, sf).collect()
    val path = graft.sources.Sources.scratch(sf, "lineitem_by_flag")
    val df = spark.read.parquet(path).filter(col("l_returnflag") === "R")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"),
      s"no partition pruning in plan:\n$plan")
    // directory layout is hive-style
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("l_returnflag="))
    assert(dirs.length >= 2, s"expected hive-style partition dirs, got ${dirs.toSeq}")
  }

  test("q58 csv/json round-trip preserves row counts and keys") {
    val out = Registry.byName("q58_csv_json_roundtrip").q(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == Tables.nation(spark, sf).count())
  }
}
