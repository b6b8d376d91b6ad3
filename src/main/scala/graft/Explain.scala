package graft

/** Plan-audit main: prints the formatted physical plan of each named query
  * (default: the bench headline) against SPARK_GRAFT_SF_DIR — the tool behind
  * the "explain, then iterate until it's the plan you'd want" loop. Streaming
  * and sink queries execute on construction, so audit them via their suites
  * instead.
  *
  *   sbt "runMain graft.Explain q05_region_revenue q39_embedding_neardup"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Tables.localSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // optional runtime conf overrides: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.mkString(", ")}")
    names.foreach { name =>
      println(s"\n================ $name @ $sfDir ================")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
