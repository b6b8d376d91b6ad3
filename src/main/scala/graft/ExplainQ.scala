package graft

/** Maintenance tool: print `explain("formatted")` for the named registered
  * queries (all of them with no args) — the plan-audit loop SURVEY.md §6
  * prescribes (pushdown reaching the scan, exchange reuse, codegen spans)
  * without writing a scratch main each time.
  *
  * Usage: `runMain graft.ExplainQ [sfDir] [queryName ...]`
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] $name failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
