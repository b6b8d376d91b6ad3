package graft

/** Maintenance tool: run named registered queries and print their results —
  * the quick inspection loop for new/changed operators without a full
  * `graft.Verify` sweep (ExplainQ's counterpart for VALUES instead of plans).
  *
  * Usage: `runMain graft.RunQ <sfDir> <queryName ...>`
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.localSession(8)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).show(50, false)
    }
    spark.stop()
  }
}
