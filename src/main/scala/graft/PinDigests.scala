package graft

import org.apache.spark.sql.functions.sum

/** Re-pin helper for the golden-digest oracles (q38_simhash,
  * q85_winnow_fingerprint): prints each fixture's discriminator
  * (`sum(n_chars)`) and digest row so the CASE tables in Dedup.scala /
  * TextOps.scala can be updated if the fixtures are ever regenerated.
  * Not part of the driver contract — a maintenance tool only.
  *
  * Usage: `runMain graft.PinDigests /root/testdata/sf0.001 [...moreSfDirs]`
  */
object PinDigests {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PinDigests <sfDir> [<sfDir> ...]")
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { sfDir =>
      val disc = Tables.documents(spark, sfDir).agg(sum("n_chars")).collect()(0).get(0)
      Seq("q38_simhash", "q85_winnow_fingerprint", "q91_simhash_hamming").foreach { name =>
        val row = SparkEntry.queries(name)(spark, sfDir).collect()(0)
        println(s"[pin] $sfDir disc=$disc $name -> $row")
      }
    }
    spark.stop()
  }
}
