package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Integrity family (q213-q215): order-independence of the checksum, the
  * HRW movement contract, and damage-proportional drill-down in the copy
  * diff.
  */
class IntegritySuite extends SparkTestBase {

  test("q213 checksum is ORDER-INDEPENDENT and damage-SENSITIVE") {
    val base = Registry.byName("q213_table_checksum").q(spark, sf).collect().head
    // same table re-sharded and reversed: identical checksum row
    val li = Tables.lineitem(spark, sf)
      .orderBy(col("l_extendedprice").desc)
      .repartition(7)
    val ckpt = li.localCheckpoint()
    val perm = graft.operators.Integrity.checksum(ckpt).collect().head
    assert(perm == base, "re-sharded + re-sorted copy must checksum identically")
    // one flipped cell (a single quantity +0.01) must move the digest sums
    val damaged = graft.operators.Integrity.checksum(
      ckpt.withColumn("l_quantity",
        when(col("l_orderkey") === ckpt.select(min("l_orderkey")).head().getLong(0),
          col("l_quantity") + 0.01).otherwise(col("l_quantity"))))
      .collect().head
    assert(damaged.getLong(0) == base.getLong(0), "row count unchanged")
    assert(damaged.getLong(1) != base.getLong(1) || damaged.getLong(2) != base.getLong(2),
      "a one-cell change must move a digest aggregate")
  }

  test("q214 HRW: shards partition the corpus, movers all land on the new shard") {
    val rows = Registry.byName("q214_rendezvous_reshard").q(spark, sf).collect()
    assert(rows.length == 8, "all 8 original shards populated")
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "shard counts partition the corpus")
    rows.filter(_.getLong(2) > 0).foreach { r =>
      assert(r.getLong(3) == 8L, "every mover relocates TO the added shard")
    }
    val movedPpm = rows.map(_.getLong(2)).sum * 1000000L / nDocs
    // HRW contract: ~1/9 of the corpus moves (111,111 ppm); wide band for
    // fixture-size noise, tight enough to catch the broken linear-family
    // hash (which measured ~248k ppm concentrated in one shard).
    assert(movedPpm > 40000 && movedPpm < 190000,
      s"movement $movedPpm ppm is far from the 1/9 HRW contract")
    val counts = rows.map(_.getLong(1))
    assert(counts.max < 3 * counts.min,
      s"shard skew ${counts.mkString(",")} — placement hash must spread uniformly")
  }

  test("q215 copy diff finds EXACTLY the damaged rows, drills only damaged buckets") {
    val rows = Registry.byName("q215_copy_diff").q(spark, sf).collect()
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 === 7).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    assert(rows.map(_.getLong(1)).toSeq == expected.toSeq,
      "diff must name exactly the corrupted doc_ids, in order")
    rows.foreach { r =>
      assert(r.getLong(2) != r.getLong(3), "digests differ on damaged rows")
      assert(r.getLong(0) == r.getLong(1) / 64, "bucket is doc_id div 64")
    }
    // the drill-down is a left_semi against the broadcast damaged-bucket
    // list — the scale property that makes the re-read damage-proportional
    val df = Registry.byName("q215_copy_diff").q(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi-join drill-down:\n$plan")
  }
}
