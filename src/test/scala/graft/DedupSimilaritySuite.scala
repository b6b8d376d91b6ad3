package graft

import graft.queries.Registry

/** Recall/quality checks for the approximate (oracle-less) dedup and ANN
  * queries against their exact in-repo baselines.
  */
class DedupSimilaritySuite extends SparkTestBase {

  private def rows(name: String): Array[org.apache.spark.sql.Row] =
    Registry.byName(name).q(spark, sf).collect()

  test("q36 MinHash LSH recalls exact 3-shingle-Jaccard near-dups") {
    import org.apache.spark.sql.functions._
    // independent exact baseline: true Jaccard over the SAME similarity q36
    // estimates — 3-token shingles (q37 is word-SET Jaccard, a different
    // measure; comparing those two would be apples-to-oranges).
    val shingles = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(
        col("doc_id"),
        array_distinct(
          transform(
            sequence(lit(0), greatest(size(col("t")) - 3, lit(0))),
            i => concat_ws(" ", slice(col("t"), i + 1, lit(3))))).as("sh"))
    val a = shingles.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = shingles.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val exact = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double"))
      .withColumn("jac", col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .filter(col("jac") >= 0.95)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty, "fixture has no exact shingle near-dup pairs")
    val lsh = rows("q36_minhash_lsh")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (missed ${exact.diff(lsh)})")
  }

  test("q41 ANN LSH recalls most of the exact top-k neighbors (vs q40)") {
    val exact = rows("q40_cosine_topk")
      .map(r => (r.getLong(0), r.getLong(2))).toSet // (q_id, n_id)
    val ann = rows("q41_ann_lsh")
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall $recall < 0.6")
  }

  test("q56 IVF ANN beats the LSH recall floor (vs q40)") {
    val exact = rows("q40_cosine_topk")
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = rows("q56_ann_ivf")
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8")
  }

  test("q38 simhash: exact duplicates get identical signatures") {
    import org.apache.spark.sql.functions._
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("sh"),
        xxhash64(col("text")).as("xh"))
    // group by exact text hash: all members of a text-equal group must share simhash
    val bad = df.groupBy(col("xh"))
      .agg(countDistinct(col("sh")).as("n"))
      .filter(col("n") > 1)
      .count()
    assert(bad == 0)
  }

  test("q35 exact dedup keeps one representative per distinct text") {
    val n = rows("q35_dedup_exact").length
    val distinctTexts = Tables.documents(spark, sf).select("text").distinct().count()
    assert(n.toLong == distinctTexts)
  }
}
