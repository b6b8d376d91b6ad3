package graft.operators

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication family over `documents` — the core LLM-pipeline operators:
  * exact (hash group), MinHash+LSH banding, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale shape: the exact and LSH variants are equi-join/groupBy on a 64-bit
  * key — one hash shuffle, linear in corpus size; that's the 100 TB path.
  * The brute-force O(N²) variants exist as correctness oracles for the LSH
  * ones and are kept to small candidate sets.
  */
object Dedup {

  /** Exact dedup, scale path: group on a 64-bit content hash + full-text
    * confirm inside the group (hash collisions can't silently merge docs),
    * keep the minimum doc_id per text. Input is doubled (union with shifted
    * ids) because the corpus itself is dup-free.
    */
  private def dedupExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val doubled = docs.union(docs.select(col("doc_id") + 1000000L, col("text")))
    doubled
      // the 64-bit hash is the shuffle key; text only compared within groups
      .groupBy(xxhash64(col("text")).as("h"), col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }

  /** MinHash signatures + banded LSH candidate pairs. Signature k=32 over
    * 3-token shingles, 8 bands × 4 rows. Candidates = docs sharing ≥1 band
    * key (equi-join on the exploded band key — the only shuffle); estimated
    * Jaccard = fraction of matching signature components.
    */
  private def minhashPairs(s: SparkSession, d: String, minEst: Double): DataFrame = {
    // hash the text ONCE: bands derive from the sig column, not a second
    // shingling pass (bands_from_sig vs minhash_bands)
    val sigs = Tables.documents(s, d)
      .select(
        col("doc_id"),
        call_function("minhash_sig", col("text"), lit(32), lit(3)).as("sig"))
      .withColumn("bands", call_function("bands_from_sig", col("sig"), lit(4)))
    val banded = sigs.select(col("doc_id"), col("sig"), explode(col("bands")).as("band"))
    val a = banded.select(col("doc_id").as("a_id"), col("sig").as("a_sig"), col("band"))
    val b = banded.select(col("doc_id").as("b_id"), col("sig").as("b_sig"), col("band"))
    a.join(b, Seq("band"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sig"), col("b_sig"))
      .distinct() // pairs sharing multiple bands counted once
      .withColumn(
        "est_jaccard",
        aggregate(
          zip_with(col("a_sig"), col("b_sig"), (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0),
          (acc, v) => acc + v) / lit(32.0))
      .filter(col("est_jaccard") >= minEst)
      .select(col("a_id"), col("b_id"), round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val entries: Seq[Entry] = Seq(
    Entry(
      "q35_dedup_exact",
      dedupExact,
      Some("""WITH u AS (
             | SELECT doc_id, text FROM documents
             | UNION ALL SELECT doc_id + 1000000, text FROM documents)
             |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM u GROUP BY text ORDER BY keep_id""".stripMargin)),

    // q36: LSH candidates + signature-estimated Jaccard over 3-token
    // shingles. Approximate by design → no SQL oracle (rows-only check);
    // DedupSimilaritySuite validates recall against exact 3-shingle Jaccard
    // computed independently (NOT q37, which measures word-SET Jaccard — a
    // different similarity: bag-of-words vs order-sensitive shingles).
    Entry("q36_minhash_lsh", (s, d) => minhashPairs(s, d, 0.9), None),

    // q37: EXACT word-set Jaccard near-dup pairs (bag-of-words similarity,
    // complementary to q36's shingle similarity). Brute-force O(N²) compare;
    // fine at fixture scale, and exactly the shape the LSH path prunes at
    // 100 TB (comment trail in minhashPairs).
    Entry(
      "q37_wordset_jaccard",
      (s, d) => {
        val sets = Tables.documents(s, d)
          .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
        val a = sets.select(col("doc_id").as("a_id"), col("toks").as("a_toks"))
        val b = sets.select(col("doc_id").as("b_id"), col("toks").as("b_toks"))
        a.crossJoin(b)
          .filter(col("a_id") < col("b_id"))
          .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))).cast("double"))
          .withColumn(
            "jac",
            col("inter") /
              (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
          .filter(col("jac") >= 0.95)
          .select(col("a_id"), col("b_id"), round(col("jac"), 4).as("jac"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH s AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks
             |  FROM documents),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS inter,
             |  len(a.toks) AS la, len(b.toks) AS lb
             | FROM s a JOIN s b ON a.doc_id < b.doc_id)
             |SELECT a_id, b_id, round(inter/(la+lb-inter),4) AS jac
             |FROM p WHERE inter/(la+lb-inter) >= 0.95
             |ORDER BY a_id, b_id""".stripMargin)),

    // q38: SimHash signatures (near-dup at small Hamming distance). The
    // 64-bit signature itself is engine-defined → rows-only check;
    // HashKernelsSuite pins exact values and similarity behavior.
    Entry(
      "q38_simhash",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            call_function("simhash64", col("text")).as("simhash"))
          .orderBy(col("doc_id")),
      None),

    // q39: embedding-cosine near-dup pairs via the native cosine_sim
    // expression (brute force; q41 is the LSH-pruned scale path).
    Entry(
      "q39_embedding_neardup",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
        val b = e.select(col("vec_id").as("b_id"), col("v").as("b_v"))
        a.crossJoin(b)
          .filter(col("a_id") < col("b_id"))
          .withColumn("cos", call_function("cosine_sim", col("a_v"), col("b_v")))
          .filter(col("cos") >= 0.4)
          .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             | round(list_cosine_similarity(a.v, b.v),4) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
             |ORDER BY a_id, b_id""".stripMargin))
  )
}
