package graft

import org.apache.spark.sql.functions._

/** r21 optimization round: the native char-poly kernels (PolyKernels) must
  * be VALUE-IDENTICAL to the interpreted HOF chains they replaced in
  * q216/q229/q283/q287/q290/q291/q292/q299 and the classifier family
  * (q194/q209/q210/q234/q247). Each test evaluates the ORIGINAL HOF
  * expression and the kernel side by side over adversarial inputs (empty
  * strings, consecutive/leading/trailing spaces, multi-byte codepoints,
  * sub-window lengths) through the same Spark session, so any divergence —
  * split semantics, codepoint handling, mod arithmetic — fails here before
  * the oracle gate sees it.
  */
class PolyKernelsSuite extends SparkTestBase {

  private val P = 2147483647L

  private val cases = Seq(
    "",
    " ",
    "a",
    "ab cd",
    "a  b",              // consecutive spaces → empty token
    " lead and trail ",  // leading/trailing spaces → empty tokens
    "the quick brown fox jumps over the lazy dog again and again and again",
    "café λ-calc €uro", // multi-byte BMP codepoints
    Seq.fill(40)("tok").mkString(" "), // > 32 tokens → every ladder fires
    (1 to 60).map(i => s"w$i").mkString(" "))

  private def df = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cases.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "text", org.apache.spark.sql.types.StringType))))
  }

  private val hofCharPoly =
    "aggregate(filter(split(text, ''), ch -> ch != ''), 0L, " +
      s"(a, c) -> (a * 131 + ascii(c)) % $P)"
  private val hofTh = "transform(split(text, ' '), w -> " +
    "aggregate(filter(split(w, ''), ch -> ch != ''), " +
    s"0L, (a, c) -> (a * 131 + ascii(c)) % $P))"

  test("char_poly equals the HOF whole-string fold") {
    val rows = df.select(
      expr(hofCharPoly).as("hof"), expr("char_poly(text)").as("k")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("token_polys equals the HOF per-token fold, empty tokens included") {
    val rows = df.select(
      expr(hofTh).as("hof"), expr("token_polys(text)").as("k")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("poly_slide equals the HOF sliding gram fold at every ladder L") {
    Seq(4, 8, 16, 32).foreach { l =>
      val hof = s"if(size(th) >= $l, transform(sequence(1, size(th) - $l + 1), " +
        s"i -> aggregate(transform(sequence(0, $l - 1), k -> element_at(th, i + k)), " +
        s"0L, (a, c) -> (a * 131 + c) % $P) * 64 + $l), array())"
      val rows = df.select(expr(hofTh).as("th"))
        .select(expr(hof).as("hof"),
          expr(s"poly_slide(th, $l, 64L, ${l}L)").as("k"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"L=$l ${r.toString}"))
    }
  }

  test("poly_blocks equals the HOF non-overlapping block fold") {
    val hof = "if(size(th) div 8 >= 1, transform(sequence(1L, size(th) div 8), " +
      "i -> aggregate(slice(th, cast((i - 1) * 8 + 1 as int), 8), " +
      s"0L, (a, c) -> (a * 131 + c) % $P)), array())"
    val rows = df.select(expr(hofTh).as("th"))
      .select(expr(hof).as("hof"), expr("poly_blocks(th, 8)").as("k"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("cdc_chunks equals the HOF boundary scan + chunk hash pipeline") {
    val marks =
      """transform(sequence(16, greatest(size(codes), 16)), i ->
        |  if(i <= size(codes) and aggregate(transform(sequence(0, 15),
        |      k -> element_at(codes, i - 15 + k)),
        |    0L, (a, c) -> (a * 131 + c) % 2147483647) % 64 = 0, i, -1))"""
        .stripMargin
    val hofDf = df.filter(length(col("text")) > 0)
      .withColumn("codes",
        expr("transform(filter(split(text, ''), c -> c != ''), c -> ascii(c))"))
      .withColumn("cuts", expr(s"filter($marks, x -> x != -1)"))
      .withColumn("starts", expr("concat(array(0), cuts)"))
      .withColumn("ends", expr("concat(cuts, array(size(codes)))"))
      .withColumn("span", explode(expr(
        "zip_with(starts, ends, (st, en) -> struct(st AS st, en AS en))")))
      .filter(col("span.en") > col("span.st"))
      .select(col("text"),
        (col("span.en") - col("span.st")).cast("long").as("clen"),
        expr("(aggregate(slice(codes, span.st + 1, span.en - span.st), 0L, " +
          "(a, c) -> (a * 131 + c) % 2147483647) " +
          "* 131 + (span.en - span.st)) % 2147483647").as("chash"))
    val kDf = df.filter(length(col("text")) > 0)
      .select(col("text"), explode(expr("cdc_chunks(text)")).as("ch"))
      .select(col("text"), col("ch.clen").as("clen"), col("ch.chash").as("chash"))
    val hof = hofDf.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val k = kDf.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(hof == k)
    // a long doc with actual cuts: the rule fires on this corpus
    val li = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"), explode(expr("cdc_chunks(text)")).as("ch"))
    assert(li.count() > spark.read.parquet(s"$sf/documents.parquet").count(),
      "expected at least one mid-document cut on the fixture corpus")
  }

  test("token_shingle_hashes equals the HOF xxhash64-shingle chain") {
    val hof = "array_distinct(transform(sequence(0, greatest(size(split(text, ' ')) - 3, 0)), " +
      "i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i + 1, 3)))))"
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select(col("text"))
      .unionByName(df.filter(length(col("text")) > 0))
    val rows = corpus
      .select(expr(hof).as("hof"), expr("token_shingle_hashes(text, 3)").as("k"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("char_gram_hashes equals the HOF xxhash64-substr chain") {
    val hof = "array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)), " +
      "i -> xxhash64(substr(text, i, 3))))"
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select(col("text"))
      .unionByName(df.filter(length(col("text")) > 0))
    val rows = corpus
      .select(expr(hof).as("hof"), expr("char_gram_hashes(text, 3)").as("k"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("cls_score equals the HOF nested-aggregate classifier fold") {
    val hofU = "filter(split(lower(text), ' '), w -> w rlike '^[a-z0-9]+$')"
    val hofScore = """aggregate(concat(u, zip_with(slice(u, 1, greatest(size(u) - 1, 0)),
        slice(u, 2, greatest(size(u) - 1, 0)), (a, b) -> concat(a, ' ', b))),
      0L, (acc, f) -> acc +
      ((aggregate(filter(split(f, ''), ch -> ch != ''), 0L,
          (a, c) -> (a * 31L + ascii(c)) % 4096L)
        * 2654435761L) % 2003L) - 1001L)"""
    // fixture corpus AND the adversarial rows
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select(col("text"))
      .unionByName(df)
    val rows = corpus.select(expr(hofU).as("u"))
      .select(expr(hofScore).as("hof"), expr("cls_score(u)").as("k"),
        expr("size(u)").as("n"),
        expr("greatest(size(u) * 2 - 1, 0)").as("nf_k"),
        expr("size(concat(u, zip_with(slice(u, 1, greatest(size(u) - 1, 0)), " +
          "slice(u, 2, greatest(size(u) - 1, 0)), (a, b) -> concat(a, ' ', b))))")
          .as("nf_hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"score mismatch: $r")
      assert(r.getInt(3) == r.getInt(4), s"n_feats mismatch: $r")
    }
  }
}
