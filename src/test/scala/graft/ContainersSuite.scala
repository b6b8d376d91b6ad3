package graft

import org.apache.spark.sql.functions._
import graft.operators.{Containers, Multimodal}
import graft.queries.Registry

/** Container decoders, continued (Containers.scala): every format is
  * conformance-pinned against an independent reference decoder from the
  * JDK, the planted corruption lane is proven rejected both by our parser
  * and by the reference decoder, and the registered rollup ties to the
  * synthesis closed form.
  */
class ContainersSuite extends SparkTestBase {

  test("q319 gzip: GZIPInputStream agrees; CRC corruption rejected") {
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .filter(col("doc_id") === 3L).head()
    val t = Multimodal.TarIn(doc.getLong(0), doc.getString(1),
      doc.getString(2), doc.getLong(3))
    val bytes = Containers.gzipFullBytes(t)
    // the JDK's GZIPInputStream reads concatenated members transparently:
    // the full decoded stream is text-bytes ++ json-bytes
    val gis = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val back = new String(gis.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val expect = doc.getString(2) +
      s"""{"doc_id":${doc.getLong(0)},"n_chars":${doc.getLong(3)}}"""
    assert(back == expect, "multi-member payload round-trip through the JDK")
    // our walk: two members, names, per-member lengths, all verified
    val ms = Containers.parseGzipMembers(bytes).get
    assert(ms.map(_._1) == Seq("d3.txt", "d3.json"))
    assert(ms(0)._2 == doc.getString(2)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong)
    assert(ms.forall(_._3), "both members verify on a clean doc")
    // the planted % 43 corruption: OUR parser flags exactly member 1, and
    // the JDK's CRC-checking stream REJECTS the stream (doc 43: CRC lane
    // only — doc 0 now also carries the % 59 truncation lane)
    val bad = Multimodal.TarIn(43L, "s", "hello graft", 11L)
    val bms = Containers.parseGzipMembers(Containers.gzipFullBytes(bad)).get
    assert(!bms(0)._3 && bms(1)._3, "exactly the corrupted member flagged")
    val bgis = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(Containers.gzipFullBytes(bad)))
    assert(
      try { bgis.readAllBytes(); false }
      catch { case _: java.util.zip.ZipException => true },
      "GZIPInputStream must reject the falsified CRC")
    // the planted % 59 truncation: a STRUCTURAL failure the walk refuses
    // (doc 0 carries both lanes — parse failure wins)
    assert(Containers.parseGzipMembers(Containers.gzipFullBytes(
      Multimodal.TarIn(59L, "s", "hello graft", 11L))).isEmpty,
      "truncated-trailer lane must fail structurally")
    assert(Containers.parseGzipMembers(Containers.gzipFullBytes(
      Multimodal.TarIn(0L, "s", "hello graft", 11L))).isEmpty,
      "doc 0 carries the truncation lane too")
    // malformation battery
    val good = Containers.gzipFullBytes(Multimodal.TarIn(1L, "s", "x", 1L))
    assert(Containers.parseGzipMembers(good.dropRight(3)).isEmpty,
      "truncated trailer")
    val badMagic = good.clone(); badMagic(0) = 'Q'
    assert(Containers.parseGzipMembers(badMagic).isEmpty, "bad magic")
    val badFlg = good.clone(); badFlg(3) = 0x14
    assert(Containers.parseGzipMembers(badFlg).isEmpty, "unknown FLG bits")
    assert(Containers.parseGzipMembers(good.take(20)).isEmpty,
      "truncated deflate body")
  }

  test("q319 rollup ties to the synthesis closed form") {
    val out = Registry.byName("q319_gzip_member_stream").q(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    out.foreach { r =>
      val rows = bySrc(r.getString(0))
      val parsed = rows.filter(_._2 % 59 != 0)
      assert(r.getLong(1) == rows.length.toLong, "n_shards")
      assert(r.getLong(2) == 2L * parsed.length, "n_members")
      assert(r.getLong(3) == parsed.count(_._2 % 43 == 0).toLong, "n_crc_bad")
      val payload = parsed.map { case (_, id, txt, nc) =>
        val sz1 = txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .length.toLong
        val sz2 = s"""{"doc_id":$id,"n_chars":$nc}""".length.toLong
        (if (id % 43 == 0) 0L else sz1) + sz2
      }.sum
      assert(r.getLong(4) == payload, "verified payload bytes")
      assert(r.getLong(6) == rows.count(_._2 % 59 == 0).toLong,
        "n_parse_fail counts exactly the truncation lane")
    }
  }

  test("q320 tiff: javax.imageio reproduces the pixels; bad lane rejected") {
    val t = Multimodal.TarIn(3L, "s", "x", 1L)
    val bytes = Containers.tiffFullBytes(t)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "the JDK TIFF reader must accept our file")
    val w = 4 * (1 + 3 % 5); val h = 4 * (1 + 3 % 3)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = ((3L * 7L + (y.toLong * w + x) * 13L) % 251L).toInt
      assert(img.getRaster.getSample(x, y, 0) == expect,
        s"pixel ($x,$y) via ImageIO")
    }
    // our parse agrees on geometry and digests the same bytes
    val Some((pw, ph, dg)) = Containers.parseTiffGray(bytes)
    assert(pw == w.toLong && ph == h.toLong)
    var expDg = 0L
    for (i <- 0 until w * h)
      expDg = (expDg * 131L + (3L * 7L + i.toLong * 13L) % 251L) % 2147483647L
    assert(dg == expDg)
    // the planted % 47 lane: strip byte count disagrees with geometry
    assert(Containers.parseTiffGray(
      Containers.tiffFullBytes(Multimodal.TarIn(47L, "s", "x", 1L))).isEmpty)
    // malformation battery
    val badMagic = bytes.clone(); badMagic(0) = 'M'
    assert(Containers.parseTiffGray(badMagic).isEmpty, "bad byte order")
    assert(Containers.parseTiffGray(bytes.take(60)).isEmpty, "truncated IFD")
    assert(Containers.parseTiffGray(bytes.take(130)).isEmpty,
      "strip out of bounds")
  }

  test("q321 bmp: javax.imageio reproduces the pixels; bad lane rejected") {
    val id = 5L
    val t = Multimodal.TarIn(id, "s", "x", 1L)
    val bytes = Containers.bmpFullBytes(t)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "the JDK BMP reader must accept our file")
    val w = (3 * (1 + id % 4)).toInt; val h = (2 * (1 + id % 3)).toInt
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val b = ((id + 3L * x + 7L * y) % 256L).toInt
      val g = ((id * 2L + 5L * x + 11L * y) % 256L).toInt
      val r = ((id * 3L + 11L * x + 13L * y) % 256L).toInt
      assert(img.getRGB(x, y) == (0xff << 24 | r << 16 | g << 8 | b),
        s"pixel ($x,$y) via ImageIO — bottom-up + stride undone")
    }
    // all four stride-pad widths round-trip through our parser
    for (did <- 0L to 3L) {
      val bb = Containers.bmpFullBytes(Multimodal.TarIn(did * 4L + 1L,
        "s", "x", 1L)) // ids 1,5,9,13 → w 6,9,12,3 → pads 2,1,0,3
      assert(Containers.parseBmp24(bb).isDefined, s"pad case id ${did * 4 + 1}")
    }
    // the planted % 31 lane: bfSize off by one
    assert(Containers.parseBmp24(
      Containers.bmpFullBytes(Multimodal.TarIn(31L, "s", "x", 1L))).isEmpty)
    // malformation battery
    val badMagic = bytes.clone(); badMagic(1) = 'Q'
    assert(Containers.parseBmp24(badMagic).isEmpty, "bad magic")
    assert(Containers.parseBmp24(bytes.take(53)).isEmpty, "truncated header")
    val bad8 = bytes.clone(); bad8(28) = 8 // 8bpp claimed
    assert(Containers.parseBmp24(bad8).isEmpty, "non-24bpp rejected")
  }

  test("q325 utf8: classes detected exactly once; java.nio agrees") {
    import Containers.{utf8StreamBytes, utf8Validate}
    // unit vectors: each corruption class alone
    assert(utf8Validate(Array(0xc0, 0xaf).map(_.toByte)) ==
      ((1L, 0L, 0L, 0L, 0L)), "overlong")
    assert(utf8Validate(Array(0x80).map(_.toByte)) ==
      ((0L, 1L, 0L, 0L, 0L)), "lone continuation")
    assert(utf8Validate(Array(0xe2, 0x82).map(_.toByte)) ==
      ((0L, 0L, 1L, 0L, 0L)), "truncated at EOF")
    assert(utf8Validate(Array(0xed, 0xa0, 0x80).map(_.toByte)) ==
      ((0L, 0L, 0L, 1L, 0L)), "surrogate")
    assert(utf8Validate("héllo".getBytes("UTF-8")) ==
      ((0L, 0L, 0L, 0L, 5L)), "clean multi-byte accepted")
    // doc 0 carries ALL FOUR lanes in one stream — each exactly once
    val all4 = utf8Validate(utf8StreamBytes(
      Multimodal.TarIn(0L, "s", "abc", 3L)))
    assert(all4 == ((1L, 1L, 1L, 1L, 4L)), s"doc-0 composite: $all4")
    // conformance: java.nio strict decoding accepts exactly the clean docs
    def javaAccepts(b: Array[Byte]): Boolean =
      try {
        java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(b))
        true
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    for (id <- 0L to 60L) {
      val clean = id % 29 != 0 && id % 23 != 0 && id % 19 != 0 && id % 17 != 0
      assert(javaAccepts(utf8StreamBytes(
        Multimodal.TarIn(id, "s", "abc", 3L))) == clean,
        s"java.nio verdict for doc $id must match the planted lanes")
    }
  }

  test("q325 rollup ties to the planted lanes") {
    val out = Registry.byName("q325_utf8_audit").q(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // ASCII PIN (r18 advice): utf8StreamBytes encodes text with US_ASCII
    // and the oracle counts valid_cp as strlen(text)+1 (UTF-8 BYTES) —
    // both correct only while the fixture text is pure ASCII. Non-ASCII
    // text would be mangled to '?' by getBytes(US_ASCII) AND diverge from
    // the oracle; pin the assumption so fixture drift breaks here.
    assert(docs.forall(_._3.forall(_ < 0x80)),
      "q325's synthesis and oracle both assume pure-ASCII fixture text")
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    out.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(1) == rows.length.toLong, "n_docs")
      assert(r.getLong(2) == rows.count(t => t._2 % 29 != 0 &&
        t._2 % 23 != 0 && t._2 % 19 != 0 && t._2 % 17 != 0).toLong, "n_clean")
      assert(r.getLong(3) == rows.count(_._2 % 29 == 0).toLong, "overlong")
      assert(r.getLong(7) == rows.map(_._3.length.toLong + 1L).sum, "valid_cp")
    }
  }

  test("q328 mu-law: the JDK's ULAW expansion agrees on all 256 codes " +
    "and end-to-end; bad lane rejected") {
    import javax.sound.sampled._
    // table-level conformance: decode every possible code through the
    // JDK's own ULAW->PCM16 converter and compare with our expand
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val src = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1,
      8000f, false)
    val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16,
      1, 2, 8000f, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes), src, 256L)
    val pcm = AudioSystem.getAudioInputStream(dst, in).readAllBytes()
    for (c <- 0 until 256) {
      val jdk = ((pcm(2 * c) & 0xff) | (pcm(2 * c + 1) << 8)).toShort.toInt
      assert(jdk == Containers.ulawDecode(c), s"code $c: JDK vs ours")
    }
    // end-to-end: our complete mu-law WAV through AudioSystem's WAV
    // reader + ULAW codec reproduces our decoded samples exactly
    val t = Multimodal.TarIn(5L, "s", "x", 1L)
    val wav = Containers.ulawWavBytes(t)
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getEncoding == AudioFormat.Encoding.ULAW)
    val jdkPcm = AudioSystem.getAudioInputStream(dst, ais).readAllBytes()
    val ours = Containers.parseUlawWav(wav).get
    assert(jdkPcm.length == 2 * ours.length)
    for (i <- ours.indices) {
      val jdk = ((jdkPcm(2 * i) & 0xff) | (jdkPcm(2 * i + 1) << 8))
        .toShort.toInt
      assert(jdk == ours(i), s"sample $i end-to-end")
    }
    // round-trip error bound: mu-law's worst case is half the top
    // segment's step (512) plus the clip region
    val errs = ours.indices.map { i =>
      val s0 = (((5L * 31L + i.toLong * 40503L + 7L) % 65536L) - 32768L).toInt
      math.abs(s0 - ours(i))
    }
    assert(errs.max <= 644, s"reconstruction error bound (got ${errs.max})")
    // the planted % 53 lane: fact/data cross-check fails
    assert(Containers.parseUlawWav(Containers.ulawWavBytes(
      Multimodal.TarIn(53L, "s", "x", 1L))).isEmpty)
    // malformation battery
    val badMagic = wav.clone(); badMagic(0) = 'Q'
    assert(Containers.parseUlawWav(badMagic).isEmpty, "bad RIFF magic")
    assert(Containers.parseUlawWav(wav.take(40)).isEmpty, "truncated")
    val badFmt = wav.clone(); badFmt(20) = 1 // claims linear PCM
    assert(Containers.parseUlawWav(badFmt).isEmpty, "non-mu-law fmt tag")
  }

  test("q328 rollup ties to the planted lanes") {
    val out = Registry.byName("q328_ulaw_codec").q(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    out.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(1) == rows.length.toLong, "n_clips")
      assert(r.getLong(2) == rows.count(_._2 % 53 == 0).toLong, "n_bad")
      assert(r.getLong(3) == rows.collect {
        case (_, id) if id % 53 != 0 => 64L + id % 64
      }.sum, "n_samples")
      assert(r.getLong(7) <= 644L, "max error within the mu-law bound")
    }
  }

  test("q320/q321 rollups tie to the synthesis closed form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    val tiff = Registry.byName("q320_tiff_ifd_walk").q(spark, sf).collect()
    tiff.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(1) == rows.length.toLong)
      assert(r.getLong(2) == rows.count(_._2 % 47 == 0).toLong)
      assert(r.getLong(3) == rows.collect {
        case (_, id) if id % 47 != 0 => 16L * (1 + id % 5) * (1 + id % 3)
      }.sum)
    }
    val bmp = Registry.byName("q321_bmp_decode").q(spark, sf).collect()
    bmp.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(1) == rows.length.toLong)
      assert(r.getLong(2) == rows.count(_._2 % 31 == 0).toLong)
      assert(r.getLong(3) == rows.collect {
        case (_, id) if id % 31 != 0 => 18L * (1 + id % 4) * (1 + id % 3)
      }.sum)
    }
  }

  test("q330 mp4: index walk replays the synthesis; inflated-stsz lane " +
    "caught; malformation battery") {
    val P = 2147483647L
    // clean doc: the walk's index-driven read reproduces the closed form
    val t = Multimodal.TarIn(5L, "s", "x", 1L)
    val Some((ok, ns, pb, dg)) = Containers.parseMp4Index(
      Containers.mp4FullBytes(t))
    val n1 = (3 + 5 % 5); val n2 = (2 + 5 % 4)
    assert(ok == 1L && ns == (n1 + n2).toLong)
    var (expPb, expDg) = (0L, 0L)
    for (tr <- 1 to 2; j <- 0 until (if (tr == 1) n1 else n2)) {
      val sz = if (tr == 1) 16 + (5 * 7 + j * 13) % 32
      else 8 + (5 * 11 + j * 5) % 24
      expPb += sz
      for (k <- 0 until sz)
        expDg = (expDg * 131L + (5L + tr * 31 + j * 17 + k * 7) % 251L) % P
    }
    assert(pb == expPb && dg == expDg, "index-driven payload replay")
    // the % 67 lane: structure PARSES, only the layout cross-check fails
    val bad = Containers.parseMp4Index(
      Containers.mp4FullBytes(Multimodal.TarIn(67L, "s", "x", 1L)))
    assert(bad.contains((0L, 0L, 0L, 0L)),
      "inflated stsz must fail the index cross-check, not the parse")
    // malformation battery
    val good = Containers.mp4FullBytes(t)
    assert(Containers.parseMp4Index(good.drop(24)).isEmpty,
      "ftyp must lead")
    assert(Containers.parseMp4Index(good.dropRight(3)).isEmpty,
      "truncated mdat (top-level size overruns)")
    val badSz = good.clone(); badSz(3) = 5 // ftyp size < 8
    assert(Containers.parseMp4Index(badSz).isEmpty, "undersized box")
    // flip a stco full-box version byte: the strict parse refuses
    val stcoAt = {
      var i = -1
      var p = 0
      while (i < 0 && p + 8 <= good.length) {
        if (new String(good, p + 4, 4, "US-ASCII") == "stco") i = p
        else p += 1
      }
      i
    }
    assert(stcoAt > 0)
    val badVer = good.clone(); badVer(stcoAt + 8) = 1
    assert(Containers.parseMp4Index(badVer).isEmpty, "stco version != 0")
    // registered rollup ties to the lanes
    val out = Registry.byName("q330_mp4_box_index").q(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    out.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(1) == rows.length.toLong, "n_files")
      assert(r.getLong(2) == rows.count(_._2 % 67 == 0).toLong, "n_bad_index")
      assert(r.getLong(3) == rows.collect {
        case (_, id) if id % 67 != 0 => (3 + id % 5) + (2 + id % 4)
      }.sum, "n_samples over verified files")
    }
  }

  test("q335 mp4 chunks: interleaved layout reconstructed in logical " +
    "order; duration lane caught; malformation battery") {
    val P = 2147483647L
    // id=6: n1=4 (h1=2, even split → ONE stsc run), n2=4
    // id=5: n1=3 (h1=2/1 odd split → TWO stsc runs), n2=3
    for (id <- Seq(5L, 6L)) {
      val t = Multimodal.TarIn(id, "s", "x", 1L)
      val Some((ok, ns, nc, pb, dg, dur)) =
        Containers.parseMp4Chunked(Containers.mp4ChunkedBytes(t))
      val n1 = (3 + id % 5).toInt; val n2 = (2 + id % 4).toInt
      assert(ok == 1L && ns == (n1 + n2).toLong && nc == 3L)
      assert(dur == n1 * 1024L + n2 * 800L, "stts == mdhd footing")
      // digest must equal the LOGICAL-order closed form even though the
      // physical mdat is interleaved (v-chunk, a-chunk, v-chunk)
      var (expPb, expDg) = (0L, 0L)
      for (tr <- 1 to 2; j <- 0 until (if (tr == 1) n1 else n2)) {
        val sz = if (tr == 1) (16 + (id * 7 + j * 13) % 32).toInt
        else (8 + (id * 11 + j * 5) % 24).toInt
        expPb += sz
        for (k <- 0 until sz)
          expDg = (expDg * 131L + (id + tr * 31 + j * 17 + k * 7) % 251L) % P
      }
      assert(pb == expPb && dg == expDg, s"id=$id logical-order replay")
    }
    // the interleave is REAL: track 1's second chunk sits physically
    // after track 2's chunk (otherwise this test proves nothing)
    val good = Containers.mp4ChunkedBytes(Multimodal.TarIn(5L, "s", "x", 1L))
    // the % 79 lane: parses, fails only the duration footing
    assert(Containers.parseMp4Chunked(Containers.mp4ChunkedBytes(
      Multimodal.TarIn(79L, "s", "x", 1L)))
      .contains((0L, 0L, 0L, 0L, 0L, 0L)),
      "falsified mdhd duration must fail the footing, not the parse")
    // malformation battery
    assert(Containers.parseMp4Chunked(good.dropRight(2)).isEmpty,
      "truncated mdat")
    assert(Containers.parseMp4Chunked(good.drop(24)).isEmpty, "ftyp first")
    // falsify an stco entry: tiling must refuse (index lies about layout)
    val stcoAt = {
      var i = -1; var p = 0
      while (i < 0 && p + 8 <= good.length) {
        if (new String(good, p + 4, 4, "US-ASCII") == "stco") i = p
        else p += 1
      }
      i
    }
    assert(stcoAt > 0)
    val badOff = good.clone()
    // stco: size(4) type(4) verflags(4) count(4) offsets... — the first
    // offset's LSB sits at +19
    badOff(stcoAt + 19) = (badOff(stcoAt + 19) + 1).toByte
    assert(Containers.parseMp4Chunked(badOff)
      .contains((0L, 0L, 0L, 0L, 0L, 0L)),
      "shifted chunk offset must fail the tiling cross-check")
    // registered rollup ties to the lane
    val out = Registry.byName("q335_mp4_chunk_offsets").q(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    out.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(1) == rows.length.toLong, "n_files")
      assert(r.getLong(2) == rows.count(_._2 % 79 == 0).toLong, "n_bad_index")
      assert(r.getLong(4) == 3L * rows.count(_._2 % 79 != 0), "n_chunks")
    }
  }

  test("r19 container cohort: every registered plan is one scan into one " +
    "rollup exchange (the map-only scale shape)") {
    for (name <- Seq("q330_mp4_box_index", "q331_tone_bin_energy",
      "q333_jpeg_ycc_decode", "q334_jpeg_restart_decode",
      "q335_mp4_chunk_offsets", "q336_mp3_frame_walk",
      "q343_webm_ebml_walk")) {
      val df = Registry.byName(name).q(spark, sf)
      val plan = flattenPlan(df.queryExecution.executedPlan)
      val scans = plan.count(
        _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
      assert(scans == 1, s"$name must be a single-scan plan, got $scans")
      // ≤ 2 exchanges: the per-source rollup, plus the final ORDER BY
      // over the ≤|sources|-row result (immaterial at any scale) — the
      // corpus-sized data crosses the wire exactly once
      val exchanges = plan.count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
      assert(exchanges <= 2,
        s"$name: corpus data must shuffle exactly once, got $exchanges " +
          "exchanges")
    }
  }

  test("q336 mp3: frame walk replays the closed form; forbidden-index " +
    "lane; malformation battery") {
    val P = 2147483647L
    // canonical length pin against the PUBLIC formula: 128 kbps at
    // 44100 Hz, no padding → floor(144·128000/44100) = 417 bytes
    assert(144000L * 128 / 44100 == 417L)
    // id 5 and 10 carry the ID3v2 lane: the tag must be SKIPPED and the
    // frame stats must replay identically to the untagged closed form
    for (id <- Seq(3L, 4L, 5L, 7L, 10L)) {
      val t = Multimodal.TarIn(id, "s", "x", 1L)
      val Some((nf, pb, kb, dg, tg)) =
        Containers.parseMp3(Containers.mp3Bytes(t))
      assert(tg == (if (id % 5 == 0) 1L else 0L), s"id=$id tagged flag")
      val n = (4 + id % 6).toInt
      val sr = Array(44100, 48000, 32000)((id % 3L).toInt)
      val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320)
      assert(nf == n.toLong)
      var (expPb, expKb, expDg) = (0L, 0L, 0L)
      for (f <- 0 until n) {
        val bi = (1L + (id + f * 3L) % 14L).toInt
        val len = (144000L * kbps(bi) / sr).toInt + ((id + f) % 2L).toInt
        expPb += len - 4; expKb += kbps(bi)
        for (k <- 0 until len - 4)
          expDg = (expDg * 131L + (id + f * 13L + k * 7L) % 251L) % P
      }
      assert(pb == expPb && kb == expKb && dg == expDg, s"id=$id replay")
    }
    // the % 83 lane: forbidden bitrate index refuses mid-stream
    assert(Containers.parseMp3(Containers.mp3Bytes(
      Multimodal.TarIn(83L, "s", "x", 1L))).isEmpty)
    assert(Containers.parseMp3(Containers.mp3Bytes(
      Multimodal.TarIn(0L, "s", "x", 1L))).isEmpty)
    // malformation battery
    val good = Containers.mp3Bytes(Multimodal.TarIn(3L, "s", "x", 1L))
    assert(Containers.parseMp3(good.dropRight(1)).isEmpty,
      "stream must end exactly on a frame boundary")
    val badSync = good.clone(); badSync(0) = 0x7f
    assert(Containers.parseMp3(badSync).isEmpty, "broken sync word")
    val badSr = good.clone()
    badSr(2) = ((badSr(2) & 0xf1) | (3 << 2)).toByte // reserved rate
    assert(Containers.parseMp3(badSr).isEmpty, "reserved samplerate")
    assert(Containers.parseMp3(Array[Byte]()).isEmpty, "empty stream")
    // ID3v2 battery (r19 verdict #7): the % 5 ∧ % 89 lane plants a
    // syncsafe size byte with the high bit set — structurally illegal,
    // refused at the tag before any frame is read
    assert(Containers.parseMp3(Containers.mp3Bytes(
      Multimodal.TarIn(445L, "s", "x", 1L))).isEmpty,
      "corrupted syncsafe length refused")
    val tagged = Containers.mp3Bytes(Multimodal.TarIn(5L, "s", "x", 1L))
    assert(Containers.parseMp3(tagged.take(8)).isEmpty,
      "truncated ID3 header refused")
    assert(Containers.parseMp3(
      Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 0x7f)).isEmpty,
      "syncsafe size past the buffer refused")
    // a tag MID-stream is not a tag: 'I' (0x49) can never satisfy the
    // 0xff frame sync, so the walk refuses rather than resyncing past it
    assert(Containers.parseMp3(good ++ tagged.take(10)).isEmpty,
      "ID3 mid-stream refused")
  }

  test("q331 tone probe: planted bin recovered on every clip through the " +
    "real codec; energies replay JVM-side") {
    val out = Registry.byName("q331_tone_bin_energy").q(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    assert(out.length == bySrc.size)
    out.foreach { r =>
      // the recovery pin: the planted bin dominates on EVERY clip — the
      // dither and companding error must never flip the argmax
      assert(r.getLong(2) == r.getLong(1),
        s"${r.getString(0)}: n_recovered must equal n_clips")
    }
    // JVM replay for one doc of each planted bin, THROUGH the codec
    for (id <- Seq(3L, 4L, 5L)) {
      val n = (64L + 8L * (id % 8L)).toInt
      val xs = Array.tabulate(n)(i =>
        Containers.ulawDecode(Containers.ulawEncode(Containers.toneOf(id, i))))
      var (e0, e2, e4) = (0L, 0L, 0L)
      for (m <- 0 until n / 8) {
        val o = 8 * m
        val sum = (0 until 8).map(k => xs(o + k).toLong).sum
        val re = xs(o).toLong - xs(o + 2) + xs(o + 4) - xs(o + 6)
        val im = -xs(o + 1).toLong + xs(o + 3) - xs(o + 5) + xs(o + 7)
        val alt = (0 until 8).map(k =>
          (if (k % 2 == 0) 1L else -1L) * xs(o + k)).sum
        e0 += sum * sum; e2 += re * re + im * im; e4 += alt * alt
      }
      val tb = 2L * (id % 3L)
      val dominant = Seq(0L -> e0, 2L -> e2, 4L -> e4).maxBy(_._2)._1
      assert(dominant == tb, s"id=$id: planted bin $tb, recovered $dominant")
      // the codec is really in the loop: the compressed-domain energies
      // must differ from the clean-tone energies (companding is lossy)
      val clean = Array.tabulate(n)(i => Containers.toneOf(id, i))
      var c2 = 0L
      for (m <- 0 until n / 8) {
        val o = 8 * m
        val re = clean(o).toLong - clean(o + 2) + clean(o + 4) - clean(o + 6)
        val im = -clean(o + 1).toLong + clean(o + 3) - clean(o + 5) +
          clean(o + 7)
        c2 += re * re + im * im
      }
      if (tb == 2L)
        assert(e2 != c2, s"id=$id: codec loss must be visible in the energy")
    }
  }

  test("q343 webm: EBML walk replays the closed form; inflated-size and " +
    "timecode-swap lanes; malformation battery") {
    val P = 2147483647L
    for (id <- Seq(3L, 4L, 7L, 10L)) {
      val t = Multimodal.TarIn(id, "s", "x", 1L)
      val Some((ok, nc, nb, fb, dg, tc)) =
        Containers.parseWebm(Containers.webmBytes(t))
      assert(ok == 1L, s"id=$id clean doc")
      val encl = (2 + id % 3).toInt
      assert(nc == encl.toLong)
      var (enb, efb, edg, etc) = (0L, 0L, 0L, 0L)
      for (c <- 0 until encl; b <- 0 until (1 + (id + c) % 3).toInt) {
        val fl = (5 + (id + c + b) % 9).toInt
        enb += 1; efb += fl
        etc += 1000L * c + 40L * b
        for (k <- 0 until fl)
          edg = (edg * 131L + (id + 17L * c + 13L * b + 7L * k) % 251L) % P
      }
      assert(nb == enb && fb == efb && dg == edg && tc == etc,
        s"id=$id closed-form replay")
    }
    // the % 59 lane: parses fine, the monotonicity footing flags it, and
    // the stats replay with the SWAPPED timecodes
    val foot = Multimodal.TarIn(59L, "s", "x", 1L)
    val Some((fok, fnc, _, _, _, ftc)) =
      Containers.parseWebm(Containers.webmBytes(foot))
    assert(fok == 0L, "timecode swap must fail the footing, not the parse")
    var etc59 = 0L
    for (c <- 0 until fnc.toInt; b <- 0 until (1 + (59L + c) % 3).toInt)
      etc59 += Containers.webmClusterTc(59L, c, fnc.toInt) + 40L * b
    assert(ftc == etc59, "stats carry the swapped timecodes")
    // the % 71 lane: inflated SimpleBlock size — children stop tiling
    // the cluster: structural refusal
    assert(Containers.parseWebm(Containers.webmBytes(
      Multimodal.TarIn(71L, "s", "x", 1L))).isEmpty)
    assert(Containers.parseWebm(Containers.webmBytes(
      Multimodal.TarIn(0L, "s", "x", 1L))).isEmpty,
      "doc 0 carries the structural lane")
    // malformation battery
    val good = Containers.webmBytes(Multimodal.TarIn(3L, "s", "x", 1L))
    assert(Containers.parseWebm(good.dropRight(1)).isEmpty, "truncated")
    assert(Containers.parseWebm(Array[Byte]()).isEmpty, "empty")
    val zeroMarker = good.clone(); zeroMarker(0) = 0
    assert(Containers.parseWebm(zeroMarker).isEmpty,
      "zero id marker byte is not a valid EBML varint")
    // unknown-size element (all size bits set) refused — this is an
    // ingest gate, not a streaming best-effort reader
    val unkSize = good.clone()
    unkSize(4) = 0xff.toByte // EBML header's 1-byte size varint
    assert(Containers.parseWebm(unkSize).isEmpty, "unknown-size refused")
    // foreign DocType refused
    val badDoc = good.clone()
    val idx = (0 until good.length - 4).find(j =>
      good(j) == 'w' && good(j + 1) == 'e' && good(j + 2) == 'b' &&
        good(j + 3) == 'm').get
    badDoc(idx + 3) = 'x'
    assert(Containers.parseWebm(badDoc).isEmpty, "DocType webx refused")
    // a SimpleBlock naming an undeclared track refused: find the first
    // block's track varint (0x81 or 0x82) inside the first cluster and
    // point it at track 5
    val cl = (0 until good.length - 4).find(j =>
      (good(j) & 0xff) == 0x1f && (good(j + 1) & 0xff) == 0x43 &&
        (good(j + 2) & 0xff) == 0xb6 && (good(j + 3) & 0xff) == 0x75).get
    val sb = (cl until good.length - 1).find(j =>
      (good(j) & 0xff) == 0xa3).get
    val badTrack = good.clone()
    badTrack(sb + 2) = 0x85.toByte // id 0xa3, 1-byte size, then track
    assert(Containers.parseWebm(badTrack).isEmpty,
      "undeclared track number refused")
  }
}
