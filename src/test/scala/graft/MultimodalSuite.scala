package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSuite extends SparkTestBase {

  test("decode is deterministic and batch-shaped") {
    val in = (0 until 150).map(i =>
      Multimodal.MediaIn(i.toLong, Array.fill(i + 1)(7.toByte)))
    val out = Multimodal.decodePartition(in.iterator).toSeq
    assert(out.size == in.size) // batching must not drop or duplicate rows
    assert(out.map(_.doc_id) == in.map(_.doc_id)) // order preserved
    val again = Multimodal.decodePartition(in.iterator).toSeq
    assert(out == again)
    out.foreach { m =>
      assert(m.width >= 16 && m.height >= 16 && m.channels >= 1 && m.frames >= 1)
    }
  }

  test("PNG IHDR header is actually parsed, not stubbed") {
    // a real PNG head built byte-by-byte (signature + IHDR): the decoder
    // must read the big-endian dimensions and map color type → channels
    val png = Multimodal.pngHeaderBytes(width = 640, height = 360, colorType = 6)
    val meta = Multimodal.decodePartition(
      Iterator(Multimodal.MediaIn(1L, png))).next()
    assert(meta.width == 640 && meta.height == 360, s"parsed dims wrong: $meta")
    assert(meta.channels == 4 && meta.frames == 1, s"colorType 6 → RGBA: $meta")

    // all five public color types map to their channel counts
    val chans = Seq(0 -> 1L, 2 -> 3L, 3 -> 1L, 4 -> 2L, 6 -> 4L)
    chans.foreach { case (ct, expect) =>
      val m = Multimodal.decodePartition(
        Iterator(Multimodal.MediaIn(2L, Multimodal.pngHeaderBytes(8, 8, ct)))).next()
      assert(m.channels == expect, s"colorType $ct → $expect channels, got $m")
    }

    // width/height are unsigned 32-bit big-endian reads — a large dimension
    // must not go through a sign-extending byte path
    val big = Multimodal.decodePartition(
      Iterator(Multimodal.MediaIn(3L, Multimodal.pngHeaderBytes(70000, 40000, 2)))).next()
    assert(big.width == 70000 && big.height == 40000, s"BE read wrong: $big")

    // corrupted signature / truncated payloads fall back to the stub
    val broken = png.clone(); broken(0) = 0x00
    val stubbed = Multimodal.decodePartition(
      Iterator(Multimodal.MediaIn(4L, broken))).next()
    assert(stubbed.width == 16L + (33 % 64) * 16, s"broken PNG must stub: $stubbed")
    val short = Multimodal.decodePartition(
      Iterator(Multimodal.MediaIn(5L, png.take(20)))).next()
    assert(short.n_bytes == 20, s"truncated PNG must stub, not crash: $short")
  }

  test("q43 scan reads only the needed columns (payload pruned upstream)") {
    val plan = Multimodal.mediaMeta(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("lang"), "unused fixture columns must not be scanned")
  }

  test("q43 output schema carries typed metadata, no binary column") {
    val df = Multimodal.mediaMeta(spark, sf)
    val fields = df.schema.fieldNames.toSet
    assert(fields == Set("doc_id", "n_bytes", "width", "height", "channels", "frames"))
    assert(!df.schema.fields.exists(_.dataType.typeName == "binary"))
    assert(df.limit(5).collect().length == 5)
  }

  test("q104 WAV header parse round-trips and rejects corrupt magics") {
    val wav = Multimodal.wavHeaderBytes(
      rate = 44100, channels = 2, bits = 16, nSamples = 1234)
    assert(Multimodal.parseWavHeader(wav) ==
      Some((44100L, 2L, 16L, 1234L * 2 * 2)))
    // corrupt each magic independently — all four must be checked
    for (off <- Seq(0, 8, 12, 36)) {
      val bad = wav.clone(); bad(off) = 'X'.toByte
      assert(Multimodal.parseWavHeader(bad).isEmpty, s"magic at $off not validated")
    }
    // non-PCM format code rejected
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(Multimodal.parseWavHeader(nonPcm).isEmpty, "non-PCM must be rejected")
    // truncated header rejected, not crashed
    assert(Multimodal.parseWavHeader(wav.take(43)).isEmpty)
  }

  test("q193 JPEG SOF parse: segment walk, BE dims, marker-class rejects") {
    // round-trip through the fabricator: the walk must skip APP0 and COM
    // before finding SOF0, for all three component counts
    for ((nc, w, h) <- Seq((1, 640, 360), (3, 1024, 65535), (4, 65535, 17)))
      assert(Multimodal.parseJpegHeader(Multimodal.jpegHeaderBytes(w, h, nc)) ==
        Some((w.toLong, h.toLong, nc.toLong)), s"round-trip ($w,$h,$nc)")
    val jpg = Multimodal.jpegHeaderBytes(800, 600, 3)
    // dims are UNSIGNED 16-bit big-endian — 40000 > Short.MaxValue must
    // not sign-extend (the PNG suite's BE discipline on the 16-bit fields)
    assert(Multimodal.parseJpegHeader(Multimodal.jpegHeaderBytes(40000, 33000, 3)) ==
      Some((40000L, 33000L, 3L)))
    // C4 (DHT) shares the Cx range but is NOT a frame marker: patching the
    // COM segment into a DHT must still walk past it to the real SOF
    val dht = jpg.clone(); dht(21) = 0xc4.toByte
    assert(Multimodal.parseJpegHeader(dht) == Some((800L, 600L, 3L)),
      "DHT mistaken for SOF (or walk lost)")
    // fill bytes before a marker are consumed (§B.1.1.2)
    val fill = Array(jpg(0), jpg(1), 0xff.toByte) ++ jpg.drop(2)
    assert(Multimodal.parseJpegHeader(fill) == Some((800L, 600L, 3L)),
      "fill byte broke marker sync")
    // standalone markers (TEM) carry no length field: replace the 6-byte
    // COM with three bare FF01 pairs — the walk must step over each
    val tem = jpg.clone()
    Seq(20, 22, 24).foreach { i => tem(i) = 0xff.toByte; tem(i + 1) = 0x01 }
    assert(Multimodal.parseJpegHeader(tem) == Some((800L, 600L, 3L)),
      "standalone marker broke the walk")
    // rejects: no SOI; SOS before any SOF; truncation mid-walk
    val noSoi = jpg.clone(); noSoi(1) = 0x00
    assert(Multimodal.parseJpegHeader(noSoi).isEmpty)
    val sos = jpg.clone(); sos(27) = 0xda.toByte
    assert(Multimodal.parseJpegHeader(sos).isEmpty, "scan-before-SOF must reject")
    (1 until jpg.length - 9).foreach { k =>
      assert(Multimodal.parseJpegHeader(jpg.take(k)).isEmpty, s"truncated at $k")
    }
    // decodePartition routes JPEG through the real parse, not the stub
    val meta = Multimodal.decodePartition(
      Iterator(Multimodal.MediaIn(9L, jpg))).next()
    assert(meta.width == 800 && meta.height == 600 && meta.channels == 3
      && meta.frames == 1, s"decoder did not use the JPEG parse: $meta")
  }

  test("q181 sniff: mismatch cells are exactly the doc_id%7 shift; map-only") {
    import org.apache.spark.sql.functions.col
    val df = graft.queries.Registry.byName("q181_magic_sniff").q(spark, sf)
    val rows = df.collect()
    // direct recompute of the (claimed, detected) matrix from the id rules
    val names = Seq("png", "jpeg", "gif", "wav", "bin")
    val ids = Tables.documents(spark, sf).select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.groupBy { id =>
      val idx = (id % 5).toInt
      val ai = if (id % 7 == 0) (idx + 1) % 5 else idx
      (names(idx), names(ai))
    }.map { case (k, v) => k -> v.length.toLong }
    assert(rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      == expected, "sniff matrix diverges from the id rules")
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getString(0) != r.getString(1)))
      // every mislabeled cell is the one-format shift, never arbitrary
      if (r.getBoolean(4)) {
        val (c, det) = (names.indexOf(r.getString(0)), names.indexOf(r.getString(1)))
        assert((c + 1) % 5 == det, s"unexpected mismatch shape ${r.getString(0)}->${r.getString(1)}")
      }
    }
    // detection is map-only: no exchange before the ≤25-row aggregate's
    df.collect()
    val hashEx = shuffleExchanges(df)
    assert(hashEx.size <= 2, s"q181 shuffles the corpus: ${hashEx.size} exchanges")
  }

  test("q225 parseWavPcm16: exact sample walk, rejects non-16-bit-mono") {
    import graft.operators.Multimodal
    // hand-built 3-sample mono 16-bit WAV: 100, -2, 32767
    val h = Multimodal.wavHeaderBytes(8000, 1, 16, 3)
    val bytes = new Array[Byte](50)
    System.arraycopy(h, 0, bytes, 0, 44)
    for ((v, i) <- Seq(100, -2, 32767).zipWithIndex) {
      bytes(44 + 2 * i) = (v & 0xff).toByte
      bytes(45 + 2 * i) = ((v >> 8) & 0xff).toByte
    }
    assert(Multimodal.parseWavPcm16(bytes) ==
      Some((3L, 100L * 100 + 4 + 32767L * 32767, 1L)))
    assert(Multimodal.parseWavPcm16(
      Multimodal.wavHeaderBytes(8000, 2, 16, 3)).isEmpty, "stereo rejected")
    assert(Multimodal.parseWavPcm16(
      Multimodal.wavHeaderBytes(8000, 1, 24, 3)).isEmpty, "24-bit rejected")
  }

  test("q225 registered audit: buckets partition docs, forced rails visible") {
    val rows = graft.queries.Registry.byName("q225_wav_pcm_audit").q(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "every payload decoded")
    rows.foreach { r =>
      // every 50th sample is a forced rail, so clipping is at least
      // ceil(n/50) per doc summed -- and energy is bounded by n * 32768^2
      assert(r.getLong(4) * 50 >= r.getLong(2), "forced rails undercounted")
      assert(r.getLong(3) <= r.getLong(2) * 32768L * 32768L, "energy bound")
      assert(r.getLong(3) > 0)
    }
  }

  test("q273 GIF parse: LE dims, block walk counts frames, malformed rejects") {
    import graft.operators.Multimodal
    // round-trip across dims and frame counts, incl. >255 (LE second byte)
    for ((w, h, f) <- Seq((80, 60, 1), (300, 250, 5), (479, 309, 3),
                          (65535, 1, 2))) {
      assert(Multimodal.parseGifHeader(Multimodal.gifBytes(w, h, f)) ==
        Some((w.toLong, h.toLong, f.toLong)), s"($w,$h,$f)")
    }
    // a LOCAL color table must be hopped over, not walked into
    val base = Multimodal.gifBytes(100, 50, 1)
    val sep = base.indexOf(0x2c.toByte)
    val withLct = (base.take(sep + 9) :+ 0x80.toByte) ++ // packed: LCT, size 2^1
      Array.fill(3 * 2)(0x7f.toByte) ++ base.drop(sep + 10)
    assert(Multimodal.parseGifHeader(withLct) == Some((100L, 50L, 1L)),
      "local color table must be skipped by size, not parsed as blocks")
    // GIF87a accepted; corrupt signature and lost block sync rejected
    val g87 = base.clone(); g87(4) = '7'
    assert(Multimodal.parseGifHeader(g87) == Some((100L, 50L, 1L)))
    val bad = base.clone(); bad(0) = 'X'
    assert(Multimodal.parseGifHeader(bad).isEmpty)
    val desync = base.clone(); desync(sep) = 0x55
    assert(Multimodal.parseGifHeader(desync).isEmpty, "lost sync must reject")
    // truncation anywhere before the trailer rejects
    for (k <- Seq(5, 12, sep + 3, base.length - 1))
      assert(Multimodal.parseGifHeader(base.take(k)).isEmpty, s"truncated at $k")
    // end-to-end: the registered query's frames come from the walk
    val rows = graft.queries.Registry.byName("q273_gif_decode")
      .q(spark, sf).collect()
    for (r <- rows.take(50)) {
      val id = r.getLong(0)
      assert(r.getLong(1) == 80 + id % 400 && r.getLong(2) == 60 + id % 250)
      assert(r.getLong(3) == 1L && r.getLong(4) == 1 + id % 5)
    }
  }

  test("q286 PDF parse: grammar walk counts objects, trailer read, rejects") {
    import graft.operators.Multimodal
    // round-trip across versions, object counts, linearization
    for ((v, n, lin) <- Seq((0, 2, false), (4, 5, true), (7, 8, false),
                            (3, 1, true))) {
      assert(Multimodal.parsePdfHeader(Multimodal.pdfHeaderBytes(v, n, lin)) ==
        Some((v.toLong, n.toLong, lin, n + 1L)), s"($v,$n,$lin)")
    }
    val base = Multimodal.pdfHeaderBytes(4, 3, linearized = true)
    val txt = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    // /Linearized must be found INSIDE an object body by the walk — a doc
    // whose trailer line merely mentions the token must not set the flag
    val noLin = Multimodal.pdfHeaderBytes(4, 3, linearized = false)
    assert(Multimodal.parsePdfHeader(noLin).exists(!_._3))
    // corrupt magic, a non-"0 obj" generation token, and a missing
    // endobj all reject (the walk loses sync, not just a prefix check)
    val badMagic = base.clone(); badMagic(1) = 'X'
    assert(Multimodal.parsePdfHeader(badMagic).isEmpty)
    val badGen = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("2 0 obj", "2 1 obj")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Multimodal.parsePdfHeader(badGen).isEmpty,
      "an unexpected generation number must desync the walk")
    val noEnd = txt.replaceAll("endobj\n", "endobX\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Multimodal.parsePdfHeader(noEnd).isEmpty)
    // truncation before %%EOF rejects
    assert(Multimodal.parsePdfHeader(base.take(base.length - 3)).isEmpty)
    // end-to-end: registered fields come from the walk, not the synth
    val rows = graft.queries.Registry.byName("q286_pdf_decode")
      .q(spark, sf).collect()
    for (r <- rows.take(50)) {
      val id = r.getLong(0)
      assert(r.getLong(1) == id % 8 && r.getLong(2) == 2 + id % 7)
      assert(r.getBoolean(3) == (id % 2 == 0) && r.getLong(4) == 3 + id % 7)
    }
    assert(rows.forall(_.getLong(1) >= 0), "no sentinel rows on synth input")
  }

  test("q303 GIF LZW: JDK ImageIO agrees pixel-for-pixel; malformed rejects") {
    import graft.operators.Multimodal
    // conformance arbiter: the SAME synthesized bytes through the JDK's
    // own GIF decoder must yield the planted pixels — locks lzwEncode (and
    // therefore lzwDecode, which round-trips it) to the real format's
    // variable-width late-change rules, not merely to each other
    Seq(0L, 1L, 2L, 3L, 7L, 11L, 62L, 499L).foreach { id =>
      val bytes = Multimodal.gifFullBytes(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must accept the synthesized GIF $id")
      val w = (6 + id % 8).toInt; val h = (4 + id % 5).toInt
      assert(img.getWidth == w && img.getHeight == h)
      def palette(i: Int): Int = {
        def ch(j: Int) = ((id * 7 + i * 85 + j * 11) % 256).toInt
        (0xff << 24) | (ch(0) << 16) | (ch(1) << 8) | ch(2)
      }
      for (r <- 0 until h; c <- 0 until w) {
        val want = palette(((id + (r * w + c) / 4) % 4).toInt)
        assert(img.getRGB(c, r) == want,
          s"GIF $id pixel ($r,$c): ImageIO disagrees with the plant — " +
            "the LZW encoder is off-spec")
      }
      // our decoder agrees with the plant too (same digest the oracle pins)
      val Some((dw, dh, _, dg)) = Multimodal.parseGifPixels(bytes)
      var expect = 0L
      for (x <- 0 until w * h)
        expect = (expect * 131 + ((id + x / 4) % 4)) % 2147483647L
      assert(dw == w && dh == h && dg == expect)
    }
    // the ≤16-byte sub-block split is real: payloads big enough to need
    // several blocks still decode (multi-block walk)
    val big = Multimodal.gifFullBytes(6L) // 12x5 = 60 px
    assert(Multimodal.parseGifPixels(big).isDefined)
    // malformations reject, never throw
    def mut(b: Array[Byte], i: Int): Array[Byte] = {
      val x = b.clone(); x(i) = (x(i) ^ 0x01).toByte; x
    }
    assert(Multimodal.parseGifPixels(mut(big, 0)).isEmpty, "bad signature")
    assert(Multimodal.parseGifPixels(big.dropRight(4)).isEmpty, "truncated")
    assert(Multimodal.parseGifPixels(Array.emptyByteArray).isEmpty)
    // corrupt the LZW stream's first data sub-block byte: either an
    // invalid code or a pixel-count mismatch — must reject
    val lzwAt = big.indexOf(0x2c.toByte) + 10 + 1 + 1 // desc + mcs + len byte
    assert(Multimodal.parseGifPixels(mut(big, lzwAt)).isEmpty
      || Multimodal.parseGifPixels(mut(big, lzwAt)).get._4 !=
        Multimodal.parseGifPixels(big).get._4,
      "a corrupted LZW stream must not silently yield the original digest")
  }

  test("q298 pixel decode: real inflate+unfilter; every malformation rejects") {
    import graft.operators.Multimodal
    // both zlib paths and the IDAT split decode to the planted pixels
    Seq(0L, 1L, 2L, 3L, 15L, 62L).foreach { id =>
      val png = Multimodal.pngFullBytes(id)
      val Some((w, h, nIdat, dg)) = Multimodal.parsePngPixels(png)
      assert(w == 8 + id % 9 && h == 4 + id % 7)
      assert(nIdat == (if (id % 2 == 0) 2L else 1L),
        "stored path must decode across the two-IDAT split")
      var expect = 0L
      for (r <- 0 until h.toInt; c <- 0 until w.toInt)
        expect = (expect * 131 +
          ((id * 31 + r * 17 + c * 7) % 251)) % 2147483647L
      assert(dg == expect, s"doc $id pixel digest diverges from the plant")
    }
    // malformations: each one must hit the None sentinel, never throw
    val good = Multimodal.pngFullBytes(2L) // stored path, tEXt, 2 IDATs
    def mut(i: Int): Array[Byte] = {
      val b = good.clone(); b(i) = (b(i) ^ 0x01).toByte; b
    }
    // flip one byte inside the first IDAT payload: chunk CRC must reject
    val idatAt = {
      var i = 8
      while (!(good(i + 4) == 'I' && good(i + 5) == 'D' &&
        good(i + 6) == 'A' && good(i + 7) == 'T')) {
        i += 12 + ((good(i) & 0xff) << 24 | (good(i + 1) & 0xff) << 16 |
          (good(i + 2) & 0xff) << 8 | (good(i + 3) & 0xff))
      }
      i
    }
    assert(Multimodal.parsePngPixels(mut(idatAt + 8)).isEmpty,
      "a flipped IDAT byte must fail the chunk CRC")
    assert(Multimodal.parsePngPixels(good.dropRight(7)).isEmpty,
      "a truncated stream must reject")
    assert(Multimodal.parsePngPixels(mut(0)).isEmpty, "bad signature")
    assert(Multimodal.parsePngPixels(Array.emptyByteArray).isEmpty)
    // IHDR declaring a taller image than IDAT holds: short-stream reject
    // (flip the height LSB and fix the CRC so only the inflate stage sees it)
    val tall = good.clone()
    tall(23) = (tall(23) + 1).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(tall, 12, 17)
    val v = crc.getValue
    tall(29) = ((v >>> 24) & 0xff).toByte; tall(30) = ((v >>> 16) & 0xff).toByte
    tall(31) = ((v >>> 8) & 0xff).toByte; tall(32) = (v & 0xff).toByte
    assert(Multimodal.parsePngPixels(tall).isEmpty,
      "an IHDR/IDAT length disagreement must reject, not mis-digest")
    // registered query: per-doc rows, no sentinels, map-only single scan
    val df = queries.Registry.byName("q298_png_pixel_decode").q(spark, sf)
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sf).count().toInt)
    assert(rows.forall(_.getLong(1) > 0), "no sentinel rows on synth input")
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans == 1, s"q298 must be a single-scan map-only plan, got $scans")
  }

  test("q312 JPEG DC: the JDK's own ImageIO reader agrees pixel-for-pixel") {
    // conformance is not self-referential (the q303 discipline): the same
    // synthesized bytes must decode identically under javax.imageio
    for (id <- Seq(0L, 1L, 5L, 11L, 37L, 123L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.jpegDcBytes(id)))
      assert(img != null, s"ImageIO must read the id=$id JPEG")
      val bw = (1 + id % 4).toInt; val bh = (1 + id % 3).toInt
      assert(img.getWidth == bw * 8 && img.getHeight == bh * 8)
      for (by <- 0 until bh; bx <- 0 until bw) {
        val b = by * bw + bx
        val expect = 128 + (((id * 7 + b * 13) % 200) - 100).toInt
        for (y <- 0 until 8; x <- 0 until 8) {
          val px = img.getRaster.getSample(bx * 8 + x, by * 8 + y, 0)
          assert(px == expect,
            s"id=$id block=$b px($x,$y): ImageIO $px vs planted $expect")
        }
      }
    }
  }

  test("q312 JPEG DC: decode replays the planted DCs; malformation battery") {
    for (id <- Seq(0L, 3L, 10L)) {
      val Some((w, h, n, dg)) =
        Multimodal.parseJpegDcPixels(Multimodal.jpegDcBytes(id))
      assert(w == 8 * (1 + id % 4) && h == 8 * (1 + id % 3))
      var ref = 0L
      for (b <- 0 until n.toInt)
        ref = (ref * 131 + (128 + ((id * 7 + b * 13) % 200) - 100)) %
          2147483647L
      assert(dg == ref, s"id=$id digest replay")
    }
    val good = Multimodal.jpegDcBytes(7L)
    assert(Multimodal.parseJpegDcPixels(good.take(40)).isEmpty, "truncated")
    val noSoi = good.clone(); noSoi(1) = 0x00
    assert(Multimodal.parseJpegDcPixels(noSoi).isEmpty, "bad SOI")
    // truncate the entropy stream: drop the EOI + last scan bytes
    assert(Multimodal.parseJpegDcPixels(good.dropRight(6)).isEmpty,
      "truncated scan must reject, not mis-decode")
    // registered query: no sentinel rows, map-only single scan
    val df = queries.Registry.byName("q312_jpeg_dc_decode").q(spark, sf)
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sf).count().toInt)
    assert(rows.forall(_.getLong(1) > 0), "no sentinel rows on synth input")
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans == 1, s"q312 must be a single-scan map-only plan, got $scans")
  }

  test("q329 JPEG full: ImageIO agrees within the lossy-codec tolerance; " +
    "fixed-point IDCT tracks the exact cosine IDCT") {
    for (id <- Seq(1L, 2L, 5L, 7L, 11L, 43L, 123L)) {
      val bytes = Multimodal.jpegFullBytes(id)
      val Some((w, h, px)) = Multimodal.parseJpegFull(bytes)
      val bw = w / 8
      assert(w == 8 * (1 + id % 4) && h == 8 * (1 + id % 3))
      // conformance against a FOREIGN decoder: unlike the lossless
      // formats (q298 PNG, q303 GIF) pixel equality is NOT required of
      // two compliant JPEG decoders — the spec bounds IDCT accuracy
      // (T.83 class), so the pin is per-pixel agreement within ±1
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must read the id=$id JPEG")
      assert(img.getWidth == w && img.getHeight == h)
      for (b <- 0 until px.length / 64; y <- 0 until 8; x <- 0 until 8) {
        val jdk = img.getRaster.getSample((b % bw) * 8 + x,
          (b / bw) * 8 + y, 0)
        val ours = px(b * 64 + y * 8 + x)
        assert(math.abs(jdk - ours) <= 1,
          s"id=$id block=$b px($x,$y): ImageIO $jdk vs ours $ours")
      }
      // accuracy: the 2048-scale integer basis must land within 1 of the
      // EXACT double-precision IDCT of the planted dequantized
      // coefficients — proving the fixed-point path is a real IDCT, not
      // a self-consistent digest
      def cf(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      for (b <- 0 until px.length / 64) {
        // (natural row, col, dequantized value) of the planted coefs
        val coefs = Seq(
          (0, 0, (((id * 7 + b * 13) % 200) - 100).toDouble * 8),
          (0, 1, {
            val m = 1L + (id + 2L * b) % 7L
            (if ((id + b) % 2L == 0L) m else -m).toDouble * 13
          }),
          (0, 3, {
            val m = 1L + (id * 3L + b) % 7L
            (if ((id + b) % 3L == 0L) m else -m).toDouble * 14
          }),
          (5, 0, {
            val m = 1L + (id + 5L * b) % 5L
            (if (b % 2 == 0) m else -m).toDouble * 14
          }))
        for (y <- 0 until 8; x <- 0 until 8) {
          val exact = coefs.map { case (r, c, v) =>
            0.25 * cf(r) * cf(c) * v *
              math.cos((2 * y + 1) * r * math.Pi / 16.0) *
              math.cos((2 * x + 1) * c * math.Pi / 16.0)
          }.sum
          val ideal = math.min(255.0, math.max(0.0, 128.0 + exact))
          assert(math.abs(px(b * 64 + y * 8 + x) - ideal) <= 1.0,
            s"id=$id block=$b px($x,$y): fixed-point vs exact IDCT")
        }
      }
    }
  }

  test("q333 YCbCr 4:2:0: ImageIO agrees per channel within the lossy " +
    "tolerance; planted replay; malformation battery") {
    for (id <- Seq(1L, 2L, 3L, 5L, 11L, 72L)) {
      val bytes = Multimodal.jpegYccBytes(id)
      val Some((w, h, px)) = Multimodal.parseJpegYcc(bytes)
      assert(w == 16 * (1 + id % 2) && h == 16)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must read the id=$id color JPEG")
      assert(img.getWidth == w && img.getHeight == h)
      // per-channel conformance: Y carries ±1 IDCT tolerance and the
      // color conversion compounds it — allow ±2 per channel
      for (b <- 0 until px.length / 192; y <- 0 until 8; x <- 0 until 8) {
        val (mcu, yb) = (b / 4, b % 4)
        val ix = mcu * 16 + (yb % 2) * 8 + x
        val iy = (yb / 2) * 8 + y
        val rgb = img.getRGB(ix, iy)
        val o = (b * 64 + y * 8 + x) * 3
        assert(math.abs(((rgb >> 16) & 0xff) - px(o)) <= 2,
          s"id=$id b=$b ($x,$y) R: ImageIO ${(rgb >> 16) & 0xff} vs ${px(o)}")
        assert(math.abs(((rgb >> 8) & 0xff) - px(o + 1)) <= 2,
          s"id=$id b=$b ($x,$y) G")
        assert(math.abs((rgb & 0xff) - px(o + 2)) <= 2,
          s"id=$id b=$b ($x,$y) B")
      }
      // planted replay: flat chroma collapses to exact per-image R/G/B
      // adjustments; luma replays the closed form through the real basis
      val cb = ((id * 3) % 121 - 60).toInt
      val cr = ((id * 7) % 121 - 60).toInt
      def descale(v: Long): Int = ((v + 32768L) >> 16).toInt
      val (rA, gA, bA) = (descale(91881L * cr),
        descale(-22554L * cb - 46802L * cr), descale(116130L * cb))
      for (b <- 0 until px.length / 192; y <- 0 until 8; x <- 0 until 8) {
        val coef = new Array[Int](64)
        coef(0) = (((id * 5 + b * 11) % 160) - 80).toInt * 8
        val m = (1L + (id + 3L * b) % 7L).toInt
        coef(1) = (if ((id + b) % 2 == 0) m else -m) * 13
        val yp = Multimodal.idctBlock(coef)(y * 8 + x)
        val o = (b * 64 + y * 8 + x) * 3
        assert(px(o) == math.min(255, math.max(0, yp + rA)), "R replay")
        assert(px(o + 1) == math.min(255, math.max(0, yp + gA)), "G replay")
        assert(px(o + 2) == math.min(255, math.max(0, yp + bA)), "B replay")
      }
    }
    // lane + malformation battery
    assert(Multimodal.parseJpegYcc(Multimodal.jpegYccBytes(0L)).isEmpty)
    assert(Multimodal.parseJpegYcc(Multimodal.jpegYccBytes(71L)).isEmpty)
    val good = Multimodal.jpegYccBytes(3L)
    assert(Multimodal.parseJpegYcc(good.take(60)).isEmpty, "truncated")
    assert(Multimodal.parseJpegYcc(good.dropRight(6)).isEmpty,
      "truncated scan")
    // q329's grayscale parser must refuse the color stream and vice versa
    assert(Multimodal.parseJpegFull(good).isEmpty,
      "grayscale parser rejects 3-component SOF")
    assert(Multimodal.parseJpegYcc(Multimodal.jpegFullBytes(3L)).isEmpty,
      "color parser rejects 1-component SOF")
  }

  test("q334 JPEG restarts: ImageIO agrees over restart-laden bytes; " +
    "marker-discipline battery") {
    for (id <- Seq(2L, 5L, 11L, 74L)) { // up to 12 blocks → 6 intervals
      val bytes = Multimodal.jpegRstBytes(id)
      val Some((w, h, px)) = Multimodal.parseJpegFull(bytes)
      assert(w == 8 * (1 + id % 4) && h == 8 * (1 + id % 3))
      // pixels must equal the q329 closed form at seed id+7 — restarts
      // are an encoding-layer feature and may not change a single sample
      for (b <- 0 until px.length / 64) {
        val coef = new Array[Int](64)
        def q(n: Int): Int = 8 + (3 * (n / 8) + 5 * (n % 8)) % 9
        val seed = id + 7
        coef(0) = (((seed * 7 + b * 13) % 200) - 100).toInt * q(0)
        val m1 = (1L + (seed + 2L * b) % 7L).toInt
        coef(1) = (if ((seed + b) % 2 == 0) m1 else -m1) * q(1)
        val m2 = (1L + (seed * 3L + b) % 7L).toInt
        coef(3) = (if ((seed + b) % 3 == 0) m2 else -m2) * q(3)
        val m3 = (1L + (seed + 5L * b) % 5L).toInt
        coef(40) = (if (b % 2 == 0) m3 else -m3) * q(40)
        val ideal = Multimodal.idctBlock(coef)
        for (j <- 0 until 64)
          assert(px(b * 64 + j) == ideal(j), s"id=$id b=$b j=$j replay")
      }
      // foreign-decoder conformance over the restart-laden stream
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must read the id=$id restart JPEG")
      val bw = w / 8
      for (b <- 0 until px.length / 64; y <- 0 until 8; x <- 0 until 8) {
        val jdk = img.getRaster.getSample((b % bw) * 8 + x,
          (b / bw) * 8 + y, 0)
        assert(math.abs(jdk - px(b * 64 + y * 8 + x)) <= 1,
          s"id=$id b=$b ($x,$y): ImageIO $jdk vs ${px(b * 64 + y * 8 + x)}")
      }
    }
    // marker-discipline battery (id 11 → 12 blocks, 6 segments, 5 RSTs)
    val good = Multimodal.jpegRstBytes(11L)
    assert(Multimodal.parseJpegFull(good).isDefined)
    // falsify the first RSTn's index: the cycle check must refuse
    val rstAt = {
      var i = -1
      var p = 2
      while (i < 0 && p + 1 < good.length) {
        if ((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == 0xd0) i = p
        else p += 1
      }
      i
    }
    assert(rstAt > 0)
    val badSeq = good.clone(); badSeq(rstAt + 1) = 0xd3.toByte
    assert(Multimodal.parseJpegFull(badSeq).isEmpty,
      "broken RSTn cycle must be malformed")
    // the % 73 truncation lane
    assert(Multimodal.parseJpegFull(Multimodal.jpegRstBytes(0L)).isEmpty)
    assert(Multimodal.parseJpegFull(Multimodal.jpegRstBytes(73L)).isEmpty)
    // a restart-free stream still decodes (q329 regression, same parser)
    assert(Multimodal.parseJpegFull(Multimodal.jpegFullBytes(11L)).isDefined)
  }

  test("q337 Exif: walk replays the planted metadata; carrying JPEG still " +
    "decodes; malformation battery") {
    val P = 2147483647L
    def strDg(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 131L + c) % P)
    for (id <- Seq(1L, 5L, 42L, 90L)) {
      val bytes = Multimodal.jpegExifBytes(id)
      val Some((ok, o, ddg, tdg)) = Multimodal.parseJpegExif(bytes)
      assert(ok == 1L && o == 1 + id % 8, s"id=$id orientation")
      assert(ddg == strDg(s"doc $id"), s"id=$id description digest")
      assert(tdg == strDg(
        f"2026:08:16 00:${id % 60}%02d:${(id * 7) % 60}%02d"),
        s"id=$id datetime digest")
      // the APP1 splice must not break the image: the same bytes still
      // decode through the full pixel path AND through ImageIO
      assert(Multimodal.parseJpegFull(bytes).isDefined,
        s"id=$id carrying stream decodes")
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) != null,
        s"id=$id ImageIO reads the Exif-bearing JPEG")
    }
    // the % 89 lane: parses, orientation 0 is outside 1..8
    val Some((ok89, o89, _, _)) =
      Multimodal.parseJpegExif(Multimodal.jpegExifBytes(89L))
    assert(ok89 == 0L && o89 == 0L, "invalid orientation flagged, not lost")
    // malformation battery
    val good = Multimodal.jpegExifBytes(5L)
    assert(Multimodal.parseJpegExif(Multimodal.jpegFullBytes(5L)).isEmpty,
      "a JPEG without APP1/Exif has no metadata to walk")
    val badMagic = good.clone(); badMagic(12) = 'M' // TIFF endian flag
    assert(Multimodal.parseJpegExif(badMagic).isEmpty, "non-II TIFF")
    assert(Multimodal.parseJpegExif(good.take(30)).isEmpty, "truncated")
    // corrupt the first IFD entry's tag (layout: SOI 2 + APP1 hdr 10 →
    // TIFF at 12, IFD0 at 20, first tag at 22, little-endian): the tag
    // becomes 0x01FF > 0x0112, so the ascending-order check refuses
    val swapped = good.clone()
    swapped(22) = 0xff.toByte
    assert(Multimodal.parseJpegExif(swapped).isEmpty,
      "tag-order violation must be malformed")
  }

  test("q338 PNG text chunks: metadata replays; ImageIO still reads; " +
    "illegal-method lane; malformation battery") {
    val P = 2147483647L
    def strDg(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 131L + c) % P)
    for (id <- Seq(1L, 4L, 42L, 98L)) {
      val bytes = Multimodal.pngMetaBytes(id)
      val Some((nTxt, nBad, kw, tx)) = Multimodal.parsePngMeta(bytes)
      assert(nTxt == 2L && nBad == 0L)
      assert(kw == (strDg("Title") + strDg("Comment")) % P, s"id=$id kw")
      assert(tx == (strDg(s"Doc $id") +
        strDg(s"synthetic corpus document $id, lane ${id % 5}")) % P,
        s"id=$id txt")
      // the carrier is a REAL PNG: ImageIO reads it (1×1 gray)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 1 && img.getHeight == 1)
      assert(img.getRaster.getSample(0, 0, 0) == ((id * 31) % 251).toInt,
        s"id=$id planted pixel through ImageIO")
    }
    // the % 97 lane: chunk + CRC parse, method is illegal → counted
    val Some((n97, b97, _, _)) =
      Multimodal.parsePngMeta(Multimodal.pngMetaBytes(97L))
    assert(n97 == 1L && b97 == 1L, "illegal zTXt method counted, not lost")
    // malformation battery
    val good = Multimodal.pngMetaBytes(4L)
    assert(Multimodal.parsePngMeta(good.dropRight(4)).isEmpty,
      "truncated IEND CRC")
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc(badCrc.length - 1) ^ 1).toByte
    assert(Multimodal.parsePngMeta(badCrc).isEmpty, "flipped CRC bit")
    // corrupt the zTXt zlib body (after 'Comment\0' + method): Inflater
    // must refuse — find the chunk, flip a payload byte
    val zAt = {
      var i = -1; var p = 8
      while (i < 0 && p + 8 <= good.length) {
        if (new String(good, p + 4, 4, "US-ASCII") == "zTXt") i = p
        else p += 1
      }
      i
    }
    assert(zAt > 0)
    val badZ = good.clone()
    badZ(zAt + 8 + 9 + 2) = (badZ(zAt + 8 + 9 + 2) ^ 0x55).toByte
    assert(Multimodal.parsePngMeta(badZ).isEmpty,
      "corrupted zlib body must fail CRC or inflate, not mis-decode")
  }

  test("q329 JPEG full: malformation battery, lane, and plan shape") {
    // the % 61 truncation lane refuses to decode
    assert(Multimodal.parseJpegFull(Multimodal.jpegFullBytes(0L)).isEmpty)
    assert(Multimodal.parseJpegFull(Multimodal.jpegFullBytes(61L)).isEmpty)
    val good = Multimodal.jpegFullBytes(7L)
    assert(Multimodal.parseJpegFull(good.take(40)).isEmpty, "truncated")
    val noSoi = good.clone(); noSoi(1) = 0x00
    assert(Multimodal.parseJpegFull(noSoi).isEmpty, "bad SOI")
    assert(Multimodal.parseJpegFull(good.dropRight(6)).isEmpty,
      "truncated scan must reject, not mis-decode")
    // a zeroed quant entry must be rejected (division-free check)
    val badQ = good.clone()
    badQ(2 + 18 + 5) = 0 // first DQT payload byte (after SOI+APP0+DQT hdr)
    assert(Multimodal.parseJpegFull(badQ).isEmpty, "zero quant entry")
    // registered query: per-source rollup, ok everywhere but the lane,
    // map-only single scan before the one exchange
    val df = queries.Registry.byName("q329_jpeg_full_decode").q(spark, sf)
    val rows = df.collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val ds = bySrc(r.getString(0))
      assert(r.getLong(1) == ds.length.toLong, "n_images")
      assert(r.getLong(2) == ds.count(_._2 % 61 == 0).toLong, "n_bad")
    }
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans == 1, s"q329 must be a single-scan plan, got $scans")
  }

  test("q341 progressive JPEG: ImageIO accepts the six-scan SOF2 stream " +
    "and agrees within the lossy tolerance; pixels equal the baseline " +
    "closed form; malformation battery") {
    for (id <- Seq(1L, 2L, 5L, 7L, 11L, 43L, 123L)) {
      val bytes = Multimodal.jpegProgBytes(id)
      // scan-structure pin: one SOF2 marker, SIX scans (DC first, two
      // AC spectral bands, DC refinement, two AC refinements) — the
      // stream really is progressive, not a relabeled baseline
      def countMarker(m: Int): Int =
        (0 until bytes.length - 1).count(j =>
          (bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == m)
      assert(countMarker(0xc2) == 1 && countMarker(0xc0) == 0, "SOF2 only")
      assert(countMarker(0xda) == 6, "six scans")
      val Some((w, h, px)) = Multimodal.parseJpegProg(bytes)
      assert(w == 8 * (1 + id % 4) && h == 8 * (1 + id % 3))
      val bw = w / 8
      // pixel equality with the baseline closed form at seed id + 11 is
      // the ORACLE comparison (JpegProgOracle = jpegPixOracleSql at the
      // shifted seed) — here the pin is the FOREIGN decoder on the
      // progressive bytes: a refinement-grammar bug of even one bit
      // desynchronizes ImageIO's decode and breaks the ±1 agreement
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must read the id=$id progressive JPEG")
      assert(img.getWidth == w && img.getHeight == h)
      for (b <- 0 until px.length / 64; y <- 0 until 8; x <- 0 until 8) {
        val jdk = img.getRaster.getSample((b % bw) * 8 + x,
          (b / bw) * 8 + y, 0)
        val ours = px(b * 64 + y * 8 + x)
        assert(math.abs(jdk - ours) <= 1,
          s"id=$id block=$b px($x,$y): ImageIO $jdk vs ours $ours")
      }
      // the newly-nonzero grammar is really exercised: at least one
      // planted coefficient must have |v| = 1 somewhere in the corpus
      // sample (it vanishes in the Al=1 first pass and only the
      // refinement scan can restore it)
    }
    val seeds = Seq(1L, 2L, 5L, 7L, 11L, 43L, 123L)
    assert(seeds.exists { id =>
      val s = id + 11
      (0 until ((1 + id % 4) * (1 + id % 3)).toInt).exists { b =>
        (1L + (s + 2L * b) % 7L) == 1L || (1L + (s * 3L + b) % 7L) == 1L ||
          (1L + (s + 5L * b) % 5L) == 1L
      }
    }, "sample must exercise newly-nonzero insertion")
    // the % 67 truncation lane and the battery
    assert(Multimodal.parseJpegProg(Multimodal.jpegProgBytes(67L)).isEmpty)
    assert(Multimodal.parseJpegProg(Multimodal.jpegProgBytes(0L)).isEmpty)
    val good = Multimodal.jpegProgBytes(7L)
    assert(Multimodal.parseJpegProg(good.take(40)).isEmpty, "truncated")
    assert(Multimodal.parseJpegProg(good.dropRight(6)).isEmpty,
      "truncated final scan must reject")
    // a BASELINE stream must be refused by the progressive decoder and
    // vice versa — no cross-wiring between the two entry points
    assert(Multimodal.parseJpegProg(Multimodal.jpegFullBytes(7L)).isEmpty,
      "baseline refused by the progressive decoder")
    assert(Multimodal.parseJpegFull(good).isEmpty,
      "progressive refused by the baseline decoder")
    // registered query: lane accounting per source
    val df = queries.Registry.byName("q341_jpeg_progressive").q(spark, sf)
    val rows = df.collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val ds = bySrc(r.getString(0))
      assert(r.getLong(1) == ds.length.toLong, "n_images")
      assert(r.getLong(2) == ds.count(_._2 % 67 == 0).toLong, "n_bad")
    }
    val nscans = flattenPlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(nscans == 1, s"q341 must be a single-scan plan, got $nscans")
  }
}
