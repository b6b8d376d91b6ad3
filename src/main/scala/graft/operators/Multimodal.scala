package graft.operators

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata extracted by a batched per-partition decode.
  *
  * The decode itself is a STUB (this container has no image/audio codecs) —
  * [[stubDecode]] derives deterministic fake dimensions from the payload
  * bytes — but the Spark-side plumbing is real and is what matters at scale:
  * a typed `Dataset[MediaIn] → mapPartitions → Dataset[MediaMeta]` pipeline
  * that (a) never materializes more than one batch of payloads per task,
  * (b) keeps the binary column out of every downstream projection (column
  * pruning drops it after decode), and (c) processes fixed-size batches the
  * way a vectorized decoder (or a GPU) would want them.
  */
object Multimodal {

  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long,
      frames: Long)

  /** Decode batch size — the shape a real vectorized decoder would consume. */
  val decodeBatchSize = 64

  /** STUB decoder: a real implementation would parse the container header
    * (JPEG/PNG/WAV/MP4) here. Deterministic fake: dimensions derived from the
    * byte length, replicated exactly by the SQL oracle.
    */
  def stubDecode(m: MediaIn): MediaMeta = {
    val n = m.payload.length.toLong
    MediaMeta(
      doc_id = m.doc_id,
      n_bytes = n,
      width = 16L + (n % 64) * 16,
      height = 16L + (n % 48) * 16,
      channels = 1L + n % 3,
      frames = 1L + n % 24)
  }

  def decodePartition(rows: Iterator[MediaIn]): Iterator[MediaMeta] =
    rows.grouped(decodeBatchSize).flatMap(_.iterator.map(stubDecode))

  /** documents.text reinterpreted as a binary media payload → decoded
    * metadata. The parquet scan reads only (doc_id, text); after decode the
    * payload is gone from the schema.
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(decodePartition)
      .toDF()
      .orderBy(col("doc_id"))
  }

  final case class FrameFeat(doc_id: Long, frame_id: Long, feat: Long)

  /** STUB per-frame feature extractor — a real one would decode the frame
    * and run a vision model over the batch; the fake is exact integer math
    * the SQL oracle replicates. Frame SAMPLING is the real logic: every
    * ceil(frames/4)-th frame, ≤4 frames per doc regardless of length — the
    * standard way video work is bounded per item at scale.
    */
  def framePartition(rows: Iterator[MediaMeta]): Iterator[FrameFeat] =
    rows.grouped(decodeBatchSize).flatMap(_.iterator.flatMap { m =>
      val step = (m.frames + 3) / 4 // ceil: at most 4 sampled frames per doc
      (0L until m.frames by step)
        .map(f => FrameFeat(m.doc_id, f, (m.n_bytes * (f + 1)) % 997))
    })

  /** Frame-sample + feature-extract over the decoded metadata: the second
    * stage of the media pipeline, same typed batched mapPartitions shape as
    * the decode (1→N generator per doc, payload long since pruned away).
    */
  def frameFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(decodePartition)
      .mapPartitions(framePartition)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("feat")).as("feat_sum"),
        min(col("feat")).as("feat_min"))
      .orderBy(col("doc_id"))
  }

  final case class ResizedMeta(
      doc_id: Long,
      width: Long,
      height: Long,
      out_w: Long,
      out_h: Long,
      scale_pct: Long)

  /** STUB resize planner — fit-within-224×224 preserving aspect ratio, all
    * in exact integer math (percentages scaled by 100) so the SQL oracle
    * reproduces it. A real implementation would hand each batch to a
    * vectorized image library; the shape that matters at scale is identical:
    * metadata-only planning first, payload work batched per partition.
    */
  def resizePlan(m: MediaMeta): ResizedMeta = {
    val target = 224L
    // scale_pct = floor(100 * target / max(dim)), capped at 100 (never upscale)
    val pct = math.min(100L, 100L * target / math.max(m.width, m.height))
    ResizedMeta(
      doc_id = m.doc_id,
      width = m.width,
      height = m.height,
      out_w = m.width * pct / 100,
      out_h = m.height * pct / 100,
      scale_pct = pct)
  }

  def resizePartition(rows: Iterator[MediaMeta]): Iterator[ResizedMeta] =
    rows.grouped(decodeBatchSize).flatMap(_.iterator.map(resizePlan))

  val entries: Seq[Entry] = Seq(
    Entry(
      "q43_multimodal_meta",
      mediaMeta,
      Some("""WITH b AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents)
             |SELECT doc_id, n AS n_bytes,
             | 16 + (n % 64) * 16 AS width,
             | 16 + (n % 48) * 16 AS height,
             | 1 + n % 3 AS channels,
             | 1 + n % 24 AS frames
             |FROM b ORDER BY doc_id""".stripMargin)),
    // q78: decode → resize — the remaining stage of the media pipeline
    // (decode q43, frame-sample/feature q70, resize here), aggregated per
    // scale bucket so the result is compact and fully oracle-checkable.
    Entry(
      "q78_media_resize",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaIn]
          .mapPartitions(decodePartition)
          .mapPartitions(resizePartition)
          .groupBy(col("scale_pct"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("out_w") * col("out_h")).as("out_pixels"),
            max(col("out_w")).as("max_w"),
            max(col("out_h")).as("max_h"))
          .orderBy(col("scale_pct"))
      },
      Some("""WITH b AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents),
             |m AS (SELECT doc_id,
             |        16 + (n % 64) * 16 AS width,
             |        16 + (n % 48) * 16 AS height
             |      FROM b),
             |r AS (SELECT doc_id, width, height,
             |        least(100, 100 * 224 // greatest(width, height)) AS scale_pct
             |      FROM m),
             |z AS (SELECT doc_id, scale_pct,
             |        width * scale_pct // 100 AS out_w,
             |        height * scale_pct // 100 AS out_h
             |      FROM r)
             |SELECT scale_pct, count(*) AS n,
             | CAST(sum(out_w * out_h) AS BIGINT) AS out_pixels,
             | max(out_w) AS max_w, max(out_h) AS max_h
             |FROM z GROUP BY scale_pct ORDER BY scale_pct""".stripMargin)),

    Entry(
      "q70_frame_features",
      frameFeatures,
      Some("""WITH b AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents),
             |m AS (SELECT doc_id, n, 1 + n % 24 AS frames FROM b),
             |f AS (SELECT doc_id, n,
             |        unnest(range(0, frames, (frames + 3) // 4)) AS fid
             |      FROM m)
             |SELECT doc_id, count(*) AS n_frames,
             | CAST(sum((n * (fid + 1)) % 997) AS BIGINT) AS feat_sum,
             | CAST(min((n * (fid + 1)) % 997) AS BIGINT) AS feat_min
             |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
