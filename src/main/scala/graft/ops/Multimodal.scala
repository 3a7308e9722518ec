package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: media as opaque binary columns + typed metadata,
  * decoded/feature-extracted per partition. The Spark-side shape — binary
  * payload column, metadata struct, typed Dataset, mapPartitions batch
  * processing — is the real 100 TB pattern (one decoder init per partition,
  * not per row); the decode itself is a deterministic stub because no
  * image/audio codecs exist in this container (payload here is UTF-8 text
  * bytes standing in for image bytes).
  */
object Multimodal {

  /** Input row: opaque payload + mime tag, as a decoder would receive it. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features. A real decoder would add width/height/duration here. */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      first_byte: Int,
      payload_md5: String)

  /** STUB for the actual media decode (no codec libs in this container): the
    * per-partition init (MessageDigest here, a real decoder in production) and
    * the per-row byte-level feature extraction are the real plumbing. */
  private def decodePartition(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    val md = MessageDigest.getInstance("MD5") // one init per partition
    rows.map { r =>
      md.reset()
      val digest = md.digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = r.doc_id,
        mime = r.mime,
        n_bytes = r.payload.length.toLong,
        first_byte = if (r.payload.isEmpty) -1 else r.payload(0) & 0xff,
        payload_md5 = digest)
    }
  }

  val decode: Q = Q(
    "q24_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("mime"))
        .as[MediaRow]
        .mapPartitions(decodePartition)
        .toDF()
    },
    // texts are ASCII → octet_length == length and ascii(text) == first byte
    Some("""SELECT doc_id, 'text/plain' AS mime,
      CAST(length(text) AS BIGINT) AS n_bytes,
      CAST(ascii(text) AS INT) AS first_byte,
      md5(text) AS payload_md5
      FROM documents"""))

  /** One sampled, resized frame. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Long,
      resized_md5: String)

  private val frameSize = 64 // bytes per fake "video frame"
  private val sampleEvery = 4 // keep every 4th frame

  /** STUB decode for frame sampling + resize (the video-pipeline shape):
    * split the payload into fixed-size frames, keep every `sampleEvery`-th,
    * "resize" by 2× byte downsampling, fingerprint the result. Per-partition
    * decoder init + multi-row-per-input flatMap is exactly how a real
    * ffmpeg/PIL batch stage is shaped on Spark. */
  private def framePartition(rows: Iterator[MediaRow]): Iterator[FrameRow] = {
    val md = MessageDigest.getInstance("MD5") // one init per partition
    rows.flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex.collect {
        case (frame, i) if i % sampleEvery == 0 =>
          val resized = frame.zipWithIndex.collect { case (b, j) if j % 2 == 0 => b }
          md.reset()
          FrameRow(r.doc_id, i, frame.length.toLong,
            md.digest(resized).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Frame-sample + resize over the binary payload column (q47). Oracled:
    * the corpus is ASCII (asserted by q24's oracle), so byte slicing equals
    * character slicing and DuckDB can reproduce every sampled, downsampled
    * frame fingerprint. */
  val frames: Q = Q(
    "q47_multimodal_frames",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("video/fake").as("mime"))
        .as[MediaRow]
        .mapPartitions(framePartition)
        .toDF()
    },
    Some(s"""WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, (length(text) + ${frameSize - 1}) // $frameSize)) AS i
        FROM documents
      ), sampled AS (
        SELECT doc_id, i AS frame_idx,
               substr(text, CAST(i * $frameSize + 1 AS INT), $frameSize) AS frame
        FROM f WHERE i % $sampleEvery = 0
      )
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             CAST(length(frame) AS BIGINT) AS n_bytes,
             md5(array_to_string(
               list_transform(range(1, length(frame) + 1, 2),
                              j -> substr(frame, CAST(j AS INT), 1)), '')) AS resized_md5
      FROM sampled"""))

  val all: Seq[Q] = Seq(decode, frames)
}
