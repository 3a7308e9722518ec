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

  val all: Seq[Q] = Seq(decode)
}
