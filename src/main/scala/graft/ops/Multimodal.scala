package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side plumbing (schema, partition-wise batch processing, typed
  * records) is REAL; the media decode itself is a clearly-marked
  * DETERMINISTIC STUB (`stubDecode`) because no image/audio codec libraries
  * ship in this container — swap `stubDecode` for an actual decoder (e.g.
  * javax.imageio / ffmpeg bindings) without touching the plan shape. The
  * stub's outputs are pure functions of the payload bytes, so the pipeline
  * stays correctness-checkable end-to-end.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, mime: String, width: Int,
      height: Int, payload: Array[Byte])

  /** Decoded features per asset (frame count + a feature vector head). */
  final case class DecodedRecord(doc_id: Long, mime: String, byte_len: Long,
      n_frames: Int, feature0: Double)

  /** Fabricate a media table from the documents corpus: payload = UTF-8
    * bytes of the text, metadata derived from doc fields. Stands in for a
    * real binary source (parquet/tar shards of images). */
  def fabricateFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/fake").as("mime"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** ======== STUB ========
    * Deterministic fake decode: a real implementation would parse the codec
    * stream here. Kept byte-driven so results are reproducible and
    * oracle-checkable. */
  def stubDecode(payload: Array[Byte]): (Int, Double) = {
    val len = payload.length
    (len / 100 + 1, (len % 97) / 97.0)
  }

  /** Partition-wise decode/feature-extract — the batch boundary a real
    * decoder needs (one codec context per partition, not per row). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real decoder init would happen once per partition here
      it.map { m =>
        val (frames, f0) = stubDecode(m.payload)
        DecodedRecord(m.doc_id, m.mime, m.payload.length.toLong, frames, f0)
      }
    }
  }
}
