package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

/** Extracted features for one media item. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, sha256: String,
                         feature: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched decode/feature-extraction over partitions.
  *
  * The decode step is a clearly-marked STUB (media codecs aren't in this
  * container): [[decodeStub]] produces a deterministic fake feature from the
  * payload bytes. Everything around it — schema, typed Dataset plumbing,
  * per-partition batching shape, partition sizing — is the real 100 TB
  * design: payloads never hit the driver, feature extraction is
  * `mapPartitions` with an amortized per-batch "model" warm-up, and metadata
  * (length/checksum) is computed as codegen'd column expressions without
  * materializing the payload twice.
  */
object Multimodal {

  /** Wrap a text corpus as binary media records (the opaque-payload shape an
    * image/audio column would have).
    */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
                encode(col("text"), "UTF-8").as("payload"),
                lit("text/plain").as("mime"))

  /** Metadata over the binary column — pure column expressions (byte length +
    * sha256 checksum), no decode, codegen'd.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
                 octet_length(col("payload")).cast("long").as("n_bytes"),
                 sha2(col("payload"), 256).as("sha256"))

  /** STUB decode: a real pipeline would decode the payload (image decode,
    * audio resample, video frame-sample) here. This fake is deterministic —
    * an 8-lane folded byte histogram scaled to [0,1) — so the plumbing is
    * testable without codecs.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Batched feature extraction: `mapPartitions` with fixed-size batches —
    * the shape a vectorized model runner needs (load weights once per
    * partition, infer per batch). Returns a typed Dataset.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition warm-up would happen here (model load / codec init)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, payload) =>
            val digest = java.security.MessageDigest.getInstance("SHA-256")
              .digest(payload).map("%02x".format(_)).mkString
            MediaFeatures(id, payload.length, digest, decodeStub(payload))
          }
        }
      }
  }
}
