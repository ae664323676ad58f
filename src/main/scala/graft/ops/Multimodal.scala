package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

/** Extracted features for one media item. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, sha256: String,
                         feature: Array[Float])

/** One GRFT-container media item (see [[Multimodal.packSamples]]). */
case class GrftMedia(vec_id: Long, payload: Array[Byte])

/** Integer-exact features decoded from one GRFT payload. */
case class GrftFeatures(vec_id: Long, n_samples: Long, sum_fp: Long,
                        peak_fp: Long, energy_fp: Long)

/** One sampled frame of a GRFT payload's sample stream. */
case class GrftFrame(vec_id: Long, frame_no: Long, n_samples: Long,
                     sum_fp: Long, peak_fp: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched decode/feature-extraction over partitions.
  *
  * Two decode paths, both REAL (the round-6 `decodeStub` is retired):
  *  - a binary media container ("GRFT": magic + sample count
  *    + scale header, int32 fixed-point PCM-style samples) built from the
  *    embeddings table, decoded by [[decodeSamples]] (header validation,
  *    sample extraction) and reduced to integer-exact features
  *    ([[mediaFeatures]]). Because the samples are fixed-point, every
  *    feature is exact 64-bit arithmetic and the `multimodal_features`
  *    catalog row hash-matches a DuckDB oracle computing the same numbers
  *    from the numeric source column — the decode round-trip itself is what
  *    the hash pins (an encode or parse bug anywhere breaks it);
  *  - [[decodeText]] — strict UTF-8 decode for `text/`-prefixed mimes (malformed
  *    byte sequences fail loudly, never replacement-char'd), reduced by
  *    [[textFeatures]] to an integer-exact 8-lane profile; the
  *    `multimodal_text_features` catalog row hashes this path against a
  *    DuckDB twin computing the same counts from the source text column.
  *    Image/audio/video codecs stay out of scope for an oracle-checked
  *    engine: [[extractFeatures]] REJECTS unknown mimes loudly instead of
  *    faking a decode.
  *
  * Everything around them — schema, typed Dataset plumbing, per-partition
  * batching shape, partition sizing — is the real 100 TB design: payloads
  * never hit the driver, feature extraction is `mapPartitions` with an
  * amortized per-batch "model" warm-up, and metadata (length/checksum) is
  * computed as codegen'd column expressions without materializing the
  * payload twice.
  */
object Multimodal {

  /** GRFT container magic ("GRFT" big-endian) and fixed-point scale. */
  val GrftMagic: Int = 0x47524654
  val GrftScale: Int = 1000000

  /** Pack fixed-point samples into a GRFT payload: int32 magic, int32
    * sample count, int32 scale, then big-endian int32 samples.
    */
  def packSamples(samples: Array[Int]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + 4 * samples.length)
    buf.putInt(GrftMagic).putInt(samples.length).putInt(GrftScale)
    samples.foreach(buf.putInt)
    buf.array()
  }

  /** Decode a GRFT payload back to its samples — the REAL decode step:
    * validates magic, declared count vs physical length, and scale before
    * touching the sample region. Malformed payloads fail loudly (a silent
    * zero-fill would poison downstream statistics).
    */
  def decodeSamples(payload: Array[Byte]): Array[Int] = {
    require(payload.length >= 12, s"GRFT payload too short: ${payload.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(payload)
    val magic = buf.getInt()
    require(magic == GrftMagic, f"bad GRFT magic: 0x$magic%08x")
    val n = buf.getInt()
    require(n >= 0 && payload.length == 12 + 4L * n,
      s"GRFT length mismatch: declared $n samples, ${payload.length} bytes")
    val scale = buf.getInt()
    require(scale == GrftScale, s"unsupported GRFT scale: $scale")
    Array.fill(n)(buf.getInt())
  }

  /** Embeddings → GRFT media records. The fixed-point conversion
    * (`round(e·10⁶)` per component) runs as a codegen'd column expression —
    * the repo's standard engine-portable rounding — and only the byte
    * packing happens in the typed map, so the payload's sample values are
    * exactly what a SQL twin computes from the source column.
    */
  def encodeEmbeddings(spark: SparkSession, embeddings: DataFrame): Dataset[GrftMedia] = {
    import spark.implicits._
    embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
              expr("transform(embedding, e -> CAST(round(e * 1000000.0, 0) AS INT))").as("fp"))
      .as[(Long, Array[Int])]
      .map { case (id, fp) => GrftMedia(id, packSamples(fp)) }
  }

  /** Batched decode + feature extraction over GRFT payloads: `mapPartitions`
    * in fixed-size batches (the vectorized-model-runner shape), producing
    * integer-exact features per item — sample count, fixed-point sum, peak
    * magnitude, energy (Σ fp²; |fp| ≤ 2^24 ⇒ a 64-dim energy stays well
    * under 2^63). All 64-bit integer arithmetic: no reduction-order or
    * rounding hazards, which is what lets the catalog hash the decode
    * round-trip against a DuckDB twin.
    */
  def mediaFeatures(spark: SparkSession, media: Dataset[GrftMedia],
                    batchSize: Int = 64): Dataset[GrftFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition warm-up would happen here (codec / model init)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val s = decodeSamples(m.payload)
          var sum = 0L; var peak = 0L; var energy = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sum += v
            val a = math.abs(v)
            if (a > peak) peak = a
            energy += v * v
            i += 1
          }
          GrftFeatures(m.vec_id, s.length.toLong, sum, peak, energy)
        }
      }
    }
  }

  /** Frame sampling over decoded payloads — the video-keyframe batch shape:
    * the sample stream splits into fixed `frameLen` frames and every
    * `stride`-th frame survives, with integer-exact per-frame stats. Same
    * `mapPartitions`-in-batches plumbing as [[mediaFeatures]] (a real
    * decoder swaps in at `decodeSamples`; the frame loop, batch shape, and
    * output schema are the production ones). Map-side only — the explode to
    * frame grain happens inside the partition, payloads never move.
    */
  def frameSample(spark: SparkSession, media: Dataset[GrftMedia],
                  frameLen: Int = 8, stride: Int = 2,
                  batchSize: Int = 64): Dataset[GrftFrame] = {
    import spark.implicits._
    require(frameLen >= 1 && stride >= 1, s"bad frameLen=$frameLen stride=$stride")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          val s = decodeSamples(m.payload)
          val nFrames = (s.length + frameLen - 1) / frameLen
          (0 until nFrames).iterator.filter(_ % stride == 0).map { f =>
            var i = f * frameLen
            val end = math.min(i + frameLen, s.length)
            var sum = 0L; var peak = 0L; var n = 0L
            while (i < end) {
              val v = s(i).toLong
              sum += v
              val a = math.abs(v); if (a > peak) peak = a
              n += 1; i += 1
            }
            GrftFrame(m.vec_id, f.toLong, n, sum, peak)
          }
        }
      }
    }
  }

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

  /** REAL text decode: strict UTF-8 — a malformed byte sequence throws
    * (same loud-failure discipline as [[decodeSamples]]; the JDK default of
    * silent U+FFFD replacement would poison every downstream count).
    */
  def decodeText(payload: Array[Byte]): String =
    try {
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(payload)).toString
    } catch {
      case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          s"payload is not valid UTF-8 (${payload.length} bytes): $e")
    }

  /** Integer-exact 8-lane profile of a decoded text: code points, letters
    * [A-Za-z], digits, whitespace [ \t\n\r], other, token count, longest
    * token, line count (newlines + 1). Counts are exact in Float below 2^24
    * (documents are far shorter), and every lane is reproducible in SQL —
    * the `multimodal_text_features` oracle recomputes them with
    * regexp/list functions and hash-matches.
    */
  def textFeatures(text: String): Array[Float] = {
    var chars = 0L; var letters = 0L; var digits = 0L; var ws = 0L
    var newlines = 0L; var tokens = 0L; var maxTok = 0L; var cur = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      chars += 1
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r'
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) letters += 1
      else if (cp >= '0' && cp <= '9') digits += 1
      else if (isWs) ws += 1
      if (cp == '\n') newlines += 1
      if (isWs) {
        if (cur > 0) { tokens += 1; if (cur > maxTok) maxTok = cur }; cur = 0
      } else cur += 1
      i += Character.charCount(cp)
    }
    if (cur > 0) { tokens += 1; if (cur > maxTok) maxTok = cur }
    Array(chars, letters, digits, ws, chars - letters - digits - ws,
          tokens, maxTok, newlines + 1).map(_.toFloat)
  }

  /** Batched feature extraction: `mapPartitions` with fixed-size batches —
    * the shape a vectorized model runner needs (load weights once per
    * partition, infer per batch). Dispatches on the mime column: `text/`-prefixed mimes
    * take the real strict-UTF-8 decode + [[textFeatures]]; any other mime
    * fails loudly (no codec in this container — a real deployment registers
    * image/audio decoders here). Returns a typed Dataset.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime").as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition warm-up would happen here (model load / codec init)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, payload, mime) =>
            val digest = java.security.MessageDigest.getInstance("SHA-256")
              .digest(payload).map("%02x".format(_)).mkString
            val feature =
              if (mime.startsWith("text/")) textFeatures(decodeText(payload))
              else throw new IllegalArgumentException(
                s"no decoder registered for mime '$mime'")
            MediaFeatures(id, payload.length, digest, feature)
          }
        }
      }
  }
}
