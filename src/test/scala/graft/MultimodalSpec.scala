package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload plumbing: metadata matches feature-extraction checksums") {
    val media = Multimodal.toMedia(Tables.documents(spark, TestSpark.sfDir).limit(50))
    val meta = Multimodal.metadata(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 16).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      val (nBytes, sha) = meta(f.doc_id)
      assert(f.n_bytes == nBytes, "column-expression length == partition-side length")
      assert(f.sha256 == sha, "sha2 expression == MessageDigest")
      assert(f.feature.length == 8, "text decode emits fixed-width feature")
    }
  }

  test("text decode is real: features count the decoded characters exactly") {
    val feats = Multimodal.textFeatures("Hello, wide   world 42\nbye")
    // chars, letters, digits, ws, other, tokens, max token len, lines
    assert(feats.toSeq == Seq(26f, 17f, 2f, 6f, 1f, 5f, 6f, 2f))
    assert(Multimodal.textFeatures("").toSeq == Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f))
  }

  test("strict UTF-8 decode rejects malformed payloads loudly") {
    assert(Multimodal.decodeText("héllo".getBytes("UTF-8")) == "héllo")
    val bad = Array[Byte](0x68, 0x65, 0xC3.toByte) // truncated 2-byte sequence
    intercept[IllegalArgumentException](Multimodal.decodeText(bad))
    // unknown mime fails (wrapped in the task-failure SparkException), not fakes
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark,
        Multimodal.toMedia(Tables.documents(spark, TestSpark.sfDir).limit(1))
          .withColumn("mime", org.apache.spark.sql.functions.lit("image/png")))
        .collect()
    }
    assert(e.getMessage.contains("no decoder registered for mime"))
  }

  test("GRFT container round-trips: pack → decode recovers the samples exactly") {
    val samples = Array(0, 1, -1, 123456, -7654321, Int.MaxValue / 2)
    val payload = Multimodal.packSamples(samples)
    assert(payload.length == 12 + 4 * samples.length)
    assert(Multimodal.decodeSamples(payload).toSeq == samples.toSeq)
    // empty media item is legal (zero samples, header only)
    assert(Multimodal.decodeSamples(Multimodal.packSamples(Array.empty)).isEmpty)
  }

  test("GRFT decode rejects malformed payloads loudly") {
    val good = Multimodal.packSamples(Array(1, 2, 3))
    intercept[IllegalArgumentException](Multimodal.decodeSamples(good.take(8)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeSamples(badMagic))
    val truncated = good.take(good.length - 4) // declared 3 samples, carries 2
    intercept[IllegalArgumentException](Multimodal.decodeSamples(truncated))
  }

  test("encode→decode features equal direct computation from the source floats") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir).limit(32)
    val feats = Multimodal
      .mediaFeatures(spark, Multimodal.encodeEmbeddings(spark, emb), batchSize = 8)
      .collect().map(f => f.vec_id -> f).toMap
    val src = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    assert(feats.size == src.length)
    src.foreach { case (id, v) =>
      // same HALF_UP fixed-point rule the codegen'd encode expression applies
      val fp = v.map(x => BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val f = feats(id)
      assert(f.n_samples == v.length)
      assert(f.sum_fp == fp.sum, s"vec $id sum")
      assert(f.peak_fp == fp.map(math.abs).max, s"vec $id peak")
      assert(f.energy_fp == fp.map(x => x * x).sum, s"vec $id energy")
    }
  }

  test("frameSample: stride pattern, partial tail frame, stats match reference") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir).limit(16)
    val frames = Multimodal
      .frameSample(spark, Multimodal.encodeEmbeddings(spark, emb),
                   frameLen = 5, stride = 3, batchSize = 4)
      .collect().groupBy(_.vec_id)
    val src = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    src.foreach { case (id, v) =>
      val fp = v.map(x => BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val nFrames = (v.length + 4) / 5 // 64 samples → 13 frames, last is 4 wide
      val expected = (0 until nFrames).filter(_ % 3 == 0).map { f =>
        val sl = fp.slice(f * 5, math.min(f * 5 + 5, fp.length))
        (f.toLong, sl.length.toLong, sl.sum, sl.map(math.abs).max)
      }
      val got = frames(id).sortBy(_.frame_no)
        .map(g => (g.frame_no, g.n_samples, g.sum_fp, g.peak_fp)).toSeq
      assert(got == expected, s"vec $id frames")
      assert(got.last._2 == 4L, "tail frame is partial (64 % 5)")
    }
  }
}
