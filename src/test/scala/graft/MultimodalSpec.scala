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
      assert(f.feature.length == 8, "stub decode emits fixed-width feature")
    }
  }

  test("stub decode is deterministic") {
    val payload = "some bytes".getBytes("UTF-8")
    assert(Multimodal.decodeStub(payload).toSeq == Multimodal.decodeStub(payload).toSeq)
  }
}
