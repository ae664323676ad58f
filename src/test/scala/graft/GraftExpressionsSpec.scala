package graft

import graft.ops.{Scalars, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.JsonExpressions.jsonPartitionEncode
import org.apache.spark.sql.graft.VectorExpressions.signLshBuckets
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two round-3 codegen expressions to their reference formulations:
  * [[org.apache.spark.sql.graft.JsonPartitionEncode]] against the HOF encode
  * chain it replaced (kept in [[Scalars.additionalInfoFromMap]] as the
  * semantics spec), and [[org.apache.spark.sql.graft.SignLshBuckets]] against
  * a driver-side dot-product rebuild of [[Similarity.hyperplanes]].
  */
class GraftExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val known = Seq("k", "uploader")

  private def encodeOne(json: String): (String, String, String) = {
    val r = spark.range(1)
      .select(jsonPartitionEncode(lit(json), known).as("e"))
      .select(col("e").getItem(0), col("e").getItem(1), col("e").getItem(2))
      .head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("JsonPartitionEncode matches the HOF encode chain on varied objects") {
    val docs = Seq(
      """{"k": 5, "rating": 1200, "uploader": "u77", "private": 1}""",
      """{"private": 0, "uploader": "ux", "k": 9, "rating": 3}""", // reordered
      """{"k": 1, "uploader": "u"}""",                             // empty leftover
      """{"zz": "tail", "aa": "head", "k": 2, "uploader": "u0", "mm": "mid"}""",
      """{}"""
    ).toDF("j")
    val both = docs.select(
      jsonPartitionEncode(col("j"), known).as("e"),
      Scalars.additionalInfoFromMap(Scalars.jsonAsMap(col("j")), known).as("hof"),
      element_at(Scalars.jsonAsMap(col("j")), "k").as("k_hof"),
      element_at(Scalars.jsonAsMap(col("j")), "uploader").as("u_hof"))
    both.collect().foreach { r =>
      val e = r.getSeq[String](0)
      assert(e(2) == r.getString(1), s"leftover encoding diverged: ${e(2)} vs ${r.getString(1)}")
      assert(e(0) == r.getString(2), "known value k diverged")
      assert(e(1) == r.getString(3), "known value uploader diverged")
    }
  }

  test("JsonPartitionEncode: missing known keys are null, malformed input is null") {
    val (k, u, rest) = encodeOne("""{"other": 1}""")
    assert(k == null && u == null && rest == """{"other":"1"}""")
    val bad = spark.range(1)
      .select(jsonPartitionEncode(lit("""{"k": """), known).as("e")).head()
    assert(bad.isNullAt(0), "malformed JSON must yield null like from_json")
    val nul = spark.range(1)
      .select(jsonPartitionEncode(lit(null).cast("string"), known).as("e")).head()
    assert(nul.isNullAt(0), "null input must yield null")
  }

  test("JsonPartitionEncode: escapes unescape, duplicates last-win, null values drop") {
    val (_, _, rest) = encodeOne("""{"k":1,"uploader":"u","a":"x\ny","b":"A"}""")
    assert(rest == "{\"a\":\"x\ny\",\"b\":\"A\"}", s"escape handling diverged: $rest")
    val (_, _, dup) = encodeOne("""{"k":1,"uploader":"u","a":"first","a":"second"}""")
    assert(dup == """{"a":"second"}""", "duplicate keys must keep the last value")
    val (_, _, drop) = encodeOne("""{"k":1,"uploader":"u","gone":null,"kept":"v"}""")
    assert(drop == """{"kept":"v"}""",
      "JSON-null fields drop from the leftover (the HOF form's array_join null skip)")
  }

  test("JsonPartitionEncode: nested values minify to the from_json twin's shape") {
    val docs = Seq(
      """{"k":1,"uploader":"u","o": {"a": 1, "b": [1, 2]}}""",
      """{"k":1,"uploader":"u","arr": [ "x y", { "n": 2 } ]}"""
    ).toDF("j")
    val both = docs.select(
      jsonPartitionEncode(col("j"), known).as("e"),
      Scalars.additionalInfoFromMap(Scalars.jsonAsMap(col("j")), known).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0)(2) == r.getString(1),
        s"nested-value encoding diverged: ${r.getSeq[String](0)(2)} vs ${r.getString(1)}")
    }
  }

  test("JsonPartitionEncode: leftover keys sort in code-point order like array_sort") {
    // U+E000 (BMP, private use) vs U+10000 (supplementary): UTF-16 code-unit
    // order would put the surrogate pair first; code-point order must not
    val json = "{\"k\":1,\"uploader\":\"u\",\"𐀀\":\"supp\",\"\":\"bmp\"}"
    val both = Seq(json).toDF("j").select(
      jsonPartitionEncode(col("j"), known).as("e"),
      Scalars.additionalInfoFromMap(Scalars.jsonAsMap(col("j")), known).as("hof"))
      .head()
    assert(both.getSeq[String](0)(2) == both.getString(1),
      "supplementary-plane key order diverged from array_sort")
  }

  test("SignLshBuckets matches a driver-side hyperplane dot-product rebuild") {
    val nTables = 4; val bits = 3; val dim = 8
    val vecs = Seq(
      (0L, Array.tabulate(dim)(i => (i - 3).toFloat / 4)),
      (1L, Array.tabulate(dim)(i => math.cos(i * 1.7).toFloat)),
      (2L, Array.fill(dim)(0.0f))) // zero vector: every dot = 0 ⇒ bucket 0
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        posexplode(signLshBuckets(col("embedding"), nTables, bits, dim))
          .as(Seq("t", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val planes = Similarity.hyperplanes(nTables * bits, dim)
      .map(_.map(_.toFloat).toArray)
    for ((id, v) <- vecs; t <- 0 until nTables) {
      var expect = 0L
      for (p <- 0 until bits) {
        val pl = planes(t * bits + p)
        var dot = 0.0
        for (i <- 0 until dim) dot += v(i).toDouble * pl(i).toDouble
        if (dot > 0) expect |= (1L << p)
      }
      assert(got((id, t)) == expect, s"bucket mismatch at vec=$id t=$t")
    }
    assert((0 until nTables).forall(t => got((2L, t)) == 0L), "zero vector ⇒ bucket 0")
  }

  test("signBuckets projection form: one row per (vector, table), no shuffle") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir).filter(col("vec_id") < 16)
    val b = Similarity.signBuckets(emb, 8, 4, 64)
    assert(b.count() == 16 * 8)
    val plan = b.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signBuckets must stay map-side:\n$plan")
  }
  test("NearestCentroid: exact value parity with the composed argmax form") {
    import org.apache.spark.sql.graft.VectorExpressions.{cosineSim, nearestCentroid}
    // deterministic pseudo-random vectors, including a zero vector, exact
    // duplicates of centroids (cos 1.0) and near-ties at the 6-decimal grain
    val rnd = new scala.util.Random(42)
    def v(): Seq[Float] = Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val cents: Array[(Long, Array[Float])] =
      (0L until 12L).map(i => i -> v().toArray).toArray
    val rows = (0 until 400).map(i => (i.toLong, v())) ++
      Seq((1000L, Seq.fill(16)(0.0f)), (1001L, cents(3)._2.toSeq),
          (1002L, cents(7)._2.toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val cosArr = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      cents.map { case (_, c) =>
        round(cosineSim(col("embedding"), lit(c)), 6) }): _*)
    val bestCos = array_max(cosArr)
    val bestId = element_at(lit(cents.map(_._1)),
      array_position(cosArr, bestCos).cast("int"))
    val composed = df.select(col("vec_id"), bestId.as("cid"), bestCos.as("cs"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nc = nearestCentroid(col("embedding"), cents.map(_._1), cents.map(_._2))
    val native2 = df.select(col("vec_id"), nc.as("__nc"))
      .select(col("vec_id"), col("__nc.cluster_id").as("cid"), col("__nc.cos_sim").as("cs"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(native2.size == composed.size)
    composed.foreach { case (id, (cid, cs)) =>
      assert(native2(id) == ((cid, cs)), s"mismatch at vec $id")
    }
  }
  test("Sq8Scores/Sq8Decode: exact value parity with the HOF pipeline") {
    import org.apache.spark.sql.graft.VectorExpressions.{sq8Decode, sq8Scores}
    val rnd = new scala.util.Random(7)
    def v(): Seq[Float] = Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val rows = (0 until 300).map(i => (i.toLong, v())) :+
      (999L, Seq.fill(16)(0.0f))
    val df = rows.toDF("vec_id", "embedding")
    // HOF reference forms (the pre-round-11 implementation, verbatim)
    val norm = sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val micro = transform(col("embedding"), x => when(col("__nrm") === 0.0, lit(0L))
      .otherwise(round(x.cast("double") / col("__nrm") * lit(1e6)).cast("long")))
    val stats = df.withColumn("__nrm", norm)
      .select(posexplode(micro).as(Seq("d", "v")))
      .groupBy(col("d")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ladder = (0 until 16).map(stats).toArray
    val minsL = lit(ladder.map(_._1)); val maxsL = lit(ladder.map(_._2))
    val dec255 = transform(col("__mic"), (x, i) => {
      val mn = element_at(minsL, i + 1); val mx = element_at(maxsL, i + 1)
      val xc = least(greatest(x, mn), mx)
      val code = when(mx === mn, lit(0L))
        .otherwise(floor(((xc - mn) * lit(255L)).cast("double")
                           / (mx - mn).cast("double")))
      mn * lit(255L) + code * (mx - mn)
    })
    val hofDec = df.withColumn("__nrm", norm).withColumn("__mic", micro)
      .select(col("vec_id"), dec255.as("dec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (mins, maxs) = (ladder.map(_._1), ladder.map(_._2))
    val natDec = df.select(col("vec_id"),
        sq8Decode(col("embedding"), mins, maxs).as("dec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(natDec.size == hofDec.size)
    hofDec.foreach { case (id, d) => assert(natDec(id) == d, s"decode at $id") }
    // scores vs the HOF zip_with/aggregate dot
    val qdecs = Array(natDec(0L).toArray, natDec(999L).toArray)
    val hofScore = df.withColumn("__nrm", norm).withColumn("__mic", micro)
      .withColumn("__dec", dec255)
      .select(col("vec_id"), array(qdecs.toSeq.map(qd =>
        round(aggregate(zip_with(lit(qd), col("__dec"), (a, b) => a * b),
                        lit(0L), (acc, y) => acc + y).cast("double")
                / lit(65025.0) / lit(1e12), 6)): _*).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val natScore = df.select(col("vec_id"),
        sq8Scores(col("embedding"), mins, maxs, qdecs).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    hofScore.foreach { case (id, sc) => assert(natScore(id) == sc, s"score at $id") }
  }

  test("NearestCentroid / Sq8: dim-mismatched inputs raise a descriptive " +
       "error instead of striding into wrong lanes") {
    import org.apache.spark.sql.graft.VectorExpressions.{nearestCentroid, sq8Decode, sq8Scores}
    // 8-dim input vs 16-dim reference data
    val df = Seq((1L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val cents = (0L until 4L).map(i => i -> Array.fill(16)(0.1f)).toArray
    val e1 = intercept[Exception] {
      df.select(nearestCentroid(col("embedding"), cents.map(_._1),
        cents.map(_._2)).as("nc")).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootMsg(e1).contains("input dimension 8"), rootMsg(e1))
    val mins = Array.fill(16)(-1000000L); val maxs = Array.fill(16)(1000000L)
    val e2 = intercept[Exception] {
      df.select(sq8Decode(col("embedding"), mins, maxs).as("d")).collect()
    }
    assert(rootMsg(e2).contains("ladder dimension 16"), rootMsg(e2))
    // query decode narrower than the corpus decode
    val df16 = Seq((1L, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val e3 = intercept[Exception] {
      df16.select(sq8Scores(col("embedding"), mins, maxs,
        Array(Array.fill(8)(1L))).as("s")).collect()
    }
    assert(rootMsg(e3).contains("decode dimension 8"), rootMsg(e3))
  }
}
