package graft

import graft.ops.{Fetch, TopKByScore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FetchTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fetch: retries transient failures, classifies permanent ones (S2)") {
    val ids = (0 until 100).map(i => s"r-$i").toDF("replay_id")
    // deterministic transport: ids %10==0 → 404 (non-retryable);
    // %10==1 → succeed on attempt 3; rest succeed immediately
    val transport = (id: String, attempt: Int) => {
      val n = id.stripPrefix("r-").toInt
      if (n % 10 == 0) Left(("HTTP 404", false))
      else if (n % 10 == 1 && attempt < 3) Left(("HTTP 500", true))
      else Right(s"payload-$id")
    }
    val out = Fetch.fetchAll(spark, ids, transport).collect()
    assert(out.length == 100)
    val byMod = out.groupBy(_.replay_id.stripPrefix("r-").toInt % 10)
    assert(byMod(0).forall(r => r.error.contains("HTTP 404") && r.attempts == 1),
      "non-retryable fails once")
    assert(byMod(1).forall(r => r.payload.isDefined && r.attempts == 3),
      "transient recovers on the third attempt")
    assert(byMod(2).forall(r => r.payload.isDefined && r.attempts == 1))
    // success XOR error, always
    assert(out.forall(r => r.payload.isDefined != r.error.isDefined))
  }

  test("fetch: retry budget exhausts into the error channel (T5 input)") {
    val ids = Seq("r-1").toDF("replay_id")
    val alwaysDown = (_: String, _: Int) => Left(("HTTP 503", true))
    val r = Fetch.fetchAll(spark, ids, alwaysDown, maxAttempts = 3).head()
    assert(r.attempts == 3 && r.error.contains("HTTP 503"))
  }

  test("fetch over a live HTTP socket: backoff on 5xx, non-retryable 403/404 (S2 real transport)") {
    // an in-process HTTP server standing in for the replay API: local[*]
    // executors share the JVM, so the flaky-endpoint hit counter is visible
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/replay/", ex => {
      val id = ex.getRequestURI.getPath.stripPrefix("/replay/").stripSuffix(".json")
      val n = hits.merge(id, 1, (a, b) => a + b)
      val (code, body) = id match {
        case "flaky"     => if (n <= 2) (500, "err") else (200, s"""{"id":"$id"}""")
        case "gone"      => (404, "nf")
        case "locked"    => (403, "fb")
        case "always500" => (500, "err")
        case _           => (200, s"""{"id":"$id"}""")
      }
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val ids = Seq("ok-1", "ok-2", "flaky", "gone", "locked", "always500").toDF("replay_id")
      val out = Fetch.fetchAll(spark, ids,
          graft.ops.HttpTransport.forUrl(id => s"http://127.0.0.1:$port/replay/$id.json"),
          maxAttempts = 3, baseBackoffMs = 1L)
        .collect().map(r => r.replay_id -> r).toMap
      assert(out("ok-1").payload.contains("""{"id":"ok-1"}""") && out("ok-1").attempts == 1)
      assert(out("flaky").payload.isDefined && out("flaky").attempts == 3,
        "5xx retries with backoff until the endpoint recovers")
      assert(out("gone").error.contains("HTTP 404") && out("gone").attempts == 1,
        "404 never retries (api.py:88-90)")
      assert(out("locked").error.contains("HTTP 403") && out("locked").attempts == 1)
      assert(out("always500").error.contains("HTTP 500") && out("always500").attempts == 3,
        "retry budget exhausts into the error channel")
      assert(hits.get("flaky") == 3 && hits.get("gone") == 1,
        "server-side hit counts confirm the classification went over the wire")
    } finally server.stop(0)
  }

  test("TopKByScore matches the window-based top-k (custom Aggregator)") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val exact = graft.ops.Similarity
      .cosineTopK(emb.filter($"vec_id" < 3), emb.filter($"vec_id" >= 3), 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet

    // same scoring, aggregated via the typed top-k instead of a window
    import org.apache.spark.sql.graft.VectorExpressions.cosineSim
    val q = broadcast(emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb")))
    val scored = emb.filter($"vec_id" >= 3).crossJoin(q)
      .select($"q_id", $"vec_id", round(cosineSim($"q_emb", $"embedding"), 6).as("s"))
      .as[(Long, Long, Double)]
    val viaAgg = scored.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKByScore(5).toColumn)
      .flatMap { case (qid, top) => top.map(t => (qid, t._1)) }
      .collect().toSet
    assert(viaAgg == exact)
  }
}
