package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Outcome of one document fetch: success XOR error as real columns — the
  * engine replaces the reference's `'Failed:'` string-prefix error channel
  * (db.py:366) with a typed two-column result.
  */
case class FetchResult(replay_id: String, attempts: Int,
                       payload: Option[String], error: Option[String])

/** S2 — effectful per-document fetch (reference `api.py:44-99`): bounded
  * retries with exponential backoff, non-retryable classification
  * (401/403/404 never retry, api.py:88-90), executed as `mapPartitions` so a
  * connection-pooled client initializes once per partition and the fan-out is
  * partition parallelism (the reference's 5-thread ThreadPoolExecutor,
  * download.py:115,177-213, becomes `repartition(n)`).
  *
  * The transport is injected (`(id, attempt) => Either[(message, retryable),
  * payload]`); production wires an HTTP client here, tests and the
  * zero-egress environment wire a deterministic simulator.
  */
object Fetch {

  def fetchAll(spark: SparkSession, ids: DataFrame,
               transport: (String, Int) => Either[(String, Boolean), String],
               maxAttempts: Int = 3, baseBackoffMs: Long = 0L): Dataset[FetchResult] = {
    import spark.implicits._
    ids.select("replay_id").as[String].mapPartitions { it =>
      // per-partition client/warm-up would happen here (pooled connections)
      it.map { id =>
        var attempt = 0
        var result: FetchResult = null
        while (result == null) {
          attempt += 1
          transport(id, attempt) match {
            case Right(payload) =>
              result = FetchResult(id, attempt, Some(payload), None)
            case Left((msg, retryable)) =>
              if (!retryable || attempt >= maxAttempts)
                result = FetchResult(id, attempt, None, Some(msg))
              else if (baseBackoffMs > 0)
                // 0.1·2^k s in the reference (api.py:73-74)
                Thread.sleep(baseBackoffMs << (attempt - 1))
          }
        }
        result
      }
    }
  }
}
