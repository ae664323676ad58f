package graft

import org.scalatest.funsuite.AnyFunSuite

class TuningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val Key = "spark.sql.adaptive.enabled"

  test("withTuned disables AQE for fixed-shape queries and restores after") {
    val before = spark.conf.get(Key)
    val seen = Tuning.withTuned(spark, "scalar_showcase") { spark.conf.get(Key) }
    assert(seen == "false", "tagged query must run with AQE off")
    assert(spark.conf.get(Key) == before, "previous value must be restored")
  }

  test("withTuned is a no-op for untagged queries") {
    val before = spark.conf.get(Key)
    val seen = Tuning.withTuned(spark, "lsh_recall") { spark.conf.get(Key) }
    assert(seen == before)
  }

  test("withTuned restores the conf when the body throws") {
    val before = spark.conf.get(Key)
    intercept[RuntimeException] {
      Tuning.withTuned(spark, "scalar_showcase") { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(Key) == before, "exception path must restore too")
  }

  test("withTuned lowers shuffle partitions for lowShuffle queries and restores") {
    val SKey = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(SKey)
    val seen = Tuning.withTuned(spark, "pii_scrub_stats") { spark.conf.get(SKey) }
    assert(seen == "8", "tagged query must run with 8 shuffle partitions")
    assert(spark.conf.get(SKey) == before, "previous value must be restored")
  }

  test("both tags compose on a doubly-tagged query") {
    val SKey = "spark.sql.shuffle.partitions"
    val (aqe, shuf) = Tuning.withTuned(spark, "download_status_check") {
      (spark.conf.get(Key), spark.conf.get(SKey))
    }
    assert(aqe == "false" && shuf == "8")
  }

  test("every tagged name is a real catalog query") {
    val unknown = (Tuning.fixedShape ++ Tuning.lowShuffle) -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale tuning tags: $unknown")
  }
}
