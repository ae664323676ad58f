package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two low-severity-advice guards: the bounded-report truncation
  * watcher and spread()'s scan-rooted precondition.
  */
class GuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("spread() skips the partition probe on non-scan-rooted plans (returns input unchanged)") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    // scan-rooted: filter/project over the scan — spread may act
    val scanRooted = docs.filter(col("doc_id") > 0).select("doc_id", "text")
    assert(Tables.spread(scanRooted, col("doc_id")).rdd.getNumPartitions >= 1)
    // aggregate-rooted: probing .rdd here would materialize the shuffle
    // stage under AQE; the guard must hand the plan back untouched
    val agg = docs.groupBy("source").agg(count(lit(1)).as("n"))
    assert(Tables.spread(agg, col("source")) eq agg)
    val joined = docs.join(docs.select("doc_id"), Seq("doc_id"))
    assert(Tables.spread(joined, col("doc_id")) eq joined)
  }

  test("orderedReport flags a bound-saturated result loudly; normal reports stay silent") {
    GraftSession.arm(spark)
    GraftSession.clearBoundTruncation()
    import spark.implicits._
    // under the bound: no flag
    CatalogCore.orderedReport((1 to 10).toDF("id"), col("id"))
      .write.mode("overwrite").format("noop").save()
    // listener delivery is async (execution listener bus)
    def awaitFlag(expect: Boolean): Boolean = {
      val deadline = System.nanoTime() + 10e9.toLong
      while (GraftSession.lastBoundTruncation.isDefined != expect &&
             System.nanoTime() < deadline) Thread.sleep(50)
      GraftSession.lastBoundTruncation.isDefined == expect
    }
    assert(awaitFlag(false), "an under-bound report must not flag")
    // exactly at the bound: truncation suspect must flag
    spark.range(CatalogCore.ReportBound + 50L).toDF("id")
      .transform(CatalogCore.orderedReport(_, col("id")))
      .write.mode("overwrite").format("noop").save()
    assert(awaitFlag(true), "a bound-saturated report must flag")
    GraftSession.clearBoundTruncation()
  }
}
