package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query executes at sf0.001 (fast regression; value-level
  * correctness is the DuckDB-oracle gate driven by graft.Verify).
  */
class CatalogSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, TestSpark.sfDir)
      assert(df.columns.nonEmpty)
      df.count() // executes the plan
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("catalog names are unique (Map merge would silently drop collisions)") {
    val names = (CatalogCore.entries ++ CatalogExt.entries).map(_._1)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct).distinct}")
  }
}
