package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.VectorExpressions
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("GraftExtensions wires without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("cosine_similarity is callable from SQL after registration") {
    VectorExpressions.registerSql(spark)
    val v = spark.sql(
      "SELECT cosine_similarity(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>)," +
      " CAST(array(3.0, 2.0, 1.0) AS ARRAY<FLOAT>)) AS c").head().getDouble(0)
    assert(math.abs(v - 10.0 / 14.0) < 1e-12)
  }

  test("sign_lsh_buckets and json_partition_encode are callable from SQL") {
    val b = spark.sql(
      "SELECT sign_lsh_buckets(CAST(array(1.0, -2.0, 0.5, 3.0) AS ARRAY<FLOAT>), 2, 2, 4) AS b")
      .head().getSeq[Long](0)
    assert(b.length == 2 && b.forall(x => x >= 0 && x < 4))
    val e = spark.sql(
      """SELECT json_partition_encode('{"a":1,"k":2}', 'k') AS e""")
      .head().getSeq[String](0)
    assert(e == Seq("2", """{"a":"1"}"""))
    intercept[Exception] { // shape args must be literals
      spark.sql("SELECT sign_lsh_buckets(CAST(array(1.0) AS ARRAY<FLOAT>), id, 2, 4) FROM range(1)")
        .collect()
    }
  }

  test("approx_count_distinct stays within 5% of exact (HLL surface)") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val r = ev.selectExpr("approx_count_distinct(user_id) a", "count(DISTINCT user_id) e").head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 0.05, s"approx=$a exact=$e")
  }
}
