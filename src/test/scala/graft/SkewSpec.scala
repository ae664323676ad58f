package graft

import graft.ops.Skew
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join on a skewed key") {
    // 90% of rows share one key — the shape that hot-spots a single reducer
    val left = ((1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"w$i")))
      .toDF("k", "v")
    val right = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "d")
    val plain = left.join(right, Seq("k")).select("k", "v", "d").collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", 8).select("k", "v", "d").collect().toSet
    assert(salted == plain)
  }

  test("salted count equals the plain count") {
    val df = ((1 to 500).map(_ => Tuple1(7L)) ++ (1 to 50).map(i => Tuple1(i.toLong)))
      .toDF("k")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
