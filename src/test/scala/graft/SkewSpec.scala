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

  test("keySkewProfile: hand-computed Gini/top-share/HHI on a tiny key set") {
    // counts a:4, b:2, c:2, d:1, e:1 → ranks asc Σ rank·c = 37,
    // gini = 2·37/(5·10) − 6/5 = 0.28; top-1% = ceil(5/100)=1 key → 4/10;
    // hhi = (16+4+4+1+1)/100 = 0.26
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
              Seq("d", "e")).map(Tuple1(_)).toDF("k")
    val r = Skew.keySkewProfile(df, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 10L, 4L)), r.toString)
    assert(r.getDouble(3) == 0.28, s"gini: ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.4, s"top share: ${r.getDouble(4)}")
    assert(r.getDouble(5) == 0.26, s"hhi: ${r.getDouble(5)}")
  }

  test("keySkewProfile: uniform keys give gini ≈ 0, one hot key pushes it up") {
    val uniform = (1 to 100).flatMap(k => Seq.fill(5)(k)).map(Tuple1(_)).toDF("k")
    val gu = Skew.keySkewProfile(uniform, "k").collect().head.getDouble(3)
    assert(gu == 0.0, s"uniform gini: $gu")
    val hot = ((1 to 99).flatMap(k => Seq.fill(2)(k)) ++ Seq.fill(802)(500))
      .map(Tuple1(_)).toDF("k")
    val gh = Skew.keySkewProfile(hot, "k").collect().head
    assert(gh.getDouble(3) > 0.7, s"hot gini: ${gh.getDouble(3)}")
    assert(gh.getDouble(4) > 0.8, s"hot top share: ${gh.getDouble(4)}")
  }
}
