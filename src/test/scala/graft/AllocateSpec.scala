package graft

import graft.ops.Allocate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AllocateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("largestRemainder: crafted split pays the leftover to the largest remainders") {
    // total 100 over weights 1,1,1: floor shares 33 each, leftover 1 —
    // remainders tie, so the tiebreak (line asc) bumps line 1
    val df = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L))
      .toDF("g", "line", "w").withColumn("total", lit(100L))
    val out = Allocate.largestRemainder(df, "g", col("total"), col("w"),
        Seq(col("line"))).collect()
      .map(r => r.getAs[Long]("line") -> r.getAs[Long]("alloc")).toMap
    assert(out == Map(1L -> 34L, 2L -> 33L, 3L -> 33L))
    // total 10 over weights 7,3 splits exactly: 7 and 3, nobody bumped
    val exact = Seq((1L, 1L, 7L), (1L, 2L, 3L))
      .toDF("g", "line", "w").withColumn("total", lit(10L))
    val e = Allocate.largestRemainder(exact, "g", col("total"), col("w"),
        Seq(col("line"))).collect()
    assert(e.forall(!_.getAs[Boolean]("bumped")))
  }

  test("largestRemainder: cents conserved exactly on pseudorandom groups") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val g = (i % 40).toLong
      (g, i.toLong, rng.between(1L, 51L), 10007L + 977L * g)
    }
    val df = rows.toDF("g", "line", "w", "total")
    val sums = Allocate.largestRemainder(df, "g", col("total"), col("w"),
        Seq(col("line")))
      .groupBy("g").agg(sum(col("alloc")).as("s"), max(col("total")).as("t"),
                        sum(when(col("bumped"), 1L).otherwise(0L)).as("nb"),
                        count(lit(1)).as("n"))
      .collect()
    sums.foreach { r =>
      assert(r.getAs[Long]("s") == r.getAs[Long]("t"),
        s"group ${r.getAs[Long]("g")}: alloc sum != total")
      assert(r.getAs[Long]("nb") < r.getAs[Long]("n"))
    }
  }
}
