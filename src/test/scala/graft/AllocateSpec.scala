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

  test("linearAttribution: credit conserved to the micro-unit, no-touch itemized") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // purchase with 3 touches in window: 1e6 splits 333334/333333/333333
      // (leftover micro-credit to the EARLIEST touch)
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (2L, 10L, "click", ts("2024-01-02 10:00:00")),
      (3L, 10L, "view", ts("2024-01-03 10:00:00")),
      (4L, 10L, "purchase", ts("2024-01-04 10:00:00")),
      // touch OUTSIDE the 7-day window: purchase lands unattributed
      (5L, 20L, "view", ts("2024-01-01 10:00:00")),
      (6L, 20L, "purchase", ts("2024-01-20 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Allocate.linearAttribution(ev).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_touches"),
                                   r.getAs[Long]("credit_micro"))).toMap
    assert(out("view") == ((2L, 666667L)), out.toString)   // 333334 + 333333
    assert(out("click") == ((1L, 333333L)))
    assert(out("(unattributed)") == ((1L, 1000000L)))
    assert(out.values.map(_._2).sum == 2L * 1000000L, "credit conservation")
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

  test("shapleyChannelAttribution: symmetric coalitions split credit equally") {
    import spark.implicits._
    // every coalition observed with conversion rate |S|/3: each channel's
    // marginal contribution is 1/3 at every coalition, so Shapley must
    // award exactly 1/3 each — and efficiency Σφ = v(C) − v(∅) holds
    val coalitions = for {
      hv <- 0 to 1; hc <- 0 to 1; hs <- 0 to 1
    } yield (hv, hc, hs)
    val events = coalitions.zipWithIndex.flatMap { case ((hv, hc, hs), ci) =>
      (0 until 3).flatMap { u =>
        val uid = (ci * 3 + u).toLong
        val size = hv + hc + hs
        val touches =
          (if (hv == 1) Seq("view") else Nil) ++
          (if (hc == 1) Seq("click") else Nil) ++
          (if (hs == 1) Seq("signup") else Nil)
        val base = if (touches.isEmpty) Seq("error") else touches
        val conv = if (u < size) Seq("purchase") else Nil
        (base ++ conv).map(t => (uid, t))
      }
    }.zipWithIndex.map { case ((uid, t), i) =>
      (i.toLong, uid,
       java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${i % 60}"), t)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val out = Allocate.shapleyChannelAttribution(events).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("phi_micro6"), r.getAs[Double]("phi"))).toMap
    Seq("view", "click", "signup").foreach { ch =>
      assert(out(ch)._1 == 2000000L, s"$ch: ${out(ch)}")
      assert(out(ch)._2 == 0.333333)
    }
    // efficiency: Σ 6φ = 6·(v(C) − v(∅)) = 6·(10⁶ − 0)
    assert(out.values.map(_._1).sum == 6000000L)
  }
}
