package graft

import graft.ops.{Incremental, Lifecycle, Scalars}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Algebraic properties (SURVEY.md §5 point 3), seeded-random style — the
  * scalatest/scalacheck bridge artifact isn't in the offline dep set, so
  * generation is a deterministic `Random(seed)` loop.
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trials(n: Int)(body: Random => Unit): Unit =
    (0 until n).foreach(i => body(new Random(42 + i)))

  test("idFromFilename matches os.path.splitext(basename) semantics (F11)") {
    val cases = Seq(
      "/data/replays/gen9ou/2024-01-05/r-123.json" -> "r-123",
      "r-9.json" -> "r-9",
      "/a/b/name.tar.gz" -> "name.tar",   // splitext strips the LAST extension
      "/a/b/noext" -> "noext",
      "/a/b/.DS_Store" -> ".DS_Store",    // leading dot is not a separator
      "/a/b/.a.json" -> ".a",
      "/a/b/" -> "")
    val got = cases.map(_._1).toDF("p")
      .select(Scalars.idFromFilename(col("p")).as("id")).as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, have) =>
      assert(want == have, s"splitext semantics diverged: wanted $want, got $have")
    }
  }

  test("dedup ∘ dedup = dedup") {
    trials(5) { rnd =>
      val rows = List.fill(40)((rnd.nextLong(10), rnd.nextLong(100), rnd.alphanumeric.take(5).mkString))
      val df = rows.toDF("k", "p", "v")
      val prec = Seq($"p".desc, $"v".desc)
      val once = Lifecycle.dedupKeepFirst(df, Seq("k"), prec)
      val twice = Lifecycle.dedupKeepFirst(once, Seq("k"), prec)
      assert(once.collect().toSet == twice.collect().toSet)
      assert(once.select("k").distinct().count() == once.count())
    }
  }

  test("watermark filter is monotone: higher watermark ⇒ subset") {
    trials(5) { rnd =>
      val ts = List.fill(30)(rnd.nextLong(1000))
      val w = rnd.nextLong(500)
      val df = ts.toDF("t")
      val lo = Incremental.newSince(df, "t", lit(w)).as[Long].collect().toSet
      val hi = Incremental.newSince(df, "t", lit(w + 100)).as[Long].collect().toSet
      assert(hi.subsetOf(lo))
      assert(lo.forall(_ > w))
    }
  }

  test("F7 battle-log timestamp regex round-trips") {
    trials(5) { rnd =>
      val epoch = 1 + rnd.nextLong(2000000000L)
      val log = s"|j|player1\n|t:|$epoch\n|start\n"
      val got = Seq(log).toDF("log").select(Scalars.logTimestamp($"log")).head().getLong(0)
      assert(got == epoch)
    }
  }

  test("F10 additional_info round-trips every unknown field (encode ∘ parse law)") {
    trials(5) { rnd =>
      val nFields = 2 + rnd.nextInt(5)
      val fields = (0 until nFields)
        .map(i => s"f${i}_${rnd.alphanumeric.filter(_.isLetter).take(3).mkString}" ->
                  rnd.alphanumeric.take(6).mkString).toMap
      val known = fields.keys.take(1 + rnd.nextInt(2)).toSeq
      val json = fields.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
      val enc = Seq(json).toDF("j")
        .select(Scalars.additionalInfo($"j", known).as("ai"))
      val ai = enc.head().getString(0)
      // every unknown field parses back out; every known field is pruned
      for ((k, v) <- fields if !known.contains(k)) {
        val got = Seq(ai).toDF("ai")
          .select(Scalars.jsonField($"ai", k)).head().getString(0)
        assert(got == v, s"field $k lost in round trip: $ai")
      }
      for (k <- known)
        assert(!ai.contains(s""""$k":"""), s"known field $k leaked into $ai")
    }
  }

  test("semi ⊎ anti = identity on distinct keys") {
    trials(5) { rnd =>
      val left = List.fill(30)(rnd.nextLong(20)).distinct
      val right = List.fill(10)(10 + rnd.nextLong(20)).distinct
      val l = left.toDF("k"); val r = right.toDF("k")
      val semi = l.join(r, Seq("k"), "left_semi").as[Long].collect().toSet
      val anti = l.join(r, Seq("k"), "left_anti").as[Long].collect().toSet
      assert((semi ++ anti) == left.toSet)
      assert((semi intersect anti).isEmpty)
    }
  }
}
