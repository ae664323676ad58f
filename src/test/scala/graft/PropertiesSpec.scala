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

  // Brute-force reference for the substring-dedup pair: tiny 4-symbol vocab
  // forces heavy window collisions, so the gaps-and-islands merge, the
  // cross-doc dup rule, and the owner rule all get exercised hard.
  private def randomCorpus(rnd: Random): Seq[(Long, String)] = {
    val vocab = Array("a", "b", "c", "d")
    (0 until (6 + rnd.nextInt(3))).map { id =>
      val len = 5 + rnd.nextInt(16)
      id.toLong -> Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
  }

  private def refGrams(docs: Seq[(Long, String)], n: Int) = for {
    (id, t) <- docs
    tk = t.split(" ", -1)
    if tk.length >= n
    i <- 0 to tk.length - n
  } yield (id, i, tk.slice(i, i + n).mkString(" "))

  test("duplicateSpans matches a brute-force reference on random corpora") {
    trials(5) { rnd =>
      val docs = randomCorpus(rnd)
      val n = 3
      val grams = refGrams(docs, n)
      val nDocs = grams.groupBy(_._3).map { case (g, o) => g -> o.map(_._1).distinct.size }
      val expected = grams.filter(g => nDocs(g._3) >= 2).groupBy(_._1).flatMap {
        case (id, occ) =>
          val ps = occ.map(_._2).distinct.sorted
          val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
          var s = ps.head; var p = ps.head
          for (q <- ps.tail) { if (q == p + 1) p = q else { spans += ((s, p)); s = q; p = q } }
          spans += ((s, p))
          spans.map { case (a, b) => (id, a.toLong, (b - a + n).toLong) }
      }.toSet
      val got = graft.ops.Dedup.duplicateSpans(docs.toDF("doc_id", "text"), n, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"corpus: $docs")
    }
  }

  test("spanDedupedDocs matches a brute-force owner-rule reference on random corpora") {
    trials(5) { rnd =>
      val docs = randomCorpus(rnd)
      val n = 3
      val grams = refGrams(docs, n)
      val byGram = grams.groupBy(_._3)
      val owners = byGram.collect {
        case (g, occ) if occ.map(_._1).distinct.size >= 2 => g -> occ.map(_._1).min
      }
      val expected = docs.map { case (id, t) =>
        val tk = t.split(" ", -1)
        val covered = grams.collect {
          case (d, i, g) if d == id && owners.get(g).exists(_ != id) => i until (i + n)
        }.flatten.toSet
        val kept = tk.zipWithIndex.collect { case (w, i) if !covered.contains(i) => w }
        id -> ((tk.length.toLong, covered.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = graft.ops.Dedup.spanDedupedDocs(docs.toDF("doc_id", "text"), n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == expected, s"corpus: $docs")
    }
  }
}
