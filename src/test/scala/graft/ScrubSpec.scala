package graft

import graft.ops.Scrub
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mask(s: String): String =
    Seq(s).toDF("t").select(Scrub.maskAll(col("t"))).head().getString(0)

  test("maskAll masks every entity class and strips tags") {
    val in = "Hi <b>Bob</b> mail bob.smith+x@corp.example.co.uk call +44-201-5557 " +
      "see https://sub.example.com/a?b=c#d from 192.168.0.17 end"
    val out = mask(in)
    assert(out == "Hi Bob mail [EMAIL] call [PHONE] see [URL] from [IP] end")
  }

  test("masking order: an URL containing '@' or a dotted host masks as URL, not email/IP") {
    assert(mask("x http://user@10.1.2.3/path y") == "x [URL] y")
  }

  test("an IP is not half-eaten by the phone pattern") {
    assert(mask("node at 10.0.3.44 up") == "node at [IP] up")
  }

  test("plain prose and the mask tokens themselves pass through untouched") {
    val s = "the quick brown fox 123 456"
    assert(mask(s) == s)
    assert(mask("[EMAIL] [URL] [IP] [PHONE]") == "[EMAIL] [URL] [IP] [PHONE]")
  }

  test("tag strip keeps token boundaries and whitespace normalizes") {
    assert(mask("a<br>b  c\t d \n e") == "a b c d e")
  }

  test("countMatches equals the number of replacements the mask stage makes") {
    val in = "a@b.com c@d.org <i>x</i> 1.2.3.4 http://e.f/g +1-234-5678"
    val df = Seq(in).toDF("t")
    val n = df.select(
      Scrub.countMatches(col("t"), Scrub.emailPattern),
      Scrub.countMatches(col("t"), Scrub.tagPattern),
      Scrub.countMatches(col("t"), Scrub.ipPattern)).head()
    assert((n.getInt(0), n.getInt(1), n.getInt(2)) == ((2, 2, 1)))
  }

  // Seeded-random documents mixing every entity class with plain words —
  // the idempotence and no-residual properties must hold on any composition
  // (same deterministic-trials style as PropertiesSpec; the scalacheck
  // bridge isn't in the offline dep set).
  private def randomDirtyDoc(rnd: Random): String = {
    def piece(): String = rnd.nextInt(6) match {
      case 0 => Seq("alpha", "beta", "gamma", "12345", "x.y", "a-b")(rnd.nextInt(6))
      case 1 => s"user${rnd.nextInt(10000)}@mail.example.org"
      case 2 => s"+1-555-${rnd.nextInt(10000)}"
      case 3 => s"10.0.${rnd.nextInt(255)}.7"
      case 4 => { val i = rnd.nextInt(100); s"https://site$i.example.com/p/$i" }
      case _ => Seq("<b>", "</b>", "<a href=\"https://x.example.com\">", "<br/>")(rnd.nextInt(4))
    }
    List.fill(rnd.nextInt(20))(piece()).mkString(" ")
  }

  test("property: maskAll is idempotent and leaves no residual PII") {
    val docs = (0 until 60).map(i => randomDirtyDoc(new Random(42 + i)))
    val out = docs.toDF("t")
      .select(col("t"), Scrub.maskAll(col("t")).as("once"),
              Scrub.maskAll(Scrub.maskAll(col("t"))).as("twice"))
      .withColumn("residual",
        Scrub.countMatches(col("once"), Scrub.urlPattern) +
        Scrub.countMatches(col("once"), Scrub.emailPattern) +
        Scrub.countMatches(col("once"), Scrub.ipPattern) +
        Scrub.countMatches(col("once"), Scrub.phonePattern) +
        Scrub.countMatches(col("once"), Scrub.tagPattern))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"not idempotent on: ${r.getString(0)}")
      assert(r.getInt(3) == 0, s"residual PII after mask of: ${r.getString(0)}")
    }
  }

  test("catalog query: every planted entity is found, residual is zero") {
    val out = SparkEntry.queries("pii_scrub_stats")(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_tags") == 2 * n, "one open + one close tag per doc")
      assert(r.getAs[Long]("n_urls") == n)
      assert(r.getAs[Long]("n_emails") == n)
      assert(r.getAs[Long]("n_ips") == n)
      assert(r.getAs[Long]("n_phones") == n)
      assert(r.getAs[Long]("residual_pii") == 0L)
      assert(r.getAs[Long]("chars_removed") > 0L)
    }
  }

  test("kAnonymityAudit: class structure and below-k exposure counted exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // classes: (a,1)x3, (a,2)x1, (b,1)x2 -> below k=3: two classes, 3 rows
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1))
      .toDF("seg", "bucket")
    val r = Scrub.kAnonymityAudit(df, Seq(col("seg"), col("bucket")), 3)
      .collect()(0)
    assert(r.getAs[Long]("n_classes") == 3L && r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("min_class_size") == 1L)
    assert(r.getAs[Long]("classes_below_k") == 2L)
    assert(r.getAs[Long]("rows_below_k") == 3L)
    assert(r.getAs[Double]("mean_class_size") == 2.0)
  }

  test("lDiversityAudit: homogeneous class flagged that k-anonymity would pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // class A: 3 rows, ONE sensitive value (k=3-anonymous, yet fully
    // leaking); class B: 4 rows, 3 distinct values
    val df = Seq(("A", "s1"), ("A", "s1"), ("A", "s1"),
                 ("B", "s1"), ("B", "s2"), ("B", "s3"), ("B", "s3"))
      .toDF("qi", "sensitive")
    val r = Scrub.lDiversityAudit(df, Seq(col("qi")), col("sensitive"), 3)
      .collect()(0)
    assert(r.getAs[Long]("n_classes") == 2L && r.getAs[Long]("n_rows") == 7L)
    assert(r.getAs[Long]("min_diversity") == 1L)
    assert(r.getAs[Long]("classes_below_l") == 1L)
    assert(r.getAs[Long]("rows_below_l") == 3L)
    assert(r.getAs[Double]("mean_diversity") == 2.0)
  }
}
