package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII masking and markup scrubbing — the cleaning pass every public
  * LLM-training corpus pipeline runs before dedup/quality gating (C4 strips
  * markup and bad lines; CCNet/Dolma-style pipelines mask emails / phone
  * numbers / IP addresses). The reference has no analogue (its documents are
  * game logs), so this is part of the training-data extension surface.
  *
  * Everything here is a chained `regexp_replace` / `regexp_extract_all`
  * column expression: map-side, codegen'd, no UDF, no shuffle — it scans at
  * parquet speed at 100 TB. Patterns are deliberately RE2-safe (no
  * lookaround, no backreferences) so the DuckDB oracle runs the *identical*
  * pattern strings and the masked text is bit-for-bit engine-portable.
  *
  * Masking order matters and is fixed: markup first (tags would otherwise
  * shield `<a href="http://…">`), then URLs (which may contain `@` and
  * dotted hosts that the email/IP patterns would half-eat), then emails,
  * then IPs, then phone numbers. [[maskAll]] pins the order; the catalog
  * query counts each entity on the stage it is actually replaced in, so
  * counts always equal replacements.
  */
object Scrub {

  /** HTML/XML tag (non-nested, attribute-tolerant). */
  val tagPattern = "<[^<>]+>"

  /** URL up to the next space. Greedy by design: trailing punctuation is
    * part of the mask (conservative — better to over-mask an URL tail than
    * leak a path).
    */
  val urlPattern = "https?://[^ ]+"

  /** RFC-ish email: local part, `@`, dotted domain with an alpha TLD. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no range check — `999.1.1.1` masks too; over-masking
    * is the safe direction for PII).
    */
  val ipPattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** International-ish phone: optional `+CC`, then `NNN<sep>NNNN` with `-`
    * or `.` separators. Space separators are deliberately excluded — on
    * free text they false-positive on numeric token runs.
    */
  val phonePattern = "\\+?[0-9]{1,3}[-.][0-9]{3}[-.][0-9]{4}"

  /** Replacement tokens use square brackets so they can never re-match
    * [[tagPattern]] and masking stays idempotent.
    */
  val urlToken = "[URL]"; val emailToken = "[EMAIL]"
  val ipToken = "[IP]"; val phoneToken = "[PHONE]"

  /** Remove markup tags (replaced by a space so `a<br>b` keeps its token
    * boundary; [[normalizeWhitespace]] collapses the leftovers).
    */
  def stripTags(c: Column): Column = regexp_replace(c, tagPattern, " ")

  def maskUrls(c: Column): Column = regexp_replace(c, urlPattern, urlToken)
  def maskEmails(c: Column): Column = regexp_replace(c, emailPattern, emailToken)
  def maskIps(c: Column): Column = regexp_replace(c, ipPattern, ipToken)
  def maskPhones(c: Column): Column = regexp_replace(c, phonePattern, phoneToken)

  /** Collapse whitespace runs and trim — canonicalizes the seams left by
    * tag-stripping so downstream tokenization sees clean boundaries.
    */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "[ \\t\\n\\r]+", " "))

  /** Count matches of `pattern` in `c` (exactly what the corresponding mask
    * stage would replace).
    */
  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Registered domain of each URL (the blocklist-filter key). */
  def urlDomain(c: Column): Column =
    regexp_extract(c, "https?://([^/ ]+)", 1)

  /** The full scrub: strip markup, mask URL → email → IP → phone, normalize
    * whitespace. Idempotent (tokens contain no maskable substrings) and a
    * pure per-row projection.
    */
  def maskAll(c: Column): Column =
    normalizeWhitespace(
      maskPhones(maskIps(maskEmails(maskUrls(stripTags(c))))))

  /** Any remaining maskable entity, as one alternation (non-capturing
    * groups keep `?`/`{}` quantifiers local). NOT used in the hot path:
    * measured at sf0.1, one alternation pass costs java.util.regex ~2.4×
    * MORE than the four separate passes (the backtracking engine retries
    * every alternative at every position; a DFA engine like RE2 would win
    * with the alternation). Kept for callers that only need a boolean
    * "anything left?" audit where a single compiled pattern is convenient.
    */
  val anyPiiPattern: String =
    Seq(urlPattern, emailPattern, ipPattern, phonePattern)
      .map(p => s"(?:$p)").mkString("|")

  /** Occurrences of `token` in `c` via a literal-replace length delta —
    * codegen'd string ops, no regex engine. Counting mask tokens in the
    * *output* equals replacements made whenever the input text cannot
    * itself contain the token (masking pipelines reserve the bracket
    * vocabulary), and costs ~nothing next to a regex scan.
    */
  def tokenCount(c: Column, token: String): Column =
    ((length(c) - length(replace(c, lit(token), lit(""))))
      / lit(token.length)).cast("long")

  /** k-anonymity audit (Sweeney 2002) over a quasi-identifier tuple: group
    * rows by the QI columns and report the equivalence-class structure —
    * class count, minimum class size, and how many classes/rows fall below
    * the anonymity threshold `k` (every such row is re-identifiable to
    * better than 1-in-k). The release-readiness gate a training-data
    * pipeline runs AFTER masking ([[maskAll]] hides direct identifiers;
    * k-anonymity measures what the remaining QUASI-identifiers still leak
    * in combination).
    *
    * One partial+final aggregate on the QI tuple, then a classes-sized
    * report aggregate (classes ≤ QI domain — bounded). All counts BIGINT;
    * the mean is the one mirrored division.
    */
  def kAnonymityAudit(df: org.apache.spark.sql.DataFrame,
                      quasiIds: Seq[Column], k: Int): org.apache.spark.sql.DataFrame = {
    val classes = df.groupBy(quasiIds: _*).agg(count(lit(1)).as("sz"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("sz")).as("n_rows"),
      min(col("sz")).as("min_class_size"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_below_k"),
      round(sum(col("sz")).cast("double") / count(lit(1)), 6)
        .as("mean_class_size"))
  }

  /** Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    * companion gate to [[kAnonymityAudit]]: k-anonymity bounds CLASS SIZE,
    * but a class of 50 rows that all share one sensitive value still leaks
    * it (the homogeneity attack); l-diversity requires every
    * quasi-identifier class to contain at least `l` DISTINCT sensitive
    * values. Reports the diversity structure — class count, minimum
    * diversity, classes/rows below `l` (each such row's sensitive value is
    * inferable to better than 1-in-l by an adversary who knows the QI
    * tuple).
    *
    * Shape mirrors [[kAnonymityAudit]]: one exact-distinct aggregate on
    * the QI tuple (Spark expands COUNT DISTINCT to a two-phase partial
    * aggregate — map-side dedup before the shuffle), then a
    * classes-sized report aggregate. All counts BIGINT; the mean is the
    * one mirrored division.
    */
  def lDiversityAudit(df: org.apache.spark.sql.DataFrame, quasiIds: Seq[Column],
                      sensitive: Column, l: Int): org.apache.spark.sql.DataFrame = {
    val classes = df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("sz"), countDistinct(sensitive).as("dv"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("sz")).as("n_rows"),
      min(col("dv")).as("min_diversity"),
      sum(when(col("dv") < l, 1L).otherwise(0L)).as("classes_below_l"),
      sum(when(col("dv") < l, col("sz")).otherwise(0L)).as("rows_below_l"),
      round(sum(col("dv")).cast("double") / count(lit(1)), 6)
        .as("mean_diversity"))
  }
}
