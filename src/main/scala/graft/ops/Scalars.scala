package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8 F1–F14), re-expressed as
  * codegen-friendly built-in Catalyst expressions — no UDFs.
  *
  * Reference behaviors (file:line cites into the reference repo):
  *  - F1/F2 epoch→date:  db.py:693-694, fix_compacted_status.py:47
  *  - F4 batch-id format: tasks/discovery.py:55,174
  *  - F5 failure prefix channel: db.py:366,567
  *  - F6 "(batch …)" detail extraction: db.py:171-179
  *  - F7 battle-log `|t:|<epoch>` marker: scripts/import_existing_replays.py:47-49
  *  - F8 players concat "p1 vs p2": db.py:877
  *  - F9/F10 additional_info JSON round-trip: db.py:227,269-270,878-879
  *  - F11 filename⇄id: scripts/import_existing_replays.py:32-34
  *  - F13 zero-guarded rate division: scripts/calculate_throughput.py:110-117
  *  - F14 default-on-missing: db.py:734,266
  */
object Scalars {

  /** F1/F2 — Unix epoch seconds → UTC date (reference mixes local-time and
    * UTC conversions; the engine pins UTC everywhere).
    */
  def epochToDate(epochSeconds: Column): Column =
    to_date(timestamp_seconds(epochSeconds))

  /** F1 — timestamp → "yyyy-MM-dd" string. */
  def dayString(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** Timestamp → epoch seconds (truncating), the event-time axis. */
  def epochSeconds(ts: Column): Column = unix_seconds(ts)

  /** F3 — ISO-8601 processing-time stamp (`datetime.now().isoformat()`,
    * db.py:226,257). Wall-clock, so never part of an oracle-checked output —
    * pipeline bookkeeping only.
    */
  def nowIso(): Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")

  /** F4 — deterministic batch-run id `{fmt}_{yyyyMMdd_HHmmss}` derived from a
    * supplied event time (the reference uses wall-clock `datetime.now()`; a
    * deterministic engine takes the clock as an input).
    */
  def batchId(formatId: Column, at: Column): Column =
    concat_ws("_", formatId, date_format(at, "yyyyMMdd_HHmmss"))

  /** F5 — the reference's string-prefix error channel (`LIKE 'Failed:%'`). */
  def isFailed(details: Column): Column =
    details.startsWith("Failed:")

  /** F6 — extract the batch id embedded in a details string: "(batch X)". */
  def batchFromDetails(details: Column): Column =
    regexp_extract(details, "\\(batch ([^)]+)\\)", 1)

  /** F7 — first `|t:|<epoch>` marker in a battle log, as epoch seconds. */
  def logTimestamp(log: Column): Column =
    regexp_extract(log, "\\|t:\\|(\\d+)", 1).cast("long")

  /** F8 — "p1 vs p2" display concat. */
  def versus(p1: Column, p2: Column): Column = concat_ws(" vs ", p1, p2)

  /** F8 (array form) — `" vs ".join(players)`. */
  def versusAll(players: Column): Column = array_join(players, " vs ")

  /** F9 — pull one field out of a JSON-encoded string column. */
  def jsonField(json: Column, field: String): Column =
    get_json_object(json, s"$$.$field")

  /** F10 (encode side) — fold every JSON field NOT in `known` into a
    * canonical `additional_info` JSON object (the reference stores leftover
    * API fields this way, db.py:269-270,878-879, and parses them back on
    * read). `map_filter` prunes the known keys; the object is then encoded
    * with **sorted keys and minimal punctuation** rather than `to_json`,
    * because `to_json` preserves map insertion order (= input JSON order) —
    * a canonical text form is engine-independent and makes the round trip
    * hash-comparable. Values are re-encoded as JSON strings; keys/values
    * must not themselves contain `"` (true of the API surface this models).
    */
  def additionalInfo(json: Column, known: Seq[String]): Column =
    additionalInfoFromMap(jsonAsMap(json), known)

  /** Parse a JSON object column to `map<string,string>` once — stage this in
    * a projection and derive fields from it instead of calling
    * [[jsonField]] repeatedly (each `get_json_object` re-parses the string;
    * one `from_json` + `element_at`s is a single parse per row).
    */
  def jsonAsMap(json: Column): Column =
    from_json(json, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))

  /** F10 encode over an already-parsed map (the hot-path form). */
  def additionalInfoFromMap(m: Column, known: Seq[String]): Column = {
    val knownArr = array(known.map(lit): _*)
    val rest = map_filter(m, (k, _) => !array_contains(knownArr, k))
    val entries = transform(array_sort(map_keys(rest)),
      k => concat(lit("\""), k, lit("\":\""), element_at(rest, k), lit("\"")))
    concat(lit("{"), array_join(entries, ","), lit("}"))
  }

  /** F11 — filename → id, exactly `os.path.splitext(os.path.basename(f))[0]`
    * (import_existing_replays.py:32-34): basename = text after the last `/`,
    * splitext = strip from the last `.` (no dot ⇒ unchanged). Pure codegen'd
    * string ops — the earlier `([^/]+)\.json$` regex form cost ~4 µs/row of
    * regex-engine time in the reconcile hot path and returned "" for
    * non-.json inputs where splitext returns the stem.
    */
  def idFromFilename(path: Column): Column = {
    val base = substring_index(path, "/", -1)
    // locate-in-reversed = distance of the last "." from the end; 0 when absent.
    // splitext's dotfile rule: leading dots are part of the name, never an
    // extension separator (".DS_Store" → ".DS_Store", ".a.json" → ".a"), so
    // only strip when a dot remains after the leading-dot run.
    when(locate(".", ltrim(base, ".")) > 0,
         base.substr(lit(1), length(base) - locate(".", reverse(base))))
      .otherwise(base)
  }

  /** F12 — Airflow-log line timestamp parse
    * (`[%Y-%m-%dT%H:%M:%S.%f+0000]`, calculate_throughput.py:22-31).
    */
  def parseLogLineTs(line: Column): Column =
    to_timestamp(regexp_extract(line, "\\[([^\\]]+)\\]", 1),
                 "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ")

  /** F13 — zero-guarded division (rates / percentages). */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= 0, num / den).otherwise(lit(0.0))

  /** F14 — default-on-missing lookup semantics. */
  def orDefault(c: Column, default: Column): Column = coalesce(c, default)

  /** Exact money arithmetic via integer cents: money doubles carry 2
    * decimals, so `round(x·100)` is an exact integer; sums are then plain
    * `long` arithmetic — exact and order-independent, like the earlier
    * DECIMAL(18,2) formulation but without a `java.math.BigDecimal`
    * allocation per value (an allocation storm at millions of rows per
    * aggregate pass). The result surfaces as DOUBLE only in the final
    * projection; both engines perform the same correctly-rounded
    * integer→double conversion and division, so oracle hashes match.
    * Overflow headroom: 2⁶³ cents ≈ 9.2·10¹⁶ money units per group.
    */
  def moneyCents(c: Column): Column = round(c * 100).cast("long")

  /** Exact sum of a 2-decimal money column, surfaced as double. */
  def moneySum(c: Column): Column =
    sum(moneyCents(c)).cast("double") / lit(100.0)

  /** Σ price·(1−disc), exact: cents·(100−pct) stays integral (< 2⁶³ —
    * price·discount products are bounded by 2³⁰ per row), divided back to
    * money units only in the final projection.
    */
  def discountedSum(price: Column, disc: Column): Column =
    sum(moneyCents(price) * (lit(100L) - moneyCents(disc)))
      .cast("double") / lit(10000.0)

  /** Per-row integral Σ-term of [[discountedSum]] in 10⁻⁴ money units —
    * for pre-aggregation shapes that sum partial long totals before the
    * final double conversion (exact and associative, so re-association
    * across a pre-aggregate is bit-identical to the flat sum).
    */
  def discountedCents(price: Column, disc: Column): Column =
    moneyCents(price) * (lit(100L) - moneyCents(disc))
}
