package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throughput-from-logs: the composed end-to-end pipeline of the reference's
  * `scripts/calculate_throughput.py:22-117` — grep task start/end timestamps
  * and the download-summary line out of raw Airflow log lines, then compute
  * per-run duration, replays/second, success rate, and average time per
  * download (F12 line parsing + A9 zero-guarded rate arithmetic, composed).
  *
  * Input: `lines(run_id, line)` — one row per raw log line. Everything is a
  * map-side regexp projection plus one hash aggregate on `run_id`; rates are
  * exact IEEE int/int divisions (no rounding — identical across engines).
  */
object Throughput {

  private val tsOf =
    to_timestamp(regexp_extract(col("line"), "^\\[([^\\]]+)\\]", 1),
                 "yyyy-MM-dd'T'HH:mm:ss")

  private def summaryField(group: Int) =
    regexp_extract(col("line"),
      "Download summary: (\\d+) downloaded, (\\d+) failed, (\\d+) skipped out of (\\d+) total",
      group)

  /** Per-run performance metrics from raw log lines. */
  def fromLogs(lines: DataFrame): DataFrame = {
    val parsed = lines.select(
      col("run_id"),
      when(col("line").contains("Starting attempt"), unix_seconds(tsOf)).as("start_ep"),
      when(col("line").contains("Task exited"), unix_seconds(tsOf)).as("end_ep"),
      when(col("line").startsWith("Download summary:"),
           summaryField(1).cast("long")).as("downloaded"),
      when(col("line").startsWith("Download summary:"),
           summaryField(4).cast("long")).as("total"))
    parsed.groupBy(col("run_id"))
      .agg(max(col("start_ep")).as("start_ep"), max(col("end_ep")).as("end_ep"),
           max(col("downloaded")).as("downloaded"), max(col("total")).as("total"))
      .select(
        col("run_id"), col("start_ep"), col("end_ep"), col("downloaded"), col("total"),
        (col("end_ep") - col("start_ep")).as("duration_s"),
        Scalars.safeDiv(col("downloaded").cast("double"),
                        col("end_ep") - col("start_ep")).as("throughput_rps"),
        Scalars.safeDiv(col("downloaded").cast("double") * 100.0,
                        col("total")).as("success_rate_pct"),
        Scalars.safeDiv((col("end_ep") - col("start_ep")).cast("double") * 1000.0,
                        col("downloaded")).as("avg_ms_per_download"))
  }
}
