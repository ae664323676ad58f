package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 model of the reference's paginated replay-search scan
  * (SURVEY §2.1 S1; reference `api.py:13-42` + `tasks/discovery.py:64-114`):
  * pages of ≤ `pageSize` rows in *descending* `uploadtime`, cursor = the
  * previous page's oldest timestamp, a short page ⇒ end of stream.
  *
  * The reference walks pages serially on one thread; as a V2 `Batch` source
  * each page is an `InputPartition`, so discovery parallelizes across
  * executors — page boundaries are pure functions of (cursor, pageSize), no
  * shared state. The HTTP GET is replaced by a deterministic synthetic
  * generator (zero-egress environment); a real deployment would issue the
  * request inside [[PageReader]] with per-partition retry/backoff exactly
  * where the generator runs (reference `api.py:44-99` semantics).
  *
  * Early termination (`discovery.py:108`, short page ⇒ stop) surfaces as
  * [[SupportsPushDownLimit]]: `LIMIT n` plans only ⌈n/pageSize⌉ pages.
  *
  * Options: `format` (stream key), `total` (rows available), `pageSize`
  * (default 51), `endTs` (newest uploadtime, default 1704067200).
  */
class PagedReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "paged-replays"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedReplaySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedReplayTable(new CaseInsensitiveStringMap(properties))
}

object PagedReplaySource {
  val schema: StructType = StructType(Seq(
    StructField("replay_id", StringType, nullable = false),
    StructField("format_id", StringType, nullable = false),
    StructField("uploadtime", LongType, nullable = false),
    StructField("players", StringType, nullable = false)))

  /** Deterministic stand-in for one fetched row (the HTTP payload). */
  def row(format: String, endTs: Long, idx: Long): (String, String, Long, String) = {
    val uploadtime = endTs - idx * 37L // strictly descending, gappy
    val id = s"$format-${uploadtime}"
    val p1 = s"p${(idx * 7919) % 1000}"; val p2 = s"p${(idx * 104729) % 1000}"
    (id, format, uploadtime, s"$p1 vs $p2")
  }
}

class PagedReplayTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"paged_replays(${options.getOrDefault("format", "gen9ou")})"
  override def schema(): StructType = PagedReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagedReplayScanBuilder(
      options.getOrDefault("format", "gen9ou"),
      options.getOrDefault("total", "1000").toLong,
      options.getOrDefault("pageSize", "51").toInt,
      options.getOrDefault("endTs", "1704067200").toLong,
      options.getOrDefault("maxPagesPerTrigger", "5").toInt)
}

class PagedReplayScanBuilder(format: String, var total: Long, pageSize: Int,
                             endTs: Long, maxPagesPerTrigger: Int)
    extends ScanBuilder with SupportsPushDownLimit {
  // T3 early termination: LIMIT n ⇒ fetch only the first ⌈n/pageSize⌉ pages.
  override def pushLimit(limit: Int): Boolean = {
    total = math.min(total, limit.toLong)
    true
  }
  override def build(): Scan =
    new PagedReplayScan(format, total, pageSize, endTs, maxPagesPerTrigger)
}

class PagedReplayScan(format: String, total: Long, pageSize: Int, endTs: Long,
                      maxPagesPerTrigger: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = PagedReplaySource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"paged-replays format=$format total=$total pageSize=$pageSize"

  /** Streaming face (SURVEY §2.9 T1/T3/T6): the micro-batch offset is the
    * page cursor; `latestOffset` advances at most `maxPagesPerTrigger` pages
    * per trigger (the reference's `max_pages` run cap / pacing,
    * constants.py:26, discovery.py:78-79) and stops advancing at the last
    * page — offset exhaustion is the short-page end-of-stream signal.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedReplayMicroBatchStream(format, total, pageSize, endTs, maxPagesPerTrigger)

  override def planInputPartitions(): Array[InputPartition] = {
    val nPages = ((total + pageSize - 1) / pageSize).toInt
    (0 until nPages).map { p =>
      val start = p.toLong * pageSize
      PagePartition(format, endTs, start, math.min(start + pageSize, total))
        .asInstanceOf[InputPartition]
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PageReader(partition.asInstanceOf[PagePartition])
    }
}

/** Page-cursor offset: number of pages fully served. */
case class PageOffset(page: Long) extends Offset {
  override def json(): String = s"""{"page":$page}"""
}

class PagedReplayMicroBatchStream(format: String, total: Long, pageSize: Int,
                                  endTs: Long, maxPagesPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  private val nPages: Long = (total + pageSize - 1) / pageSize

  override def initialOffset(): Offset = PageOffset(0L)

  /** Throttled advance is a pure function of the *checkpointed* start offset
    * (SupportsAdmissionControl) — mutable internal cursors regress behind the
    * committed offset after a restart and re-deliver pages.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    PageOffset(math.min(start.asInstanceOf[PageOffset].page + maxPagesPerTrigger, nPages))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = PageOffset(nPages)
  // unthrottled path (not used when SupportsAdmissionControl is present)
  override def latestOffset(): Offset = PageOffset(nPages)

  override def deserializeOffset(json: String): Offset =
    PageOffset("""\d+""".r.findFirstIn(json).get.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    (s until e).map { p =>
      val lo = p * pageSize
      PagePartition(format, endTs, lo, math.min(lo + pageSize, total))
        .asInstanceOf[InputPartition]
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PageReader(partition.asInstanceOf[PagePartition])
    }
}

/** One API page: rows [start, end) of the descending-uploadtime stream. */
case class PagePartition(format: String, endTs: Long, start: Long, end: Long)
    extends InputPartition

class PageReader(p: PagePartition) extends PartitionReader[InternalRow] {
  private var i = p.start - 1
  override def next(): Boolean = { i += 1; i < p.end }
  override def get(): InternalRow = {
    val (id, fmt, ts, players) = PagedReplaySource.row(p.format, p.endTs, i)
    InternalRow(UTF8String.fromString(id), UTF8String.fromString(fmt),
                ts, UTF8String.fromString(players))
  }
  override def close(): Unit = ()
}
