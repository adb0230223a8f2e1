package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 re-architecture of the reference's paginated API ingest
  * (S1, reference: plugins/brewery_operators.py:25-58).
  *
  * The reference fetches page 1..N in a DRIVER loop, accumulating
  * `list[dict]` in driver memory — the one part of its design that cannot
  * scale (SURVEY §2.1). Here each page is an `InputPartition`: executors
  * fetch pages in parallel, nothing accumulates on the driver, and
  * Catalyst sees an ordinary table (pruning, filters-after-scan, the
  * lot). Column pruning is pushed into the reader via
  * `SupportsPushDownRequiredColumns`.
  *
  * The page PAYLOAD is synthetic (zero-egress container — the marked
  * `fetchPage` stands where an HTTP GET with retry/backoff would go);
  * pagination, partitioning, pruning, and the short-last-page stop
  * condition are the real machinery under test.
  *
  * Usage: `spark.read.format("paged-api").option("pages", 4)
  *   .option("per_page", 50).load()`
  */
class PagedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "paged-api"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive everywhere else in Spark — honor
    // that here too (a mis-cased .option("Pages", ...) must not be
    // silently ignored)
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedTable(PagedConf(
      pages = opts.getInt("pages", 3),
      perPage = opts.getInt("per_page", 50),
      retries = opts.getInt("retries", 3),
      backoffMs = opts.getLong("retry_backoff_ms", 0L),
      flakyFailFirst = opts.getInt("flaky_fail_first", 0),
      maxPagesPerTrigger = opts.getInt("max_pages_per_trigger", 0)))
  }
}

/** Source options, carried into each partition (serialized to executors):
  * `retries`/`retry_backoff_ms` mirror the reference's operator retry
  * posture (dag-brewery_pipeline.py:29-33: retries=3 with a fixed delay;
  * here the delay doubles per attempt). `flaky_fail_first` is a TEST
  * fault injector: every page's first N fetch attempts throw, so specs
  * can prove the retry path end-to-end through a real scan.
  */
private[sources] case class PagedConf(pages: Int, perPage: Int, retries: Int,
                                      backoffMs: Long, flakyFailFirst: Int,
                                      maxPagesPerTrigger: Int = 0) {
  // fail fast at load() on the driver, not per task on the executors
  require(retries >= 1, s"retries must be >= 1, got $retries")
  require(backoffMs >= 0, s"retry_backoff_ms must be >= 0, got $backoffMs")
  require(maxPagesPerTrigger >= 0,
    s"max_pages_per_trigger must be >= 0 (0 = all available), " +
      s"got $maxPagesPerTrigger")
}

object PagedSource {
  /** The bronze record shape (all strings, like the inferred-JSON bronze). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("brewery_type", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("state_province", StringType, nullable = false),
    StructField("longitude", StringType, nullable = true),
    StructField("latitude", StringType, nullable = true)))

  private val types = Array("micro", "brewpub", "regional", "nano", "planning")

  /** ---- STUB fetch: deterministic synthetic page. A real build replaces
    * only this method's body with the HTTP GET; everything else —
    * partition-per-page, executor-side fetch, retry/backoff, pruning —
    * stays. Mirrors the reference's stop condition: the LAST page is
    * short. `attempt`/`failFirst` drive the test fault injector (the
    * stand-in for a transient HTTP failure).
    */
  def fetchPage(page: Int, perPage: Int, pages: Int,
                attempt: Int = 0, failFirst: Int = 0): Seq[Array[String]] = {
    if (attempt < failFirst)
      throw new java.io.IOException(
        s"transient fetch failure: page=$page attempt=$attempt")
    val n = if (page == pages - 1) math.max(perPage / 2, 1) else perPage
    (0 until n).map { i =>
      val k = page * perPage + i
      Array(
        s"b$k", s"Brewery $k", types(k % types.length), s"City${k % 17}",
        s"S${k % 10}",
        if (k % 13 == 0) "not-a-number" else s"${-120 + (k % 40)}.${k % 100}",
        s"${30 + (k % 20)}.${k % 100}")
    }
  }

  /** Bounded-retry fetch with doubling backoff — the engine-side analog
    * of the reference's `retries=3` / fixed-delay operator posture. Runs
    * ON THE EXECUTOR inside the partition reader: a transient page
    * failure retries locally without failing the task (and without
    * re-fetching any other page); a persistent one propagates after
    * `retries` attempts and surfaces through Spark's own task retry.
    */
  def fetchPageWithRetry(page: Int, perPage: Int, pages: Int,
                         retries: Int, backoffMs: Long,
                         failFirst: Int = 0): Seq[Array[String]] = {
    require(retries >= 1, s"retries must be >= 1, got $retries")
    var attempt = 0
    var out: Seq[Array[String]] = null
    while (out == null) {
      try out = fetchPage(page, perPage, pages, attempt, failFirst)
      catch {
        case scala.util.control.NonFatal(e) if attempt + 1 < retries =>
          if (backoffMs > 0) Thread.sleep(delayMs(backoffMs, attempt))
          attempt += 1
      }
    }
    out
  }

  /** Single retry delay: doubling from `backoffMs`, capped at
    * [[MaxBackoffMs]]. The cap is applied BEFORE the shift: a large
    * configured base shifted first overflows Long to a negative, and
    * `Thread.sleep(negative)` throws — turning a transient page failure
    * into a task crash instead of a capped wait.
    */
  private[sources] def delayMs(backoffMs: Long, attempt: Int): Long = {
    val base = math.min(backoffMs, MaxBackoffMs)
    math.min(MaxBackoffMs, base << math.min(attempt, 20))
  }

  /** Ceiling on a single retry delay (1 min, the reference's poke scale). */
  private[sources] val MaxBackoffMs = 60000L
}

private class PagedTable(conf: PagedConf) extends Table with SupportsRead {
  override def name(): String = s"paged-api(${conf.pages} x ${conf.perPage})"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(conf)
}

private class PagedScanBuilder(conf: PagedConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      (0 until conf.pages)
        .map(p => PagePartition(p, conf): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PagedReaderFactory(required)
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new PagedMicroBatchStream(conf, required)
  }
}

/** Incremental form of the paged ingest (SURVEY §2.7 direction: the
  * reference defers incremental processing as future work): the SAME
  * page-per-partition scan exposed as a DSv2 `MicroBatchStream`, with
  * the stream OFFSET = "pages ingested so far". Each micro-batch plans
  * the pages in `[start, end)` as ordinary [[PagePartition]]s — the
  * executor-side fetch/retry/pruning path is byte-identical to the
  * batch scan, so batch backfill and incremental tailing are one code
  * path (the lambda-free property, at the SOURCE level this time).
  *
  * `max_pages_per_trigger` (0 = all available) is admission control:
  * `latestOffset(start, _)` caps each batch at that many NEW pages, the
  * DSv2 analog of the file source's `maxFilesPerTrigger`. Under
  * `Trigger.AvailableNow` the stream drains the fixed page count in
  * ceil(pages/max) batches and stops — a bounded backfill with
  * exactly-once page accounting (offsets are checkpointed by the
  * engine; `commit` has nothing source-side to clean up).
  *
  * At 100 TB the offset would be the API's cursor/etag instead of a
  * page ordinal; the contract is identical: monotone, serializable,
  * replayable from any committed point.
  */
private class PagedMicroBatchStream(conf: PagedConf, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def page(o: Offset): Int = o.asInstanceOf[PageOffset].page

  override def initialOffset(): Offset = PageOffset(0)
  override def deserializeOffset(json: String): Offset =
    PageOffset(json.trim.toInt)
  // the synthetic API is a fixed snapshot, so "available" never moves;
  // a live API would re-list here
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control path")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = page(start)
    val cap = if (conf.maxPagesPerTrigger > 0) conf.maxPagesPerTrigger
              else conf.pages
    PageOffset(math.min(conf.pages, s + cap))
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    (page(start) until page(end))
      .map(p => PagePartition(p, conf): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Stream offset: number of pages ingested so far (monotone, replayable). */
private case class PageOffset(page: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = page.toString
}

private case class PagePartition(page: Int, conf: PagedConf)
    extends InputPartition

private class PagedReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  // indices into the full row for the pruned output schema
  private val proj: Array[Int] =
    required.fieldNames.map(PagedSource.schema.fieldIndex)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[PagePartition]
      // executor-side fetch with bounded retry — this is where the HTTP
      // call would happen
      private val rows = {
        val c = part.conf
        PagedSource.fetchPageWithRetry(part.page, c.perPage, c.pages,
          c.retries, c.backoffMs, c.flakyFailFirst)
      }
      private var i = -1

      // staging array reused across rows for the projection copy; each
      // emitted row still clones it — downstream operators may buffer
      // InternalRows, so handing out the shared array would alias rows.
      // The reuse avoids a per-row Seq builder + re-boxing, not the copy.
      private val buf = new Array[Any](proj.length)

      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val full = rows(i)
        var k = 0
        while (k < proj.length) {
          val v = full(proj(k))
          buf(k) = if (v == null) null else UTF8String.fromString(v)
          k += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          buf.clone())
      }
      override def close(): Unit = ()
    }
}
