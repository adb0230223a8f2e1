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
    new PagedTable(
      opts.getInt("pages", 3),
      opts.getInt("per_page", 50))
  }
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
    * only this method with the HTTP GET (+ retry/backoff); everything
    * else — partition-per-page, executor-side fetch, pruning — stays.
    * Mirrors the reference's stop condition: the LAST page is short.
    */
  def fetchPage(page: Int, perPage: Int, pages: Int): Seq[Array[String]] = {
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
}

private class PagedTable(pages: Int, perPage: Int) extends Table with SupportsRead {
  override def name(): String = s"paged-api($pages x $perPage)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(pages, perPage)
}

private class PagedScanBuilder(pages: Int, perPage: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      (0 until pages).map(p => PagePartition(p, perPage, pages): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PagedReaderFactory(required)
  }
}

private case class PagePartition(page: Int, perPage: Int, pages: Int)
    extends InputPartition

private class PagedReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  // indices into the full row for the pruned output schema
  private val proj: Array[Int] =
    required.fieldNames.map(PagedSource.schema.fieldIndex)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[PagePartition]
      // executor-side "fetch" — this is where the HTTP call would happen
      private val rows = PagedSource.fetchPage(part.page, part.perPage, part.pages)
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
