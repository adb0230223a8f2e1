package graft.sources

import java.io.{BufferedWriter, File}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-manifest`: a DataSource V2 BATCH WRITE with an explicit
  * two-phase commit — the write-side counterpart of [[PagedSource]]
  * (which covers the read/stream side of the connector API).
  *
  * The exactly-once contract, spelled out:
  *  1. every task writes its rows to a file named by its UNIQUE
  *     (partitionId, taskId) — a speculative or retried attempt gets a
  *     different taskId, so attempts never clobber each other;
  *  2. a task that succeeds returns a [[FileCommit]] message (name,
  *     rows, bytes); a task that fails has `abort()` delete its file;
  *  3. ONLY the driver's `BatchWrite.commit` — called once, after all
  *     tasks succeeded — writes `_graft_manifest.json` listing the
  *     committed files (tmp-write + atomic rename);
  *  4. readers ([[ManifestSink.readData]]) list files FROM THE
  *     MANIFEST, never from the directory — an orphan file from a
  *     lost speculative attempt is invisible, because visibility IS
  *     the manifest entry;
  *  5. every commit REPLACES the visible snapshot (the manifest lists
  *     only the committing job's files) — `append` and `overwrite`
  *     are therefore the same operation here, which ManifestSinkSpec
  *     pins for both modes.
  * This is the same protocol parquet's OutputCommitter and the table
  * formats' snapshot commit implement; here it is small enough to
  * read and to test (ManifestSinkSpec drives the success, duplicate-
  * attempt and abort paths explicitly).
  *
  * Rows are serialized as JSON lines; supported field types are the
  * primitive surface (long/int/double/string/boolean — documented
  * scope: the sink demonstrates the COMMIT PROTOCOL, not a codec).
  *
  * ## 100 TB notes
  * The data path is embarrassingly parallel (one file per task, no
  * coordination until commit); the commit is O(#files) driver work —
  * exactly the scaling shape of real table-format commits. The
  * manifest doubles as the statistics source (per-file rows/bytes)
  * that q260-style packing and q267-style pruning audits read.
  */
class ManifestSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-manifest is write-only; read back via ManifestSink.readData")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ManifestTable(schema,
      Option(properties.get("path")).getOrElse(throw new
          IllegalArgumentException("graft-manifest requires option 'path'")))
}

object ManifestSink {
  val ManifestName = "_graft_manifest.json"

  /** The committed file list (name, rows, bytes) — the only source of
    * visibility a reader may trust. The `_`-prefixed name keeps the
    * manifest invisible to Spark's own file listings (the parquet
    * `_SUCCESS` convention), so it is read through plain file IO, not
    * a path-based scan.
    */
  def readManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val body = new String(
      Files.readAllBytes(Paths.get(dir, ManifestName)),
      StandardCharsets.UTF_8)
    spark.read.json(Seq(body).toDS)
      .selectExpr("explode(files) AS f")
      .selectExpr("f.name AS name", "f.rows AS rows", "f.bytes AS bytes")
  }

  /** Read back the data THROUGH the manifest: only committed files are
    * listed, so orphans from lost attempts are invisible by
    * construction. The file list is driver-side METADATA (|files|
    * entries, the scan plan's input), parsed straight from the
    * manifest body — file names are the sink's own
    * `part-NNNNN-TT.jsonl` pattern, so the extraction is a plain
    * regex, no Spark job.
    */
  def readData(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val body = new String(
      Files.readAllBytes(Paths.get(dir, ManifestName)),
      StandardCharsets.UTF_8)
    val files = "\"name\":\"([^\"]+)\"".r.findAllMatchIn(body)
      .map(m => Paths.get(dir, m.group(1)).toString).toSeq
    spark.read.schema(schema).json(files: _*)
  }

  private[sources] def jsonCell(dt: DataType, row: InternalRow,
      i: Int): String =
    if (row.isNullAt(i)) "null"
    else dt match {
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case BooleanType => row.getBoolean(i).toString
      case StringType =>
        // RFC 8259 string escaping: backslash, quote, and EVERY control
        // char < 0x20 (\b, \f, U+0000… — not just \n\r\t; a raw control
        // char emits invalid JSON that the permissive reader on the
        // read path would silently null the whole row for)
        val s = row.getUTF8String(i).toString
        val b = new java.lang.StringBuilder(s.length + 2)
        b.append('"')
        s.foreach {
          case '\\' => b.append("\\\\")
          case '"' => b.append("\\\"")
          case '\n' => b.append("\\n")
          case '\r' => b.append("\\r")
          case '\t' => b.append("\\t")
          case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
          case c => b.append(c)
        }
        b.append('"').toString
      case other => throw new UnsupportedOperationException(
        s"graft-manifest supports primitive columns only, got $other")
    }
}

private class ManifestTable(schema0: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-manifest($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** Every commit REPLACES the visible snapshot (the manifest lists
    * only the committing job's files), so `append` and `overwrite`
    * land on the same write: truncate is a no-op — there is nothing to
    * clear that the commit's manifest swap doesn't already supersede.
    * Implementing [[SupportsTruncate]] is still required: the
    * advertised TRUNCATE capability only passes the analyzer's check;
    * V2 write PLANNING then demands the trait, and `mode("overwrite")`
    * would otherwise fail after passing analysis.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestBatchWrite(info.schema(), path)
      }
    }
}

private case class FileCommit(name: String, rows: Long, bytes: Long)
    extends WriterCommitMessage

private class ManifestBatchWrite(schema: StructType, path: String)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    new ManifestWriterFactory(schema, path)
  }

  /** Phase 2: all tasks succeeded — publish their files atomically by
    * writing the manifest (tmp + rename). Until this line runs, a
    * reader sees the PREVIOUS manifest (or none): task files alone
    * grant no visibility.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.collect { case f: FileCommit => f }.sortBy(_.name)
    val files = commits.map(c =>
      s"""{"name":"${c.name}","rows":${c.rows},"bytes":${c.bytes}}""")
      .mkString("[", ",", "]")
    val body = s"""{"files":$files,"n_files":${commits.length},""" +
      s""""n_rows":${commits.map(_.rows).sum}}"""
    val tmp = Paths.get(path, ManifestSink.ManifestName + ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, ManifestSink.ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Job-level abort: best-effort cleanup of files whose tasks DID
    * commit (the manifest was never written, so they were never
    * visible either way).
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case f: FileCommit => f }.foreach { c =>
      Files.deleteIfExists(Paths.get(path, c.name))
    }
}

private class ManifestWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(schema, path, partitionId, taskId)
}

private class ManifestDataWriter(schema: StructType, path: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  // unique per ATTEMPT: a retried/speculative task has a new taskId,
  // so two attempts of one partition never write the same file
  private val fileName = f"part-$partitionId%05d-$taskId.jsonl"
  private val file = new File(path, fileName)
  private var out: BufferedWriter = _
  private var rows = 0L

  // explicit UTF-8: readData/readManifest decode UTF-8, so the writer
  // must not depend on the platform default charset (a latin-1 JVM
  // would mojibake every non-ASCII string on the round trip)
  private def ensureOpen(): Unit =
    if (out == null)
      out = Files.newBufferedWriter(file.toPath, StandardCharsets.UTF_8)

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      "\"" + f.name + "\":" + ManifestSink.jsonCell(f.dataType, row, i)
    }
    out.write(cells.mkString("{", ",", "}"))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    ensureOpen() // an empty partition still commits an (empty) file
    out.flush(); out.close(); out = null
    FileCommit(fileName, rows, file.length())
  }

  /** Task-level abort: this attempt's file disappears; the attempt
    * never returned a commit message, so the driver never lists it.
    */
  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    Files.deleteIfExists(file.toPath)
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
