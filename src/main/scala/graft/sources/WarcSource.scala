package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch reader for WARC archives (the [[Warc]] codec):
  *
  * {{{
  *   spark.read.format("graft.sources.WarcSource").load("/crawl/segment-00")
  * }}}
  *
  * Schema: (url string, warc_ts timestamp, record_type string,
  * http_status int, content_type string, body binary, warc_file string).
  *
  * Scale shape: one InputPartition per `.warc`/`.warc.gz` FILE — gzip
  * members are not splittable, and Common Crawl shards crawls into ~1 GB
  * files precisely so file-granular parallelism saturates a cluster; a
  * 100 TB crawl is ~10⁵ partitions. Each PartitionReader STREAMS records
  * (one in memory at a time) and materializes only the pruned columns:
  * `SupportsPushDownRequiredColumns` means `select(url)` never allocates
  * body byte arrays into rows (the decompressor still walks the bytes —
  * inherent to gzip — but nothing is retained or shipped). */
class WarcSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(WarcSource.pathsOf(properties.asScala.toMap))
  override def supportsExternalMetadata(): Boolean = false
}

object WarcSource {
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("record_type", StringType),
    StructField("http_status", IntegerType),
    StructField("content_type", StringType),
    StructField("body", BinaryType),
    StructField("digest", StringType),
    StructField("refers_to", StringType),
    StructField("truncated", StringType),
    StructField("warc_file", StringType)))

  private[sources] def pathsOf(props: Map[String, String]): Seq[String] =
    props.get("paths").map(p => p.stripPrefix("[").stripSuffix("]").split(",").toSeq)
      .orElse(props.get("path").map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException("warc source requires a path"))
      .map(_.trim).filter(_.nonEmpty)

  /** Expand dirs/globs to concrete .warc/.warc.gz files, sorted for a
    * deterministic partition order. */
  private[sources] def listFiles(paths: Seq[String], conf: Configuration): Seq[String] = {
    def isWarc(n: String) = n.endsWith(".warc") || n.endsWith(".warc.gz")
    paths.flatMap { s =>
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      val stats = fs.globStatus(p) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case gs => gs
      }
      stats.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(c => c.isFile && isWarc(c.getPath.getName))
        else if (isWarc(st.getPath.getName)) Array(st)
        else Array.empty[org.apache.hadoop.fs.FileStatus]
      }.map(_.getPath.toString)
    }.sorted
  }
}

class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths)
}

class WarcScanBuilder(paths: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = WarcSource.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition(WarcFilters.supported)
    pushed = sup
    rest // Spark re-evaluates only what the source did not take
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new WarcScan(paths, required, pushed)
}

/** Record-level predicate pushdown for the string/int header columns:
  * a pushed filter skips the record BEFORE any InternalRow (and any
  * body byte array) is materialized into the query — at crawl scale a
  * `record_type = 'response'` or url-prefix probe touches a fraction of
  * each shard's rows (the gzip stream is still walked; that is inherent
  * to the format). Only filters this source evaluates EXACTLY are
  * claimed; everything else stays with Spark. */
object WarcFilters {
  import org.apache.spark.sql.sources._
  private val Cols = Set("url", "record_type", "content_type", "http_status",
    "digest", "refers_to", "truncated")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => Cols(a)
    case EqualTo("http_status", _: Int) => true
    case In(a, vs) => Cols(a) && vs.forall(v => v.isInstanceOf[String] || v.isInstanceOf[Int])
    case StringStartsWith(a, _) => Cols(a)
    case StringContains(a, _) => Cols(a)
    case IsNotNull(a) => Cols(a) // our record fields are never null
    case Not(inner) => supported(inner)
    case Or(l, r) => supported(l) && supported(r)
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }

  private def colOf(r: WarcRecord, a: String): Any = a match {
    case "url"          => r.targetUri
    case "record_type"  => r.recordType
    case "content_type" => r.contentType
    case "http_status"  => r.httpStatus
    case "digest"       => r.digest
    case "refers_to"    => r.refersTo
    case "truncated"    => r.truncated
    case other          => throw new IllegalArgumentException(s"unpushable column: $other")
  }

  def eval(f: Filter, r: WarcRecord): Boolean = f match {
    case EqualTo(a, v)          => colOf(r, a) == v
    case In(a, vs)              => vs.contains(colOf(r, a))
    case StringStartsWith(a, v) => colOf(r, a).asInstanceOf[String].startsWith(v)
    case StringContains(a, v)   => colOf(r, a).asInstanceOf[String].contains(v)
    case IsNotNull(_)           => true
    case Not(inner)             => !eval(inner, r)
    case Or(l, rr)              => eval(l, r) || eval(rr, r)
    case And(l, rr)             => eval(l, r) && eval(rr, r)
    case other => throw new IllegalArgumentException(s"unpushable filter: $other")
  }
}

class WarcScan(paths: Seq[String], required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan[${required.fieldNames.mkString(",")}]" +
      (if (pushed.nonEmpty) s" PushedFilters: [${pushed.mkString(", ")}]" else "") +
      s" ${paths.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    WarcSource.listFiles(paths, new Configuration())
      .map(f => WarcInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required.fieldNames, pushed)
  override def toMicroBatchStream(checkpointLocation: String) =
    new WarcMicroBatchStream(paths, required.fieldNames, pushed)
}

/** High-water-mark offset: the lexicographically largest file name
  * ingested so far ("" = nothing yet). */
case class WarcFileOffset(lastFile: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    "{\"lastFile\":\"" + lastFile.replace("\\", "\\\\").replace("\"", "\\\"") + "\"}"
}

/** Streaming WARC ingest — tail a directory a crawler is writing
  * segments into. Each micro-batch is the set of files that appeared
  * ABOVE the last committed high-water mark in lexicographic order; the
  * offset is just that mark, so checkpointed restarts resume exactly
  * where they stopped without any per-file state.
  *
  * CONTRACT: segment names must sort in arrival order (true for
  * `part-NNNNN` writers and Common-Crawl-style timestamped segment
  * names) and a file must be complete when it becomes visible (write
  * temp + rename, exactly what [[Warc.write]] does). A late file sorting
  * below the mark is never picked up — this is the documented trade for
  * an O(1) offset instead of Spark's seen-files map (whose size is the
  * known FileStreamSource scaling wall at 10^5+ segments).
  * Supports Trigger.AvailableNow (offsets pinned at prepare time). */
class WarcMicroBatchStream(paths: Seq[String], fields: Array[String],
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def currentFiles(): Seq[String] = WarcSource.listFiles(paths, new Configuration())
  @volatile private var pinnedLast: Option[String] = None

  override def initialOffset(): Offset = WarcFileOffset("")
  override def deserializeOffset(json: String): Offset = {
    // minimal parse of {"lastFile":"..."} (the only field we write)
    val m = "\"lastFile\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(json)
    WarcFileOffset(m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse(""))
  }
  override def latestOffset(): Offset =
    WarcFileOffset(pinnedLast.getOrElse(currentFiles().lastOption.getOrElse("")))
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = latestOffset()
  override def prepareForTriggerAvailableNow(): Unit =
    pinnedLast = Some(currentFiles().lastOption.getOrElse(""))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WarcFileOffset].lastFile
    val hi = end.asInstanceOf[WarcFileOffset].lastFile
    currentFiles().filter(f => f > lo && f <= hi)
      .map(f => WarcInputPartition(f): InputPartition).toArray
  }
  // pass pushed filters through: Spark drops anything listed in
  // pushedFilters() from the residual plan, so a claimed-but-unapplied
  // filter on a future micro-batch push path would silently drop rows
  override def createReaderFactory(): PartitionReaderFactory = WarcReaderFactory(fields, pushed)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class WarcInputPartition(file: String) extends InputPartition

case class WarcReaderFactory(fields: Array[String],
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].file, fields, pushed)
}

class WarcPartitionReader(file: String, fields: Array[String],
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReader[InternalRow] {
  private val it = Warc.open(file, new Configuration())
  private val fileUtf8 = UTF8String.fromString(file)
  private var rec: WarcRecord = _

  // resolve column extractors ONCE per partition, not per row
  private val getters: Array[WarcRecord => Any] = fields.map {
    case "url" => (r: WarcRecord) => UTF8String.fromString(r.targetUri)
    case "warc_ts" => (r: WarcRecord) =>
      r.date.getEpochSecond * 1000000L + r.date.getNano / 1000L
    case "record_type" => (r: WarcRecord) => UTF8String.fromString(r.recordType)
    case "http_status" => (r: WarcRecord) => r.httpStatus
    case "content_type" => (r: WarcRecord) => UTF8String.fromString(r.contentType)
    case "body" => (r: WarcRecord) => r.body
    case "digest" => (r: WarcRecord) => UTF8String.fromString(r.digest)
    case "refers_to" => (r: WarcRecord) => UTF8String.fromString(r.refersTo)
    case "truncated" => (r: WarcRecord) => UTF8String.fromString(r.truncated)
    case "warc_file" => (_: WarcRecord) => fileUtf8
    case other => throw new IllegalArgumentException(s"unknown warc column: $other")
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      val r = it.next()
      if (pushed.forall(WarcFilters.eval(_, r))) { rec = r; return true }
    }
    false
  }
  override def get(): InternalRow = {
    val vals = new Array[Any](getters.length)
    var i = 0
    while (i < vals.length) { vals(i) = getters(i)(rec); i += 1 }
    new GenericInternalRow(vals)
  }
  override def close(): Unit = ()
}
