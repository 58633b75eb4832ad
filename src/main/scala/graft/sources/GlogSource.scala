package graft.sources

import java.io.DataInputStream
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 connector for the [[Glog]] segment format:
  * `spark.read.format("glog").load(path)`.
  *
  * Planning prunes (topic, part) directories from pushed equality filters
  * and threads an `offs` lower bound down to the batch-header skip in the
  * reader — the reference's fetch path (seek by offset inside one
  * topic-partition; /root/reference/kafka-impl/.../MessageFetchContext.java)
  * expressed as a Spark source. Column pruning drops unread fields before
  * row materialization. All pushed filters are still re-applied by Spark
  * above the scan (pushFilters returns them as residuals), so pruning can
  * only ever skip data the filters exclude — never change results.
  */
class GlogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "glog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GlogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GlogTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object GlogSource {
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("part", LongType),
    StructField("offs", LongType),
    StructField("event_id", LongType),
    StructField("tms", LongType),
    StructField("k", StringType),
    StructField("v", StringType)))

  /** Files planned by the most recent scan (single-JVM test hook). */
  val lastPlannedFiles = new AtomicLong(-1)
}

class GlogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"glog:$path"
  override def schema(): StructType = GlogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GlogScanBuilder(path,
      options.getOrDefault("startingoffsets", "earliest")
        .equalsIgnoreCase("latest"),
      Option(options.get("maxrecordspertrigger")).map(_.toLong))
}

class GlogScanBuilder(path: String, startLatest: Boolean = false,
    maxPerTrigger: Option[Long] = None)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = GlogSource.schema
  private var used: Array[Filter] = Array.empty
  private var topicEq: Option[String] = None
  private var partEq: Option[Long] = None
  private var fromOffs: Long = Long.MinValue
  private var untilOffs: Long = Long.MaxValue
  private var minTms: Long = Long.MinValue

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case f @ EqualTo("topic", t: String) => topicEq = Some(t); used :+= f
      case f @ EqualTo("part", p) if p.isInstanceOf[Number] =>
        partEq = Some(p.asInstanceOf[Number].longValue()); used :+= f
      case f @ GreaterThanOrEqual("offs", o) if o.isInstanceOf[Number] =>
        fromOffs = math.max(fromOffs, o.asInstanceOf[Number].longValue()); used :+= f
      case f @ GreaterThan("offs", o) if o.isInstanceOf[Number] =>
        fromOffs = math.max(fromOffs, o.asInstanceOf[Number].longValue() + 1); used :+= f
      case f @ LessThan("offs", o) if o.isInstanceOf[Number] =>
        untilOffs = math.min(untilOffs, o.asInstanceOf[Number].longValue()); used :+= f
      case f @ LessThanOrEqual("offs", o) if o.isInstanceOf[Number] =>
        // offs <= Long.MaxValue selects everything; o+1 would wrap to
        // Long.MinValue and silently prune EVERY row at the scan (rows
        // dropped here are unrecoverable — the residual re-evaluation
        // only filters, never restores). The GreaterThan(+1) mirror is
        // safe because math.max clamps the wrapped value.
        val o1 = o.asInstanceOf[Number].longValue()
        if (o1 != Long.MaxValue) {
          untilOffs = math.min(untilOffs, o1 + 1); used :+= f
        }
      case f @ GreaterThanOrEqual("tms", t) if t.isInstanceOf[Number] =>
        minTms = math.max(minTms, t.asInstanceOf[Number].longValue()); used :+= f
      case f @ GreaterThan("tms", t) if t.isInstanceOf[Number] =>
        minTms = math.max(minTms, t.asInstanceOf[Number].longValue() + 1); used :+= f
      case _ =>
    }
    // Everything remains a residual: Spark re-evaluates the full predicate
    // above the scan, so pruning is a pure skip optimization.
    filters
  }
  override def pushedFilters(): Array[Filter] = used

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GlogScan(path, required, topicEq, partEq, fromOffs, minTms,
      startLatest, maxPerTrigger, untilOffs)
}

final case class GlogPartition(file: String, topic: String, part: Long,
    fromOffs: Long, untilOffs: Long = Long.MaxValue,
    minTms: Long = Long.MinValue) extends InputPartition

class GlogScan(path: String, required: StructType, topicEq: Option[String],
    partEq: Option[Long], fromOffs: Long,
    minTms: Long = Long.MinValue,
    startLatest: Boolean = false,
    maxPerTrigger: Option[Long] = None,
    untilOffs: Long = Long.MaxValue) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GlogMicroBatchStream(path, required, fromOffs, minTms, startLatest,
      maxPerTrigger)
  override def description(): String = {
    val t = topicEq.getOrElse("*")
    val p = partEq.map(_.toString).getOrElse("*")
    s"GlogScan path=$path topic=$t part=$p fromOffs=" +
      (if (fromOffs == Long.MinValue) "-inf" else fromOffs.toString) +
      " minTms=" + (if (minTms == Long.MinValue) "-inf" else minTms.toString)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(path)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val parts = for {
      tDir <- fs.listStatus(root).toSeq
      if tDir.isDirectory && tDir.getPath.getName.startsWith("topic=")
      topic = tDir.getPath.getName.stripPrefix("topic=")
      if topicEq.forall(_ == topic)
      pDir <- fs.listStatus(tDir.getPath).toSeq
      if pDir.isDirectory && pDir.getPath.getName.startsWith("part=")
      part = pDir.getPath.getName.stripPrefix("part=").toLong
      if partEq.forall(_ == part)
      seg <- fs.listStatus(pDir.getPath).toSeq
      if seg.getPath.getName.endsWith(".glog")
      // Segment-level pruning off the .glogx stats sidecar: a pushed
      // offset/time bound that clears the whole segment drops the FILE
      // from the scan without opening it (sidecar missing → keep the
      // segment; the batch-header skips still guarantee correctness).
      if fromOffs == Long.MinValue && minTms == Long.MinValue &&
        untilOffs == Long.MaxValue ||
        Glog.readStats(fs, seg.getPath).forall { case (mn, mx, mt) =>
          fromOffs <= mx && minTms <= mt && untilOffs > mn
        }
    } yield GlogPartition(seg.getPath.toString, topic, part, fromOffs,
      untilOffs, minTms)
    GlogSource.lastPlannedFiles.set(parts.size.toLong)
    parts.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GlogReaderFactory(required, new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

/** Stream offset: the end offset (exclusive) per "topic/part" directory.
  * Serialized with json4s (already on the Spark classpath) so topic names
  * containing JSON-hostile characters round-trip through the checkpoint
  * intact; [[Glog.validateTopic]] separately rejects names that cannot be
  * directory names at all.
  */
final case class GlogOffset(ends: Map[String, Long])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods
  override def json(): String =
    JsonMethods.compact(JsonMethods.render(
      ends.toSeq.sorted.foldLeft(org.json4s.JObject()) {
        case (o, (k, v)) => o ~ (k -> v)
      }))
}

object GlogOffset {
  def parse(json: String): GlogOffset = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    GlogOffset(org.json4s.jackson.JsonMethods.parse(json)
      .extract[Map[String, Long]])
  }
}

/** Micro-batch tail of a glog store — the engine's Kafka-source analog:
  * each trigger lists (topic, part) directories, computes their end
  * offsets from batch headers (a log-end-offset lookup, no payload read),
  * and plans one [start, end) slice per partition directory; readers skip
  * batches outside the window from their headers. New segment files and
  * new partitions appearing between triggers are picked up naturally
  * (their previous end offset defaults to 0).
  */
class GlogMicroBatchStream(path: String, required: StructType, minOffs: Long,
    minTms: Long = Long.MinValue, startLatest: Boolean = false,
    maxPerTrigger: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def conf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration

  override def latestOffset(): Offset = GlogOffset(Glog.listEnds(path, conf))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Admission control — Kafka's maxOffsetsPerTrigger semantics: when the
    * backlog exceeds the per-trigger cap, each partition advances
    * proportionally to its share of the total lag (plus one record so
    * small laggards always progress), so a backfill drains evenly instead
    * of partition by partition.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val ends = Glog.listEnds(path, conf)
    val from = start.asInstanceOf[GlogOffset].ends
    val cap = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        m.maxRows()
      case _ => return GlogOffset(ends)
    }
    val lags = ends.map { case (key, e) =>
      key -> math.max(0L, e - from.getOrElse(key, 0L))
    }
    val total = lags.values.sum
    if (total <= cap) GlogOffset(ends)
    else GlogOffset(ends.map { case (key, e) =>
      val lag = lags(key)
      // Proportional share in BigInt: lag * cap overflows Long once the
      // backlog times the trigger cap passes 2^63 (a regressed, negative
      // end offset would re-deliver committed records).
      val grant = math.min(lag, (BigInt(lag) * cap / total).toLong + 1L)
      key -> (from.getOrElse(key, 0L) + grant)
    })
  }
  /** Kafka's startingOffsets semantics: `earliest` (default) replays the
    * store from offset 0; `latest` begins at the current end offsets, so
    * only records appended after the query starts are delivered. Only the
    * FIRST run consults this — a restart resumes from the checkpoint.
    */
  override def initialOffset(): Offset =
    if (startLatest) GlogOffset(Glog.listEnds(path, conf))
    else GlogOffset(Map.empty)
  override def deserializeOffset(json: String): Offset = GlogOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GlogOffset].ends
    val until = end.asInstanceOf[GlogOffset].ends
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    until.toSeq.flatMap { case (key, endOffs) =>
      val startOffs = math.max(from.getOrElse(key, 0L), minOffs)
      if (endOffs <= startOffs) Seq.empty
      else {
        val Array(topic, part) = key.split("/", 2)
        val dir = new Path(root, s"topic=$topic/part=$part")
        fs.listStatus(dir).toSeq
          .filter(_.getPath.getName.endsWith(".glog"))
          // sidecar pruning: a segment wholly outside this micro-batch's
          // [start, end) offset window never opens — a stream restarted
          // near the tail re-reads the tail, not the whole store
          .filter(seg => Glog.readStats(fs, seg.getPath).forall {
            case (mn, mx, _) => startOffs <= mx && endOffs > mn
          })
          .map(seg => GlogPartition(seg.getPath.toString, topic, part.toLong,
            startOffs, endOffs, minTms))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GlogReaderFactory(required, new SerializableConfiguration(conf))
}

class GlogReaderFactory(required: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GlogPartition]
    new PartitionReader[InternalRow] {
      private val in = {
        val fp = new Path(p.file)
        new DataInputStream(fp.getFileSystem(conf.value).open(fp))
      }
      // Column pruning reaches the codec: record bodies are hopped over
      // via their length prefixes when the projection needs neither key
      // nor value, so a counts-only read decodes no payload at all.
      private val it = Glog.readSegment(in, p.topic, p.part, p.fromOffs,
        p.untilOffs, p.minTms,
        needK = required.fieldNames.contains("k"),
        needV = required.fieldNames.contains("v"))
      // Column pruning: precompute the projection from field name to the
      // record accessor once per partition.
      private val getters: Array[Glog.Rec => Any] = required.fields.map { f =>
        f.name match {
          case "topic" => (r: Glog.Rec) => UTF8String.fromString(r.topic)
          case "part" => (r: Glog.Rec) => r.part
          case "offs" => (r: Glog.Rec) => r.offs
          case "event_id" => (r: Glog.Rec) => r.event_id
          case "tms" => (r: Glog.Rec) => r.tms
          case "k" => (r: Glog.Rec) =>
            if (r.k == null) null else UTF8String.fromString(r.k)
          case "v" => (r: Glog.Rec) =>
            if (r.v == null) null else UTF8String.fromString(r.v)
        }
      }
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val r = it.next()
          row = new GenericInternalRow(getters.map(_(r)))
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
