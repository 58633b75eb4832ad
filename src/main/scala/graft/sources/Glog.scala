package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.util.concurrent.atomic.AtomicLong

import graft.log.LogOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `glog` — the engine's own segment file format for the partitioned log,
  * the storage-engine analog of the reference's entry formats
  * (/root/reference/kafka-impl/.../format/EntryFormatter.java) and ledger
  * layout (storage/PartitionLog.java): one directory per (topic, part),
  * segment files of length-prefixed record batches (magic, count, base
  * offset, then per record offset-delta / timestamp / event id / framed
  * key / framed value).
  *
  * The layout IS the index: topic/part predicates prune whole directories
  * before a byte is read, and each batch's header carries enough (base
  * offset + count) to skip it on an offset lower bound without decoding
  * records — exactly how the reference's fetch path seeks by offset.
  * [[GlogSource]] exposes it to Spark as a DataSource V2 table.
  */
object Glog {

  val Magic: Byte = 3
  val MaxBatch = 100

  final case class Rec(topic: String, part: Long, offs: Long,
      event_id: Long, tms: Long, k: String, v: String)

  /** Test/diagnostic counters (single-JVM): batches decoded vs skipped by
    * the offset lower bound across all readers since last reset.
    */
  val batchesRead = new AtomicLong(0)
  val batchesSkipped = new AtomicLong(0)

  def encodeBatch(recs: Seq[Rec]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val first = recs.head.offs
    out.writeByte(Magic)
    out.writeInt(recs.size)
    out.writeLong(first)
    recs.foreach { r =>
      val delta = r.offs - first
      require(delta >= 0 && delta <= Int.MaxValue, s"bad offset delta $delta")
      out.writeInt(delta.toInt)
      out.writeLong(r.tms)
      out.writeLong(r.event_id)
      def frame(s: String): Unit =
        if (s == null) out.writeInt(-1)
        else {
          val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.writeInt(b.length); out.write(b)
        }
      frame(r.k)
      frame(r.v)
    }
    out.flush()
    bos.toByteArray
  }

  /** Iterate a segment stream's records; batches entirely below `fromOffs`
    * or at/after `untilOffs` are skipped from their headers without
    * decoding the records (the [from, until) window is how a micro-batch
    * reads its slice).
    */
  def readSegment(in: DataInputStream, topic: String, part: Long,
      fromOffs: Long, untilOffs: Long = Long.MaxValue): Iterator[Rec] =
    new Iterator[Rec] {
    private var cur: Iterator[Rec] = Iterator.empty
    private def frame(): String = {
      val len = in.readInt()
      if (len < 0) null
      else {
        val bs = new Array[Byte](len)
        in.readFully(bs)
        new String(bs, java.nio.charset.StandardCharsets.UTF_8)
      }
    }
    private def advance(): Unit = {
      while (!cur.hasNext) {
        val batchLen =
          try in.readInt()
          catch { case _: EOFException => return }
        val mark = new Array[Byte](batchLen)
        in.readFully(mark)
        val b = new DataInputStream(new java.io.ByteArrayInputStream(mark))
        require(b.readByte() == Magic, "bad magic")
        val n = b.readInt()
        val base = b.readLong()
        // Header-only skip: the whole batch sits below the requested
        // offset (max offset in a batch is base + n - 1 because deltas
        // are dense-ordered within <= MaxBatch records).
        if (base + n <= fromOffs || base >= untilOffs) {
          batchesSkipped.incrementAndGet()
        } else {
          batchesRead.incrementAndGet()
          cur = (0 until n).iterator.map { _ =>
            val delta = b.readInt()
            val tms = b.readLong()
            val eid = b.readLong()
            val kk = { val len = b.readInt()
              if (len < 0) null else { val bs = new Array[Byte](len); b.readFully(bs)
                new String(bs, java.nio.charset.StandardCharsets.UTF_8) } }
            val vv = { val len = b.readInt()
              if (len < 0) null else { val bs = new Array[Byte](len); b.readFully(bs)
                new String(bs, java.nio.charset.StandardCharsets.UTF_8) } }
            Rec(topic, part, base + delta, eid, tms, kk, vv)
          }.filter(r => r.offs >= fromOffs && r.offs < untilOffs).toArray.iterator
        }
      }
    }
    def hasNext: Boolean = { advance(); cur.hasNext }
    def next(): Rec = { advance(); cur.next() }
  }

  /** End offset (exclusive) of one (topic, part) directory: the max
    * base+count over its segment batch headers — a header-only scan that
    * skips every payload (the glog analog of a log-end-offset lookup).
    */
  def endOffset(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Long = {
    var end = 0L
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".glog")).foreach { seg =>
      val in = new DataInputStream(fs.open(seg.getPath))
      try {
        var done = false
        while (!done) {
          val batchLen =
            try in.readInt()
            catch { case _: EOFException => done = true; -1 }
          if (!done) {
            require(in.readByte() == Magic, "bad magic")
            val n = in.readInt()
            val base = in.readLong()
            end = math.max(end, base + n)
            in.skipBytes(batchLen - 13) // header = 1 + 4 + 8 bytes
          }
        }
      } finally in.close()
    }
    end
  }

  /** Executor-side segment writer: one shuffle onto (topic, part),
    * offset-sorted batching, segments written through the Hadoop
    * FileSystem API (works on any FS; no driver involvement).
    */
  def writeSegments(ds: org.apache.spark.sql.Dataset[Rec], outPath: String,
      segName: String): Unit = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    import org.apache.spark.sql.functions.col
    ds.repartition(col("topic"), col("part"))
      .sortWithinPartitions("topic", "part", "offs")
      .foreachPartition { (it: Iterator[Rec]) =>
        val conf = hconf.value
        val in = it.buffered
        while (in.hasNext) {
          val head = in.head
          val segPath = new org.apache.hadoop.fs.Path(
            s"$outPath/topic=${head.topic}/part=${head.part}/$segName.glog")
          val pfs = segPath.getFileSystem(conf)
          val out = new DataOutputStream(pfs.create(segPath, true))
          try {
            while (in.hasNext && in.head.topic == head.topic &&
              in.head.part == head.part) {
              val group = scala.collection.mutable.ArrayBuffer[Rec]()
              while (in.hasNext && group.size < MaxBatch &&
                in.head.topic == head.topic && in.head.part == head.part)
                group += in.next()
              val bytes = encodeBatch(group.toSeq)
              out.writeInt(bytes.length)
              out.write(bytes)
            }
          } finally out.close()
        }
      }
  }

  /** Materialize the canonical log view as a glog store (`_SUCCESS`
    * marker makes it idempotent).
    */
  def materialize(spark: SparkSession, dir: String, outPath: String): Unit = {
    import spark.implicits._
    val success = new org.apache.hadoop.fs.Path(outPath, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(success)) return
    writeSegments(
      LogOps.log(spark, dir)
        .select(col("topic"), col("part"), col("offs"), col("event_id"),
          col("tms"), col("k"), col("v")).as[Rec],
      outPath, "segment-0")
    fs.create(success, true).close()
  }

  /** Current end offsets per "topic/part" directory of a store (empty map
    * for a store that does not exist yet) — shared by the streaming
    * source (latestOffset) and the streaming sink (offset assignment).
    */
  def listEnds(path: String,
      conf: org.apache.hadoop.conf.Configuration): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Map.empty
    (for {
      tDir <- fs.listStatus(root).toSeq
      if tDir.isDirectory && tDir.getPath.getName.startsWith("topic=")
      pDir <- fs.listStatus(tDir.getPath).toSeq
      if pDir.isDirectory && pDir.getPath.getName.startsWith("part=")
    } yield {
      val topic = tDir.getPath.getName.stripPrefix("topic=")
      val part = pDir.getPath.getName.stripPrefix("part=")
      s"$topic/$part" -> endOffset(fs, pDir.getPath)
    }).toMap
  }
}
