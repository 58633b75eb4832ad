package graft.log

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-level record batching: the produce-side encode path of the
  * reference (/root/reference/kafka-impl/.../format/EntryFormatter.java,
  * KafkaV1EntryFormatter.java) re-expressed as a distributed encode.
  *
  * Records are shuffled once to their (topic, partition) and batches of up
  * to 100 contiguous records are serialized into a compact binary layout:
  * magic byte, record count, base offset, then per record the offset delta,
  * key and value with length prefixes. `decode` inverts it exactly —
  * BatchCodecSpec asserts a lossless round trip.
  *
  * Rows-only check: binary assembly is not SQL-expressible.
  */
object BatchCodec {

  final case class LogRec(topic: String, part: Long, offs: Long, k: String, v: String)
  final case class Batch(topic: String, part: Long, first_offs: Long,
      n: Long, payload: Array[Byte])

  val MaxBatch = 100
  val Magic: Byte = 2

  def encodeGroup(recs: Seq[LogRec]): Batch = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val first = recs.head.offs
    out.writeByte(Magic)
    out.writeInt(recs.size)
    out.writeLong(first)
    recs.foreach { r =>
      val delta = r.offs - first
      require(delta >= 0 && delta <= Int.MaxValue,
        s"offset delta $delta exceeds batch frame range")
      out.writeInt(delta.toInt)
      // Length -1 encodes a null key/value (tombstones are legal records).
      def frame(s: String): Unit =
        if (s == null) out.writeInt(-1)
        else { val b = s.getBytes(StandardCharsets.UTF_8); out.writeInt(b.length); out.write(b) }
      frame(r.k)
      frame(r.v)
    }
    out.flush()
    Batch(recs.head.topic, recs.head.part, first, recs.size.toLong, bos.toByteArray)
  }

  def decodeBatch(b: Batch): Seq[LogRec] = {
    val buf = ByteBuffer.wrap(b.payload)
    require(buf.get() == Magic, "bad magic")
    val n = buf.getInt()
    val first = buf.getLong()
    def unframe(): String = {
      val len = buf.getInt()
      if (len < 0) null
      else { val bs = new Array[Byte](len); buf.get(bs); new String(bs, StandardCharsets.UTF_8) }
    }
    (0 until n).map { _ =>
      val delta = buf.getInt()
      LogRec(b.topic, b.part, first + delta, unframe(), unframe())
    }
  }

  /** Distributed encode: one shuffle onto (topic, part), offset-ordered
    * batching inside each partition, no driver involvement.
    */
  def encodeBatches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    LogOps.log(spark, dir)
      .select("topic", "part", "offs", "k", "v").as[LogRec]
      .repartition(col("topic"), col("part"))
      .sortWithinPartitions("topic", "part", "offs")
      .mapPartitions { it =>
        new Iterator[Batch] {
          private val in = it.buffered
          def hasNext: Boolean = in.hasNext
          def next(): Batch = {
            val head = in.head
            val group = scala.collection.mutable.ArrayBuffer[LogRec]()
            while (in.hasNext && group.size < MaxBatch &&
              in.head.topic == head.topic && in.head.part == head.part)
              group += in.next()
            encodeGroup(group.toSeq)
          }
        }
      }
      .toDF()
      .select(col("topic"), col("part"), col("first_offs"), col("n"),
        length(col("payload")).cast("long").as("payload_bytes"), col("payload"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "encode_batches" -> encodeBatches)

  /** Binary assembly is not SQL-expressible — rows-only check. */
  val oracles: Map[String, String] = Map.empty
}
