package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitter summary as a typed Spark [[Aggregator]] — the
  * scale path for per-topic hot-key detection (`top_keys_per_topic`
  * computes exact counts; at 100 TB the exact groupBy on a high-cardinality
  * key is itself the skew hazard, while this sketch carries at most k-1
  * counters per group through the map-side combine and the shuffle).
  *
  * Guarantees (asserted in HeavyHitterSpec):
  *  - every key with true frequency > n/k is present in the summary;
  *  - estimates never overcount, and undercount by at most n/k.
  *
  * Models the reference's hot-key / stats surface
  * (/root/reference/kafka-impl/.../stats/DataSketchesOpStatsLogger.java —
  * the reference ships DataSketches for exactly this kind of bounded-size
  * summary).
  */
object HeavyHitters {

  /** One Misra-Gries summary of at most k-1 (key, count) pairs. */
  def mgAggregator(k: Int): Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] =
    new Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

      override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

      private def shrink(m: mutable.HashMap[String, Long]): Unit =
        while (m.size > k - 1) {
          // Decrement every counter by the current minimum and drop zeros —
          // the batched form of MG's per-insert decrement.
          val min = m.valuesIterator.min
          val dead = m.iterator.collect { case (key, c) if c <= min => key }.toList
          dead.foreach(m -= _)
          m.mapValuesInPlace((_, c) => c - min)
        }

      override def reduce(m: mutable.HashMap[String, Long], key: String)
          : mutable.HashMap[String, Long] = {
        if (key != null) {
          m.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
          shrink(m)
        }
        m
      }

      override def merge(a: mutable.HashMap[String, Long],
          b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
        b.foreach { case (key, c) =>
          a.updateWith(key) { prev => Some(prev.getOrElse(0L) + c) }
        }
        shrink(a)
        a
      }

      override def finish(m: mutable.HashMap[String, Long]): Map[String, Long] =
        m.toMap

      override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
        Encoders.kryo[mutable.HashMap[String, Long]]
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }

  /** `mg_sketch(col)` as an untyped aggregate column (map<string,bigint>
    * surfaced through a kryo buffer; explode the finished map to rows).
    */
  def mgSketch(k: Int): Column => Column = {
    val agg = udaf(mgAggregator(k), Encoders.STRING)
    c => agg(c)
  }
}
