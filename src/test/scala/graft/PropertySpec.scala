package graft

import java.security.MessageDigest

import graft.functions.{GramHashes, MinHashSig, SimHash48, VecDot}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the native expressions equal independent reference
  * implementations on arbitrary generated inputs (not just the corpus),
  * including empties and extremes. Samples are drawn deterministically
  * from ScalaCheck generators (fixed seeds).
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 200).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 200).foreach { i =>
      f(g1.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        g2.pureApply(Gen.Parameters.default, Seed(i.toLong + 10000)))
    }

  private val P = 2147483647L

  private def md5Prefix(s: String): Long = {
    val h = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    ((h(0) & 0xffL) << 48) | ((h(1) & 0xffL) << 40) | ((h(2) & 0xffL) << 32) |
      ((h(3) & 0xffL) << 24) | ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) |
      (h(6) & 0xffL)
  }

  test("count-compressed nearest-rank equals naive rank selection") {
    // The r6 percentile restructure's invariant: the value at row rank
    // ceil(n*p) in value order equals the smallest value whose cumulative
    // count reaches that rank — for ANY multiset and any p.
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))
    val ps = Seq(0.5, 0.95, 0.99, 1.0)
    forAll(gen) { vs =>
      val sorted = vs.sorted
      val n = sorted.size
      for (p <- ps) {
        val rank = math.ceil(n * p).toLong.toInt
        val naive = sorted(rank - 1)
        val dist = sorted.groupBy(identity).view.mapValues(_.size)
          .toSeq.sortBy(_._1)
        val cums = dist.scanLeft(0L) { case (acc, (_, c)) => acc + c }.tail
        val compressed = dist.zip(cums)
          .collectFirst { case ((v, _), cum) if cum >= rank => v }.get
        assert(compressed == naive, s"p=$p vs=$vs")
      }
    }
  }

  test("MinHashSig equals brute-force minima for arbitrary hash arrays") {
    val gen = Gen.listOf(Gen.chooseNum(0L, P - 1))
    forAll(gen) { hs =>
      val raw = MinHashSig(Literal(new GenericArrayData(hs.toArray),
        ArrayType(LongType)), 24)
        .nullSafeEval(new GenericArrayData(hs.toArray))
      if (hs.isEmpty) assert(raw == null)
      else {
        val got = raw.asInstanceOf[ArrayData].toLongArray()
        val want = (0 until 24).map { j =>
          val a = ((j + 1) * 2654435761L) % P
          val b = ((j + 7) * 40503L) % P
          hs.map(h => (a * h + b) % P).min
        }
        assert(got.toSeq == want)
      }
    }
  }

  test("VecDot equals sequential fold for arbitrary double arrays") {
    val gen = Gen.listOf(Gen.chooseNum(-1e6, 1e6))
    forAll(gen, gen) { (a, b) =>
      val raw = VecDot(
        Literal(new GenericArrayData(a.toArray), ArrayType(DoubleType)),
        Literal(new GenericArrayData(b.toArray), ArrayType(DoubleType)))
        .nullSafeEval(new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      if (a.length != b.length) assert(raw == null)
      else {
        var want = 0.0
        a.indices.foreach(i => want += a(i) * b(i))
        assert(java.lang.Double.compare(raw.asInstanceOf[Double], want) == 0)
      }
    }
  }

  test("GramHashes equals reference impl for arbitrary ascii strings") {
    val gen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    forAll(gen) { s =>
      val got = GramHashes(Literal(UTF8String.fromString(s), StringType), 3, P)
        .nullSafeEval(UTF8String.fromString(s))
        .asInstanceOf[ArrayData].toLongArray()
      val grams = (0 to s.length - 3).map(i => s.substring(i, i + 3)).distinct
      val want = grams.map(g => md5Prefix(g) % P).distinct.sorted
      assert(got.toSeq == want)
    }
  }

  test("JaccardSorted equals set Jaccard for arbitrary sorted long arrays") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 50L)).map(_.distinct.sorted)
    forAll(gen, gen) { (a, b) =>
      val raw = graft.functions.JaccardSorted(
        Literal(new GenericArrayData(a.toArray), ArrayType(LongType)),
        Literal(new GenericArrayData(b.toArray), ArrayType(LongType)))
        .nullSafeEval(new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      if (union == 0) assert(raw == null)
      else assert(raw.asInstanceOf[Double] == inter.toDouble / union.toDouble)
    }
  }

  test("IntersectSorted equals set intersection size for arbitrary sorted arrays") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 50L)).map(_.distinct.sorted)
    forAll(gen, gen) { (a, b) =>
      val raw = graft.functions.IntersectSorted(
        Literal(new GenericArrayData(a.toArray), ArrayType(LongType)),
        Literal(new GenericArrayData(b.toArray), ArrayType(LongType)))
        .nullSafeEval(new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(raw.asInstanceOf[Long] == a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("GramCounts equals brute-force code-point gram counting " +
      "(incl. supplementary characters)") {
    // "😀" (emoji) is one code point but two UTF-16 units: gram
    // boundaries must follow code points to match Spark substring() and the
    // DuckDB oracle.
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", " ", "😀", "é"))
      .map(_.mkString)
    forAll(gen) { s =>
      val raw = graft.functions.GramCounts(Literal(UTF8String.fromString(s),
        StringType), 3).nullSafeEval(UTF8String.fromString(s))
      val m = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val got = (0 until m.numElements()).map(i =>
        m.keyArray().getUTF8String(i).toString -> m.valueArray().getLong(i)).toMap
      val cps = s.codePoints().toArray
      val want = (0 to cps.length - 3).map(i => new String(cps, i, 3))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == want)
    }
  }

  test("Misra-Gries aggregator guarantees hold on arbitrary streams " +
      "under arbitrary merge splits") {
    val k = 8
    val keyGen = Gen.frequency(
      (5, Gen.const("hot")), (3, Gen.const("warm")),
      (1, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h", "i")))
    val streamGen = Gen.listOfN(300, keyGen)
    val splitGen = Gen.chooseNum(0, 300)
    forAll(streamGen, splitGen) { (keys, split) =>
      val agg = graft.functions.HeavyHitters.mgAggregator(k)
      // build two partial summaries (simulating two partitions) and merge
      val (s1, s2) = keys.splitAt(split)
      val m = agg.merge(
        s1.foldLeft(agg.zero)(agg.reduce),
        s2.foldLeft(agg.zero)(agg.reduce))
      val sketch = agg.finish(m)
      val exact = keys.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      val n = keys.size.toLong
      assert(sketch.size <= k - 1)
      sketch.foreach { case (key, est) =>
        val truth = exact.getOrElse(key, 0L)
        assert(est <= truth, s"overcount for $key")
        assert(truth - est <= n / k, s"undercount beyond n/k for $key")
      }
      exact.foreach { case (key, truth) =>
        if (truth > n / k) assert(sketch.contains(key), s"missing heavy $key")
      }
    }
  }

  test("ArrayCounts equals brute-force element counting") {
    val gen = Gen.listOf(Gen.oneOf("x", "y", "zz", ""))
    forAll(gen) { toks =>
      val in = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val raw = graft.functions.ArrayCounts(Literal(in, ArrayType(StringType)))
        .nullSafeEval(in)
      val m = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val got = (0 until m.numElements()).map(i =>
        m.keyArray().getUTF8String(i).toString -> m.valueArray().getLong(i)).toMap
      val want = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == want)
    }
  }

  test("SimHash48 equals brute-force bit sums for arbitrary token lists") {
    val gen = Gen.listOf(Gen.listOf(Gen.alphaChar).map(_.mkString))
    forAll(gen) { toks =>
      val in = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = SimHash48(Literal(in, ArrayType(StringType)))
        .nullSafeEval(in).asInstanceOf[Long]
      val hs = toks.distinct.map(md5Prefix)
      val want = (0 until 48).map { b =>
        val s = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
        if (s > 0) 1L << b else 0L
      }.sum
      assert(got == want)
    }
  }

  test("sub-bucket cap law: ceil(n / nsub) <= cap and pair work <= n*cap/2") {
    // The boundedness claim every capped pair generator rests on
    // (PairSubCap sub-bucketing in semdedup / dedup_embedding /
    // dedup_simhash / ngram_jaccard): splitting a block of n members into
    // nsub = ceil(n / cap) vec_id-congruence classes bounds EVERY
    // sub-bucket's expected size at cap, and total within-block pair count
    // at n * cap / 2 — for any block size. Verified exactly on the
    // worst-case uniform split (congruence classes of 0..n-1 are as even
    // as integer division allows).
    val cap = graft.llm.Similarity.PairSubCap
    val gen = Gen.chooseNum(1L, 5000L)
    forAll(gen) { n =>
      val nsub = (n + cap - 1) / cap
      assert(nsub >= 1)
      // largest congruence class of ids 0..n-1 mod nsub
      val maxClass = (n + nsub - 1) / nsub
      assert(maxClass <= cap,
        s"block $n split into $nsub buckets leaves a class of $maxClass > $cap")
      val pairWork = (0L until nsub).map { r =>
        val m = n / nsub + (if (r < n % nsub) 1L else 0L)
        m * (m - 1) / 2
      }.sum
      assert(pairWork <= n * cap / 2,
        s"pair work $pairWork exceeds n*cap/2 for block $n")
    }
  }
}
