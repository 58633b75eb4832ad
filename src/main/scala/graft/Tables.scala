package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data.
  * At 100 TB these would be catalog tables partitioned by date/topic;
  * the loader keeps that swap localized to one place.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    canonTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Schema of the raw parquet file, BEFORE [[canonTs]] — what a stream
    * reader must declare so Spark decodes the file's native types (a forced
    * bigint schema over an INT64 TIMESTAMP(MICROS) column silently yields
    * raw micros, 1000x off the nanos contract).
    */
  def rawSchema(spark: SparkSession, dir: String, name: String)
      : org.apache.spark.sql.types.StructType =
    spark.read.parquet(s"$dir/$name.parquet").schema

  /** The engine's contract for the event-time column is nanos-since-epoch
    * as BIGINT. Two data generations exist: TIMESTAMP(NANOS) files arrive
    * as LongType already (GraftSession's legacy.parquet.nanosAsLong), and
    * TIMESTAMP(MICROS) files arrive as TimestampType (or TimestampNTZType
    * in a session without inferTimestampNTZ=false) — same instants,
    * different carrier. Canonicalize in the one helper every entrypoint
    * (batch loader AND stream readers) shares, so both generations present
    * identically. DuckDB oracles read the raw file and see TIMESTAMP either
    * way (epoch_ms(ts) is resolution-agnostic), so the cross-engine parity
    * rules in SURVEY §3 are unchanged. Any other carrier type fails loudly
    * here rather than silently corrupting downstream nanos arithmetic.
    */
  def canonTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case Some(f) if f.dataType != LongType =>
        throw new IllegalStateException(
          s"events.ts carrier ${f.dataType} is neither TIMESTAMP nor BIGINT " +
            "nanos; refusing to guess its epoch unit")
      case _ => df
    }
  }

  /** Content fingerprint of one table's files under `dir` — (path, size,
    * mtime) of every file, hashed. Session-lifetime caches key on this so
    * data regenerated in-place mid-session (the gen_stress workflow reuses
    * one /tmp path) invalidates naturally instead of serving stale frames.
    * One driver-side directory listing per cache miss — no data read.
    */
  def fingerprint(spark: SparkSession, dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      if (!fs.exists(p)) Seq(s"absent:$p")
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          buf += s"${f.getPath}:${f.getLen}:${f.getModificationTime}"
        }
        buf.sorted.toSeq
      }
    java.util.UUID.nameUUIDFromBytes(
      entries.mkString("\n").getBytes("UTF-8")).toString
  }

  /** Best-effort release of a purged cache value's persisted data (the
    * values are DataFrames or tuples of them).
    */
  private def release(v: Any): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] =>
      try ds.unpersist() catch { case _: Throwable => () }
    case p: Product => p.productIterator.foreach(release)
    case _ => ()
  }

  /** Fingerprinted cache key for session-lifetime frame caches, plus the
    * stale-entry purge: removes (and unpersists) entries of the same
    * (session, dir) whose fingerprint no longer matches, so in-place data
    * regeneration does not strand the superseded frames in storage memory.
    * The fingerprint listing runs on every ACCESS (that is what detects
    * staleness) — a driver-side directory walk, no data read.
    */
  def freshCacheKey[V](
      cache: scala.collection.concurrent.TrieMap[(SparkSession, String), V],
      spark: SparkSession, dir: String, table: String): (SparkSession, String) = {
    cache.keys.foreach { case k @ (s, _) =>
      // Stopped context: the persisted blocks died with it; just drop.
      if (s.sparkContext.isStopped) cache.remove(k)
    }
    val key = s"$dir@${fingerprint(spark, dir, table)}"
    cache.keys.foreach { case k @ (s, d) =>
      if (s == spark && d != key && d.startsWith(dir + "@"))
        cache.remove(k).foreach(release)
    }
    (spark, key)
  }
}
