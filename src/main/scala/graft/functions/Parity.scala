package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic building blocks.
  *
  * The driver verifies every query against DuckDB running equivalent SQL on
  * the same parquet, hashing result values. Floating-point aggregation order
  * differs between engines, so money math is done in exact DECIMAL and cast
  * to double at the very end; shared hashing uses md5 (identical hex on both
  * engines); float folds are written as identical left-to-right folds.
  */
object Parity {
  /** Exact money type: values < 1e8 with 2 decimals. Products of up to three
    * dec10x2/dec3x2 factors stay within precision 38 on both engines.
    */
  val dec10x2: DecimalType = DecimalType(10, 2)
  /** Rates in [0, 9.99] (discount/tax). */
  val dec3x2: DecimalType = DecimalType(3, 2)

  def money(c: Column): Column = c.cast(dec10x2)
  def rate(c: Column): Column = c.cast(dec3x2)
  val one: Column = lit(1).cast(dec3x2)

  /** Exact sum of a decimal expression, surfaced as double (bit-identical on
    * both engines because the decimal value is identical).
    */
  def dsum(c: Column): Column = sum(c).cast("double")

  /** Event-time as epoch millis (DuckDB: epoch_ms(ts)). */
  def ms(c: Column): Column = unix_millis(c)

  /** events.ts presents as a nanos long regardless of the file's physical
    * type — TIMESTAMP(NANOS) via GraftSession's nanosAsLong, or
    * TIMESTAMP(MICROS) via Tables.canonTs. Integer division matches
    * DuckDB's epoch_ms truncation.
    */
  def nsToMs(colName: String): Column = expr(s"`$colName` div 1000000")

  /** First 14 hex chars of md5 as a non-negative long (56 bits).
    * DuckDB equivalent: ('0x' || substring(md5(x),1,14))::BIGINT.
    */
  def md5Long(c: Column): Column = conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** [[md5Long]] as a DuckDB SQL expression over `e` — the ONE SQL-side
    * spelling of the hash-to-long mapping (hand-copied strings drift).
    */
  def md5LongSql(e: String): String =
    s"('0x' || substring(md5($e), 1, 14))::BIGINT"
}
