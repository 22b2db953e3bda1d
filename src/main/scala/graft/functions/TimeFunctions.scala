package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Epoch conversions that are exact on both TIMESTAMP and TIMESTAMP_NTZ
  * inputs (the testdata parquet loads as NTZ; with the session pinned to
  * UTC the NTZ→TZ cast is shift-free).  Oracle parity: DuckDB
  * `epoch_us(ts) // 1_000_000` (floor) ≡ `epochSec`, `epoch_us` ≡
  * `epochUs` — both truncate sub-microsecond parquet NS the same way.
  */
object TimeFunctions {
  def epochSec(c: Column): Column = c.cast("timestamp").cast("long")
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))
}
