package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** One shared session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 8).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** `events.ts` read through an explicit LongType schema yields the
    * raw int64 in whatever unit the parquet writer chose: NANOS when
    * the file's logical type is timestamp[ns] (surfaced as long under
    * `nanosAsLong`), MICROS when it is timestamp[us] (the streaming
    * reader hands the physical int64 straight through the long field).
    * The streaming specs must declare a static schema up front, so
    * they can't rely on [[graft.sources.Tables.events]]' dynamic
    * probe — this mirrors it: one batch-schema sniff of the testdata
    * decides the divisor, and the specs track the driver's testdata
    * regeneration instead of hardcoding one writer's unit (round 10:
    * the testdata flipped ns → us and every hardcoded `div 1000`
    * collapsed event time to 1970, closing no windows).
    */
  lazy val eventsTs: Column = {
    val stored = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    timestamp_micros(if (stored == LongType) expr("ts div 1000") else col("ts"))
  }
}
