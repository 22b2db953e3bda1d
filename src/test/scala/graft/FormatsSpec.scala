package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Formats, Tables}
import graft.streaming._

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val base = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.orderBy("event_id").collect().map(_.toString).toSet

  test("csv round-trips the event subset with an explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(base, dir)
    val back = Formats.readCsv(spark, dir, base.schema)
    assert(rows(back) === rows(base))
  }

  test("jsonl round-trips the event subset with an explicit schema") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Formats.writeJsonl(base, dir)
    val back = Formats.readJsonl(spark, dir, base.schema)
    assert(rows(back) === rows(base))
  }

  test("orc round-trips the event subset and keeps predicate pushdown") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(base, dir)
    val back = Formats.readOrc(spark, dir, base.schema)
    assert(rows(back) === rows(base))
    // pushdown reaches the ORC scan like it does for parquet
    val p = back.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("event_type"), p.take(400))
  }

  test("the frizzle pipeline runs unchanged over a csv transport") {
    val dir = Files.createTempDirectory("graft-csv-stream").toString
    Formats.writeCsv(base, dir)
    val ckpt = Files.createTempDirectory("graft-ckpt-csv").toString
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val source = FileMsgSource(dir, base.schema,
      df => df.select(col("event_id").cast("string").as("msg_id"),
        col("event_type").as("dest"), col("value")),
      Map("header" -> "true"), format = "csv")
    val q = Frizzle.runRouted(spark, source,
      Frizzle.Route(identity, isValid = col("value").isNotNull),
      dest = col("dest"),
      (df, dest, _) => { sink.merge(dest, df.count(), (a, b) => a + b); () },
      ckpt)
    q.awaitTermination(120000)
    assert(sink.values().stream().mapToLong(identity(_)).sum() === base.count())
    assert(sink.keySet().size === 5)
  }
}
