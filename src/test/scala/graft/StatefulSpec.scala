package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.streaming.Stateful

class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val eventsRaw = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ev2")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming session_window emits the batch sessions that closed") {
    val src = spark.readStream.schema(eventsRaw).parquet(eventsDir)
      .select(TestSpark.eventsTs.as("ts"), col("user_id"), col("value"))
    val q = Stateful.sessionAgg(src).writeStream
      .outputMode("append").format("memory").queryName("sess_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_stream")
      .select("user_id", "sess_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventOps.winSession(spark, sf)
      .select("user_id", "sess_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.subsetOf(batch), s"streaming emitted unknown sessions: ${streamed.diff(batch).take(3)}")
    assert(streamed.size >= (batch.size * 0.8).toInt, s"${streamed.size} of ${batch.size}")
  }

  test("stream-static dedup passes exactly the novel fingerprints through") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (10L, "alpha beta gamma"),          // exact dup of corpus doc 1
      (11L, "Alpha,  Beta GAMMA!"),       // normalizes to the same text
      (12L, "entirely novel content"))
    val q = Stateful.dedupAgainstCorpus(
        mem.toDF.toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("ssd_stream")
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssd_stream").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === Set(12L))
  }

  test("stream-stream interval join matches the batch range join") {
    def side(tpe: String) = spark.readStream.schema(eventsRaw).parquet(eventsDir)
      .filter(col("event_type") === tpe)
      .select(col("event_id"), col("user_id"), TestSpark.eventsTs.as("ts"))
    val q = Stateful.purchaseClickJoin(side("purchase"), side("click"))
      .writeStream.outputMode("append").format("memory").queryName("ssj_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssj_stream")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.sources.Tables.events(spark, sf)
    val batch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts")),
        col("p_user") === col("c_user") && col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("event-time-timeout sessionization closes sessions in-stream AND by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val M = 1000000L // 1s in us
    // a modern base: epoch-0 event times sit AT the initial watermark
    // and would be dropped as late
    val B = 1600000000L * M
    val mem = MemoryStream[(Long, Long, Double)]
    val src = mem.toDF().toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
      .withWatermark("ts", "1 second")
    val q = Stateful.sessionizeWithTimeout(spark, src).writeStream
      .outputMode("append").format("memory").queryName("sess_timeout").start()
    // batch 1: user 1 a 2-event session, user 2 a single event
    mem.addData((1L, B, 1.0), (1L, B + 600 * M, 2.0), (2L, B + 300 * M, 5.0))
    q.processAllAvailable()
    // batch 2: user 1 reappears past the 30-min gap (closes session 1
    // in-stream); user 3's far-future event drives the watermark past
    // everyone's gap boundary so the armed timeouts fire
    mem.addData((1L, B + 3600 * M, 3.0), (3L, B + 36000 * M, 9.0))
    q.processAllAvailable()
    q.processAllAvailable() // drain the no-data timeout batch
    q.stop()
    val got = spark.table("sess_timeout")
      .select("user_id", "sess_start_us", "sess_end_us", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    // user 3's session is still open (watermark never passed it) — absent
    assert(got === Set(
      (1L, B, B + 600 * M, 2L, 3.0),              // closed in-stream by the 60-min event
      (1L, B + 3600 * M, B + 3600 * M, 1L, 3.0),  // closed by event-time timeout
      (2L, B + 300 * M, B + 300 * M, 1L, 5.0)))   // closed by event-time timeout
  }

  test("timeout sessionization EQUALS the batch winSession image under ordered delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real events in event-time order, split into 3 batches at time
    // boundaries (per-key order preserved — the runtime's ordering
    // contract), then a far-future sentinel flushes every timeout
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"),
        graft.functions.TimeFunctions.epochUs(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._2, t._1, t._3))
    val cut1 = ev(ev.length / 3)._2
    val cut2 = ev(2 * ev.length / 3)._2
    val sentinel = (Long.MaxValue / 2, ev.last._2 + 365L * 86400 * 1000000, 0.0)
    val mem = MemoryStream[(Long, Long, Double)]
    val src = mem.toDF().toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
      .withWatermark("ts", "1 second")
    val q = Stateful.sessionizeWithTimeout(spark, src).writeStream
      .outputMode("append").format("memory").queryName("sess_parity").start()
    mem.addData(ev.filter(_._2 <= cut1).toSeq: _*); q.processAllAvailable()
    mem.addData(ev.filter(t => t._2 > cut1 && t._2 <= cut2).toSeq: _*); q.processAllAvailable()
    mem.addData(ev.filter(_._2 > cut2) :+ sentinel: _*); q.processAllAvailable()
    q.processAllAvailable() // no-data timeout batch
    q.stop()
    val got = spark.table("sess_parity")
      .filter(col("user_id") =!= sentinel._1)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_start_us"),
        r.getAs[Long]("sess_end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    val want = EventOps.winSession(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_start_us"),
        r.getAs[Long]("sess_end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    // keys exact; sums approx (decimal-sum batch vs double-fold stream)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).sorted.toSeq ===
      want.map(t => (t._1, t._2, t._3, t._4)).sorted.toSeq)
    val gotSums = got.map(t => (t._1, t._2) -> t._5).toMap
    want.foreach { t =>
      assert(math.abs(gotSums((t._1, t._2)) - t._5) <= 1e-6 * math.max(1.0, math.abs(t._5)))
    }
  }

  test("stateful transitions across batches match the batch lag-window image") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two micro-batches split mid-stream per user: the cross-batch
    // (prev → next) pair only appears if state carried the last type
    val all = Seq(
      Stateful.TypedEvent(1, "view", 100, 1), Stateful.TypedEvent(1, "click", 200, 2),
      Stateful.TypedEvent(2, "view", 150, 3), Stateful.TypedEvent(1, "purchase", 300, 4),
      Stateful.TypedEvent(2, "error", 250, 5), Stateful.TypedEvent(2, "view", 350, 6),
      Stateful.TypedEvent(1, "view", 400, 7))
    val (b1, b2) = all.splitAt(4)
    val mem = MemoryStream[Stateful.TypedEvent]
    val src = mem.toDF()
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("event_id"))
      .withWatermark("ts", "1 second")
    val q = Stateful.transitions(spark, src).writeStream
      .outputMode("append").format("memory").queryName("trans_stream").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("trans_stream")
      .groupBy(col("prev_type"), col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val batch = all.toDF()
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }

  test("streaming attribution matches the batch ignoreNulls-carry image across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      Stateful.TypedEvent(1, "view", 100, 1), Stateful.TypedEvent(1, "purchase", 200, 2),
      Stateful.TypedEvent(2, "purchase", 150, 3), Stateful.TypedEvent(1, "click", 300, 4),
      Stateful.TypedEvent(2, "view", 250, 5), Stateful.TypedEvent(1, "purchase", 400, 6),
      Stateful.TypedEvent(2, "purchase", 350, 7), Stateful.TypedEvent(1, "error", 450, 8),
      Stateful.TypedEvent(1, "purchase", 500, 9))
    val (b1, b2) = all.splitAt(5)
    val mem = MemoryStream[Stateful.TypedEvent]
    val src = mem.toDF()
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("event_id"))
      .withWatermark("ts", "1 second")
    val q = Stateful.attribution(spark, src).writeStream
      .outputMode("append").format("memory").queryName("attr_stream").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // batch image: last non-null touch strictly before each purchase
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("click", "view"), col("event_type"))
    val batch = all.toDF()
      .withColumn("attrib", coalesce(last(touch, ignoreNulls = true).over(w), lit("(none)")))
      .filter(col("event_type") === "purchase")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[String]("attrib")).toMap
    assert(streamed === batch)
    // the cross-batch carries actually exercised: user 2's second
    // purchase credits the view from batch 1's state, and an error
    // event neither credits nor clears
    assert(streamed((2L, 7L)) === "view")
    assert(streamed((1L, 9L)) === "click")
    assert(streamed((2L, 3L)) === "(none)")
  }

  test("attribution TTL measures touch age: purchases do not refresh a touch's lease") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ttl = 100 us. User 1: touch at 100; purchase at 150 (age 50,
    // credits); purchase at 300 (age 200 > ttl → "(none)" DESPITE the
    // intervening purchase at 150 — the exact case where a
    // lastUs-refreshed timeout would have kept the touch creditable).
    // Batch 2's purchase at 350 pins the same across micro-batches.
    val b1 = Seq(
      Stateful.TypedEvent(1, "view", 100, 1),
      Stateful.TypedEvent(1, "purchase", 150, 2),
      Stateful.TypedEvent(1, "purchase", 300, 3))
    val b2 = Seq(Stateful.TypedEvent(1, "purchase", 350, 4))
    val mem = MemoryStream[Stateful.TypedEvent]
    val src = mem.toDF()
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("event_id"))
      .withWatermark("ts", "1 second")
    val q = Stateful.attribution(spark, src, ttlUs = 100L).writeStream
      .outputMode("append").format("memory").queryName("attr_ttl_stream").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_ttl_stream").collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got === Map(2L -> "view", 3L -> "(none)", 4L -> "(none)"))
  }

  test("interArrival across batches matches the batch LAG image; fresh chain after TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      Stateful.TypedEvent(1, "view", 100, 1), Stateful.TypedEvent(1, "click", 250, 2),
      Stateful.TypedEvent(2, "view", 150, 3), Stateful.TypedEvent(1, "purchase", 600, 4),
      Stateful.TypedEvent(2, "error", 450, 5), Stateful.TypedEvent(2, "view", 460, 6),
      Stateful.TypedEvent(1, "view", 900, 7))
    val (b1, b2) = all.splitAt(4)
    val mem = MemoryStream[Stateful.TypedEvent]
    val src = mem.toDF()
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_id"))
      .withWatermark("ts", "1 second")
    val q = Stateful.interArrival(spark, src).writeStream
      .outputMode("append").format("memory").queryName("gap_stream").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gap_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val batch = all.toDF()
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Long]("gap_us")).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("transitions state expires after the event-time TTL: idle user restarts a fresh chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val M = 1000000L
    val B = 1600000000L * M // modern base (epoch-0 would be born late)
    val mem = MemoryStream[Stateful.TypedEvent]
    val src = mem.toDF()
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("event_id"))
      .withWatermark("ts", "1 second")
    val q = Stateful.transitions(spark, src, ttlUs = 10 * M).writeStream
      .outputMode("append").format("memory").queryName("trans_ttl").start()
    // batch 1: user 1 chains view → click
    mem.addData(Stateful.TypedEvent(1, "view", B, 1), Stateful.TypedEvent(1, "click", B + 1 * M, 2))
    q.processAllAvailable()
    // batch 2: an unrelated user drives the watermark far past user 1's
    // last-seen + 10 s TTL; the armed timeout fires on the next trigger
    // and silently drops user 1's state
    mem.addData(Stateful.TypedEvent(2, "view", B + 3600 * M, 3))
    q.processAllAvailable()
    q.processAllAvailable() // drain the no-data timeout batch
    // batch 3: user 1 returns AFTER expiry — no (click → purchase) pair
    // may appear (the chain restarted); the next event pairs normally
    mem.addData(Stateful.TypedEvent(1, "purchase", B + 3600 * M, 4))
    q.processAllAvailable()
    mem.addData(Stateful.TypedEvent(1, "view", B + 3601 * M, 5))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_ttl")
      .select("user_id", "prev_type", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, "view", "click"),      // batch-1 chain
      (1L, "purchase", "view"))) // post-expiry fresh chain — NOT (click, purchase)
  }

  test("flatMapGroupsWithState accumulates running totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Stateful.UserEvent]
    val q = Stateful.runningTotals(spark, mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("totals_stream").start()
    mem.addData(Stateful.UserEvent(1, 10.0), Stateful.UserEvent(1, 5.0), Stateful.UserEvent(2, 1.0))
    q.processAllAvailable()
    mem.addData(Stateful.UserEvent(1, 2.5), Stateful.UserEvent(2, 4.0))
    q.processAllAvailable()
    val rows = spark.table("totals_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // last update per user wins
    val last = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    assert(last(1L) === ((1L, 3L, 17.5)))
    assert(last(2L) === ((2L, 2L, 5.0)))
    q.stop()
  }

  test("state-metrics frame reports the planted state counts per operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Stateful.UserEvent]
    val q = Stateful.runningTotals(spark, mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("metrics_probe").start()
    mem.addData(Stateful.UserEvent(1, 1.0), Stateful.UserEvent(2, 2.0), Stateful.UserEvent(3, 3.0))
    q.processAllAvailable()
    val m1 = Stateful.stateMetrics(spark, Seq(q)).collect()
    // one flatMapGroupsWithState operator holding exactly the 3 planted
    // user structs, with real memory accounted
    assert(m1.length === 1)
    val r1 = m1.head
    assert(r1.getAs[String]("query_name") === "metrics_probe")
    assert(r1.getAs[String]("operator") === "flatMapGroupsWithState")
    assert(r1.getAs[Long]("n_rows_total") === 3L)
    assert(r1.getAs[Long]("n_rows_updated") === 3L)
    assert(r1.getAs[Long]("memory_used_bytes") > 0L)
    // second batch touches one existing + one new key: total grows to
    // 4, updated counts only this batch's writes
    mem.addData(Stateful.UserEvent(1, 1.0), Stateful.UserEvent(4, 4.0))
    q.processAllAvailable()
    val r2 = Stateful.stateMetrics(spark, Seq(q)).collect().head
    assert(r2.getAs[Long]("n_rows_total") === 4L)
    assert(r2.getAs[Long]("n_rows_updated") === 2L)
    // history view keeps one row per batch, monotone in batch_id, and
    // its latest row equals the lastProgress view
    val hist = Stateful.stateMetricsHistory(spark, Seq(q))
      .orderBy("batch_id").collect()
    assert(hist.length >= 2)
    assert(hist.last.getAs[Long]("n_rows_total") === 4L)
    // a query with no stateful operator contributes no rows
    val mem2 = MemoryStream[Stateful.UserEvent]
    val q2 = mem2.toDS().writeStream
      .outputMode("append").format("memory").queryName("stateless_probe").start()
    mem2.addData(Stateful.UserEvent(9, 9.0))
    q2.processAllAvailable()
    assert(Stateful.stateMetrics(spark, Seq(q2)).isEmpty)
    q.stop(); q2.stop()
  }

  test("trendingTerms: cross-batch envelope holds per source; sources never mix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // source a: vocab >> capacity forces eviction; hot terms span batches
    val aB1 = Seq.fill(300)("hot1") ++ Seq.fill(150)("hot2") ++
      (1 to 800).map(i => s"n$i")
    val aB2 = Seq.fill(250)("hot1") ++ Seq.fill(300)("hot3") ++
      (801 to 1600).map(i => s"n$i")
    val bB1 = Seq.fill(50)("bonly")
    val mem = MemoryStream[(String, String)]
    val src = mem.toDF().toDF("source", "term")
    val q = Stateful.trendingTerms(spark, src, capacity = 64, k = 8)
      .writeStream.outputMode("update").format("memory")
      .queryName("trend_stream").start()
    mem.addData(rnd.shuffle(aB1).map(("a", _)) ++ bB1.map(("b", _)): _*)
    q.processAllAvailable()
    val afterB1 = spark.table("trend_stream").collect().length
    mem.addData(rnd.shuffle(aB2).map(("a", _)): _*)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("trend_stream").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("term"),
        r.getAs[Long]("est"), r.getAs[Long]("err")))
    // batch-2 emissions: only source a (b saw no data), <= k rows
    val b2 = all.drop(afterB1)
    assert(b2.nonEmpty && b2.length <= 8 && b2.forall(_._1 == "a"))
    // envelope vs exact CUMULATIVE counts over both batches
    val exact = (aB1 ++ aB2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    b2.foreach { case (_, t, est, err) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est >= tru && est - err <= tru, s"$t est=$est err=$err true=$tru")
    }
    // the cross-batch heavy terms must be present (true counts >> N/cap)
    val b2Terms = b2.map(_._2).toSet
    assert(Set("hot1", "hot2", "hot3").subsetOf(b2Terms))
    // source isolation: b's only term never shows under a
    assert(!all.exists(r => r._1 == "a" && r._2 == "bonly"))
    assert(all.exists(r => r._1 == "b" && r._2 == "bonly"))
  }

  test("streaming upsert: last emission per key is the batch argmax; stale and repeated data emit nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val M = 1000000L
    val B = 1600000000L * M
    val b1 = Seq(
      UpEv(1, 1, B + 1 * M, "click", 1.0),
      UpEv(1, 2, B + 5 * M, "view", 2.5),
      UpEv(2, 3, B + 2 * M, "purchase", 3.0),
      UpEv(3, 4, B + 3 * M, "view", 4.0))
    val b2 = Seq(
      UpEv(2, 5, B + 10 * M, "error", 0.0),  // tombstone wins for user 2
      UpEv(1, 6, B + 2 * M, "click", 9.99),  // STALE: older than id 2 — no emission
      UpEv(3, 7, B + 30 * M, "purchase", 1.25))
    val mem = MemoryStream[UpEv]
    val src = mem.toDF()
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"), col("value"))
    val q = Stateful.upsert(spark, src).writeStream
      .outputMode("update").format("memory").queryName("upsert_stream").start()
    mem.addData(b1: _*); q.processAllAvailable()
    val afterB1 = spark.table("upsert_stream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("last_type"), r.getAs[Long]("cents"),
        r.getAs[Boolean]("deleted")))
    // batch 1: every key emits its winner
    assert(afterB1.sortBy(_._1).toSeq == Seq(
      (1L, 2L, "view", 250L, false),
      (2L, 3L, "purchase", 300L, false),
      (3L, 4L, "view", 400L, false)))
    mem.addData(b2: _*); q.processAllAvailable()
    // replaying batch 2 verbatim must be a no-op (idempotent compaction)
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("upsert_stream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("last_type"), r.getAs[Long]("cents"),
        r.getAs[Boolean]("deleted")))
    val b2Rows = all.diff(afterB1)
    // user 1's stale record emits nothing; user 2 tombstones; user 3 updates
    assert(b2Rows.sortBy(_._1).toSeq == Seq(
      (2L, 5L, "error", 0L, true),
      (3L, 7L, "purchase", 125L, false)))
    assert(!all.exists(_._2 == 6L), "stale event must never surface")
    // parity: last emission per key ≡ the batch max_by image of all data
    val lastPerKey = all.groupBy(_._1).map { case (u, rows) =>
      val r = if (rows.length > 1) b2Rows.find(_._1 == u).getOrElse(rows.head)
      else rows.head
      u -> ((r._3, r._5))
    }
    val batchImage = (b1 ++ b2).groupBy(_.user_id).map { case (u, evs) =>
      val w = evs.maxBy(e => (e.us, e.event_id))
      u -> ((w.event_type, w.event_type == "error"))
    }
    assert(lastPerKey == batchImage)
  }

  test("madMonitor drops post-watermark stragglers: a finalized day never re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dayUs = 86400000000L
    val mem = MemoryStream[(String, Long)]
    val src = mem.toDF()
      .select(col("_1").as("event_type"), timestamp_micros(col("_2")).as("ts"))
      .withWatermark("ts", "1 second")
    val q = Stateful.madMonitor(spark, src).writeStream
      .outputMode("append").format("memory").queryName("mad_late").start()
    // batch 1: 3 events on day 0, 1 on day 1, and a day-9 event that
    // will advance the watermark past both
    mem.addData(("t", 10L), ("t", 20L), ("t", 30L), ("t", dayUs + 10L),
      ("t", 9L * dayUs)); q.processAllAvailable()
    // batch 2: the advanced watermark finalizes days 0 and 1 — day 0
    // emits nothing (empty trail), day 1 emits c=1 against trail [3]
    mem.addData(("t", 9L * dayUs + 10L)); q.processAllAvailable()
    val after2 = spark.table("mad_late").collect()
    assert(after2.length === 1)
    assert(after2.head.getLong(1) === 1L && after2.head.getDouble(4) === 3.0 &&
      after2.head.getDouble(6) === 4.0 && !after2.head.getBoolean(7),
      s"day-1 row wrong: ${after2.head}")
    // batch 3: a STRAGGLER for the finalized day 0 — it must be
    // dropped (late_dropped), never re-open the day or re-emit
    mem.addData(("t", 40L), ("t", 9L * dayUs + 20L)); q.processAllAvailable()
    q.stop()
    val fin = spark.table("mad_late").collect()
    assert(fin.length === 1, s"straggler must not re-emit: ${fin.toSeq}")
  }

  test("madMonitor stream-final matches the batch anomaly_mad image bit for bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        graft.functions.TimeFunctions.epochUs(col("ts")).as("us"))
      .orderBy(col("us")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // three ts-ordered micro-batches, so no event is late for its day
    val chunks = ev.grouped(ev.length / 3 + 1).toSeq
    val mem = MemoryStream[(String, Long)]
    val src = mem.toDF()
      .select(col("_1").as("event_type"), timestamp_micros(col("_2")).as("ts"))
      .withWatermark("ts", "1 second")
    val q = Stateful.madMonitor(spark, src).writeStream
      .outputMode("append").format("memory").queryName("mad_stream").start()
    chunks.foreach { ch => mem.addData(ch.toSeq: _*); q.processAllAvailable() }
    // flush: a far-future sentinel advances the watermark past every
    // real day; the second round lets the armed timeouts fire (the
    // watermark computed at a batch's end gates the NEXT trigger)
    val flushUs = ev.last._2 + 40L * 86400000000L
    mem.addData(("zz_flush", flushUs)); q.processAllAvailable()
    mem.addData(("zz_flush", flushUs + 1000000L)); q.processAllAvailable()
    q.stop()
    def img(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getBoolean(7))
    }.toMap
    val streamed = img(spark.table("mad_stream")
      .filter(col("event_type") =!= "zz_flush").collect())
    val batch = img(graft.operators.Temporal.anomalyMad(spark, sf).collect())
    assert(streamed === batch)
    assert(streamed.nonEmpty && streamed.values.exists(_._2 === 7L))
  }

  test("dqMonitor cumulative totals equal the local predicate replay; monotone across epochs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("props"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    // planted violations: unknown type, negative value, empty/null props
    val planted = Seq(("bogus", -2.5, ""), ("click", -0.01, null),
      ("view", 3.0, ""), ("mystery", 1.0, "x"))
    val fed = clean.toSeq ++ planted
    val mem = MemoryStream[(String, Double, String)]
    val src = mem.toDF().select(col("_1").as("event_type"),
      col("_2").as("value"), col("_3").as("props"))
    val q = Stateful.dqMonitor(spark, src, Stateful.eventDqRules).writeStream
      .outputMode("update").format("memory").queryName("dq_stream").start()
    fed.grouped(fed.size / 3 + 1).foreach { ch =>
      mem.addData(ch.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val known = Set("click", "view", "purchase", "signup", "error")
    val want = Map(
      "value_nonneg" -> fed.count(_._2 < 0).toLong,
      "type_known" -> fed.count(e => !known.contains(e._1)).toLong,
      "props_present" -> fed.count(e => e._3 == null || e._3.isEmpty).toLong)
    val rows = spark.table("dq_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // memory sink in Update mode appends one row per (rule, epoch):
    // the cumulative pair is monotone within each rule
    rows.groupBy(_._1).foreach { case (rule, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.sliding(2).forall(p =>
        p.length < 2 || (p(0)._2 <= p(1)._2 && p(0)._3 <= p(1)._3)), rule)
    }
    val fin = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    assert(fin.keySet === want.keySet)
    want.foreach { case (rule, v) =>
      assert(fin(rule)._2 === fed.size.toLong, s"$rule checked")
      assert(fin(rule)._3 === v, s"$rule violations")
    }
    assert(want.values.forall(_ > 0), "every planted rule fires at least once")
  }

  test("fkMonitor: orphans resolve when the parent arrives; stream-final equals dq_checks' join tier") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val ord = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    // planted orphans: child keys with no parent ever — the violations
    // that must survive to the final verdict
    val planted = Seq(999999001L, 999999001L, 999999002L)
    val memC = MemoryStream[Long]
    val memP = MemoryStream[Long]
    val q = Stateful.fkMonitor(spark,
        memC.toDF().select(col("value").as("key")),
        memP.toDF().select(col("value").as("key")))
      .writeStream.outputMode("update").format("memory")
      .queryName("fk_stream").start()
    // epoch 1: children land BEFORE any parent — every touched key is
    // an orphan NOW
    val (first, rest) = li.splitAt(li.length / 2)
    memC.addData(first.toSeq ++ planted: _*); q.processAllAvailable()
    val ep1 = spark.table("fk_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(ep1.nonEmpty && ep1.forall(r => !r._3 && r._4 === r._2),
      "before any parent, every emitted key reports its children as orphans")
    // epoch 2: all parents + the remaining children — orphans with a
    // real parent RESOLVE (re-emit with orphans = 0)
    memP.addData(ord.toSeq: _*)
    memC.addData(rest.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fk_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    // final per-key state: children_seen is monotone, parent_seen latches
    val fin = rows.groupBy(_._1).view.mapValues { rs =>
      val children = rs.map(_._2).max
      val parent = rs.exists(_._3)
      (children, parent, if (parent) 0L else children)
    }.toMap
    val parentSet = ord.toSet
    fin.foreach { case (k, (c, p, o)) =>
      assert(p === parentSet.contains(k), s"parent_seen for $k")
      assert(o === (if (p) 0L else c), s"orphans for $k")
    }
    // parity with the batch join tier: sum of final orphans over the
    // same rows = dq_checks' fk_orderkey violations + the planted set
    val batchFk = graft.operators.Analytics.dqChecks(spark, sf).collect()
      .find(r => r.getString(0) == "fk_orderkey").get.getLong(2)
    assert(fin.values.map(_._3).sum === batchFk + planted.length,
      "stream-final orphan total must equal the batch left-join verdict")
    // children accounting is exact end to end
    assert(fin.values.map(_._1).sum === (li.length + planted.length).toLong)
    // the resolution event actually happened: keys orphaned in epoch 1
    // with a real parent re-emitted with orphans = 0
    val resolved = ep1.filter(r => parentSet.contains(r._1)).map(_._1)
    assert(resolved.nonEmpty)
    resolved.foreach(k => assert(fin(k)._3 === 0L, s"key $k must resolve"))
  }

  test("fkMonitor: pre-reduce flush-on-cap — a partition holding more distinct keys than the budget emits multiple partials per key, and they reduce exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // cap 1 = the adversarial setting: EVERY pre-reduce fill round
    // flushes after one row, so every partition emits one partial per
    // ROW (the maximal multiple-partials-per-key case) — the keyed
    // reducer must still sum child counts and OR parent presence to
    // the exact verdict.  This is the backfill-epoch hazard in
    // miniature: far more distinct keys than the map may hold.
    spark.conf.set("spark.graft.fk.partialMaxKeys", "1")
    try {
      val memC = MemoryStream[Long]
      val memP = MemoryStream[Long]
      val q = Stateful.fkMonitor(spark,
          memC.toDF().select(col("value").as("key")),
          memP.toDF().select(col("value").as("key")))
        .writeStream.outputMode("update").format("memory")
        .queryName("fk_cap_stream").start()
      val keys = (1L to 64L).toSeq
      memC.addData(keys.flatMap(k => Seq(k, k, k)): _*)
      memP.addData(keys.filter(_ % 2 == 0): _*)
      q.processAllAvailable()
      q.stop()
      // the two addData calls may land as separate epochs, so per-key
      // final state folds over every Update-mode emission: children is
      // monotone (max), parent latches (exists)
      val fin = spark.table("fk_cap_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
        .groupBy(_._1).view.mapValues { rs =>
          val parent = rs.exists(_._3)
          val children = rs.map(_._2).max
          (children, parent, if (parent) 0L else children)
        }.toMap
      assert(fin.keySet === keys.toSet)
      keys.foreach { k =>
        val (c, p, o) = fin(k)
        assert(c === 3L, s"children_seen for $k must sum across flushed partials")
        assert(p === (k % 2 == 0), s"parent_seen for $k must OR across partials")
        assert(o === (if (k % 2 == 0) 0L else 3L), s"orphans for $k")
      }
    } finally spark.conf.unset("spark.graft.fk.partialMaxKeys")
  }
}

/** MemoryStream row shape for the streaming-upsert parity spec. */
case class UpEv(user_id: Long, event_id: Long, us: Long,
  event_type: String, value: Double)
