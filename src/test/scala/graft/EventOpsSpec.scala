package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.Tables

class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("asof gap is never negative and clicks precede purchases") {
    val rows = EventOps.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val gaps = rows.flatMap(r => Option(r.getAs[java.lang.Long]("gap_us")))
    assert(gaps.forall(_ >= 0L))
  }

  test("range join counts only same-user clicks inside the 1h band") {
    val rows = EventOps.rangeJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pUs = r.getAs[Long]("p_us")
      val last = r.getAs[Long]("last_click_us")
      assert(last <= pUs && last >= pUs - 3600L * 1000000L)
      assert(r.getAs[Long]("n_clicks_1h") >= 1L)
    }
    // cross-check vs asof: a purchase whose latest prior click is within
    // the band must appear here with last_click_us = that click's time
    val asof = EventOps.asofJoin(spark, sf).collect()
      .filter(r => Option(r.getAs[java.lang.Long]("gap_us")).exists(_ <= 3600L * 1000000L))
      .map(r => r.getAs[Long]("purchase_id") -> (r.getAs[Long]("p_us") - r.getAs[Long]("gap_us"))).toMap
    val got = rows.map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("last_click_us")).toMap
    asof.foreach { case (pid, clickUs) =>
      assert(got.get(pid).contains(clickUs), s"purchase $pid")
    }
  }

  test("stratified sample is deterministic, keeps all purchases/signups, downsamples views") {
    import org.apache.spark.sql.functions._
    val a = EventOps.sampleStratified(spark, sf).collect()
    val b = EventOps.sampleStratified(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val byType = a.groupBy(_.getAs[String]("event_type")).view.mapValues(_.length.toLong).toMap
    val totals = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("purchase") === totals("purchase"))
    assert(byType("signup") === totals("signup"))
    val viewFrac = byType("view").toDouble / totals("view")
    assert(viewFrac > 0.05 && viewFrac < 0.25, s"view keep rate $viewFrac")
  }

  test("tumbling window counts partition the event stream exactly") {
    val total = Tables.events(spark, sf).count()
    val winSum = EventOps.winTumbling(spark, sf).collect().map(_.getAs[Long]("n")).sum
    assert(winSum === total)
  }

  test("sliding windows double-count each event exactly twice") {
    val total = Tables.events(spark, sf).count()
    val winSum = EventOps.winSliding(spark, sf).collect().map(_.getAs[Long]("n")).sum
    assert(winSum === 2 * total)
  }

  test("sessions never overlap within a user and gaps exceed 30min") {
    val rows = EventOps.winSession(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_start_us"), r.getAs[Long]("sess_end_us")))
    rows.groupBy(_._1).values.foreach { sess =>
      val sorted = sess.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 - e1 > 1800L * 1000000L)
        case _ =>
      }
    }
  }

  test("stream_dedup keeps exactly one event per (user, type)") {
    val rows = EventOps.streamDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(rows.length === rows.distinct.length)
  }

  test("event_transitions conserve: every user with k events contributes k-1 pairs") {
    val rows = EventOps.eventTransitions(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val ev = graft.sources.Tables.events(spark, sf)
    val want = ev.count() - ev.select("user_id").distinct().count()
    assert(total === want)
  }

  test("event_funnel matches a locally replayed strict-order funnel") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        graft.functions.TimeFunctions.epochUs(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Long): Option[Long] =
      byUser.getOrElse(u, Array.empty[(Long, String, Long)])
        .filter(e => e._2 == tpe && e._3 > after).map(_._3).minOption
    val t1 = byUser.keys.flatMap(u => firstAfter(u, "view", Long.MinValue).map(u -> _)).toMap
    val t2 = t1.flatMap { case (u, t) => firstAfter(u, "click", t).map(u -> _) }
    val t3 = t2.flatMap { case (u, t) => firstAfter(u, "purchase", t).map(u -> _) }
    val got = EventOps.eventFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "1_view" -> t1.size.toLong,
      "2_click" -> t2.size.toLong,
      "3_purchase" -> t3.size.toLong))
    // a funnel must shrink monotonically
    assert(got("1_view") >= got("2_click") && got("2_click") >= got("3_purchase"))
    assert(got("3_purchase") > 0, "test data should carry full conversions")
  }

  test("funnel_window matches a per-window replayed deadline funnel and nests monotonically") {
    import org.apache.spark.sql.functions._
    val dayUs = 86400000000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        graft.functions.TimeFunctions.epochUs(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstIn(u: Long, tpe: String, lo: Long, hi: Long): Option[Long] =
      byUser.getOrElse(u, Array.empty[(Long, String, Long)])
        .filter(e => e._2 == tpe && e._3 > lo && e._3 <= hi).map(_._3).minOption
    val t1 = byUser.keys.flatMap(u =>
      byUser(u).filter(_._2 == "view").map(_._3).minOption.map(u -> _)).toMap
    val want = Seq(1L, 3L, 7L).flatMap { d =>
      val w = d * dayUs
      val t2 = t1.flatMap { case (u, t) => firstIn(u, "click", t, t + w).map(u -> _) }
      val t3 = t2.flatMap { case (u, t) => firstIn(u, "purchase", t, t + w).map(u -> _) }
      Seq((d, "1_view") -> t1.size.toLong, (d, "2_click") -> t2.size.toLong,
        (d, "3_purchase") -> t3.size.toLong)
    }.toMap
    val got = EventOps.funnelWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    // each stage must be monotone in the window size, and every
    // window's funnel must shrink stage over stage
    Seq("2_click", "3_purchase").foreach { st =>
      assert(got((1L, st)) <= got((3L, st)) && got((3L, st)) <= got((7L, st)), st)
    }
    Seq(1L, 3L, 7L).foreach { d =>
      assert(got((d, "1_view")) >= got((d, "2_click")) &&
        got((d, "2_click")) >= got((d, "3_purchase")), s"window $d")
    }
    // the window must BITE at sf0.001: the 1-day funnel converts
    // strictly fewer users than the 7-day one
    assert(got((1L, "3_purchase")) < got((7L, "3_purchase")),
      "deadline should exclude some conversions in the fixture")
  }

  test("event_spike flags exactly the planted spike day; zero-variance types never flag") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400L
    // type "steady": 5/day for 10 days (var 0 — unflaggable by
    // construction).  type "spiky": 4/day for 9 days, 40 on day 5.
    val ev = (for {
      d <- 0 until 10; i <- 0 until 5
    } yield ("steady", d * day + i * 60 + 1)) ++
      (for {
        d <- 0 until 10; i <- 0 until (if (d == 5) 40 else 4)
      } yield ("spiky", d * day + i * 60 + 1))
    val df = ev.toDF("event_type", "sec")
      .select(col("event_type"), to_timestamp(col("sec")).as("ts"))
    val out = EventOps.spikeOver(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("event_type") === "spiky")
    assert(r.getAs[Long]("n_events") === 40L)
    // mean = (9·4+40)/10 = 7.6; var = (9·16+1600)/10 − 7.6² = 116.64
    assert(r.getAs[Double]("mean_daily") === 7.6)
    assert(math.abs(r.getAs[Double]("z") - (40.0 - 7.6) / math.sqrt(116.64)) < 1e-12)
    // corpus run is non-empty and every flagged day really exceeds
    // its type's mean
    val rows = EventOps.eventSpike(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      assert(x.getAs[Long]("n_events").toDouble > x.getAs[Double]("mean_daily"))
      assert(x.getAs[Double]("z") > 2.0)
    }
  }

  test("event_retention buckets users by first epoch week, counts per offset") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val W = 604800L
    val ev = Seq(
      ("a", 1000L * W + 10), ("a", 1000L * W + 20), // cohort 1000, 2 events wk 0
      ("a", 1002L * W + 5), // offset 2
      ("b", 1001L * W + 1), ("b", 1002L * W + 1), // cohort 1001, offsets 0 & 1
      ("c", 1000L * W + 99)) // cohort 1000, offset 0 only
      .toDF("user_id", "sec")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"))
    val out = EventOps.retentionOver(ev).collect()
      .map(r => (r.getAs[Long]("cohort_wk"), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"))).toMap
    assert(out === Map(
      (1000L, 0L) -> ((2L, 3L)), (1000L, 2L) -> ((1L, 1L)),
      (1001L, 0L) -> ((1L, 1L)), (1001L, 1L) -> ((1L, 1L))))
    // corpus invariants: offset 0 holds the whole cohort (a user is
    // active in their own first week by definition), later offsets
    // can never exceed it
    val rows = EventOps.eventRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_wk")).values.foreach { g =>
      val m = g.map(r => r.getAs[Long]("week_offset") -> r.getAs[Long]("n_users")).toMap
      assert(m.contains(0L))
      m.foreach { case (_, n) => assert(n <= m(0L)) }
    }
  }

  test("json payload decode is the identity; garbled payloads land in _undecodable") {
    import org.apache.spark.sql.functions._
    val out = EventOps.msgDecodeJson(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    // the dead-letter group is exactly the corruption predicate's rows,
    // with every decoded-field aggregate null (nothing was parsed)
    val nCorrupt = ev.filter(col("event_id") % 97 === 0).count()
    assert(nCorrupt > 0L, "fixture must exercise the corrupt branch")
    val und = out.filter(_.getAs[String]("event_type") == "_undecodable")
    assert(und.length == 1 && und.head.getAs[Long]("n_msgs") == nCorrupt)
    assert(und.head.isNullAt(und.head.fieldIndex("sum_value")))
    assert(und.head.isNullAt(und.head.fieldIndex("min_id")))
    assert(und.head.isNullAt(und.head.fieldIndex("sum_props_chars")))
    // clean groups equal a direct recompute from the unserialized table:
    // a mismatch means to_json/from_json corrupted a value in flight
    val direct = ev.filter(col("event_id") % 97 =!= 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_msgs"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        sum(length(col("props")).cast("long")).as("sum_props_chars"))
      .collect().map(r => r.getAs[String]("event_type") -> r.toSeq.tail).toMap
    val clean = out.filter(_.getAs[String]("event_type") != "_undecodable")
    assert(clean.map(_.getAs[String]("event_type")).toSet == direct.keySet)
    clean.foreach { r =>
      assert(direct(r.getAs[String]("event_type")) == r.toSeq.tail,
        s"decode drift for ${r.getAs[String]("event_type")}")
    }
  }

  test("csv decode: corruption is field-local — DLQ rows keep their parseable fields") {
    import org.apache.spark.sql.functions._
    val out = EventOps.msgDecodeCsv(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val corrupt = ev.filter(col("event_id") % 97 === 0)
    val und = out.filter(_.getAs[String]("event_type") == "_undecodable")
    assert(und.length == 1 && und.head.getAs[Long]("n_msgs") == corrupt.count())
    // the contrast with JSON: only the garbled FIRST field (the PK) is
    // lost; value/props still tokenize, so their aggregates are the
    // real sums over the corrupt rows — not null
    assert(und.head.isNullAt(und.head.fieldIndex("min_id")))
    val expSum = corrupt.agg(
      sum(col("value").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(und.head.getAs[Double]("sum_value") == expSum)
    // clean groups: identical to the JSON twin's output (same shared
    // profile, same corpus, different wire format — identity both ways)
    val json = EventOps.msgDecodeJson(spark, sf).collect()
      .filter(_.getAs[String]("event_type") != "_undecodable")
      .map(r => r.getAs[String]("event_type") -> r.toSeq.tail).toMap
    out.filter(_.getAs[String]("event_type") != "_undecodable").foreach { r =>
      assert(json(r.getAs[String]("event_type")) == r.toSeq.tail,
        s"wire-format fork for ${r.getAs[String]("event_type")}")
    }
  }

  test("msg_decode_oneof: presence survives the wire, including default-valued set members") {
    import org.apache.spark.sql.functions._
    val out = EventOps.msgDecodeOneof(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val raw = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(when(col("user_id") % 11 === 0, 0L)
          .otherwise(length(concat(lit("u"), col("user_id").cast("string"),
            lit("@ex.com"))).cast("long"))).as("elen"),
        sum(-col("user_id")).as("nphone"),
        sum(col("user_id") % 100).as("vsum"))
      .collect().map(r => r.getString(0) -> r).toMap
    val emailTypes = Set("click", "view")
    val phoneTypes = Set("purchase", "signup")
    raw.foreach { case (t, e) =>
      val r = out(t)
      assert(r.getAs[Long]("n") === e.getAs[Long]("n"))
      // presence: EVERY row of a member type decodes non-null — the
      // ''-valued emails included (a plain string field would elide
      // them into absence; the oneof member keeps presence)
      assert(r.getAs[Long]("n_email") ===
        (if (emailTypes(t)) e.getAs[Long]("n") else 0L), s"n_email($t)")
      assert(r.getAs[Long]("n_phone") ===
        (if (phoneTypes(t)) e.getAs[Long]("n") else 0L), s"n_phone($t)")
      if (emailTypes(t))
        assert(r.getAs[Long]("sum_email_len") === e.getAs[Long]("elen"), t)
      if (phoneTypes(t))
        assert(r.getAs[Long]("sum_phone") === e.getAs[Long]("nphone"), t)
      assert(r.getAs[Long]("map_v_sum") === e.getAs[Long]("vsum"), t)
    }
    // the ''-email rows exist in the corpus (the presence case is live)
    val nEmpty = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view") && col("user_id") % 11 === 0)
      .count()
    assert(nEmpty > 0, "fixture must exercise the presence-at-default case")
  }

  test("msg_size_percentiles equals a JVM counting-percentile replay per type") {
    import org.apache.spark.sql.functions.{col, length}
    val sizes = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), length(col("props")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def pct(xs: Array[Long], num: Long, den: Long): Long = {
      // counting percentile: smallest value whose cumulative count
      // clears num/den of the total — the operator's min-when replay
      val n = xs.length.toLong
      xs.zipWithIndex.collectFirst {
        case (v, i) if (i + 1).toLong * den >= n * num => v
      }.get
    }
    val got = graft.operators.EventOps.msgSizePercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet === sizes.keySet)
    sizes.foreach { case (tpe, xs) =>
      assert(got(tpe) === ((xs.length.toLong, xs.sum, xs.max,
        pct(xs, 1, 2), pct(xs, 19, 20), pct(xs, 99, 100))), tpe)
    }
  }
}
