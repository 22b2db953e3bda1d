package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal
import graft.sources.Tables

/** Oracles for the [[graft.operators.Temporal]] family: each test
  * replays the operator's semantics sequentially over the collected
  * sf0.001 events (1k rows — brute force is exact and cheap) and
  * compares bit-for-bit, so the distributed plans are pinned against a
  * straight-line reference, independent of the DuckDB gate.
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** (user_id, event_id, ts_sec, event_type, cents) replay base —
    * the same floor-cents lane the operators use.
    */
  private lazy val raw: Array[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("ts_sec"),
        col("event_type"), floor(col("value") * lit(100)).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))

  test("window_range matches an O(n^2) trailing-600s replay") {
    val got = Temporal.windowRange(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        (r.getAs[Long]("roll_n"), r.getAs[Long]("roll_cents"))).toMap
    assert(got.size == raw.length)
    raw.foreach { case (u, id, t, _, _) =>
      val frame = raw.filter { case (u2, _, t2, _, _) =>
        u2 == u && t2 >= t - 600 && t2 <= t
      }
      val want = (frame.length.toLong, frame.map(_._5).sum)
      assert(got((u, id)) == want, s"user $u event $id")
    }
  }

  test("ts_resample axis is dense and totals are conserved") {
    val rows = Temporal.tsResample(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val rawByUser = raw.groupBy(_._1)
    assert(byUser.keySet == rawByUser.keySet)
    byUser.foreach { case (u, rs) =>
      val days: Seq[Long] = rs.map(_.getAs[Long]("day")).sorted.toSeq
      // dense: every day between the user's min and max appears once
      assert(days.head == rawByUser(u).map(_._3 / 86400).min)
      assert(days.last == rawByUser(u).map(_._3 / 86400).max)
      assert(days == (days.head to days.last).toSeq,
        s"user $u axis has gaps or dups")
      // conservation: gap rows add zero, active rows add everything
      assert(rs.map(_.getAs[Long]("n_events")).sum == rawByUser(u).length)
      assert(rs.map(_.getAs[Long]("cents")).sum == rawByUser(u).map(_._5).sum)
    }
  }

  test("cdc_upsert keeps exactly the newest non-tombstone row per key") {
    val got = Temporal.cdcUpsert(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("event_id"), r.getAs[String]("last_type"))).toMap
    raw.groupBy(_._1).foreach { case (u, evs) =>
      val last = evs.maxBy(e => (e._3, e._2))
      if (last._4 == "error") assert(!got.contains(u), s"user $u tombstoned")
      else assert(got(u) == ((last._2, last._4)), s"user $u")
    }
    // the filter deletes at least the planted shape when present: every
    // surviving last_type is a non-error type
    assert(got.values.forall(_._2 != "error"))
  }

  test("event_attribution conserves purchases and replays last-touch") {
    val rows = Temporal.eventAttribution(spark, sf).collect()
    val types = rows.map(_.getAs[String]("attrib_type"))
    assert(types.toSet.subsetOf(Set("click", "view", "(none)")))
    val totalPurch = raw.count(_._4 == "purchase")
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == totalPurch)
    // sequential replay: carry the latest click/view per user
    val credit = collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    raw.groupBy(_._1).values.foreach { evs =>
      var carried: String = null
      evs.sortBy(e => (e._3, e._2)).foreach { case (_, _, _, typ, c) =>
        if (typ == "purchase") {
          val k = if (carried == null) "(none)" else carried
          val (n, s) = credit(k); credit(k) = (n + 1, s + c)
        }
        if (typ == "click" || typ == "view") carried = typ
      }
    }
    rows.foreach { r =>
      val k = r.getAs[String]("attrib_type")
      assert(credit(k) ==
        ((r.getAs[Long]("n_purchases"), r.getAs[Long]("cents"))), s"bucket $k")
    }
    assert(rows.length == credit.size)
  }

  test("event_paths equals the sequential trigram replay") {
    val got = Temporal.eventPaths(spark, sf).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
        r.getAs[String]("t3"), r.getAs[Long]("n")))
    val counts = raw.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._3, e._2)).map(_._4).sliding(3).filter(_.length == 3)
        .map(w => (w(0), w(1), w(2)))
    }.toSeq.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val want = counts.toSeq
      .sortBy { case ((a, b, c), m) => (-m, a, b, c) }.take(20)
      .map { case ((a, b, c), m) => (a, b, c, m) }
    assert(got.toSeq == want)
  }

  test("asof_nearest picks the truly closest click, ties to the earlier side") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        graft.functions.TimeFunctions.epochUs(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val got = Temporal.asofNearest(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (r.getAs[Long]("nearest_us"), r.getAs[Long]("gap_us"))).toMap
    val byUser = ev.groupBy(_._1)
    var checked = 0
    byUser.values.foreach { evs =>
      val clicks = evs.filter(_._4 == "click").map(_._3).sorted
      evs.filter(_._4 == "purchase").foreach { case (_, pid, pus, _) =>
        if (clicks.isEmpty) assert(!got.contains(pid))
        else {
          // nearest by |delta|, tie to the EARLIER click
          val best = clicks.minBy(c => (math.abs(pus - c), c))
          assert(got(pid) == ((best, math.abs(pus - best))), s"purchase $pid")
          checked += 1
        }
      }
    }
    assert(checked > 0 && got.size == checked)
  }

  test("agg_incremental merged partials equal the flat recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = graft.operators.Analytics.aggIncremental(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"),
          r.getAs[Long]("min_chars"), r.getAs[Long]("max_chars"),
          r.getAs[Double]("avg_chars"))).toMap
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val xs = ds.map(_._2)
      assert(got(src) == ((xs.length.toLong, xs.sum, xs.min, xs.max,
        xs.sum.toDouble / xs.length.toDouble)), s"source $src")
    }
  }

  test("volume_trend equals the integer-moment replay; planted line recovers exactly") {
    val got = Temporal.volumeTrend(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("slope"),
          r.getAs[Double]("intercept"))).toMap
    raw.groupBy(_._4).foreach { case (typ, evs) =>
      val daily = evs.groupBy(e => e._3 / 86400).map { case (d, xs) =>
        (d, xs.length.toLong)
      }.toSeq
      val n = daily.length.toLong
      if (n > 1) {
        val sd = daily.map(_._1).sum
        val sc = daily.map(_._2).sum
        val sdd = daily.map(t => t._1 * t._1).sum
        val sdc = daily.map(t => t._1 * t._2).sum
        val slope = (n * sdc - sd * sc).toDouble / (n * sdd - sd * sd).toDouble
        val icpt = (sc.toDouble - slope * sd.toDouble) / n.toDouble
        assert(got(typ) == ((n, slope, icpt)), s"type $typ")
      }
    }
    // planted exact line c = 3d + 7 over days 0..9 recovers slope 3
    import spark.implicits._
    val ev = (0 until 10).flatMap(d => (0 until 3 * d + 7)
      .map(i => ("lin", d.toLong * 86400 + i))).toDF("event_type", "ts_sec")
      .select(col("event_type"),
        org.apache.spark.sql.functions.timestamp_seconds(col("ts_sec")).as("ts"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-trend")
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Temporal.volumeTrend(spark, tmp.toString).collect().head
    assert(r.getAs[Double]("slope") == 3.0 && r.getAs[Double]("intercept") == 7.0)
  }

  test("conversion_lag equals the sorted replay") {
    val lags = raw.groupBy(_._1).values.flatMap { evs =>
      val views = evs.filter(_._4 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val v = views.min
        val ps = evs.filter(e => e._4 == "purchase" && e._3 >= v).map(_._3)
        if (ps.isEmpty) None else Some(ps.min - v)
      }
    }.toSeq.sorted
    val n = lags.length
    val r = Temporal.conversionLag(spark, sf).collect().head
    assert(r.getAs[Long]("n_users") == n)
    assert(r.getAs[Double]("med_lag_sec") ==
      (lags((n - 1) / 2) + lags(n / 2)) / 2.0)
    assert(r.getAs[Long]("p90_lag_sec") == lags((9 * n + 9) / 10 - 1))
  }

  test("order_gaps matches a per-customer sequential LAG replay") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("(CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG)) div 86400").as("day"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = orders.groupBy(_._1).collect { case (cust, os) if os.length >= 2 =>
      val days = os.sortBy(o => (o._2, o._3)).map(_._2)
      val gaps = days.zip(days.tail).map { case (a, b) => b - a }
      cust -> (os.length.toLong, gaps.min, gaps.max,
        gaps.sum.toDouble / gaps.length)
    }
    val got = Temporal.orderGaps(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_orders"),
        r.getAs[Long]("min_gap_days"), r.getAs[Long]("max_gap_days"),
        r.getAs[Double]("avg_gap_days"))).toMap
    assert(got.size == want.size)
    want.foreach { case (c, w) => assert(got(c) == w, s"cust $c") }
  }

  test("autocorr_lag matches a sequential moment replay; ±1 bounded; shifted-series sanity") {
    val daily = raw.groupBy(e => (e._4, e._3 / 86400))
      .map { case ((t, d), es) => (t, d, es.size.toLong) }.toSeq
    val want = daily.groupBy(_._1).flatMap { case (t, ds) =>
      val byDay = ds.map(x => x._2 -> x._3).toMap
      val pairs = byDay.toSeq.collect {
        case (d, x) if byDay.contains(d + 1) => (x, byDay(d + 1))
      }
      val n = pairs.length
      if (n <= 1) None else {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        // the operator's zero-variance exclusion, replayed exactly
        if (n * sxx - sx * sx <= 0 || n * syy - sy * sy <= 0) None
        else {
          val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
          val den = math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
            (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
          Some(t -> (n.toLong, num / den))
        }
      }
    }
    val got = Temporal.autocorrLag(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_pairs"),
        r.getAs[Double]("autocorr"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (t, w) => assert(got(t) == w, s"type $t") }
    got.values.foreach { case (_, r) => assert(r >= -1.0 && r <= 1.0) }
  }

  test("interval_merge matches a sequential interval-union replay") {
    val want = raw.groupBy(_._1).map { case (u, es) =>
      val iv = es.map(e => (e._3, e._3 + 60L)).sortBy(identity)
      val merged = iv.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, i) => List(i)
        case (acc @ ((b0, e0) :: rest), (b, e)) =>
          if (b > e0) (b, e) :: acc else (b0, math.max(e0, e)) :: rest
      }.reverse
      u -> (merged.length.toLong,
        merged.map { case (b, e) => e - b }.sum,
        merged.map { case (b, e) => e - b }.max)
    }
    val got = Temporal.intervalMerge(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_islands"),
        r.getAs[Long]("covered_sec"), r.getAs[Long]("max_island_sec"))).toMap
    assert(got.size == want.size)
    want.foreach { case (u, w) => assert(got(u) == w, s"user $u") }
    // coverage never exceeds naive n*60 and never undershoots one span
    got.foreach { case (_, (_, cov, mx)) => assert(cov >= 60 && mx >= 60) }
  }

  test("user_growth: first-seen attribution conserves users; cumulative is monotone") {
    val firstDays = raw.groupBy(_._1).map { case (_, es) => es.map(_._3 / 86400).min }
    val want = firstDays.groupBy(identity).map { case (d, v) => d -> v.size.toLong }
    val rows = Temporal.userGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("new_users"), r.getAs[Long]("total_users")))
    assert(rows.map(r => r._1 -> r._2).toMap === want)
    assert(rows.map(_._2).sum === raw.map(_._1).distinct.length.toLong)
    rows.foldLeft(0L) { case (acc, (_, nu, tot)) =>
      assert(tot === acc + nu); tot
    }
  }

  test("windowed family shuffles once: window_range plan has one user exchange") {
    val plan = Temporal.windowRange(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("ts_decompose equals a sequential local replica exactly; only complete 7-day windows emit") {
    val got = Temporal.tsDecompose(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // local replica from the raw daily counts, same integer-sum-then-
    // one-division arithmetic — doubles must match BIT-exactly
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        graft.functions.TimeFunctions.epochUs(col("ts")).as("us"))
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byType = daily.groupBy(_._1._1)
    val expected = scala.collection.mutable.Map.empty[(String, Long), (Long, Double, Double, Double)]
    byType.foreach { case (et, m) =>
      val days = m.map { case ((_, d), c) => d -> c }
      val complete = days.keys.filter(d => (d - 3 to d + 3).forall(days.contains)).toSeq
      val rows = complete.map { d =>
        val sum7 = (d - 3 to d + 3).map(days).sum
        (d, days(d), sum7, 7L * days(d) - sum7)
      }
      val byDow = rows.groupBy(_._1 % 7)
      rows.foreach { case (d, c, sum7, d7) =>
        val grp = byDow(d % 7)
        val sd7 = grp.map(_._4).sum
        val trend = sum7.toDouble / 7.0
        val seasonal = sd7.toDouble / (7.0 * grp.size)
        expected((et, d)) = (c, trend, seasonal, c.toDouble - trend - seasonal)
      }
    }
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v === expected(k), s"at $k") }
    assert(got.nonEmpty)
    // a window straddling a calendar gap or series edge must not emit
    val allDays = daily.keySet
    assert(got.keys.forall { case (et, d) =>
      (d - 3 to d + 3).forall(x => allDays.contains((et, x)))
    })
  }

  test("anomaly_mad matches a sequential trailing median/MAD replay, bit for bit") {
    val daily = raw.groupBy { case (_, _, t, et, _) => (et, t / 86400) }
      .map { case (k, v) => k -> v.length.toLong }
    val byType = daily.groupBy(_._1._1)
    def midOf(sorted: Seq[Double]): Double =
      (sorted((sorted.size - 1) / 2) + sorted(sorted.size / 2)) / 2.0
    val expected = daily.flatMap { case ((et, d), c) =>
      val days = byType(et).map { case ((_, dd), cc) => dd -> cc }
      val trail = days.collect {
        case (dd, cc) if dd >= d - 7 && dd <= d - 1 => cc
      }.toSeq.sorted
      if (trail.isEmpty) None else {
        val med = midOf(trail.map(_.toDouble))
        val mad = midOf(trail.map(x => math.abs(x.toDouble - med)).sorted)
        val score = math.abs(c.toDouble - med) / (mad + 0.5)
        Some((et, d) -> (c, trail.size.toLong, med, mad, score,
          score > 3.0 && trail.size >= 4))
      }
    }
    val got = Temporal.anomalyMad(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_trail"),
          r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Double]("score"), r.getAs[Boolean]("is_anomaly"))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v === expected(k), s"at $k") }
    // the robust frame must differ from event_spike's GLOBAL baseline
    // somewhere: warm-up rows exist (n_trail < 7 near each series head)
    assert(got.values.exists(_._2 < 7L) && got.values.exists(_._2 === 7L))
  }

  test("active_users equals the brute-force trailing-7-day distinct count per day") {
    val acts = Tables.events(spark, sf)
      .select(col("user_id"),
        graft.functions.TimeFunctions.epochSec(col("ts")).as("s"))
      .collect().map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400L)))
      .distinct
    val lo = acts.map(_._2).min
    val hi = acts.map(_._2).max
    val want = (lo to hi).map { d =>
      val dau = acts.count(_._2 == d).toLong
      val wau = acts.filter(a => a._2 >= d - 6 && a._2 <= d).map(_._1).distinct.length.toLong
      d -> (dau, wau, if (wau > 0) dau * 1000000L / wau else 0L)
    }.toMap
    val got = Temporal.activeUsers(spark, sf).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Long]("stickiness_ppm"))).toMap
    assert(got === want)
    // the spine covers every calendar day, including any inactive ones
    assert(got.keySet === (lo to hi).toSet)
    // WAU >= DAU everywhere (a day's actives are in their own window)
    got.values.foreach { case (dau, wau, _) => assert(wau >= dau) }
  }

  test("seasonal_index equals a JVM replay; indices average to 1 over the 12 months") {
    val months = spark.read.parquet(s"$sf/orders.parquet")
      .select(org.apache.spark.sql.functions.month(
        org.apache.spark.sql.functions.col("o_orderdate")).cast("long"))
      .collect().map(_.getLong(0))
    val want = months.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = months.length.toLong
    val got = graft.operators.Temporal.seasonalIndex(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (mon, n) =>
      assert(got(mon)._1 === n)
      assert(got(mon)._2 === (n * 12).toDouble / total, s"month $mon")
    }
    // conservation: counts telescope to the total, the mean index is 1
    assert(got.values.map(_._1).sum === total)
    assert(math.abs(got.values.map(_._2).sum / got.size - (12.0 / got.size)) < 1e-9)
  }

  test("weekday_profile equals a JVM replay; shares telescope to 1 per type") {
    import org.apache.spark.sql.functions.col
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        graft.functions.TimeFunctions.epochUs(col("ts")).as("us"))
      .collect()
      .map(r => (r.getString(0),
        (Math.floorDiv(r.getLong(1), 86400000000L) + 3) % 7))
    val want = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = graft.operators.Temporal.weekdayProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, n) =>
      assert(got(k)._1 === n, k)
      assert(got(k)._2 === n.toDouble / totals(k._1), k)
    }
    got.keys.foreach { case (_, dow) => assert(dow >= 0 && dow <= 6) }
    got.groupBy(_._1._1).foreach { case (t, m) =>
      assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12, t)
    }
  }
}
