package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions._
import graft.sources.Tables

/** Event-TIME analytics beyond the window/session images in
  * [[EventOps]]: range-frame rolling aggregates, gap-filled resampling,
  * changelog compaction and in-stream attribution — the four
  * time-series shapes a pipeline operator reaches for right after
  * tumbling/sliding windows.
  *
  * FLOAT DISCIPLINE (shared by all four): `value` enters every
  * aggregate as `cents = CAST(floor(value * 100) AS BIGINT)` — one IEEE
  * multiply + floor, both correctly rounded, so the long is
  * bit-identical on any engine replaying the same tree, and every
  * downstream SUM is an order-insensitive integer aggregate.  (A
  * `round()` here would hang the oracle on each engine's half-way tie
  * policy; floor has no ties.)
  */
object Temporal {

  /** `cents` lane: exact on any engine (see object scaladoc). */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * lit(100)).cast("long")

  /** Rolling 10-minute per-user totals via a RANGE window frame —
    * the "how much did this user do in the trailing window ending at
    * each event" shape that a ROWS frame cannot express (events are
    * irregularly spaced, so the peer set is defined by TIME distance,
    * not row count).
    *
    * Determinism: a RANGE frame includes ALL peers of the current
    * order value, so two events in the same second see identical
    * frames regardless of their shuffle order — no tie-break needed
    * inside the frame; the output sort adds event_id for presentation
    * determinism only.
    *
    * Scale shape: ONE hash exchange on user_id + per-partition sort —
    * the same single shuffle as any per-user window; the frame is
    * evaluated by a sliding two-pointer pass over each user's sorted
    * run (Spark's bounded-preceding range frame), never by
    * re-scanning.  At 100 TB: users are the natural hash key; AQE
    * splits skewed users only if a single user's month of events
    * outgrows a task, which the 600 s bound makes implausible.
    */
  def windowRange(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"),
      epochSec(col("ts")).as("ts_sec"), cents(col("value")).as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-600L, 0L)
    ev.select(col("user_id"), col("event_id"), col("ts_sec"),
        count(lit(1)).over(w).as("roll_n"),
        sum(col("cents")).over(w).as("roll_cents"))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
  }

  /** Gap-filled per-user daily resample: every user gets one row per
    * calendar day from their first to their last active day, with
    * zero-filled counts — the "regularize an irregular series before
    * feature extraction" step (lag features, moving averages and
    * forecasting all assume a dense time axis).
    *
    * Scale shape: the (user, day) aggregate collapses map-side; the
    * dense axis comes from `sequence(min_day, max_day)` exploded off
    * the per-user 2-long bounds row — the explode fan-out is bounded
    * by the CORPUS TIME SPAN in days (a constant — 30 here), never by
    * row count, so the generated frame is |users| × span no matter
    * how many raw events compress into it.  The final left join is
    * (user, day)-keyed with the dense side as the probe; both sides
    * are already aggregates, orders of magnitude below the fact
    * table.
    */
  def tsResample(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), epochSec(col("ts")).as("ts_sec"),
        cents(col("value")).as("cents"))
      .select(col("user_id"), expr("ts_sec div 86400").as("day"), col("cents"))
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
    val axis = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    axis.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("c"), lit(0L)).as("cents"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Changelog compaction (CDC upsert): the events stream read as a
    * keyed changelog — per user the LATEST record wins, and a latest
    * record of type `error` is a tombstone that deletes the key — the
    * exact shape of compacting a Debezium/Kafka topic into a
    * snapshot, and of the incremental-ingest "keep newest version of
    * each document" pass in a training pipeline.
    *
    * Scale shape: ONE `max_by` aggregate keyed on user_id with
    * map-side partials — each task keeps one candidate row per key it
    * sees, merges pairwise, and only |keys| rows ever shuffle.  This
    * is the 100 TB way to compact: no window, no row_number, no
    * per-key row buffering (the oracle's ROW_NUMBER()=1 formulation
    * is the SEMANTIC spec, not the plan).  (ts, event_id) is a total
    * order (event_id unique), so the argmax is deterministic.
    */
  def cdcUpsert(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), epochSec(col("ts")).as("ts_sec"),
      col("event_type"), cents(col("value")).as("cents"))
    ev.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts_sec"), col("event_id"), col("event_type"), col("cents")),
        struct(col("ts_sec"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.ts_sec").as("ts_sec"),
        col("last.event_id").as("event_id"),
        col("last.event_type").as("last_type"),
        col("last.cents").as("cents"))
      .filter(col("last_type") =!= lit("error"))
      .orderBy(col("user_id"))
  }

  /** Last-touch attribution: each `purchase` is credited to the
    * user's most recent PRECEDING touch event (`click` or `view`),
    * then credit is aggregated per touch type — the marketing-
    * attribution image, and the general "carry the latest non-null
    * upstream label forward" stream shape (`last(_, ignoreNulls)`
    * over an ordered per-key frame).
    *
    * Purchases with no preceding touch (the user's first events)
    * credit the `(none)` bucket, so Σn_purchases over the output is
    * exactly the corpus purchase count — spec-pinned.
    *
    * Scale shape: one user_id exchange + sorted-run scan, same
    * single-shuffle profile as [[windowRange]]; the final aggregate
    * has ≤ 3 groups.  Tie order inside a second is fixed by
    * (ts_sec, event_id) so the carried label is deterministic.
    */
  def eventAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), epochSec(col("ts")).as("ts_sec"),
      col("event_type"), cents(col("value")).as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("click", "view"), col("event_type"))
    ev.withColumn("attrib", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === lit("purchase"))
      .groupBy(coalesce(col("attrib"), lit("(none)")).as("attrib_type"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
      .orderBy(col("attrib_type"))
  }

  /** User-journey mining: the top-20 most common within-user
    * event-type trigrams — "what do users actually do in sequence",
    * the path-analysis query behind funnel design (event_funnel
    * checks ONE hypothesized order; this discovers the orders).
    *
    * Scale shape: one user exchange for the lag windows, then a
    * bounded |types|³-key aggregate with map-side partials and a
    * TakeOrderedAndProject (top-20 per partition partials — no global
    * sort).  The (n desc, t1, t2, t3) order is total, so the cut is
    * engine-deterministic.
    */
  def eventPaths(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), epochSec(col("ts")).as("ts_sec"),
      col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    ev.select(lag(col("event_type"), 2).over(w).as("t1"),
        lag(col("event_type"), 1).over(w).as("t2"),
        col("event_type").as("t3"))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** CUSUM changepoint per event type: the day where the cumulative
    * deviation of daily volume from the type's mean peaks — "WHEN did
    * the level shift", where `event_spike` only asks "which days are
    * outliers".  A level change shows up as a monotone CUSUM ramp
    * peaking AT the changepoint, robust to single-day noise.
    *
    * Integer-exact: with n days and total T, the mean-deviation CUSUM
    * scaled by n is `S_d = n·cum_d − rank_d·T` — integers only, so
    * the argmax (|S| desc, then earliest day) is engine-exact with no
    * float accumulation anywhere.  Scale shape: (type, day) aggregate
    * collapses map-side; every window runs per type over ≤|days| rows
    * (the corpus time span, a constant), and the 1-row-per-type
    * argmax is a window-rank filter over that bounded frame.
    */
  def cusumShift(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), epochSec(col("ts")).as("ts_sec"))
      .select(col("event_type"), expr("ts_sec div 86400").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val withS = daily
      .withColumn("cum", sum(col("c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("t", sum(col("c")).over(wAll))
      .withColumn("s", col("n") * col("cum") - col("rk") * col("t"))
    withS
      .withColumn("pick", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(abs(col("s")).desc, col("day"))))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("day").as("shift_day"),
        col("s").as("s_scaled"), col("n").as("n_days"))
      .orderBy(col("event_type"))
  }

  /** Nearest-in-time join: each purchase paired with the same user's
    * CLOSEST click in either direction (the sensor-alignment shape —
    * `asof_join` only looks backward; aligning two streams wants the
    * nearest reading).  Two ignoreNulls window carries — last click
    * before, first click after — then one integer comparison picks
    * the nearer side, ties to the earlier click.  Purchases with no
    * click either side drop (inner semantics, like asof).
    *
    * Scale shape: identical to every per-user window here — one hash
    * exchange, sorted-run scan, no join at all (the "join" is a
    * window carry, which is how an in-stream as-of avoids building a
    * second keyed relation).
    */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), epochUs(col("ts")).as("us"),
      col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val clickUs = when(col("event_type") === "click", col("us"))
    val out = ev
      .withColumn("prev_us", last(clickUs, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_us", first(clickUs, ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing)))
      .filter(col("event_type") === "purchase")
      .filter(col("prev_us").isNotNull || col("next_us").isNotNull)
      .withColumn("nearest_us",
        when(col("prev_us").isNull, col("next_us"))
          .when(col("next_us").isNull, col("prev_us"))
          .when(col("us") - col("prev_us") <= col("next_us") - col("us"),
            col("prev_us"))
          .otherwise(col("next_us")))
    out.select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("p_us"), col("nearest_us"),
        abs(col("us") - col("nearest_us")).as("gap_us"))
      .orderBy(col("user_id"), col("p_us"), col("purchase_id"))
  }

  /** Per-type daily-volume linear trend (least squares over (day,
    * count)) — the DRIFT detector next to [[cusumShift]]'s level-shift
    * detector and `event_spike`'s outlier gate.  ORACLE-EXACT the way
    * `regr_slope` never is: all four moments are integer sums over
    * the (type, day) aggregate, and slope/intercept are a FIXED tree
    * of correctly-rounded double ops over those exact integers
    * (slope = (n·Σdc − Σd·Σc) / (n·Σd² − (Σd)²), both sides computed
    * in exact longs FIRST, one cast each, one divide).
    *
    * Scale shape: daily counts collapse map-side; the regression is a
    * |types|-row aggregate of 4 integer moments.  Nothing but (type,
    * day) partials ever shuffles.
    */
  def volumeTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), epochSec(col("ts")).as("ts_sec"))
      .select(col("event_type"), expr("ts_sec div 86400").as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("c"))
    val m = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"),
        sum(col("c")).as("sc"), sum(col("d") * col("d")).as("sdd"),
        sum(col("d") * col("c")).as("sdc"))
    val num = (col("n") * col("sdc") - col("sd") * col("sc")).cast("double")
    val den = (col("n") * col("sdd") - col("sd") * col("sd")).cast("double")
    m.filter(col("n") > 1)
      .withColumn("slope", num / den)
      .withColumn("intercept",
        (col("sc").cast("double") - col("slope") * col("sd").cast("double")) /
          col("n").cast("double"))
      .select(col("event_type"), col("n").as("n_days"), col("slope"),
        col("intercept"))
      .orderBy(col("event_type"))
  }

  /** Time-to-convert distribution: per user the lag from FIRST view to
    * the first purchase at-or-after it, summarized as exact median and
    * p90 by COUNTING over the lag histogram (the
    * [[Analytics.qualityMad]] discipline — no lag-list sort, no
    * percentile buffering; the window runs over DISTINCT lag values).
    * One output row: the product-analytics "how long does conversion
    * take" number, exact on both engines (median is a half-integer ⇒
    * /2.0 is an exact power-of-two division).
    *
    * Scale shape: two type-filtered user-keyed min-aggregates (map-
    * side), one user join, then histogram algebra on the lag domain.
    */
  def conversionLag(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("user_id"), epochSec(col("ts")).as("ts_sec"), col("event_type"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_sec")).as("v"))
    val firstP = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts_sec") >= col("v"))
      .groupBy(col("user_id"), col("v")).agg(min(col("ts_sec")).as("p"))
    val hist = firstP.select((col("p") - col("v")).as("lag"))
      .groupBy(col("lag")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("lag")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("hi", sum(col("cnt")).over(w))
    val tot = hist.agg(sum(col("cnt")).as("n"))
    cum.crossJoin(broadcast(tot))
      .groupBy(col("n"))
      .agg(
        min(when(col("hi") >= expr("(n + 1) div 2"), col("lag"))).as("lo_med"),
        min(when(col("hi") >= expr("(n + 2) div 2"), col("lag"))).as("up_med"),
        min(when(col("hi") * 10 >= col("n") * 9, col("lag"))).as("p90_lag_sec"))
      .select(col("n").as("n_users"),
        ((col("lo_med") + col("up_med")) / lit(2.0)).as("med_lag_sec"),
        col("p90_lag_sec"))
  }

  /** Inter-order intervals: per customer, the day gaps between
    * consecutive orders (LAG over the customer's order-day sequence) —
    * the purchase-cadence statistic behind churn/repeat-rate models,
    * and the suite's canonical LAG/LEAD image (the rank/running/range/
    * distribution windows are covered; the offset frame was not).
    *
    * Determinism: order day is the exact integer epoch-day; the window
    * orders by (day, o_orderkey) so same-day orders (gap 0) sequence
    * identically on any engine.  avg_gap_days is one exact-integer
    * ratio evaluated in IEEE double — bit-equal on both engines.
    *
    * Scale shape: ONE hash exchange on o_custkey + per-partition sort;
    * the frame is offset-1, so each row touches exactly its
    * predecessor in the sorted run (no frame re-scan), and the
    * follow-up aggregate reuses the same clustering (no second
    * exchange).  Customers are the natural skew-free key at 100 TB.
    */
  def orderGaps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), epochSec(col("o_orderdate")).as("ts_sec"),
        col("o_orderkey"))
      .select(col("o_custkey"), expr("ts_sec div 86400").as("day"),
        col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    o.withColumn("gap", col("day") - lag(col("day"), 1).over(w))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("gap")).as("min_gap_days"),
        max(col("gap")).as("max_gap_days"),
        sum(col("gap")).as("sum_gap"))
      .filter(col("n_orders") >= 2)
      .select(col("o_custkey"), col("n_orders"),
        col("min_gap_days"), col("max_gap_days"),
        (col("sum_gap").cast("double") /
          (col("n_orders") - 1).cast("double")).as("avg_gap_days"))
      .orderBy(col("o_custkey"))
  }

  /** Lag-1 autocorrelation of the per-type daily event volume — "is
    * today's traffic predicted by yesterday's" — the serial twin of
    * [[Analytics.corrMatrix]]'s cross-metric correlation, computed
    * under the same exact-moment discipline: pair consecutive PRESENT
    * days (d-1, d) by a self-join on the daily-count frame, reduce the
    * pairs to six decimal(38,0) moments (counts are integers, so every
    * sum is exact at any scale — the HUGEINT lane), and evaluate ONE
    * double expression tree per type.  sqrt is IEEE correctly-rounded,
    * so the result is bit-equal on both engines.
    *
    * Day pairing is by CALENDAR adjacency (d+1 must exist), not row
    * adjacency — a silent day breaks the chain rather than gluing
    * Friday to Monday; with gap-filled zeros instead, [[tsResample]]
    * composes upstream.
    *
    * Scale shape: the corpus collapses map-side to |types|·|days| daily
    * counts; the self-join and moment reduce run on that bounded frame
    * (≤ types × days rows regardless of event volume) — at 100 TB the
    * only corpus-sized work is the first keyed count.
    */
  def autocorrLag(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = Tables.events(s, dir)
      .select(col("event_type"), epochSec(col("ts")).as("ts_sec"))
      .select(col("event_type"), expr("ts_sec div 86400").as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("c"))
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.d") === col("a.d") + 1)
      .select(col("a.event_type").as("event_type"),
        col("a.c").as("x"), col("b.c").as("y"))
    val m = pairs.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x").cast(dec) * col("y").cast(dec)).cast(dec)).as("sxy"),
      sum((col("x").cast(dec) * col("x").cast(dec)).cast(dec)).as("sxx"),
      sum((col("y").cast(dec) * col("y").cast(dec)).cast(dec)).as("syy"))
    val n = col("n_pairs").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val num = n * col("sxy").cast("double") - sx * sy
    val dxx = n * col("sxx").cast("double") - sx * sx
    val dyy = n * col("syy").cast("double") - sy * sy
    // zero-variance guard: a constant series has dxx = dyy = 0 and
    // autocorrelation is UNDEFINED (0/0) — excluded identically on
    // both engines via the exact-integer variance terms, the
    // event_spike zero-variance rule
    m.filter(col("n_pairs") > 1)
      .filter((col("n_pairs") * col("sxx") - col("sx") * col("sx")) > 0 &&
        (col("n_pairs") * col("syy") - col("sy") * col("sy")) > 0)
      .select(col("event_type"), col("n_pairs"),
        (num / sqrt(dxx * dyy)).as("autocorr"))
      .orderBy(col("event_type"))
  }

  /** Merged-interval coverage (gaps-and-islands): each event claims
    * [ts, ts+60s); overlapping/touching claims merge into islands,
    * and the output is each user's island count, covered seconds and
    * largest island — "how much wall-clock was this user actually
    * active" vs naive n_events·60 double-counting overlaps.  The
    * canonical SQL islands shape, integer end-to-end: a new island
    * starts where ts exceeds the running max of prior interval ends
    * (strictly — touching intervals merge); island id is the running
    * sum of start flags; island span is max(end)−min(start).
    *
    * Scale shape: TWO windows and the final aggregate all share the
    * user_id clustering — one hash exchange total, each window a
    * single sorted pass (running max, running sum).  Determinism:
    * the running max over (ts_sec, event_id) order is
    * insensitive to same-second tie order (max is commutative), so
    * island boundaries are layout-stable.
    */
  def intervalMerge(s: SparkSession, dir: String): DataFrame = {
    val span = 60L
    val ev = Tables.events(s, dir)
      .select(col("user_id"), epochSec(col("ts")).as("b"), col("event_id"))
      .withColumn("e", col("b") + span)
    val w = Window.partitionBy(col("user_id")).orderBy(col("b"), col("event_id"))
    val flagged = ev
      .withColumn("prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("b") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(min(col("b")).as("ib"), max(col("e")).as("ie"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ie") - col("ib")).as("covered_sec"),
        max(col("ie") - col("ib")).as("max_island_sec"))
      .orderBy(col("user_id"))
  }

  /** Daily active-user growth: new users per day (first-seen
    * attribution) and the cumulative registered total — running
    * COUNT DISTINCT without a distinct-over-window: each user
    * collapses to one (first_day) row map-side, days aggregate
    * those, and ONE cumulative window over the |days| staircase
    * produces the growth curve (the conversion_lag counting
    * discipline; a literal `COUNT(DISTINCT) OVER` would carry the
    * full user set per row).  Oracle-exact integers throughout.
    */
  def userGrowth(s: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.events(s, dir)
      .select(col("user_id"), epochSec(col("ts")).as("ts_sec"))
      .select(col("user_id"), expr("ts_sec div 86400").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val daily = firstDay.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("total_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  /** Exact DAU/WAU/stickiness per calendar day — the engagement
    * dashboard every event product runs, computed WITHOUT the
    * scale-killer (a sliding count-distinct re-scanning 7 days of
    * users per day).  The trick: a user's contribution to WAU is a
    * UNION OF INTERVALS — each active day d covers WAU(d..d+6), and
    * per user those covers coalesce wherever consecutive active days
    * are ≤ 6 apart — so per user we emit one (+1 at start, −1 after
    * end+6) delta pair per coalesced interval, and one prefix-sum
    * sweep over the calendar spine reads off the exact WAU for every
    * day.  Work: one (user, day) distinct shuffle, one per-user
    * window over that user's active days, then a calendar-bounded
    * sweep (the [[volumeTrend]] rule: a global window is fine when
    * its input is the day domain, never the corpus).  Stickiness is
    * the integer ppm quotient DAU·10⁶ div WAU — exact on both
    * engines, no float division in the oracle lane.
    */
  def activeUsers(s: SparkSession, dir: String): DataFrame = {
    val acts = Tables.events(s, dir)
      .select(col("user_id"), epochSec(col("ts")).as("ts_sec"))
      .select(col("user_id"), expr("ts_sec div 86400").as("day"))
      .distinct()
      .localCheckpoint(eager = false) // dau + interval legs share
    val dau = acts.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val iv = acts
      .withColumn("prev", lag(col("day"), 1).over(wUser))
      .withColumn("ng",
        when(col("prev").isNull || col("day") - col("prev") > 6, 1L).otherwise(0L))
      .withColumn("grp", sum(col("ng")).over(wUser))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("day")).as("s"), max(col("day")).as("e"))
    // both delta rows of an interval come out of ONE pass (a 2-row
    // generate per interval) — a union of two selects over `iv` would
    // REPLAY the per-user window pipeline once per branch (caught by
    // the round-15 plan audit: two identical Sort+Window subtrees
    // under the union)
    val deltas = iv
      .select(explode(array(
        struct(col("s").as("day"), lit(1L).as("dd")),
        struct((col("e") + 7).as("day"), lit(-1L).as("dd")))).as("x"))
      .select(col("x.day").as("day"), col("x.dd").as("dd"))
      .groupBy(col("day")).agg(sum(col("dd")).as("delta"))
    val spine = acts.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val wDay = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    spine
      .join(deltas, Seq("day"), "left")
      .join(dau, Seq("day"), "left")
      .withColumn("wau", sum(coalesce(col("delta"), lit(0L))).over(wDay))
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
      .withColumn("stickiness_ppm",
        when(col("wau") > 0, expr("dau * 1000000 div wau")).otherwise(lit(0L)))
      .orderBy(col("day"))
  }

  /** Classical additive time-series decomposition of the daily event
    * count per type: trend = centered 7-day moving average (complete
    * windows only — RANGE frame on the integer day, so calendar gaps
    * disqualify a window instead of silently shrinking it), seasonal =
    * the day-of-week mean of the detrended series, resid = the
    * remainder.  The anomaly/forecasting primer every metrics pipeline
    * runs on its volume series (volume_trend's regression slope answers
    * "is it growing"; this answers "what is weekly rhythm vs drift vs
    * surprise").
    *
    * FLOAT DISCIPLINE: the moving average and day-of-week mean are held
    * as INTEGER sums (sum7; d7 = 7·c − sum7, so the detrended series is
    * exact longs) until one final division each — trend = sum7/7.0,
    * seasonal = Σd7/(7.0·n) — making every output a single correctly-
    * rounded IEEE op over exact integers, bit-identical on any engine
    * and any partitioning (a double-summed seasonal mean would depend
    * on shuffle arrival order).  Scale shape: one bounded-key daily
    * aggregate, one RANGE window per type, one (type, dow) aggregate
    * of ≤ 7·|types| rows joined back broadcast.
    */
  def tsDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), epochUs(col("ts")).as("us"))
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-3, 3)
    val t = daily
      .withColumn("sum7", sum(col("c")).over(w))
      .withColumn("n7", count(col("c")).over(w))
      .filter(col("n7") === 7)
      .withColumn("trend", col("sum7").cast("double") / lit(7.0))
      .withColumn("d7", lit(7L) * col("c") - col("sum7"))
    val seas = t.groupBy(col("event_type").as("s_et"), (col("day") % 7).as("dow"))
      .agg(sum(col("d7")).as("sd7"), count(lit(1)).as("nd"))
    val seasonal = col("sd7").cast("double") / (lit(7.0) * col("nd"))
    t.join(broadcast(seas),
        col("event_type") === col("s_et") && (col("day") % 7) === col("dow"))
      .select(col("event_type"), col("day"), col("c").as("n_events"),
        col("trend"), seasonal.as("seasonal"),
        (col("c").cast("double") - col("trend") - seasonal).as("resid"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Trailing-window ROBUST anomaly detection on the daily volume
    * series: for each (event_type, day), the median and MAD (median
    * absolute deviation) of the PREVIOUS ≤ 7 days' counts and a robust
    * score |c − med| / (mad + ½).  The production twin of
    * [[graft.operators.EventOps.spikeOver event_spike]]: that one
    * scores against a GLOBAL per-type mean/σ (one outlier day inflates
    * σ and masks later spikes; the baseline sees the future), this one
    * scores each day against only its own trailing week with
    * breakdown-point-½ statistics — the shape a live volume monitor
    * actually runs.  Warm-up rows (fewer than 4 trailing days) report
    * their score but are never flagged.
    *
    * FLOAT DISCIPLINE: no percentile interpolation (cross-engine
    * quantile semantics are not hash-stable — SURVEY §5).  The frame
    * is ≤ 7 integer counts collected and SORTED; median = the exact
    * mean of the two middle elements ((a+b)/2.0 of longs ⇒ half-
    * integer, exact), deviations |c−med| are half-integers, their
    * median is a quarter-integer, and the score is ONE division of
    * exact doubles — bit-identical on any engine replaying the tree.
    * (mad + ½ rather than a mad=0 branch: the offset is exact and
    * keeps constant-baseline days finite and comparable.)
    *
    * Scale shape: one bounded-key (type, day) count, one RANGE window
    * per type holding ≤ 7 longs per row — no corpus-sized state, no
    * shuffle beyond the daily aggregate's.
    */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), epochUs(col("ts")).as("us"))
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-7, -1)
    // exact median of a sorted array: mean of the two middle elements
    def mid(arr: String) = expr(
      s"(CAST(element_at($arr, CAST((size($arr) - 1) DIV 2 + 1 AS INT)) AS DOUBLE)" +
        s" + CAST(element_at($arr, CAST(size($arr) DIV 2 + 1 AS INT)) AS DOUBLE)) / 2.0")
    daily
      .withColumn("arr", sort_array(collect_list(col("c")).over(w)))
      .filter(size(col("arr")) >= 1)
      .withColumn("med", mid("arr"))
      .withColumn("devs", sort_array(transform(col("arr"),
        x => abs(x.cast("double") - col("med")))))
      .withColumn("mad", mid("devs"))
      .withColumn("score",
        abs(col("c").cast("double") - col("med")) / (col("mad") + lit(0.5)))
      .select(col("event_type"), col("day"), col("c").as("n_events"),
        size(col("arr")).cast("long").as("n_trail"), col("med"), col("mad"),
        col("score"),
        (col("score") > lit(3.0) && size(col("arr")) >= 4).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Monthly seasonality index of order volume — the demand-shape
    * number a capacity planner reads before staffing a quarter:
    * per calendar month, its order count and count·12/total (1.0 =
    * perfectly flat; the classic ratio-to-moving-average seasonal
    * index with the full-period mean as the base).
    *
    * Exactness: month() is calendar-exact on both engines, counts are
    * exact longs, and the index is ONE IEEE division of the exact
    * integer count·12 by the exact total — bit-equal cross-engine.
    *
    * Scale shape: one map-side-combined 12-key aggregate over the
    * orders scan (only the month ordinal leaves the scan), the 1-row
    * total broadcast back over 12 rows.  Nothing else moves.
    */
  def seasonalIndex(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(s, dir)
      .select(month(col("o_orderdate")).cast("long").as("mon"))
      .groupBy(col("mon")).agg(count(lit(1)).as("n_orders"))
      .localCheckpoint(eager = false) // feeds the total AND the index rows
    val total = m.agg(sum(col("n_orders")).as("total"))
    m.crossJoin(broadcast(total))
      .select(col("mon"), col("n_orders"),
        ((col("n_orders") * 12).cast("double") / col("total")).as("seasonal_index"))
      .orderBy(col("mon"))
  }

  /** Weekday activity profile — the day-of-week shape of the event
    * stream per type: for each (event_type, weekday), its event count
    * and share of the type's total.  The operations dashboard that
    * separates weekday-driven load (logins, purchases) from flat
    * background traffic before capacity is planned per day-of-week.
    *
    * Exactness: the weekday is pure integer arithmetic on the epoch
    * day ((day + 3) mod 7, 0 = Monday — epoch day 0, 1970-01-01, was
    * a Thursday), NOT an engine calendar function with
    * locale-dependent week starts; counts are exact longs and the
    * share is one IEEE division of exact integers.  The epoch day is
    * a FLOOR division (`us − pmod(us, D)` is floor-aligned, so the
    * `div` is exact) — `div` alone truncates toward zero, which for
    * pre-1970 timestamps lands one day late and, through the mod,
    * would surface as a wrong weekday against the oracle's
    * `floor(epoch/86400)`.  The mod itself is `pmod` (r19): a
    * dividend-sign `%` returns −6..−1 for pre-1970 epoch days,
    * splitting one weekday across two buckets and breaking the
    * documented 0..6 contract even while matching an oracle with the
    * same sign convention; the oracle SQL applies the equivalent
    * `((x % 7) + 7) % 7` so both sides stay value-identical AND
    * contract-true on any timestamp.
    *
    * Scale shape: one map-side-combined ≤(|types|·7)-key aggregate
    * over the events scan; the per-type totals window runs over those
    * bounded rows, never the scan.
    */
  def weekdayProfile(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir)
      .select(col("event_type"), epochUs(col("ts")).as("us"))
      .select(col("event_type"),
        expr("pmod((us - pmod(us, 86400000000)) div 86400000000 + 3, 7)").as("dow"))
      .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
    d.withColumn("share",
        col("n_events").cast("double") / sum(col("n_events")).over(w))
      .select(col("event_type"), col("dow"), col("n_events"), col("share"))
      .orderBy(col("event_type"), col("dow"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "weekday_profile" -> (weekdayProfile _),
    "seasonal_index" -> (seasonalIndex _),
    "anomaly_mad" -> (anomalyMad _),
    "ts_decompose" -> (tsDecompose _),
    "interval_merge" -> (intervalMerge _),
    "user_growth" -> (userGrowth _),
    "active_users" -> (activeUsers _),
    "order_gaps" -> (orderGaps _),
    "autocorr_lag" -> (autocorrLag _),
    "conversion_lag" -> (conversionLag _),
    "volume_trend" -> (volumeTrend _),
    "event_paths" -> (eventPaths _),
    "cusum_shift" -> (cusumShift _),
    "asof_nearest" -> (asofNearest _),
    "window_range" -> (windowRange _),
    "ts_resample" -> (tsResample _),
    "cdc_upsert" -> (cdcUpsert _),
    "event_attribution" -> (eventAttribution _))

  def oracleSql: Map[String, String] = Map(
    // weekday = integer arithmetic on the epoch day (no calendar
    // function: engines disagree on week starts); share = one IEEE
    // division of exact longs.  SUM() OVER returns HUGEINT in DuckDB —
    // the division is DOUBLE/HUGEINT, value-identical
    "weekday_profile" ->
      """WITH d AS (SELECT event_type,
        |  ((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7 + 7) % 7 AS dow,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, dow, n_events,
        |  CAST(n_events AS DOUBLE) /
        |    SUM(n_events) OVER (PARTITION BY event_type) AS share
        |FROM d ORDER BY event_type, dow""".stripMargin,
    // month() is calendar-exact on both engines; the index is one IEEE
    // division of exact integers
    "seasonal_index" ->
      """WITH m AS (SELECT month(o_orderdate) AS mon,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM m)
        |SELECT mon, n_orders,
        |  CAST(n_orders * 12 AS DOUBLE) / total AS seasonal_index
        |FROM m, t ORDER BY mon""".stripMargin,
    // the interval-coalesce + delta-sweep WAU, replayed verbatim;
    // epoch() seconds are < 2^53 so floor-division is exact
    "active_users" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events),
        |dau AS (SELECT day, COUNT(*) AS dau FROM a GROUP BY day),
        |g AS (SELECT user_id, day,
        |  CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
        |         OR day - lag(day) OVER (PARTITION BY user_id ORDER BY day) > 6
        |       THEN 1 ELSE 0 END AS ng FROM a),
        |g2 AS (SELECT *, SUM(ng) OVER (PARTITION BY user_id ORDER BY day) AS grp FROM g),
        |iv AS (SELECT user_id, grp, MIN(day) AS s, MAX(day) AS e
        |       FROM g2 GROUP BY user_id, grp),
        |d AS (SELECT s AS day, 1 AS dd FROM iv
        |      UNION ALL SELECT e + 7, -1 FROM iv),
        |dd AS (SELECT day, CAST(SUM(dd) AS BIGINT) AS delta FROM d GROUP BY day),
        |spine AS (SELECT unnest(generate_series(
        |  (SELECT MIN(day) FROM a), (SELECT MAX(day) FROM a))) AS day),
        |sw AS (SELECT spine.day, COALESCE(dau.dau, 0) AS dau,
        |  CAST(SUM(COALESCE(dd.delta, 0)) OVER (ORDER BY spine.day) AS BIGINT) AS wau
        |  FROM spine LEFT JOIN dd ON spine.day = dd.day
        |  LEFT JOIN dau ON spine.day = dau.day)
        |SELECT day, CAST(dau AS BIGINT) AS dau, wau,
        |  CASE WHEN wau > 0 THEN dau * 1000000 // wau ELSE 0 END AS stickiness_ppm
        |FROM sw ORDER BY day""".stripMargin,
    // no percentile functions on either engine: both sides sort the
    // ≤ 7-element trailing list and take the exact two-middle mean, so
    // med/mad/score replay the identical IEEE tree (see scaladoc)
    "anomaly_mad" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
        |               FROM events GROUP BY 1, 2),
        |t AS (SELECT a.event_type, a.day, a.c,
        |        list_sort(list(b.c)) AS arr, COUNT(*) AS n_trail
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND b.day BETWEEN a.day - 7 AND a.day - 1
        |      GROUP BY a.event_type, a.day, a.c),
        |m AS (SELECT event_type, day, c, n_trail,
        |        (CAST(arr[CAST((n_trail - 1) // 2 AS BIGINT) + 1] AS DOUBLE)
        |       + CAST(arr[CAST(n_trail // 2 AS BIGINT) + 1] AS DOUBLE)) / 2.0 AS med, arr
        |      FROM t),
        |d AS (SELECT event_type, day, c, n_trail, med,
        |        list_sort(list_transform(arr, x -> abs(CAST(x AS DOUBLE) - med))) AS devs
        |      FROM m),
        |x AS (SELECT event_type, day, c, n_trail, med,
        |        (devs[CAST((n_trail - 1) // 2 AS BIGINT) + 1]
        |       + devs[CAST(n_trail // 2 AS BIGINT) + 1]) / 2.0 AS mad
        |      FROM d)
        |SELECT event_type, day, c AS n_events, n_trail, med, mad,
        |  abs(CAST(c AS DOUBLE) - med) / (mad + 0.5) AS score,
        |  (abs(CAST(c AS DOUBLE) - med) / (mad + 0.5)) > 3.0 AND n_trail >= 4 AS is_anomaly
        |FROM x ORDER BY event_type, day""".stripMargin,
    // integer sums until one final division each (trend = sum7/7.0,
    // seasonal = sd7/(7.0*nd)); resid recomputes seasonal from the
    // same operands — identical IEEE ops, identical bits
    "ts_decompose" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, c,
        |        CAST(SUM(c) OVER win AS BIGINT) AS sum7,
        |        COUNT(c) OVER win AS n7
        |      FROM d WINDOW win AS (PARTITION BY event_type ORDER BY day
        |        RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t AS (SELECT event_type, day, c, CAST(sum7 AS DOUBLE) / 7.0 AS trend,
        |        7 * c - sum7 AS d7
        |      FROM w WHERE n7 = 7),
        |s AS (SELECT event_type AS s_et, day % 7 AS dow,
        |        CAST(SUM(d7) AS BIGINT) AS sd7, COUNT(*) AS nd
        |      FROM t GROUP BY 1, 2)
        |SELECT event_type, CAST(day AS BIGINT) AS day, CAST(c AS BIGINT) AS n_events,
        |  trend,
        |  CAST(sd7 AS DOUBLE) / (7.0 * nd) AS seasonal,
        |  CAST(c AS DOUBLE) - trend - CAST(sd7 AS DOUBLE) / (7.0 * nd) AS resid
        |FROM t JOIN s ON t.event_type = s.s_et AND t.day % 7 = s.dow
        |ORDER BY 1, 2""".stripMargin,
    "interval_merge" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS b,
        |  (epoch_us(ts) // 1000000) + 60 AS e, event_id FROM events),
        |f AS (SELECT user_id, b, e, event_id,
        |  CASE WHEN MAX(e) OVER (PARTITION BY user_id
        |      ORDER BY b, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |    OR b > MAX(e) OVER (PARTITION BY user_id
        |      ORDER BY b, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |  THEN 1 ELSE 0 END AS new_island
        |  FROM ev),
        |g AS (SELECT user_id, b, e,
        |  SUM(new_island) OVER (PARTITION BY user_id ORDER BY b, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |isl AS (SELECT user_id, island, MIN(b) AS ib, MAX(e) AS ie
        |        FROM g GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(ie - ib) AS BIGINT) AS covered_sec,
        |  MAX(ie - ib) AS max_island_sec
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,
    "user_growth" ->
      """WITH fd AS (SELECT user_id,
        |  MIN((epoch_us(ts) // 1000000) // 86400) AS first_day
        |  FROM events GROUP BY 1),
        |d AS (SELECT first_day AS day, COUNT(*) AS new_users
        |      FROM fd GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS total_users
        |FROM d ORDER BY day""".stripMargin,
    "order_gaps" ->
      """WITH o AS (SELECT o_custkey,
        |  (epoch_us(o_orderdate) // 1000000) // 86400 AS day, o_orderkey
        |  FROM orders),
        |g AS (SELECT o_custkey,
        |  day - LAG(day) OVER (PARTITION BY o_custkey
        |                       ORDER BY day, o_orderkey) AS gap
        |  FROM o)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  MIN(gap) AS min_gap_days, MAX(gap) AS max_gap_days,
        |  CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) - 1 AS DOUBLE)
        |    AS avg_gap_days
        |FROM g GROUP BY o_custkey HAVING COUNT(*) >= 2
        |ORDER BY o_custkey""".stripMargin,
    // decimal moments in HUGEINT (≡ Spark DECIMAL(38,0) exact sums),
    // then the identical double tree — the corr_matrix lane
    "autocorr_lag" ->
      """WITH daily AS (SELECT event_type,
        |  (epoch_us(ts) // 1000000) // 86400 AS d, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type, a.c AS x, b.c AS y
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND b.d = a.d + 1),
        |m AS (SELECT event_type, COUNT(*) AS n_pairs,
        |  SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |  SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |  SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |  SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM p GROUP BY 1)
        |SELECT event_type, n_pairs,
        |  (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    AS autocorr
        |FROM m WHERE n_pairs > 1
        |  AND n_pairs * sxx - sx * sx > 0
        |  AND n_pairs * syy - sy * sy > 0
        |ORDER BY event_type""".stripMargin,
    "conversion_lag" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_sec,
        |  event_type FROM events),
        |fv AS (SELECT user_id, MIN(ts_sec) AS v FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT e.user_id, v, MIN(ts_sec) AS p
        |       FROM e JOIN fv USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_sec >= v
        |       GROUP BY 1, 2),
        |h AS (SELECT p - v AS lag, COUNT(*) AS cnt FROM fp GROUP BY 1),
        |c AS (SELECT lag, SUM(cnt) OVER (ORDER BY lag
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi FROM h),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h)
        |SELECT n AS n_users,
        |  (MIN(CASE WHEN hi >= (n + 1) // 2 THEN lag END)
        |   + MIN(CASE WHEN hi >= (n + 2) // 2 THEN lag END)) / 2.0
        |    AS med_lag_sec,
        |  MIN(CASE WHEN hi * 10 >= n * 9 THEN lag END) AS p90_lag_sec
        |FROM c, t GROUP BY n""".stripMargin,
    "volume_trend" ->
      """WITH d AS (SELECT event_type,
        |  (epoch_us(ts) // 1000000) // 86400 AS d, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(c) AS BIGINT) AS sc,
        |  CAST(SUM(d * d) AS BIGINT) AS sdd, CAST(SUM(d * c) AS BIGINT) AS sdc
        |  FROM d GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  CAST(n * sdc - sd * sc AS DOUBLE)
        |    / CAST(n * sdd - sd * sd AS DOUBLE) AS slope,
        |  (CAST(sc AS DOUBLE)
        |     - (CAST(n * sdc - sd * sc AS DOUBLE)
        |          / CAST(n * sdd - sd * sd AS DOUBLE)) * CAST(sd AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS intercept
        |FROM m WHERE n > 1 ORDER BY event_type""".stripMargin,
    "asof_nearest" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |           FROM events),
        |c AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us,
        |  first_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
        |  FROM e),
        |p AS (SELECT *,
        |  CASE WHEN prev_us IS NULL THEN next_us
        |       WHEN next_us IS NULL THEN prev_us
        |       WHEN us - prev_us <= next_us - us THEN prev_us
        |       ELSE next_us END AS nearest_us
        |  FROM c
        |  WHERE event_type = 'purchase'
        |    AND (prev_us IS NOT NULL OR next_us IS NOT NULL))
        |SELECT user_id, event_id AS purchase_id, us AS p_us, nearest_us,
        |  ABS(us - nearest_us) AS gap_us
        |FROM p ORDER BY user_id, p_us, purchase_id""".stripMargin,
    "cusum_shift" ->
      """WITH d AS (SELECT event_type,
        |  (epoch_us(ts) // 1000000) // 86400 AS day, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, day,
        |  CAST(COUNT(*) OVER tp AS BIGINT) * CAST(SUM(c) OVER w AS BIGINT)
        |    - CAST(ROW_NUMBER() OVER w AS BIGINT) * CAST(SUM(c) OVER tp AS BIGINT)
        |    AS s,
        |  CAST(COUNT(*) OVER tp AS BIGINT) AS n_days
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         tp AS (PARTITION BY event_type))
        |SELECT event_type, day AS shift_day, s AS s_scaled, n_days
        |FROM s
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY ABS(s) DESC, day) = 1
        |ORDER BY event_type""".stripMargin,
    "event_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(ts) // 1000000 AS ts_sec FROM events),
        |g AS (SELECT
        |  LAG(event_type, 2) OVER w AS t1,
        |  LAG(event_type, 1) OVER w AS t2,
        |  event_type AS t3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        |SELECT t1, t2, t3, COUNT(*) AS n FROM g WHERE t1 IS NOT NULL
        |GROUP BY t1, t2, t3
        |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,
    // RANGE frame ≡ Spark's rangeBetween(-600, 0): peers included.
    "window_range" ->
      """WITH e AS (SELECT user_id, event_id,
        |  epoch_us(ts) // 1000000 AS ts_sec,
        |  CAST(floor(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT user_id, event_id, ts_sec,
        |  COUNT(*) OVER w AS roll_n,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS roll_cents
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
        |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_sec, event_id""".stripMargin,
    "ts_resample" ->
      """WITH e AS (SELECT user_id, (epoch_us(ts) // 1000000) // 86400 AS day,
        |  CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, day, COUNT(*) AS n, SUM(cents) AS c
        |      FROM e GROUP BY 1, 2),
        |a AS (SELECT user_id, unnest(generate_series(MIN(day), MAX(day))) AS day
        |      FROM d GROUP BY user_id)
        |SELECT a.user_id, a.day,
        |  COALESCE(n, 0) AS n_events, CAST(COALESCE(c, 0) AS BIGINT) AS cents
        |FROM a LEFT JOIN d ON a.user_id = d.user_id AND a.day = d.day
        |ORDER BY a.user_id, a.day""".stripMargin,
    // ROW_NUMBER()=1 is the semantic spec of the max_by compaction.
    "cdc_upsert" ->
      """WITH e AS (SELECT user_id, event_id,
        |  epoch_us(ts) // 1000000 AS ts_sec, event_type,
        |  CAST(floor(value * 100) AS BIGINT) AS cents,
        |  ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) // 1000000 DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts_sec, event_id, event_type AS last_type, cents
        |FROM e WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "event_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(ts) // 1000000 AS ts_sec,
        |  CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |t AS (SELECT *, last_value(
        |    CASE WHEN event_type IN ('click', 'view') THEN event_type END
        |    IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attrib
        |  FROM e)
        |SELECT COALESCE(attrib, '(none)') AS attrib_type,
        |  COUNT(*) AS n_purchases, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
