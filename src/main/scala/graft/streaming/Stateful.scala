package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream operators over the Msg/event envelope: the streaming
  * counterparts of [[graft.operators.EventOps]]'s batch images.
  *
  * State is always keyed and bounded: `session_window` + watermark lets
  * Spark expire window state; the custom running-totals operator holds
  * one small struct per key.  Both survive failure via the checkpoint,
  * which is also the ack boundary (at-least-once end to end, effectively
  * once after [[graft.operators.EventOps.streamDedup]]'s keyed dedup).
  */
object Stateful {

  /** Native session windows (30-min gap) over a streaming event frame
    * with an event-time watermark; append mode emits each session once
    * it can no longer grow.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        unix_micros(col("session_window.end")).as("sess_end_us"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: purchases joined to clicks of the
    * same user within the preceding hour.  Watermarks on both sides
    * bound the join state (clicks older than purchase-watermark − 1h
    * are dropped) — the streaming image of the batch as-of/range join.
    */
  /** Stream-static dedup: pass through only the stream docs whose
    * normalized-text fingerprint is NOT in the static corpus relation —
    * the streaming twin of [[graft.operators.Dedup.dedupIncremental]]'s
    * exact pass, for continuous ingestion against an accumulated corpus
    * table.  A stream-static join re-reads the static side per
    * micro-batch plan (so a corpus UPDATED between batches is picked
    * up); expressed as left-outer + null filter, the join carries only
    * 16-byte fingerprints and the static side stays joinable at any
    * corpus size (broadcast below threshold, shuffled hash above).
    * In-stream duplicates of the SAME batch pass through here — chain
    * [[graft.operators.EventOps.streamDedup]]-style keyed dedup
    * upstream for effectively-once per fingerprint.
    *
    * `stream`: streaming (doc_id, text); `corpus`: static (doc_id,
    * text).  Returns the novel stream rows (doc_id, fp).
    */
  def dedupAgainstCorpus(stream: DataFrame, corpus: DataFrame): DataFrame = {
    def fp(df: DataFrame) = df.select(col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    fp(stream).join(
        fp(corpus).select(col("fp").as("c_fp")).distinct(),
        col("fp") === col("c_fp"), "left_outer")
      .filter(col("c_fp").isNull)
      .select(col("doc_id"), col("fp"))
  }

  /** Streaming volume-anomaly gate — the DEPLOYMENT form of
    * [[graft.operators.EventOps.spikeOver]]: the baseline (per-type
    * n/Σc/Σc² from [[graft.operators.EventOps.spikeStats]] over
    * HISTORY) is a static relation; the live stream's 1-day tumbling
    * counts join it stream-static and a day flags when its count
    * exceeds mean + z·σ.  Same fixed expression tree over integer
    * aggregates as the batch op, so a flagged (type, day) carries the
    * identical mean/z the batch audit would report (spec-pinned by
    * streaming-vs-batch parity on the same events).
    *
    * State shape: windowed count state is (types × open days) rows —
    * bounded by a caller watermark on `ts` in append deployments; the
    * static side re-plans per micro-batch, so a nightly-refreshed
    * baseline table is picked up without restarting the query.
    * Epoch-aligned 1-day windows make `window.start` ≡ the batch op's
    * `date_trunc('DAY')`.
    */
  def spikeMonitor(stream: DataFrame, stats: DataFrame,
      z: Double = 2.0): DataFrame = {
    val mean = col("sc").cast("double") / col("n")
    val vr = col("sc2").cast("double") / col("n") - mean * mean
    stream
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(stats), "event_type")
      .filter(vr > 0 && col("c").cast("double") > mean + lit(z) * sqrt(vr))
      .select(col("event_type"), col("window.start").as("day"),
        col("c").as("n_events"), mean.as("mean_daily"),
        ((col("c").cast("double") - mean) / sqrt(vr)).as("z"))
  }

  /** Streaming contamination gate — the DEPLOYMENT form of
    * [[graft.operators.Dedup.decontaminateBloom]]: a crawler/ingest
    * stream of (doc_id, text) is annotated IN-FLIGHT with the number
    * of its 5-gram shingles that might occur in the benchmark Bloom
    * sketch, so contaminated docs can be parked before they ever land
    * in the corpus.  The sketch is built batch-side from the test
    * relation (same `putBinary` UTF-8 contract) and rides the
    * stateless projection as an expression reference — no state
    * store, no watermark, works in append mode at ingest bandwidth;
    * refreshing the benchmark means restarting the query with a new
    * sketch (a Bloom cannot be updated stream-side without
    * rebuilding, and benchmark sets change at release cadence, not
    * per batch).  Same one-sided error as the batch op: a truly
    * contaminated doc always flags (n_hit ≥ exact); clean docs flag
    * at ≈ fpp per shingle.  Batch-vs-stream parity is spec-pinned.
    */
  def contaminationGate(stream: DataFrame,
      bf: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val sh = array_distinct(graft.functions.TextFunctions.shingles(col("text"), 5))
    stream
      .select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        graft.functions.BloomCountHits.bloomCountHits(col("sh"), bf)
          .cast("long").as("n_hit"))
  }

  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "70 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
  }

  case class SessState(start_us: Long, last_us: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, sess_start_us: Long, sess_end_us: Long,
      n_events: Long, sum_value: Double)

  /** Custom sessionization with EVENT-TIME TIMEOUT state — the
    * `flatMapGroupsWithState` ladder rung [[sessionAgg]]'s native
    * `session_window` cannot show: one open-session struct per user,
    * `state.setTimeoutTimestamp(last + gap)` arms expiry, and the
    * session is emitted either when a later event overshoots the gap
    * (closed in-stream) or when the WATERMARK passes the armed
    * timestamp (`state.hasTimedOut` — closed by time passing, no
    * further input needed).  State is removed on emit, so memory is
    * one struct per ACTIVE user, not per user ever seen.
    *
    * Ordering contract: under per-key event-time-ordered delivery
    * (frafka's per-partition guarantee, which the runtime's routing
    * preserves — see StreamingSpec's ordering spec) the emitted
    * sessions EQUAL the batch image [[graft.operators.EventOps
    * .winSession]]; the parity is spec-pinned on the real events
    * table.  Under bounded disorder the single-struct state degrades
    * gracefully rather than corrupting: a late event lands in the
    * open session when it is within the session's gap-extended span
    * (start − gap ≤ us, extending start downward if needed), and a
    * late event gap-separated BELOW the open session emits
    * immediately as its own closed 1-event session (the session it
    * might have extended was already emitted — the price of one
    * struct per user instead of session_window's open-session list).
    *
    * Input needs (user_id, ts, value) with a watermark already set on
    * ts (event-time timeout requires one).
    */
  def sessionizeWithTimeout(spark: SparkSession, events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000): Dataset[SessionOut] = {
    import spark.implicits._
    // the watermark COLUMN (ts) must survive into the stateful
    // operator's input schema — event-time timeout is rejected without
    // it; us is the exact-microsecond copy the session math uses
    val typed = events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, java.sql.Timestamp, Long, Double)], state: GroupState[SessState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start_us, s.last_us, s.n, s.sum))
          } else {
            // per-user per-batch sets are bounded; sort restores
            // event-time order within the batch
            // (us, value) sort: us alone would fold equal-timestamp
            // values in nondeterministic iterator order — the value
            // tie-break makes the float accumulation order (and so the
            // emitted sum) identical on every run and partitioning
            val sorted = batch.toSeq.sortBy(t => (t._3, t._4))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, _, us, v) =>
              cur match {
                case Some(s) if us >= s.start_us - gapUs && us - s.last_us <= gapUs =>
                  // in-order continuation, or a late event inside the
                  // session's gap-extended span (start may move down)
                  cur = Some(SessState(math.min(s.start_us, us),
                    math.max(s.last_us, us), s.n + 1, s.sum + v))
                case Some(s) if us > s.last_us =>
                  // in-order gap overshoot: close, start fresh
                  closed += SessionOut(user, s.start_us, s.last_us, s.n, s.sum)
                  cur = Some(SessState(us, us, 1L, v))
                case Some(_) =>
                  // late AND gap-separated below the open session: its
                  // own session ended long ago in event time — emit it
                  // closed, keep the open session untouched
                  closed += SessionOut(user, us, us, 1L, v)
                case None =>
                  cur = Some(SessState(us, us, 1L, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // arm event-time expiry: fires when the watermark passes
              // the session's gap boundary
              state.setTimeoutTimestamp((s.last_us + gapUs) / 1000)
            }
            closed.result().iterator
          }
      }
  }

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_msgs: Long, total_value: Double)

  case class TypedEvent(user_id: Long, event_type: String, us: Long, event_id: Long)
  case class LastType(event_type: String, us: Long)
  case class Transition(user_id: Long, prev_type: String, event_type: String)

  /** Streaming counterpart of [[graft.operators.EventOps.eventTransitions]]:
    * one `LastType` row of state per user carries the most recent event
    * type across micro-batch boundaries, and every arriving event emits
    * its (prev → next) pair.  Within a batch a user's rows are sorted by
    * (event time, event_id) before folding — the per-user-per-batch set
    * is bounded, and cross-batch order is the source's per-key delivery
    * order (frafka's per-partition contract).  Batch/stream parity is
    * spec-pinned.
    *
    * State TTL: the per-user struct is DROPPED once the event-time
    * watermark passes last-seen + ttl.  Without it this operator keeps
    * one struct per user EVER SEEN — on an unbounded-cardinality
    * stream (the 100 TB brief) that is a slow, certain leak.  Expiry
    * emits nothing (there is no next event to pair), and an event
    * arriving after its user's state expired starts a fresh chain, so
    * the one (prev → next) pair spanning an idle gap longer than ttl
    * is deliberately not produced; for every user whose idle gaps stay
    * under ttl the output equals the batch lag-window image
    * (spec-pinned).  Choose ttl ≫ any meaningful transition window.
    *
    * Input needs (user_id, event_type, ts, event_id) with a watermark
    * already set on ts (event-time timeout requires one).
    */
  def transitions(spark: SparkSession, events: DataFrame,
      ttlUs: Long = 7L * 86400 * 1000000): Dataset[Transition] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastType, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, String, java.sql.Timestamp, Long, Long)],
            state: GroupState[LastType]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // TTL expiry: drop the struct, emit nothing — the chain
            // simply ends
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e._4, e._5))
            var prev = state.getOption
            val out = Seq.newBuilder[Transition]
            sorted.foreach { e =>
              prev.foreach(p => out += Transition(user, p.event_type, e._2))
              prev = Some(LastType(e._2, e._4))
            }
            prev.foreach { p =>
              state.update(p)
              // arm expiry at last-seen + ttl; Spark rejects a timeout
              // at-or-below the current watermark, so clamp just above
              // it (the state is already expiry-due then — it goes on
              // the very next trigger)
              state.setTimeoutTimestamp(
                math.max(p.us / 1000 + ttlUs / 1000, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  case class LastTouch(touch_type: String, us: Long)
  case class CreditRow(user_id: Long, purchase_id: Long, attrib_type: String)

  /** Streaming last-touch attribution — the continuous twin of
    * [[graft.operators.Temporal.eventAttribution]]: each `purchase`
    * emits a credit row naming the user's most recent PRECEDING
    * `click`/`view` (or `(none)` for a first-event purchase), as the
    * purchase flows through — no end-of-day batch join, the marketing
    * ledger is live.  State per user is ONE small struct (the last
    * touch seen); in-batch events sort by (event-time MICROSECONDS,
    * event_id) — strictly FINER than the batch twin's (ts_sec,
    * event_id) frame, so on same-second events whose ids invert their
    * sub-second order the two can credit differently; the microsecond
    * order is the faithful one (the batch op's second granularity is
    * an artifact of its epoch-seconds lane), and the pinned parity is
    * against the microsecond-ordered batch image.
    *
    * TTL measures TOUCH AGE, enforced at credit time: a purchase
    * arriving more than ttl after the stored touch credits `(none)`
    * even when the user has been active in between (purchases do not
    * refresh a touch's lease).  The state timeout is armed from the
    * touch time alone, so expiry is exactly the moment the touch
    * stops being creditable — which is also what keeps state bounded
    * on an unbounded user stream.  Under-ttl users match the batch
    * ignoreNulls-carry image exactly (parity spec-pinned).
    *
    * Input needs (user_id, event_type, ts, event_id) with a watermark.
    */
  def attribution(spark: SparkSession, events: DataFrame,
      ttlUs: Long = 7L * 86400 * 1000000): Dataset[CreditRow] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastTouch, CreditRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, String, java.sql.Timestamp, Long, Long)],
            state: GroupState[LastTouch]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e._4, e._5))
            var prev = state.getOption
            val out = Seq.newBuilder[CreditRow]
            sorted.foreach { e =>
              if (e._2 == "purchase")
                // touch age enforced here, not just via state expiry:
                // a user purchasing at sub-ttl intervals keeps their
                // state alive across triggers, but a touch past its
                // ttl still must not be credited
                out += CreditRow(user, e._5,
                  prev.filter(p => e._4 - p.us <= ttlUs)
                    .map(_.touch_type).getOrElse("(none)"))
              if (e._2 == "click" || e._2 == "view")
                prev = Some(LastTouch(e._2, e._4))
            }
            prev match {
              case Some(p) =>
                state.update(p)
                // armed from the TOUCH time only — purchases must not
                // extend a touch's creditable lease; ceiling millis so
                // truncation can never expire state before the
                // microsecond-exact ttl enforced at credit time
                state.setTimeoutTimestamp(math.max(
                  (p.us + ttlUs + 999) / 1000,
                  state.getCurrentWatermarkMs() + 1))
              case None => // purchases only so far: nothing to carry
            }
            out.result().iterator
          }
      }
  }

  case class LastSeen(us: Long, event_id: Long)
  case class GapRow(user_id: Long, event_id: Long, gap_us: Long)

  /** Streaming inter-arrival gaps — the continuous twin of
    * [[graft.operators.Temporal.orderGaps]]'s LAG: per user, each
    * event after the chain's first emits its event-time gap to the
    * predecessor (Append mode; the cadence stream a churn/anomaly
    * consumer windows downstream).  In-batch events sort by
    * (event-time, event_id) — the same total order as the batch
    * window — and the chain continues across micro-batches through
    * ONE tiny struct per live user.
    *
    * Same TTL discipline as [[transitions]]: event-time timeout
    * retires idle users' state (unbounded key churn on a 100 TB
    * stream is otherwise a slow, certain leak); expiry emits nothing,
    * a post-expiry event starts a fresh chain, so the one gap
    * spanning an idle period longer than ttl is deliberately not
    * produced — for users whose idle gaps stay under ttl the output
    * equals the batch LAG image (parity spec-pinned).
    *
    * Input needs (user_id, ts, event_id) with a watermark on ts.
    */
  def interArrival(spark: SparkSession, events: DataFrame,
      ttlUs: Long = 7L * 86400 * 1000000): Dataset[GapRow] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastSeen, GapRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, java.sql.Timestamp, Long, Long)],
            state: GroupState[LastSeen]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e._3, e._4))
            var prev = state.getOption
            val out = Seq.newBuilder[GapRow]
            sorted.foreach { e =>
              prev.foreach(p => out += GapRow(user, e._4, e._3 - p.us))
              prev = Some(LastSeen(e._3, e._4))
            }
            prev.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp(
                math.max(p.us / 1000 + ttlUs / 1000, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  case class MadDay(day: Long, c: Long)
  case class MadState(open: Map[Long, Long], trail: Seq[MadDay],
      late_dropped: Long)
  case class MadRow(event_type: String, day: Long, n_events: Long,
      n_trail: Long, med: Double, mad: Double, score: Double,
      is_anomaly: Boolean)

  /** Streaming twin of [[graft.operators.Temporal.anomalyMad]]: the
    * live robust volume monitor.  Keyed by event_type, the state holds
    * the OPEN days' accumulating counts plus the trailing ≤ 7 finalized
    * (day, count) pairs; a day FINALIZES — scores against its trailing
    * ≤ 7-day median/MAD frame, emits once, joins the trail — when the
    * event-time watermark passes its end (the same completeness
    * contract as a windowed aggregate in Append mode).  Finalization
    * runs in day order inside one invocation, so a late-starting
    * trigger that retires several days at once replays exactly the
    * batch sequence; med/mad/score use the identical sorted-frame
    * two-middle arithmetic, so stream rows are bit-identical to the
    * batch image (parity spec-pinned, including warm-up rows never
    * flagging).
    *
    * Contributions arriving after their day finalized are COUNTED AND
    * DROPPED (`late_dropped` in state) — the watermark delay is the
    * lateness contract, exactly as Spark's own windowed aggregates
    * drop post-watermark rows.  Unlike [[transitions]] no TTL is
    * needed: the key domain is event_type (schema-bounded, not
    * user-cardinality), and the trail is capped at 7 entries by
    * construction; the event-time timeout is armed only to flush open
    * days through quiet periods.
    *
    * Input needs (event_type, ts) with a watermark on ts.
    */
  def madMonitor(spark: SparkSession, events: DataFrame): Dataset[MadRow] = {
    import spark.implicits._
    val dayUs = 86400000000L
    val typed = events
      .select(col("event_type"), col("ts"), unix_micros(col("ts")).as("us"))
      .as[(String, java.sql.Timestamp, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[MadState, MadRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (et: String, batch: Iterator[(String, java.sql.Timestamp, Long)],
            state: GroupState[MadState]) =>
          val st0 = state.getOption.getOrElse(MadState(Map.empty, Seq.empty, 0L))
          var open = st0.open
          var late = st0.late_dropped
          // trail is day-ascending; anything at-or-under its head day
          // has already been scored and emitted
          val lastFinal = st0.trail.lastOption.map(_.day)
          batch.foreach { case (_, _, us) =>
            val d = Math.floorDiv(us, dayUs)
            if (lastFinal.exists(d <= _)) late += 1
            else open += d -> (open.getOrElse(d, 0L) + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val due = open.keys.filter(d => (d + 1) * dayUs <= wmUs).toSeq.sorted
          var trail = st0.trail
          val out = Seq.newBuilder[MadRow]
          def midOf(s: Seq[Double]): Double =
            (s((s.size - 1) / 2) + s(s.size / 2)) / 2.0
          due.foreach { d =>
            val c = open(d); open -= d
            val frame = trail.collect {
              case t if t.day >= d - 7 && t.day <= d - 1 => t.c
            }
            if (frame.nonEmpty) {
              val med = midOf(frame.map(_.toDouble).sorted)
              val mad = midOf(frame.map(x => math.abs(x.toDouble - med)).sorted)
              val score = math.abs(c.toDouble - med) / (mad + 0.5)
              out += MadRow(et, d, c, frame.size.toLong, med, mad, score,
                score > 3.0 && frame.size >= 4)
            }
            // the NEXT day to finalize is > d, so its frame never
            // reaches below d - 6: evict, capping the trail at the 7
            // entries [d-6, d]
            trail = (trail :+ MadDay(d, c)).filter(_.day >= d - 6)
          }
          if (open.isEmpty && trail.isEmpty && late == 0L) state.remove()
          else {
            state.update(MadState(open, trail, late))
            // flush-through-quiet: wake when the earliest open day can
            // finalize (Spark rejects timeouts at-or-below the current
            // watermark — clamp just above; it fires next trigger)
            open.keys.minOption.foreach { d =>
              state.setTimeoutTimestamp(
                math.max((d + 1) * (dayUs / 1000L),
                  state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }

  case class UpsertState(ts_sec: Long, event_id: Long, event_type: String,
      cents: Long)
  case class UpsertRow(user_id: Long, ts_sec: Long, event_id: Long,
      last_type: String, cents: Long, deleted: Boolean)

  /** Streaming CDC compaction — the continuous twin of
    * [[graft.operators.Temporal.cdcUpsert]]: per key the newest record
    * by (ts_sec, event_id) wins, a newest record of type `error` is a
    * tombstone, and every micro-batch emits the keys whose winner
    * CHANGED (Update mode), with `deleted = true` on tombstone wins —
    * exactly what a downstream sink needs to maintain the snapshot
    * incrementally.
    *
    * Late/stale data: an arriving record OLDER than the held winner
    * (by the same total order the batch argmax uses) changes nothing
    * and emits nothing — replaying a batch is idempotent.  The LAST
    * emission per key therefore always equals the batch `max_by`
    * image over everything ingested so far (parity spec-pinned).
    *
    * State: ONE small struct per live key — the snapshot itself is the
    * state, so memory is O(|keys|), the same bound any compacted topic
    * carries.  No timeout: a key's winner stays authoritative until a
    * newer record or tombstone replaces it (tombstoned keys keep the
    * tombstone so late pre-tombstone records cannot resurrect them;
    * retire them with an event-time TTL if |keys| itself churns).
    *
    * Input needs (user_id, event_id, ts, event_type, value).
    */
  def upsert(spark: SparkSession, events: DataFrame): Dataset[UpsertRow] = {
    import spark.implicits._
    def wins(a: UpsertState, b: UpsertState): UpsertState =
      if (a.ts_sec > b.ts_sec ||
        (a.ts_sec == b.ts_sec && a.event_id >= b.event_id)) a else b
    val typed = events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"),
        floor(col("value") * lit(100)).cast("long").as("cents"))
      .as[(Long, Long, Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[UpsertState, UpsertRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, Long, Long, String, Long)],
            state: GroupState[UpsertState]) =>
          val cand = batch.map { case (_, id, us, typ, cents) =>
            UpsertState(us / 1000000, id, typ, cents)
          }.reduceOption(wins)
          val held = state.getOption
          val next = (held ++ cand).reduceOption(wins)
          next match {
            case Some(w) if !held.contains(w) =>
              state.update(w)
              Iterator.single(UpsertRow(user, w.ts_sec, w.event_id,
                w.event_type, w.cents, w.event_type == "error"))
            case _ => Iterator.empty
          }
      }
  }

  case class SSPacked(terms: Array[String], est: Array[Long], err: Array[Long])
  case class TrendRow(source: String, term: String, est: Long, err: Long)

  /** Streaming heavy-hitter monitor: per-source trending terms via a
    * Space-Saving summary held as keyed state — the
    * [[graft.functions.SpaceSaving]] kernel (same update/merge/top as
    * the batch `space_saving` aggregate, so the `est − err ≤ true ≤
    * est` envelope holds over EVERYTHING ingested since the query
    * started) deployed behind `flatMapGroupsWithState`.  Each batch a
    * source saw data, its current top-`k` is re-emitted (Update
    * mode); sources never mix.  State: ≤ `capacity` counters per
    * source — the bounded-memory property is exactly why a sketch,
    * not an exact count, is what a long-running monitor can hold.
    *
    * Input needs (source, term) — pre-exploded tokens.
    */
  def trendingTerms(spark: SparkSession, stream: DataFrame,
      capacity: Int = 256, k: Int = 10): Dataset[TrendRow] = {
    import spark.implicits._
    import graft.functions.SpaceSaving
    stream.select(col("source"), col("term")).as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SSPacked, TrendRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[(String, String)],
            state: GroupState[SSPacked]) =>
          val m = state.getOption.map { p =>
            val h = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
            var i = 0
            while (i < p.terms.length) { h(p.terms(i)) = (p.est(i), p.err(i)); i += 1 }
            h
          }.getOrElse(scala.collection.mutable.HashMap.empty[String, (Long, Long)])
          var any = false
          batch.foreach { case (_, t) =>
            if (t != null) { SpaceSaving.update(m, t, capacity); any = true }
          }
          if (!any) Iterator.empty
          else {
            val packed = m.toArray.sortBy(_._1)
            state.update(SSPacked(packed.map(_._1),
              packed.map(_._2._1), packed.map(_._2._2)))
            SpaceSaving.top(m, k).iterator
              .map { case (t, c, e) => TrendRow(source, t, c, e) }
          }
      }
  }

  case class StateOpMetrics(query_name: String, query_id: String,
      batch_id: Long, operator: String, n_rows_total: Long,
      n_rows_updated: Long, n_rows_removed: Long, memory_used_bytes: Long,
      n_shuffle_partitions: Long)

  /** Per-stateful-operator state-store metrics as a queryable DataFrame
    * — the ops-visibility surface a pipeline operator reaches for FIRST
    * in production ("is session state growing without bound? did the
    * TTL actually remove rows?").  One row per state operator per
    * query, read from each query's `lastProgress` (the engine's own
    * per-micro-batch accounting — rows total/updated/removed and state
    * memory straight from the state store, no extra instrumentation
    * cost).  Queries with no progress yet (or no stateful operator)
    * contribute no rows.
    *
    * This is DRIVER-side metadata (a handful of rows per query), built
    * with `createDataFrame` — monitoring scale is O(queries ×
    * operators), never O(data).  Join against an alerting rule table
    * or write to a metrics sink on a schedule; for history over recent
    * batches use [[stateMetricsHistory]].
    */
  def stateMetrics(spark: SparkSession,
      queries: Seq[org.apache.spark.sql.streaming.StreamingQuery]): DataFrame = {
    import spark.implicits._
    queries.flatMap { q =>
      Option(q.lastProgress).toSeq.flatMap(p => progressRows(q, p))
    }.toDF()
  }

  /** [[stateMetrics]] over each query's full `recentProgress` window
    * (spark.sql.streaming.numRecentProgressUpdates batches, default
    * 100) — the growth-TREND view: state rows per operator per batch,
    * so "n_rows_total is monotonically climbing" is one window
    * expression away.
    */
  def stateMetricsHistory(spark: SparkSession,
      queries: Seq[org.apache.spark.sql.streaming.StreamingQuery]): DataFrame = {
    import spark.implicits._
    queries.flatMap(q => q.recentProgress.toSeq.flatMap(p => progressRows(q, p))).toDF()
  }

  private def progressRows(q: org.apache.spark.sql.streaming.StreamingQuery,
      p: org.apache.spark.sql.streaming.StreamingQueryProgress): Seq[StateOpMetrics] =
    p.stateOperators.toSeq.map { so =>
      StateOpMetrics(
        Option(q.name).getOrElse(""), q.id.toString, p.batchId,
        so.operatorName, so.numRowsTotal, so.numRowsUpdated,
        so.numRowsRemoved, so.memoryUsedBytes, so.numShufflePartitions)
    }

  /** Custom keyed state via `flatMapGroupsWithState`: running per-user
    * totals, emitted on every update (Update mode).  The state per key
    * is one `UserTotals` — constant memory regardless of stream length.
    */
  def runningTotals(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          var cur = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          batch.foreach { e =>
            cur = UserTotals(user, cur.n_msgs + 1, cur.total_value + e.value)
          }
          state.update(cur)
          Iterator.single(cur)
      }
  }

  case class DqCount(rule: String, checked: Long, violations: Long)

  /** Streaming data-quality monitor — the live twin of
    * [[graft.operators.Analytics.dqChecks]]'s row-local tier: each
    * rule is a (name, violation-predicate) pair evaluated INSIDE the
    * micro-batch scan (one projection, no per-rule pass — the batch
    * op's shared-scan design carried to the stream), and the keyed
    * state accumulates one (checked, violations) counter pair per
    * rule, emitting the CUMULATIVE totals for every rule the epoch
    * TOUCHED (Update mode: a rule with no rows in a micro-batch
    * produces no partial, so its stateful function is not invoked and
    * it emits nothing that epoch — its counters are simply unchanged;
    * consumers wanting one row per rule per epoch keep the last seen
    * value per key, the standard Update-mode contract).
    * Stream-final totals over any batch split equal the batch
    * predicate counts over the same rows — counting is additive, so
    * parity is exact regardless of micro-batch boundaries
    * (spec-pinned).
    *
    * Only ROW-LOCAL checks belong here: cross-table FK checks on a
    * stream are anti-joins whose verdicts can RESOLVE later (a
    * lineitem arriving before its order is not yet a violation) —
    * that shape lives in [[fkMonitor]], whose per-key state owns the
    * resolution semantics a cumulative counter cannot.
    *
    * Scale shape: `groupByKey` on a |rules|-cardinality key would
    * funnel EVERY row of a rule through one task, so the counters
    * pre-reduce per INPUT PARTITION first (a stateless
    * `mapPartitions` — the map-side combine Spark's typed stateful
    * path doesn't do for you): the per-rule stateful task then
    * receives ≤ numPartitions (rule, checked, violations) partials
    * per epoch, never the row stream.  State: |rules| keys × one
    * 16-byte pair — constant regardless of stream length; null
    * predicate results count as violations (a rule that cannot
    * evaluate is a data problem, not a pass).
    */
  def dqMonitor(spark: SparkSession, events: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): Dataset[DqCount] = {
    import spark.implicits._
    require(rules.nonEmpty, "dqMonitor: empty rule set")
    val flagged = events.select(explode(array(rules.map { case (n, p) =>
      struct(lit(n).as("rule"),
        coalesce(p.cast("boolean"), lit(true)).as("viol"))
    }: _*)).as("r")).select(col("r.rule"), col("r.viol")).as[(String, Boolean)]
    val partials = flagged.mapPartitions { it =>
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      it.foreach { case (r, v) =>
        val (c, x) = acc.getOrElse(r, (0L, 0L))
        acc(r) = (c + 1, if (v) x + 1 else x)
      }
      acc.iterator.map { case (r, (c, x)) => (r, c, x) }
    }
    partials.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), DqCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (rule: String, batch: Iterator[(String, Long, Long)],
            state: GroupState[(Long, Long)]) =>
          var (checked, viol) = state.getOption.getOrElse((0L, 0L))
          batch.foreach { case (_, c, v) =>
            checked += c; viol += v
          }
          state.update((checked, viol))
          Iterator.single(DqCount(rule, checked, viol))
      }
  }

  /** The default rule set for the events envelope — the checks a feed
    * owner alerts on: non-negative value, known event type, non-empty
    * props payload.
    */
  def eventDqRules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "value_nonneg" -> (col("value") < 0),
    "type_known" -> !col("event_type").isin(
      "click", "view", "purchase", "signup", "error"),
    "props_present" -> (col("props").isNull || length(col("props")) === 0))

  case class FkRow(fk_key: Long, children_seen: Long, parent_seen: Boolean,
      orphans: Long)

  /** Streaming twin of [[graft.operators.Analytics.dqChecks]]'s
    * CROSS-TABLE tier — the FK shape [[dqMonitor]] deliberately
    * excludes, because its verdicts are not additive counters: a child
    * arriving before its parent is an orphan NOW that RESOLVES when
    * the parent lands (out-of-order arrival across two feeds is the
    * normal case, not the exception).  Keyed by the join key, the
    * state is one (children_seen, parent_seen) pair; every epoch that
    * touches a key re-emits that key's CURRENT verdict
    * ([[FkRow]]: orphans = children_seen while no parent has
    * appeared, dropping to 0 the epoch the parent arrives — the
    * resolution event a consumer alerts off, Update-mode semantics as
    * in [[dqMonitor]]).  Matching is pure EXISTENCE, so within-epoch
    * order is irrelevant and stream-final state over any batch split
    * equals the batch left-join verdict on the same rows: Σ orphans
    * over final per-key rows = the batch op's `fk_*` violation count
    * — parity spec-pinned against [[graft.operators.Analytics
    * .dqChecks]] on the same order star.
    *
    * Scale shape: the key domain is the FK domain, so state SHARDS
    * across it (no |rules|-style funnel) at one ~20-byte struct per
    * key ever seen — the same state floor as an unwatermarked
    * stream-stream join, which is what exact FK monitoring IS; a
    * production deployment bounds it by declaring never-parented keys
    * final past a lateness horizon (event-time timeout), the
    * [[sessionizeWithTimeout]] machinery.  A HOT key (one parent with
    * millions of children) would funnel its child rows through one
    * stateful task, so the counts pre-reduce per input partition
    * first (the [[dqMonitor]] map-side-combine discipline): the keyed
    * task sees a bounded number of partials per key per epoch, never
    * the row stream.
    *
    * The pre-reduce map itself is BOUNDED at
    * [[FkPartialMaxKeysDefault]] entries (override:
    * `spark.graft.fk.partialMaxKeys`): unlike [[dqMonitor]], whose
    * key domain is |rules|, this map's domain is the DISTINCT PARENT
    * KEYS seen by one input partition — unbounded on the
    * backfill/AvailableNow epoch that replays history through few
    * partitions, and a hand-rolled map cannot spill the way Spark's
    * own hash aggregation can.  At the cap the accumulated partials
    * FLUSH downstream and the map clears; the keyed reducer SUMS
    * child counts and ORs parent presence, so multiple partials per
    * key per partition are correctness-neutral (spec-pinned), and
    * executor memory for the pre-reduce is O(cap), never O(distinct
    * keys in the epoch).
    *
    * `children` and `parents` are streaming frames each exposing the
    * join key as a long column `key` (project before calling);
    * `parents` may also be a BATCH frame for the stream-static case —
    * the union then requires both sides streaming, so the static
    * parent set is handled by the caller turning it into a one-batch
    * stream (the StreamingSpec fixture idiom).
    */
  /** Entry cap on [[fkMonitor]]'s per-partition pre-reduce map — at
    * ~48 bytes/entry this bounds the hand-rolled (unspillable)
    * accumulator near 100 MB per task.  Flush-on-cap, not a hard
    * error: partials are additive, so the only cost of a full map is
    * extra partial rows, never a wrong count.
    */
  private[graft] val FkPartialMaxKeysDefault: Int = 1 << 21

  private[graft] def fkPartialMaxKeys(s: SparkSession): Int =
    s.conf.get("spark.graft.fk.partialMaxKeys",
      FkPartialMaxKeysDefault.toString).toInt

  def fkMonitor(spark: SparkSession, children: DataFrame,
      parents: DataFrame): Dataset[FkRow] = {
    import spark.implicits._
    val tagged = children.select(col("key").cast("long").as("key"),
        lit(false).as("is_parent"))
      .unionByName(parents.select(col("key").cast("long").as("key"),
        lit(true).as("is_parent")))
      .as[(Long, Boolean)]
    // per-partition pre-reduce: (key, child rows, parent present) —
    // FLUSHED and cleared whenever the map reaches maxKeys entries
    // (the knnDeltaBroadcastBytes budget idiom: bound the accepted
    // worst-case input, don't trust the caller's epoch sizing), so a
    // backfill epoch with tens of millions of distinct keys through
    // one partition costs extra partials, not an executor OOM
    val maxKeys = fkPartialMaxKeys(spark)
    val partials = tagged.mapPartitions { it =>
      new Iterator[(Long, Long, Boolean)] {
        private val acc = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
        private var out: Iterator[(Long, Long, Boolean)] = Iterator.empty
        private def refill(): Unit =
          while (!out.hasNext && it.hasNext) {
            // consume at least one element per flush round, so even a
            // degenerate cap can never spin without progress
            var go = true
            while (go) {
              val (k, isP) = it.next()
              val (c, p) = acc.getOrElse(k, (0L, false))
              acc(k) = (if (isP) c else c + 1, p || isP)
              go = it.hasNext && acc.size < maxKeys
            }
            out = acc.toArray.iterator.map { case (k, (c, p)) => (k, c, p) }
            acc.clear()
          }
        def hasNext: Boolean = { refill(); out.hasNext }
        def next(): (Long, Long, Boolean) = { refill(); out.next() }
      }
    }
    partials.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Boolean), FkRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[(Long, Long, Boolean)],
            state: GroupState[(Long, Boolean)]) =>
          var (children, parentSeen) = state.getOption.getOrElse((0L, false))
          batch.foreach { case (_, c, p) =>
            children += c; parentSeen ||= p
          }
          state.update((children, parentSeen))
          Iterator.single(FkRow(key, children,
            parentSeen, if (parentSeen) 0L else children))
      }
  }
}
