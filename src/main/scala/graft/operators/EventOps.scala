package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions._
import graft.sources.Tables

/** Batch images of the frafka/frizzle messaging surface plus event-time
  * analytics over the `events` stream table.
  *
  * Reference semantics (public qntfy/frizzle + qntfy/frafka API docs):
  * `Msg{ID,Original,Data}` envelopes, `Sink.Send(msg, dest)` routing,
  * transform-with-failure → dead-letter sink, at-least-once →
  * effectively-once dedup.  The streaming runtime equivalents live in
  * [[graft.streaming]]; these batch plan-builders express the identical
  * transformations so the DuckDB oracle can check them, and every one of
  * them runs unchanged under `readStream` (groupBy window / dropDuplicates
  * / stateful session images).
  *
  * Scale notes: all aggregations key on bounded-cardinality keys
  * (type, user, window) and combine map-side; the session/as-of windows
  * shuffle once on user_id — at 100 TB that is one hash partitioning of
  * the fact table, with AQE handling user skew.
  */
object EventOps {
  private val D182 = "decimal(18,2)"

  /** Msg-envelope ingest: the batch image of `Source.Receive()`. */
  def msgIngest(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id").cast("string").as("msg_id"),
      col("user_id").cast("string").as("routing_key"),
      length(encode(col("props"), "UTF-8")).cast("long").as("payload_bytes"),
      epochSec(col("ts")).as("ts_sec"))
      .orderBy(col("ts_sec"), col("msg_id"))

  /** Writer schema for the Avro payload round trip — the scalar-record
    * shape a frizzle `Msg.Data()` actually carries (see
    * [[graft.sources.AvroCodec]] for scope and wire format).
    */
  private[graft] val EventAvroSchema =
    """{"type":"record","name":"Event","namespace":"graft","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"},
      |{"name":"props","type":["null","string"],"default":null}]}""".stripMargin

  /** Structured payload decode: events serialized to single-record Avro
    * binary (the Kafka-value wire shape) and decoded back through
    * [[graft.sources.AvroCodec]], then aggregated per type — the batch
    * image of "consume `Data()`, decode against the registry schema,
    * route on a decoded field".  The encode→decode round trip is the
    * identity on the record fields, so every output scalar is
    * recomputable by the oracle STRAIGHT from the events table — a
    * hash mismatch here means the codec corrupted a value in flight.
    * Both codec passes pipeline with the scan (no shuffle until the
    * final small aggregate); at 100 TB the cost is two partition-local
    * codec passes, which is what a real consume-decode path pays once.
    */
  def msgDecodeAvro(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
    // full registry wire image (round 12): body framed in the Confluent
    // envelope (magic 0x00 + big-endian schema id), decoded through the
    // id→writer-schema registry snapshot resolved against the reader
    // schema.  The frame is deterministic bytes, so the round trip
    // stays the identity and the oracle is unchanged.
    val wire = graft.sources.AvroCodec.frameConfluent(
      graft.sources.AvroCodec.toAvro(ev, EventAvroSchema), schemaId = 7)
    val dec = graft.sources.AvroCodec.fromFramedAvro(
      wire, EventAvroSchema, Map(7 -> EventAvroSchema))
    decodedTypeProfile(dec, col("event_type"))
  }

  /** The shared per-type profile of a decoded message stream — one
    * aggregate list serving BOTH wire formats ([[msgDecodeAvro]],
    * [[msgDecodeJson]]) so the two decode contracts cannot silently
    * fork: the columns are the oracle shape, and any change lands on
    * both queries at once.
    */
  private def decodedTypeProfile(dec: DataFrame,
      groupKey: org.apache.spark.sql.Column): DataFrame =
    dec.groupBy(groupKey.as("event_type"))
      .agg(count(lit(1)).as("n_msgs"),
        sum(col("value").cast(D182)).cast("double").as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        sum(length(col("props")).cast("long")).as("sum_props_chars"))
      .orderBy(col("event_type"))

  /** Reader schema for the JSON/CSV payload round trips — the same record
    * shape as [[EventAvroSchema]], declared explicitly (a consumer never
    * infers the schema of a production topic; inference samples the
    * corpus and can silently widen types between runs).
    */
  private[graft] val EventRecordSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** Structured JSON payload decode with a dead-letter branch: events
    * serialized to single-record JSON text (the other common Kafka-value
    * wire shape next to Avro, see [[msgDecodeAvro]]) with ~1 % of
    * payloads deterministically garbled in flight (a non-JSON prefix —
    * the torn-write image), then decoded via `from_json` against the
    * explicit [[EventRecordSchema]] in PERMISSIVE mode and aggregated per
    * decoded type.  Undecodable payloads yield a null record and land in
    * the `_undecodable` group — the batch image of "consume `Data()`,
    * decode, route failures to the DLQ" without a second pass over the
    * topic.  Encode→decode is the identity on the record fields
    * (Jackson's shortest-round-trip double formatting included) and the
    * corruption predicate is deterministic, so the oracle recomputes
    * every output scalar straight from the events table.  Both codec
    * passes are narrow and pipeline with the scan; the only shuffle is
    * the final bounded-cardinality aggregate — at 100 TB this is the
    * one-pass consume-decode cost a real pipeline pays.
    */
  def msgDecodeJson(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
    val wire = ev.select(col("event_id").as("wire_id"),
        to_json(struct(ev.columns.map(col): _*)).as("wire"))
      .withColumn("wire",
        when(col("wire_id") % 97 === 0, concat(lit("corrupt :"), col("wire")))
          .otherwise(col("wire")))
    val dec = wire
      // mode pinned explicitly: the whole-record-null-on-corrupt
      // contract (and its oracle) depends on PERMISSIVE, which must
      // not be inherited from a mutable engine default
      .select(from_json(col("wire"), EventRecordSchema,
        Map("mode" -> "PERMISSIVE")).as("m"))
      .select(col("m.event_id").as("event_id"), col("m.event_type").as("event_type"),
        col("m.value").as("value"), col("m.props").as("props"))
    // decode failure is keyed on event_id — the source PK that every
    // wire record carries non-null — NOT on event_type: a decodABLE
    // payload whose type happens to be null must stay out of the DLQ
    // group (and groups under null, exactly as the oracle's CASE does)
    decodedTypeProfile(dec,
      when(col("event_id").isNull, lit("_undecodable")).otherwise(col("event_type")))
  }

  /** Structured CSV payload decode — the third Kafka wire format next
    * to Avro/JSON ([[msgDecodeAvro]], [[msgDecodeJson]]), sharing their
    * schema, corruption predicate and [[decodedTypeProfile]] output
    * contract.  The semantic CONTRAST with JSON is deliberate and
    * spec-pinned: CSV corruption is FIELD-LOCAL — the garbled prefix
    * breaks only the first field's long parse, and PERMISSIVE mode
    * keeps the fields that still tokenize — so the `_undecodable`
    * group (keyed on the failed PK) retains non-null value/props
    * aggregates, where one bad byte in JSON voids the whole record.
    * The oracle replays exactly that: corrupt rows null only `id`.
    * Same plan shape as the twins: narrow codec passes over one scan,
    * one bounded-key exchange.
    */
  def msgDecodeCsv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
    val wire = ev.select(col("event_id").as("wire_id"),
        to_csv(struct(ev.columns.map(col): _*)).as("wire"))
      .withColumn("wire",
        when(col("wire_id") % 97 === 0, concat(lit("corrupt :"), col("wire")))
          .otherwise(col("wire")))
    val dec = wire
      // mode pinned explicitly: field-local partial results (corrupt
      // rows null only the field that failed to parse) are PERMISSIVE
      // semantics — the decode contract must live in code, not in an
      // inheritable engine default
      .select(from_csv(col("wire"), EventRecordSchema,
        Map("mode" -> "PERMISSIVE")).as("m"))
      .select(col("m.event_id").as("event_id"), col("m.event_type").as("event_type"),
        col("m.value").as("value"), col("m.props").as("props"))
    decodedTypeProfile(dec,
      when(col("event_id").isNull, lit("_undecodable")).otherwise(col("event_type")))
  }

  /** proto3 wire schema for the payload round trip — same record shape
    * as [[EventAvroSchema]], expressed as field numbers + wire types
    * (names never hit a proto wire; see [[graft.sources.ProtoCodec]]).
    */
  private[graft] val EventProtoSchema =
    "1:event_id:int64,2:user_id:int64,3:event_type:string,4:value:double,5:props:string"

  /** Structured protobuf payload decode — the FOURTH wire format, and
    * the one whose corruption story is the deliberate inversion of the
    * other three: proto3 has no record syntax to break.  A payload
    * truncated at a field boundary (the torn-write image — here
    * deterministically after field 3, so fields 4/5 are lost in
    * flight) still decodes CLEANLY, with the missing fields at their
    * proto3 defaults (value 0.0, props "") — silent partial data, no
    * `_undecodable` group possible, nothing to key a DLQ on.  Where
    * Avro throws, JSON voids the record, and CSV nulls the torn field,
    * proto reports nothing: detection must be SEMANTIC (the streaming
    * twin routes these rows to the DLQ via the business-validity gate
    * on the decoded value, not via a decode failure).  The truncation
    * boundary and the defaults are deterministic, so the oracle
    * replays every aggregate straight from the events table.  Same
    * plan shape as the other three: two narrow codec passes pipelined
    * with the scan, one bounded-key exchange.
    */
  def msgDecodeProto(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("wire_id", col("event_id"))
    // full registry wire image (the msg_decode_avro symmetry): body
    // framed in the Confluent proto envelope (magic + BE schema id +
    // message-indexes short form = 6 deterministic bytes), torn AFTER
    // framing — the truncation boundary shifts by the header length,
    // the torn payload still parses as a frame, and the silent-default
    // decode contract (and its oracle) is unchanged
    val wire = graft.sources.ProtoCodec.frameConfluent(
      graft.sources.ProtoCodec.toProto(ev, EventProtoSchema,
        keep = Seq("wire_id"), markAfterField = 3), schemaId = 11)
    val torn = wire.withColumn("proto_payload",
      when(col("wire_id") % 97 === 0,
        expr("substring(proto_payload, 1, wire_mark + 6)"))
        .otherwise(col("proto_payload")))
    val dec = graft.sources.ProtoCodec.fromFramedProto(
      torn, EventProtoSchema, knownIds = Set(11))
    decodedTypeProfile(dec, col("event_type"))
  }

  /** Wire schema for the oneof/map decode tier: a `contact` oneof
    * (email XOR phone — the classic either-or payload field) and a
    * message-valued map (`attrs`) — the round-15 proto surface,
    * driven through the oracle gate.
    */
  private[graft] val OneofProtoSchema =
    "1:event_id:int64,2:user_id:int64,3:event_type:string," +
      "6:email:string@contact,7:phone:sint64@contact," +
      "8:attrs:map<string,{1:v:int64;2:s:string}>"

  /** ONEOF + message-map decode through the full wire round trip — the
    * proto3 semantics the scalar tier cannot show, each pinned by an
    * exact-integer aggregate the oracle recomputes straight from the
    * events table: EXPLICIT PRESENCE (clicks/views set `email`,
    * purchases/signups set `phone`, errors set NEITHER — and every
    * 11th email is set to the EMPTY STRING, which a plain proto3
    * string field would elide into absence but a set oneof member
    * serializes, so `n_email` counts it while `sum_email_len` adds 0
    * — the presence-at-default contract, gate-checked), NULL decode
    * for the unset members (count() skips them on both engines),
    * zigzag on a negative oneof sint (`phone` = −user_id), and the
    * message-valued map entry round-tripping its struct (summed via
    * element_at).  Same plan shape as the other decode tiers: two
    * narrow codec passes pipelined with the scan, one bounded-key
    * exchange.
    */
  def msgDecodeOneof(s: SparkSession, dir: String): DataFrame = {
    val isEmail = col("event_type").isin("click", "view")
    val isPhone = col("event_type").isin("purchase", "signup")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("email", when(isEmail,
        when(col("user_id") % 11 === 0, lit(""))
          .otherwise(concat(lit("u"), col("user_id").cast("string"), lit("@ex.com")))))
      .withColumn("phone", when(isPhone, -col("user_id")))
      .withColumn("attrs", map(lit("k"),
        struct((col("user_id") % 100).as("v"), col("event_type").as("s"))))
    val dec = graft.sources.ProtoCodec.fromProto(
      graft.sources.ProtoCodec.toProto(ev, OneofProtoSchema), OneofProtoSchema)
    dec.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      count(col("email")).as("n_email"),
      count(col("phone")).as("n_phone"),
      sum(length(col("email"))).as("sum_email_len"),
      sum(col("phone")).as("sum_phone"),
      sum(element_at(col("attrs"), "k").getField("v")).as("map_v_sum"))
      .orderBy(col("event_type"))
  }

  /** Destination routing (`Sink.Send(msg, dest)`): stable topic mapping
    * from the event type, aggregated per destination.
    */
  def msgRoute(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(concat(lit("events."), col("event_type")).as("dest"))
      // exact decimal sum, then one correctly-rounded cast at the
      // presentation boundary (identical decimals → identical doubles
      // on every engine; decimal parquet output is formatting-unstable)
      .agg(count(lit(1)).as("n_msgs"), sum(col("value").cast(D182)).cast("double").as("sum_value"))
      .orderBy(col("dest"))

  /** Transform with failure branch: messages that fail business
    * validation route to the dead-letter branch (frizzle `Fail`), the
    * rest to main.  Pure narrow ops before one small aggregate.
    */
  def deadLetterSplit(s: SparkSession, dir: String): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\": (-?\\d+)", 1).cast("long")
    Tables.events(s, dir)
      .withColumn("branch", when(k % 13 === 0 || col("value") < 1.0, "dlq").otherwise("main"))
      .groupBy(col("branch"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(D182)).cast("double").as("sum_value"))
      .orderBy(col("branch"), col("event_type"))
  }

  /** At-least-once → effectively-once: keep the first event per
    * (user, type) — the batch image of streaming `dropDuplicates`
    * within watermark.  Total tie-break (ts, event_id).
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochSec(col("ts")).as("ts_sec"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** 5-minute tumbling windows per type (native `window()` — identical
    * expression under readStream with a watermark).
    */
  def winTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts").cast("timestamp"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(D182)).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** 10-minute windows sliding by 5: each event lands in exactly two
    * windows; Spark expands map-side before the aggregate.
    */
  def winSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts").cast("timestamp"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(D182)).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** 30-minute-gap sessionization per user (batch image of
    * `session_window`): lag → new-session flag → running session id →
    * per-session aggregate.  One shuffle on user_id; microsecond
    * arithmetic keeps the gap test exact across engines.
    */
  def winSession(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("us"), col("value"))
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("nf", when(col("prev").isNull || col("us") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("nf")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min(col("us")).as("sess_start_us"),
        max(col("us")).as("sess_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(D182)).cast("double").as("sum_value"))
      .select(col("user_id"), col("sess_start_us"), col("sess_end_us"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }

  /** Per-user event-type pivot as conditional aggregation: one pass,
    * map-side combine, no pivot-materialized shuffle.
    */
  def eventPivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val counts = types.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t"))
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(counts.head, counts.tail :+ sum(col("value").cast(D182)).cast("double").as("sum_value"): _*)
      .orderBy(col("user_id"))
  }

  /** As-of join: each purchase matched to the latest prior (or
    * simultaneous) click of the same user.
    *
    * Implemented as the scalable union-marker sort-merge: union both
    * sides, one shuffle on user_id, sort by time within partition,
    * propagate the last click with `last(ignoreNulls)` — no row
    * explosion, no per-event probe.  (DuckDB oracle: native ASOF JOIN.)
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), epochUs(col("ts")).as("us"), col("event_id"), col("event_type"))
      .withColumn("is_p", when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("c_id", when(col("is_p") === 0, col("event_id")))
      .withColumn("c_us", when(col("is_p") === 0, col("us")))
    // clicks sort before purchases at equal timestamps → "<=" semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prior_click_id", last(col("c_id"), ignoreNulls = true).over(w))
      .withColumn("prior_click_us", last(col("c_us"), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us").as("p_us"),
        col("prior_click_id"), (col("us") - col("prior_click_us")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Time-band range join: each purchase joined to ALL clicks of the
    * same user in the preceding hour, aggregated per purchase — the
    * batch image of the stream-stream interval join
    * ([[graft.streaming.Stateful.purchaseClickJoin]]).  The equi half
    * of the predicate (user_id) keys the shuffle; the time band is a
    * post-join filter inside the sort-merge — at 100 TB this is one
    * hash partitioning of each side, never a cross product.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), epochUs(col("ts")).as("us"))
    val p = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("us").as("p_us"))
    val c = base.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("us").as("c_us"))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_us") <= col("p_us") && col("c_us") >= col("p_us") - lit(3600L * 1000000L))
      .groupBy(col("purchase_id"), col("p_user").as("user_id"), col("p_us"))
      .agg(count(lit(1)).as("n_clicks_1h"), max(col("c_us")).as("last_click_us"))
      .orderBy(col("purchase_id"))
  }

  /** Deterministic stratified sampling — the training-data downsampling
    * primitive.  Per-stratum keep rates are applied as a hash threshold
    * (first 16 bits of md5 of the key vs a per-type cutoff): pure
    * scan-filter, NO shuffle, and the sample is reproducible on any
    * engine and any partitioning — at 100 TB this runs at input
    * bandwidth, unlike exact-count-per-stratum sampling which needs a
    * per-stratum ranking shuffle.  Rates: purchase/signup 100%,
    * error ~50%, click ~25%, view ~12.5%.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("event_id").cast("string")), 1, 4)
    val cutoff = when(col("event_type").isin("purchase", "signup"), lit("ffff"))
      .when(col("event_type") === "error", lit("7fff"))
      .when(col("event_type") === "click", lit("3fff"))
      .otherwise(lit("1fff"))
    Tables.events(s, dir)
      .filter(h <= cutoff)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Conversion funnel: users progressing view → click → purchase in
    * strict event-time order (each stage's first qualifying event must
    * follow the previous stage's).  Three type-filtered scans (the
    * filter pushes to the parquet scan), each stage a user-keyed
    * aggregate joined to the previous stage's (strictly shrinking)
    * per-user frame — the ordered-sequence analytics shape, with no
    * per-user event collection and state bounded at one row per user
    * per stage.  Comparisons run on exact microsecond epochs, so both
    * engines resolve boundaries identically.
    */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), epochUs(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users")).select(lit("2_click").as("stage"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users")).select(lit("3_purchase").as("stage"), col("n_users")))
      .orderBy(col("stage"))
  }

  /** Deadline-bounded funnel: [[eventFunnel]] with each step required
    * WITHIN a conversion window of the previous step — reported at
    * 1/3/7 days side by side, the operating curve behind "7-day
    * conversion" dashboards (the unbounded funnel overstates
    * conversion by counting a purchase months after the click; the
    * sf0.01 corpus converts 25 vs 138 users at 1 vs 7 days — the
    * window IS the metric).  Chain semantics match [[eventFunnel]]:
    * t1 = first view, t2_w = first click in (t1, t1+w], t3_w = first
    * purchase in (t2_w, t2_w+w].
    *
    * Scale shape: three type-filtered user-keyed min-aggregates — the
    * three windows are CONDITIONAL mins in the SAME aggregate, so
    * widening the window sweep adds columns, not passes — two
    * user-keyed joins, then 9 scalar counts unioned.  All integer
    * microsecond arithmetic; localCheckpoint on the shared stage
    * frames keeps the 3-window fan-out from recomputing the joins.
    */
  def funnelWindow(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val windows = Seq(1L, 3L, 7L)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), epochUs(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      .localCheckpoint(eager = false)
    val cAggs = windows.map(d => min(when(
      col("us") > col("t1") && col("us") <= col("t1") + lit(d * dayUs),
      col("us"))).as(s"t2_$d"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .groupBy(col("user_id")).agg(cAggs.head, cAggs.tail: _*)
      .localCheckpoint(eager = false)
    val pAggs = windows.map(d => min(when(
      col("us") > col(s"t2_$d") && col("us") <= col(s"t2_$d") + lit(d * dayUs),
      col("us"))).as(s"t3_$d"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .groupBy(col("user_id")).agg(pAggs.head, pAggs.tail: _*)
      .localCheckpoint(eager = false)
    windows.map { d =>
      v.agg(count(lit(1)).as("n"))
        .select(lit(d).as("window_days"), lit("1_view").as("stage"),
          col("n").as("n_users"))
        .unionAll(c.agg(count(col(s"t2_$d")).as("n"))
          .select(lit(d).as("window_days"), lit("2_click").as("stage"),
            col("n").as("n_users")))
        .unionAll(p.agg(count(col(s"t3_$d")).as("n"))
          .select(lit(d).as("window_days"), lit("3_purchase").as("stage"),
            col("n").as("n_users")))
    }.reduce(_ unionAll _).orderBy(col("window_days"), col("stage"))
  }

  /** Per-user event-type transition matrix: for every consecutive
    * (prev → next) pair in each user's event-time order, the corpus
    * count — the Markov-chain statistic behind session modeling and
    * anomaly scoring.  One shuffle on user_id for the lag window
    * (total order: ts, then event_id — unique, so the sequence is
    * deterministic on any partitioning), then a bounded-key
    * (|types|²) aggregate that combines map-side.  The streaming
    * equivalent keeps one last-type row per user in
    * [[graft.streaming.Stateful]]; parity is spec-pinned.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** Cohort retention matrix: users bucketed by their FIRST event's
    * epoch week (floor(epochSec/604800) — timezone-free and
    * engine-replayable), distinct active users and event volume per
    * (cohort, week offset) — the engagement analytic every event
    * pipeline ships.
    *
    * Scale shape: a (user, week)-keyed pre-aggregate collapses raw
    * events BEFORE anything user-keyed shuffles (map-side partials
    * absorb a hot user's event volume), the first-week aggregate and
    * the probe are merge-hinted SMJ on user_id off that collapsed
    * frame, and the final aggregate has bounded (cohort, offset) keys.
    */
  def eventRetention(s: SparkSession, dir: String): DataFrame =
    retentionOver(Tables.events(s, dir).select(col("user_id"), col("ts")))

  def retentionOver(events: DataFrame): DataFrame = {
    val wk = events
      .select(col("user_id"),
        floor(epochSec(col("ts")) / 604800).cast("long").as("wk"))
      .groupBy(col("user_id"), col("wk"))
      .agg(count(lit(1)).as("n_ev"))
    val first = wk.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    wk.hint("merge").join(first.hint("merge"), "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"), sum(col("n_ev")).as("n_events"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  /** Daily-volume anomaly detection per event type — the monitoring
    * gate an ingestion pipeline runs before a day's data enters the
    * corpus (a crawler loop or instrumentation bug shows up as a
    * volume spike long before content-level checks fire): a day is
    * flagged when its event count exceeds the type's mean + 2σ over
    * all observed days.
    *
    * FLOAT DISCIPLINE makes this oracle-checkable: daily counts, Σc
    * and Σc² are integer aggregates (order-insensitive), and
    * mean/variance/z derive from those longs in ONE fixed expression
    * tree per row — division, multiply and IEEE sqrt are all
    * correctly-rounded, so the doubles are bit-identical on any
    * engine that replays the same formula (unlike a σ from
    * `stddev()`, whose streaming double accumulation is
    * order-dependent).  Zero-variance types are unflaggable by
    * construction and excluded before the z division.
    *
    * Scale shape: (type, day) keyed aggregate with map-side partials,
    * then a |types|-row stats aggregate broadcast back — nothing
    * corpus-sized shuffles twice.
    */
  def eventSpike(s: SparkSession, dir: String): DataFrame =
    spikeOver(Tables.events(s, dir).select(col("event_type"), col("ts")))

  /** (type, day) count frame — shared by [[spikeOver]]'s two
    * consumers (AQE reuses the one exchange, plan-spec-pinned) and by
    * [[spikeStats]] when a STREAMING monitor trains its baseline from
    * history ([[graft.streaming.Stateful.spikeMonitor]]).
    */
  def dailyCounts(events: DataFrame): DataFrame = events
    .select(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
    .groupBy(col("event_type"), col("day"))
    .agg(count(lit(1)).as("c"))

  /** Per-type volume baseline (n days, Σc, Σc²) — integer aggregates
    * only, so mean/σ derive engine-exactly wherever they're consumed.
    */
  def spikeStats(events: DataFrame): DataFrame =
    dailyCounts(events).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))

  def spikeOver(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events)
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
    val mean = col("sc").cast("double") / col("n")
    val vr = col("sc2").cast("double") / col("n") - mean * mean
    daily.join(broadcast(stats), "event_type")
      .filter(vr > 0 && col("c").cast("double") > mean + lit(2.0) * sqrt(vr))
      .select(col("event_type"), col("day"), col("c").as("n_events"),
        mean.as("mean_daily"),
        ((col("c").cast("double") - mean) / sqrt(vr)).as("z"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Per-type message-size percentiles: exact counting p50/p95/p99 of
    * the payload length per event_type, with totals — the
    * capacity/quota dashboard a message-bus operator reads (which
    * topic's payloads are fattening, where does the p99 sit against
    * the broker's max-message size).
    *
    * Exactness: COUNTING percentiles over the integer size histogram
    * (the skew_report convention — never an interpolated quantile,
    * which is not hash-stable cross-engine); all lanes exact longs.
    *
    * Scale shape: one map-side-combined (type, size) histogram
    * aggregate; the cumulative window is PER-KEY (partitioned by
    * event_type) over |distinct sizes| rows — no global window, no
    * corpus-sized shuffle beyond the histogram's own exchange; the
    * |types|-row totals broadcast back.
    */
  def msgSizePercentiles(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(s, dir)
      .select(col("event_type"), length(col("props")).cast("long").as("sz"))
      .groupBy(col("event_type"), col("sz")).agg(count(lit(1)).as("nk"))
      .localCheckpoint(eager = false) // shared by cum + totals
    val w = Window.partitionBy(col("event_type")).orderBy(col("sz"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("hi", sum(col("nk")).over(w))
    val tot = hist.groupBy(col("event_type"))
      .agg(sum(col("nk")).as("n_msgs"),
        sum(col("sz") * col("nk")).as("total_chars"),
        max(col("sz")).as("max_chars"))
    cum.join(broadcast(tot), Seq("event_type"))
      .groupBy(col("event_type"), col("n_msgs"), col("total_chars"), col("max_chars"))
      .agg(
        min(when(col("hi") * 2 >= col("n_msgs"), col("sz"))).as("p50_chars"),
        min(when(col("hi") * 20 >= col("n_msgs") * 19, col("sz"))).as("p95_chars"),
        min(when(col("hi") * 100 >= col("n_msgs") * 99, col("sz"))).as("p99_chars"))
      .select(col("event_type"), col("n_msgs"), col("total_chars"), col("max_chars"),
        col("p50_chars"), col("p95_chars"), col("p99_chars"))
      .orderBy(col("event_type"))
  }

  /** Consumer-group REBALANCE drill through the REAL
    * [[graft.streaming.GroupCoordinator]] machinery, driven through the
    * oracle gate (the ingest_text128 precedent: the CI-pinned runtime
    * path gets a driver query whose arithmetic DuckDB can replay).
    * Scenario: a 4-partition topic, member `a` consumes one bounded
    * poll across all partitions and acks only a PREFIX of it, member
    * `b` then joins — range assignment splits the partitions 2/2, both
    * members' fetch positions drop to the GROUP-committed offsets (the
    * rebalance-callback image), and the unacked suffix of `a`'s first
    * poll is REDELIVERED under at-least-once before both members drain
    * to the end, acking as they go.
    *
    * Oracle-expressible by construction: keys are the single-char
    * strings "0".."3" of `event_id % 4`, whose Java hashCodes are the
    * consecutive codepoints 48..51, so [[graft.streaming.GroupLog]]'s
    * `floorMod(key.hashCode, 4)` routing IS `event_id % 4` (pinned by
    * StreamingSpec); appends happen in global event_id order, so a
    * partition's offset is `row_number() over (partition by event_id%4
    * order by event_id) - 1` — and the redelivered set is exactly the
    * offsets in [AckTo+1, Poll1-1] that exist.  Per event type the
    * audit reports distinct messages, total deliveries, and the
    * redelivery overlap; the payload round-trips the event type, so a
    * mis-routed or mis-ordered envelope shows up as a wrong per-type
    * count, not just a wrong total.
    *
    * Driver state is the point, and it is bounded: the feed is the
    * first [[GroupFeedCap]] events (ordered limit), the coordinator is
    * the CI-pinned in-heap image (there is no broker in this
    * container), and each poll returns ≤ Poll1·4 rows.  This is a
    * SEMANTICS diagnostic of the consumer-group envelope — the
    * distributed analytics run on the frames it yields.
    */
  private val GroupFeedCap = 20000
  private val GroupPoll1 = 1500
  private val GroupAckTo = 599L

  def groupRebalance(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{GroupCoordinator, GroupLog, GroupMember}
    val feed = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id")).limit(GroupFeedCap)
      .collect()
    val log = new GroupLog(4)
    feed.foreach { r =>
      log.append((r.getLong(0) % 4).toString,
        r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val coord = new GroupCoordinator(log)
    // ack everything delivered in `d`, per partition, capped at `upTo`
    def ackDelivered(m: GroupMember, d: DataFrame, upTo: Long = Long.MaxValue): Unit =
      d.groupBy(col("partition")).agg(max(col("offset")).as("mo")).collect()
        .foreach(r => m.ack(r.getInt(0), math.min(upTo, r.getLong(1))))
    val a = new GroupMember(coord, "a")
    val d1 = a.poll(s, GroupPoll1) // gen 1: a owns all 4 partitions
    ackDelivered(a, d1, GroupAckTo) // ack only the prefix
    val b = new GroupMember(coord, "b") // rebalance: a→{0,1}, b→{2,3}
    def drain(m: GroupMember): Seq[DataFrame] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var d = m.poll(s, GroupPoll1)
      while (!d.isEmpty) { ackDelivered(m, d); out += d; d = m.poll(s, GroupPoll1) }
      out.toSeq
    }
    (Seq(d1) ++ drain(a) ++ drain(b)).reduce(_ union _)
      .select(col("msg_id"), decode(col("payload"), "UTF-8").as("event_type"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("msg_id")).as("n_messages"),
        count(lit(1)).as("n_deliveries"),
        (count(lit(1)) - countDistinct(col("msg_id"))).as("n_redelivered"))
      .orderBy(col("event_type"))
  }

  /** Per-message delivery-report audit through the REAL streaming
    * pipeline: [[graft.streaming.Frizzle.runRouted]] over a file
    * transport of the events table, destinations routed off the
    * decoded payload exactly like [[msgRoute]]/[[deadLetterSplit]],
    * with ONE destination ("events.error") wired to a failing sink —
    * [[graft.streaming.Sinks.withDeliveryReports]] then emits one
    * report row per message, ok=false with the error for exactly the
    * broken destination's messages while the epoch proceeds
    * (containment; siblings unaffected).  The audit aggregates the
    * REPORT rows (not the input), so what the oracle checks is the
    * delivery-report channel end to end: per destination the message
    * count, distinct msg ids (exactly-one-report-per-message — a
    * replayed or double-reported message breaks n_msgs =
    * n_distinct_msgs), and the error count.
    *
    * Deterministic: AvailableNow over a fixed directory; reports land
    * via the idempotent per-(dest, epoch) parquet sink, so even an
    * epoch replay cannot double-count.  Side effects are a per-run
    * temp dir (the ingest_text128 precedent), with the source file
    * symlinked, not copied.  Scale shape: the report frame is a
    * projection of the routed batch — distributed end to end; the
    * only driver state is the bounded destination list runRouted
    * already holds.
    */
  /** Shared file-transport staging for the streaming driver queries
    * (delivery_report_audit / dlq_replay / msg_fanout — ONE set of
    * envelope/sample/validity conventions, so the contracts cannot
    * fork): a fresh per-(query, sf) temp dir with the events table
    * symlinked as the topic directory (the ingest_text128 precedent —
    * never copied).  Returns (run base dir, topic dir).
    */
  private def stageEventsTopic(dir: String, tag: String): (java.io.File, java.io.File) = {
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${tag}_" + new java.io.File(dir).getName)
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles; if (kids != null) kids.foreach(rm); f.delete(); ()
    }
    rm(base)
    val srcDir = new java.io.File(base, "topic"); srcDir.mkdirs()
    java.nio.file.Files.createSymbolicLink(
      new java.io.File(srcDir, "events.parquet").toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
    (base, srcDir)
  }

  /** Pruned read schema for the events-as-topic transport. */
  private def eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("props", StringType)))
  }

  /** events row → Msg envelope: id = event_id, routing key = user,
    * payload = props bytes, dest = the per-type topic.
    */
  private val eventsToMsg: DataFrame => DataFrame = df => df.select(
    col("event_id").cast("string").as("msg_id"),
    col("user_id").cast("string").as("key"),
    encode(col("props"), "UTF-8").as("payload"),
    concat(lit("events."), col("event_type")).as("dest"),
    lit(0L).cast("timestamp").as("ts"))

  /** The business field the validity/fanout rules key on, decoded from
    * the payload exactly as a consumer would (NULL when absent — which
    * runRouted's NULL-validity contract dead-letters, never drops).
    */
  private def payloadK =
    regexp_extract(col("payload").cast("string"), "\"k\": (-?\\d+)", 1).cast("long")

  /** Deterministic 1-in-10 sample INSIDE the route transform (narrow
    * op — the per-partition ordering contract holds): the epoch
    * persist inside runRouted holds the TRANSFORMED batch, so an
    * unsampled sf10 run parked a ~12M-row × ~300 B batch on the bench
    * heap three times per suite (r19: this OOM'd the 8 GB cold pass at
    * the query after it).  The channel under test is exercised
    * end-to-end identically on the sample, and each oracle applies the
    * same modulus.  msg_id is the event_id, so the sample is a pure
    * function of the data, not of stream batching.
    */
  private val sampleTenth: DataFrame => DataFrame = df =>
    df.filter(col("msg_id").cast("long") % 10 === 0)

  def deliveryReportAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{FileMsgSource, Frizzle, Sinks}
    val (base, srcDir) = stageEventsTopic(dir, "delivery")
    val source = FileMsgSource(srcDir.getAbsolutePath, eventsRawSchema, eventsToMsg)
    val route = Frizzle.Route(sampleTenth, isValid = !(payloadK % 13 === 0))
    val broken = "events.error"
    val inner: (DataFrame, String, Long) => Unit = (df, d, e) => {
      if (d == broken) throw new java.io.IOException(s"simulated broker failure: $d")
      Sinks.idempotentParquet(s"$base/out")(df, d, e)
    }
    val sink = Sinks.withDeliveryReports(inner)(
      (reports, d, e) => Sinks.idempotentParquet(s"$base/reports")(reports, d, e))
    val q = Frizzle.runRouted(s, source, route, dest = col("dest"), sink,
      checkpoint = s"$base/ckpt")
    q.awaitTermination(600000)
    s.read.option("recursiveFileLookup", "true").parquet(s"$base/reports")
      .groupBy(col("dest"), col("ok").cast("int").as("ok"))
      .agg(count(lit(1)).as("n_msgs"),
        countDistinct(col("msg_id")).as("n_distinct_msgs"),
        count(col("error")).as("n_err"))
      .orderBy(col("dest"), col("ok"))
  }

  /** frizzle's DLQ retry loop end to end through the REAL runtime:
    * pass 1 runs the routed pipeline with a validator that
    * dead-letters k % 13 == 0 payloads (and NULL k — runRouted's
    * NULL-validity contract); [[graft.streaming.Frizzle.retryDlq]]
    * then re-sources the parking lot under its OWN checkpoint with a
    * corrected route that recovers everything except genuinely
    * poisoned messages (k % 39 == 0 — a strict subset of the parked
    * set, 39 = 3·13, so recovery is real work, not a blanket accept).
    * The audit unions what the two passes DELIVERED plus what stayed
    * parked: every sampled message lands in exactly ONE phase —
    * delivered / recovered / dead — so a lost, double-replayed, or
    * mis-routed message breaks the (phase, dest) counts the oracle
    * recomputes straight from events.  DLQ is a parking lot, not a
    * terminal state (the §1 "DLQ + retry" bullet as a gated query,
    * not just a runtime API), and at-least-once holds end to end:
    * the retry acks independently, and both passes write through the
    * idempotent per-(dest, epoch) sink so even an epoch replay cannot
    * double-count.
    *
    * Scale shape: both passes are distributed streams over the file
    * transport (the dlq re-source reads only the parked fraction);
    * the audit is a FileScan + one bounded-key aggregate.  Driver
    * state stays the bounded destination list runRouted holds.
    */
  def dlqReplay(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType, TimestampType}
    import graft.streaming.{FileMsgSource, Frizzle, Sinks}
    val (base, srcDir) = stageEventsTopic(dir, "dlqreplay")
    val source = FileMsgSource(srcDir.getAbsolutePath, eventsRawSchema, eventsToMsg)
    val q1 = Frizzle.runRouted(s, source,
      Frizzle.Route(sampleTenth, isValid = !(payloadK % 13 === 0)),
      dest = col("dest"), Sinks.idempotentParquet(s"$base/pass1"),
      checkpoint = s"$base/ckpt1")
    q1.awaitTermination(600000)
    // the parked messages come back in the SAME envelope they left in
    // (idempotentParquet wrote the transformed batch minus __dest)
    val envelope = StructType(Seq(
      StructField("msg_id", StringType), StructField("key", StringType),
      StructField("payload", BinaryType), StructField("dest", StringType),
      StructField("ts", TimestampType)))
    val retry = Frizzle.retryDlq(s"$base/pass1/dlq", envelope,
      // epoch=N subdirs are the sink's layout, not a partition scheme
      Map("recursiveFileLookup" -> "true"))
    val q2 = Frizzle.runRouted(s, retry,
      Frizzle.Route(identity, isValid = !(payloadK % 39 === 0)),
      dest = col("dest"), Sinks.idempotentParquet(s"$base/pass2"),
      checkpoint = s"$base/ckpt2")
    q2.awaitTermination(600000)
    // phase from the sink LAYOUT (a parked row keeps its original dest
    // column — that is the point: the envelope survives the loop — so
    // membership is the dlq directory, not a data column)
    def readPass(p: String): DataFrame =
      s.read.option("recursiveFileLookup", "true").parquet(s"$base/$p")
        .withColumn("__parked", input_file_name().contains("/dlq/"))
    val delivered = readPass("pass1").filter(!col("__parked"))
      .withColumn("phase", lit("delivered"))
    val retried = readPass("pass2")
      .withColumn("phase", when(col("__parked"), "dead").otherwise("recovered"))
    delivered.unionByName(retried)
      .groupBy(col("phase"), col("dest"))
      .agg(count(lit(1)).as("n_msgs"), countDistinct(col("msg_id")).as("n_distinct_msgs"))
      .orderBy(col("phase"), col("dest"))
  }

  /** frizzle's multi-destination fan-out (`Sink.Send` called more than
    * once per message) through the REAL runtime: the route transform
    * EXPLODES each message to its per-type topic plus, for k % 7 == 0
    * payloads, an "events.audit" copy — a narrow generator, so the
    * per-partition ordering contract documented on runRouted holds for
    * every destination's stream.  The audit reads the routed output
    * back: per destination the row count and distinct msg ids — the
    * audit topic's rows are REAL duplicates by design (same msg_id,
    * two destinations), so n_msgs across destinations exceeds the
    * message count while each destination stays exactly-once
    * (n_msgs = n_distinct_msgs per dest; the idempotent sink collapses
    * epoch replays).  Oracle: the same fan-out as pure SQL UNION ALL
    * over events.
    */
  def msgFanout(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{FileMsgSource, Frizzle, Sinks}
    val (base, srcDir) = stageEventsTopic(dir, "fanout")
    val fan: DataFrame => DataFrame = df => sampleTenth(df)
      .withColumn("dest", explode(array_compact(array(
        col("dest"), when(payloadK % 7 === 0, lit("events.audit"))))))
    val q = Frizzle.runRouted(s,
      FileMsgSource(srcDir.getAbsolutePath, eventsRawSchema, eventsToMsg),
      Frizzle.Route(fan, isValid = payloadK.isNotNull),
      dest = col("dest"), Sinks.idempotentParquet(s"$base/out"),
      checkpoint = s"$base/ckpt")
    q.awaitTermination(600000)
    // group by the DATA dest column: for routed rows it equals the
    // directory; a NULL-k row (dead-lettered by contract) keeps its
    // primary dest, which is exactly where the oracle counts it
    s.read.option("recursiveFileLookup", "true").parquet(s"$base/out")
      .groupBy(col("dest"))
      .agg(count(lit(1)).as("n_msgs"), countDistinct(col("msg_id")).as("n_distinct_msgs"))
      .orderBy(col("dest"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "group_rebalance" -> (groupRebalance _),
    "delivery_report_audit" -> (deliveryReportAudit _),
    "dlq_replay" -> (dlqReplay _),
    "msg_fanout" -> (msgFanout _),
    "msg_size_percentiles" -> (msgSizePercentiles _),
    "event_spike" -> (eventSpike _),
    "event_retention" -> (eventRetention _),
    "event_transitions" -> (eventTransitions _),
    "event_funnel" -> (eventFunnel _),
    "funnel_window" -> (funnelWindow _),
    "msg_ingest" -> (msgIngest _),
    "msg_decode_avro" -> (msgDecodeAvro _),
    "msg_decode_json" -> (msgDecodeJson _),
    "msg_decode_csv" -> (msgDecodeCsv _),
    "msg_decode_proto" -> (msgDecodeProto _),
    "msg_decode_oneof" -> (msgDecodeOneof _),
    "msg_route" -> (msgRoute _),
    "dead_letter_split" -> (deadLetterSplit _),
    "stream_dedup" -> (streamDedup _),
    "win_tumbling" -> (winTumbling _),
    "win_sliding" -> (winSliding _),
    "win_session" -> (winSession _),
    "event_pivot" -> (eventPivot _),
    "asof_join" -> (asofJoin _),
    "range_join" -> (rangeJoin _),
    "sample_stratified" -> (sampleStratified _))

  def oracleSql: Map[String, String] = Map(
    // the rebalance drill's arithmetic replayed in pure SQL: key
    // routing ≡ event_id % 4 (single-char keys "0".."3", consecutive
    // hashCodes — StreamingSpec pins the equivalence), offsets ≡
    // row_number per partition in event_id order, and the redelivered
    // set ≡ the acked-gap offsets [600, 1499] that exist in the data
    "group_rebalance" ->
      """WITH f AS (SELECT event_type, event_id % 4 AS p, event_id
        |  FROM (SELECT event_type, event_id FROM events ORDER BY event_id LIMIT 20000)),
        |k AS (SELECT event_type,
        |  row_number() OVER (PARTITION BY p ORDER BY event_id) - 1 AS o FROM f)
        |SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_messages,
        |  CAST(COUNT(*) + SUM(CASE WHEN o BETWEEN 600 AND 1499 THEN 1 ELSE 0 END) AS BIGINT) AS n_deliveries,
        |  CAST(SUM(CASE WHEN o BETWEEN 600 AND 1499 THEN 1 ELSE 0 END) AS BIGINT) AS n_redelivered
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    // report channel ≡ routing: every message reports exactly once
    // under its routed destination; ok=0 with one error for exactly
    // the broken destination.  NULL k routes to dlq (runRouted's
    // NULL-validity → dead-letter contract), mirrored explicitly.
    "delivery_report_audit" ->
      """WITH m AS (SELECT event_id,
        |  CASE WHEN COALESCE(TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) % 13 = 0, TRUE)
        |       THEN 'dlq' ELSE 'events.' || event_type END AS dest
        |  FROM events WHERE event_id % 10 = 0)
        |SELECT dest, CAST(dest <> 'events.error' AS INT) AS ok,
        |  CAST(COUNT(*) AS BIGINT) AS n_msgs,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_msgs,
        |  CAST(CASE WHEN dest = 'events.error' THEN COUNT(*) ELSE 0 END AS BIGINT) AS n_err
        |FROM m GROUP BY dest ORDER BY dest, ok""".stripMargin,
    // the retry loop replayed as pure SQL: phase is a CASE over the
    // decoded k — delivered (valid at pass 1), dead (NULL k, or
    // poisoned k % 39 = 0 — the corrected validator's reject set),
    // recovered (everything else the first validator parked).  Every
    // sampled message lands in exactly one phase; a replay loss or
    // duplication breaks the (phase, dest) counts.
    "dlq_replay" ->
      """WITH m AS (SELECT event_id, 'events.' || event_type AS dest,
        |  TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k
        |  FROM events WHERE event_id % 10 = 0)
        |SELECT CASE WHEN k IS NOT NULL AND k % 13 <> 0 THEN 'delivered'
        |            WHEN k IS NULL OR k % 39 = 0 THEN 'dead'
        |            ELSE 'recovered' END AS phase,
        |  dest, CAST(COUNT(*) AS BIGINT) AS n_msgs,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_msgs
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // fan-out ≡ UNION ALL: every sampled message under its per-type
    // topic (NULL-k rows included — dead-lettered by the runtime but
    // counted under their data dest, mirrored in the Spark audit),
    // plus an audit copy for k % 7 = 0 (NULL-safe: WHERE drops NULL)
    "msg_fanout" ->
      """WITH m AS (SELECT event_id, event_type,
        |  TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k
        |  FROM events WHERE event_id % 10 = 0),
        |x AS (SELECT event_id, 'events.' || event_type AS dest FROM m
        |  UNION ALL
        |  SELECT event_id, 'events.audit' FROM m WHERE k % 7 = 0)
        |SELECT dest, CAST(COUNT(*) AS BIGINT) AS n_msgs,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_msgs
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // counting percentiles over the integer size histogram — the
    // skew_report convention, exact on both engines
    "msg_size_percentiles" ->
      """WITH h AS (SELECT event_type, CAST(length(props) AS BIGINT) AS sz,
        |  CAST(COUNT(*) AS BIGINT) AS nk FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, sz, nk, SUM(nk) OVER (PARTITION BY event_type
        |  ORDER BY sz ROWS UNBOUNDED PRECEDING) AS hi FROM h),
        |t AS (SELECT event_type, CAST(SUM(nk) AS BIGINT) AS n_msgs,
        |  CAST(SUM(sz * nk) AS BIGINT) AS total_chars,
        |  CAST(MAX(sz) AS BIGINT) AS max_chars FROM h GROUP BY 1)
        |SELECT c.event_type, n_msgs, total_chars, max_chars,
        |  CAST(MIN(CASE WHEN hi * 2 >= n_msgs THEN sz END) AS BIGINT) AS p50_chars,
        |  CAST(MIN(CASE WHEN hi * 20 >= n_msgs * 19 THEN sz END) AS BIGINT) AS p95_chars,
        |  CAST(MIN(CASE WHEN hi * 100 >= n_msgs * 99 THEN sz END) AS BIGINT) AS p99_chars
        |FROM c JOIN t USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    // the mean/var/z formula is replayed token-for-token from integer
    // aggregates: correctly-rounded double ops ⇒ bit-identical values
    "event_spike" ->
      """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS c
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS sc, SUM(c*c) AS sc2
        |      FROM d GROUP BY 1)
        |SELECT event_type, day, CAST(c AS BIGINT) AS n_events,
        |  CAST(sc AS DOUBLE)/n AS mean_daily,
        |  (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE)/n)
        |    / sqrt(CAST(sc2 AS DOUBLE)/n - (CAST(sc AS DOUBLE)/n)*(CAST(sc AS DOUBLE)/n)) AS z
        |FROM d JOIN s USING (event_type)
        |WHERE CAST(sc2 AS DOUBLE)/n - (CAST(sc AS DOUBLE)/n)*(CAST(sc AS DOUBLE)/n) > 0
        |  AND CAST(c AS DOUBLE) > CAST(sc AS DOUBLE)/n
        |      + 2.0*sqrt(CAST(sc2 AS DOUBLE)/n - (CAST(sc AS DOUBLE)/n)*(CAST(sc AS DOUBLE)/n))
        |ORDER BY event_type, day""".stripMargin,
    "event_retention" ->
      """WITH w AS (SELECT user_id, (epoch_us(ts) // 1000000 // 604800) AS wk, COUNT(*) AS n_ev
        |           FROM events GROUP BY user_id, wk),
        |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset,
        |  CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(n_ev) AS BIGINT) AS n_events
        |FROM w JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, COUNT(*) AS n FROM s
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin,
    "event_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |UNION ALL SELECT '2_click' AS stage, COUNT(*) AS n_users FROM c
        |UNION ALL SELECT '3_purchase' AS stage, COUNT(*) AS n_users FROM p
        |ORDER BY stage""".stripMargin,
    // same chain as event_funnel with each step's min made CONDITIONAL
    // on the per-window deadline — pure integer microsecond compares,
    // COUNT(col) counts non-null conversions
    "funnel_window" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id,
        |  MIN(CASE WHEN e.us > v.t1 AND e.us <= v.t1 + 86400000000 THEN e.us END) AS t2_1,
        |  MIN(CASE WHEN e.us > v.t1 AND e.us <= v.t1 + 259200000000 THEN e.us END) AS t2_3,
        |  MIN(CASE WHEN e.us > v.t1 AND e.us <= v.t1 + 604800000000 THEN e.us END) AS t2_7
        |  FROM e JOIN v USING (user_id) WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id,
        |  MIN(CASE WHEN e.us > c.t2_1 AND e.us <= c.t2_1 + 86400000000 THEN e.us END) AS t3_1,
        |  MIN(CASE WHEN e.us > c.t2_3 AND e.us <= c.t2_3 + 259200000000 THEN e.us END) AS t3_3,
        |  MIN(CASE WHEN e.us > c.t2_7 AND e.us <= c.t2_7 + 604800000000 THEN e.us END) AS t3_7
        |  FROM e JOIN c USING (user_id) WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS window_days, '1_view' AS stage,
        |  (SELECT COUNT(*) FROM v) AS n_users
        |UNION ALL SELECT 1, '2_click', (SELECT COUNT(t2_1) FROM c)
        |UNION ALL SELECT 1, '3_purchase', (SELECT COUNT(t3_1) FROM p)
        |UNION ALL SELECT 3, '1_view', (SELECT COUNT(*) FROM v)
        |UNION ALL SELECT 3, '2_click', (SELECT COUNT(t2_3) FROM c)
        |UNION ALL SELECT 3, '3_purchase', (SELECT COUNT(t3_3) FROM p)
        |UNION ALL SELECT 7, '1_view', (SELECT COUNT(*) FROM v)
        |UNION ALL SELECT 7, '2_click', (SELECT COUNT(t2_7) FROM c)
        |UNION ALL SELECT 7, '3_purchase', (SELECT COUNT(t3_7) FROM p)
        |ORDER BY window_days, stage""".stripMargin,
    "msg_ingest" ->
      """SELECT CAST(event_id AS VARCHAR) AS msg_id, CAST(user_id AS VARCHAR) AS routing_key,
        |  CAST(octet_length(encode(props)) AS BIGINT) AS payload_bytes,
        |  CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_sec
        |FROM events ORDER BY ts_sec, msg_id""".stripMargin,
    // the Avro round trip is the identity on the record fields, so the
    // oracle recomputes the aggregate straight from events — any codec
    // value corruption breaks the hash
    "msg_decode_avro" ->
      """SELECT event_type, COUNT(*) AS n_msgs,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id,
        |  CAST(SUM(length(props)) AS BIGINT) AS sum_props_chars
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // JSON round trip: identity on the record fields; the corruption
    // predicate (event_id % 97 = 0) is deterministic, so the oracle
    // nulls those records' fields and groups them under _undecodable
    "msg_decode_json" ->
      """WITH d AS (SELECT
        |    CASE WHEN event_id % 97 = 0 THEN '_undecodable' ELSE event_type END AS et,
        |    CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_id END AS id,
        |    CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS v,
        |    CASE WHEN event_id % 97 = 0 THEN NULL ELSE props END AS p
        |  FROM events)
        |SELECT et AS event_type, COUNT(*) AS n_msgs,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(id) AS min_id, MAX(id) AS max_id,
        |  CAST(SUM(length(p)) AS BIGINT) AS sum_props_chars
        |FROM d GROUP BY et ORDER BY et""".stripMargin,
    // CSV corruption is field-local (PERMISSIVE keeps fields that
    // still tokenize): corrupt rows lose only the PK, so the
    // _undecodable group keeps non-null value/props aggregates
    "msg_decode_csv" ->
      """WITH d AS (SELECT
        |    CASE WHEN event_id % 97 = 0 THEN '_undecodable' ELSE event_type END AS et,
        |    CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_id END AS id,
        |    value AS v, props AS p
        |  FROM events)
        |SELECT et AS event_type, COUNT(*) AS n_msgs,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(id) AS min_id, MAX(id) AS max_id,
        |  CAST(SUM(length(p)) AS BIGINT) AS sum_props_chars
        |FROM d GROUP BY et ORDER BY et""".stripMargin,
    // proto3 truncation at a field boundary is SILENT: corrupt rows
    // keep their type group (no _undecodable possible) and decode
    // value/props to the proto3 defaults 0.0/'' — the oracle replays
    // exactly that, and null props decode to '' (proto3 has no null)
    "msg_decode_proto" ->
      """WITH d AS (SELECT event_type, event_id AS id,
        |    CASE WHEN event_id % 97 = 0 THEN 0.0 ELSE value END AS v,
        |    CASE WHEN event_id % 97 = 0 THEN '' ELSE coalesce(props, '') END AS p
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_msgs,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(id) AS min_id, MAX(id) AS max_id,
        |  CAST(SUM(length(p)) AS BIGINT) AS sum_props_chars
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    // decode(encode(x)) is the identity on every set field, presence
    // included, so the oracle recomputes the aggregates from the raw
    // events: email set (possibly to '') for clicks/views, phone set
    // for purchases/signups, neither otherwise — count() skips the
    // null (unset) members identically on both engines
    "msg_decode_oneof" ->
      """WITH d AS (SELECT event_type,
        |    CASE WHEN event_type IN ('click','view') THEN
        |      CASE WHEN user_id % 11 = 0 THEN ''
        |           ELSE 'u' || CAST(user_id AS VARCHAR) || '@ex.com' END END AS email,
        |    CASE WHEN event_type IN ('purchase','signup') THEN -user_id END AS phone,
        |    user_id % 100 AS v
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  COUNT(email) AS n_email, COUNT(phone) AS n_phone,
        |  CAST(SUM(length(email)) AS BIGINT) AS sum_email_len,
        |  CAST(SUM(phone) AS BIGINT) AS sum_phone,
        |  CAST(SUM(v) AS BIGINT) AS map_v_sum
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "msg_route" ->
      """SELECT 'events.' || event_type AS dest, COUNT(*) AS n_msgs,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY dest ORDER BY dest""".stripMargin,
    "dead_letter_split" ->
      """WITH e AS (SELECT *, TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k FROM events)
        |SELECT CASE WHEN k % 13 = 0 OR value < 1.0 THEN 'dlq' ELSE 'main' END AS branch,
        |  event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY branch, event_type ORDER BY branch, event_type""".stripMargin,
    "stream_dedup" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_sec, value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "win_tumbling" ->
      """SELECT (epoch_us(ts) // 1000000 // 300) * 300 AS wstart, event_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin,
    "win_sliding" ->
      """WITH e AS (SELECT CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s, event_type, value FROM events),
        |w AS (SELECT (s // 300) * 300 - t.off AS wstart, event_type, value
        |      FROM e, (VALUES (0), (300)) t(off))
        |SELECT wstart, event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin,
    "win_session" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        |f AS (SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        |g AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS nf FROM f),
        |h AS (SELECT *, SUM(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
        |SELECT user_id, MIN(us) AS sess_start_us, MAX(us) AS sess_end_us,
        |  COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM h GROUP BY user_id, sid ORDER BY user_id, sess_start_us""".stripMargin,
    "event_pivot" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "range_join" ->
      """WITH b AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events WHERE event_type IN ('click','purchase')),
        |p AS (SELECT event_id AS purchase_id, user_id, us AS p_us FROM b WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, us AS c_us FROM b WHERE event_type = 'click')
        |SELECT purchase_id, p.user_id, p_us,
        |  COUNT(*) AS n_clicks_1h, MAX(c_us) AS last_click_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c_us <= p_us AND c_us >= p_us - 3600000000
        |GROUP BY purchase_id, p.user_id, p_us
        |ORDER BY purchase_id""".stripMargin,
    "sample_stratified" ->
      """SELECT event_id, event_type, user_id, value
        |FROM events
        |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 4) <=
        |  CASE WHEN event_type IN ('purchase','signup') THEN 'ffff'
        |       WHEN event_type = 'error' THEN '7fff'
        |       WHEN event_type = 'click' THEN '3fff'
        |       ELSE '1fff' END
        |ORDER BY event_id""".stripMargin,
    "asof_join" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT * FROM events WHERE event_type = 'click'
        |      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT p.event_id AS purchase_id, p.user_id, epoch_us(p.ts) AS p_us,
        |  c.event_id AS prior_click_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin)
}
