package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Spark-native re-expression of the frizzle/frafka pipeline surface
  * (public API of github.com/qntfy/frizzle + github.com/qntfy/frafka):
  *
  *  - `Msg{ID, Original, Data}`        → the canonical msg schema below
  *  - `Source.Receive()`               → a streaming DataFrame
  *  - `Source.Ack`                     → checkpointed offset commit
  *    (at-least-once, exactly as frafka's consumer-group commit)
  *  - `Sink.Send(msg, dest)`           → per-destination routed write
  *  - `Fail(msg)` / FailSink           → dead-letter branch
  *  - env config (KAFKA_BROKERS, ...)  → [[KafkaPipeConfig.fromEnv]]
  *
  * The Kafka transport is option-plumbing only in this container (no
  * broker, no kafka connector jar); file/memory transports run the
  * identical plan, which is the point of declaring the pipeline as a
  * DataFrame: the transform is transport-agnostic.
  */
object MsgSchema {
  /** Canonical message envelope: id + routing key + opaque payload. */
  val schema: StructType = StructType(Seq(
    StructField("msg_id", StringType),
    StructField("key", StringType),
    StructField("payload", BinaryType),
    StructField("dest", StringType),
    StructField("ts", TimestampType)))
}

/** frafka's viper env config, carried over verbatim (public frafka
  * README documents KAFKA_BROKERS / KAFKA_TOPICS / KAFKA_CONSUMER_GROUP /
  * KAFKA_MAX_BUFFER_KB).
  */
final case class KafkaPipeConfig(
    brokers: String,
    topics: Seq[String],
    consumerGroup: Option[String],
    maxBufferKb: Option[Long]) {

  /** Options for `readStream.format("kafka")`. */
  def sourceOptions: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topics.mkString(",")) ++
      consumerGroup.map("kafka.group.id" -> _) ++
      maxBufferKb.map(kb => "maxOffsetsPerTrigger" -> (kb * 16).toString)

  /** Options for `writeStream.format("kafka")`. */
  def sinkOptions(defaultTopic: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> brokers, "topic" -> defaultTopic)
}

object KafkaPipeConfig {
  def fromEnv(env: Map[String, String] = sys.env): KafkaPipeConfig =
    KafkaPipeConfig(
      brokers = env.getOrElse("KAFKA_BROKERS", "localhost:9092"),
      topics = env.get("KAFKA_TOPICS").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil),
      consumerGroup = env.get("KAFKA_CONSUMER_GROUP"),
      maxBufferKb = env.get("KAFKA_MAX_BUFFER_KB").map(_.toLong))
}

/** A message source: anything that yields a streaming DataFrame in the
  * [[MsgSchema]] envelope.
  */
trait MsgSource {
  def receive(spark: SparkSession): DataFrame
}

/** Kafka transport (`Source.Receive` ≙ the subscribed stream).  Columns
  * map 1:1 onto frafka's Msg: kafka key → routing key, value → payload,
  * topic → dest, offset-derived id.
  */
final case class KafkaMsgSource(conf: KafkaPipeConfig) extends MsgSource {
  def receive(spark: SparkSession): DataFrame = {
    // preflight: the connector is a separate artifact, and without it
    // `format("kafka")` fails at stream start with an opaque
    // DataSource-lookup error — fail here with the actionable message
    require(KafkaMsgSource.connectorAvailable,
      "Kafka transport requires the spark-sql-kafka connector on the classpath " +
        "(org.apache.spark:spark-sql-kafka-0-10_2.13 matching your Spark version); " +
        "it is not present in this environment")
    spark.readStream.format("kafka").options(conf.sourceOptions).load()
      .select(
        concat_ws("-", col("topic"), col("partition"), col("offset")).as("msg_id"),
        col("key").cast("string").as("key"),
        col("value").as("payload"),
        col("topic").as("dest"),
        col("timestamp").as("ts"))
  }
}

object KafkaMsgSource {
  /** Whether the spark-sql-kafka connector is on the driver classpath. */
  lazy val connectorAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: Throwable => false }
}

/** File transport: tail a directory of files as a stream (the local
  * stand-in for a topic; same envelope, same downstream plan).
  * `format` is any Spark file source — parquet (default), csv, json
  * (JSON-lines), text — so the same pipeline runs over whatever the
  * upstream system drops.  `options` passes reader options through
  * (csv `header`, rate limits like maxFilesPerTrigger — the
  * file-source image of frafka's KAFKA_MAX_BUFFER_KB).
  */
final case class FileMsgSource(path: String, raw: StructType, toMsg: DataFrame => DataFrame,
    options: Map[String, String] = Map.empty, format: String = "parquet")
    extends MsgSource {
  def receive(spark: SparkSession): DataFrame =
    toMsg(spark.readStream.format(format).options(options).schema(raw).load(path))
}

/** Routed sink (`Sink.Send(msg, dest)`): one pipeline, messages fanned
  * out to per-destination directories inside `foreachBatch` — the batch
  * epoch id is the ack unit, giving frafka's at-least-once contract.
  */
/** `Source.UnAcked()` image: messages received but not yet committed.
  * In Structured Streaming the checkpointed foreachBatch epoch IS the
  * ack unit, so counts move at epoch boundaries: a batch's rows are
  * un-acked from the moment the epoch starts processing until its
  * writes complete and the offset commit lands.
  *
  * Counts are keyed by (pipeline, epoch) — the pipeline identity is
  * its checkpoint path, which is stable across restarts and unique
  * per logical pipeline — so one stats object can safely aggregate
  * several concurrent pipelines, and a failed-and-replayed epoch is
  * idempotent in both directions: the replay's begin overwrites the
  * failed attempt's pending entry, and a re-commit of an
  * already-committed epoch (write succeeded but the offset commit
  * crashed — the at-least-once corner) is ignored because epochs
  * commit in increasing order per pipeline.
  */
final class FrizzleStats {
  private val pendingByEpoch =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val committedUpTo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val committed = new java.util.concurrent.atomic.AtomicLong
  private[streaming] def begin(pipeline: String, epoch: Long, n: Long): Unit = {
    pendingByEpoch.put(s"$pipeline#$epoch", n); ()
  }
  private[streaming] def commit(pipeline: String, epoch: Long): Unit = {
    val n = pendingByEpoch.remove(s"$pipeline#$epoch")
    val high = committedUpTo.get(pipeline)
    if (n != null && (high == null || epoch > high.longValue())) {
      committedUpTo.put(pipeline, epoch)
      committed.addAndGet(n.longValue()); ()
    }
  }
  /** Rows in flight (epochs started but not yet acked). */
  def unAcked: Long = {
    var total = 0L
    pendingByEpoch.values().forEach(n => total += n)
    total
  }
  /** Rows whose epoch committed (cumulative acks, counted once per
    * epoch even if the epoch replays after a successful write).
    */
  def ackedCount: Long = committed.get
}

/** writeBatch implementations for [[Frizzle.runRouted]]. */
object Sinks {

  /** Idempotent parquet sink: each (dest, epoch) writes its own
    * `epoch=N` directory with overwrite, so an epoch REPLAY (the
    * at-least-once contract) rewrites the same directory instead of
    * appending duplicates — exactly-once output without a
    * transactional store.  Readers see `base/<dest>/epoch=*` as one
    * partitioned dataset.
    */
  def idempotentParquet(base: String): (DataFrame, String, Long) => Unit =
    (df, dest, epoch) => df.write.mode("overwrite").parquet(s"$base/$dest/epoch=$epoch")

  /** Per-MESSAGE delivery-report surface — frafka's producer emits a
    * delivery success/failure event per message (librdkafka's
    * delivery-report channel); [[Frizzle.runRouted]]'s epoch ack is
    * coarser (one failed destination fails the whole epoch).
    * Wrapping a sink with this decorator restores the per-message
    * surface: after each destination's write, one report row per
    * message — (msg_id[, key], dest, ok, error) — reaches `onReport`,
    * and a FAILED destination reports ok = false with the error for
    * exactly ITS messages while the failure is CONTAINED: the epoch
    * proceeds, siblings unaffected (frizzle's Fail(msg) semantics —
    * the report handler owns what happens next, e.g. writing failed
    * reports under a directory a [[Frizzle.retryDlq]] loop re-sources).
    *
    * Deliberate trade-off vs the bare sink: containment means the
    * stream's own epoch replay will NOT redeliver the failed
    * messages — at-least-once for them moves to the report handler.
    * Use the un-wrapped sink when fail-the-epoch-and-replay is the
    * desired failure mode; this wrapper is the image of frafka users
    * who consume the delivery-report channel and Fail() individual
    * messages instead of crashing the consumer.
    */
  def withDeliveryReports(inner: (DataFrame, String, Long) => Unit)(
      onReport: (DataFrame, String, Long) => Unit): (DataFrame, String, Long) => Unit =
    (df, dest, epoch) => {
      import org.apache.spark.sql.functions.{col, lit}
      val failure =
        try { inner(df, dest, epoch); None }
        catch { case scala.util.control.NonFatal(e) => Some(e) }
      val idCols = Seq(col("msg_id")) ++
        (if (df.columns.contains("key")) Seq(col("key")) else Nil)
      val reports = df.select(idCols: _*)
        .withColumn("dest", lit(dest))
        .withColumn("ok", lit(failure.isEmpty))
        // explicit string cast: a success batch's error is lit(null),
        // which types as VOID — a parquet report sink would then write
        // schema-incompatible files across destinations (found by the
        // delivery_report_audit driver query, r19)
        .withColumn("error",
          lit(failure.map(e => s"${e.getClass.getSimpleName}: ${e.getMessage}").orNull)
            .cast("string"))
      onReport(reports, dest, epoch)
    }
}

object Frizzle {

  /** Concurrency bound for per-destination writes inside one epoch —
    * destinations are topics (bounded), and each write is a Spark job;
    * a small pool keeps the scheduler busy without oversubscribing it.
    */
  private val MaxConcurrentDestWrites = 8

  /** A transform with a failure branch: rows where `isValid` is false
    * route to the dead-letter sink (frizzle `Fail`).
    */
  final case class Route(transform: DataFrame => DataFrame, isValid: Column)

  /** Run source → transform → {main, dlq} with checkpointed acks: the
    * two-way special case of [[runRouted]] (every valid message to one
    * "main" destination).
    */
  def run(
      spark: SparkSession,
      source: MsgSource,
      route: Route,
      writeBatch: (DataFrame, String, Long) => Unit,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      stats: FrizzleStats = new FrizzleStats): StreamingQuery =
    runRouted(spark, source, route, lit("main"), writeBatch, checkpoint, trigger, stats)

  /** frizzle's retry loop: a dead-letter directory written by a
    * previous run becomes a new source with the same envelope, so a
    * corrected `Route` can re-process failures under its own
    * checkpoint — DLQ is a parking lot, not a terminal state.
    * At-least-once is preserved end to end: the retry run acks (epoch
    * commits) independently of the original.
    */
  def retryDlq(path: String, schema: StructType,
      options: Map[String, String] = Map.empty): MsgSource =
    FileMsgSource(path, schema, identity, options)

  /** Full `Sink.Send(msg, dest)` semantics: each valid message routes
    * to its own destination (arbitrary, data-dependent set — frizzle's
    * per-topic fan-out), invalid messages to the `dlqDest` destination.
    * `dlqDest` is a RESERVED name: rename it here if a legitimate
    * topic is called "dlq", otherwise valid traffic routed there would
    * be indistinguishable from failures (and re-delivered by a
    * [[retryDlq]] loop).
    *
    * Per epoch: one persist of the batch, the distinct destination set
    * (bounded — destinations are topics, not keys), then one
    * partition-pruned write per destination, issued CONCURRENTLY on a
    * bounded pool (the writes are independent Spark jobs, so epoch
    * latency is ~max across destinations, not the sum; any write
    * failure fails the epoch, preserving at-least-once).  The batch
    * epoch id is the ack unit, giving frafka's at-least-once contract;
    * `stats` tracks un-acked/acked counts across epoch boundaries
    * (`UnAcked()`), idempotently under epoch replay.
    *
    * ORDERING CONTRACT (frafka's per-partition ordering image): within
    * an epoch, rows that share a source partition reach each
    * destination's `writeBatch` frame in source order, PROVIDED the
    * route transform is narrow (select/filter/withColumn — anything
    * without a shuffle).  Kafka assigns a key to one partition, so
    * per-KEY order is preserved end to end exactly as frafka
    * guarantees it; a shuffling transform (join/groupBy/repartition)
    * voids the contract, same as it would in any consumer that
    * re-keys mid-pipeline.  Pinned by StreamingSpec.
    */
  def runRouted(
      spark: SparkSession,
      source: MsgSource,
      route: Route,
      dest: Column,
      writeBatch: (DataFrame, String, Long) => Unit,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      stats: FrizzleStats = new FrizzleStats,
      dlqDest: String = "dlq"): StreamingQuery = {
    // NULL validity means the predicate itself failed → dead-letter,
    // never silently dropped (a bare filter would exclude NULL from
    // both branches and lose the message); a NULL destination is a
    // routing failure → dead-letter too
    val stream = route.transform(source.receive(spark))
      .withColumn("__dest",
        when(coalesce(route.isValid, lit(false)), dest).otherwise(lit(null)))
      .withColumn("__dest", coalesce(col("__dest"), lit(dlqDest)))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        // §5 (memory/spill): persist ONLY the routing column, never the
        // transformed batch.  The full-batch persist parked the whole
        // epoch (payloads included — ~12M rows × ~300 B at sf10) on the
        // executor heap for the epoch's lifetime, which is what forced
        // delivery_report_audit's bench sample in r19.  The stats count
        // and the bounded destination list only need __dest (bytes per
        // row); each destination's write then recomputes the batch with
        // its filter — the route transform is NARROW by the ordering
        // contract above, so a recompute is one more pass over the
        // epoch's source files (bounded: one per destination) instead
        // of a corpus-sized persist, and per-partition order is
        // deterministic for a narrow transform so replays/recomputes
        // see identical frames.
        val cached = batch.select(col("__dest")).persist()
        try {
          stats.begin(checkpoint, epoch, cached.count())
          // bounded driver-side list: one row per DESTINATION (topic),
          // never per message
          val dests = cached.distinct()
            .collect().map(_.getString(0)).sorted
          // concurrent writes on a bounded pool: each destination's
          // write is an independent Spark job over the SAME persisted
          // batch, so issuing them together makes epoch wall-time ~max
          // not ~sum.  Await.result rethrows the first failure, so a
          // failed write still fails the epoch (at-least-once).
          if (dests.nonEmpty) {
            val pool = java.util.concurrent.Executors.newFixedThreadPool(
              math.min(dests.length, MaxConcurrentDestWrites))
            val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
            try {
              val writes = dests.toSeq.map { d =>
                scala.concurrent.Future {
                  writeBatch(batch.filter(col("__dest") === d).drop("__dest"), d, epoch)
                }(ec)
              }
              // await EVERY write before leaving the block — a failed
              // destination must not leave sibling writes running past
              // the epoch (an orphaned write could race the replay's
              // write into the same (dest, epoch) sink directory);
              // then rethrow the first failure so the epoch still fails
              val outcomes = writes.map(f => scala.util.Try(
                scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)))
              outcomes.collectFirst { case scala.util.Failure(e) => throw e }
              ()
            } finally { pool.shutdown() }
          }
          stats.commit(checkpoint, epoch)
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
