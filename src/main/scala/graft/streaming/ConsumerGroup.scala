package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Consumer-group SEMANTICS image — the contract half of frafka's
  * "scale by adding consumers in one group" story (public frizzle
  * README: parallel Sources in a consumer group split the partition
  * set; frafka rides librdkafka's group protocol for assignment,
  * rebalance and committed-offset handoff).
  *
  * This container has no broker and no spark-sql-kafka connector jar,
  * so the WIRE leg stays env-gated ([[KafkaMsgSource]] + the e2e test
  * in StreamingSpec).  What CAN be CI-pinned — and is, against this
  * module — is every guarantee a frizzle user actually programs
  * against:
  *
  *  - each partition is owned by exactly ONE member per generation
  *    (range assignment, Kafka's default assignor shape);
  *  - membership change → rebalance → the new owner RESUMES each
  *    inherited partition from the group-committed offset: acked
  *    messages are never redelivered, unacked ones are (frafka's
  *    at-least-once);
  *  - per-partition delivery order is offset order, across polls and
  *    across rebalances;
  *  - a stale member (pre-rebalance generation) cannot commit — the
  *    fenced commit throws instead of double-acking (the
  *    ILLEGAL_GENERATION behavior that makes cross-owner double-Acks
  *    impossible).
  *
  * The shape is frizzle's PULL surface (Receive → [[GroupMember.poll]],
  * Ack → [[GroupMember.ack]]) rather than a Structured Streaming
  * source: group coordination is per-consumer sequential state, and
  * the pull image is the faithful one (frizzle's Source is a channel +
  * per-message Ack).  Polls hand back the message envelope as a
  * DataFrame so everything downstream is the same transport-agnostic
  * plan the file/Kafka transports feed.
  */
final class GroupLog(val nPartitions: Int) {
  require(nPartitions > 0, "a topic has at least one partition")
  private val parts =
    Array.fill(nPartitions)(mutable.ArrayBuffer.empty[(Long, String, Array[Byte])])

  /** Producer side: key-hash partitioning (same key → same partition
    * → total order among that key's messages, the routing contract
    * frafka inherits from Kafka's default partitioner — the hash
    * function differs, the guarantee does not).
    */
  def append(key: String, payload: Array[Byte]): (Int, Long) = synchronized {
    val p = math.floorMod(if (key == null) 0 else key.hashCode, nPartitions)
    val off = parts(p).length.toLong
    parts(p) += ((off, key, payload))
    (p, off)
  }

  def read(p: Int, from: Long, max: Int): Seq[(Long, String, Array[Byte])] =
    synchronized {
      // offsets are dense (append-only), so `from` indexes directly.
      // toIntExact, not toInt (r19, the DeltaProbe discipline): a
      // corrupt/overflowing committed offset must abort loudly, never
      // silently wrap into a wrong-but-plausible slice.
      val lo = Math.toIntExact(from.max(0L))
      val hi = Math.toIntExact((from.max(0L) + max).min(parts(p).length.toLong))
      parts(p).view.slice(lo, hi).toSeq
    }

  def endOffset(p: Int): Long = synchronized { parts(p).length.toLong }
}

/** Group-scoped state: membership, generation, committed offsets
  * (the __consumer_offsets image — offsets belong to the GROUP, not
  * the member, which is exactly what makes handoff seamless).
  */
final class GroupCoordinator(val log: GroupLog) {
  private val committed = Array.fill(log.nPartitions)(0L)
  private val members = mutable.LinkedHashSet.empty[String]
  private var gen = 0

  def generation: Int = synchronized(gen)

  def join(member: String): Int = synchronized {
    require(members.add(member), s"$member is already in the group")
    gen += 1
    gen
  }

  def leave(member: String): Int = synchronized {
    require(members.remove(member), s"$member is not in the group")
    gen += 1
    gen
  }

  /** Range assignment over sorted member ids (the RangeAssignor
    * shape): member i of m takes a contiguous run of n/m partitions,
    * the first n mod m members one extra.  Deterministic in the
    * membership set, so every member computes the same answer —
    * exactly-one-owner-per-partition is structural.
    */
  def assignment(member: String): Seq[Int] = synchronized {
    val ms = members.toSeq.sorted
    val i = ms.indexOf(member)
    require(i >= 0, s"$member is not in the group")
    val n = log.nPartitions
    val m = ms.length
    val base = n / m
    val extra = n % m
    val start = i * base + math.min(i, extra)
    val len = base + (if (i < extra) 1 else 0)
    start until (start + len)
  }

  def committedOffset(p: Int): Long = synchronized(committed(p))

  /** Commit with generation fencing: only a member at the CURRENT
    * generation that owns `p` may advance its offset — a stale
    * member's commit after a rebalance throws (no cross-owner
    * double-ack, ever).  Offsets move forward only; re-committing an
    * already-committed offset is a no-op (idempotent ack under
    * at-least-once replay).
    */
  def commit(member: String, memberGen: Int, p: Int, upTo: Long): Unit = synchronized {
    require(memberGen == gen,
      s"stale generation $memberGen (current $gen): the group rebalanced — re-poll before committing")
    require(assignment(member).contains(p),
      s"$member does not own partition $p in generation $gen")
    if (upTo > committed(p)) committed(p) = upTo
  }
}

/** One consumer instance.  `poll` detects a generation change lazily
  * (the next poll after any membership change re-derives the
  * assignment and drops fetch positions — the rebalance callback
  * image), so inherited partitions resume from the group-committed
  * offset: at-least-once, never double-delivery of acked messages.
  */
final class GroupMember(val coordinator: GroupCoordinator, val member: String) {
  private var gen = coordinator.join(member)
  private val positions = mutable.Map.empty[Int, Long]

  def generation: Int = gen

  /** Fetch up to `max` messages per owned partition as the standard
    * envelope (+ partition/offset for ack bookkeeping).  First fetch
    * of a partition after a (re)balance starts at the group-committed
    * offset; later fetches continue from the last delivered offset
    * (redelivery happens at rebalance or restart, not every poll —
    * Kafka's position-vs-committed distinction).
    */
  def poll(s: SparkSession, max: Int = 1000): DataFrame = {
    val cur = coordinator.generation
    if (cur != gen) { gen = cur; positions.clear() }
    val rows = coordinator.assignment(member).flatMap { p =>
      val from = positions.getOrElse(p, coordinator.committedOffset(p))
      val msgs = coordinator.log.read(p, from, max)
      if (msgs.nonEmpty) positions(p) = msgs.last._1 + 1
      msgs.map { case (off, k, v) => (s"$p-$off", k, v, p, off) }
    }
    import s.implicits._
    rows.toDF("msg_id", "key", "payload", "partition", "offset")
  }

  /** Ack every message of `p` up to AND INCLUDING `offset` — frafka's
    * commit granularity is the per-partition offset watermark, not
    * the individual message.
    */
  def ack(p: Int, offset: Long): Unit = coordinator.commit(member, gen, p, offset + 1)

  /** Leave the group (clean shutdown → immediate rebalance). */
  def close(): Unit = { coordinator.leave(member); () }
}
