package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy hitters (Metwally et al.) as a
  * `TypedImperativeAggregate` — the bounded-memory answer to "what are
  * the frequent terms" when the vocabulary itself won't fit anywhere:
  * each partial tracks at most `capacity` counters, partials combine
  * map-side, and only `capacity`-sized summaries ever cross the
  * shuffle (vs the exact [[graft.operators.TextOps]] `top_terms` path,
  * which shuffles the full term universe).
  *
  * Guarantees (the classic ones, preserved under merge à la Agarwal et
  * al.'s mergeable summaries): for every tracked term,
  * `est − err ≤ true ≤ est`; any term with true count > N/capacity is
  * tracked.  Merge substitutes an absent term's count in the other
  * summary with that summary's minimum counter (its proven upper bound
  * on anything it is not tracking) on BOTH est and err, then re-trims
  * to `capacity` — so the over-estimate invariant survives arbitrary
  * merge trees.
  *
  * Eviction and trim order by (count, err, term) — a total order, so a
  * fixed partitioning yields a fixed summary.
  */
/** The Space-Saving kernel, shared by the [[SpaceSavingAgg]] Catalyst
  * aggregate and the streaming
  * [[graft.streaming.Stateful]].trendingTerms monitor — one
  * implementation of update/merge/top so both deployments carry the
  * same guarantees.
  */
object SpaceSaving {
  type Summary = mutable.HashMap[String, (Long, Long)]

  def minEntry(b: Summary): (String, (Long, Long)) =
    b.minBy { case (t, (c, e)) => (c, e, t) }

  def update(b: Summary, t: String, capacity: Int): Unit =
    b.get(t) match {
      case Some((c, e)) => b(t) = (c + 1, e)
      case None if b.size < capacity => b(t) = (1L, 0L)
      case None =>
        val (evict, (minC, _)) = minEntry(b)
        b.remove(evict)
        b(t) = (minC + 1, minC)
    }

  /** Mergeable-summaries merge into `b` (see [[SpaceSavingAgg]]). */
  def merge(b: Summary, o: Summary, capacity: Int): Summary = {
    if (o.isEmpty) return b
    if (b.isEmpty) { b ++= o; return b }
    val minB = if (b.size >= capacity) minEntry(b)._2._1 else 0L
    val minO = if (o.size >= capacity) minEntry(o)._2._1 else 0L
    val keys = b.keySet ++ o.keySet
    val merged = keys.map { t =>
      val (cb, eb) = b.getOrElse(t, (minB, minB))
      val (co, eo) = o.getOrElse(t, (minO, minO))
      t -> (cb + co, eb + eo)
    }.toSeq
    val kept =
      if (merged.size <= capacity) merged
      else merged.sortBy { case (t, (c, e)) => (-c, e, t) }.take(capacity)
    b.clear(); b ++= kept; b
  }

  def top(b: Summary, k: Int): Seq[(String, Long, Long)] =
    b.toSeq.sortBy { case (t, (c, e)) => (-c, e, t) }.take(k)
      .map { case (t, (c, e)) => (t, c, e) }
}

case class SpaceSavingAgg(
    term: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {
  require(capacity > 0 && k > 0 && k <= capacity)

  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, (Long, Long)],
      row: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = term.eval(row)
    if (v == null) return b
    SpaceSaving.update(b, v.asInstanceOf[UTF8String].toString, capacity)
    b
  }

  override def merge(b: mutable.HashMap[String, (Long, Long)],
      o: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] =
    SpaceSaving.merge(b, o, capacity)

  override def eval(b: mutable.HashMap[String, (Long, Long)]): Any =
    new GenericArrayData(SpaceSaving.top(b, k).map { case (t, c, e) =>
      InternalRow(UTF8String.fromString(t), c, e)
    }.toArray[Any])

  override def serialize(b: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (t, (c, e)) =>
      out.writeUTF(t); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) { val t = in.readUTF(); val c = in.readLong(); val e = in.readLong(); b(t) = (c, e); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(term = c(0))
  override def prettyName: String = "space_saving"
}

object SpaceSavingAgg {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Top-`k` heavy-hitter candidates among ≤`capacity` tracked
    * counters: `array<struct<term, est, err>>` with `est − err ≤ true
    * ≤ est`.
    */
  def spaceSaving(term: Column, capacity: Int, k: Int): Column =
    ColumnShim.column(SpaceSavingAgg(ColumnShim.expression(term), capacity, k)
      .toAggregateExpression())
}
