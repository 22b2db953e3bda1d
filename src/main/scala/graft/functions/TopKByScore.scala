package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Grouped top-k as a typed `Aggregator`: every partition keeps at most
  * ~2k candidates, partial aggregation combines map-side, and only the
  * k winners per group cross the shuffle — unlike a row_number window,
  * which shuffles every scored candidate row to the group's partition.
  * Total order (score desc, id asc) makes the result deterministic
  * under any merge order.
  */
case class ScoredId(id: Long, score: Double)

class TopKByScore(k: Int)
    extends Aggregator[ScoredId, ArrayBuffer[ScoredId], Seq[ScoredId]] {
  require(k > 0)

  override def zero: ArrayBuffer[ScoredId] = ArrayBuffer.empty

  private def trim(b: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] =
    if (b.length <= 2 * k) b
    else {
      val kept = b.sortBy(s => (-s.score, s.id)).take(k)
      b.clear(); b ++= kept; b
    }

  override def reduce(b: ArrayBuffer[ScoredId], a: ScoredId): ArrayBuffer[ScoredId] =
    trim(b += a)

  override def merge(x: ArrayBuffer[ScoredId], y: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] =
    trim(x ++= y)

  override def finish(b: ArrayBuffer[ScoredId]): Seq[ScoredId] =
    b.sortBy(s => (-s.score, s.id)).take(k).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[ScoredId]] = Encoders.kryo
  override def outputEncoder: Encoder[Seq[ScoredId]] = Encoders.kryo
}
