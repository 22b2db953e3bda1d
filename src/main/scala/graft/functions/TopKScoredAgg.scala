package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a `TypedImperativeAggregate`: the canonical
  * sketch-style aggregate — bounded mutable buffer (≤2k candidates),
  * partial aggregation combines map-side, only winners cross the
  * shuffle.  Runs on the untyped DataFrame path (no row re-encoding,
  * unlike an `Aggregator`+kryo).  Output: `array<struct<id,score>>`
  * sorted by (score desc, id asc) — a total order, so the result is
  * deterministic under any merge order.
  */
case class TopKScoredAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {
  require(k > 0)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  private def trim(b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    if (b.length <= 2 * k) b
    else {
      val kept = b.sortBy(t => (-t._1, t._2)).take(k)
      b.clear(); b ++= kept; b
    }

  override def update(b: ArrayBuffer[(Double, Long)], row: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(row)
    val i = id.eval(row)
    if (s != null && i != null) trim(b += ((s.asInstanceOf[Double], i.asInstanceOf[Long])))
    else b
  }

  override def merge(b: ArrayBuffer[(Double, Long)], o: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    trim(b ++= o)

  override def eval(b: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(b.sortBy(t => (-t._1, t._2)).take(k)
      .map(t => InternalRow(t._2, t._1)).toArray[Any])

  override def serialize(b: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { val s = in.readDouble(); val id = in.readLong(); b += ((s, id)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKScoredAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScoredAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKScoredAgg =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "top_k_scored"
}

object TopKScoredAgg {
  import org.apache.spark.sql.graftshim.ColumnShim
  def topKScored(score: Column, id: Column, k: Int): Column =
    ColumnShim.column(TopKScoredAgg(ColumnShim.expression(score), ColumnShim.expression(id), k)
      .toAggregateExpression())
}
