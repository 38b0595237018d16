package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a custom `TypedImperativeAggregate` — the
  * scale-correct alternative to the `row_number() OVER (...) <= k` window:
  * the window formulation shuffles and sorts EVERY row of every group,
  * while this aggregate keeps at most `2k` (score, id) pairs per partial
  * state, so the shuffle carries ≤2k entries per (partition, group)
  * instead of the whole group. Map-side combine stays enabled (state
  * merges associatively).
  *
  * Ordering: score DESC, id ASC tiebreak — total, so results are
  * deterministic and SQL-expressible for the oracle. Output is
  * `array<struct<score:double, id:bigint>>` sorted in rank order
  * (callers explode it into rows; oracle outputs never carry arrays).
  *
  * State pruning: inserts append; when the buffer exceeds 2k it is sorted
  * and truncated to k. Amortized O(log k)-ish per row without a heap
  * dependency, worst-case buffer 2k entries.
  */
case class TopKAgg(child: Expression, k: Int,
                   override val mutableAggBufferOffset: Int = 0,
                   override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.entryType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)]

  private def prune(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > 2 * k) {
      val kept = buf.sortBy { case (s, id) => (-s, id) }.take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buf += ((row.getDouble(0), row.getLong(1)))
        prune(buf)
      }
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    a ++= b
    prune(a)
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortBy { case (s, id) => (-s, id) }.take(k)
    new GenericArrayData(top.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_top_k"
}

object TopKAgg {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Column API: `topK(struct(score, id), k)` → sorted array of the k
    * highest-scoring entries (score DESC, id ASC).
    */
  def topK(scoreAndId: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(scoreAndId), k).toAggregateExpression())
}
