package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a native aggregate: each partial holds AT MOST k
  * (rank_val, id) pairs, partials merge by keeping the best k — so a
  * top-k-per-group query shuffles ≤ k rows per group per partition
  * instead of the full group. That is the scale difference vs the window
  * formulation (q04's `row_number() ≤ k`), which must shuffle and sort
  * EVERY row of every group to rank them; at 100 TB with bounded k the
  * window's shuffle is the whole table while this aggregate's is
  * k × partitions × groups.
  *
  * Ordering is total and deterministic: larger `rank_val` wins, ties
  * break to the SMALLER `id` — so the result is layout-independent
  * (TopKAggSpec pins parity with the window form across partitionings).
  * Null rank or id rows are skipped. `eval` emits the pairs best-first
  * as an array of (rank_val, id) structs.
  */
case class TopKAgg(
    rankVal: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  override def checkInputDataTypes(): TypeCheckResult =
    (rankVal.dataType, id.dataType) match {
      case (LongType, LongType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case (LongType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"graft_top_k k must be positive, got $k")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_top_k requires (bigint, bigint), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  /** Total order, best pair first: larger rank_val, ties to smaller id.
    * Explicit compares — a negate-the-value key (-v, i) would overflow at
    * rank_val = Long.MinValue and invert that pair's position. The heap
    * is ordered by this too: PriorityQueue surfaces its MAXIMUM, which
    * under best-first is the WORST kept pair — exactly the eviction
    * candidate.
    */
  private val bestFirst: Ordering[(Long, Long)] =
    new Ordering[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val byVal = java.lang.Long.compare(b._1, a._1) // larger v first
        if (byVal != 0) byVal else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(bestFirst)

  private def offer(
      buf: mutable.PriorityQueue[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size < k) { buf.enqueue(p); () }
    else if (bestFirst.compare(p, buf.head) < 0) {
      // p is strictly better than the current worst
      buf.dequeue(); buf.enqueue(p); ()
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val v = rankVal.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      offer(buf, (v.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Long, Long)],
      b: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val best = buf.toArray.sorted(bestFirst)
    new GenericArrayData(best.map { case (v, i) =>
      new GenericInternalRow(Array[Any](v, i))
    })
  }

  override def serialize(
      buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, i) => out.writeLong(v); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("rank_val", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(rankVal, id)

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(rankVal = newChildren(0), id = newChildren(1))
}
