package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native aggregate: one pass,
  * ≤ `k` counters of state per partial aggregate, mergeable map-side —
  * the bounded-memory candidate generator for heavy-hitter queries at
  * 100 TB, where an exact `groupBy(item)` would shuffle every distinct
  * item (for raw tokens: the whole vocabulary) just to discard all but
  * the top handful.
  *
  * Deterministic guarantee (independent of row order AND partition
  * layout): every item with true frequency > n/(k+1) survives in the
  * final sketch. Partial sketches merge by summing counters and then
  * subtracting the (k+1)-th largest counter value from all (Agarwal et
  * al., "Mergeable Summaries", PODS 2012), which preserves the global
  * n/(k+1) error bound — so a two-pass plan (sketch → exact count of
  * the ≤ k candidates) returns the EXACT heavy-hitter set with a
  * shuffle bounded by k rows per partition. MisraGriesSpec
  * property-tests the superset guarantee across partitionings.
  *
  * `eval` returns the candidate items sorted ascending (counter values
  * are approximations and deliberately not exposed — the exact pass is
  * where counts come from).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_misra_gries k must be positive, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_misra_gries requires a string item, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // classic MG decrement step: the incoming item and one unit of
        // every counter cancel out — ≤ n/(k+1) such events total
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace { (key, c) =>
          if (c == 1L) dead += key
          c - 1L
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, c) =>
      a.update(item, a.getOrElse(item, 0L) + c)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from all; ≤ k survive
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (key, c) =>
        if (c <= cut) dead += key
        c - cut
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_)))

  // length-prefixed raw UTF-8, NOT writeUTF: writeUTF caps one string at
  // 64 KB and a single giant whitespace-free token (base64 blob, minified
  // JS) would crash the buffer exchange instead of sketching
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
