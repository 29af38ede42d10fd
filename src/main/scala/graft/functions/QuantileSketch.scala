package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch as a native TypedImperativeAggregate — a
  * single-level KLL-style compactor with deterministic alternation in
  * place of coin flips (reproducible runs, no Math.random in the plan).
  *
  * The buffer is a list of (value, weight) pairs. While total item count
  * stays <= capacity every weight is 1 and eval() returns EXACT type-1
  * (discrete) quantiles — the value at 1-indexed rank ceil(q*n) — which is
  * precisely DuckDB's quantile_disc, so the oracle checks it value-for-
  * value at test scale. Past capacity the buffer sorts and pairwise
  * collapses (keep alternating pair ends, weights add), keeping memory
  * bounded at ~capacity entries with rank error O(W/capacity) — the same
  * plan stays a safe one-pass bounded-memory aggregate at 100 TB.
  *
  * Buffers merge by concatenation + compaction, so Spark runs map-side
  * partial aggregation like any builtin agg.
  */
case class QuantileSketch(
    child: Expression,
    probs: Seq[Double],
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buf] {
  import QuantileSketch.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf(parity = false, new ArrayBuffer)

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.toString.toDouble
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.items += ((toDouble(v), 1L))
      if (buf.items.length > capacity) compact(buf)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.items ++= b.items
    if (a.items.length > capacity) compact(a)
    a
  }

  /** Sort by value, collapse adjacent pairs into one entry with summed
    * weight; which end of each pair survives alternates per compaction
    * (the deterministic stand-in for KLL's coin flip).
    */
  private def compact(buf: Buf): Unit = {
    val sorted = buf.items.sortBy(x => (x._1, x._2))
    val out = new ArrayBuffer[(Double, Long)](sorted.length / 2 + 1)
    val keepFirst = buf.parity
    var i = 0
    while (i + 1 < sorted.length) {
      val (v1, w1) = sorted(i)
      val (v2, w2) = sorted(i + 1)
      out += (((if (keepFirst) v1 else v2), w1 + w2))
      i += 2
    }
    if (i < sorted.length) out += sorted(i)
    buf.items.clear()
    buf.items ++= out
    buf.parity = !buf.parity
  }

  override def eval(buf: Buf): Any = {
    if (buf.items.isEmpty) return new GenericArrayData(probs.map(_ => 0.0).toArray)
    val sorted = buf.items.sortBy(x => (x._1, x._2))
    val total = sorted.iterator.map(_._2).sum
    val out = probs.map { q =>
      val target = math.ceil(q * total).toLong.max(1L)
      var cum = 0L
      var i = 0
      var res = sorted.last._1
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= target) { res = sorted(i)._1; found = true }
        i += 1
      }
      res
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + buf.items.length * 16)
    bb.put(if (buf.parity) 1.toByte else 0.toByte)
    bb.putInt(buf.items.length)
    buf.items.foreach { case (v, w) => bb.putDouble(v); bb.putLong(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val parity = bb.get() == 1.toByte
    val n = bb.getInt
    val items = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { items += ((bb.getDouble, bb.getLong)); i += 1 }
    new Buf(parity, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketch {
  /** Mutable sketch buffer: weighted items + compaction parity. */
  final class Buf(var parity: Boolean, val items: ArrayBuffer[(Double, Long)])
}
