package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Distributed Bloom filter as a native mergeable aggregate.
  *
  * The buffer is a fixed-size bit array; per-partition buffers OR together,
  * so Spark builds the filter with ordinary map-side partial aggregation —
  * no driver-side `.collect()` (unlike `DataFrameStatFunctions.bloomFilter`,
  * which assembles the filter on the driver). The one-row binary result
  * broadcasts into downstream probes.
  *
  * Bit probes use double hashing (Kirsch-Mitzenmacher 2006): bit_i =
  * (h1 + i*h2) mod m over the two 64-bit halves of md5(value) — k probes
  * from one digest, deterministic across engines and runs.
  */
object BloomUtil {
  def hashPair(v: Any): (Long, Long) = {
    val s = v match {
      case u: UTF8String => u.toString
      case other => other.toString
    }
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val bb = ByteBuffer.wrap(d)
    (bb.getLong, bb.getLong)
  }
  def bit(h1: Long, h2: Long, i: Int, numBits: Int): Int = {
    val x = (h1 + i.toLong * h2) % numBits
    (if (x < 0) x + numBits else x).toInt
  }
}

case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(numBits % 64 == 0, "numBits must be a multiple of 64")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) = BloomUtil.hashPair(v)
      var i = 0
      while (i < numHashes) {
        val b = BloomUtil.bit(h1, h2, i, numBits)
        buf(b >>> 6) |= (1L << (b & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_agg"
}

/** Probe: true if `value` may be in the serialized bloom filter `bloom`
  * (no false negatives; false-positive rate set by the build's m and k).
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(bloom: Any, value: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    val numBits = bytes.length * 8
    val (h1, h2) = BloomUtil.hashPair(value)
    var i = 0
    while (i < numHashes) {
      val b = BloomUtil.bit(h1, h2, i, numBits)
      // the build serializes the long[] big-endian: bit (b & 63) of long
      // (b >>> 6) lives in byte 7-((b & 63) >>> 3) of that 8-byte group
      val byteIdx = (b >>> 6) * 8 + 7 - ((b & 63) >>> 3)
      if ((bytes(byteIdx) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
