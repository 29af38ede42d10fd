package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** K-Minimum-Values distinct-count sketch (Bar-Yossef 2002) as a native
  * Catalyst TypedImperativeAggregate — the extension rung for mergeable
  * sketch state. The buffer is the set of the k smallest 48-bit hashes of
  * the distinct inputs; buffers merge by set-union + trim, so Spark runs
  * it with map-side partial aggregation like any builtin.
  *
  * Estimate: exact |set| when fewer than k distinct values were seen,
  * else (k-1) * 2^48 / kthMin. The hash is the first 12 hex chars of
  * md5(value-as-string), which DuckDB reproduces exactly
  * (('0x'||substr(md5(v::VARCHAR),1,12))::BIGINT) — so even this sketch
  * is oracle-checkable bit-for-bit.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("kth_min", LongType, nullable = false),
    StructField("n_heap", LongType, nullable = false),
    StructField("est_distinct", DoubleType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def hash48(v: Any): Long = {
    val s = v match {
      case u: UTF8String => u.toString
      case other => other.toString
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(hash48(v))
      while (buf.size > k) buf.remove(buf.last())
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.remove(a.last())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    val kth = if (n == 0) 0L else buf.last().longValue()
    val est =
      if (n < k) n.toDouble
      else (k - 1).toDouble * 281474976710656.0 / kth // 2^48
    InternalRow(kth, n.toLong, est)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}
