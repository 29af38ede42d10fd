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

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a native
  * TypedImperativeAggregate. The buffer is a depth x width matrix of
  * counters; each input increments one counter per row (row-seeded md5
  * hash of the value), buffers merge by elementwise addition — so the
  * sketch rides Spark's normal map-side partial aggregation and the
  * streaming state store, with memory bounded by depth*width regardless
  * of key cardinality. Point estimates (CmsEstimate) take the min over
  * rows: always >= the true count; equal to it when the key collides
  * with no other key in at least one row. Hashing is deterministic
  * (value- and row-dependent only), so estimates are reproducible
  * across runs and partitionings.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var r = 0
      while (r < depth) {
        buf(r * width + CmsUtil.cell(r, v, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "countmin_agg"
}

object CmsUtil {
  /** Counter column for (row, value): first 12 hex chars of
    * md5("row:value") mod width — value-deterministic, row-independent
    * hash families, reproducible across engines and partitionings. */
  def cell(row: Int, v: Any, width: Int): Int = {
    val s = v match {
      case u: UTF8String => u.toString
      case other => other.toString
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$row:$s".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }
}

/** Point-frequency estimate against a CountMinAgg sketch: min over the
  * depth rows of the value's counter — an upper bound on the true count. */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override protected def nullSafeEval(sketch: Any, value: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val bb = ByteBuffer.wrap(bytes)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = bb.getLong((r * width + CmsUtil.cell(r, value, width)) * 8)
      if (c < best) best = c
      r += 1
    }
    best
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}
