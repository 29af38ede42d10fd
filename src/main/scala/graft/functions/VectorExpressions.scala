package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Hashing.lshKeysData(input.asInstanceOf[ArrayData], numTables, planesPerTable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hashing.lshKeysData($c, $numTables, $planesPerTable)")
  override def prettyName: String = "cosine_lsh_keys"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity between two numeric-array columns (float or double
  * element type, any mix — resolved from the child dataTypes at plan
  * time), computed as a sequential left fold in double — bit-identical
  * to DuckDB's list_dot_product over DOUBLE[] (verified empirically), so
  * results are exactly reproducible cross-engine.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    Hashing.cosineGen(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isDouble(left), isDouble(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Hashing.cosineGen($a, $b, ${isDouble(left)}, ${isDouble(right)})")
  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sequential-fold dot product over numeric-array columns (float or
  * double, any mix) — the ADC/LUT scoring primitive; same order
  * semantics as [[CosineSim]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    Hashing.dotGen(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isDouble(left), isDouble(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Hashing.dotGen($a, $b, ${isDouble(left)}, ${isDouble(right)})")
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
