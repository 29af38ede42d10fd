package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * The data-skipping workhorse behind Delta OPTIMIZE ZORDER BY and
  * Iceberg's sort-order z-curves: interleaving the bits of two sort
  * dimensions produces a single clustering key whose RANGES are compact
  * in BOTH dimensions, so writing files in z-key order gives every file
  * narrow min/max stats on every participating column — a range
  * predicate on EITHER dimension prunes most files at planning time.
  * A single-column sort gets skipping on that column only; z-order
  * trades a little locality on each dimension for skipping on all of
  * them. At 100 TB the effect is the difference between scanning one
  * dimension's worth of files and scanning everything.
  *
  * Bit-interleave by binary magic numbers (the standard O(log w)
  * parallel-prefix spread — public bit-twiddling folklore): spread each
  * 16-bit input across the even bits of a long, shift one operand up,
  * OR. Exactly reproducible anywhere, including the relational replay
  * the q87 oracle does with shift/mask arithmetic in SQL.
  */
object Layout {
  /** Spread the low 16 bits of v across even bit positions (0,2,..,30). */
  @inline def spread16(v: Int): Long = {
    var x = (v & 0xffff).toLong
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton code of two 16-bit coordinates: x on even bits,
    * y on odd bits. Inputs outside [0, 65535] are masked to 16 bits —
    * callers bucket/modulo their dimensions first (q87 does).
    */
  def morton2(x: Int, y: Int): Long = spread16(x) | (spread16(y) << 1)
}

/** zorder2(x, y): 32-bit Morton interleave of two int coordinates
  * (codegen'd static call; stays inside whole-stage codegen). Declares
  * int inputs so a mistyped call fails at analysis time with standard
  * numeric coercions applied.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq[DataType](IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    Layout.morton2(l.asInstanceOf[Int], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Layout.morton2($a, $b)")
  override def prettyName: String = "zorder2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
