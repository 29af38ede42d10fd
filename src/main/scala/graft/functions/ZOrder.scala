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

  /** Bits each of N interleaved dimensions gets in a 63-bit key:
    * 16 (the 2-D operating point) down to 63/n for wide curves.
    */
  def bitsPerDim(n: Int): Int = math.min(16, 63 / n)

  /** N-way Morton interleave: output bit (b*n + d) = coords(d) bit b.
    * For n == 2 and bits == 16 this is EXACTLY [[morton2]] (x on even
    * bits, y on odd), so the 2-D operating point is unchanged. Plain
    * O(bits·n) loop — static call, stays inside whole-stage codegen.
    */
  def mortonN(coords: Array[Int], bits: Int): Long = {
    val n = coords.length
    var out = 0L
    var b = 0
    while (b < bits) {
      var d = 0
      while (d < n) {
        out |= ((coords(d).toLong >> b) & 1L) << (b * n + d)
        d += 1
      }
      b += 1
    }
    out
  }
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

/** zorderN(x1, …, xn): N-way Morton interleave of int coordinates,
  * each masked to [[Layout.bitsPerDim]](n) bits — the arity-N curve
  * behind OPTIMIZE ZORDER BY on more than two columns. For n == 2 the
  * key equals [[ZOrder2]] bit for bit. NULL coordinates propagate NULL
  * (a null dimension has no z-position; OPTIMIZE scales its inputs
  * null-free).
  */
case class ZOrderN(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {
  require(children.size >= 2, "zorderN needs at least two dimensions")
  override def inputTypes: Seq[DataType] = children.map(_ => IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)
  private lazy val bits = Layout.bitsPerDim(children.size)
  private lazy val mask = (1 << bits) - 1
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val coords = new Array[Int](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Int] & mask
      i += 1
    }
    Layout.mortonN(coords, bits)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zcoords")
    // isNull latches once set; later children still evaluate (cheap,
    // side-effect-free) so the emitted code stays straight-line
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code.toString}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |else { $arr[$i] = ${e.value} & $mask; }""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        int[] $arr = new int[${children.size}];
        $assigns
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.Layout.mortonN($arr, $bits);
        }""")
  }
  override def prettyName: String = "zorder_n"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
