package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `morton_code(x, y)`: the Morton (Z-order) code of two non-negative
  * BIGINT keys — bit i of x lands at position 2i, bit i of y at 2i+1 —
  * as a native Catalyst expression with whole-stage codegen.
  *
  * This is the sort key behind space-filling-curve data layout
  * (`OPTIMIZE ZORDER BY` in lakehouse table formats): rows sorted by
  * their Morton code cluster into files whose zone maps are tight in
  * BOTH dimensions at once (see q267's pruning audit). The composed
  * alternative — a sum of `(x div 2^i) % 2 * 4^i` terms — is 6
  * arithmetic ops per BIT; this expression is the classic
  * magic-number bit spread: 5 shift/mask rounds per side + one OR, 11
  * long ops per ROW regardless of width, branch-free, fused into the
  * surrounding whole-stage-codegen'd projection. On the write path at
  * 100 TB the Morton code is computed once per row for the
  * `repartitionByRange` — this is that hot loop.
  *
  * Semantics (pinned by `MortonCodeSpec` against the arithmetic form):
  *  - the low 32 bits of each input interleave into one 64-bit code;
  *    callers bucket keys below 2^32 first (q267 uses `% 32`);
  *  - inputs must be BIGINT; NULL in -> NULL out (null-intolerant);
  *  - the code equals the q267 arithmetic expression exactly for
  *    inputs in [0, 2^32).
  */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"morton_code requires bigint inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "morton_code"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = MortonCode.spread(a.asInstanceOf[Long])
    val y = MortonCode.spread(b.asInstanceOf[Long])
    x | (y << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("mx")
      val y = ctx.freshName("my")
      def spreadCode(v: String): String =
        s"""$v = $v & 0xFFFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2))  & 0x3333333333333333L;
           |$v = ($v | ($v << 1))  & 0x5555555555555555L;""".stripMargin
      s"""
        long $x = $a;
        ${spreadCode(x)}
        long $y = $b;
        ${spreadCode(y)}
        ${ev.value} = $x | ($y << 1);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
}
