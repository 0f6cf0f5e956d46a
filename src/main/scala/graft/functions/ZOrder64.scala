package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `zorder64(a, b, bits)` — Morton interleave of two non-negative longs,
  * each truncated to its `bits` low bits: bit i of `a` lands at output
  * position 2i, bit i of `b` at 2i+1.
  *
  * A native Catalyst expression (not a UDF, not a 3·bits-term composed
  * column): the multi-dimensional clustering key of
  * [[graft.ops.LayoutOps.writeZOrdered]] evaluated as ONE tight codegen
  * loop inside the whole-stage pipeline — at a 100 TB clustered write the
  * key is computed once per row of the entire corpus, so its per-row cost
  * is the whole game.  `bits` must be a foldable int in 1..31.
  */
case class ZOrder64(a: Expression, b: Expression, bits: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = bits

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = a.dataType == LongType && b.dataType == LongType &&
      bits.dataType == IntegerType && bits.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 expects (bigint, bigint, foldable int), got " +
        s"(${a.dataType.sql}, ${b.dataType.sql}, ${bits.dataType.sql})")
  }

  override def dataType: DataType = LongType

  override def foldable: Boolean = children.forall(_.foldable)

  override protected def nullSafeEval(av: Any, bv: Any, nb: Any): Any = {
    val x = av.asInstanceOf[Long]
    val y = bv.asInstanceOf[Long]
    val n = nb.asInstanceOf[Int]
    var z = 0L
    var i = 0
    while (i < n) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, nb) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $nb; $i++) {
         |  $z |= (($av >> $i) & 1L) << (2 * $i);
         |  $z |= (($bv >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ZOrder64 =
    copy(a = newFirst, b = newSecond, bits = newThird)
}

object ZOrder64 {
  /** Column-API entry point. */
  def zorder64(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ZOrder64(
      GraftBridge.expression(a.cast(LongType)),
      GraftBridge.expression(b.cast(LongType)),
      GraftBridge.expression(lit(bits))))
  }
}
