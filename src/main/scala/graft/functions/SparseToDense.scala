package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `sparse_to_dense(indices, values, n)` — scatter a sparse row (parallel
  * index/value arrays, 1-based indices) into a dense double array of length
  * `n`; missing positions are 0.0, duplicate indices keep the LAST value.
  *
  * The Spark-native analogue of the reference's COO→dense scatter
  * (reference: src/scdataset/transforms.py:138-222, scatter at :216-220):
  * there a whole batch is scattered into a (B, 62713) tensor with NumPy; here
  * each row scatters independently inside whole-stage codegen, so the
  * "batch" dimension is Spark's own vectorized row pipeline.
  *
  * A native Catalyst expression (not a UDF): null-safe, codegen'd — the
  * generated loop writes straight into an UnsafeArrayData-backed buffer with
  * no boxing or serialization boundary.
  */
case class SparseToDense(indices: Expression, values: Expression, n: Expression)
    extends TernaryExpression {

  override def first: Expression = indices
  override def second: Expression = values
  override def third: Expression = n

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = indices.dataType.isInstanceOf[ArrayType] &&
      indices.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      values.dataType.isInstanceOf[ArrayType] &&
      values.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
      n.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sparse_to_dense expects (array<bigint>, array<double>, int), got " +
        s"(${indices.dataType.sql}, ${values.dataType.sql}, ${n.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean =
    indices.nullable || values.nullable || n.nullable

  override protected def nullSafeEval(idx: Any, vals: Any, len: Any): Any = {
    val ia = idx.asInstanceOf[ArrayData]
    val va = vals.asInstanceOf[ArrayData]
    val size = len.asInstanceOf[Int]
    val out = new Array[Double](size)
    val m = math.min(ia.numElements(), va.numElements())
    var i = 0
    while (i < m) {
      val pos = ia.getLong(i)
      if (pos >= 1 && pos <= size) out(pos.toInt - 1) = va.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idx, vals, len) => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val pos = ctx.freshName("pos")
      s"""
         |double[] $out = new double[$len];
         |int $m = java.lang.Math.min($idx.numElements(), $vals.numElements());
         |for (int $i = 0; $i < $m; $i++) {
         |  long $pos = $idx.getLong($i);
         |  if ($pos >= 1 && $pos <= $len) {
         |    $out[(int) $pos - 1] = $vals.getDouble($i);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(indices = newFirst, values = newSecond, n = newThird)
}

object SparseToDense {
  /** Column-API entry point. */
  def sparseToDense(indices: Column, values: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    GraftBridge.column(SparseToDense(
      GraftBridge.expression(indices.cast(ArrayType(LongType))),
      GraftBridge.expression(values.cast(ArrayType(DoubleType))),
      GraftBridge.expression(lit(n))))
  }
}
