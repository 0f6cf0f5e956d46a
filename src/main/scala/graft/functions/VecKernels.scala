package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for embedding columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element with per-step allocations; these native
  * expressions compile to a primitive loop inside whole-stage codegen.
  * Both keep the exact IEEE association the oracle uses: a sequential left
  * fold from 0.0 in index order — so swapping them in changes nothing
  * bit-wise, only the cost.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, false) ||
        left.dataType == ArrayType(DoubleType, true)) {
      if (right.dataType.isInstanceOf[ArrayType]) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("dot expects array<double> inputs")
    } else TypeCheckResult.TypeCheckFailure("dot expects array<double> inputs")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val ba = b.asInstanceOf[ArrayData]
    val m = math.min(aa.numElements(), ba.numElements())
    var s = 0.0
    var i = 0
    while (i < m) { s += aa.getDouble(i) * ba.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential sum of squares (left fold from 0.0 in index order). */
case class Norm2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("norm2 expects array<double>")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < aa.numElements()) {
      val v = aa.getDouble(i); s += v * v; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sequential squared Euclidean distance: `s += (a_i−b_i)²` in index
  * order — the EXACT arithmetic (and association) of the k-means
  * assignment loop in [[graft.ops.MlOps.kmeansFit]], so an argmin over
  * this expression is bit-equal to the UDF loop it replaces (the norm-
  * algebra form `|a|²−2a·b+|b|²` is NOT: it can flip a near-tie by a
  * ulp, the exact failure MLlib's distance has). */
case class Dist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        right.dataType.isInstanceOf[ArrayType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("dist2 expects array<double> inputs")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val ba = b.asInstanceOf[ArrayData]
    // a silent min-length truncation would assign a corrupt short vector
    // to a wrong-but-plausible centroid; the k-means loop this kernel
    // replaces surfaces the mismatch, so this does too
    if (aa.numElements() != ba.numElements())
      throw new IllegalArgumentException(
        s"dist2: dimension mismatch ${aa.numElements()} vs ${ba.numElements()}")
    var s = 0.0
    var i = 0
    while (i < aa.numElements()) {
      val d = aa.getDouble(i) - ba.getDouble(i); s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $m = $a.numElements();
         |if ($m != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dist2: dimension mismatch " + $m + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecKernels {
  private val Dbl = ArrayType(DoubleType)

  /** Sequential dot product of two numeric arrays, in double. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a.cast(Dbl)), GraftBridge.expression(b.cast(Dbl))))

  /** Sequential squared L2 norm, in double. */
  def norm2(a: Column): Column =
    GraftBridge.column(Norm2(GraftBridge.expression(a.cast(Dbl))))

  /** Sequential squared Euclidean distance, in double — bit-equal to the
    * k-means assignment loop's arithmetic. */
  def dist2(a: Column, b: Column): Column =
    GraftBridge.column(Dist2(
      GraftBridge.expression(a.cast(Dbl)), GraftBridge.expression(b.cast(Dbl))))
}
