package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_structs(text, n)` — lowercase whitespace tokens sliced into
  * sliding n-grams of `(w1..wn)` structs, in ONE native pass over the
  * string.
  *
  * Exactly the semantics of the composed column
  * `transform(sequence(...), i -> struct(element_at(toks, i), ...))` over
  * `filter(split(lower(text), "\\s+"), _ != '')` — but the composed form
  * runs the higher-order lambdas INTERPRETED, per element, per row, which
  * is the measured kernel cost of the n-gram LM queries (the corpus-side
  * extraction dominates text_bigram_lm / text_sbo_lm / text_pmi_top).
  * Here tokenization and slicing are a single tight loop; `doGenCode`
  * emits a static call so the whole-stage pipeline is never broken.
  * Documents with fewer than n tokens yield an empty array.  `n` must be
  * a foldable int ≥ 2. */
case class NgramStructs(text: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = text.dataType == StringType && n.dataType == IntegerType &&
      n.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_structs expects (string, foldable int), got " +
        s"(${text.dataType.sql}, ${n.dataType.sql})")
  }

  private lazy val arity: Int =
    n.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(
    StructType((1 to arity).map(i =>
      StructField(s"w$i", StringType, nullable = false))),
    containsNull = false)

  override def foldable: Boolean = children.forall(_.foldable)

  override protected def nullSafeEval(t: Any, nn: Any): Any =
    NgramStructs.compute(t.asInstanceOf[UTF8String], nn.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nn) => {
      s"""
         |${ev.value} = graft.functions.NgramStructs.compute($t, $nn);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NgramStructs =
    copy(text = newLeft, n = newRight)
}

object NgramStructs {

  /** Java-regex-`\s` whitespace (what `split(lower(text), "\\s+")` splits
    * on for ASCII corpora): space, tab, LF, VT, FF, CR. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  def compute(text: UTF8String, n: Int): ArrayData = {
    // UTF8String.toLowerCase == Spark's lower() — NOT java default-locale
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[UTF8String](32)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(UTF8String.fromString(s.substring(start, i)))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val fields = new Array[Any](n)
      var k = 0
      while (k < n) { fields(k) = toks.get(j + k); k += 1 }
      out(j) = InternalRow.fromSeq(fields.toIndexedSeq)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def ngramStructs(text: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NgramStructs(
      GraftBridge.expression(text),
      GraftBridge.expression(lit(n))))
  }

  /** [[TextOps.wordShingles]]' semantics in the same one-pass kernel:
    * space-joined k-shingle STRINGS, and a document with fewer than k
    * tokens yields ONE shingle = the whole token string (an empty doc
    * yields [""]) — the shingle convention of the fingerprint/coverage
    * tier. */
  def shingleCompute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String](32)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) {
      val all = new java.lang.StringBuilder()
      var j = 0
      while (j < toks.size) {
        if (j > 0) all.append(' ')
        all.append(toks.get(j)); j += 1
      }
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(all.toString)))
    }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k)); k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `ngram_strings(text, n)` — [[NgramStructs]]' sibling emitting the
  * space-joined shingle strings of [[graft.ops.TextOps.wordShingles]]
  * (including its whole-string rule for sub-n documents), one native
  * pass. */
case class NgramStrings(text: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = text.dataType == StringType && n.dataType == IntegerType &&
      n.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_strings expects (string, foldable int), got " +
        s"(${text.dataType.sql}, ${n.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)

  override def foldable: Boolean = children.forall(_.foldable)

  override protected def nullSafeEval(t: Any, nn: Any): Any =
    NgramStructs.shingleCompute(t.asInstanceOf[UTF8String],
      nn.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nn) => {
      s"""
         |${ev.value} = graft.functions.NgramStructs.shingleCompute($t, $nn);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NgramStrings =
    copy(text = newLeft, n = newRight)
}

object NgramStrings {
  /** Column-API entry point. */
  def ngramStrings(text: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NgramStrings(
      GraftBridge.expression(text),
      GraftBridge.expression(lit(n))))
  }
}
