package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Norm2, SparseToDense, ZOrder64}

/** Session-extension entry point: registers the engine's native codegen
  * expressions as SQL functions, so `spark.sql` users (and pure-SQL
  * notebooks) reach them without the Scala Column API:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * For a session that already exists (the config path only applies at
  * session build), use [[GraftExtensions.register]].
  *
  * Functions (all whole-stage-codegen'd, see [[graft.functions]]):
  *  - `vec_dot(a, b)`        — dot product over array<double>
  *  - `vec_norm2(a)`         — squared L2 norm over array<double>
  *  - `sparse_to_dense(i, v, n)` — scatter (indices, values) into a dense
  *    length-n array<double> (U6)
  *  - `zorder64(a, b, bits)`  — Morton interleave for multi-dimensional
  *    clustered layouts
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // whole-operator plan nodes (logical node + physical strategy) and
    // the pushdown rule Catalyst can't derive for a black-box node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinKeyFilterPushdown)
  }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private def entry(name: String, clazz: Class[_], arity: Int,
      build: Builder): (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, null, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments")
        build(args)
      })

  private val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    entry("vec_dot", classOf[DotProduct], 2,
      args => DotProduct(args(0), args(1))),
    entry("vec_norm2", classOf[Norm2], 1, args => Norm2(args(0))),
    entry("sparse_to_dense", classOf[SparseToDense], 3,
      args => SparseToDense(args(0), args(1), args(2))),
    entry("zorder64", classOf[ZOrder64], 3,
      args => ZOrder64(args(0), args(1), args(2))))

  /** Register the functions on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
