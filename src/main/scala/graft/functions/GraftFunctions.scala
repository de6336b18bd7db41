package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the library's native expressions, so `spark.sql`
  * users get the codegen'd kernels by name (`dot_long`, `sqdist_long`, …)
  * instead of re-deriving the HOF formulations.
  *
  * Two entry points, same function table:
  *  - [[GraftFunctions.register]] for an already-built session (what
  *    Verify/Bench/tests use);
  *  - [[GraftExtensions]] for cluster deployments that inject via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build — the SparkSessionExtensions path, where the library cannot
  *    touch the builder.
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def binary(name: String, clazz: Class[_], usage: String,
      mk: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(clazz, name, usage), { children =>
      require(children.length == 2, s"$name expects exactly 2 arguments")
      mk(children(0), children(1))
    })

  /** The full function table (name, info, builder). */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    binary("dot_long", classOf[DotLong],
      "_FUNC_(a, b) - exact integer dot product of two ARRAY<BIGINT>",
      DotLong.apply),
    binary("dot_double", classOf[DotDouble],
      "_FUNC_(a, b) - sequential-fold dot product of two ARRAY<DOUBLE>",
      DotDouble.apply),
    binary("sqdist_long", classOf[SqDistLong],
      "_FUNC_(a, b) - exact squared L2 distance of two ARRAY<BIGINT>",
      SqDistLong.apply),
    binary("sqdist_double", classOf[SqDistDouble],
      "_FUNC_(a, b) - sequential-fold squared L2 distance of two ARRAY<DOUBLE>",
      SqDistDouble.apply),
    binary("student_t_sf", classOf[StudentTSf],
      "_FUNC_(t, df) - Student-t survival function 1 - CDF(t)",
      StudentTSf.apply),
    (FunctionIdentifier("simhash30"),
      info(classOf[SimHash30], "simhash30",
        "_FUNC_(a) - one-pass 30-bit SimHash of an ARRAY<BIGINT>"),
      { children =>
        require(children.length == 1, "simhash30 expects exactly 1 argument")
        SimHash30(children.head)
      }))

  /** Register every function on an existing session (idempotent —
    * re-registration overwrites with the same definition).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
