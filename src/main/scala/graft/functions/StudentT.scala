package graft.functions

import org.apache.commons.math3.distribution.TDistribution
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.{abs => colAbs, lit}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Two-sided p-value machinery for regression significance tests.
  *
  * The reference computes p-values through scipy.stats.linregress
  * (rag/queries/trends.py:103-159, readers/durability.py:368-436); Spark has
  * `regr_slope`/`regr_intercept`/`corr` built in but no Student-t CDF, so
  * this is a (non-hot-path) native Catalyst expression backed by
  * commons-math3 (already on Spark's classpath). It runs once per aggregated
  * group row, never per input row, so CodegenFallback costs nothing.
  */
case class StudentTSf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  // Callers pass DoubleType columns (StudentT.tSf casts); no implicit
  // coercion machinery needed for a non-SQL-registered expression.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "student_t_sf"

  /** Survival function 1 - CDF(t) for Student's t with `df` degrees of
    * freedom. Returns null for df <= 0 (mirrors the reference's >= 3-point
    * gate semantics: 2-point fits have df=0 and p=NaN in scipy).
    */
  override def nullSafeEval(t: Any, df: Any): Any = {
    val dfv = df.asInstanceOf[Double]
    if (dfv <= 0.0) null
    else 1.0 - new TDistribution(dfv).cumulativeProbability(t.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StudentTSf =
    copy(left = newLeft, right = newRight)
}

object StudentT {
  /** Survival function of Student's t as a Column. */
  def tSf(t: Column, df: Column): Column =
    Exprs.column(StudentTSf(
      Exprs.expression(t.cast("double")), Exprs.expression(df.cast("double"))))

  /** Two-sided p-value for a correlation r over n points:
    * t = r·sqrt((n-2)/(1-r²)), p = 2·SF(|t|). Null-safe for n < 3
    * (the reference's minimum-points gate, trends.py:118-122).
    */
  def corrPValue(r: Column, n: Column): Column = {
    import org.apache.spark.sql.functions.when
    val dfree = n.cast("double") - 2.0
    val t = r * org.apache.spark.sql.functions.sqrt(
      dfree / (lit(1.0) - r * r))
    // |r| = 1 (an exactly-linear series): t -> ∞, p -> 0 — the division
    // guard matters under ANSI mode, where 1/(1-r²) would throw.
    when(r * r >= 1.0, lit(0.0))
      .otherwise(lit(2.0) * tSf(colAbs(t), dfree))
  }
}
