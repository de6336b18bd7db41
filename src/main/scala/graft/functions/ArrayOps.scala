package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd vector kernels for the similarity / ANN path.
  *
  * The reference's vector search (and any 100 TB embedding corpus) spends
  * its time in per-row dot products. The HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0, (acc,x) -> acc+x)` is
  * codegen'd by Catalyst but materializes the zipped intermediate array per
  * row and pays a lambda-variable dispatch per element; these expressions
  * generate a bare primitive loop instead (no allocation, no per-element
  * boxing), which is the difference between scanning an embedding column at
  * memory bandwidth and at interpreter speed.
  *
  * Contract (identical to the HOF chain these replace, so results are
  * bit-equal on every input, not just the happy path):
  *  - inputs coerce through ImplicitCastInputTypes — `dot_long` over an
  *    ARRAY<INT> literal widens to ARRAY<BIGINT> at analysis instead of
  *    reading int-backed ArrayData as longs (garbage/ClassCastException);
  *    a non-castable type fails analysis;
  *  - a null ARRAY yields null (standard null-intolerant contract);
  *  - mismatched lengths yield null — zip_with pads the short side with
  *    null and the fold propagates it; the kernels short-circuit instead
  *    of silently dotting a prefix;
  *  - a null ELEMENT yields null, same propagation. The per-element null
  *    check is one predictable branch (bit test on the null bitmap) —
  *    unmeasurable next to the multiply-add on dense data.
  * Evaluation order is the same left-to-right fold as the HOFs, so
  * integer results are bit-identical and double results reproduce the
  * exact sequential sum the DuckDB oracles compute.
  */
abstract class ArrayFoldBinary extends BinaryExpression with ImplicitCastInputTypes {
  /** Element type both argument arrays must carry (after coercion). */
  protected def elemType: DataType
  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(elemType), ArrayType(elemType))
  // mismatch / null-element rows are null even when both inputs are
  // non-null, so nullability cannot be inherited from the children
  override def nullable: Boolean = true

  /** Java source for one loop step, accumulating into `acc` from index `i`
    * of arrays `a` and `b`.
    */
  protected def stepJava(acc: String, a: String, b: String, i: String): String
  protected def accJavaType: String
  protected def accInit: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("nullElem")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  $accJavaType $acc = $accInit;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    ${stepJava(acc, a, b, i)}
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ over two BIGINT arrays — exact integer dot product (the int8
  * quantized-ANN kernel; also Σq² via dot(a, a)).
  */
case class DotLong(left: Expression, right: Expression) extends ArrayFoldBinary {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"
  override protected def elemType: DataType = LongType
  override protected def accJavaType: String = "long"
  override protected def accInit: String = "0L"
  override protected def stepJava(acc: String, a: String, b: String, i: String) =
    s"$acc += $a.getLong($i) * $b.getLong($i);"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i); i += 1
    }
    s
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two DOUBLE arrays, strictly left-to-right (same fold order
  * as the HOF chain and DuckDB's list_sum over the zipped products — float
  * parity is order parity).
  */
case class DotDouble(left: Expression, right: Expression) extends ArrayFoldBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"
  override protected def elemType: DataType = DoubleType
  override protected def accJavaType: String = "double"
  override protected def accInit: String = "0.0"
  override protected def stepJava(acc: String, a: String, b: String, i: String) =
    s"$acc += $a.getDouble($i) * $b.getDouble($i);"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i); i += 1
    }
    s
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two BIGINT arrays — exact squared Euclidean distance on
  * quantized vectors (the k-means / IVF assignment kernel).
  */
case class SqDistLong(left: Expression, right: Expression) extends ArrayFoldBinary {
  override def dataType: DataType = LongType
  override def prettyName: String = "sqdist_long"
  override protected def elemType: DataType = LongType
  override protected def accJavaType: String = "long"
  override protected def accInit: String = "0L"
  override protected def stepJava(acc: String, a: String, b: String, i: String) =
    s"{ final long d = $a.getLong($i) - $b.getLong($i); $acc += d * d; }"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i); s += d * d; i += 1
    }
    s
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two DOUBLE arrays, strictly left-to-right — the
  * fractional-centroid distance in the Lloyd update (cast the int8 side to
  * double first; the long→double cast is exact for quantized values).
  */
case class SqDistDouble(left: Expression, right: Expression) extends ArrayFoldBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sqdist_double"
  override protected def elemType: DataType = DoubleType
  override protected def accJavaType: String = "double"
  override protected def accInit: String = "0.0"
  override protected def stepJava(acc: String, a: String, b: String, i: String) =
    s"{ final double d = $a.getDouble($i) - $b.getDouble($i); $acc += d * d; }"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1
    }
    s
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistDouble =
    copy(left = newLeft, right = newRight)
}

/** 30-bit SimHash of a BIGINT hash array in ONE pass: for each bit j,
  * bs_j = Σ (±1 as hash bit j is set/clear); the signature sets bit j iff
  * bs_j > 0. Replaces the 30-fold HOF formulation (30 separate
  * `aggregate(arr, …)` columns = 30 interpreted lambda passes over every
  * array — measured as the whole cost of the simhash query) with a single
  * primitive loop. Bit test is `(h / 2ʲ) % 2 == 1` — Java's truncating
  * division and remainder, identical to the Spark `div`/`%` the HOF chain
  * used, so the signature is bit-equal on any input including negatives
  * (where the test is false and the contribution −1, same as the CASE).
  * Null array → null; a null ELEMENT → null (the inputs are % P hash
  * arrays, which carry none).
  */
case class SimHash30(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash30"
  override def inputTypes = Seq(ArrayType(LongType))
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val bs = ctx.freshName("bs")
      val sig = ctx.freshName("sig")
      val bad = ctx.freshName("nullElem")
      s"""
         |final int $n = $a.numElements();
         |final int[] $bs = new int[30];
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  final long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 30; $j++) {
         |    $bs[$j] += (($h / (1L << $j)) % 2L == 1L) ? 1 : -1;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < 30; $j++) {
         |    if ($bs[$j] > 0) $sig |= (1L << $j);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val bs = new Array[Int](30)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val h = x.getLong(i)
      var j = 0
      while (j < 30) {
        bs(j) += (if ((h / (1L << j)) % 2L == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 30) {
      if (bs(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash30 =
    copy(child = newChild)
}

object ArrayOps {
  /** Exact integer dot product of two ARRAY<BIGINT> columns. */
  def dotLong(a: Column, b: Column): Column =
    Exprs.column(DotLong(Exprs.expression(a), Exprs.expression(b)))

  /** Sequential-fold dot product of two ARRAY<DOUBLE> columns. */
  def dotDouble(a: Column, b: Column): Column =
    Exprs.column(DotDouble(Exprs.expression(a), Exprs.expression(b)))

  /** Exact Σ(aᵢ−bᵢ)² of two ARRAY<BIGINT> columns. */
  def sqDistLong(a: Column, b: Column): Column =
    Exprs.column(SqDistLong(Exprs.expression(a), Exprs.expression(b)))

  /** Sequential-fold Σ(aᵢ−bᵢ)² of two ARRAY<DOUBLE> columns. */
  def sqDistDouble(a: Column, b: Column): Column =
    Exprs.column(SqDistDouble(Exprs.expression(a), Exprs.expression(b)))

  /** One-pass 30-bit SimHash of an ARRAY<BIGINT> hash column. */
  def simHash30(a: Column): Column =
    Exprs.column(SimHash30(Exprs.expression(a)))
}
