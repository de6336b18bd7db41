package graft

import graft.functions.ArrayOps
import org.apache.spark.sql.functions._

/** The codegen'd vector kernels (functions/ArrayOps) must be bit-identical
  * to the HOF folds they replaced — integer ops exactly, double ops in the
  * same left-to-right order — and null-safe on null array inputs.
  */
class ArrayOpsSpec extends SparkSpec {

  import spark.implicits._

  private val longRows = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, -5L, 6L)),
    (Seq(127L, -127L, 0L), Seq(-127L, 127L, 9L)),
    (Seq(0L, 0L, 0L), Seq(0L, 0L, 0L))).toDF("a", "b")

  test("dotLong matches the HOF fold exactly") {
    val got = longRows.select(
      ArrayOps.dotLong($"a", $"b").as("dot"),
      expr("aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc + x)")
        .as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(got.map(_.getLong(0)).toSeq === Seq(4L - 10L + 18L, -32258L + 0L, 0L))
  }

  test("sqDistLong matches the HOF fold exactly") {
    val got = longRows.select(
      ArrayOps.sqDistLong($"a", $"b").as("d"),
      expr("aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, (acc,x) -> acc + x)")
        .as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("dotDouble / sqDistDouble reproduce the sequential double fold bit-for-bit") {
    // values chosen so summation order matters in the last ulp
    val df = Seq(
      (Seq(1e16, 1.0, -1e16, 3.7), Seq(1.0, 1.0, 1.0, 1.0)),
      (Seq(0.1, 0.2, 0.3, 0.4), Seq(0.7, -0.3, 0.11, 0.0))).toDF("a", "b")
    val got = df.select(
      ArrayOps.dotDouble($"a", $"b").as("dot"),
      expr("aggregate(zip_with(a, b, (x,y) -> x*y), cast(0 AS double), (acc,x) -> acc + x)")
        .as("dothof"),
      ArrayOps.sqDistDouble($"a", $"b").as("sq"),
      expr("aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), cast(0 AS double), (acc,x) -> acc + x)")
        .as("sqhof")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("null array input yields null, not a crash") {
    val df = Seq((Option(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
    val r = df.select(ArrayOps.dotLong($"a", $"b"),
      ArrayOps.sqDistLong($"a", $"b")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("length mismatch yields null, matching the zip_with/aggregate contract") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L))).toDF("a", "b")
    val r = df.select(
      ArrayOps.dotLong($"a", $"b").as("dot"),
      expr("aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc + x)")
        .as("hof"),
      ArrayOps.sqDistDouble($"a".cast("array<double>"), $"b".cast("array<double>"))
        .as("sq")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("null element yields null, matching the HOF propagation") {
    val df = Seq((Seq(Option(1L), None, Option(3L)), Seq(Option(4L), Option(5L), Option(6L))))
      .toDF("a", "b")
    val r = df.select(
      ArrayOps.dotLong($"a", $"b").as("dot"),
      expr("aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc + x)")
        .as("hof")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL surface coerces ARRAY<INT> instead of reading garbage") {
    functions.GraftFunctions.register(spark)
    // un-suffixed literals are INTs: pre-coercion these passed analysis and
    // read int-backed ArrayData as longs
    val r = spark.sql(
      """SELECT dot_long(array(1, 2), array(3, 4)) AS d,
        |  sqdist_long(array(1, 2), array(3, 4)) AS sq,
        |  dot_double(array(1, 2), array(3, 4)) AS dd""".stripMargin).collect()(0)
    assert(r.getLong(0) === 11L)
    assert(r.getLong(1) === 8L)
    assert(r.getDouble(2) === 11.0)
  }

  test("SQL registration: kernels callable by name from spark.sql") {
    functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_long(array(1L, 2L), array(3L, 4L)) AS d,
        |  sqdist_long(array(1L, 2L), array(3L, 4L)) AS sq,
        |  dot_double(array(1.5D, 2.0D), array(2.0D, 3.0D)) AS dd,
        |  sqdist_double(array(1.0D), array(3.5D)) AS sqd,
        |  round(student_t_sf(0.0D, 10.0D), 9) AS sf""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) === 11L)
    assert(r.getLong(1) === 8L)
    assert(r.getDouble(2) === 9.0)
    assert(r.getDouble(3) === 6.25)
    assert(r.getDouble(4) === 0.5) // SF at t=0 is exactly 1/2
    // the extensions entry point applies the same table without error
    new functions.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("simHash30 matches the 30-fold HOF formulation bit-for-bit") {
    // the kernel this replaced: 30 separate aggregate() folds, bit test
    // via truncating div/mod — fuzz it over positive hash-like values,
    // boundary powers of two, and (out-of-contract but defined) negatives
    val rnd = new scala.util.Random(421)
    val rows = (Seq(Seq.empty[Long], Seq(0L), Seq((1L << 30) - 1)) ++
      (1 to 40).map(_ => Seq.fill(rnd.nextInt(60) + 1)(
        rnd.nextLong().abs % (1L << 30))) :+
      Seq(-5L, 7L, 1L << 29)).map(Tuple1(_))
    val df = rows.toDF("a")
    val hofBits = (0 until 30).map { j =>
      val pw = 1L << j
      expr(s"aggregate(a, 0L, (acc,h) -> acc + CASE WHEN (h div $pw) % 2 = 1 THEN 1 ELSE -1 END)")
        .as(s"bs$j")
    }
    val hofSig = (0 until 30)
      .map(j => when(col(s"bs$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    val got = df.select(ArrayOps.simHash30($"a").as("k") +: hofBits: _*)
      .select(col("k"), hofSig.as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // SQL surface
    functions.GraftFunctions.register(spark)
    // single element: bs_j = +1 exactly where the value's bit is set, so
    // the signature IS the value (for values < 2^30)
    val sq = spark.sql("SELECT simhash30(array(5L)) AS s").collect()(0)
    assert(sq.getLong(0) === 5L)
    // [1,2,4]: each bit collects one +1 and two -1 -> no bit survives
    val sz = spark.sql("SELECT simhash30(array(1L, 2L, 4L)) AS s").collect()(0)
    assert(sz.getLong(0) === 0L)
    // null array -> null
    val nr = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("a")
      .select(ArrayOps.simHash30($"a")).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // force the interpreted path by evaluating the expression directly
    def arr(xs: Long*) = Literal.create(xs, ArrayType(LongType))
    val d = functions.DotLong(arr(2L, 3L, 5L), arr(7L, 11L, 13L))
    assert(d.eval(null) === (14L + 33L + 65L))
    val sq = functions.SqDistLong(arr(2L, 3L), arr(5L, 1L))
    assert(sq.eval(null) === (9L + 4L))
    val sh = functions.SimHash30(arr(5L))
    assert(sh.eval(null) === 5L) // single element: signature = value
    assert(functions.SimHash30(arr(1L, 2L, 4L)).eval(null) === 0L)
    assert(functions.SimHash30(arr()).eval(null) === 0L)
  }
}
