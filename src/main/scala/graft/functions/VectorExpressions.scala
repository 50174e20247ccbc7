package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math (SURVEY §7.3 note: custom
  * code only where built-ins genuinely can't express the semantics FAST —
  * Spark's higher-order lambda functions, e.g.
  * `aggregate(zip_with(a, b, ...))`, are evaluated interpreted, ~100×
  * slower than codegen for per-element math on embedding columns).
  *
  * [[DotProduct]] is a proper whole-stage-codegen expression: `doGenCode`
  * emits a tight primitive loop over the two `ArrayData`, accumulation in
  * double. Floats are widened per element (exact), so results match a
  * DuckDB `list_inner_product` on `DOUBLE[]` bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = elemType(e) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $getL * $getR;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED long arrays (as produced by
  * `array_sort(collect_set(...))`) via a linear merge — no per-row hash-set
  * build or output-array allocation, unlike `array_intersect`. This sits in
  * the inner loop of every near-dup verifier (quadratic pair count), where
  * the allocation-free merge is the difference between the verify join and
  * the shuffle being the bottleneck at corpus scale.
  *
  * Inputs MUST be sorted ascending and duplicate-free; callers own that
  * invariant (all graft shingle sets are).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_isect expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("cnt")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the native functions — idempotent; call before
  * using `graft_dot(...)` / `graft_isect(...)` in SQL/expr text. (Registered
  * via the function registry rather than SparkSessionExtensions so library
  * users need no special session bootstrap.)
  */
object GraftFunctions {
  /** graft_dot as a Column, minus the SQL parser — resolves to the same
    * [[DotProduct]] node via the registry ([[register]] required, as for
    * `expr()`). Plan-build-heavy callers (the IVF derive embeds thousands
    * of literal doubles per plan) pay `expr()`-string parse + analysis of
    * a CreateArray-of-Literals per centroid; passing the array as ONE
    * `lit(Array[Double])` Literal node collapses that fixed per-plan cost
    * (profiled ~0.7 s per streaming micro-batch at 16 seeds + 64 codebook
    * entries). Values are bit-identical: the same Literal doubles feed
    * the same expression.
    */
  def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)

  /** Arity-checked builder: a wrong-arity SQL call (`graft_dot(x)`) must
    * fail with an error naming the function, not an
    * IndexOutOfBoundsException from `children(1)`.
    */
  private[graft] def binaryBuilder(
      name: String, make: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { children =>
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${children.length}")
    make(children(0), children(1))
  }

  private[graft] def unaryBuilder(
      name: String, make: Expression => Expression)
      : Seq[Expression] => Expression = { children =>
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${children.length}")
    make(children(0))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", binaryBuilder("graft_dot", DotProduct(_, _)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_isect", binaryBuilder("graft_isect", SortedIntersectCount(_, _)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      binaryBuilder("graft_heavy_hitters",
        (c, k) => MisraGriesAgg(c, literalCapacity("graft_heavy_hitters", k))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters_w", heavyHittersWeightedBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", topKBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", unaryBuilder("graft_nfc", NfcNormalize(_)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dl", binaryBuilder("graft_dl", DamerauLevenshtein(_, _)),
      "built-in")
  }

  /** capacity must be a foldable integer literal — evaluate it now so a
    * non-literal argument fails at analysis, not execution.
    */
  private[graft] def literalCapacity(name: String, k: Expression): Int = {
    if (!k.foldable)
      throw new IllegalArgumentException(s"$name: capacity must be a literal")
    k.eval().asInstanceOf[Number].intValue()
  }

  /** `graft_topk(score, id, k)` — bounded mergeable grouped top-k
    * ([[TopKAgg]]); k must be a literal, enforced at analysis.
    */
  private[graft] val topKBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"graft_topk requires exactly 3 arguments, got ${children.length}")
    TopKAgg(children(0), children(1), literalCapacity("graft_topk", children(2)))
  }

  /** `graft_heavy_hitters_w(item, weight, k)` — the weighted Misra–Gries
    * update, the form that re-compacts stored summaries (items re-enter
    * at their counter weight) without materializing weight-many rows.
    */
  private[graft] val heavyHittersWeightedBuilder
      : Seq[Expression] => Expression = { children =>
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"graft_heavy_hitters_w requires exactly 3 arguments, got ${children.length}")
    MisraGriesAgg(children(0),
      literalCapacity("graft_heavy_hitters_w", children(2)),
      weight = children(1))
  }
}
