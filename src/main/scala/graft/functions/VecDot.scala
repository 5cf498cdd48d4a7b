package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (Array[Float] or
  * Array[Double]), accumulated in double in ascending index order — the
  * exact fold `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, +)`
  * performs, so swapping one for the other never changes a result bit.
  *
  * Why a custom Expression (SURVEY.md §2.L escape hatch): the
  * higher-order-function chain materializes an intermediate array per
  * row per pair; for similarity search that's the inner loop of a
  * corpus-size × probe fan-out. This expression is a single fused loop
  * in whole-stage codegen — no allocation, no lambda dispatch.
  *
  * Nulls: a null array yields null (BinaryExpression default); null
  * ELEMENTS are not supported (inputs are dense embedding vectors).
  * Unequal lengths use the common prefix (min), like zip_with's
  * non-padded region.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Column + SQL-registry surface for the engine's native functions. */
object GraftFunctions {
  def vec_dot(a: Column, b: Column): Column =
    Bridge.toCol(VecDot(Bridge.toExpr(a), Bridge.toExpr(b)))

  /** L2 norm via the same fused loop. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** Register `vec_dot` for spark.sql(...) users. */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "vec_dot", exprs => VecDot(exprs(0), exprs(1)))
}
