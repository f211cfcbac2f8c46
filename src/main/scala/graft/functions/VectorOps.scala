package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over numeric arrays — the hot kernel of the
  * similarity-search family. The higher-order-function formulation
  * (`aggregate(zip_with(...))`) evaluates a lambda per element outside
  * whole-stage codegen and allocates per pair; on an all-pairs cosine join
  * that is the entire runtime (measured: 157s → <2s at sf0.1 for
  * `dedup_near_cosine` after switching). This expression compiles to a tight
  * primitive loop inside WholeStageCodegen.
  *
  * Accumulation is sequential in index order with each element widened to
  * double — bit-identical to both the HOF formulation it replaces and the
  * DuckDB oracle's `list_reduce(list_transform(...))`.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemAccessor(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"vector_dot requires array<float|double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val leftIsFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rightIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xi * yi
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |double $sum = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ((double) $a.${elemAccessor(left)}($i))
         |        * ((double) $b.${elemAccessor(right)}($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)

  override def prettyName: String = "vector_dot"
}

object VectorOps {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  /** dot(a, b) as a codegen'd column. */
  def dot(a: Column, b: Column): Column =
    toColumn(VectorDot(toExpression(a), toExpression(b)))

  /** L2 norm = sqrt(dot(v, v)). */
  def norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(v, v))
}
