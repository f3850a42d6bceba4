package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * materializes an intermediate zipped array and walks higher-order-function
  * lambdas per element. This expression fuses the loop into whole-stage
  * codegen: two direct `getFloat` reads and a double multiply-add per
  * element, no allocation. Each float is widened to double BEFORE the
  * multiply — bit-identical to the composable form (and the DuckDB oracle),
  * so swapping implementations cannot change results.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; enforced by the internal call sites
  // (ExpectsInputTypes' AbstractDataType is private[sql] in Spark 4)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Idempotent session registration; expression usable via Column API
    * ([[dot]]) and SQL (`vec_dot(a, b)`). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "vec_dot")(
      exprs => FloatVectorDot(exprs(0), exprs(1)))

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("vec_dot", a, b)
  }
}
