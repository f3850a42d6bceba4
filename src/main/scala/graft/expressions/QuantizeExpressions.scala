package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Fused symmetric int8 quantization of an `array<float>` vector:
  * one pass for the max-|x| scale, one pass for the clamped
  * floor(x/scale·127 + 0.5) components.
  *
  * The composable form embeds the O(dim) scale aggregate inside the
  * per-element transform lambda, and interpreted HOF lambdas do no CSE —
  * O(dim²) interpreted work per row (the CollapseProject/lambda-recompute
  * trap). This expression is the O(dim) compiled form; null/edge semantics
  * are IDENTICAL to the composable version (spec-asserted):
  *  - null vector → null struct
  *  - empty or all-null vector → null scale, all-null components
  *  - zero vector (scale == 0.0) → every component 0 (including null slots,
  *    because the composable when(scale===0,0) short-circuits before x)
  *  - otherwise → null slots stay null, values clamp to [-127, 127]
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("q", ArrayType(LongType, containsNull = true), nullable = false)))
  override def prettyName: String = "quantize_int8"
  override def nullable: Boolean = true

  def compute(x: ArrayData): InternalRow = {
    val n = x.numElements()
    var scale = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val a = math.abs(x.getFloat(i).toDouble)
        if (!any || a > scale) scale = a
        any = true
      }
      i += 1
    }
    val qs = new Array[Any](n)
    i = 0
    while (i < n) {
      qs(i) =
        if (!any) null // null scale: otherwise-branch arithmetic is null
        else if (scale == 0.0) 0L // when(scale===0, 0) ignores the element
        else if (x.isNullAt(i)) null
        else {
          val d = math.floor(x.getFloat(i).toDouble / scale * 127 + 0.5)
          math.max(-127L, math.min(127L, d.toLong))
        }
      i += 1
    }
    InternalRow(if (any) scale else null, new GenericArrayData(qs))
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("quant", this, classOf[QuantizeInt8].getName)
      s"${ev.value} = $self.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeFunctions {
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "quantize_int8")(
      exprs => QuantizeInt8(exprs(0)))

  def quantize(spark: SparkSession, vec: Column): Column = {
    register(spark)
    call_function("quantize_int8", vec)
  }
}
