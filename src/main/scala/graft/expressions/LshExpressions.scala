package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd hyperplane sign-bucket over an `array<float>` vector.
  *
  * The composable form (per plane: `aggregate(zip_with(vec, planeLit, …))`,
  * then a shift/or fold) walks interpreted higher-order-function lambdas —
  * ~planes × dim interpreted steps per row. This expression fuses the whole
  * bucket into one compiled double-multiply-add loop over the inlined plane
  * matrix; accumulation order and the `d >= 0` sign rule are identical to
  * the composable form (spec-asserted bit parity), so the DuckDB oracle's
  * SQL re-derivation of the buckets keeps matching.
  *
  * Bit layout: plane 0 of the matrix lands at the HIGHEST produced bit
  * (`acc = acc << 1 | bit`, planes in order) — same as the composable fold.
  */
case class LshBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bits"

  // eval/codegen read elements with getFloat — any other element type would
  // silently produce garbage buckets; fail at analysis instead
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bits requires array<float> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    // a null ELEMENT nulls every plane's dot in the composable form
    // (zip_with propagates null through the fold), forcing every bit to 0 —
    // match that, rather than reading the slot as 0.0
    var i0 = 0
    val ne = x.numElements()
    while (i0 < ne) { if (x.isNullAt(i0)) return 0L; i0 += 1 }
    var acc = 0L
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      // zip_with null-pads the SHORTER side (either direction) → null
      // product → null dot → bit 0; a partial dot would diverge from the
      // composable reference, so only an exact-length vector scores
      var bit = 0L
      if (ne == row.length) {
        var d = 0.0
        var i = 0
        while (i < ne) { d += x.getFloat(i).toDouble * row(i); i += 1 }
        bit = if (d >= 0) 1L else 0L
      }
      acc = (acc << 1) | bit
      p += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("planes", planes, "double[][]")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val row = ctx.freshName("row")
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j")
      s"""
         |long $acc = 0L;
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $v.numElements(); $j++) {
         |  if ($v.isNullAt($j)) { $hasNull = true; break; }
         |}
         |if (!$hasNull) {
         |  for (int $p = 0; $p < $mat.length; $p++) {
         |    double[] $row = $mat[$p];
         |    long $n = 0L;
         |    if ($v.numElements() == $row.length) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $row.length; $i++) {
         |        $d += (double) $v.getFloat($i) * $row[$i];
         |      }
         |      $n = $d >= 0 ? 1L : 0L;
         |    }
         |    $acc = ($acc << 1) | $n;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd matrix·vector product over an `array<float>` vector:
  * one compiled multiply-add loop per output dimension over the inlined
  * row-major matrix (the [[LshBits]] loop, keeping the dot instead of its
  * sign). Output is `array<float>` so the projection composes directly
  * with the ANN/dedup tiers' float-vector contract.
  *
  * Null semantics: a null vector, a null ELEMENT, or a length mismatch
  * with the matrix rows yields a NULL output array (the composable
  * per-dim `aggregate(zip_with(...))` reference null-propagates the same
  * way; a partial or zero-padded dot would silently corrupt geometry).
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec requires array<float> input, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val ne = x.numElements()
    if (matrix.nonEmpty && ne != matrix(0).length) return null
    var j = 0
    while (j < ne) { if (x.isNullAt(j)) return null; j += 1 }
    val out = new Array[Float](matrix.length)
    var p = 0
    while (p < matrix.length) {
      val row = matrix(p)
      var d = 0.0
      var i = 0
      while (i < ne) { d += x.getFloat(i).toDouble * row(i); i += 1 }
      out(p) = d.toFloat
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      s"""
         |boolean $bad = ($mat.length > 0 && $v.numElements() != $mat[0].length);
         |for (int $j = 0; !$bad && $j < $v.numElements(); $j++) {
         |  if ($v.isNullAt($j)) { $bad = true; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[$mat.length];
         |  for (int $p = 0; $p < $mat.length; $p++) {
         |    double[] $row = $mat[$p];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $row.length; $i++) {
         |      $d += (double) $v.getFloat($i) * $row[$i];
         |    }
         |    $out[$p] = (float) $d;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshFunctions {
  /** Register (idempotently; the name encodes the plane-family parameters,
    * so keep-first registration is always the same builder) and call. */
  def bits(spark: SparkSession, vec: Column, name: String,
           planes: Array[Array[Double]]): Column = {
    Registration.ensure(spark, name)(exprs => LshBits(exprs(0), planes))
    call_function(name, vec)
  }

  /** Register and call the fused [[MatVec]] projection. */
  def matvec(spark: SparkSession, vec: Column, name: String,
             matrix: Array[Array[Double]]): Column = {
    Registration.ensure(spark, name)(exprs => MatVec(exprs(0), matrix))
    call_function(name, vec)
  }
}
