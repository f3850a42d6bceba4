package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared plumbing for the fused-expression SQL registrars.
  *
  * Registration is IDEMPOTENT per session: the Column-API entry points
  * (`TextFunctions.fingerprint`, `MinHashFunctions.signature`, …) register
  * on every call, and `createOrReplaceTempFunction` unconditionally logs a
  * "function X replaced a previously registered function" warning — one per
  * expression per query, flooding bench and test logs. Registering only
  * when the name is absent keeps logs clean and avoids rebuilding builders
  * the session already has. Builders are pure values keyed by name (LSH
  * plane families encode their parameters in the name), so keep-first is
  * always safe.
  */
private[graft] object Registration {

  def ensure(spark: SparkSession, name: String)
            (builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** Resolve a foldable integral argument of a SQL-registered fused
    * expression to an Int, with a clear analysis-time error for non-literal
    * or non-integral arguments (a bare `eval().asInstanceOf[Int]` throws an
    * opaque ClassCastException on a BIGINT literal and silently evals
    * non-foldable expressions against a null row). */
  def intArg(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got non-constant ${e.sql}")
    e.eval() match {
      case i: Int                     => i
      case l: Long if l.isValidInt    => l.toInt
      case s: Short                   => s.toInt
      case b: Byte                    => b.toInt
      case null                       => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got NULL")
      case other                      => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got " +
          s"${other.getClass.getSimpleName} '$other'")
    }
  }
}
