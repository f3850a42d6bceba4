package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface with the reference's exact semantics
  * (reference: graphique/inputs.py:329-487 — string/numeric/temporal/array
  * expression sub-blocks). Everything composes built-in codegen'd Spark
  * functions; no UDFs anywhere.
  */
object GFunctions {

  // ─── strings (reference: inputs.py:423-447) ───

  /** Python str.capitalize: first char upper, rest lower (NOT initcap). */
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(c.substr(lit(2), length(c))))

  /** Python str.find: 0-based, -1 when absent (locate is 1-based, 0 absent). */
  def find(c: Column, sub: String): Column = locate(sub, c) - 1

  // ─── numeric (reference: inputs.py:377-420) ───

  def isinf(c: Column): Column =
    c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity)

  /** Bin index for explicit bucket boundaries (reference `bucket`,
    * inputs.py:398-418): value in [b_i, b_{i+1}) → i; out of range → null
    * (tests/test_service.py:50-52). `closed` = "left"|"right".
    */
  def bucket(c: Column, buckets: Seq[Double], closed: String = "left"): Column = {
    val bins = buckets.sliding(2).toSeq.zipWithIndex.map { case (Seq(lo, hi), i) =>
      val in = if (closed == "left") c >= lo && c < hi else c > lo && c <= hi
      (in, lit(i))
    }
    bins.foldRight(lit(null).cast("int")) { case ((cond, idx), acc) => when(cond, idx).otherwise(acc) }
  }

  // ─── arrays (reference: inputs.py:329-374) ───

  /** Element index, 0-based; missing → null (array_position is 1-based, 0 missing). */
  def arrayIndex(arr: Column, value: Column): Column = {
    val pos = array_position(arr, value)
    when(pos === 0, lit(null)).otherwise(pos - 1)
  }

  /** 0-based slice with limit (Spark slice is 1-based). */
  def arraySlice(arr: Column, offset: Int, length: Int): Column =
    slice(arr, offset + 1, length)

  /** Sum of numeric array elements (sequential fold — deterministic). */
  def arraySum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Mean of numeric array elements; null for empty. */
  def arrayMean(arr: Column): Column =
    when(size(arr) === 0, lit(null)).otherwise(arraySum(arr) / size(arr))

  /** Most frequent element of an array (reference `modes`); ties broken by
    * smallest value for determinism: sort by (-count, value), take first. */
  def arrayMode(arr: Column): Column =
    element_at(array_sort(transform(array_distinct(arr), v =>
      struct((lit(0) - size(filter(arr, x => x === v))).as("negn"), v.as("v")))), 1)
      .getField("v")

  // ─── temporal (reference: inputs.py:450-487) ───

  /** Difference a−b between two timestamps in `unit` (reference `delta`).
    * Sub-month units are exact epoch arithmetic (floor toward zero, i.e.
    * whole elapsed units); month/year via months_between. */
  def delta(a: Column, b: Column, unit: String): Column = {
    // cast through TIMESTAMP (ltz): parquet TIMESTAMP_NTZ columns reject
    // unix_micros directly; session TZ is pinned UTC so values are unchanged
    val micros = unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
    def whole(factor: Long): Column = (micros / lit(factor)).cast("long")
    unit.toLowerCase match {
      case "second" => whole(1000000L)
      case "minute" => whole(60L * 1000000L)
      case "hour"   => whole(3600L * 1000000L)
      case "day"    => whole(86400L * 1000000L)
      case "month"  => months_between(a, b).cast("long")
      case "year"   => (months_between(a, b) / 12).cast("long")
      case u => throw new IllegalArgumentException(s"delta unit $u")
    }
  }
}
