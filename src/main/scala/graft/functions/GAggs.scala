package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aggregate surface with the reference's semantics (reference:
  * graphique/inputs.py:132-231 — the `Aggregates` input). Every aggregate
  * composes codegen'd built-ins; deterministic first/last/collect are ordered
  * explicitly (Spark's bare `first` is nondeterministic).
  */
object GAggs {

  /** Filtered aggregate: `fn FILTER (WHERE cond)` (reference: inputs.py:138-140).
    * Null-skipping aggregates ignore the non-matching rows. */
  def filtered(agg: Column => Column, c: Column, cond: Column): Column =
    agg(when(cond, c))

  /** count(*) under a filter (count(when(...)) counts non-nulls). */
  def countWhere(cond: Column): Column = count(when(cond, lit(1)))

  /** Deterministic first value of `c` by `ord` keys (reference ordered
    * `first`, inputs.py:151-161): min_by over an orderable struct. */
  def firstBy(c: Column, ord: Column*): Column = min_by(c, struct(ord: _*))

  /** Deterministic last value of `c` by `ord` keys. */
  def lastBy(c: Column, ord: Column*): Column = max_by(c, struct(ord: _*))

  /** argmax/argmin (reference: inputs.py:198-203): value of `c` where `key`
    * is maximal/minimal. */
  def argmax(c: Column, key: Column): Column = max_by(c, key)
  def argmin(c: Column, key: Column): Column = min_by(c, key)

  /** Ordered collect: array of `c` sorted by `ord` within the group
    * (reference `collect` with order_by, inputs.py:180-185). */
  def collectBy(c: Column, ord: Column*): Column =
    transform(array_sort(collect_list(struct(struct(ord: _*).as("o"), c.as("v")))),
      s => s.getField("v"))

  /** Ordered group_concat (reference `concat`, inputs.py:188-195). */
  def concatBy(c: Column, sep: String, ord: Column*): Column =
    array_join(collectBy(c.cast("string"), ord: _*), sep)

  /** nunique, exact or approx HLL (reference: inputs.py:143-148). */
  def nunique(c: Column, approx: Boolean = false): Column =
    if (approx) approx_count_distinct(c) else countDistinct(c)

  /** Continuous quantile (reference `quantile`, inputs.py:172-177). */
  def quantile(c: Column, q: Double, approx: Boolean = false): Column =
    if (approx) percentile_approx(c, lit(q), lit(10000))
    else call_function("percentile", c, lit(q))

  /** Discrete quantile that also works on strings (reference quantile
    * accepts string columns, tests/test_service.py:99-100): value at index
    * floor(q·(n−1)) of the sorted non-null values. Aggregate form —
    * collect-based, for modest group sizes; the whole-table scalable form
    * is `df.orderBy(c).offset(idx).limit(1)`. */
  def quantileDisc(c: Column, q: Double): Column = {
    val sorted = array_sort(collect_list(c))
    val idx = floor(lit(q) * (size(sorted) - 1)).cast("int") + 1
    element_at(sorted, idx)
  }

  /** Sample (bias-corrected) excess kurtosis — the reference's
    * kurtosis(how: "sample"); Spark's built-in is the population g2, so the
    * correction is applied on top: G2 = ((n-1)/((n-2)(n-3)))·((n+1)·g2+6). */
  def kurtosisSample(c: Column): Column = {
    val n = count(c).cast("double")
    val g2 = kurtosis(c)
    ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)
  }

  def stdDev(c: Column, sample: Boolean = true): Column =
    if (sample) stddev_samp(c) else stddev_pop(c)

  def variance(c: Column, sample: Boolean = true): Column =
    if (sample) var_samp(c) else var_pop(c)
}
