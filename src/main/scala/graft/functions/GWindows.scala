package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-function surface with the reference's semantics (reference:
  * graphique/inputs.py:490-557). Key drift handled here: the reference's
  * ranking functions are 0-based (row_number min 0, ntile 0..n-1;
  * tests/test_service.py:248-256) while Spark's are 1-based.
  */
object GWindows {

  def spec(partitionBy: Seq[Column], orderBy: Seq[Column]): WindowSpec = {
    val p = Window.partitionBy(partitionBy: _*)
    if (orderBy.nonEmpty) p.orderBy(orderBy: _*) else p
  }

  // ─── ranking, 0-based (reference: inputs.py:514-519) ───

  def rowNumber0(w: WindowSpec): Column = row_number().over(w) - 1
  def rank0(w: WindowSpec): Column = rank().over(w) - 1
  def denseRank0(w: WindowSpec): Column = dense_rank().over(w) - 1
  /** ntile is 0-based and int32 in the reference. */
  def ntile0(n: Int, w: WindowSpec): Column = (ntile(n).over(w) - 1).cast("int")
  def percentRank(w: WindowSpec): Column = percent_rank().over(w)
  def cumeDist(w: WindowSpec): Column = cume_dist().over(w)

  // ─── lag / lead with defaults (reference: inputs.py:497-498) ───

  def lagDefault(c: Column, offset: Int, default: Any, w: WindowSpec): Column =
    coalesce(lag(c, offset).over(w), lit(default))

  def leadDefault(c: Column, offset: Int, default: Any, w: WindowSpec): Column =
    coalesce(lead(c, offset).over(w), lit(default))

  /** Pairwise op against the lagged value — adjacency change detection
    * (reference: inputs.py:500-506): op(col, lag(col, offset)), null-filled
    * with `default`. */
  def pairwise(c: Column, op: (Column, Column) => Column, offset: Int,
               default: Any, w: WindowSpec): Column =
    coalesce(op(c, lag(c, offset).over(w)), lit(default))

  // ─── windowed aggregates (reference: inputs.py:508-552) ───

  /** Cumulative frame: unbounded preceding → current row. */
  def cumulative(agg: Column => Column, c: Column, w: WindowSpec): Column =
    agg(c).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Row frame [−preceding, +following] around the current row. */
  def rowsFrame(agg: Column => Column, c: Column, w: WindowSpec,
                preceding: Long, following: Long): Column =
    agg(c).over(w.rowsBetween(-preceding, following))

  /** Range frame over the order value. */
  def rangeFrame(agg: Column => Column, c: Column, w: WindowSpec,
                 preceding: Long, following: Long): Column =
    agg(c).over(w.rangeBetween(-preceding, following))

  /** Whole-partition aggregate (no order). */
  def overPartition(agg: Column => Column, c: Column, partitionBy: Seq[Column]): Column =
    agg(c).over(Window.partitionBy(partitionBy: _*))
}
