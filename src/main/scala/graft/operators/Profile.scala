package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass column profiler — the data-quality census a pipeline runs
  * before (and after) every transform stage: per column, the non-null
  * count, null count, distinct count, min/max and mean.
  *
  * Scale shape: ONE whole-table aggregation computes every metric for
  * every requested column (map-side combinable; the scan is read once
  * and reduced to a single row), then the row pivots to one output row
  * per column with `inline` — no second scan, no per-column jobs, no
  * driver loop. The only non-single-pass variant is `exactNdv = true`,
  * which adds the standard multi-distinct Expand (input replicated once
  * per distinct aggregate) — exactness for adjudication; the default
  * approx NDV (HLL++, 1.5% rsd) keeps the single-pass shape at corpus
  * scale.
  *
  * No reference analog (graphique's per-column terminal aggregates
  * answer one column per request); the metric definitions are plain SQL
  * so the correctness oracle recomputes them verbatim.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`: one row per column
    * with `name, cnt, null_cnt, ndv, min_s, max_s, mean, p50, p95` —
    * min/max are the NATIVE column min/max cast to string afterwards (so
    * numeric columns order numerically, not lexically); `mean` and the
    * quantiles are null for non-numeric columns. Quantiles ride the SAME
    * single aggregation: `exactNdv = false` (the scale default) uses the
    * approx_percentile sketch (GK, accuracy 10000 — mergeable, one pass);
    * `exactNdv = true` uses exact interpolated `percentile`, whose
    * p·(n−1) linear interpolation matches DuckDB's quantile_cont for the
    * oracle. Output ordered by column name. */
  def summary(df: DataFrame, cols: Seq[String] = Nil,
              exactNdv: Boolean = false): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    targets.foreach(c => require(df.columns.contains(c),
      s"profile: no such column $c"))
    val aggs = targets.flatMap(statAggs(df, _, exactNdv))
    val one = df.agg(count(lit(1)).as("_t"), aggs: _*)
    one.select(inline(array(pivotRows(targets): _*)))
  }

  /** Per-GROUP census: `summary` partitioned by `groupCols` (per-source /
    * per-language data quality, the report a mixing stage reads). Same
    * one-aggregation shape — the groupBy output is |groups| rows, each
    * pivoted to one row per profiled column; nothing scans twice. */
  def summaryBy(df: DataFrame, groupCols: Seq[String],
                cols: Seq[String] = Nil,
                exactNdv: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "summaryBy needs group columns")
    val targets =
      if (cols.nonEmpty) cols
      else df.columns.toSeq.filterNot(groupCols.contains)
    (groupCols ++ targets).foreach(c => require(df.columns.contains(c),
      s"profile: no such column $c"))
    val aggs = count(lit(1)).as("_t") +: targets.flatMap(statAggs(df, _, exactNdv))
    val grouped = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    grouped.select(groupCols.map(col) :+ inline(array(pivotRows(targets): _*)): _*)
  }

  private def statAggs(df: DataFrame, c: String,
                       exactNdv: Boolean): Seq[org.apache.spark.sql.Column] = {
    val ndv =
      if (exactNdv) countDistinct(col(c)) else approx_count_distinct(col(c))
    val (mean, quants) = df.schema(c).dataType match {
      case _: NumericType =>
        val ps = array(lit(0.5), lit(0.95))
        (avg(col(c)).cast("double"),
          if (exactNdv) percentile(col(c), ps)
          else approx_percentile(col(c).cast("double"), ps, lit(10000)))
      case _ => (lit(null).cast("double"),
        lit(null).cast("array<double>"))
    }
    Seq(count(col(c)).as(s"_c_$c"), ndv.as(s"_d_$c"),
      min(col(c)).cast("string").as(s"_mn_$c"),
      max(col(c)).cast("string").as(s"_mx_$c"), mean.as(s"_av_$c"),
      quants.as(s"_pq_$c"))
  }

  private def pivotRows(targets: Seq[String]) = targets.sorted.map { c =>
    struct(lit(c).as("name"), col(s"_c_$c").as("cnt"),
      (col("_t") - col(s"_c_$c")).as("null_cnt"), col(s"_d_$c").as("ndv"),
      col(s"_mn_$c").as("min_s"), col(s"_mx_$c").as("max_s"),
      col(s"_av_$c").as("mean"),
      col(s"_pq_$c").getItem(0).cast("double").as("p50"),
      col(s"_pq_$c").getItem(1).cast("double").as("p95"))
  }
}
