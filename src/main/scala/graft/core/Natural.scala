package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Natural (file/insertion) row order on an unordered engine.
  *
  * The reference treats tables as implicitly ordered — file order is
  * observable through `slice`, `row(index)`, windows without `by`, `runs`
  * (reference: graphique/interface.py:181-183,499-508). Spark DataFrames are
  * unordered, so natural order must be materialized explicitly at ingest.
  *
  * Scale-aware design: we never run a global `row_number()` (single-partition
  * sort — a non-starter at 100 TB). Instead the global row id is derived as
  * `fileStartOffset + _metadata.row_index`:
  *
  *   1. a metadata-only job computes per-file row counts (no data columns are
  *      read — parquet footer counts satisfy it),
  *   2. files are ordered lexicographically (deterministic file order) and
  *      prefix-summed into start offsets on the driver (one row per file),
  *   3. the tiny (file → offset) table is broadcast-joined back, so the id is
  *      computed executor-side with zero shuffles of the fact data.
  *
  * The id column is a hidden implementation detail; operators drop it before
  * results surface.
  */
object Natural {
  /** Hidden row-id column name (reserved; dropped before output). */
  val rid = "_gq_rid"

  private val fileCol = "_gq_file"

  def hasRowId(df: DataFrame): Boolean = df.columns.contains(rid)

  /** Natural-order sort key: the row id if present, else an error. */
  def order(df: DataFrame): Column = {
    require(hasRowId(df), s"natural order requires $rid — load with Tables.loadOrdered")
    col(rid)
  }

  /** Read `path` with a stable 0-based natural-order row id attached. */
  def withRowId(spark: SparkSession, path: String): DataFrame = {
    // Metadata-only: per-file row counts (footer counts; no data IO).
    val counts = spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as(fileCol))
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (f, n) => val o = acc; acc += n; (f, o) }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF(fileCol, "_gq_off")
    spark.read.parquet(path)
      .withColumn(fileCol, col("_metadata.file_path"))
      .withColumn("_gq_idx", col("_metadata.row_index"))
      .join(broadcast(offsetsDf), fileCol)
      .withColumn(rid, col("_gq_off") + col("_gq_idx"))
      .drop(fileCol, "_gq_off", "_gq_idx")
  }

  /** Drop the hidden id (call before surfacing results). */
  def strip(df: DataFrame): DataFrame =
    if (hasRowId(df)) df.drop(rid) else df
}
