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

  /** Per-file natural-order start offsets for every file under `path`:
    * footer row counts (metadata-only job), lexicographic file order,
    * driver-side prefix sum. Memoized per (session, path) — served fast
    * paths consult this per request and a root's files don't change under
    * a service (same contract as ParquetMeta.partitionColumns). */
  private val offsetCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[(String, Long)]]
  def fileOffsets(spark: SparkSession, path: String): Array[(String, Long)] =
    offsetCache.getOrElseUpdate((spark, path), {
      val counts = spark.read.parquet(path)
        .groupBy(col("_metadata.file_path").as(fileCol))
        .count()
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1)
      var acc = 0L
      counts.map { case (f, n) => val o = acc; acc += n; (f, o) }
    })

  private def attachRowId(df: DataFrame, spark: SparkSession,
                          offsets: Seq[(String, Long)]): DataFrame = {
    val offsetsDf = spark.createDataFrame(offsets).toDF(fileCol, "_gq_off")
    df.withColumn(fileCol, col("_metadata.file_path"))
      .withColumn("_gq_idx", col("_metadata.row_index"))
      .join(broadcast(offsetsDf), fileCol)
      .withColumn(rid, col("_gq_off") + col("_gq_idx"))
      .drop(fileCol, "_gq_off", "_gq_idx")
  }

  /** Read `path` with a stable 0-based natural-order row id attached. */
  def withRowId(spark: SparkSession, path: String): DataFrame =
    attachRowId(spark.read.parquet(path), spark,
      fileOffsets(spark, path).toSeq)

  /** Read only `files` of the dataset rooted at `root`, with each row
    * carrying the SAME natural-order id the full root would assign it —
    * offsets are prefix-summed over ALL of the root's files, then
    * restricted to the selected subset. This is what lets metadata file
    * narrowing (ParquetMeta.orderedFiles/firstFiles) keep the natural-order
    * serving contract: downstream slice/row/column collection order by the
    * sparse rid exactly as they would over the un-narrowed root. */
  def withRowIdFiles(spark: SparkSession, root: String,
                     files: Seq[String]): DataFrame =
    if (files.isEmpty) withRowId(spark, root).limit(0)
    else {
      val sel = files.toSet
      attachRowId(
        spark.read.option("basePath", root).parquet(files: _*), spark,
        fileOffsets(spark, root).filter(f => sel.contains(f._1)).toSeq)
    }

  /** Drop the hidden id (call before surfacing results). */
  def strip(df: DataFrame): DataFrame =
    if (hasRowId(df)) df.drop(rid) else df
}
