package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-parquet dataset utilities (reference: graphique/core.py:55-99
  * and partition.py — fragment metadata, metadata-only counts, hive
  * repartitioning).
  *
  * Spark gives partition pruning and row-group pushdown for free
  * (PruneFileSourcePartitions); what it does not supply is the reference's
  * *metadata-only* fragment table — per-file partition values + footer row
  * counts without scanning data. `fragments` builds it from the `_metadata`
  * hidden columns: only parquet footers are touched (no data pages), and the
  * job is distributed over files.
  */
object ParquetMeta {

  /** One row per fragment: partition key values, file path, row count.
    * Metadata-only — the scan reads zero data columns. */
  def fragments(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val partCols = partitionColumns(spark, path)
    df.groupBy(col("_metadata.file_path").as("__path__") +: partCols.map(col): _*)
      .count()
      .withColumnRenamed("count", "__rows__")
      .select(partCols.map(col) :+ col("__path__") :+ col("__rows__"): _*)
  }

  /** Hive partition columns = directory-derived columns. Detected by
    * comparing the full schema against one leaf file's physical schema. */
  def partitionColumns(spark: SparkSession, path: String): Seq[String] = {
    val full = spark.read.parquet(path)
    val leaf = full.select(input_file_name().as("f")).limit(1).collect()
    if (leaf.isEmpty) return Nil
    val filePhysical = spark.read.parquet(leaf(0).getString(0)).schema.fieldNames.toSet
    full.schema.fieldNames.filterNot(filePhysical.contains).toSeq
  }

  /** Metadata-only total count (reference `count` fast path,
    * interface.py:147-149): sum of footer counts, no data scan. */
  def countRows(spark: SparkSession, path: String): Long =
    fragments(spark, path).agg(sum(col("__rows__"))).collect()(0).getLong(0)

  /** Metadata-only group-by-partition-keys with counts (reference
    * group-on-key-prefix fast path, interface.py:233-238). */
  def groupCounts(spark: SparkSession, path: String, keys: Seq[String]): DataFrame =
    fragments(spark, path)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__rows__")).as("count"))

  /** Out-of-core hive repartitioner (reference partition.py:29-77 — its
    * 2-pass batch strategy IS Spark's shuffle): cluster by keys, optionally
    * sort within fragments, write hive layout. */
  def repartitionTo(df: DataFrame, dest: String, keys: Seq[String],
                    sortWithin: Seq[String] = Nil): Unit = {
    val clustered = df.repartition(keys.map(col): _*)
    // keys prefix satisfies FileFormatWriter's required ordering — otherwise
    // the writer inserts its own (unstable) sort on the partition columns
    // and destroys the secondary order
    val sorted =
      if (sortWithin.isEmpty) clustered
      else clustered.sortWithinPartitions((keys ++ sortWithin).map(col): _*)
    sorted.write.mode(SaveMode.Overwrite).partitionBy(keys: _*).parquet(dest)
  }
}
