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
    * comparing the full schema against one leaf file's physical schema.
    * Memoized per (session, path): the served fast paths consult this per
    * request and the layout of a root does not change under a service. */
  private val partColCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[String]]
  def partitionColumns(spark: SparkSession, path: String): Seq[String] =
    partColCache.getOrElseUpdate((spark, path), {
      val full = spark.read.parquet(path)
      val leaf = full.select(input_file_name().as("f")).limit(1).collect()
      if (leaf.isEmpty) Nil
      else {
        val filePhysical = spark.read.parquet(leaf(0).getString(0)).schema.fieldNames.toSet
        full.schema.fieldNames.filterNot(filePhysical.contains).toSeq
      }
    })

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

  /** Longest prefix of `by` (ignoring `-` descending markers) that are
    * partition columns of the dataset (reference core.py:50-53
    * Parquet.keys). Empty when the first sort key is not a partition key —
    * the metadata fast paths below then do not apply. */
  def keyPrefix(spark: SparkSession, path: String, by: Seq[String]): Seq[String] = {
    val parts = partitionColumns(spark, path).toSet
    by.takeWhile(k => parts.contains(k.stripPrefix("-")))
  }

  /** Partition-ordered top-k FILE selection (reference core.py:81-88
    * Parquet.order): fragments sorted by their partition-key tuple; with a
    * limit, keep only the shortest file prefix whose cumulative footer
    * count reaches it. Metadata-only — partition values + footer counts,
    * zero data pages; at cluster scale with thousands of fragments this
    * plans 1 file instead of all of them for
    * `order(by: partition-prefix, limit: k)`.
    *
    * Beyond the reference's bisect, the prefix is CLOSED over boundary
    * ties: every file sharing the last included key tuple is kept, so a
    * downstream secondary sort (by: [partKey, otherCol]) still sees every
    * row of the boundary group even when one partition value spans several
    * files. Superset of the reference's selection; identical on its
    * one-file-per-partition fixtures. */
  def orderedFiles(spark: SparkSession, path: String, by: Seq[String],
                   limit: Option[Long] = None): Seq[String] = {
    val names = by.map(_.stripPrefix("-"))
    val sortCols = by.map(k =>
      if (k.startsWith("-")) col(k.drop(1)).desc else col(k).asc)
    val rows = fragments(spark, path)
      .orderBy(sortCols: _*)
      .select(struct(names.map(col): _*).as("_k"), col("__path__"), col("__rows__"))
      .collect()
    limit match {
      case None => rows.map(_.getString(1)).toSeq
      case Some(k) =>
        var cum = 0L
        var n = 0
        while (cum < k && n < rows.length) { cum += rows(n).getLong(2); n += 1 }
        if (n == 0) return Nil
        val boundary = rows(n - 1).get(0)
        while (n < rows.length && rows(n).get(0) == boundary) n += 1
        rows.take(n).map(_.getString(1)).toSeq
    }
  }

  /** Rank-based file selection (reference core.py:90-99 Parquet.first):
    * files holding every row whose (dense or sparse) rank over the
    * partition-key tuple is ≤ `rank`. Dense (or rank 1): the first `rank`
    * distinct key tuples. Sparse: the cumulative-count prefix reaching
    * `rank` rows, closed over its key tuples (the reference's semi-join) —
    * so ties at the boundary all survive, which sparse rank requires. */
  def firstFiles(spark: SparkSession, path: String, by: Seq[String],
                 rank: Long = 1, dense: Boolean = false): Seq[String] = {
    val names = by.map(_.stripPrefix("-"))
    val sortCols = by.map(k =>
      if (k.startsWith("-")) col(k.drop(1)).desc else col(k).asc)
    val rows = fragments(spark, path)
      .orderBy(sortCols: _*)
      .select(struct(names.map(col): _*).as("_k"), col("__path__"), col("__rows__"))
      .collect()
    val keep: Array[org.apache.spark.sql.Row] =
      if (dense || rank == 1) {
        val tuples = rows.map(_.get(0)).distinct.take(
          math.min(rank, Int.MaxValue).toInt).toSet
        rows.filter(r => tuples.contains(r.get(0)))
      } else {
        var cum = 0L
        var n = 0
        while (cum < rank && n < rows.length) { cum += rows(n).getLong(2); n += 1 }
        val tuples = rows.take(n).map(_.get(0)).toSet
        rows.filter(r => tuples.contains(r.get(0)))
      }
    keep.map(_.getString(1)).toSeq
  }

  /** Read an explicit fragment subset while retaining the hive partition
    * columns (basePath keeps directory-derived columns in the schema). */
  def readFiles(spark: SparkSession, root: String, files: Seq[String]): DataFrame =
    if (files.isEmpty) spark.read.parquet(root).limit(0)
    else spark.read.option("basePath", root).parquet(files: _*)

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
