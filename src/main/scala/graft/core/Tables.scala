package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the test-data star schema (TESTDATA.md).
  *
  * Each table is a plain parquet file under `sfDir`. Loading is fully lazy:
  * `spark.read.parquet` yields a Catalyst plan with partition discovery,
  * predicate pushdown and column pruning for free — this collapses the
  * reference's Source union of a lazy table and a file-backed dataset
  * (reference: graphique/interface.py:26, graphique/core.py:43).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  // Plan cache: schema inference + file listing run once per (session,
  // table); the cached value is only the lazy plan, not data. Keyed by
  // session so test sessions don't leak across restarts.
  private val planCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    planCache.getOrElseUpdate((spark, path(sfDir, name)),
      normalize(read(spark, path(sfDir, name))))

  /** Read any Spark-supported source format as an engine table — the
    * operator surface is source-agnostic (GTable wraps any DataFrame), so
    * csv/json/orc corpora drop in wherever parquet does. Pass the schema
    * for text formats (csv/json) to keep types exact rather than inferred.
    * (SourceFormatsSpec asserts csv/json/orc round-trip equality with the
    * parquet source and runs engine operators over each.) */
  def loadFormat(spark: SparkSession, dir: String, format: String,
                 schema: Option[org.apache.spark.sql.types.StructType] = None,
                 options: Map[String, String] = Map.empty): DataFrame = {
    val r0 = spark.read.format(format).options(options)
    normalize(schema.fold(r0)(r0.schema).load(dir))
  }

  /** Load with the natural-order row id attached (see [[Natural]]).
    * Cached like [[load]]: Natural.withRowId runs a metadata-only
    * footer-count job to build the per-file offsets — once per (session,
    * path), not once per query. */
  def loadOrdered(spark: SparkSession, sfDir: String, name: String): DataFrame =
    planCache.getOrElseUpdate((spark, "ordered:" + path(sfDir, name)), {
      nanosConf(spark)
      normalize(Natural.withRowId(spark, path(sfDir, name)))
    })

  private def nanosConf(spark: SparkSession): Unit =
    // Spark has no nanosecond timestamp type and by default refuses parquet
    // TIMESTAMP(NANOS) columns (events.ts). Read them as raw Long nanos...
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def read(spark: SparkSession, p: String): DataFrame = {
    nanosConf(spark)
    spark.read.parquet(p)
  }

  /** ...then convert to micros TIMESTAMP_NTZ — integer `div` (a double
    * round-trip would lose precision at 1.7e18 nanos), truncation matching
    * DuckDB's ns→us behavior. */
  def normalize(df: DataFrame): DataFrame =
    df.schema.fields.filter(f => f.name == "ts" && f.dataType == LongType)
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name,
          timestamp_micros(expr(s"${f.name} div 1000")).cast("timestamp_ntz")))
}
