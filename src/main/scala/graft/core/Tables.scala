package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** Load with the natural-order row id attached (see [[Natural]]). */
  def loadOrdered(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Natural.withRowId(spark, path(sfDir, name))
}
