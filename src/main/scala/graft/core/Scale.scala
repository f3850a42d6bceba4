package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-safe aggregation (salting) and bucketed tables for
  * co-located (exchange-free) joins. AQE handles skewed *joins* at runtime;
  * salting covers skewed *aggregations* with heavy per-group state (e.g.
  * collect/distinct counting), and bucketing removes the shuffle entirely
  * for repeated equi-joins on the same key — the 100 TB amortization.
  */
object Scale {

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt) —
    * spreading one hot key over `buckets` reducers — then final-merge on
    * keys. `partial` and `merge` must compose (sum/sum, count/sum,
    * min/min, max/max, collect/flatten...).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partial: Seq[(String, Column)],
                merge: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("_gq_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy((keys :+ "_gq_salt").map(col): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Write a bucketed+sorted table: repeated equi-joins/aggregations on
    * `keys` against other tables bucketed the same way need NO exchange. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    // Overwrite replaces a REGISTERED table, but with an ephemeral
    // in-memory catalog a previous process's files can survive at the
    // default location while the catalog entry did not — CTAS then fails
    // with LOCATION_ALREADY_EXISTS. An unregistered leftover under
    // Overwrite intent is droppable.
    if (!cat.tableExists(ident)) {
      val loc = new org.apache.hadoop.fs.Path(cat.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
