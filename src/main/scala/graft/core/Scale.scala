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

  /** Name of the marker file stamped into every graft-written bucketed
    * table location; pre-existing unregistered files are only ever deleted
    * when they carry it. */
  private[graft] val BucketMarker = "_graft_bucketed"

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
    // Overwrite intent is droppable — but ONLY if a graft marker proves a
    // previous writeBucketed produced it: a shared warehouse directory can
    // hold another application's live table at the same default location,
    // which must never be silently destroyed.
    if (!cat.tableExists(ident)) {
      val loc = new org.apache.hadoop.fs.Path(cat.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        if (fs.exists(new org.apache.hadoop.fs.Path(loc, BucketMarker))) {
          System.err.println(
            s"[graft] writeBucketed: deleting unregistered graft-marked leftover at $loc")
          fs.delete(loc, true)
        } else throw new IllegalStateException(
          s"writeBucketed: $loc exists but is not catalog-registered and carries no " +
          s"$BucketMarker marker — refusing to delete files this engine did not write. " +
          "Drop the table/location explicitly or choose another table name.")
      }
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    // stamp the marker AFTER a successful write so only complete graft
    // tables are ever auto-reclaimed
    val written = new org.apache.hadoop.fs.Path(
      cat.getTableMetadata(ident).location)
    val fs = written.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(written, BucketMarker), true).close()
  }
}
