package graft

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

class RunsSpec extends SparkSpec {

  test("runsDistributed equals the single-window runs") {
    val e = GTable(Tables.loadOrdered(spark, sf, "events"))
    val serial = e.runs(
      by = Seq("event_type"),
      aggs = Seq(min(col("event_id")).as("first_id")),
      counts = Some("n")).result.collect()
    val dist = e.runsDistributed(
      by = Seq("event_type"),
      aggs = Seq(min(col("event_id")).as("first_id")),
      counts = Some("n"),
      blockSize = 64 // force many blocks so prefix logic is exercised
    ).result.collect()
    assert(serial.map(_.toSeq).toSeq == dist.map(_.toSeq).toSeq)
  }

  test("densify re-ranks a sparse rid into dense 0-based positions, order-preserving") {
    val e = GTable(Tables.loadOrdered(spark, sf, "events"))
    val filtered = e.filter(col("value") > 0.2)
    assert(!filtered.hasDensePositions)
    val dense = filtered.densify(blockSize = 64)
    assert(dense.hasDensePositions)
    // dense rid = exactly 0..n-1
    val rids = dense.df.select(col(graft.core.Natural.rid)).collect()
      .map(_.getLong(0)).sorted
    assert(rids.toSeq == (0L until rids.length).toSeq)
    // order preserved: event_id sequence under new rid == under old rid
    val before = filtered.df.orderBy(col(graft.core.Natural.rid))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val after = dense.df.orderBy(col(graft.core.Natural.rid))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(before == after)
    // no-op on an already-dense table
    assert(e.densify() eq e)
  }

  test("filter → densify → runsDistributed equals filter → serial runs") {
    val e = GTable(Tables.loadOrdered(spark, sf, "events"))
    val f = e.filter(col("value") > 0.2)
    val serial = f.runs(
      by = Seq("event_type"),
      aggs = Seq(min(col("event_id")).as("first_id")),
      counts = Some("n")).result.collect()
    val dist = f.densify(blockSize = 64).runsDistributed(
      by = Seq("event_type"),
      aggs = Seq(min(col("event_id")).as("first_id")),
      counts = Some("n"),
      blockSize = 64).result.collect()
    assert(serial.map(_.toSeq).toSeq == dist.map(_.toSeq).toSeq)
  }

  test("runsDistributed with split predicate equals serial") {
    val e = GTable(Tables.loadOrdered(spark, sf, "events"))
    val serialSplit = e.runs(
      by = Seq("user_id"),
      split = Seq(w => unix_micros(col("ts").cast("timestamp")) -
        unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000000L),
      counts = Some("n")).result.collect()
    val distSplit = e.runsDistributed(
      by = Seq("user_id"),
      split = Seq((cur, prev) => unix_micros(cur("ts").cast("timestamp")) -
        unix_micros(prev("ts").cast("timestamp")) > 1800000000L),
      counts = Some("n"),
      blockSize = 128).result.collect()
    assert(serialSplit.map(_.toSeq).toSeq == distSplit.map(_.toSeq).toSeq)
  }
}
