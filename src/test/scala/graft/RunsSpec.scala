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
