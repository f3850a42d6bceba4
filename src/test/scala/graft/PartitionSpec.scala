package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.ParquetMeta

class PartitionSpec extends SparkSpec {

  private val dir = "/tmp/graft_hive_spec/lineitem"

  private def ensure(): Unit =
    ParquetMeta.repartitionTo(Tables.load(spark, sf, "lineitem"), dir,
      keys = Seq("l_returnflag"), sortWithin = Seq("l_orderkey"))

  test("fragments: one row per file with partition values and footer counts") {
    ensure()
    val frags = ParquetMeta.fragments(spark, dir).collect()
    assert(frags.nonEmpty)
    val total = frags.map(_.getAs[Long]("__rows__")).sum
    assert(total == Tables.load(spark, sf, "lineitem").count())
    assert(ParquetMeta.partitionColumns(spark, dir) == Seq("l_returnflag"))
  }

  test("partition filter appears as PartitionFilters in the scan (pruning)") {
    ensure()
    val df = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*l_returnflag[^\\]]*\\].*"),
      s"no partition filter in plan:\n$plan")
  }

  test("metadata-only count equals exact count") {
    ensure()
    assert(ParquetMeta.countRows(spark, dir) ==
      Tables.load(spark, sf, "lineitem").count())
  }

  test("sortWithin produces ordered fragments") {
    ensure()
    val firstFile = ParquetMeta.fragments(spark, dir)
      .collect().head.getAs[String]("__path__")
    val keys = spark.read.parquet(firstFile).select("l_orderkey")
      .collect().map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }
}
