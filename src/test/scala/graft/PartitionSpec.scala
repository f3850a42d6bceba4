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

  test("orderedFiles selects a strict file subset that still covers the top-k") {
    ensure()
    val all = ParquetMeta.fragments(spark, dir).count()
    val files = ParquetMeta.orderedFiles(spark, dir, Seq("l_returnflag"), Some(10L))
    assert(files.nonEmpty && files.length < all,
      s"expected narrowing: ${files.length} of $all files")
    // the planned scan reads exactly the selected files
    val narrowed = ParquetMeta.readFiles(spark, dir, files)
    assert(narrowed.inputFiles.length == files.length)
    // hive partition columns survive the explicit-file read
    assert(narrowed.columns.contains("l_returnflag"))
    // covers the true top-k: every selected row's key <= every excluded key
    val full = spark.read.parquet(dir)
    val topFull = full.orderBy(col("l_returnflag")).limit(10)
      .select("l_returnflag").collect().map(_.getString(0))
    val topNarrow = narrowed.orderBy(col("l_returnflag")).limit(10)
      .select("l_returnflag").collect().map(_.getString(0))
    assert(topFull.sameElements(topNarrow))
  }

  test("orderedFiles closes over boundary ties (multi-file partitions)") {
    ensure()
    // layout has one partition dir per flag but possibly several files;
    // force the multi-file case with a re-written two-file partition
    val dir2 = "/tmp/graft_hive_spec/lineitem2"
    Tables.load(spark, sf, "lineitem").repartition(3)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir2)
    val frags = ParquetMeta.fragments(spark, dir2).collect()
    val firstFlag = frags.map(_.getAs[String]("l_returnflag")).min
    val firstFlagFiles = frags.count(_.getAs[String]("l_returnflag") == firstFlag)
    assert(firstFlagFiles > 1, "fixture should have multi-file partitions")
    // limit=1 bisects to a single file, but the tie closure must keep every
    // file of the boundary tuple so secondary sorts stay correct
    val files = ParquetMeta.orderedFiles(spark, dir2, Seq("l_returnflag"), Some(1L))
    assert(files.length == firstFlagFiles)
  }

  test("firstFiles rank/dense select the right partitions") {
    ensure()
    val frags = ParquetMeta.fragments(spark, dir).collect()
    val flags = frags.map(_.getAs[String]("l_returnflag")).distinct.sorted
    val r1 = ParquetMeta.firstFiles(spark, dir, Seq("l_returnflag"), rank = 1)
    val r1Flags = ParquetMeta.readFiles(spark, dir, r1)
      .select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(r1Flags.toSeq == Seq(flags.head))
    val d2 = ParquetMeta.firstFiles(spark, dir, Seq("l_returnflag"), rank = 2, dense = true)
    val d2Flags = ParquetMeta.readFiles(spark, dir, d2)
      .select("l_returnflag").distinct().collect().map(_.getString(0)).sorted
    assert(d2Flags.toSeq == flags.take(2).toSeq)
    // descending marker flips the selection
    val desc1 = ParquetMeta.firstFiles(spark, dir, Seq("-l_returnflag"), rank = 1)
    val descFlags = ParquetMeta.readFiles(spark, dir, desc1)
      .select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(descFlags.toSeq == Seq(flags.last))
  }

  test("keyPrefix: longest partition-key prefix of the sort keys") {
    ensure()
    assert(ParquetMeta.keyPrefix(spark, dir, Seq("l_returnflag", "l_orderkey")) ==
      Seq("l_returnflag"))
    assert(ParquetMeta.keyPrefix(spark, dir, Seq("-l_returnflag")) == Seq("-l_returnflag"))
    assert(ParquetMeta.keyPrefix(spark, dir, Seq("l_orderkey", "l_returnflag")).isEmpty)
  }
}
