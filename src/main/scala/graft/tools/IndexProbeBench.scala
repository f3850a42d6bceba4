package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Build-once/probe-many evidence for the prebuilt MinHash index
  * (round-7): on an amplified corpus, time (a) the one-time index build,
  * (b) an ingestion-tick probe of a small batch against it, and (c) the
  * recompute-everything alternative (minhashPairs over corpus ∪ batch) a
  * pipeline without the index would run per tick. Round-8 adds the
  * LONG-RUN study: the same corpus tail appended as `segs` per-tick
  * segments (the fragmentation a month of micro-batches leaves behind),
  * probe timed against the fragmented tree, then again after
  * minhashIndexCompact(full) — identical answers, file census and probe
  * cost reported for both states.
  * Args: <sf dir> [batchSize] [segs]. */
object IndexProbeBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/repo/tmpscale/sf1.2")
    val batchN = if (args.length > 1) args(1).toInt else 1000
    val segs = if (args.length > 2) args(2).toInt else 40
    val segRows = 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // [0, batchN) = probe batch; [batchN, batchN + segs·segRows) = the
    // per-tick append pool; the rest = the built-base corpus
    val poolEnd = batchN + segs.toLong * segRows
    val corpus = docs.filter(col("doc_id") >= poolEnd)
    val batch = docs.filter(col("doc_id") < batchN)
    println(s"PROBE corpus=${corpus.count()} batch=${batch.count()} " +
      s"appendPool=${segs * segRows}")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $what in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_bench").toString
    val idx = timed("index build (once)") {
      Dedup.minhashIndexBuild(corpus, "text", "doc_id", path = dir)
    }
    val hits = timed("index probe (per ingestion tick)") {
      Dedup.minhashDedupAgainst(idx, batch, threshold = 0.5).count()
    }
    println(s"PROBE probe hits=$hits")
    // second probe: steady-state tick (JVM/codegen warm)
    timed("index probe (second tick, warm)") {
      Dedup.minhashDedupAgainst(idx, batch, threshold = 0.5).count()
    }
    val full = timed("recompute-everything alternative (minhashPairs on corpus ∪ batch)") {
      Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5).count()
    }
    println(s"PROBE full pairs=$full")

    // ── long-run fragmentation study: segs per-tick appends, probe the
    // fragmented tree, compact(full), probe again — answers must match ──
    import graft.operators.IndexMaint
    timed(s"$segs per-tick appends") {
      (0 until segs).foreach { s =>
        val lo = batchN + s.toLong * segRows
        Dedup.minhashIndexAppend(idx,
          docs.filter(col("doc_id") >= lo && col("doc_id") < lo + segRows),
          segmentId = s"tick-$s")
      }
    }
    println(s"PROBE fragmented census=${IndexMaint.dataFileCount(spark, dir)} files")
    val fragHits = timed("probe against FRAGMENTED index") {
      Dedup.minhashDedupAgainst(idx, batch, threshold = 0.5).count()
    }
    timed("probe against FRAGMENTED index (second tick, warm)") {
      Dedup.minhashDedupAgainst(idx, batch, threshold = 0.5).count()
    }
    timed("minhashIndexCompact(full)") {
      Dedup.minhashIndexCompact(idx, full = true)
    }
    println(s"PROBE compacted census=${IndexMaint.dataFileCount(spark, dir)} files")
    val compHits = timed("probe against COMPACTED index") {
      Dedup.minhashDedupAgainst(idx, batch, threshold = 0.5).count()
    }
    timed("probe against COMPACTED index (second tick, warm)") {
      Dedup.minhashDedupAgainst(idx, batch, threshold = 0.5).count()
    }
    println(s"PROBE fragmented hits=$fragHits compacted hits=$compHits " +
      (if (fragHits == compHits) "(EQUAL)" else "(MISMATCH!)"))
    spark.stop()
  }
}
