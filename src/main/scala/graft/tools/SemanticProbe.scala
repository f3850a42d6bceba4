package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IndexMaint, Similarity}

/** Build-once/probe-many evidence for the SEMANTIC dedup tier (round-8):
  * on an amplified embedding corpus, time (a) the one-time IVF index
  * build, (b) an ingestion-tick semantic screen of a small batch against
  * it ([[Similarity.semanticDedupAgainst]] — reads only the batch's
  * probed cell partitions), and (c) the recompute-everything alternative
  * ([[Similarity.semanticPairs]] over corpus ∪ batch) a pipeline without
  * the index would run per tick. Also reports the probe's file-read
  * fraction (probed partitions / total index files) and the metered
  * hot-cell drops, plus per-tick appends and an ivfCompact round
  * mirroring IndexProbeBench's fragmentation study.
  * Args: <sf dir> [batchSize] [nlist] [segs]. */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/repo/tmpscale/sf1.2")
    val batchN = if (args.length > 1) args(1).toInt else 1000
    val nlist = if (args.length > 2) args(2).toInt else 64
    val segs = if (args.length > 3) args(3).toInt else 20
    val segRows = 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val poolEnd = batchN + segs.toLong * segRows
    val corpus = embs.filter(col("vec_id") >= poolEnd)
    val batch = embs.filter(col("vec_id") < batchN)
    println(s"SEMPROBE corpus=${corpus.count()} batch=${batch.count()} " +
      s"nlist=$nlist appendPool=${segs * segRows}")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SEMPROBE $what in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_bench").toString
    val idx = timed("IVF index build (once)") {
      Similarity.ivfBuild(corpus, "vec_id", "embedding", nlist, s"$dir/ivf")
    }
    val total = IndexMaint.dataFileCount(spark, s"$dir/ivf")
    def tick(tag: String): Long = {
      val hits = timed(s"semantic screen $tag") {
        Similarity.semanticDedupAgainst(idx, batch, threshold = 0.3,
          nprobe = 2).count()
      }
      val drops = Dedup.lastCapDrops.get("semanticDedupAgainst")
        .map(d => s"capDrops cells=${d.buckets} ids=${d.rows}").getOrElse("")
      println(s"SEMPROBE hits=$hits of $total index files; $drops")
      hits
    }
    tick("(per ingestion tick)")
    tick("(second tick, warm)")
    val full = timed("recompute-everything alternative (semanticPairs on corpus ∪ batch)") {
      Similarity.semanticPairs(embs.filter(col("vec_id") < batchN)
          .unionByName(corpus), "vec_id", "embedding",
        threshold = 0.3, nlist = nlist).count()
    }
    println(s"SEMPROBE full pairs=$full")

    timed(s"$segs per-tick appends") {
      (0 until segs).foreach { s =>
        val lo = batchN + s.toLong * segRows
        Similarity.ivfAppend(idx,
          embs.filter(col("vec_id") >= lo && col("vec_id") < lo + segRows))
      }
    }
    println(s"SEMPROBE fragmented census=" +
      s"${IndexMaint.dataFileCount(spark, s"$dir/ivf")} files")
    val fragHits = tick("against FRAGMENTED index")
    timed("ivfCompact") { Similarity.ivfCompact(idx) }
    println(s"SEMPROBE compacted census=" +
      s"${IndexMaint.dataFileCount(spark, s"$dir/ivf")} files")
    val compHits = tick("against COMPACTED index")
    println(s"SEMPROBE fragmented hits=$fragHits compacted hits=$compHits " +
      (if (fragHits == compHits) "(EQUAL)" else "(MISMATCH!)"))

    // exact-dedup-first composition — the documented answer for
    // mass-duplicate corpora (the cap's 0-hits-on-all-hot contract):
    // byte-identical vectors collapse BEFORE the semantic tier, cells
    // come back under the cap, and the screen produces real hits again
    val uniq = timed("exact vector dedup (dropDuplicates on embedding)") {
      val u = corpus.dropDuplicates("embedding").localCheckpoint()
      println(s"SEMPROBE unique corpus vectors=${u.count()} of ${corpus.count()}")
      u
    }
    val idx2 = timed("IVF build on uniques") {
      Similarity.ivfBuild(uniq, "vec_id", "embedding", nlist, s"$dir/ivf_uniq")
    }
    val h2 = timed("semantic screen vs exact-deduped corpus") {
      Similarity.semanticDedupAgainst(idx2, batch, threshold = 0.3,
        nprobe = 2).count()
    }
    val d2 = Dedup.lastCapDrops.get("semanticDedupAgainst")
      .map(d => s"capDrops cells=${d.buckets} ids=${d.rows}").getOrElse("")
    println(s"SEMPROBE composed hits=$h2; $d2")
    spark.stop()
  }
}
