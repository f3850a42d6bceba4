package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextSearch}

/** Build-once/probe-many evidence for the inverted text index: on an
  * amplified file-backed corpus, time (a) the one-time index build, (b) an
  * AND keyword probe against it (term-bucket dirs only), and (c) the
  * full-scan recompute a pipeline without the index pays per search —
  * asserting (b) ≡ (c) row-for-row. The amplification happens in Spark
  * (copies with a "copyK " prefix, the gen_scale.py convention) and is
  * WRITTEN to parquet first, so build/probe/scan all pay real file I/O.
  * Args: <sf dir> [factor]. */
object TextSearchProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $what in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val base = spark.read.parquet(s"$sf/documents.parquet")
    val nBase = base.count()
    val work = java.nio.file.Files.createTempDirectory("graft_tx_probe").toString
    val corpusPath = s"$work/documents"
    timed(s"amplify x$factor + write") {
      base.crossJoin(spark.range(factor).select(col("id").as("_copy")))
        .withColumn("doc_id", col("doc_id") + col("_copy") * nBase)
        .withColumn("text",
          when(col("_copy") === 0, col("text"))
            .otherwise(concat(concat(lit("copy"), col("_copy"), lit(" ")),
              col("text"))))
        .drop("_copy")
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath)
    println(s"PROBE corpus=${corpus.count()} docs")

    val idx = timed("index build (once)") {
      TextSearch.textIndexBuild(corpus, "text", "doc_id", s"$work/ix")
    }
    val terms = Seq("join", "filter")
    val probeRows = timed("index probe (AND, cold)") {
      TextSearch.searchIds(idx, terms).count()
    }
    val warmRows = timed("index probe (AND, warm)") {
      TextSearch.searchIds(idx, terms).count()
    }
    val scanRows = timed("full-scan recompute") {
      corpus.select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("t"))
        .filter(col("t").isin(terms: _*))
        .groupBy("doc_id").agg(countDistinct("t").as("n"))
        .filter(col("n") === terms.size)
        .count()
    }
    println(s"PROBE probe=$probeRows warm=$warmRows scan=$scanRows " +
      s"agree=${probeRows == scanRows && warmRows == scanRows}")
    require(probeRows == scanRows, "index probe diverged from the full scan")

    // rare-term regime (the blocklist-audit shape): the "copyK" prefix
    // tokens hit 1/factor of the corpus each — an AND of two selects
    // nothing, an OR selects 2·base docs; probe cost is the two term
    // buckets, the scan still pays the whole corpus
    val rare = Seq(s"copy${factor / 2}", s"copy${factor / 3}")
    val rareProbe = timed("index probe (rare OR, warm)") {
      TextSearch.searchIds(idx, rare, minMatch = 1).count()
    }
    val rareScan = timed("full-scan recompute (rare OR)") {
      corpus.select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("t"))
        .filter(col("t").isin(rare: _*))
        .select("doc_id").distinct().count()
    }
    println(s"PROBE rareProbe=$rareProbe rareScan=$rareScan " +
      s"agree=${rareProbe == rareScan}")
    require(rareProbe == rareScan, "rare-term probe diverged from the full scan")

    // positional regimes: phrase adjacency and BM25 ranking, both answered
    // from the index alone (the corpus text is read only by the build)
    val pidx = timed("positional index build (once)") {
      TextSearch.textIndexBuild(corpus, "text", "doc_id", s"$work/pix",
        positions = true)
    }
    timed("phrase probe (cold)") {
      TextSearch.phraseIds(pidx, Seq("table", "hash")).count()
    }
    val phraseRows = timed("phrase probe (warm)") {
      TextSearch.phraseIds(pidx, Seq("table", "hash")).count()
    }
    timed("BM25 top-50 probe (cold)") {
      TextSearch.rankedSearch(pidx, terms, 50).count()
    }
    val bm25Top = timed("BM25 top-50 probe (warm)") {
      TextSearch.rankedSearch(pidx, terms, 50).count()
    }
    // mixed rare/common query: max-score pruning scores only the rare
    // term's candidates after verifying the common terms' upper bound
    // can't reach the k-th candidate score
    val mixed = Seq(s"copy${factor / 2}") ++ terms
    val pruneBefore = TextSearch.pruneHitCount.get()
    val bm25Mixed = timed("BM25 top-50 probe (rare+common, warm)") {
      TextSearch.rankedSearch(pidx, mixed, 50, pruneMinRows = 10000L).count()
    }
    println(s"PROBE phrase=$phraseRows bm25TopK=$bm25Top " +
      s"bm25Mixed=$bm25Mixed " +
      s"pruned=${TextSearch.pruneHitCount.get() > pruneBefore}")
    // the same query at the PRODUCTION bar (pruneMinRows 500k): fires once
    // the common terms' doc-level rows alone reach corpus scale — the
    // round-12 decade evidence that pruning engages with no tuning
    val pruneBefore2 = TextSearch.pruneHitCount.get()
    val bm25Default = timed("BM25 top-50 probe (rare+common, default bar)") {
      TextSearch.rankedSearch(pidx, mixed, 50).count()
    }
    println(s"PROBE bm25MixedDefaultBar=$bm25Default " +
      s"prunedDefaultBar=${TextSearch.pruneHitCount.get() > pruneBefore2}")
    spark.stop()
  }
}
