package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{TextAnalysis, TextSearch}

/** Inverted text index: probe answers must equal full-scan answers exactly,
  * maintenance (append/compact) must be answer-preserving, and probes must
  * read only the bucket directories the query terms hash to. */
class TextSearchSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  /** Full-scan reference: ids of docs whose whitespace-token set matches at
    * least `minMatch` of `terms` (0 → all). */
  private def scanIds(corpus: DataFrame, terms: Seq[String],
                      minMatch: Int = 0): Set[Long] = {
    val need = if (minMatch <= 0 || minMatch > terms.size) terms.size else minMatch
    corpus.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy("doc_id").agg(countDistinct("t").as("n"))
      .filter(col("n") >= need)
      .collect().map(_.getLong(0)).toSet
  }

  private def probedIds(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("AND / OR / at-least-m probes equal the full-scan answers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_spec").toString
    val idx = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/ix",
      buckets = 32)
    val and2 = Seq("join", "filter")
    assert(probedIds(TextSearch.searchIds(idx, and2)) == scanIds(docs, and2))
    val or3 = Seq("scan", "batch", "row")
    assert(probedIds(TextSearch.searchIds(idx, or3, minMatch = 1)) ==
      scanIds(docs, or3, minMatch = 1))
    assert(probedIds(TextSearch.searchIds(idx, or3, minMatch = 2)) ==
      scanIds(docs, or3, minMatch = 2))
    // duplicated / mixed-case / padded request terms normalize away
    assert(probedIds(TextSearch.searchIds(idx, Seq("Join", "FILTER ", "join"))) ==
      scanIds(docs, and2))
    // a term absent from the corpus: OR ignores it, AND empties
    assert(probedIds(TextSearch.searchIds(idx, Seq("join", "zzzznope"),
      minMatch = 1)) == scanIds(docs, Seq("join"), minMatch = 1))
    assert(TextSearch.searchIds(idx, Seq("join", "zzzznope")).isEmpty)
    // full-row search carries the corpus columns
    val rows = TextSearch.search(idx, docs, and2)
    assert(rows.columns.toSeq == docs.columns.toSeq)
    assert(probedIds(rows.select("doc_id")) == scanIds(docs, and2))
    intercept[IllegalArgumentException] {
      TextSearch.searchIds(idx, Seq("  ", ""))
    }
  }

  test("probe reads only the bucket dirs the terms hash to") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_dirs").toString
    val idx = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/ix",
      buckets = 64)
    val terms = Seq("join", "filter")
    import spark.implicits._
    val expected = terms.toDF("term")
      .select(TextSearch.termBucket(col("term"), 64))
      .collect().map(r => s"_tb=${r.getInt(0)}").toSet
    val files = TextSearch.searchIds(idx, terms).inputFiles
    assert(files.nonEmpty)
    val touched = files.map { f =>
      f.split("/").find(_.startsWith("_tb=")).getOrElse(fail(s"no _tb dir in $f"))
    }.toSet
    assert(touched.subsetOf(expected),
      s"probe touched $touched beyond the term buckets $expected")
  }

  test("append + compact answer a segmented corpus like a fresh build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_life").toString
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val idx = TextSearch.textIndexBuild(first, "text", "doc_id", s"$dir/seg",
      buckets = 16)
    TextSearch.textIndexAppend(idx, second, "text")
    // replayed append: duplicate postings must not change any answer
    TextSearch.textIndexAppend(idx, second, "text")
    val fresh = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/mono",
      buckets = 16)
    val terms = Seq("scan", "batch", "row")
    for (m <- Seq(0, 1, 2)) {
      val seg = probedIds(TextSearch.searchIds(idx, terms, m))
      assert(seg == probedIds(TextSearch.searchIds(fresh, terms, m)),
        s"segmented != fresh at minMatch=$m")
      assert(seg == scanIds(docs, terms, m))
    }
    val before = graft.operators.IndexMaint.dataFileCount(spark, idx.path)
    TextSearch.textIndexCompact(idx)
    val after = graft.operators.IndexMaint.dataFileCount(spark, idx.path)
    assert(after < before, s"compact did not shrink the file census ($before -> $after)")
    for (m <- Seq(0, 1, 2))
      assert(probedIds(TextSearch.searchIds(idx, terms, m)) ==
        scanIds(docs, terms, m), s"compacted answers drifted at minMatch=$m")
    // torn compaction swap (path renamed away, crash before tmp lands):
    // the next probe on a WARM handle must heal and answer, not return empty
    val p = new org.apache.hadoop.fs.Path(idx.path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(s"${idx.path}_old")))
    assert(probedIds(TextSearch.searchIds(idx, terms)) == scanIds(docs, terms),
      "probe did not heal a torn swap")
  }

  test("phrase search equals a positional full-scan recompute") {
    import org.apache.spark.sql.Row
    // full-scan phrase reference over the tokenized text
    def scanPhrase(corpus: DataFrame, phrase: Seq[String]): Set[Long] =
      corpus.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("a"))
        .collect().collect { case Row(id: Long, toks: scala.collection.Seq[_]) =>
          val a = toks.map(String.valueOf(_))
          val hit = a.indices.exists(p =>
            p + phrase.size <= a.size &&
              phrase.indices.forall(i => a(p + i) == phrase(i)))
          id -> hit
        }.collect { case (id, true) => id }.toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_phrase").toString
    val idx = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/ix",
      buckets = 32, positions = true)
    for (phrase <- Seq(Seq("table", "hash"), Seq("merge", "group"),
        Seq("customer", "join", "filter"))) {
      val got = probedIds(TextSearch.phraseIds(idx, phrase))
      assert(got == scanPhrase(docs, phrase), s"phrase $phrase diverged")
    }
    // adjacency matters: a phrase whose terms co-occur but never adjacently
    val coOccur = probedIds(TextSearch.searchIds(idx, Seq("hash", "table")))
    val adjacent = probedIds(TextSearch.phraseIds(idx, Seq("hash", "table")))
    assert(adjacent.subsetOf(coOccur))
    assert(adjacent == scanPhrase(docs, Seq("hash", "table")))
    // repeated-term phrase consults the same position set at both offsets
    import spark.implicits._
    val rep = Seq((1L, "the the end"), (2L, "the end the")).toDF("doc_id", "text")
    val repIx = TextSearch.textIndexBuild(rep, "text", "doc_id", s"$dir/rep",
      buckets = 4, positions = true)
    assert(probedIds(TextSearch.phraseIds(repIx, Seq("the", "the"))) == Set(1L))
    // unknown term empties; non-positional index refused; blank term refused
    assert(TextSearch.phraseIds(idx, Seq("table", "zzzznope")).isEmpty)
    val plain = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/plain",
      buckets = 8)
    intercept[IllegalArgumentException] {
      TextSearch.phraseIds(plain, Seq("table", "hash"))
    }
    intercept[IllegalArgumentException] {
      TextSearch.phraseIds(idx, Seq("table", " "))
    }
    // membership searches work unchanged on a positional index
    assert(probedIds(TextSearch.searchIds(idx, Seq("join", "filter"))) ==
      scanIds(docs, Seq("join", "filter")))
  }

  test("BM25 ranked retrieval equals a full-scan recompute; ranking properties hold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_bm25").toString
    val idx = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/ix",
      buckets = 32, positions = true)
    val terms = Seq("join", "filter", "hash")
    // full-scan recompute of the same Okapi formula over raw text
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("a"))
    val stats = toks.filter(col("a").isNotNull)
      .agg(count(lit(1)), sum(size(col("a")).cast("long"))).head()
    val (n, avgdl) = (stats.getLong(0), stats.getLong(1).toDouble / stats.getLong(0))
    val tf = toks.select(col("doc_id"), size(col("a")).as("dl"),
        explode(col("a")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) /
        (col("df") + 0.5)) * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    val expected = tf.join(broadcast(dfs), Seq("term"))
      .groupBy("doc_id").agg(round(sum(contrib), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = TextSearch.rankedSearch(idx, terms, k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected, s"BM25 diverged:\n got $got\n exp $expected")
    // a doc must beat another that matches strictly fewer of the terms
    // (same-ish length corpus; spot-check the extremes of the ranking)
    assert(got.head._2 >= got.last._2)
    // contract checks
    val plain = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/plain",
      buckets = 8)
    intercept[IllegalArgumentException] {
      TextSearch.rankedSearch(plain, terms, 5)
    }
    intercept[IllegalArgumentException] {
      TextSearch.rankedSearch(idx, terms, 0)
    }
    // unknown terms only: empty ranking, not an error
    assert(TextSearch.rankedSearch(idx, Seq("zzzznope"), 5).isEmpty)
    // append maintains the sidecar stats (docs/totalLen grow)
    import spark.implicits._
    val seg = Seq((100000L, "join filter hash join")).toDF("doc_id", "text")
    val idx2 = TextSearch.textIndexAppend(idx, seg, "text")
    assert(idx2.docs == idx.docs + 1 && idx2.totalLen == idx.totalLen + 4)
    // the new doc matches all three terms with tf 2 on one of them — it
    // must enter the top-k of the updated index
    val after = TextSearch.rankedSearch(idx2, terms, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(after.contains(100000L), s"appended doc missing from top-k: $after")
    // a replayed append double-counts stats (documented at-least-once
    // drift); compaction recounts them exactly from the deduplicated tree
    val idx3 = TextSearch.textIndexAppend(idx2, seg, "text")
    assert(idx3.docs == idx2.docs + 1, "replayed append drifts stats by design")
    val healed = TextSearch.textIndexCompact(idx3)
    assert(healed.docs == idx2.docs && healed.totalLen == idx2.totalLen,
      s"compaction must recount stats exactly, got $healed vs $idx2")
    assert(TextSearch.rankedSearch(healed, terms, k = 5)
      .collect().map(_.getLong(0)).toSet.contains(100000L))
  }

  test("concurrent superset growths never double-append: stats match a fresh build") {
    // two requests race with DIFFERENT supersets of the served corpus
    // (gen1 ⊂ gen2 ⊂ gen3): without the per-index growth lock both read
    // the gen1 lineage and both append their overlap — gen2's files land
    // twice and the sidecar double-counts. Whatever interleaving runs,
    // the final full-corpus index must carry exactly a fresh build's
    // stats and answers.
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_conc").toString
    val corpusDir = s"$dir/corpus"
    TextSearch.invalidateAllTextIndexes()
    docs.filter(col("doc_id") < 200).write.parquet(corpusDir)
    TextSearch.textIndexFor(spark.read.parquet(corpusDir), "spec/conc",
      "text", "doc_id", s"$dir/ix", buckets = 16, positions = true)
    docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
      .write.mode("append").parquet(corpusDir)
    val gen2 = spark.read.parquet(corpusDir) // file listing frozen at gen2
    docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .write.mode("append").parquet(corpusDir)
    val gen3 = spark.read.parquet(corpusDir)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val racing = Seq(gen2, gen3).map(g => pool.submit(
        new java.util.concurrent.Callable[TextSearch.TextIndex] {
          def call(): TextSearch.TextIndex = {
            latch.await()
            TextSearch.textIndexFor(g, "spec/conc", "text", "doc_id",
              s"$dir/ix", buckets = 16, positions = true)
          }
        }))
      latch.countDown()
      racing.foreach(_.get())
    } finally pool.shutdown()
    val iFinal = TextSearch.textIndexFor(gen3, "spec/conc", "text", "doc_id",
      s"$dir/ix", buckets = 16, positions = true)
    val fresh = TextSearch.textIndexBuild(gen3, "text", "doc_id",
      s"$dir/fresh", buckets = 16, positions = true)
    assert(iFinal.docs == fresh.docs && iFinal.totalLen == fresh.totalLen,
      s"concurrent growth corrupted stats: $iFinal vs $fresh")
    assert(TextSearch.rankedSearch(iFinal, Seq("join", "filter"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      TextSearch.rankedSearch(fresh, Seq("join", "filter"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("BM25 scores are bit-stable across shuffle partitioning") {
    // the deterministic reduction (sorted per-doc term fold) must yield
    // byte-identical scores whatever the partition count — the round-10
    // ADVICE rounding-boundary flake window. Each partition count runs in
    // its OWN newSession (separate SQLConf over the shared context):
    // suites run in parallel against one JVM-wide session, so mutating
    // the shared conf here would leak into concurrent streaming tests —
    // the exact shared-knob hazard this round removed from the operators.
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_det").toString
    val idx = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/ix",
      buckets = 32, positions = true)
    val terms = Seq("join", "filter", "hash", "table")
    def run(): Seq[(Long, Double, Long)] =
      TextSearch.rankedSearch(idx, terms, k = 25).orderBy("rank")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val base = run()
    val active0 = org.apache.spark.sql.SparkSession.getActiveSession
    try {
      for (p <- Seq("1", "7", "64")) {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", p)
        org.apache.spark.sql.SparkSession.setActiveSession(s2)
        assert(run() == base, s"BM25 ranking drifted at shuffle.partitions=$p")
      }
    } finally active0.foreach(
      org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("merged shard indexes answer like a monolithic build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_merge").toString
    val shardA = docs.filter(col("doc_id") % 3 === 0)
    val shardB = docs.filter(col("doc_id") % 3 =!= 0)
    val a = TextSearch.textIndexBuild(shardA, "text", "doc_id", s"$dir/a",
      buckets = 16)
    val b = TextSearch.textIndexBuild(shardB, "text", "doc_id", s"$dir/b",
      buckets = 16)
    val merged = TextSearch.textIndexMerge(a, b, s"$dir/m")
    val mono = TextSearch.textIndexBuild(docs, "text", "doc_id", s"$dir/mono",
      buckets = 16)
    val terms = Seq("join", "filter", "scan")
    for (m <- Seq(0, 1, 2))
      assert(probedIds(TextSearch.searchIds(merged, terms, m)) ==
        probedIds(TextSearch.searchIds(mono, terms, m)),
        s"merged != monolithic at minMatch=$m")
    // the merged tree is a first-class index: sidecar re-openable
    TextSearch.invalidateAllTextIndexes()
    val reopened = graft.operators.Similarity
      .readMeta[TextSearch.TextIndex](spark, merged.path)
    assert(reopened.contains(merged))
    // geometry mismatches fail loudly instead of mis-bucketing silently
    val odd = TextSearch.textIndexBuild(shardA, "text", "doc_id", s"$dir/odd",
      buckets = 8)
    intercept[IllegalArgumentException] {
      TextSearch.textIndexMerge(odd, b, s"$dir/m2")
    }
  }

  test("textIndexFor re-opens the sidecar instead of rebuilding") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_cache").toString
    val before = TextSearch.textBuildCount.get()
    val a = TextSearch.textIndexFor(docs, "spec-docs", "text", "doc_id", dir)
    assert(TextSearch.textBuildCount.get() == before + 1)
    // same key: served from the in-memory cache
    val b = TextSearch.textIndexFor(docs, "spec-docs", "text", "doc_id", dir)
    assert(b eq a)
    // restart simulation: cache cleared, sidecar re-opened — no rebuild
    TextSearch.invalidateAllTextIndexes()
    val c = TextSearch.textIndexFor(docs, "spec-docs", "text", "doc_id", dir)
    assert(TextSearch.textBuildCount.get() == before + 1)
    assert(c == a)
    assert(probedIds(TextSearch.searchIds(c, Seq("join"))) ==
      scanIds(docs, Seq("join")))
  }

  test("null texts are unindexed; blank tokens never indexed") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta"), (2L, null), (3L, "   "), (4L, "beta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_null").toString
    val idx = TextSearch.textIndexBuild(d, "text", "doc_id", s"$dir/ix",
      buckets = 4)
    assert(probedIds(TextSearch.searchIds(idx, Seq("beta"))) == Set(1L, 4L))
    val stored = spark.read.schema(idx.schema).parquet(idx.path)
    assert(stored.filter(length(col("term")) === 0).isEmpty)
    assert(stored.filter(col("id") === 2L).isEmpty)
  }

  test("max-score pruning is exact on adversarial rare/common corpora") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_prune").toString

    /** Full-scan Okapi recompute (the spec's independent reference). */
    def bruteTopK(corpus: DataFrame, terms: Seq[String], k: Int): Seq[(Long, Double)] = {
      val toks = corpus.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("a"))
      val st = toks.filter(col("a").isNotNull &&
          size(filter(col("a"), t => length(t) > 0)) > 0)
        .agg(count(lit(1)), sum(size(col("a")).cast("long"))).head()
      val (n, avgdl) = (st.getLong(0), st.getLong(1).toDouble / st.getLong(0))
      val tf = toks.select(col("doc_id"), size(col("a")).as("dl"),
          explode(col("a")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
      val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val contrib = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) /
          (col("df") + 0.5)) * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      tf.join(broadcast(dfs), Seq("term"))
        .groupBy("doc_id").agg(round(sum(contrib), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    // tiny corpora: pruneMinRows = 1 drops the volume bar so the pruning
    // path is exercised (explicit parameter, not session conf — no
    // concurrent query can observe it)
    def rankedPairs(idx: TextSearch.TextIndex, terms: Seq[String], k: Int) =
      TextSearch.rankedSearch(idx, terms, k, pruneMinRows = 1L).orderBy("rank")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // A: a rare term whose docs dominate — pruning must TRIGGER and the
    // all-tied candidate set must cut on the id tie-break exactly
    val a = ((1L to 5L).map(i => (i, "r c c")) ++
      (100L to 129L).map(i => (i, "c c c"))).toDF("doc_id", "text")
    val ixA = TextSearch.textIndexBuild(a, "text", "doc_id", s"$dir/a",
      buckets = 8, positions = true)
    val before = TextSearch.pruneHitCount.get()
    val gotA = rankedPairs(ixA, Seq("r", "c"), k = 2)
    assert(TextSearch.pruneHitCount.get() == before + 1,
      "rare/common split must take the pruned path")
    assert(gotA == bruteTopK(a, Seq("r", "c"), 2), s"pruned diverged: $gotA")
    assert(gotA.map(_._1) == Seq(1L, 2L), "tie must cut on smallest ids")

    // B: the ADVERSARIAL shape — docs WITHOUT the rare term belong in the
    // top-k (two common terms jointly outscore the long, weak rare docs),
    // so the verification must reject the candidate top-k and fall back
    // to exact full scoring. Pruning here would return the WRONG docs.
    val pad = (1 to 300).map(_ => "x").mkString(" ")
    val bDf = ((1L to 50L).map(i => (i, s"r $pad")) ++
      (101L to 300L).map(i => (i, ("c d " * 12).trim)) ++
      Seq((400L, ("c d " * 100).trim))).toDF("doc_id", "text")
    val ixB = TextSearch.textIndexBuild(bDf, "text", "doc_id", s"$dir/b",
      buckets = 8, positions = true)
    val before2 = TextSearch.pruneHitCount.get()
    val gotB = rankedPairs(ixB, Seq("r", "c", "d"), k = 3)
    assert(TextSearch.pruneHitCount.get() == before2,
      "candidate top-k cannot verify here; fallback required")
    assert(gotB == bruteTopK(bDf, Seq("r", "c", "d"), 3),
      s"fallback diverged: $gotB")
    assert(gotB.map(_._1) == Seq(400L, 101L, 102L),
      "common-term docs must win — pruning them would be a wrong answer")

    // C: a tree WITHOUT the tf tier (pre-tier layout) falls back to the
    // occurrence-collapse path with identical answers
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/a/_tf"), true)
    assert(rankedPairs(ixA, Seq("r", "c"), 2) == gotA,
      "tier-less tree must answer identically")
    assert(probedIds(TextSearch.searchIds(ixA, Seq("c"))) ==
      scanIds(a, Seq("c")))
  }

  test("textIndexFor: append-only growth appends the delta; GC sweeps orphans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_life2").toString
    val corpusDir = s"$dir/corpus"
    val ixDir = s"$dir/ix"
    TextSearch.invalidateAllTextIndexes()
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(corpusDir)
    val builds0 = TextSearch.textBuildCount.get()
    val appends0 = TextSearch.textDeltaAppendCount.get()
    val c1 = spark.read.parquet(corpusDir)
    val gen1Files = c1.inputFiles.toSeq // frozen pre-growth listing
    val i1 = TextSearch.textIndexFor(c1, "spec/growth", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 1)
    // append-only growth: new files land, old files untouched
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("append").parquet(corpusDir)
    val c2 = spark.read.parquet(corpusDir)
    val i2 = TextSearch.textIndexFor(c2, "spec/growth", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 1,
      "append-only growth must NOT rebuild")
    assert(TextSearch.textDeltaAppendCount.get() == appends0 + 1,
      "append-only growth must take the delta-append path")
    assert(i2.path == i1.path, "the grown corpus reuses the existing tree")
    // the appended tree answers exactly like a fresh build of the full corpus
    val fresh = TextSearch.textIndexBuild(c2, "text", "doc_id", s"$dir/fresh",
      buckets = 16, positions = true)
    for (terms <- Seq(Seq("join", "filter"), Seq("scan", "batch", "row")))
      assert(probedIds(TextSearch.searchIds(i2, terms, 1)) ==
        probedIds(TextSearch.searchIds(fresh, terms, 1)), s"grown != fresh for $terms")
    assert(TextSearch.rankedSearch(i2, Seq("join", "filter"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      TextSearch.rankedSearch(fresh, Seq("join", "filter"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // a repeat request is a pure cache hit
    TextSearch.textIndexFor(c2, "spec/growth", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 1 &&
      TextSearch.textDeltaAppendCount.get() == appends0 + 1)
    // a STALE pre-growth reader (its frame lists only gen-1's files)
    // re-opens the grown tree — the superset answer is the family's
    // at-least-once contract — and must NOT regress the lineage: were
    // its older file set written back, the NEXT growth would re-append
    // gen-2's files and double-count docs/totalLen in the sidecar
    val stale = spark.read.parquet(gen1Files: _*)
    val iStale = TextSearch.textIndexFor(stale, "spec/growth", "text",
      "doc_id", ixDir, buckets = 16, positions = true)
    assert(iStale.path == i2.path && iStale.docs == i2.docs,
      "stale reader must see the grown (superset) tree")
    // grow again with genuinely new docs: the delta must be ONLY them
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("append").parquet(corpusDir)
    val cFull = spark.read.parquet(corpusDir)
    val iFull = TextSearch.textIndexFor(cFull, "spec/growth", "text",
      "doc_id", ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 1 &&
      TextSearch.textDeltaAppendCount.get() == appends0 + 2,
      "third generation must still delta-append, not rebuild")
    val fresh3 = TextSearch.textIndexBuild(cFull, "text", "doc_id",
      s"$dir/fresh3", buckets = 16, positions = true)
    assert(iFull.docs == fresh3.docs && iFull.totalLen == fresh3.totalLen,
      "a regressed lineage would have re-appended gen-2 and inflated stats")
    // a REWRITTEN corpus (not a superset) rebuilds at a fresh path,
    // stranding the old tree — the GC sweep's job
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(corpusDir)
    val c3 = spark.read.parquet(corpusDir)
    val i3 = TextSearch.textIndexFor(c3, "spec/growth", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 2)
    assert(i3.path != i1.path)
    def trees(): Set[String] = {
      val f = new java.io.File(ixDir)
      // `_`-prefixed entries are bookkeeping (the persisted lineage blobs),
      // not index trees
      Option(f.list()).map(_.filterNot(_.startsWith("_")).toSet)
        .getOrElse(Set.empty)
    }
    assert(trees().size == 2, s"expected live + orphan, got ${trees()}")
    // restart simulation: only the current corpus is re-requested, the old
    // fingerprint never resolves again → its tree is the orphan
    TextSearch.invalidateAllTextIndexes()
    TextSearch.textIndexFor(c3, "spec/growth", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    val removed = TextSearch.textIndexGc(spark, ixDir, graceMs = 0L)
    assert(removed.size == 1, s"GC must sweep exactly the orphan, got $removed")
    assert(trees() == Set(i3.path.split("/").last))
    // the live tree still answers after the sweep
    assert(probedIds(TextSearch.searchIds(i3, Seq("join"), 1)).nonEmpty)
    // a second sweep is a no-op
    assert(TextSearch.textIndexGc(spark, ixDir, graceMs = 0L).isEmpty)
    // path-spelling robustness: a trailing-slash (or otherwise
    // non-canonical) baseDir must still recognize the LIVE tree — string
    // comparison of s"$baseDir/$root" against the cached path would mark
    // it an orphan and delete the actively served index
    assert(TextSearch.textIndexGc(spark, s"$ixDir/", graceMs = 0L).isEmpty,
      "a trailing-slash baseDir must not orphan the live tree")
    assert(probedIds(TextSearch.searchIds(i3, Seq("join"), 1)).nonEmpty,
      "the live tree must survive a non-canonical-path sweep")
  }

  test("index cache is LRU-bounded; an evicted index re-opens, never rebuilds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_lru").toString
    TextSearch.invalidateAllTextIndexes()
    // shrink the cap live (cacheCap re-reads the property per eviction)
    val prev = sys.props.put("graft.index.cache.max", "2")
    try {
      val builds0 = TextSearch.textBuildCount.get()
      // three distinct logical indexes over the same files: at cap 2, the
      // first (least-recently-touched) must evict
      for (k <- Seq("a", "b", "c"))
        TextSearch.textIndexFor(docs, s"spec/lru-$k", "text", "doc_id",
          s"$dir/ix", buckets = 8, positions = true)
      assert(TextSearch.textBuildCount.get() == builds0 + 3)
      assert(TextSearch.textCacheSize <= 2,
        s"cache must stay at the cap, got ${TextSearch.textCacheSize}")
      assert(TextSearch.textCacheEvictions >= 1)
      // the evicted index re-opens from its sidecar: buildCount stays flat
      // (the lifecycle contract that makes eviction safe at any moment)
      val re = TextSearch.textIndexFor(docs, "spec/lru-a", "text", "doc_id",
        s"$dir/ix", buckets = 8, positions = true)
      assert(TextSearch.textBuildCount.get() == builds0 + 3,
        "an evicted-then-re-requested index must re-open, not rebuild")
      assert(TextSearch.rankedSearch(re, Seq("join", "filter"), 5)
        .count() > 0)
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.cache.max", v)
        case None => sys.props.remove("graft.index.cache.max")
      }
      TextSearch.invalidateAllTextIndexes()
    }
  }

  test("append lineage survives a restart: a fresh JVM delta-appends, not rebuilds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_durl").toString
    val corpusDir = s"$dir/corpus"
    val ixDir = s"$dir/ix"
    TextSearch.invalidateAllTextIndexes()
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(corpusDir)
    val builds0 = TextSearch.textBuildCount.get()
    val appends0 = TextSearch.textDeltaAppendCount.get()
    val c1 = spark.read.parquet(corpusDir)
    TextSearch.textIndexFor(c1, "spec/durable", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 1)
    // append-only growth lands, then the JVM "restarts" (all in-memory
    // caches and lineage cleared — only the sidecars and the persisted
    // lineage blob survive)
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("append").parquet(corpusDir)
    TextSearch.invalidateAllTextIndexes()
    val c2 = spark.read.parquet(corpusDir)
    val i2 = TextSearch.textIndexFor(c2, "spec/durable", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 1,
      "a restarted JVM must take the delta-append fast path, not rebuild")
    assert(TextSearch.textDeltaAppendCount.get() == appends0 + 1)
    val fresh = TextSearch.textIndexBuild(c2, "text", "doc_id", s"$dir/fresh",
      buckets = 16, positions = true)
    assert(i2.docs == fresh.docs && i2.totalLen == fresh.totalLen,
      s"restart-recovered append skewed stats: $i2 vs $fresh")
    assert(TextSearch.rankedSearch(i2, Seq("join", "filter"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      TextSearch.rankedSearch(fresh, Seq("join", "filter"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // a SECOND restart over the grown (already-appended) corpus re-opens
    // the tree at its first generation's path via the blob — no rebuild,
    // no second delta
    TextSearch.invalidateAllTextIndexes()
    val i2b = TextSearch.textIndexFor(c2, "spec/durable", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    assert(TextSearch.textBuildCount.get() == builds0 + 1 &&
      TextSearch.textDeltaAppendCount.get() == appends0 + 1,
      "re-requesting the grown corpus after restart must be a pure re-open")
    assert(i2b.docs == fresh.docs)
    // post-restart STALE reader then growth: the blob seeds the lineage,
    // so the stale request must NOT regress it into a double-append
    TextSearch.invalidateAllTextIndexes()
    val stale = spark.read.parquet(c1.inputFiles.toSeq: _*)
    TextSearch.textIndexFor(stale, "spec/durable", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("append").parquet(corpusDir)
    val c3 = spark.read.parquet(corpusDir)
    val i3 = TextSearch.textIndexFor(c3, "spec/durable", "text", "doc_id",
      ixDir, buckets = 16, positions = true)
    val fresh3 = TextSearch.textIndexBuild(c3, "text", "doc_id",
      s"$dir/fresh3", buckets = 16, positions = true)
    assert(i3.docs == fresh3.docs && i3.totalLen == fresh3.totalLen,
      "a post-restart stale reader regressed the lineage into a double-append")
    TextSearch.invalidateAllTextIndexes()
  }

  test("textIndexAppend with a deterministic segmentId skips replays") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_seg").toString
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val i1 = TextSearch.textIndexBuild(half1, "text", "doc_id", s"$dir/ix",
      buckets = 16, positions = true)
    val i2 = TextSearch.textIndexAppend(i1, half2, "text",
      segmentId = "spec-seg-1")
    // replay (retried append, or a second JVM sharing baseDir): skipped
    // wholesale — the sidecar stats must NOT double-count
    val i3 = TextSearch.textIndexAppend(i2, half2, "text",
      segmentId = "spec-seg-1")
    assert(i3.docs == i2.docs && i3.totalLen == i2.totalLen,
      s"replayed append double-counted: $i3 vs $i2")
    // a replay against a STALE pre-append handle returns POST-append stats
    val i4 = TextSearch.textIndexAppend(i1, half2, "text",
      segmentId = "spec-seg-1")
    assert(i4.docs == i2.docs && i4.totalLen == i2.totalLen)
    val fresh = TextSearch.textIndexBuild(docs, "text", "doc_id",
      s"$dir/fresh", buckets = 16, positions = true)
    assert(i3.docs == fresh.docs && i3.totalLen == fresh.totalLen)
    assert(TextSearch.rankedSearch(i3, Seq("join", "filter"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      TextSearch.rankedSearch(fresh, Seq("join", "filter"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // a DIFFERENT segment id is a genuine append, not a replay
    val more = docs.filter(col("doc_id") % 2 === 1)
      .withColumn("doc_id", col("doc_id") + 2000000L)
    val i5 = TextSearch.textIndexAppend(i3, more, "text",
      segmentId = "spec-seg-2")
    assert(i5.docs == i3.docs + more.count())
  }

  test("segment markers survive compaction; stale claims are taken over") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_seg2").toString
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val i1 = TextSearch.textIndexBuild(half1, "text", "doc_id", s"$dir/ix",
      buckets = 16, positions = true)
    val i2 = TextSearch.textIndexAppend(i1, half2, "text", segmentId = "seg-a")
    // compaction rewrites the tree — the done-markers must ride the swap,
    // or a replayed append afterwards double-counts the recounted sidecar
    val i3 = TextSearch.textIndexCompact(i2)
    val i4 = TextSearch.textIndexAppend(i3, half2, "text", segmentId = "seg-a")
    assert(i4.docs == i3.docs && i4.totalLen == i3.totalLen,
      "replay after compaction double-counted: marker dropped by the rewrite")
    val fs = new org.apache.hadoop.fs.Path(i3.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed appender's claim (stale mtime, no done-marker): taken over,
    // the append runs, and the claim is cleaned behind the done-marker
    val more = half2.withColumn("doc_id", col("doc_id") + 3000000L)
    val claim = new org.apache.hadoop.fs.Path(s"${i3.path}/_gq_claim_seg-b")
    fs.create(claim, true).close()
    fs.setTimes(claim, System.currentTimeMillis() - 3600000L, -1)
    val i5 = TextSearch.textIndexAppend(i4, more, "text", segmentId = "seg-b")
    assert(i5.docs == i4.docs + more.count(), "stale claim not taken over")
    assert(!fs.exists(claim), "claim must be cleaned after the append")
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"${i3.path}/_gq_seg_seg-b")))
    // done-marker + lingering claim (a crash between the marker write and
    // the claim delete): the replay skips wholesale and cleans the claim
    fs.create(claim, true).close()
    val i6 = TextSearch.textIndexAppend(i5, more, "text", segmentId = "seg-b")
    assert(i6.docs == i5.docs && !fs.exists(claim),
      "replay with a lingering claim must skip and clean it")
  }

  test("stats fold into the persisted sidecar, not the caller's handle") {
    // appenders of DIFFERENT segments hold different claims, so nothing
    // serializes their sidecar read-modify-write across JVMs — and any
    // caller can legitimately pass a stale handle. Appending two distinct
    // segments BOTH against the pre-growth handle simulates exactly that:
    // handle arithmetic would lose the first fold (docs = base + |segB|),
    // the meta-locked persisted fold counts both.
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_fold").toString
    val base = docs.filter(col("doc_id") % 3 === 0)
    val segA = docs.filter(col("doc_id") % 3 === 1)
    val segB = docs.filter(col("doc_id") % 3 === 2)
    val i0 = TextSearch.textIndexBuild(base, "text", "doc_id", s"$dir/ix",
      buckets = 16, positions = true)
    TextSearch.textIndexAppend(i0, segA, "text", segmentId = "fold-a")
    val after = TextSearch.textIndexAppend(i0, segB, "text",
      segmentId = "fold-b") // STALE handle: sidecar already holds fold-a
    val fresh = TextSearch.textIndexBuild(docs, "text", "doc_id",
      s"$dir/fresh", buckets = 16, positions = true)
    assert(after.docs == fresh.docs && after.totalLen == fresh.totalLen,
      s"stale-handle fold lost an append: $after vs $fresh")
    // BM25 off the folded sidecar matches the monolithic build
    assert(TextSearch.rankedSearch(after, Seq("join", "filter"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      TextSearch.rankedSearch(fresh, Seq("join", "filter"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
