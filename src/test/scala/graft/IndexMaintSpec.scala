package graft

import graft.operators.IndexMaint

/** White-box pins on the shared serve-side index lifecycle machinery:
  * the persisted-lineage advance guard and the in-flight GC shield —
  * hazards that surface only under eviction/GC timing a family-level spec
  * cannot reach deterministically. */
class IndexMaintSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("a stale reader never writes its older file set over the lineage blob") {
    // Scenario (round-12 review): the in-memory lineage entry for params P
    // is LRU-evicted and then RE-populated by a stale pre-growth reader
    // (its merge lands in an empty slot, so advance-only cannot save it).
    // The blob write-guard must still refuse to overwrite the persisted
    // advanced lineage — otherwise the next growth computes its delta from
    // the stale set and re-appends files already in the tree.
    val baseDir = tmpDir("graft_blob_guard")
    val cache = new IndexMaint.LruCache[String](() => 16)
    val lineage =
      new IndexMaint.LruCache[(Map[String, (Long, Long)], String)](() => 16)
    val gen1 = Map("f1" -> ((1L, 1L)))
    val gen2 = gen1 + ("f2" -> ((2L, 2L)))
    var builds = 0
    def request(key: String, files: Map[String, (Long, Long)]): String =
      IndexMaint.cachedIndexFor[String](
        spark, cache, lineage, baseDir,
        params = "tx|spec", key = key, files = files,
        path = s"$baseDir/tree_$key", pathOf = identity,
        reopenAt = _ => None,
        build = () => { builds += 1; s"$baseDir/tree_$key" },
        append = (p, _) => p, onDelta = () => ())
    request("k2", gen2) // grown generation served: blob records (gen2, k2)
    assert(IndexMaint.readLineageBlob(spark, baseDir, "tx|spec")
      .exists(_._2 == "k2"))
    // simulate the eviction race: the in-memory entry is repopulated with
    // the STALE lineage (what a pre-growth reader's merge into an emptied
    // slot produces), then that reader computes and reaches the blob write
    lineage.clear()
    lineage.merge("tx|spec", (gen1, "k1"), (_, n) => n)
    request("k1", gen1)
    val blob = IndexMaint.readLineageBlob(spark, baseDir, "tx|spec")
    assert(blob.exists(_._2 == "k2"),
      s"stale reader overwrote the advanced lineage blob: $blob")
    assert(blob.exists(_._1 == gen2))
  }

  test("gcOrphans spares trees whose build is in flight in this JVM") {
    val baseDir = tmpDir("graft_gc_inflight")
    val fs = new org.apache.hadoop.fs.Path(baseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tree = new org.apache.hadoop.fs.Path(s"$baseDir/tx_building")
    fs.mkdirs(tree)
    fs.setTimes(tree, System.currentTimeMillis() - 3600000L, -1)
    // a half-written tree: in no cache (builds register only on return),
    // older than the grace window — exactly what a scheduled sweep would
    // eat mid-build without the in-flight shield
    val swept = IndexMaint.trackInFlight(tree.toString) {
      IndexMaint.gcOrphans(spark, baseDir, Seq("tx_"),
        live = Set.empty, graceMs = 0L)
    }
    assert(swept.isEmpty && fs.exists(tree),
      "the GC swept a tree whose build was still running")
    // once the build returns (registration dropped) an un-live tree is
    // an ordinary orphan again
    val sweptAfter = IndexMaint.gcOrphans(spark, baseDir, Seq("tx_"),
      live = Set.empty, graceMs = 0L)
    assert(sweptAfter.nonEmpty && !fs.exists(tree))
  }

  test("gcOrphans reaps a swept tree's lock companion, spares a live root's") {
    val baseDir = tmpDir("graft_gc_lock")
    val fs = new org.apache.hadoop.fs.Path(baseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mk(name: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(s"$baseDir/$name")
      fs.mkdirs(p); fs.setTimes(p, System.currentTimeMillis() - 3600000L, -1)
      p
    }
    def lockOf(root: String): org.apache.hadoop.fs.Path =
      new org.apache.hadoop.fs.Path(s"$baseDir/.$root._gq_treelock")
    // orphan tree + its writer-lock dotfile: both must go in one sweep
    mk("tx_dead")
    fs.create(lockOf("tx_dead"), true).close()
    // live tree whose stranded _old companion gets swept: the ROOT's lock
    // may be held by a writer and must survive
    val liveTree = mk("tx_live"); mk("tx_live_old")
    fs.create(lockOf("tx_live"), true).close()
    IndexMaint.gcOrphans(spark, baseDir, Seq("tx_"),
      live = Set(liveTree.toString), graceMs = 0L)
    assert(!fs.exists(lockOf("tx_dead")),
      "a swept tree's lock companion must be reaped with it")
    assert(fs.exists(liveTree) && fs.exists(lockOf("tx_live")),
      "sweeping an _old companion must not reap the live root's lock")
    // the dotfile itself is never treated as a sweepable tree
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$baseDir/tx_dead")))
  }
}
