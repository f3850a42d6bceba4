package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graphql.GraphQLService

/** Serving-lifetime soak (round-12 verdict #2): a long-lived service
  * fielding MANY DISTINCT filtered `search(k:)` plans — each of which
  * deliberately builds and caches one logical index per distinct plan (the
  * documented per-slice-statistics semantics) — must keep BOTH its heap
  * maps and its on-disk tree count bounded, and every evicted-then-
  * re-requested plan must answer identically (re-opened from its sidecar
  * or rebuilt after a GC sweep — never a wrong answer).
  *
  * Shrinks the LRU cap live (graft.index.cache.max), issues `plans`
  * distinct filtered ranked searches, reports cache/tree censuses, runs
  * the GC with grace 0 (evicted trees swept immediately), then replays
  * every plan and compares answers bit-for-bit against the first pass.
  *
  * Args: <sf dir> [plans] [cap]. */
object LifecycleSoak {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val plans = if (args.length > 1) args(1).toInt else 24
    val cap = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.TextSearch.invalidateAllTextIndexes()
    sys.props.put("graft.index.cache.max", cap.toString)

    val service = new GraphQLService(spark, sf)
    def treeCount(): Int = {
      val f = new java.io.File(service.indexDir)
      Option(f.list()).map(_.count(_.startsWith("tx_"))).getOrElse(0)
    }
    // each plan filters a distinct residue class, then ranks WITHOUT
    // corpus: — a distinct logical index (plan-keyed corpus identity) per
    // request, the exact shape that grew without bound before round 12
    def query(i: Int): String = {
      val q = s"""{ documents { f: filter(where: {eq: [{mod: [{name: "doc_id"}, {value: $plans}]}, {value: $i}]}) {
        s: search(terms: ["join", "filter"], on: "text", id: "doc_id", k: 5) {
        o: order(by: ["rank"]) { columns { doc_id { values } rank { values } } } } } } }"""
      q
    }
    def stripTimings(body: String): String =
      body.replaceAll(""""timing_ms":\{[^}]*\}""", "")
    val builds0 = graft.operators.TextSearch.textBuildCount.get
    val evict0 = graft.operators.TextSearch.textCacheEvictions
    val first = (0 until plans).map { i =>
      val t0 = System.nanoTime()
      val r = stripTimings(service.execute(query(i)))
      val dt = (System.nanoTime() - t0) / 1e9
      require(!r.contains("\"errors\""), s"plan $i failed: ${r.take(200)}")
      (r, dt)
    }
    val builds1 = graft.operators.TextSearch.textBuildCount.get
    println(f"SOAK first pass: $plans plans, builds=${builds1 - builds0} " +
      f"p50=${first.map(_._2).sorted.apply(plans / 2)}%.2fs")
    println(s"SOAK cacheSize=${graft.operators.TextSearch.textCacheSize} " +
      s"(cap $cap) evictions=" +
      s"${graft.operators.TextSearch.textCacheEvictions - evict0} " +
      s"trees=${treeCount()}")
    require(graft.operators.TextSearch.textCacheSize <= cap,
      "heap map exceeded the cap")
    // GC with zero grace: every tree not in the live (≤ cap) set sweeps
    val swept = service.indexGc(graceMs = 0L)
    println(s"SOAK gc swept=${swept.size} trees=${treeCount()} (want <= $cap)")
    require(treeCount() <= cap, "disk tree count exceeded the cap after GC")
    // replay EVERY plan: evicted-but-unswept → sidecar re-open; swept →
    // rebuild; answers must be identical either way
    val builds2 = graft.operators.TextSearch.textBuildCount.get
    var mismatches = 0
    (0 until plans).foreach { i =>
      val r = stripTimings(service.execute(query(i)))
      if (r != first(i)._1) { mismatches += 1
        println(s"SOAK MISMATCH plan $i: ${r.take(120)}") }
    }
    println(s"SOAK replay: mismatches=$mismatches (want 0) rebuilds=" +
      s"${graft.operators.TextSearch.textBuildCount.get - builds2} " +
      s"(swept plans rebuild; cached/evicted-unswept must not)")
    println(s"SOAK final cacheSize=${graft.operators.TextSearch.textCacheSize} " +
      s"trees=${treeCount()}")
    spark.stop()
  }
}
