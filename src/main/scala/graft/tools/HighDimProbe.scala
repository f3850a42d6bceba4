package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN-tier latency/recall at REALISTIC embedding dimension — every
  * pre-round-9 ANN number came from the dim-64 fixture table; dot cost,
  * LSH geometry and the centroid-transport budget all change with
  * dimension. Args: [n] [dim] [nlist] (defaults 100000, 256, 256 — the
  * nlist puts assignment on the broadcast-DATA centroid arm:
  * 256 × 256 = 65,536 floats > the 8,192 literal budget).
  *
  * The corpus is synthesized DISTRIBUTED and deterministically (expression
  * -only: xxhash64-keyed pseudo-noise around 400 cluster seeds) — no
  * driver-side data, so the probe scales to any n the box holds. */
object HighDimProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100000)
    val dim = args.lift(1).map(_.toInt).getOrElse(256)
    val nlist = args.lift(2).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_MASTER=local-cluster[...] runs the probe on real executor JVMs
    val spark = graft.Master.configure(SparkSession.builder(), s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic [-1, 1) pseudo-component keyed by (family, a, b)
    def comp(fam: String, a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (pmod(xxhash64(lit(fam), a, b), lit(2000000L)) - lit(1000000L)) / lit(1000000.0)

    val clusters = 400
    val dims = sequence(lit(0), lit(dim - 1))
    val corpus = spark.range(n.toLong).toDF("vec_id")
      .withColumn("_c", col("vec_id") % clusters)
      .withColumn("embedding", transform(dims, d =>
        (comp("seed", col("_c"), d) +
          lit(0.6) * comp("noise", col("vec_id"), d)).cast("float")))
      .drop("_c")
      .localCheckpoint(true) // freeze: index builds and probes re-read rows

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val q = corpus.filter(col("vec_id") < 20)
    val bf = timed(s"bruteForce n=$n dim=$dim (20 queries)") {
      Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recall(got: DataFrame): Double = {
      val g = got.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      bf.intersect(g).size.toDouble / bf.size
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_highdim").toString
    val lsh = timed(s"lshBuild planes=auto dim=$dim") {
      Similarity.lshBuild(corpus, "vec_id", "embedding", planes = 0,
        dim = dim, path = s"$dir/lsh")
    }
    val rl1 = timed("lshProbe cold (20 queries, probes=2)") {
      recall(Similarity.lshProbe(lsh, q, k = 5, probes = 2))
    }
    val rl2 = timed("lshProbe warm") {
      recall(Similarity.lshProbe(lsh, q, k = 5, probes = 2))
    }
    println(f"PROBE lsh recall@5 cold=$rl1%.2f warm=$rl2%.2f planes=${lsh.planes}")

    val ivf = timed(s"ivfBuild nlist=$nlist (broadcast centroid arm)") {
      Similarity.ivfBuild(corpus, "vec_id", "embedding", nlist, s"$dir/ivf")
    }
    val ri = timed("ivfProbe cold (20 queries, nprobe=16)") {
      recall(Similarity.ivfProbe(ivf, q, k = 5, nprobe = 16))
    }
    val ri2 = timed("ivfProbe warm") {
      recall(Similarity.ivfProbe(ivf, q, k = 5, nprobe = 16))
    }
    println(f"PROBE ivf recall@5 cold=$ri%.2f warm=$ri2%.2f")

    val rq = timed("quantizedTopK (20 queries, rerank=50)") {
      recall(Similarity.quantizedTopK(corpus, q, "vec_id", "embedding", 5,
        rerank = 50))
    }
    println(f"PROBE quantized recall@5 $rq%.2f")

    // ingest-time random projection (dim -> dim/4): every downstream
    // scan/shuffle/index shrinks by the same factor; measure what the
    // dimension cut costs in recall on THIS clustered corpus
    val outDim = math.max(8, dim / 4)
    val proj = timed(s"randomProject $dim -> $outDim (corpus + queries)") {
      Similarity.randomProject(corpus, "embedding", "proj", outDim, dim)
        .select(col("vec_id"), col("proj")).localCheckpoint(true)
    }
    val pq = proj.filter(col("vec_id") < 20)
    // identity recall is near-meaningless on this corpus (same-cluster
    // members are cosine near-ties whose ORDER is noise — any projection
    // reshuffles it); the load-bearing metric for the dedup/ANN tiers is
    // CLUSTER preservation: do projected neighbors come from the query's
    // cluster?
    def sameCluster(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      got.count { case (a, b) => a % clusters == b % clusters }
        .toDouble / got.length
    }
    val nativeSc = sameCluster(
      Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5))
    val pb = timed(s"bruteForce over PROJECTED dim=$outDim (20 queries)") {
      Similarity.bruteForceTopK(proj, pq, "vec_id", "proj", 5)
        .localCheckpoint(true)
    }
    val plsh = timed(s"lshBuild over PROJECTED dim=$outDim") {
      Similarity.lshBuild(proj, "vec_id", "proj", planes = 0,
        dim = outDim, path = s"$dir/lsh_proj")
    }
    val plp = timed("lshProbe over PROJECTED (20 queries, probes=2)") {
      Similarity.lshProbe(plsh, pq, k = 5, probes = 2).localCheckpoint(true)
    }
    println(f"PROBE projected dim=$outDim same-cluster@5: " +
      f"brute=${sameCluster(pb)}%.2f lsh=${sameCluster(plp)}%.2f " +
      f"(native-dim brute ${nativeSc}%.2f); identity recall@5 " +
      f"brute=${recall(pb)}%.2f (near-ties reshuffle, expected low)")
    spark.stop()
  }
}
