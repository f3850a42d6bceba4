package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Amplified-corpus soak probe (round-7 scale evidence; not part of the
  * driver contract): on a gen_scale.py-amplified dataset — verbatim-copied
  * embedding vectors (dense cosine clusters) and copyK-prefixed near-dup
  * document clusters — measure the band-bucket occupancy the caps exist
  * for: bucket histograms for BOTH banded self-joins (hyperplane-LSH
  * cosine and MinHash bands), hot-bucket counts at the cap, and
  * capped-vs-uncapped candidate volume / wall time.
  *
  * Args: <amplified sf dir> [--cap N] [--skip-uncapped]
  * `--skip-uncapped` is for the skew-regime corpus (cluster width > cap),
  * where the uncapped join is quadratic by construction — the point is
  * that the capped run stays bounded, not that the uncapped one finishes.
  */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/repo/tmpscale/sf1.2")
    val skipUncapped = args.contains("--skip-uncapped")
    val cap = args.sliding(2).collectFirst {
      case Array("--cap", v) => v.toInt
    }.getOrElse(Dedup.DefaultMaxBucket)
    // hyperplane count scales with corpus size in a real deployment
    // (buckets ≈ 2^planes per table); `--planes 0` exercises the round-8
    // auto-sizing default (Similarity.planesFor of the corpus count)
    val planesArg = args.sliding(2).collectFirst {
      case Array("--planes", v) => v.toInt
    }.getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface the capBuckets log.info line the round-7 soak is asked to observe
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.operators", org.apache.logging.log4j.Level.INFO)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val planes =
      if (planesArg > 0) planesArg else Similarity.planesFor(embs.count())
    println(s"SOAK dir=$sf cap=$cap planes=$planes" +
      (if (planesArg == 0) " (auto via planesFor)" else "") +
      s" docs=${docs.count()} embs=${embs.count()}")

    def occStats(name: String, occ: DataFrame): Unit = {
      val st = occ.agg(max("count"), avg("count"), count(lit(1))).head
      val hot = occ.filter(col("count") > cap).count()
      println(f"SOAK $name occupancy: nBuckets=${st.getLong(2)} " +
        f"avg=${st.getDouble(1)}%.1f max=${st.getLong(0)} hot(>$cap)=$hot")
    }
    val buckets = (0 until 8).map(t => struct(lit(t).as("t"),
      Similarity.lshBucket(col("embedding"), planes, 64, t).as("b")))
    occStats("lsh-cosine-bucket", embs
      .select(explode(array(buckets: _*)).as("_bucket"))
      .groupBy("_bucket").count())
    occStats("minhash-band-bucket",
      Dedup.minhashBandOccupancy(docs, "text", "doc_id"))

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK $what in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val nc = timed(s"lshCosinePairs capped($cap)") {
      Similarity.lshCosinePairs(embs, "vec_id", "embedding", 0.2,
        planes = planes, dim = 64, maxBucket = cap).count()
    }
    println(s"SOAK lshCosinePairs capped pairs=$nc")
    val mc = timed(s"minhashPairs capped($cap)") {
      Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5,
        maxBucket = cap).count()
    }
    println(s"SOAK minhashPairs capped pairs=$mc")
    // dropped-mass metrics (round-8): the counts behind any recall loss
    graft.operators.Dedup.lastCapDrops.toSeq.sortBy(_._1).foreach {
      case (op, d) =>
        println(s"SOAK capDrops $op: buckets=${d.buckets} rows=${d.rows}")
    }
    if (!skipUncapped) {
      val nu = timed("lshCosinePairs uncapped") {
        Similarity.lshCosinePairs(embs, "vec_id", "embedding", 0.2,
          planes = planes, dim = 64, maxBucket = 0).count()
      }
      println(s"SOAK lshCosinePairs uncapped pairs=$nu (capped==uncapped: ${nu == nc})")
      val mu = timed("minhashPairs uncapped") {
        Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5,
          maxBucket = 0).count()
      }
      println(s"SOAK minhashPairs uncapped pairs=$mu (capped==uncapped: ${mu == mc})")
    }
    spark.stop()
  }
}
