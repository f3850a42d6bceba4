package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Amplified-corpus soak probe (round-7 scale evidence; not part of the
  * driver contract): on a gen_scale.py-amplified dataset — verbatim-copied
  * embedding vectors (dense cosine clusters) and copyK-prefixed near-dup
  * document clusters — measure the band-bucket occupancy the caps exist
  * for: bucket histogram, hot-bucket count at the default cap, and the
  * capped-vs-uncapped candidate volume/wall-time of the banded cosine
  * self-join. Args: <amplified sf dir>. */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/repo/tmpscale/sf1.2"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")

    val buckets = (0 until 8).map(t => struct(lit(t).as("t"),
      Similarity.lshBucket(col("embedding"), 4, 64, t).as("b")))
    val occ = embs.select(explode(array(buckets: _*)).as("_bucket"))
      .groupBy("_bucket").count()
    val st = occ.agg(max("count"), avg("count"), count(lit(1))).head
    println(f"SOAK lsh-bucket occupancy: nBuckets=${st.getLong(2)} " +
      f"avg=${st.getDouble(1)}%.1f max=${st.getLong(0)}")
    println(s"SOAK hot buckets (> default cap 1000): " +
      occ.filter(col("count") > 1000).count())

    def pairs(maxBucket: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Similarity.lshCosinePairs(embs, "vec_id", "embedding", 0.2,
        planes = 4, dim = 64, maxBucket = maxBucket).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nc, tc) = pairs(1000)
    println(f"SOAK lshCosinePairs capped(1000): $nc pairs in $tc%.1fs")
    val (nu, tu) = pairs(0)
    println(f"SOAK lshCosinePairs uncapped: $nu pairs in $tu%.1fs")

    val t1 = System.nanoTime()
    val mh = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5).count()
    println(f"SOAK minhashPairs(default cap): $mh pairs in ${(System.nanoTime() - t1) / 1e9}%.1fs")
    spark.stop()
  }
}
