package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** k-NN JOIN tier at big×big scale: both sides are TABLES (100k × 100k
  * default = 10^10 candidate pairs if done naively), so the probe measures
  * what the operator exists for — candidate restriction via LSH buckets /
  * IVF cells with NO broadcast of either side — against a brute-force
  * ground truth computed on a query SAMPLE only (the full exact join is
  * the quadratic blowup the approximations avoid).
  *
  * Args: [nLeft] [nRight] [dim] (defaults 100000, 100000, 64).
  * Corpus shape mirrors HighDimProbe: deterministic xxhash64 pseudo-noise
  * around shared cluster seeds, so left rows have true neighbors in the
  * right table and recall is meaningful.
  */
object KnnJoinProbe {
  def main(args: Array[String]): Unit = {
    val nLeft = args.lift(0).map(_.toInt).getOrElse(100000)
    val nRight = args.lift(1).map(_.toInt).getOrElse(100000)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_MASTER=local-cluster[...] runs the probe on real executor JVMs
    val spark = graft.Master.configure(SparkSession.builder(), s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def comp(fam: String, a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (pmod(xxhash64(lit(fam), a, b), lit(2000000L)) - lit(1000000L)) / lit(1000000.0)

    val clusters = 400
    val dims = sequence(lit(0), lit(dim - 1))
    def mk(n: Int, fam: String, idOffset: Long): DataFrame =
      spark.range(n.toLong).toDF("vec_id")
        .withColumn("vec_id", col("vec_id") + idOffset)
        .withColumn("_c", col("vec_id") % clusters)
        .withColumn("embedding", transform(dims, d =>
          (comp("seed", col("_c"), d) +
            lit(0.6) * comp(fam, col("vec_id"), d)).cast("float")))
        .drop("_c")
        .localCheckpoint(true)

    // disjoint id ranges: a knn JOIN pairs two different tables; the
    // null-safe self-exclusion must never fire here
    val right = mk(nRight, "noiseR", 0L)
    val left = mk(nLeft, "noiseL", 10000000L)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ground truth on a 500-query sample (exact over the sample only)
    val sample = left.filter(col("vec_id") < 10000000L + 500)
    val truth = timed("bruteForceTopK sample=500 (ground truth)") {
      Similarity.bruteForceTopK(right.unionAll(sample), sample,
        "vec_id", "embedding", 5)
        .filter(col("neighbor_id") < 10000000L) // neighbors from RIGHT only
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recallOf(df: DataFrame): Double = {
      val got = df.filter(col("query_id") < 10000000L + 500)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }

    val planes = Similarity.planesFor(nRight)
    val lsh0 = timed(s"knnJoinLsh $nLeft x $nRight planes=$planes probes=0") {
      val df = Similarity.knnJoinLsh(left, right, "vec_id", "embedding", 5,
        planes = planes, dim = dim)
      val n = df.count(); println(s"PROBE   rows=$n"); df
    }
    println(f"PROBE knnJoinLsh probes=0 recall@5 ${recallOf(lsh0)}%.3f")
    val lsh1 = timed(s"knnJoinLsh probes=1") {
      val df = Similarity.knnJoinLsh(left, right, "vec_id", "embedding", 5,
        planes = planes, dim = dim, probes = 1)
      val n = df.count(); println(s"PROBE   rows=$n"); df
    }
    println(f"PROBE knnJoinLsh probes=1 recall@5 ${recallOf(lsh1)}%.3f")

    val nlist = 256 // above the literal budget at dim >= 64: broadcast arm
    val ivf = timed(s"knnJoinIvf nlist=$nlist nprobe=8") {
      val df = Similarity.knnJoinIvf(left, right, "vec_id", "embedding", 5,
        nlist = nlist, nprobe = 8)
      val n = df.count(); println(s"PROBE   rows=$n"); df
    }
    println(f"PROBE knnJoinIvf recall@5 ${recallOf(ivf)}%.3f")

    // brute join of the FULL left table — only at small sizes; guarded so
    // the default probe never runs the quadratic shape
    if (nLeft.toLong * nRight <= 100000000L) {
      timed(s"knnJoinBrute $nLeft x $nRight (full exact)") {
        Similarity.knnJoinBrute(left, right, "vec_id", "embedding", 5).count()
      }
    } else {
      // per-1k-queries exact cost, to extrapolate what the approximate
      // tiers avoid
      val left1k = left.filter(col("vec_id") < 10000000L + 1000)
      timed(s"knnJoinBrute 1000 x $nRight (exact slice, extrapolate x${nLeft / 1000})") {
        Similarity.knnJoinBrute(left1k, right, "vec_id", "embedding", 5).count()
      }
    }
    spark.stop()
  }
}
