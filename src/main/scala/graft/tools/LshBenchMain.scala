package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Ad-hoc micro-benchmark: fused LshBits vs the composable plane fold over
  * the sf0.1 embeddings (8 tables × 4 planes × 64 dims). Not part of the
  * driver contract; evidence for the fused-expression tier. */
object LshBenchMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (variant <- Seq("fused", "composable", "fused", "composable")) {
      val t0 = System.nanoTime()
      val b =
        if (variant == "fused")
          (0 until 8).map(t => Similarity.lshBucket(col("embedding"), 4, 64, t))
        else
          (0 until 8).map(t => Similarity.lshBucketComposable(col("embedding"), 4, 64, t))
      e.select(b.reduce(_ + _).as("s")).write.format("noop").mode("overwrite").save()
      println(f"$variant: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
