package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Measures the q_window_rank / q_window_rank_dist pair (same oracle,
  * window vs range-partitioned strategy) on a given sf dir — the
  * measurement `spark.graft.rankings.flipRows` should be calibrated
  * against. Args: <sf dir> [reps]. */
object RankFlipProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/repo/tmpscale/sf1.2")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qmap = SparkEntry.queries
    for (name <- Seq("q_window_rank", "q_window_rank_dist")) {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        qmap(name)(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name best=${runs.min}%.2f raw=${runs.map(r => f"$r%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
