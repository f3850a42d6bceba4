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
    // the AUTO dispatch's actual decision at this scale (rankingsFlip is
    // the exact predicate rankingsAuto branches on) + a timed auto run
    import org.apache.spark.sql.functions.col
    val li = graft.core.GTable(graft.core.Tables.load(spark, sf, "lineitem"))
    val (est, flip, flips) = li.rankingsFlip
    println(s"PROBE rankingsAuto estimatedRows=$est flipRows=$flip " +
      s"-> ${if (flips) "DISTRIBUTED" else "WINDOW"}")
    val autoRuns = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      // the full 5-function shape of q_window_rank, so the auto timing is
      // apples-to-apples with the window/dist pair above
      li.rankingsAuto(Seq("l_returnflag"),
          Seq(col("l_quantity"), col("l_orderkey"), col("l_linenumber")),
          desc = Seq(true, false, false), rowNumber = Some("rn0"),
          rank = Some("rk0"), denseRank = Some("dr0"),
          percentRank = Some("pr"), ntile = Some((4, "nt0")))
        .result.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE rankingsAuto best=${autoRuns.min}%.2f raw=${autoRuns.map(r => f"$r%.2f").mkString("[", ",", "]")}")
    spark.stop()
  }
}
