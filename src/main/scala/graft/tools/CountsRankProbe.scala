package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.core.{GTable, Tables}

/** Measures the three ranking strategies on the SAME rank-only shape
  * (partition l_returnflag, order l_quantity desc — ndv ≈ 150 tuples):
  * plain window, range-partitioned distributed rankings, and the
  * broadcast-counts strategy (rankingsByCounts). Args: <sf dir> [reps]. */
object CountsRankProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = GTable(Tables.load(spark, sf, "lineitem"))
    def timed(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name best=${runs.min}%.2f raw=${runs.map(r => f"$r%.2f").mkString("[", ",", "]")}")
    }
    val keys = Seq("l_returnflag")
    val ord = Seq(col("l_quantity"))
    timed("window") {
      val w = graft.functions.GWindows.spec(keys.map(col), Seq(col("l_quantity").desc))
      li.project("rk0" -> graft.functions.GWindows.rank0(w),
        "dr0" -> graft.functions.GWindows.denseRank0(w),
        "pr" -> graft.functions.GWindows.percentRank(w)).result
    }
    timed("dist")(
      li.rankings(keys, ord, desc = Seq(true), rank = Some("rk0"),
        denseRank = Some("dr0"), percentRank = Some("pr")).result)
    timed("counts")(
      li.rankingsByCounts(keys, ord, desc = Seq(true), rank = Some("rk0"),
        denseRank = Some("dr0"), percentRank = Some("pr")).get.result)
    spark.stop()
  }
}
