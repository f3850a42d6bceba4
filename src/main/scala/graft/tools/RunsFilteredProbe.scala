package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Measures the filtered-runs arms on a given sf dir — the round-9
  * verdict's last scale-killer: `filter → runs` used to fall back to an
  * unpartitioned `Window.orderBy(rid)` (one task sorts the world).
  *
  * Arms (all the q_runs_filtered shape on events, value > 0.2):
  *   serial — the old fallback: filter → runs() (global window)
  *   dist   — filter → densify() → runsDistributed (block prefix sums)
  *   dense  — runsDistributed on the UNfiltered table (the q_runs_dist
  *            reference slope: "scales like q_runs_dist" is the claim)
  *
  * Also asserts serial ≡ dist (row count + content hash) once, so the
  * timing compares equal answers. Args: <sf dir> [reps] [skipSerial].
  */
object RunsFilteredProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/tmpscale/sf1.2")
    val reps = if (args.length > 1) args(1).toInt else 3
    val skipSerial = args.length > 2 && args(2) == "skipSerial"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def filtered = GTable(Tables.loadOrdered(spark, sf, "events"))
      .filter(col("value") > 0.2)
    val aggs = Seq(min(col("event_id")).as("first_id"),
      round(sum(col("value")), 6).as("run_value"))

    def serialArm = filtered
      .runsSerial(by = Seq("event_type"), aggs = aggs, counts = Some("n")).result
    def distArm = filtered.densify()
      .runsDistributed(by = Seq("event_type"), aggs = aggs, counts = Some("n"))
      .result
    def denseArm = GTable(Tables.loadOrdered(spark, sf, "events"))
      .runsDistributed(by = Seq("event_type"), aggs = aggs, counts = Some("n"))
      .result

    val n = GTable(Tables.loadOrdered(spark, sf, "events")).df.count()
    println(s"PROBE events rows=$n")

    // equality first (one pass each): same runs, same content
    def digest(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      val h = df.select(md5(concat_ws("",
        df.columns.sorted.map(c => col(c).cast("string")): _*)).as("h"))
        .agg(count(lit(1)),
          sum(conv(substring(col("h"), 1, 8), 16, 10).cast("decimal(20,0)")))
        .head()
      (h.getLong(0), Option(h.get(1)).map(_.toString).getOrElse("null"))
    }
    val dDist = digest(distArm)
    if (!skipSerial) {
      val dSer = digest(serialArm)
      require(dSer == dDist, s"serial $dSer != dist $dDist")
      println(s"PROBE equality serial==dist rows=${dDist._1}")
    } else println(s"PROBE dist rows=${dDist._1} (serial skipped)")

    def time(label: String, r: Int)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to r).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label best=${runs.min}%.2f raw=${runs.map(x => f"$x%.2f").mkString("[", ",", "]")}")
    }
    time("runs_dense_dist", reps)(denseArm)
    time("runs_filtered_dist", reps)(distArm)
    if (!skipSerial) time("runs_filtered_serial", math.min(reps, 2))(serialArm)
    spark.stop()
  }
}
