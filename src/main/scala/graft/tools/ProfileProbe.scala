package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the exact-profile cost: times the per-column histogram
  * aggregation with and without the exact percentile, so the optimization
  * round's doc can attribute the wall time to the percentile's
  * single-reducer value-map merge rather than the histogram itself.
  *
  * Usage: runMain graft.tools.ProfileProbe [sfDir]
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")

    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pprobe] $label best=${runs.min}%.3f raw=" +
        runs.map(r => f"$r%.3f").mkString("[", ",", "]"))
    }

    val hist = li.groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
    time("hist-only (groupBy value, no stats)") {
      hist.write.format("noop").mode("overwrite").save()
    }
    time("hist + fold stats (no percentile)") {
      hist.agg(sum(when(col("l_orderkey").isNotNull, col("cnt"))),
          count(col("l_orderkey")), min(col("l_orderkey")),
          max(col("l_orderkey")),
          sum(col("l_orderkey").cast("double") * col("cnt")))
        .write.format("noop").mode("overwrite").save()
    }
    time("hist + percentile(freq)") {
      hist.agg(percentile(col("l_orderkey"), array(lit(0.5), lit(0.95)),
          col("cnt")))
        .write.format("noop").mode("overwrite").save()
    }
    time("full summary exact (current)") {
      graft.operators.Profile.summary(li,
          Seq("l_orderkey", "l_quantity", "l_returnflag"), exactNdv = true)
        .write.format("noop").mode("overwrite").save()
    }
    // parity at THIS corpus scale: distributed selection ≡ single-map
    // percentile on the full summary rows (the spec pins tiny shapes;
    // this pins the probed corpus)
    spark.conf.set("spark.graft.profile.selectionMinBytes", "0")
    val sel = graft.operators.Profile.summary(li,
        Seq("l_orderkey", "l_quantity", "l_returnflag"), exactNdv = true)
      .orderBy("name").collect().toSeq
    spark.conf.set("spark.graft.profile.selectionMinBytes",
      Long.MaxValue.toString)
    val map0 = graft.operators.Profile.summary(li,
        Seq("l_orderkey", "l_quantity", "l_returnflag"), exactNdv = true)
      .orderBy("name").collect().toSeq
    println(s"[pprobe] selection==map: ${sel == map0} " +
      s"(${sel.size} rows)")
    require(sel == map0, s"PARITY FAILURE:\n$sel\nvs\n$map0")
    spark.stop()
  }
}
