package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing probe for optimization A/B runs: times the named
  * registry queries through the same noop-sink protocol as graft.Bench
  * (same session confs, same best-of-N floor) without paying for the
  * whole headline set. NOT the driver contract — Bench stays the
  * measured surface; this is the iteration loop.
  *
  * Usage: runMain graft.tools.QBench <reps> <query> [query ...]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QBench <reps> <query> [query ...]")
    val reps = args(0).toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Master.configure(SparkSession.builder(), s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qmap = graft.SparkEntry.queries
    // same warmup as Bench: JVM/codegen on the first query
    qmap(names.head)(spark, sfDir).write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        qmap(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name best=${runs.min}%.3f raw=" +
        runs.map(r => f"$r%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
