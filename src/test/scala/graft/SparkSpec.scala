package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs: one JVM-wide SparkSession (getOrCreate),
  * UTC, small shuffle partitioning for test scale.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // GRAFT_MASTER=local-cluster[N,c,m] runs the specs against real
    // separate executor JVMs (needs `sbt package Test/packageBin` first —
    // graft.Master ships both jars via spark.jars)
    val s = Master.configure(SparkSession.builder(), "local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
