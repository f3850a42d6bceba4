package graft

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** The operator surface is source-agnostic: any Spark-supported format
  * yields the same DataFrame algebra. Round-trips the parquet test tables
  * through csv/json/orc and asserts value equality plus identical engine
  * results over each source. */
class SourceFormatsSpec extends SparkSpec {

  test("csv/json/orc round-trip the parquet source and serve engine ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val nation = Tables.load(spark, sf, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    nation.write.mode("overwrite").json(s"$base/json")
    nation.write.mode("overwrite").orc(s"$base/orc")
    val sources = Seq(
      "csv" -> Tables.loadFormat(spark, s"$base/csv", "csv",
        Some(nation.schema), Map("header" -> "true")),
      "json" -> Tables.loadFormat(spark, s"$base/json", "json",
        Some(nation.schema)),
      "orc" -> Tables.loadFormat(spark, s"$base/orc", "orc"))
    val expected = GTable(nation)
      .group(Seq("n_regionkey"), Seq(count(lit(1)).as("n")))
      .order(GTable.orderKeys(Seq("n_regionkey")))
      .result.collect().map(_.toString).toSeq
    for ((fmt, df) <- sources) {
      assert(df.count() == nation.count(), fmt)
      assert(df.exceptAll(nation).count() == 0 &&
        nation.exceptAll(df).count() == 0, s"$fmt values differ")
      val got = GTable(df)
        .group(Seq("n_regionkey"), Seq(count(lit(1)).as("n")))
        .order(GTable.orderKeys(Seq("n_regionkey")))
        .result.collect().map(_.toString).toSeq
      assert(got == expected, s"$fmt engine result differs")
    }
  }
}
