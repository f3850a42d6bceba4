package graft

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.functions.GAggs

class AggSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val li = GTable(Tables.load(spark, sf, "lineitem"))
    val exact = li.group(Nil, Seq(GAggs.nunique(col("l_partkey")).as("n")))
      .result.collect()(0).getLong(0)
    val approx = li.group(Nil, Seq(GAggs.nunique(col("l_partkey"), approx = true).as("n")))
      .result.collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("firstBy/lastBy deterministic under ties") {
    val o = GTable(Tables.load(spark, sf, "orders"))
    val r1 = o.group(Seq("o_orderstatus"),
      Seq(GAggs.firstBy(col("o_orderkey"), col("o_orderdate"), col("o_orderkey")).as("k")))
      .order(GTable.orderKeys(Seq("o_orderstatus"))).result.collect()
    val r2 = o.group(Seq("o_orderstatus"),
      Seq(GAggs.firstBy(col("o_orderkey"), col("o_orderdate"), col("o_orderkey")).as("k")))
      .order(GTable.orderKeys(Seq("o_orderstatus"))).result.collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("distinctOn keep=last picks the latest natural-order row") {
    val li = GTable(Tables.loadOrdered(spark, sf, "lineitem"))
    val first = li.distinctOn(Seq("l_partkey"), "first").result
    val last = li.distinctOn(Seq("l_partkey"), "last").result
    assert(first.count() == last.count())
    // keys equal, rows may differ
    assert(first.select("l_partkey").distinct().count() == first.count())
  }
}
