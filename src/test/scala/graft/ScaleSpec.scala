package graft

import org.apache.spark.sql.functions._
import graft.core.{Scale, Tables}

class ScaleSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    val li = Tables.load(spark, sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    val salted = Scale.saltedAgg(li, Seq("l_returnflag"), buckets = 8,
      partial = Seq("qty" -> sum(col("l_quantity")), "n" -> count(lit(1))),
      merge = Seq("qty" -> sum(col("qty")), "n" -> sum(col("n"))))
      .orderBy("l_returnflag").collect()
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) == s.getString(0))
      assert(d.getDouble(1) == s.getDouble(1)) // integral doubles: exact
      assert(d.getLong(2) == s.getLong(2))
    }
  }

  test("bucketed tables join without exchange") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    Scale.writeBucketed(li, "li_bkt", Seq("l_orderkey"), buckets = 8)
    Scale.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bkt", Seq("l_orderkey"), buckets = 8)
    // disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt").join(spark.table("o_bkt"), "l_orderkey")
      joined.collect() // execute to finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
