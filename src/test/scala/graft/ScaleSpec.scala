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

  test("AQE splits a skewed join partition at runtime") {
    val spark2 = spark
    import spark2.implicits._
    // one key owns ~all left rows; thresholds lowered so the sf-scale
    // fixture crosses AQE's skew bars. The assertion is the mechanism the
    // engine relies on at 100 TB for skewed JOINS (salting covers skewed
    // aggregations; OptimizeSkewedJoin covers joins at runtime).
    // repartition(8) first: AQE splits a skewed REDUCE partition at
    // map-block granularity, so the hot key must arrive from several map
    // tasks (one input file = one mapper = unsplittable otherwise).
    // sf0.01 (60k rows): the sf0.001 fixture's hot partition compresses
    // under even a 4KB skew threshold
    val skewSf = "/root/testdata/sf0.01"
    val hot = Tables.load(spark, skewSf, "lineitem")
      .select((col("l_orderkey") * 0 + 1).as("k"), col("l_quantity"))
      .repartition(8)
    val dim = (1 to 50).map(i => (i.toLong, s"d$i")).toDF("k", "v")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      // at fixture scale the non-forced rule declines (cost heuristic);
      // force makes the split deterministic for the assertion — production
      // relies on the default heuristic at real sizes
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = hot.join(dim, "k")
      val n = joined.collect().length // execute THIS plan to finalize AQE
      assert(n == Tables.load(spark, skewSf, "lineitem").count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"expected AQE skew handling in final plan:\n${plan.take(2500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
  test("rankingsFlip dispatch: large known-stats plans flip, small ones keep the window, P<=K never flips") {
    val big = graft.core.GTable(spark.range(20000000L).toDF("id")
      .withColumn("k", col("id") % 5))
    val small = graft.core.GTable(spark.range(1000L).toDF("id"))
    // the test session runs local[4]: P = 4 <= assumedKeys 4 -> the window
    // already uses every core, dispatch must NEVER flip
    assert(!big.rankingsFlip._3, "P <= K must never flip")
    // at a 32-core profile the 20M-row plan is far past the derived ~10M
    spark.conf.set("spark.graft.rankings.parallelism", "32")
    try {
      val (est, flip, flips) = big.rankingsFlip
      assert(flips && est >= flip, s"20M rows at P=32 must flip (est=$est flip=$flip)")
      assert(!small.rankingsFlip._3, "1k rows must keep the plain window")
      // explicit override wins over the derived threshold
      spark.conf.set("spark.graft.rankings.flipRows", "100")
      try assert(small.rankingsFlip._3, "explicit flipRows=100 must flip 1k rows")
      finally spark.conf.unset("spark.graft.rankings.flipRows")
    } finally spark.conf.unset("spark.graft.rankings.parallelism")
  }

  test("rankingsByCounts equals the window form (nulls, desc, multi-key); over-budget falls back") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    // adversarial frame: null order values, ties, a null partition key
    val df = spark.range(0L, 4000L).toDF("id")
      .withColumn("k", when(col("id") % 11 === 0, lit(null))
        .otherwise((col("id") % 3).cast("string")))
      .withColumn("a", when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") % 5))
      .withColumn("b", (col("id") % 4).cast("int"))
    val t = graft.core.GTable(df)
    def rowset(g: graft.core.GTable) =
      g.select("id", "rk0", "dr0", "pr").result.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    val viaCounts = t.rankingsByCounts(Seq("k"),
      Seq(col("a"), col("b")), desc = Seq(true, false),
      rank = Some("rk0"), denseRank = Some("dr0"), percentRank = Some("pr")).get
    // reference: the plain window path (rankingsAuto below the flip)
    val viaWindow = t.rankingsAuto(Seq("k"), Seq(col("a"), col("b")),
      desc = Seq(true, false),
      rank = Some("rk0"), denseRank = Some("dr0"), percentRank = Some("pr"))
    assert(rowset(viaCounts) == rowset(viaWindow))
    // tuple cardinality above the budget → None (caller falls back)
    assert(t.rankingsByCounts(Seq("k"), Seq(col("id")),
      rank = Some("rk0"), maxNdv = 100).isEmpty)
    // the payload is never shuffled: the counts plan's only exchanges hash
    // the TINY frame; the big side reaches the join through a broadcast
    val plan = viaCounts.result.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"counts rankings must join via broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "payload must not sort-merge")
    // auto dispatch: above the flip with rank-only functions, the counts
    // strategy is chosen (observable: no range repartition of the payload)
    spark.conf.set("spark.graft.rankings.flipRows", "100")
    try {
      val auto = t.rankingsAuto(Seq("k"), Seq(col("a"), col("b")),
        desc = Seq(true, false),
        rank = Some("rk0"), denseRank = Some("dr0"), percentRank = Some("pr"))
      assert(rowset(auto) == rowset(viaWindow))
      val autoPlan = auto.result.queryExecution.executedPlan.toString
      assert(autoPlan.contains("BroadcastHashJoin"),
        "auto dispatch above the flip must take the counts strategy")
    } finally spark.conf.unset("spark.graft.rankings.flipRows")
  }

}
