package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Aggregation queries (SURVEY §2.4). */
object AggQueries {

  /** TPC-H Q1-shaped pricing summary: filter + groupBy + the core aggregate
    * set. FP-sum results are rounded identically on both sides — double
    * addition is not associative, so unrounded sums of 2-decimal prices can
    * differ in the last ulp between engines.
    */
  val q1_agg = Q(
    "q1_agg",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .group(
          by = Seq("l_returnflag", "l_linestatus"),
          aggs = Seq(
            sum("l_quantity").as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg("l_quantity"), 6).as("avg_qty"),
            round(avg("l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order")))
        .order(GTable.orderKeys(Seq("l_returnflag", "l_linestatus")))
        .result
    },
    Some("""SELECT l_returnflag, l_linestatus,
            sum(l_quantity) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
            round(avg(l_quantity), 6) AS avg_qty,
            round(avg(l_discount), 6) AS avg_disc,
            count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  def all: Seq[Q] = Seq(q1_agg)
}
