package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Set-operation queries (SURVEY §2.7). Reference defaults: union = multiset
  * (UNION ALL); intersect/difference = set.
  */
object SetQueries {

  private def flagged(s: org.apache.spark.sql.SparkSession, dir: String, flag: String) =
    GTable(Tables.load(s, dir, "lineitem"))
      .filter(col("l_returnflag") === flag)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")

  /** Multiset union (reference default distinct: false). */
  val q_union_all = Q(
    "q_union_all",
    (s, dir) => {
      flagged(s, dir, "A").union(Seq(flagged(s, dir, "R")))
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag FROM lineitem WHERE l_returnflag = 'A'
            UNION ALL
            SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag FROM lineitem WHERE l_returnflag = 'R'
            ORDER BY l_orderkey, l_linenumber, l_partkey, l_returnflag"""))

  /** Distinct union. */
  val q_union_distinct = Q(
    "q_union_distinct",
    (s, dir) => {
      val a = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "F").select("l_partkey")
      val b = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "O").select("l_partkey")
      a.union(Seq(b), distinct = true)
        .order(GTable.orderKeys(Seq("l_partkey")))
        .result
    },
    Some("""SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
            UNION
            SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O'
            ORDER BY l_partkey"""))

  /** Set intersection (reference default distinct: true). */
  val q_intersect = Q(
    "q_intersect",
    (s, dir) => {
      val f = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "F").select("l_partkey", "l_suppkey")
      val o = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "O").select("l_partkey", "l_suppkey")
      f.intersect(Seq(o))
        .order(GTable.orderKeys(Seq("l_partkey", "l_suppkey")))
        .result
    },
    Some("""SELECT l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'F'
            INTERSECT
            SELECT l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'O'
            ORDER BY l_partkey, l_suppkey"""))

  /** Set difference (reference default distinct: true). */
  val q_except = Q(
    "q_except",
    (s, dir) => {
      val f = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "F").select("l_partkey", "l_suppkey")
      val o = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "O").select("l_partkey", "l_suppkey")
      f.difference(Seq(o))
        .order(GTable.orderKeys(Seq("l_partkey", "l_suppkey")))
        .result
    },
    Some("""SELECT l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'F'
            EXCEPT
            SELECT l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'O'
            ORDER BY l_partkey, l_suppkey"""))

  /** Multiset intersect/except variants (intersectAll / exceptAll). */
  val q_intersect_all = Q(
    "q_intersect_all",
    (s, dir) => {
      val f = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "F").select("l_partkey")
      val o = GTable(Tables.load(s, dir, "lineitem"))
        .filter(col("l_linestatus") === "O").select("l_partkey")
      f.intersect(Seq(o), distinct = false)
        .order(GTable.orderKeys(Seq("l_partkey")))
        .result
    },
    Some("""SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
            INTERSECT ALL
            SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O'
            ORDER BY l_partkey"""))

  def all: Seq[Q] = Seq(q_union_all, q_union_distinct, q_intersect, q_except,
    q_intersect_all)
}
