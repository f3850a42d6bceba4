package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Projection / filter / predicate queries (SURVEY §2.2). */
object FilterQueries {

  /** Simple per-column predicates AND-ed (reference filter semantics:
    * eq/ne/lt/le/gt/ge + isin), with a projection. Predicates and the
    * 2-column read schema are pushed to the parquet scan by Catalyst.
    */
  val q_filter = Q(
    "q_filter",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.filter(
          col("l_returnflag") === "A",
          col("l_quantity") >= 30,
          col("l_linestatus").isin("F", "O"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem
            WHERE l_returnflag = 'A' AND l_quantity >= 30
              AND l_linestatus IN ('F', 'O')
            ORDER BY l_orderkey, l_linenumber"""))

  /** Computed projection (reference `project`): derived arithmetic columns. */
  val q_project = Q(
    "q_project",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      // NOTE: no rounding — a single FP multiply is bit-identical across
      // engines, while round() half-up (Spark) vs half-even (DuckDB) is not.
      li.project(
          "revenue" -> col("l_extendedprice") * (lit(1) - col("l_discount")),
          "charged" -> col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
        .select("l_orderkey", "l_linenumber", "revenue", "charged")
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber,
            l_extendedprice * (1 - l_discount) AS revenue,
            l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber"""))

  def all: Seq[Q] = Seq(q_filter, q_project)
}
