package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, StringType}
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
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem
            WHERE l_returnflag = 'A' AND l_quantity >= 30
              AND l_linestatus IN ('F', 'O')
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag"""))

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
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "revenue", "charged")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber,
            l_extendedprice * (1 - l_discount) AS revenue,
            l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, revenue, charged"""))

  /** Complex `where` expression tree: and/or/not composition over
    * comparisons (reference Expression tree, inputs.py:249-315). */
  val q_where = Q(
    "q_where",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.filter(
          (col("l_discount") > 0.05 && col("l_quantity") < 10) ||
          !(col("l_returnflag") === "N"))
        .select("l_orderkey", "l_linenumber", "l_discount", "l_quantity", "l_returnflag")
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "l_discount", "l_quantity", "l_returnflag")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber, l_discount, l_quantity, l_returnflag
            FROM lineitem
            WHERE (l_discount > 0.05 AND l_quantity < 10) OR NOT (l_returnflag = 'N')
            ORDER BY l_orderkey, l_linenumber, l_discount, l_quantity, l_returnflag"""))

  /** cast (reference: interface.py:129-136): double→int (integral values),
    * timestamp→date, long→string. */
  val q_cast = Q(
    "q_cast",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.cast(Seq(
          "l_quantity" -> IntegerType,
          "l_shipdate" -> DateType,
          "l_orderkey" -> StringType))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")))
        .result
    },
    Some("""SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey, l_linenumber,
            CAST(l_quantity AS INTEGER) AS l_quantity,
            CAST(l_shipdate AS DATE) AS l_shipdate
            FROM lineitem
            ORDER BY CAST(l_orderkey AS VARCHAR), l_linenumber,
              CAST(l_quantity AS INTEGER), CAST(l_shipdate AS DATE)"""))

  /** try_cast (reference cast try:): failures → null, not error. */
  val q_try_cast = Q(
    "q_try_cast",
    (s, dir) => {
      val p = GTable(Tables.load(s, dir, "part"))
      p.project("name_as_int" -> expr("try_cast(p_name AS INT)"),
                "size_roundtrip" -> expr("try_cast(cast(p_size AS STRING) AS INT)"))
        .select("p_partkey", "name_as_int", "size_roundtrip")
        .order(GTable.orderKeys(Seq("p_partkey")))
        .result
    },
    Some("""SELECT p_partkey, TRY_CAST(p_name AS INTEGER) AS name_as_int,
            TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip
            FROM part ORDER BY p_partkey"""))

  /** fillNull (reference: interface.py:442-453): nulls manufactured via
    * nullif, then filled. */
  val q_fill_null = Q(
    "q_fill_null",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.project("status_n" -> nullif(col("o_orderstatus"), lit("O")))
        .fillNull(Map("status_n" -> "none"))
        .select("o_orderkey", "status_n")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'O'), 'none') AS status_n
            FROM orders ORDER BY o_orderkey"""))

  /** dropNull (reference: interface.py:437-440). */
  val q_drop_null = Q(
    "q_drop_null",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.project("status_n" -> nullif(col("o_orderstatus"), lit("O")))
        .dropNull(Seq("status_n"))
        .select("o_orderkey", "status_n")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_n
            FROM orders WHERE nullif(o_orderstatus, 'O') IS NOT NULL
            ORDER BY o_orderkey"""))

  /** Struct build + unpack round-trip (reference: interface.py:324-327)
    * plus nested path access (col("s.x")). */
  val q_unpack = Q(
    "q_unpack",
    (s, dir) => {
      val c = GTable(Tables.load(s, dir, "customer"))
      c.project("s" -> struct(col("c_acctbal").as("bal"), col("c_mktsegment").as("seg")))
        .select("c_custkey", "s")
        .unpack("s")
        .order(GTable.orderKeys(Seq("c_custkey")))
        .result
    },
    Some("""SELECT c_custkey, c_acctbal AS bal, c_mktsegment AS seg
            FROM customer ORDER BY c_custkey"""))

  def all: Seq[Q] = Seq(q_filter, q_project, q_where, q_cast, q_try_cast,
    q_fill_null, q_drop_null, q_unpack)
}
