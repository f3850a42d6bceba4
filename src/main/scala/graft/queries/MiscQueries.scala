package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.functions.GFunctions

/** Type-system corners and service plumbing (SURVEY §1.2, §2.11-2.12):
  * decimal casts + exact decimal aggregation, interval arithmetic, base64
  * binary codec, the sql() escape hatch, and the any(limit) existence probe.
  */
object MiscQueries {

  /** Decimal fidelity: cast → exact decimal sums (no FP rounding games). */
  val q_decimal = Q(
    "q_decimal",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.project("price_dec" -> col("l_extendedprice").cast("decimal(12,2)"))
        .group(Seq("l_returnflag"),
          Seq(sum(col("price_dec")).cast("decimal(18,2)").as("total"),
            max(col("price_dec")).as("max_price")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""SELECT l_returnflag,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total,
              max(CAST(l_extendedprice AS DECIMAL(12,2))) AS max_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Interval arithmetic (reference Duration scalars, scalars.py:25-56):
    * date + interval, timestamp difference in units, months_between. */
  val q_interval_arith = Q(
    "q_interval_arith",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.project(
          "due" -> (col("o_orderdate") + expr("INTERVAL 30 DAY")),
          "age_days" -> GFunctions.delta(lit("2002-01-01").cast("timestamp"),
            col("o_orderdate"), "day"),
          "age_months" -> GFunctions.delta(lit("2002-01-01").cast("timestamp"),
            col("o_orderdate"), "month"))
        .select("o_orderkey", "due", "age_days", "age_months")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey,
              o_orderdate + INTERVAL 30 DAY AS due,
              CAST((epoch(TIMESTAMP '2002-01-01') - epoch(o_orderdate)) // 86400 AS BIGINT) AS age_days,
              CAST(datediff('month', o_orderdate, TIMESTAMP '2002-01-01')
                - CASE WHEN day(o_orderdate) > 1 THEN 1 ELSE 0 END
                AS BIGINT) AS age_months
            FROM orders ORDER BY o_orderkey"""))

  /** Base64 codec (reference Base64 scalar, scalars.py:80-81). */
  val q_base64 = Q(
    "q_base64",
    (s, dir) => {
      val p = GTable(Tables.load(s, dir, "part"))
      p.project("b64" -> base64(encode(col("p_name"), "UTF-8")))
        .project("roundtrip" -> decode(unbase64(col("b64")), "UTF-8"))
        .select("p_partkey", "b64", "roundtrip")
        .order(GTable.orderKeys(Seq("p_partkey")))
        .result
    },
    Some("""SELECT p_partkey, to_base64(encode(p_name)) AS b64,
              p_name AS roundtrip
            FROM part ORDER BY p_partkey"""))

  /** sql() escape hatch (reference interface.py:523-535, deny-by-default
    * there; here the engine capability): run SQL against the current frame
    * registered as a temp view. */
  val q_sql_escape = Q(
    "q_sql_escape",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.createOrReplaceTempView("li_view")
      s.sql("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty
               FROM li_view WHERE l_linestatus = 'F'
               GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty
            FROM lineitem WHERE l_linestatus = 'F'
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** any(limit) existence probe (reference interface.py:151-157): scans at
    * most `limit` rows — single boolean row out. */
  val q_any_probe = Q(
    "q_any_probe",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      val hasBulk = li.filter(col("l_quantity") >= 50).any(1)
      val hasImpossible = li.filter(col("l_quantity") > 1000).any(1)
      s.range(1).select(lit(hasBulk).as("has_bulk"),
        lit(hasImpossible).as("has_impossible"))
    },
    Some("""SELECT EXISTS(SELECT 1 FROM lineitem WHERE l_quantity >= 50) AS has_bulk,
                   EXISTS(SELECT 1 FROM lineitem WHERE l_quantity > 1000) AS has_impossible"""))

  def all: Seq[Q] = Seq(q_decimal, q_interval_arith, q_base64, q_sql_escape,
    q_any_probe)
}
