package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Join queries (SURVEY §2.3): equi-join modes, broadcast dim chains, cross,
  * as-of (backward, with and without tolerance), takeFrom index join.
  */
object JoinQueries {

  /** Inner equi-join chain through broadcast-able dims:
    * orders ⋈ customer ⋈ nation ⋈ region. */
  val q_join_inner = Q(
    "q_join_inner",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      val c = GTable(Tables.load(s, dir, "customer"))
      val n = GTable(Tables.load(s, dir, "nation"))
      val r = GTable(Tables.load(s, dir, "region"))
      o.join(c, Seq("o_custkey"), Seq("c_custkey"))
        .join(n, Seq("c_nationkey"), Seq("n_nationkey"))
        .join(r, Seq("n_regionkey"), Seq("r_regionkey"))
        .select("o_orderkey", "c_name", "n_name", "r_name", "o_totalprice")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey, c_name, n_name, r_name, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            ORDER BY o_orderkey"""))

  /** Left join with unmatched rows → nulls. */
  val q_join_left = Q(
    "q_join_left",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      val rich = GTable(Tables.load(s, dir, "customer")).filter(col("c_acctbal") > 5000)
      o.join(rich, Seq("o_custkey"), Seq("c_custkey"), how = "left")
        .select("o_orderkey", "o_custkey", "c_name", "c_acctbal")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey, o_custkey, c_name, c_acctbal
            FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
            ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  /** Right join: all customers kept, unmatched order side → nulls. */
  val q_join_right = Q(
    "q_join_right",
    (s, dir) => {
      val big = GTable(Tables.load(s, dir, "orders")).filter(col("o_totalprice") > 400000)
      val c = GTable(Tables.load(s, dir, "customer"))
      big.join(c, Seq("o_custkey"), Seq("c_custkey"), how = "right")
        .select("o_custkey", "c_name", "o_orderkey", "o_totalprice")
        .order(GTable.orderKeys(Seq("o_custkey", "o_orderkey")))
        .result
    },
    Some("""SELECT c_custkey AS o_custkey, c_name, o_orderkey, o_totalprice
            FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
            RIGHT JOIN customer ON o_custkey = c_custkey
            ORDER BY o_custkey, o_orderkey NULLS FIRST"""))

  /** Semi join: orders whose customer is in the BUILDING segment. */
  val q_join_semi = Q(
    "q_join_semi",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      val b = GTable(Tables.load(s, dir, "customer")).filter(col("c_mktsegment") === "BUILDING")
      o.join(b, Seq("o_custkey"), Seq("c_custkey"), how = "left_semi")
        .select("o_orderkey", "o_custkey")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey"""))

  /** Anti join: orders whose customer is NOT in the BUILDING segment. */
  val q_join_anti = Q(
    "q_join_anti",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      val b = GTable(Tables.load(s, dir, "customer")).filter(col("c_mktsegment") === "BUILDING")
      o.join(b, Seq("o_custkey"), Seq("c_custkey"), how = "left_anti")
        .select("o_orderkey", "o_custkey")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey"""))

  /** Cartesian product (reference crossJoin). */
  val q_cross_join = Q(
    "q_cross_join",
    (s, dir) => {
      val r = GTable(Tables.load(s, dir, "region"))
      val n = GTable(Tables.load(s, dir, "nation"))
      r.crossJoin(n)
        .select("r_name", "n_name")
        .order(GTable.orderKeys(Seq("r_name", "n_name")))
        .result
    },
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
            ORDER BY r_name, n_name"""))

  /** takeFrom index join (reference models.py:215-221): distinct l_suppkey
    * values as natural-order row positions into supplier. */
  val q_takefrom = Q(
    "q_takefrom",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem")).filter(col("l_quantity") >= 49)
      val sup = GTable(Tables.loadOrdered(s, dir, "supplier"))
      li.takeFrom("l_suppkey", sup)
        .select("s_suppkey", "s_name", "s_acctbal")
        .result
    },
    Some("""WITH pos AS (SELECT *, row_number() OVER () - 1 rid FROM supplier)
            SELECT s_suppkey, s_name, s_acctbal FROM pos
            WHERE rid IN (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity >= 49)
            ORDER BY rid"""))

  /** Backward as-of join: for each click, the latest error event of the same
    * user at-or-before it. Oracle uses DuckDB's native ASOF JOIN. */
  val q_asof = Q(
    "q_asof",
    (s, dir) => {
      val ev = GTable(Tables.load(s, dir, "events"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      clicks.asofJoin(errors, on = "ts", keys = Seq("user_id"))
        .project("gap_us" -> (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("ts_right").cast("timestamp"))))
        .select("event_id", "user_id", "ts", "event_id_right", "gap_us")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT l.event_id, l.user_id, l.ts,
              r.event_id AS event_id_right,
              date_diff('microsecond', r.ts, l.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.event_id"""))

  /** As-of with tolerance: match only errors within 10 minutes look-back
    * (reference tolerance:, interface.py:354-383). */
  val q_asof_tolerance = Q(
    "q_asof_tolerance",
    (s, dir) => {
      val ev = GTable(Tables.load(s, dir, "events"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val tol = (lt: org.apache.spark.sql.Column, rt: org.apache.spark.sql.Column) =>
        unix_micros(lt.cast("timestamp")) - unix_micros(rt.cast("timestamp")) <= 600000000L
      clicks.asofJoin(errors, on = "ts", keys = Seq("user_id"), tolerance = Some(tol))
        .select("event_id", "user_id", "ts", "event_id_right", "ts_right")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT l.event_id, l.user_id, l.ts,
              CASE WHEN date_diff('microsecond', r.ts, l.ts) <= 600000000
                   THEN r.event_id END AS event_id_right,
              CASE WHEN date_diff('microsecond', r.ts, l.ts) <= 600000000
                   THEN r.ts END AS ts_right
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.event_id"""))

  def all: Seq[Q] = Seq(q_join_inner, q_join_left, q_join_right, q_join_semi,
    q_join_anti, q_cross_join, q_takefrom, q_asof, q_asof_tolerance)
}
