package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Reshaping queries (SURVEY §2.9): unnest (explode) with offset /
  * keep-empty variants, and runs (gaps-and-islands over natural order).
  */
object ReshapeQueries {

  /** posexplode with element offset (reference unnest offset:). */
  val q_unnest = Q(
    "q_unnest",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.filter(col("doc_id") < 100)
        .project("toks" -> split(col("text"), " "))
        .select("doc_id", "toks")
        .unnest("toks", offsetAlias = Some("pos"))
        .order(GTable.orderKeys(Seq("doc_id", "pos")))
        .result
    },
    Some("""SELECT doc_id,
              generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
              unnest(string_split(text, ' ')) AS toks
            FROM documents WHERE doc_id < 100
            ORDER BY doc_id, pos"""))

  /** explode_outer: empty arrays keep a null row (reference keep_empty). */
  val q_unnest_outer = Q(
    "q_unnest_outer",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.filter(col("doc_id") < 100)
        .project("longtoks" -> filter(split(col("text"), " "), t => length(t) > 6))
        .select("doc_id", "longtoks")
        .unnest("longtoks", keepEmpty = true)
        .order(GTable.orderKeys(Seq("doc_id", "longtoks")))
        .result
    },
    Some("""WITH t AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> length(x) > 6) AS l
              FROM documents WHERE doc_id < 100)
            SELECT doc_id,
              unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS longtoks
            FROM t
            ORDER BY doc_id, longtoks NULLS FIRST"""))

  /** runs: adjacent-equal grouping over natural order (reference:
    * interface.py:464-489) — lag → change flag → cumsum run id → aggregate. */
  val q_runs = Q(
    "q_runs",
    (s, dir) => {
      val e = GTable(Tables.loadOrdered(s, dir, "events"))
      e.runs(
          by = Seq("event_type"),
          aggs = Seq(
            min(col("event_id")).as("first_id"),
            round(sum(col("value")), 6).as("run_value")),
          counts = Some("n"))
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM events),
            f AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM
                lag(event_type) OVER (ORDER BY rid) THEN 1 ELSE 0 END chg
              FROM t),
            r AS (SELECT *, sum(chg) OVER (ORDER BY rid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_id
              FROM f)
            SELECT any_value(event_type) AS event_type,
              min(event_id) AS first_id,
              round(sum(value), 6) AS run_value,
              count(*) AS n
            FROM r GROUP BY run_id ORDER BY min(rid)"""))

  /** runs with a custom split predicate: break when the inter-event gap
    * exceeds 30 minutes even if the group key is unchanged — the
    * sessionization primitive. */
  val q_runs_split = Q(
    "q_runs_split",
    (s, dir) => {
      val e = GTable(Tables.loadOrdered(s, dir, "events"))
      val gapSplit = (w: org.apache.spark.sql.expressions.WindowSpec) =>
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000000L
      e.runs(
          by = Seq("user_id"),
          split = Seq(gapSplit),
          aggs = Seq(min(col("event_id")).as("first_id"),
            max(col("event_id")).as("last_id")),
          counts = Some("n"))
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM events),
            f AS (SELECT *, CASE WHEN (user_id IS DISTINCT FROM lag(user_id) OVER w)
                OR coalesce(date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000, false)
                THEN 1 ELSE 0 END chg
              FROM t WINDOW w AS (ORDER BY rid)),
            r AS (SELECT *, sum(chg) OVER (ORDER BY rid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_id
              FROM f)
            SELECT any_value(user_id) AS user_id,
              min(event_id) AS first_id, max(event_id) AS last_id, count(*) AS n
            FROM r GROUP BY run_id ORDER BY min(rid)"""))

  /** Distributed runs (dense-rid shift join + block prefix sum — no global
    * window); same oracle as q_runs proves result equality. */
  val q_runs_dist = Q(
    "q_runs_dist",
    (s, dir) => {
      val e = GTable(Tables.loadOrdered(s, dir, "events"))
      e.runsDistributed(
          by = Seq("event_type"),
          aggs = Seq(
            min(col("event_id")).as("first_id"),
            round(sum(col("value")), 6).as("run_value")),
          counts = Some("n"),
          blockSize = 512)
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM events),
            f AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM
                lag(event_type) OVER (ORDER BY rid) THEN 1 ELSE 0 END chg
              FROM t),
            r AS (SELECT *, sum(chg) OVER (ORDER BY rid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_id
              FROM f)
            SELECT any_value(event_type) AS event_type,
              min(event_id) AS first_id,
              round(sum(value), 6) AS run_value,
              count(*) AS n
            FROM r GROUP BY run_id ORDER BY min(rid)"""))

  /** filter → runs, the round-9 verdict's last scale-killer: a filtered
    * table has SPARSE rids, which used to fall back to a single-task
    * Window.orderBy(rid). Now densify() (block prefix-sum re-rank of the
    * sparse rid into dense positions of the filtered table) restores the
    * dense-position contract so runsDistributed dispatches — every stage a
    * parallel shuffle. Small blockSize forces multi-block prefixes in both
    * the densify and the run-id passes. */
  val q_runs_filtered = Q(
    "q_runs_filtered",
    (s, dir) => {
      val e = GTable(Tables.loadOrdered(s, dir, "events"))
      e.filter(col("value") > 0.2)
        .densify(blockSize = 512)
        .runsDistributed(
          by = Seq("event_type"),
          aggs = Seq(
            min(col("event_id")).as("first_id"),
            round(sum(col("value")), 6).as("run_value")),
          counts = Some("n"),
          blockSize = 512)
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM events),
            s AS (SELECT * FROM t WHERE value > 0.2),
            f AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM
                lag(event_type) OVER (ORDER BY rid) THEN 1 ELSE 0 END chg
              FROM s),
            r AS (SELECT *, sum(chg) OVER (ORDER BY rid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_id
              FROM f)
            SELECT any_value(event_type) AS event_type,
              min(event_id) AS first_id,
              round(sum(value), 6) AS run_value,
              count(*) AS n
            FROM r GROUP BY run_id ORDER BY min(rid)"""))

  def all: Seq[Q] = Seq(q_unnest, q_unnest_outer, q_runs, q_runs_split, q_runs_dist,
    q_runs_filtered)
}
