package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Sort / limit / top-k / slice queries (SURVEY §2.6). */
object SortQueries {

  /** Global top-k: orderBy+limit plans TakeOrderedAndProject (per-partition
    * heaps + single merge — no full sort at scale). */
  val q_order_limit = Q(
    "q_order_limit",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.order(GTable.orderKeys(Seq("-o_totalprice", "o_orderkey")), Some(25))
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .result
    },
    Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""))

  /** Per-group top-k via order(over:) — row_number window + filter. */
  val q_topk_per_group = Q(
    "q_topk_per_group",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.order(GTable.orderKeys(Seq("-o_totalprice", "o_orderkey")),
          limit = Some(3), over = Seq("o_orderstatus"))
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
        .order(GTable.orderKeys(Seq("o_orderstatus", "-o_totalprice", "o_orderkey")))
        .result
    },
    Some("""WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) rn
              FROM orders)
            SELECT o_orderstatus, o_orderkey, o_totalprice FROM r WHERE rn <= 3
            ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey"""))

  /** Global sparse-rank top-k keeping ties (reference `first(by, rank)`):
    * semi-join mask of distinct(first k rows) — no global window. */
  val q_first_rank = Q(
    "q_first_rank",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.firstRank(Seq("l_quantity"), rank = 5, dense = false)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "l_quantity")))
        .result
    },
    Some("""WITH r AS (SELECT *, rank() OVER (ORDER BY l_quantity) rk FROM lineitem)
            SELECT l_orderkey, l_linenumber, l_quantity FROM r WHERE rk <= 5
            ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** Dense-rank top-k: first k distinct key values (reference dense: true). */
  val q_first_rank_dense = Q(
    "q_first_rank_dense",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.firstRank(Seq("-l_quantity"), rank = 3, dense = true)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "l_quantity")))
        .result
    },
    Some("""WITH r AS (SELECT *, dense_rank() OVER (ORDER BY l_quantity DESC) rk
              FROM lineitem)
            SELECT l_orderkey, l_linenumber, l_quantity FROM r WHERE rk <= 3
            ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** Contiguous natural-order slice (reference slice); oracle emulates the
    * row id with row_number() over file order. */
  val q_slice = Q(
    "q_slice",
    (s, dir) => {
      val li = GTable(Tables.loadOrdered(s, dir, "lineitem"))
      li.slice(1000, Some(100))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM lineitem)
            SELECT l_orderkey, l_linenumber, l_quantity FROM t
            WHERE rid > 1000 AND rid <= 1100 ORDER BY rid"""))

  /** take(indices): positional row materialization (reference take) —
    * an isin filter on the row id, pushed to the scan. */
  val q_take = Q(
    "q_take",
    (s, dir) => {
      val li = GTable(Tables.loadOrdered(s, dir, "lineitem"))
      li.take(Seq(0L, 17L, 4242L, 59999L))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () - 1 rid FROM lineitem)
            SELECT l_orderkey, l_linenumber, l_quantity FROM t
            WHERE rid IN (0, 17, 4242, 59999) ORDER BY rid"""))

  /** take with out-of-order and duplicate indices: request order and
    * multiplicity must survive (reference take = pyarrow semantics). */
  val q_take_mixed = Q(
    "q_take_mixed",
    (s, dir) => {
      val li = GTable(Tables.loadOrdered(s, dir, "lineitem"))
      li.take(Seq(4242L, 17L, 17L, 0L))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () - 1 rid FROM lineitem),
            req(pos, ridx) AS (SELECT * FROM (VALUES (0, 4242), (1, 17), (2, 17), (3, 0)))
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM req JOIN t ON t.rid = req.ridx ORDER BY req.pos"""))

  /** slice after an explicit order(): positions index the SORTED table, not
    * natural ingest order (reference: interface.py:181-183). */
  val q_slice_sorted = Q(
    "q_slice_sorted",
    (s, dir) => {
      val li = GTable(Tables.loadOrdered(s, dir, "lineitem"))
      li.order(GTable.orderKeys(Seq("-l_quantity", "l_orderkey", "l_linenumber")))
        .slice(1000, Some(100))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            ORDER BY l_quantity DESC, l_orderkey, l_linenumber
            LIMIT 100 OFFSET 1000"""))

  /** DEEP slice into a FILTERED table: the sparse rid is re-ranked dense
    * (GTable.densify — block prefix-sum) past the densify threshold, so
    * the slice executes as a pushed rid range filter instead of
    * per-partition top-(offset+limit) heaps. The threshold is lowered as
    * an EXPLICIT slice parameter (never a session-conf mutation — a
    * concurrently running query must not observe it) so the gate
    * exercises the densify path at gate scale; the oracle re-numbers the
    * filtered survivors the same way. */
  val q_slice_filtered = Q(
    "q_slice_filtered",
    (s, dir) => {
      val li = GTable(Tables.loadOrdered(s, dir, "lineitem"))
      li.filter(col("l_quantity") > 25)
        .slice(20000, Some(100), densifyOffset = Some(1000L))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM lineitem),
          f AS (SELECT *, row_number() OVER (ORDER BY rid) prid FROM t
                WHERE l_quantity > 25)
          SELECT l_orderkey, l_linenumber, l_quantity FROM f
          WHERE prid > 20000 AND prid <= 20100 ORDER BY prid"""))

  def all: Seq[Q] = Seq(q_order_limit, q_topk_per_group, q_first_rank,
    q_first_rank_dense, q_slice, q_take, q_take_mixed, q_slice_sorted,
    q_slice_filtered)
}
