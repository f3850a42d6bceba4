package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.functions.GAggs

/** Aggregation queries (SURVEY §2.4): the full `Aggregates` input surface —
  * filtered aggregates, ordered first/last, argmax/argmin, ordered
  * collect/concat, nunique, quantile, std/var, moments, deterministic mode,
  * bool any/all, value counts, distinct keep=first.
  */
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

  /** Whole-table aggregate (empty `by` → 1 row) + min/max/nunique. */
  val q_agg_whole = Q(
    "q_agg_whole",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Nil,
          aggs = Seq(
            sum("l_quantity").as("total_qty"),
            min("l_shipdate").as("min_ship"),
            max("l_shipdate").as("max_ship"),
            min("l_returnflag").as("min_flag"),
            GAggs.nunique(col("l_partkey")).as("n_parts"),
            GAggs.nunique(col("l_suppkey")).as("n_supps")),
          counts = Some("n_rows"))
        .result
    },
    Some("""SELECT sum(l_quantity) AS total_qty,
            min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
            min(l_returnflag) AS min_flag,
            count(DISTINCT l_partkey) AS n_parts,
            count(DISTINCT l_suppkey) AS n_supps,
            count(*) AS n_rows
            FROM lineitem"""))

  /** Group with counts only (reference `counts:` on group). */
  val q_group_counts = Q(
    "q_group_counts",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.group(Seq("o_orderstatus", "o_orderpriority"), Nil, Some("n"))
        .order(GTable.orderKeys(Seq("o_orderstatus", "o_orderpriority")))
        .result
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Deterministic ordered first/last per group (reference ordered `first`/
    * `last`): min_by/max_by over an orderable struct — single aggregation,
    * no window shuffle. */
  val q_first_last = Q(
    "q_first_last",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.group(
          by = Seq("o_orderstatus"),
          aggs = Seq(
            GAggs.firstBy(col("o_orderkey"), col("o_orderdate"), col("o_orderkey")).as("first_key"),
            GAggs.lastBy(col("o_orderkey"), col("o_orderdate"), col("o_orderkey")).as("last_key")))
        .order(GTable.orderKeys(Seq("o_orderstatus")))
        .result
    },
    Some("""WITH r AS (SELECT o_orderstatus, o_orderkey,
              row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey) rn,
              row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate DESC, o_orderkey DESC) rn2
              FROM orders)
            SELECT o_orderstatus,
              max(CASE WHEN rn = 1 THEN o_orderkey END) AS first_key,
              max(CASE WHEN rn2 = 1 THEN o_orderkey END) AS last_key
            FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** argmax/argmin with deterministic tie-break (reference: inputs.py:198-203). */
  val q_argmax = Q(
    "q_argmax",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.group(
          by = Seq("o_orderstatus"),
          aggs = Seq(
            GAggs.argmax(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_max_price"),
            GAggs.argmin(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_min_price")))
        .order(GTable.orderKeys(Seq("o_orderstatus")))
        .result
    },
    Some("""WITH r AS (SELECT o_orderstatus, o_orderkey,
              row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey DESC) rx,
              row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC) rm
              FROM orders)
            SELECT o_orderstatus,
              max(CASE WHEN rx = 1 THEN o_orderkey END) AS key_of_max_price,
              max(CASE WHEN rm = 1 THEN o_orderkey END) AS key_of_min_price
            FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Ordered collect into arrays (reference `collect` with order_by).
    * The array result is serialized to a joined string at the gate boundary
    * so the driver's comparator can sort/hash it (arrays are unhashable in
    * pandas); element order is exactly what the serialization proves. */
  val q_collect = Q(
    "q_collect",
    (s, dir) => {
      val c = GTable(Tables.load(s, dir, "customer"))
      c.filter(col("c_custkey") < 50)
        .group(
          by = Seq("c_mktsegment"),
          aggs = Seq(GAggs.collectBy(col("c_custkey"), col("c_custkey")).as("keys_arr")))
        .project("keys" -> array_join(col("keys_arr").cast("array<string>"), ","))
        .select("c_mktsegment", "keys")
        .order(GTable.orderKeys(Seq("c_mktsegment")))
        .result
    },
    Some("""SELECT c_mktsegment,
            array_to_string(list(c_custkey ORDER BY c_custkey), ',') AS keys
            FROM customer WHERE c_custkey < 50
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Ordered group_concat (reference `concat` = string_agg). */
  val q_concat = Q(
    "q_concat",
    (s, dir) => {
      val n = GTable(Tables.load(s, dir, "nation"))
      n.group(
          by = Seq("n_regionkey"),
          aggs = Seq(GAggs.concatBy(col("n_name"), "|", col("n_name")).as("nations")))
        .order(GTable.orderKeys(Seq("n_regionkey")))
        .result
    },
    Some("""SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS nations
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** Exact nunique per group (approx variant is rows-only: q_approx_nunique). */
  val q_nunique = Q(
    "q_nunique",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Seq("l_returnflag"),
          aggs = Seq(
            GAggs.nunique(col("l_partkey")).as("parts"),
            GAggs.nunique(col("l_orderkey")).as("orders")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS parts,
            count(DISTINCT l_orderkey) AS orders
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** approx_count_distinct (HLL) — sketches differ across engines, so the
    * oracle check is rows-only; the spec asserts <5% relative error. */
  val q_approx_nunique = Q(
    "q_approx_nunique",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Seq("l_returnflag"),
          aggs = Seq(GAggs.nunique(col("l_partkey"), approx = true).as("parts_approx")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    None)

  /** Tolerance adjudication for the HLL sketch (round-5 VERDICT #7): the
    * engine computes BOTH exact and approx distinct counts per group and
    * emits `within` = |approx − exact| ≤ 5%·exact; the oracle recomputes
    * the exact counts in DuckDB and asserts TRUE per group — so the gate
    * hash-fails if Spark's sketch ever drifts past its documented bound
    * (or the exact side diverges). Closes the only adjudication gap the
    * raw rows-only q_approx_nunique leaves. */
  val q_approx_nunique_tol = Q(
    "q_approx_nunique_tol",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      val g = li.group(
          by = Seq("l_returnflag"),
          aggs = Seq(
            GAggs.nunique(col("l_partkey")).as("parts"),
            GAggs.nunique(col("l_partkey"), approx = true).as("approx")))
        .result
      GTable(g.select(col("l_returnflag"), col("parts"),
          (abs(col("approx") - col("parts")) <= col("parts") * lit(0.05))
            .as("within")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS parts,
              TRUE AS within
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Continuous quantiles (reference `quantile`): interpolating percentile
    * over integral doubles — exact in both engines. */
  val q_quantile = Q(
    "q_quantile",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Seq("l_returnflag"),
          aggs = Seq(
            GAggs.quantile(col("l_quantity"), 0.25).as("q25"),
            GAggs.quantile(col("l_quantity"), 0.5).as("q50"),
            GAggs.quantile(col("l_quantity"), 0.75).as("q75")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""SELECT l_returnflag,
            quantile_cont(l_quantity, 0.25) AS q25,
            quantile_cont(l_quantity, 0.5) AS q50,
            quantile_cont(l_quantity, 0.75) AS q75
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Discrete quantile on STRING columns (reference quantile works on
    * strings; Spark's percentile does not — custom aggregate). */
  val q_quantile_str = Q(
    "q_quantile_str",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.group(
          by = Seq("o_orderstatus"),
          aggs = Seq(
            GAggs.quantileDisc(col("o_orderpriority"), 0.5).as("median_prio"),
            GAggs.quantileDisc(col("o_orderpriority"), 0.25).as("q25_prio")))
        .order(GTable.orderKeys(Seq("o_orderstatus")))
        .result
    },
    Some("""WITH r AS (SELECT o_orderstatus, o_orderpriority,
              row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) rn,
              count(*) OVER (PARTITION BY o_orderstatus) n
              FROM orders)
            SELECT o_orderstatus,
              max(CASE WHEN rn = floor(0.5 * (n - 1)) + 1 THEN o_orderpriority END) AS median_prio,
              max(CASE WHEN rn = floor(0.25 * (n - 1)) + 1 THEN o_orderpriority END) AS q25_prio
            FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** std/var sample+population (reference `std`/`var` how:), rounded 6 —
    * single-pass moment merges are order-sensitive in the last ulp. */
  val q_std_var = Q(
    "q_std_var",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Seq("l_returnflag"),
          aggs = Seq(
            round(GAggs.stdDev(col("l_quantity")), 6).as("std_samp"),
            round(GAggs.stdDev(col("l_quantity"), sample = false), 6).as("std_pop"),
            round(GAggs.variance(col("l_quantity")), 6).as("var_samp"),
            round(GAggs.variance(col("l_quantity"), sample = false), 6).as("var_pop")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""SELECT l_returnflag,
            round(stddev_samp(l_quantity), 6) AS std_samp,
            round(stddev_pop(l_quantity), 6) AS std_pop,
            round(var_samp(l_quantity), 6) AS var_samp,
            round(var_pop(l_quantity), 6) AS var_pop
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** skewness + kurtosis (reference `kurtosis` how:) — Spark computes
    * population moments (g1, excess g2); DuckDB's built-ins are
    * bias-corrected sample stats, so the oracle recomputes Spark's formula
    * from raw central moments. */
  val q_moments = Q(
    "q_moments",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Nil,
          aggs = Seq(
            round(skewness(col("l_quantity")), 6).as("skew"),
            round(kurtosis(col("l_quantity")), 6).as("kurt"),
            // sample-corrected variant == DuckDB's native kurtosis
            round(GAggs.kurtosisSample(col("l_quantity")), 6).as("kurt_samp")))
        .result
    },
    Some("""WITH s AS (SELECT avg(l_quantity) AS m FROM lineitem),
            c AS (SELECT
              avg((l_quantity - m) ^ 2) AS m2,
              avg((l_quantity - m) ^ 3) AS m3,
              avg((l_quantity - m) ^ 4) AS m4
              FROM lineitem, s)
            SELECT round(m3 / (m2 ^ 1.5), 6) AS skew,
                   round(m4 / (m2 ^ 2) - 3, 6) AS kurt,
                   (SELECT round(kurtosis(l_quantity), 6) FROM lineitem) AS kurt_samp
            FROM c"""))

  /** Deterministic mode via two-level aggregation (count per value, then
    * min_by (-count, value)) — engine-native `mode` breaks ties arbitrarily. */
  val q_mode = Q(
    "q_mode",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(Seq("l_returnflag", "l_quantity"), Nil, Some("n"))
        .group(
          by = Seq("l_returnflag"),
          aggs = Seq(GAggs.argmin(col("l_quantity"),
            struct((lit(0) - col("n")).as("negn"), col("l_quantity"))).as("mode_qty")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""WITH c AS (SELECT l_returnflag, l_quantity, count(*) n
              FROM lineitem GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
              ORDER BY n DESC, l_quantity ASC) rn FROM c)
            SELECT l_returnflag, l_quantity AS mode_qty FROM r WHERE rn = 1
            ORDER BY l_returnflag"""))

  /** Filtered aggregates (reference `where:` on any aggregate → FILTER). */
  val q_filtered_agg = Q(
    "q_filtered_agg",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Seq("l_returnflag"),
          aggs = Seq(
            round(GAggs.filtered(sum, col("l_extendedprice"), col("l_discount") > 0.05), 2).as("rev_hi_disc"),
            GAggs.countWhere(col("l_quantity") >= 25).as("n_bulk"),
            round(GAggs.filtered(avg, col("l_quantity"), col("l_linestatus") === "F"), 6).as("avg_qty_f")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""SELECT l_returnflag,
            round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS rev_hi_disc,
            count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
            round(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 6) AS avg_qty_f
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Boolean any/all aggregates (reference: inputs.py:208-209). */
  val q_any_all = Q(
    "q_any_all",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.group(
          by = Seq("l_returnflag"),
          aggs = Seq(
            bool_or(col("l_discount") > 0.09).as("any_high_disc"),
            bool_and(col("l_quantity") > 0).as("all_positive"),
            bool_and(col("l_tax") < 0.05).as("all_low_tax")))
        .order(GTable.orderKeys(Seq("l_returnflag")))
        .result
    },
    Some("""SELECT l_returnflag,
            bool_or(l_discount > 0.09) AS any_high_disc,
            bool_and(l_quantity > 0) AS all_positive,
            bool_and(l_tax < 0.05) AS all_low_tax
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** distinct keep=first with counts (reference: interface.py:210-214) —
    * per-key first row by natural order + group size, one shuffled window. */
  val q_distinct_first = Q(
    "q_distinct_first",
    (s, dir) => {
      val li = GTable(Tables.loadOrdered(s, dir, "lineitem"))
      li.distinctOn(Seq("l_partkey"), keep = "first", counts = Some("n"))
        .select("l_partkey", "l_orderkey", "l_linenumber", "n")
        .order(GTable.orderKeys(Seq("l_partkey")))
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM lineitem),
            r AS (SELECT l_partkey, l_orderkey, l_linenumber,
              row_number() OVER (PARTITION BY l_partkey ORDER BY rid) rn,
              count(*) OVER (PARTITION BY l_partkey) n
              FROM t)
            SELECT l_partkey, l_orderkey, l_linenumber, n FROM r WHERE rn = 1
            ORDER BY l_partkey"""))

  /** Group in first-seen order (reference group(order:)). Oracle emulates the
    * natural-order row id with row_number() over the file order. */
  val q_group_first_seen = Q(
    "q_group_first_seen",
    (s, dir) => {
      val li = GTable(Tables.loadOrdered(s, dir, "lineitem"))
      li.group(Seq("l_returnflag"), Nil, Some("n"), firstSeenOrder = true)
        .result
    },
    Some("""WITH t AS (SELECT *, row_number() OVER () rid FROM lineitem)
            SELECT l_returnflag, count(*) AS n
            FROM t GROUP BY l_returnflag ORDER BY min(rid)"""))

  def all: Seq[Q] = Seq(q1_agg, q_agg_whole, q_group_counts, q_first_last,
    q_argmax, q_collect, q_concat, q_nunique, q_approx_nunique,
    q_approx_nunique_tol, q_quantile,
    q_quantile_str, q_std_var, q_moments, q_mode, q_filtered_agg, q_any_all,
    q_distinct_first, q_group_first_seen)
}
