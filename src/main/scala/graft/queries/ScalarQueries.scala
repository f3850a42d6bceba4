package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.functions.GFunctions
import graft.functions.GFunctions._

/** Scalar function library queries (SURVEY §2.8): string / numeric /
  * temporal / array expression blocks, each exercised as a projection with a
  * DuckDB oracle.
  */
object ScalarQueries {

  /** String block: upper/lower/length/replace/substr/lpad/strip/reverse/
    * capitalize/find/startswith/contains (reference: inputs.py:423-447). */
  val q_str_funcs = Q(
    "q_str_funcs",
    (s, dir) => {
      val p = GTable(Tables.load(s, dir, "part"))
      p.project(
          "up" -> upper(col("p_name")),
          "lo" -> lower(col("p_brand")),
          "len" -> length(col("p_name")),
          "rep" -> regexp_replace(col("p_name"), lit("widget"), lit("gadget")),
          "sub" -> substring(col("p_name"), 1, 4),
          "pad" -> lpad(col("p_brand"), 10, "*"),
          "strip" -> trim(concat(lit("  "), col("p_type"), lit("  "))),
          "rev" -> reverse(col("p_name")),
          "cap" -> capitalize(col("p_type")),
          "found" -> find(col("p_name"), "widget"),
          "starts" -> col("p_name").startsWith("small"),
          "has" -> col("p_name").contains("gear"))
        .select("p_partkey", "up", "lo", "len", "rep", "sub", "pad", "strip",
          "rev", "cap", "found", "starts", "has")
        .order(GTable.orderKeys(Seq("p_partkey")))
        .result
    },
    Some("""SELECT p_partkey,
            upper(p_name) AS up, lower(p_brand) AS lo,
            CAST(length(p_name) AS INTEGER) AS len,
            replace(p_name, 'widget', 'gadget') AS rep,
            substr(p_name, 1, 4) AS sub,
            lpad(p_brand, 10, '*') AS pad,
            trim('  ' || p_type || '  ') AS strip,
            reverse(p_name) AS rev,
            upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS cap,
            CAST(strpos(p_name, 'widget') - 1 AS INTEGER) AS found,
            starts_with(p_name, 'small') AS starts,
            contains(p_name, 'gear') AS has
            FROM part ORDER BY p_partkey"""))

  /** Regex block: re_extract / re_search / re_split (reference maps to
    * regexp_extract / rlike / split). Patterns kept dialect-neutral. */
  val q_regex = Q(
    "q_regex",
    (s, dir) => {
      val p = GTable(Tables.load(s, dir, "part"))
      p.project(
          "brand_num" -> regexp_extract(col("p_brand"), "([0-9]+)", 1),
          "is_widget" -> col("p_name").rlike("widget$"),
          "first_word" -> element_at(split(col("p_name"), " "), 1))
        .select("p_partkey", "brand_num", "is_widget", "first_word")
        .order(GTable.orderKeys(Seq("p_partkey")))
        .result
    },
    Some("""SELECT p_partkey,
            coalesce(regexp_extract(p_brand, '([0-9]+)', 1), '') AS brand_num,
            regexp_matches(p_name, 'widget$') AS is_widget,
            string_split(p_name, ' ')[1] AS first_word
            FROM part ORDER BY p_partkey"""))

  /** Numeric block: abs/ceil/floor/sqrt/sign/exp/ln — transcendentals
    * rounded at 9 decimals on both sides (last-ulp libm drift). */
  val q_num_funcs = Q(
    "q_num_funcs",
    (s, dir) => {
      val p = GTable(Tables.load(s, dir, "part"))
      p.project(
          "ab" -> abs(col("p_retailprice") - lit(950.0)),
          "ce" -> ceil(col("p_retailprice")),
          "fl" -> floor(col("p_retailprice")),
          "sq" -> sqrt(col("p_size")),
          "sg" -> signum(col("p_size") - lit(25)),
          "ex" -> round(exp(col("p_size") / lit(10.0)), 9),
          "ln" -> round(log(col("p_size")), 9),
          "neg" -> (lit(0) - col("p_size")),
          "as_" -> round(asin(col("p_size") / lit(50.0)), 9),
          "ac" -> round(acos(col("p_size") / lit(50.0)), 9),
          "at2" -> round(atan2(col("p_size").cast("double"), col("p_retailprice")), 9))
        .select("p_partkey", "ab", "ce", "fl", "sq", "sg", "ex", "ln", "neg",
          "as_", "ac", "at2")
        .order(GTable.orderKeys(Seq("p_partkey")))
        .result
    },
    Some("""SELECT p_partkey,
            abs(p_retailprice - 950.0) AS ab,
            CAST(ceil(p_retailprice) AS BIGINT) AS ce,
            CAST(floor(p_retailprice) AS BIGINT) AS fl,
            sqrt(p_size) AS sq,
            CAST(sign(p_size - 25) AS DOUBLE) AS sg,
            round(exp(p_size / 10.0), 9) AS ex,
            round(ln(p_size), 9) AS ln,
            -p_size AS neg,
            round(asin(p_size / 50.0), 9) AS as_,
            round(acos(p_size / 50.0), 9) AS ac,
            round(atan2(CAST(p_size AS DOUBLE), p_retailprice), 9) AS at2
            FROM part ORDER BY p_partkey"""))

  /** Temporal block: year/quarter/month/day/dayofyear/week/trunc/format/
    * epoch/delta (reference: inputs.py:450-487). */
  val q_temporal = Q(
    "q_temporal",
    (s, dir) => {
      val o = GTable(Tables.load(s, dir, "orders"))
      o.project(
          "yr" -> year(col("o_orderdate")),
          "qt" -> quarter(col("o_orderdate")),
          "mo" -> month(col("o_orderdate")),
          "dy" -> dayofmonth(col("o_orderdate")),
          "doy" -> dayofyear(col("o_orderdate")),
          "wk" -> weekofyear(col("o_orderdate")),
          "mon_start" -> date_trunc("month", col("o_orderdate")),
          "fmt" -> date_format(col("o_orderdate"), "yyyy-MM"),
          "epoch_s" -> unix_timestamp(col("o_orderdate").cast("timestamp")),
          "days_since" -> delta(col("o_orderdate"),
            lit("1995-01-01").cast("timestamp"), "day"))
        .select("o_orderkey", "yr", "qt", "mo", "dy", "doy", "wk", "mon_start",
          "fmt", "epoch_s", "days_since")
        .order(GTable.orderKeys(Seq("o_orderkey")))
        .result
    },
    Some("""SELECT o_orderkey,
            CAST(year(o_orderdate) AS INTEGER) AS yr,
            CAST(quarter(o_orderdate) AS INTEGER) AS qt,
            CAST(month(o_orderdate) AS INTEGER) AS mo,
            CAST(day(o_orderdate) AS INTEGER) AS dy,
            CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
            CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
            CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
            strftime(o_orderdate, '%Y-%m') AS fmt,
            CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
            CAST((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) // 86400 AS BIGINT) AS days_since
            FROM orders ORDER BY o_orderkey"""))

  /** Bucket binning (reference `bucket`, inputs.py:398-418): out-of-range →
    * null; plus ifelse/coalesce generics (inputs.py:274-277). */
  val q_bucket_ifelse = Q(
    "q_bucket_ifelse",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.project(
          "qty_bin" -> GFunctions.bucket(col("l_quantity"), Seq(1, 11, 21, 31, 41)),
          "flagged" -> when(col("l_returnflag") === "R", lit("returned"))
            .otherwise(col("l_linestatus")),
          "co" -> coalesce(nullif(col("l_returnflag"), lit("N")), lit("[none]")))
        .select("l_orderkey", "l_linenumber", "qty_bin", "flagged", "co")
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber", "qty_bin", "flagged", "co")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber,
            CASE WHEN l_quantity >= 1 AND l_quantity < 11 THEN 0
                 WHEN l_quantity >= 11 AND l_quantity < 21 THEN 1
                 WHEN l_quantity >= 21 AND l_quantity < 31 THEN 2
                 WHEN l_quantity >= 31 AND l_quantity < 41 THEN 3
                 ELSE NULL END AS qty_bin,
            CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE l_linestatus END AS flagged,
            coalesce(nullif(l_returnflag, 'N'), '[none]') AS co
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, qty_bin NULLS FIRST, flagged, co"""))

  /** Array block over split tokens: size/sort/distinct/slice/element/join/
    * contains/index (reference: inputs.py:329-374). */
  val q_array_funcs = Q(
    "q_array_funcs",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.project("toks" -> split(col("text"), " "))
        .project(
          "n_toks" -> size(col("toks")),
          "first_tok" -> element_at(col("toks"), 1),
          "last_tok" -> element_at(col("toks"), -1),
          "n_uniq" -> size(array_distinct(col("toks"))),
          "top3" -> array_join(slice(sort_array(col("toks")), 1, 3), ","),
          "has_spark" -> array_contains(col("toks"), "spark"),
          "spark_at" -> arrayIndex(col("toks"), lit("spark")))
        .select("doc_id", "n_toks", "first_tok", "last_tok", "n_uniq",
          "top3", "has_spark", "spark_at")
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            SELECT doc_id,
            CAST(len(toks) AS INTEGER) AS n_toks,
            toks[1] AS first_tok,
            toks[-1] AS last_tok,
            CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq,
            array_to_string(list_sort(toks)[1:3], ',') AS top3,
            list_contains(toks, 'spark') AS has_spark,
            CAST(nullif(list_position(toks, 'spark'), 0) - 1 AS INTEGER) AS spark_at
            FROM t ORDER BY doc_id"""))

  /** Array numeric fold: sum/mean over a float-vector column — sequential
    * left fold in both engines for bit-identical doubles. */
  val q_array_sum = Q(
    "q_array_sum",
    (s, dir) => {
      val e = GTable(Tables.load(s, dir, "embeddings"))
      e.project(
          "vsum" -> arraySum(col("embedding")),
          "vmean" -> arrayMean(col("embedding")),
          "vmax" -> array_max(col("embedding")),
          "vmin" -> array_min(col("embedding")))
        .select("vec_id", "vsum", "vmean", "vmax", "vmin")
        .order(GTable.orderKeys(Seq("vec_id")))
        .result
    },
    Some("""SELECT vec_id,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, b) -> a + b) AS vsum,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, b) -> a + b)
              / len(embedding) AS vmean,
            CAST(list_max(embedding) AS FLOAT) AS vmax,
            CAST(list_min(embedding) AS FLOAT) AS vmin
            FROM embeddings ORDER BY vec_id"""))

  def all: Seq[Q] = Seq(q_str_funcs, q_regex, q_num_funcs, q_temporal,
    q_bucket_ifelse, q_array_funcs, q_array_sum)
}
