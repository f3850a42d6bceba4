package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.functions.GFunctions

/** Remaining §2 inventory corners: full outer join, regex split, array
  * zip/flatten/repeat/modes, sub-second temporal fields, distinct collect,
  * nested struct/array path access.
  */
object ExtraQueries {

  /** Full outer join with nulls on both sides. */
  val q_join_outer = Q(
    "q_join_outer",
    (s, dir) => {
      val hi = GTable(Tables.load(s, dir, "orders")).filter(col("o_totalprice") > 450000)
      val rich = GTable(Tables.load(s, dir, "customer")).filter(col("c_acctbal") > 9000)
      hi.join(rich, Seq("o_custkey"), Seq("c_custkey"), how = "full")
        .select("o_custkey", "o_orderkey", "c_name")
        .order(GTable.orderKeys(Seq("o_custkey", "o_orderkey", "c_name")))
        .result
    },
    Some("""SELECT coalesce(o_custkey, c_custkey) AS o_custkey, o_orderkey, c_name
            FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
            FULL OUTER JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
              ON o_custkey = c_custkey
            ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST, c_name NULLS FIRST"""))

  /** re_split (split on a regex) + split count. */
  val q_re_split = Q(
    "q_re_split",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.project("pieces" -> split(col("text"), "[aeiou]+"))
        .project("n_pieces" -> size(col("pieces")),
          "first_piece" -> element_at(col("pieces"), 1))
        .select("doc_id", "n_pieces", "first_piece")
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""SELECT doc_id,
            CAST(len(regexp_split_to_array(text, '[aeiou]+')) AS INTEGER) AS n_pieces,
            regexp_split_to_array(text, '[aeiou]+')[1] AS first_piece
            FROM documents ORDER BY doc_id"""))

  /** Array block round 2: zip, flatten, repeat, deterministic modes. */
  val q_array_extras = Q(
    "q_array_extras",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.project("toks" -> split(col("text"), " "))
        .project(
          "zipped_first" -> element_at(
            arrays_zip(slice(col("toks"), 1, 3), slice(col("toks"), 2, 3)), 1),
          "flat_n" -> size(flatten(array(slice(col("toks"), 1, 2), slice(col("toks"), 3, 2)))),
          "rep" -> array_join(array_repeat(element_at(col("toks"), 1), 3), "-"),
          "mode_tok" -> GFunctions.arrayMode(col("toks")))
        .project("zip_a" -> col("zipped_first.0"), "zip_b" -> col("zipped_first.1"))
        .select("doc_id", "zip_a", "zip_b", "flat_n", "rep", "mode_tok")
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            SELECT doc_id,
              toks[1] AS zip_a, toks[2] AS zip_b,
              CAST(len(toks[1:2] || toks[3:4]) AS INTEGER) AS flat_n,
              toks[1] || '-' || toks[1] || '-' || toks[1] AS rep,
              (SELECT u FROM (SELECT unnest(list_distinct(toks)) u)
                ORDER BY -len(list_filter(toks, x -> x = u)), u LIMIT 1) AS mode_tok
            FROM t ORDER BY doc_id"""))

  /** Sub-second temporal fields on the microsecond-resolution events. */
  val q_temporal_subsecond = Q(
    "q_temporal_subsecond",
    (s, dir) => {
      val e = GTable(Tables.load(s, dir, "events"))
      e.project(
          "hr" -> hour(col("ts")),
          "mi" -> minute(col("ts")),
          "sec" -> second(col("ts")),
          "micros_frac" -> (unix_micros(col("ts").cast("timestamp")) % 1000000L),
          "millis" -> ((unix_micros(col("ts").cast("timestamp")) % 1000000L) / lit(1000L)).cast("long"))
        .select("event_id", "hr", "mi", "sec", "micros_frac", "millis")
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT event_id,
            CAST(hour(ts) AS INTEGER) AS hr,
            CAST(minute(ts) AS INTEGER) AS mi,
            CAST(second(ts) AS INTEGER) AS sec,
            CAST(microsecond(ts) % 1000000 AS BIGINT) AS micros_frac,
            CAST((microsecond(ts) % 1000000) // 1000 AS BIGINT) AS millis
            FROM events ORDER BY event_id"""))

  /** Distinct collect (collect_set, sorted for determinism). */
  val q_collect_set = Q(
    "q_collect_set",
    (s, dir) => {
      val li = GTable(Tables.load(s, dir, "lineitem"))
      li.filter(col("l_partkey") < 40)
        .group(Seq("l_partkey"),
          Seq(array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("flags")))
        .order(GTable.orderKeys(Seq("l_partkey")))
        .result
    },
    Some("""SELECT l_partkey,
            array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags
            FROM lineitem WHERE l_partkey < 40
            GROUP BY l_partkey ORDER BY l_partkey"""))

  /** Nested struct path + negative array index (reference column(name:
    * [path], index: [-1]), interface.py:159-175). */
  val q_nested_access = Q(
    "q_nested_access",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.project("toks" -> split(col("text"), " "))
        .project("s" -> struct(col("lang").as("l"),
          struct(col("source").as("src"), col("n_chars").as("nc")).as("inner")))
        .project(
          "lang_path" -> col("s.l"),
          "src_path" -> col("s.inner.src"),
          "last_tok" -> element_at(col("toks"), -1),
          "s_json" -> to_json(col("s")))
        .select("doc_id", "lang_path", "src_path", "last_tok", "s_json")
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""SELECT doc_id, lang AS lang_path, source AS src_path,
            string_split(text, ' ')[-1] AS last_tok,
            '{"l":"' || lang || '","inner":{"src":"' || source || '","nc":' || n_chars || '}}' AS s_json
            FROM documents ORDER BY doc_id"""))

  def all: Seq[Q] = Seq(q_join_outer, q_re_split, q_array_extras,
    q_temporal_subsecond, q_collect_set, q_nested_access)
}
