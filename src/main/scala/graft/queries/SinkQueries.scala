package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}

/** Sink round-trip queries (SURVEY §2.1 write paths; reference
  * interface.py Dataset writes / core.py parquet sink). Each entry WRITES
  * through the engine's own sink — hive-partitioned directory layout or a
  * bucketed saved table — re-reads what actually landed on disk, and
  * hash-matches the oracle recomputed from the ORIGINAL parquet. Until
  * round 5 the writers were spec-only; these entries put write→read
  * identity under the driver's gate. */
object SinkQueries {

  private val written = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Hive-partitioned write (one directory per c_mktsegment, one fragment
    * per partition, sorted within by c_custkey) and full re-read. The two
    * intentional divergences of a hive layout are restored explicitly:
    * the partition column comes back LAST in the schema (select restores
    * position) as a directory-value string (customer's segment is already
    * a string, so the cast is an identity guard). */
  val q_write_roundtrip = Q(
    "q_write_roundtrip",
    (s, dir) => {
      val dest = "/tmp/graft_sink/customer_hive_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      written.getOrElseUpdate(dest, {
        GTable(Tables.load(s, dir, "customer"))
          .write(dest, partitionBy = Seq("c_mktsegment"),
            sortWithin = Seq("c_custkey"))
        true
      })
      GTable(s.read.parquet(dest)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"), col("c_mktsegment").cast("string")))
        .order(GTable.orderKeys(Seq("c_custkey", "c_name", "c_nationkey",
          "c_acctbal", "c_mktsegment")))
        .result
    },
    Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer ORDER BY 1, 2, 3, 4, 5"""))

  /** Bucketed+sorted saved-table write (exchange-free join layout;
    * ScaleSpec asserts the no-Exchange property) and full re-read via the
    * session catalog. */
  val q_write_bucketed = Q(
    "q_write_bucketed",
    (s, dir) => {
      val table = "graft_rt_orders_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      written.getOrElseUpdate(table, {
        GTable(Tables.load(s, dir, "orders"))
          .write(table, bucketBy = Some((8, Seq("o_custkey"))))
        true
      })
      GTable(s.table(table))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .order(GTable.orderKeys(Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")))
        .result
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              o_orderdate, o_orderpriority
            FROM orders ORDER BY 1, 2, 3, 4, 5, 6"""))

  /** Out-of-core hive repartitioner round-trip (reference
    * partition.py:29-77 — its 2-pass batch strategy IS Spark's shuffle):
    * cluster lineitem by l_returnflag with a secondary sort within
    * fragments, re-read the hive layout, and hash-match content against
    * the original. PartitionSpec asserts the fragment layout and
    * intra-fragment order; this entry puts content identity under the
    * driver's gate (spec-only through round 7). */
  val q_repartition_roundtrip = Q(
    "q_repartition_roundtrip",
    (s, dir) => {
      val dest = "/tmp/graft_sink/lineitem_repart_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      written.getOrElseUpdate(dest, {
        graft.sources.ParquetMeta.repartitionTo(
          Tables.load(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
          dest, keys = Seq("l_returnflag"), sortWithin = Seq("l_orderkey"))
        true
      })
      GTable(s.read.parquet(dest)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_returnflag").cast("string")))
        .order(GTable.orderKeys(Seq("l_orderkey", "l_linenumber",
          "l_quantity", "l_returnflag")))
        .result
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem ORDER BY 1, 2, 3, 4"""))

  /** JSONL source round-trip: training-data corpora arrive as
    * line-delimited JSON; the engine reads them through the same
    * source-agnostic table surface (Tables.loadFormat — schema passed
    * EXPLICITLY: at 100 TB schema inference is a full extra scan). The
    * gate writes documents as JSONL through Spark's json sink, re-reads
    * it, and hash-matches full content — text escaping included —
    * against the ORIGINAL parquet. SourceFormatsSpec covers csv/orc the
    * same way; this puts the text-format path under the driver's gate
    * (spec-only through round 7). */
  val q_source_jsonl = Q(
    "q_source_jsonl",
    (s, dir) => {
      val dest = "/tmp/graft_sink/documents_jsonl_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val docs = Tables.load(s, dir, "documents")
      written.getOrElseUpdate(dest, {
        docs.write.mode("overwrite").json(dest)
        true
      })
      GTable(Tables.loadFormat(s, dest, "json", Some(docs.schema)))
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""SELECT doc_id, text, lang, source, n_chars FROM documents
            ORDER BY doc_id"""))

  def all: Seq[Q] = Seq(q_write_roundtrip, q_write_bucketed,
    q_repartition_roundtrip, q_source_jsonl)
}
