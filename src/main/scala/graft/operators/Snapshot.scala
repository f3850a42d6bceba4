package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff: the keyed delta between two corpus snapshots.
  *
  * Training-data pipelines re-crawl: each refresh lands a full new
  * snapshot, and everything downstream (dedup indexes, embeddings,
  * filters) wants to process the DELTA, not the world. `diff` computes
  * per-key status — `added` (key only in the new snapshot), `removed`
  * (only in the old), `changed` (both, compared columns differ) — with
  * ONE shuffle join on the key (the minimal shape; snapshots bucketed or
  * partitioned on the key co-locate it to a zero-shuffle zipper).
  * Unchanged rows never leave the join — at a 100 TB recrawl with a ~1%
  * churn rate the output is ~1% of the input, which is the point.
  *
  * No reference analog (graphique serves static tables); the semantics
  * follow standard change-data-capture (full-outer compare) so the
  * correctness oracle is plain SQL.
  */
object Snapshot {

  /** Per-key delta rows: key columns + `status` ∈ added | removed |
    * changed. `compareCols` defaults to every shared non-key column;
    * comparison is null-safe per column (null vs null = unchanged).
    * With `includeUnchanged` the full census (status `unchanged`
    * included) is returned — for audits, not pipelines. */
  def diff(old: DataFrame, cur: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String] = Nil,
           includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val shared = cur.columns.toSeq.filter(old.columns.contains)
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else shared.filterNot(keyCols.contains)
    cmp.foreach(c => require(shared.contains(c),
      s"compare column $c must exist in both snapshots"))
    // One struct per side: full-outer join leaves a genuinely-null struct
    // on the absent side (present rows with all-null fields still build a
    // non-null struct), so presence and content ride one narrow column.
    def packed(df: DataFrame, as: String): DataFrame = {
      val content: Column =
        if (cmp.isEmpty) lit(true) else struct(cmp.map(col): _*)
      df.select(keyCols.map(col) :+ content.as(as): _*)
    }
    val joined = packed(old, "_oldc").join(packed(cur, "_newc"),
      keyCols, "full_outer")
    val status = when(col("_oldc").isNull, lit("added"))
      .when(col("_newc").isNull, lit("removed"))
      .when(!(col("_oldc") <=> col("_newc")), lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined.withColumn("status", status)
      .select(keyCols.map(col) :+ col("status"): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }

  /** Time-travel read off a [[graft.streaming.StreamOps.snapshotSink]]
    * delta log: reconstruct the keyed table as of batch `version`
    * (inclusive; negative = latest). Because the sink emits every
    * `added`/`changed` row WITH content, the latest-per-key row among
    * deltas with `_batch <= version` IS the state as of that batch —
    * time travel costs one hash aggregation over the log, no snapshot
    * copies.
    *
    * Shape: `groupBy(key).agg(max(struct(_batch, payload)))` — a
    * map-side-combinable reduction (the narrow shape, no window sort);
    * at-least-once replay duplicates in the log carry identical
    * `(_batch, payload)` structs and collapse to the same maximum, so a
    * replayed batch cannot change any reconstruction. Payload columns
    * ride the struct exactly once and only surviving rows are
    * materialized.
    *
    * TWO payloads for the same key in the SAME batch (which snapshotSink
    * never emits — it upserts one row per key per batch) resolve by the
    * struct's payload ordering: deterministic, but an arbitrary choice
    * among the duplicates, not "last write". Payload columns must be
    * ORDERABLE (max over the packed struct) — map columns or other
    * unorderable types are rejected here with a named error instead of an
    * opaque analysis failure.
    */
  def asOf(delta: DataFrame, keyCols: Seq[String],
           version: Long = -1L): DataFrame = {
    require(keyCols.nonEmpty, "asOf needs at least one key column")
    require(delta.columns.contains("_batch"),
      "asOf needs a delta log with a _batch column (snapshotSink output)")
    val payload = delta.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == "status" || c == "_batch")
    payload.foreach { c =>
      val dt = delta.schema(c).dataType
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"asOf: payload column '$c' has unorderable type ${dt.simpleString} — " +
          "max(struct(...)) reconstruction needs orderable payloads; drop or " +
          "re-encode the column before time travel")
    }
    val visible =
      if (version < 0) delta else delta.filter(col("_batch") <= version)
    val reduced = visible
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col("_batch") +: payload.map(col): _*)).as("_gq_m"))
    reduced.select(keyCols.map(col) ++
      payload.map(c => col("_gq_m").getField(c).as(c)): _*)
  }

  /** The new-or-changed rows of `cur`, content included — the frame a
    * pipeline feeds to its incremental tiers (dedupAgainst, index
    * appends, embedding refresh). Same single-join shape as [[diff]],
    * but keeps the CURRENT snapshot's row for every non-`removed` delta
    * key (a semi-join back onto `cur`, narrow keys only on the build
    * side). */
  def changedRows(old: DataFrame, cur: DataFrame, keyCols: Seq[String],
                  compareCols: Seq[String] = Nil): DataFrame = {
    val delta = diff(old, cur, keyCols, compareCols)
      .filter(col("status") =!= "removed")
      .select(keyCols.map(col): _*)
    cur.join(delta, keyCols, "left_semi")
  }
}
