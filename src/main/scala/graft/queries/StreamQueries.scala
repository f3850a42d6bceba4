package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.streaming.StreamOps

/** Event-time window queries (SURVEY §2.10 extension). The same builders
  * power the streaming path (StreamingSpec); here they run on the batch
  * events frame so the DuckDB oracle can check the window semantics.
  */
object StreamQueries {

  /** Tumbling 1-hour windows per event_type. */
  val q_stream_tumbling = Q(
    "q_stream_tumbling",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      GTable(StreamOps.tumbling(e, "ts", "1 hour", Seq("event_type"),
          Seq(count(lit(1)).as("n"), round(sum("value"), 6).as("total"))))
        .order(GTable.orderKeys(Seq("w_start", "event_type")))
        .result
    },
    Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
              time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS w_end,
              event_type, count(*) AS n, round(sum(value), 6) AS total
            FROM events GROUP BY 1, 2, 3
            ORDER BY w_start, event_type"""))

  /** Sliding windows: 1 hour long, 30-minute slide (every event lands in
    * exactly two windows). */
  val q_stream_sliding = Q(
    "q_stream_sliding",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      GTable(StreamOps.sliding(e, "ts", "1 hour", "30 minutes", Seq("event_type"),
          Seq(count(lit(1)).as("n"))))
        .order(GTable.orderKeys(Seq("w_start", "event_type")))
        .result
    },
    Some("""WITH w AS (
              SELECT event_type, unnest([
                time_bucket(INTERVAL 30 MINUTE, ts),
                time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS w_start
              FROM events)
            SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
              count(*) AS n
            FROM w GROUP BY 1, 2, 3
            ORDER BY w_start, event_type"""))

  /** Session windows: 30-minute gap per user (end = last event + gap). */
  val q_stream_session = Q(
    "q_stream_session",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      GTable(StreamOps.session(e, "ts", "30 minutes", Seq("user_id"),
          Seq(count(lit(1)).as("n"), round(sum("value"), 6).as("total"))))
        .order(GTable.orderKeys(Seq("user_id", "s_start")))
        .result
    },
    Some("""WITH t AS (SELECT user_id, ts, value,
              CASE WHEN date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                   OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess
              FROM t)
            SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
              user_id, count(*) AS n, round(sum(value), 6) AS total
            FROM g GROUP BY user_id, sess
            ORDER BY user_id, s_start"""))

  /** Dedup on keys (batch equivalent of dropDuplicatesWithinWatermark):
    * first event per (user, type) by event time. */
  val q_stream_dedup = Q(
    "q_stream_dedup",
    (s, dir) => {
      val e = GTable(Tables.load(s, dir, "events"))
      e.group(Seq("user_id", "event_type"),
          Seq(min(struct(col("ts"), col("event_id"))).as("first")))
        .project("ts" -> col("first.ts"), "event_id" -> col("first.event_id"))
        .select("user_id", "event_type", "ts", "event_id")
        .order(GTable.orderKeys(Seq("user_id", "event_type")))
        .result
    },
    Some("""SELECT user_id, event_type, min(ts) AS ts,
              arg_min(event_id, ts) AS event_id
            FROM events GROUP BY 1, 2
            ORDER BY user_id, event_type"""))

  /** Stream-stream interval join (attribution shape): clicks by the same
    * user within the 5 minutes before each purchase. Runs on the batch
    * frame here (watermark is a no-op) so the oracle checks the interval
    * semantics; StreamingSpec runs the same builder on two memory streams
    * with watermarked, state-bounded append output. */
  val q_stream_join = Q(
    "q_stream_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
      GTable(StreamOps.intervalJoin(purchases, clicks, "user_id", "ts",
          before = "5 MINUTES", after = "0 SECONDS", delay = "10 minutes")
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_clicks")))
        .order(GTable.orderKeys(Seq("event_id")))
        .result
    },
    Some("""SELECT p.event_id, count(*) AS n_clicks
            FROM events p JOIN events c
            ON p.event_type = 'purchase' AND c.event_type = 'click'
             AND p.user_id = c.user_id
             AND c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
            GROUP BY p.event_id ORDER BY p.event_id"""))

  /** The SAME tumbling+watermark builder executed by the MICRO-BATCH engine
    * (the other q_stream_* entries adjudicate the builders in batch mode;
    * this one puts actual streaming execution under the gate): the events
    * table is replayed through a MemoryStream in three interleaved chunks —
    * each followed by processAllAvailable, so windows' state merges across
    * micro-batches and chunk 3's out-of-order rows update windows opened in
    * chunk 1 — into a complete-mode memory sink. The replay harness is
    * driver-side BY DESIGN (it is the verification rig; production
    * streaming reads files/Kafka via readStream — SourceFormatsSpec covers
    * the file source). Oracle: identical to q_stream_tumbling. */
  val q_stream_micro = Q(
    "q_stream_micro",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val spark2 = s
      import spark2.implicits._
      val rows = Tables.load(s, dir, "events")
        .select("ts", "event_type", "value")
        .as[(java.sql.Timestamp, String, Double)].collect()
      val mem = MemoryStream[(java.sql.Timestamp, String, Double)](s)
      val sdf = StreamOps.tumbling(
        StreamOps.watermarked(mem.toDF.toDF("ts", "event_type", "value"),
          "ts", "10 minutes"),
        "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("n"), round(sum("value"), 6).as("total")))
      val q = sdf.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_micro").start()
      try {
        (0 until 3).foreach { c =>
          mem.addData(rows.indices.collect {
            case i if i % 3 == c => rows(i)
          }.toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      GTable(s.table("graft_stream_micro"))
        .order(GTable.orderKeys(Seq("w_start", "event_type")))
        .result
    },
    q_stream_tumbling.oracle)

  /** Incremental-ingestion dedup through the REAL micro-batch engine with
    * corpus state UPDATING between batches (q_stream_micro's replay
    * pattern): documents stream in 3 chunks; each chunk also carries
    * re-submissions of the PREVIOUS chunk's texts under new ids (must be
    * dropped by the accumulated hash state) and copies of half its own
    * texts under bigger ids (must be dropped by within-batch min-id
    * dedup). Survivors across the whole replay are therefore exactly the
    * original documents, each emitted once — any cross-batch state loss
    * shows up as extra output rows, any over-dropping as missing ones.
    * The Bloom pre-pass runs with the exact anti-join behind it, so the
    * screen only shrinks the join and never changes the answer. */
  val q_stream_dedup_incr = Q(
    "q_stream_dedup_incr",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "text").as[(Long, String)].collect()
      val work = java.nio.file.Files.createTempDirectory("graft_incr_dedup").toString
      val mem = MemoryStream[(Long, String)](s)
      val q = StreamOps.incrementalDedupSink(
        mem.toDF.toDF("doc_id", "text"), "text", "doc_id",
        hashDir = s"$work/hashes", outDir = s"$work/out",
        checkpoint = s"$work/ckpt",
        bloomExpected = 10000, bloomFpp = 0.01,
        trigger = Trigger.ProcessingTime(0))
      try {
        (0 until 3).foreach { c =>
          val originals = docs.filter(_._1 % 3 == c)
          val crossDupes =
            if (c == 0) Array.empty[(Long, String)]
            else docs.filter(_._1 % 3 == c - 1)
              .map { case (id, t) => (id + 100000L, t) }
          val withinDupes = originals.filter(_._1 % 2 == 0)
            .map { case (id, t) => (id + 200000L, t) }
          mem.addData((originals ++ crossDupes ++ withinDupes).toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      GTable(s.read.parquet(s"$work/out").select("doc_id"))
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    // first occurrence per text class in REPLAY order: chunk = doc_id % 3,
    // min doc_id within a chunk (sf0.1's documents table contains a few
    // genuinely duplicated texts — the sink must keep exactly the earliest)
    Some("""WITH ranked AS (
              SELECT doc_id, row_number() OVER (
                PARTITION BY text ORDER BY doc_id % 3, doc_id) AS rn
              FROM documents)
            SELECT doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id"""))

  /** Streaming NEAR-DUP ingestion against a pre-seeded prebuilt MinHash
    * index (StreamOps.nearDupDedupSink): corpus = doc_id < 400 built as an
    * index, docs ≥ 400 streamed as one micro-batch — survivors have no
    * near-dup in the corpus index AND are their within-batch near-dup
    * cluster's smallest id. md5 family, so the oracle recomputes the whole
    * path: the cross probe (corpus-side cap), the within-batch banded
    * self-join (batch-side cap) and the recursive cluster closure.
    * Cross-batch accumulation is spec'd in StreamingSpec (replay tests). */
  val q_stream_dedup_neardup = Q(
    "q_stream_dedup_neardup",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val docs = Tables.load(s, dir, "documents")
      val work = java.nio.file.Files.createTempDirectory("graft_neardup_sink").toString
      val idx = graft.operators.Dedup.minhashIndexBuild(
        docs.filter(col("doc_id") < 400), "text", "doc_id",
        path = s"$work/idx", n = 3, k = 32, bands = 8, md5 = true, slots = 8)
      graft.operators.Similarity.writeMeta(s, s"$work/idx", idx)
      val batch = docs.filter(col("doc_id") >= 400)
        .select("doc_id", "text").as[(Long, String)].collect()
      val mem = MemoryStream[(Long, String)](s)
      val q = StreamOps.nearDupDedupSink(
        mem.toDF.toDF("doc_id", "text"), "text", "doc_id",
        indexDir = s"$work/idx", outDir = s"$work/out",
        checkpoint = s"$work/ckpt", threshold = 0.5,
        n = 3, k = 32, bands = 8, md5 = true, slots = 8,
        trigger = Trigger.ProcessingTime(0))
      try {
        mem.addData(batch.toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      GTable(s.read.parquet(s"$work/out").select("doc_id"))
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some(s"""WITH RECURSIVE ${PipelineQueries.minhashMd5AgainstSql(k = 32,
              bands = 8, threshold = 0.5,
              corpusCond = "id < 400", batchCond = "id >= 400")},
            surv0 AS (SELECT id FROM sig WHERE id >= 400
              AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.batch_id = id)
              UNION SELECT doc_id FROM documents WHERE doc_id >= 400
                AND doc_id NOT IN (SELECT id FROM sig)),
            bsurv AS (SELECT b.* FROM banded b
              WHERE EXISTS (SELECT 1 FROM surv0 s WHERE s.id = b.id)),
            hotw AS (SELECT band, bucket FROM bsurv GROUP BY band, bucket
              HAVING count(*) > ${graft.operators.Dedup.DefaultMaxBucket}),
            bsurvc AS (SELECT bsurv.* FROM bsurv
              WHERE NOT EXISTS (SELECT 1 FROM hotw h
                WHERE h.band = bsurv.band AND h.bucket = bsurv.bucket)),
            wcand AS (SELECT DISTINCT a.id AS id1, b.id AS id2
              FROM bsurvc a JOIN bsurvc b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
            wpairs AS (SELECT id1, id2 FROM wcand
              JOIN sig s1 ON wcand.id1 = s1.id
              JOIN sig s2 ON wcand.id2 = s2.id
              WHERE len(list_filter(list_transform(range(1, 33),
                i -> s1.sg[CAST(i AS INT)] = s2.sg[CAST(i AS INT)]), x -> x))
                / 32.0 >= 0.5),
            edges AS (SELECT id1 AS a, id2 AS b FROM wpairs
                      UNION SELECT id2, id1 FROM wpairs),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(src, dst) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
            dupes AS (SELECT src AS id FROM reach
              GROUP BY src HAVING src <> min(dst))
            SELECT s.id AS doc_id FROM surv0 s
            WHERE NOT EXISTS (SELECT 1 FROM dupes d WHERE d.id = s.id)
            ORDER BY doc_id"""))

  /** Streaming EMBEDDING ingestion with cosine near-dup screening
    * (StreamOps.annIngestSink) against a pre-seeded prebuilt LSH index:
    * corpus = vec_id < 160 built as an index, vec_id ≥ 160 streamed as one
    * micro-batch — survivors share no sign bucket with a corpus vector at
    * cosine ≥ 0.4, AND are their within-batch cosine-cluster's smallest id. The
    * oracle recomputes the deterministic hyperplanes, both capped bucket
    * joins and the recursive cluster closure. Cross-batch accumulation is
    * spec'd in StreamingSpec. */
  val q_stream_ann_ingest = Q(
    "q_stream_ann_ingest",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val work = java.nio.file.Files.createTempDirectory("graft_ann_sink").toString
      val idx = graft.operators.Similarity.lshBuild(
        e.filter(col("vec_id") < 160), "vec_id", "embedding",
        planes = 4, dim = 64, path = s"$work/idx")
      graft.operators.Similarity.writeMeta(s, s"$work/idx", idx)
      val batch = e.filter(col("vec_id") >= 160)
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      val mem = MemoryStream[(Long, Array[Float])](s)
      val q = StreamOps.annIngestSink(
        mem.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
        indexDir = s"$work/idx", outDir = s"$work/out",
        checkpoint = s"$work/ckpt", threshold = 0.4, planes = 4, dim = 64,
        trigger = Trigger.ProcessingTime(0))
      try {
        mem.addData(batch.toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      GTable(s.read.parquet(s"$work/out").select("vec_id"))
        .order(GTable.orderKeys(Seq("vec_id")))
        .result
    },
    Some(s"""WITH RECURSIVE v AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings),
          ${PipelineQueries.lshBucketsSql(planes = 4, dim = 64, tables = 8)},
          buckcorp AS (SELECT * FROM buck WHERE vec_id < 160),
          buckbatch AS (SELECT * FROM buck WHERE vec_id >= 160),
          hotc AS (SELECT t, bucket FROM buckcorp GROUP BY t, bucket
            HAVING count(*) > ${graft.operators.Dedup.DefaultMaxBucket}),
          buckcorpc AS (SELECT buckcorp.* FROM buckcorp
            WHERE NOT EXISTS (SELECT 1 FROM hotc h
              WHERE h.t = buckcorp.t AND h.bucket = buckcorp.bucket)),
          xhits AS (SELECT DISTINCT b.vec_id FROM buckbatch b
            JOIN buckcorpc c ON b.t = c.t AND b.bucket = c.bucket
            JOIN v v1 ON v1.vec_id = b.vec_id
            JOIN v v2 ON v2.vec_id = c.vec_id
            WHERE ${PipelineQueries.cosSql("v1.e", "v2.e")} >= 0.4),
          surv0 AS (SELECT vec_id FROM v WHERE vec_id >= 160
            AND vec_id NOT IN (SELECT vec_id FROM xhits)),
          bsurv AS (SELECT bb.* FROM buckbatch bb
            WHERE EXISTS (SELECT 1 FROM surv0 s WHERE s.vec_id = bb.vec_id)),
          hotw AS (SELECT t, bucket FROM bsurv GROUP BY t, bucket
            HAVING count(*) > ${graft.operators.Dedup.DefaultMaxBucket}),
          bsurvc AS (SELECT bsurv.* FROM bsurv
            WHERE NOT EXISTS (SELECT 1 FROM hotw h
              WHERE h.t = bsurv.t AND h.bucket = bsurv.bucket)),
          wcand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
            FROM bsurvc a JOIN bsurvc b
            ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
          wpairs AS (SELECT id1, id2 FROM wcand
            JOIN v v1 ON v1.vec_id = wcand.id1
            JOIN v v2 ON v2.vec_id = wcand.id2
            WHERE ${PipelineQueries.cosSql("v1.e", "v2.e")} >= 0.4),
          edges AS (SELECT id1 AS a, id2 AS b FROM wpairs
                    UNION SELECT id2, id1 FROM wpairs),
          nodes AS (SELECT DISTINCT a AS id FROM edges),
          reach(src, dst) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a),
          dupes AS (SELECT src AS id FROM reach
            GROUP BY src HAVING src <> min(dst))
          SELECT s.vec_id FROM surv0 s
          WHERE NOT EXISTS (SELECT 1 FROM dupes d WHERE d.id = s.vec_id)
          ORDER BY vec_id"""))

  /** Streaming SEMANTIC embedding ingestion (StreamOps.semanticIngestSink)
    * against a pre-seeded prebuilt IVF index: corpus = vec_id < 160 built
    * as a 32-cell index, vec_id ≥ 160 streamed as one micro-batch —
    * survivors have no corpus vector at cosine ≥ 0.4 among their nprobe=2
    * probed cells AND are their within-batch semantic cluster's smallest
    * id. The oracle recomputes the corpus centroids and assignment, the
    * batch's probe ranking, the distinct-id hot-cell cap (inactive here,
    * modeled anyway), the batch-derived within-batch cells and the
    * recursive cluster closure. Cross-batch accumulation and restart
    * re-open are spec'd in StreamingSpec. */
  val q_stream_semantic = Q(
    "q_stream_semantic",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val work = java.nio.file.Files.createTempDirectory("graft_sem_sink").toString
      val idx = graft.operators.Similarity.ivfBuild(
        e.filter(col("vec_id") < 160), "vec_id", "embedding",
        nlist = 32, path = s"$work/idx")
      graft.operators.Similarity.writeMeta(s, s"$work/idx", idx)
      val batch = e.filter(col("vec_id") >= 160)
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      val mem = MemoryStream[(Long, Array[Float])](s)
      val q = StreamOps.semanticIngestSink(
        mem.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
        indexDir = s"$work/idx", outDir = s"$work/out",
        checkpoint = s"$work/ckpt", threshold = 0.4, nlist = 32, nprobe = 2,
        trigger = Trigger.ProcessingTime(0))
      try {
        mem.addData(batch.toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      GTable(s.read.parquet(s"$work/out").select("vec_id"))
        .order(GTable.orderKeys(Seq("vec_id")))
        .result
    },
    Some(s"""WITH RECURSIVE v AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings),
          corpus AS (SELECT * FROM v WHERE vec_id < 160),
          cents AS (SELECT vec_id AS cid, e AS ce FROM corpus
            ORDER BY vec_id LIMIT 32),
          asg AS (SELECT c0.vec_id AS id, c0.e,
              (SELECT c.cid FROM cents c
               ORDER BY ${PipelineQueries.cosSql("c0.e", "c.ce")} DESC, c.cid DESC LIMIT 1) AS cid
            FROM corpus c0),
          batch AS (SELECT vec_id AS id, e FROM v WHERE vec_id >= 160),
          probes AS (SELECT b.id AS query_id, b.e AS qe, c.cid,
              row_number() OVER (PARTITION BY b.id
                ORDER BY ${PipelineQueries.cosSql("b.e", "c.ce")} DESC, c.cid DESC) AS pr
            FROM batch b, cents c),
          hotcells AS (SELECT cid FROM asg GROUP BY cid
            HAVING count(DISTINCT id) > ${graft.operators.Dedup.DefaultMaxBucket}),
          xhits AS (SELECT DISTINCT p.query_id AS id
            FROM (SELECT * FROM probes WHERE pr <= 2) p
            JOIN asg a USING (cid)
            WHERE cid NOT IN (SELECT cid FROM hotcells)
              AND ${PipelineQueries.cosSql("p.qe", "a.e")} >= 0.4),
          surv0 AS (SELECT * FROM batch
            WHERE id NOT IN (SELECT id FROM xhits)),
          wcents AS (SELECT id AS cid, e AS ce FROM surv0
            ORDER BY id LIMIT 32),
          wasg AS (SELECT s0.id, s0.e,
              (SELECT c.cid FROM wcents c
               ORDER BY ${PipelineQueries.cosSql("s0.e", "c.ce")} DESC, c.cid DESC LIMIT 1) AS cid
            FROM surv0 s0),
          whot AS (SELECT cid FROM wasg GROUP BY cid
            HAVING count(*) > ${graft.operators.Dedup.DefaultMaxBucket}),
          wasgc AS (SELECT * FROM wasg
            WHERE cid NOT IN (SELECT cid FROM whot)),
          wpairs AS (SELECT a.id AS id1, b.id AS id2
            FROM wasgc a JOIN wasgc b ON a.cid = b.cid AND a.id < b.id
            WHERE ${PipelineQueries.cosSql("a.e", "b.e")} >= 0.4),
          edges AS (SELECT id1 AS a, id2 AS b FROM wpairs
                    UNION SELECT id2, id1 FROM wpairs),
          nodes AS (SELECT DISTINCT a AS id FROM edges),
          reach(src, dst) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a),
          dupes AS (SELECT src AS id FROM reach
            GROUP BY src HAVING src <> min(dst))
          SELECT s0.id AS vec_id FROM surv0 s0
          WHERE NOT EXISTS (SELECT 1 FROM dupes d WHERE d.id = s0.id)
          ORDER BY vec_id"""))

  /** Streaming snapshot maintenance (StreamOps.snapshotSink): three
    * upsert micro-batches — batch c carries doc_id % 3 <= c with even
    * ids' text suffixed " v<c>" — so every status path fires: first-seen
    * keys are `added`, re-sent even keys are `changed`, re-sent odd keys
    * are unchanged and must NOT appear in the delta log. compactFiles = 2
    * forces a mid-run latest-per-key ledger compaction whose answers the
    * oracle adjudicates unchanged. */
  val q_stream_snapshot = Q(
    "q_stream_snapshot",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "text").as[(Long, String)].collect()
      val work = java.nio.file.Files.createTempDirectory("graft_snap_sink").toString
      val mem = MemoryStream[(Long, String)](s)
      val q = StreamOps.snapshotSink(
        mem.toDF.toDF("doc_id", "text"), Seq("doc_id"), Seq("text"),
        stateDir = s"$work/state", deltaDir = s"$work/delta",
        checkpoint = s"$work/ckpt", compactFiles = 2,
        trigger = Trigger.ProcessingTime(0))
      try {
        (0 until 3).foreach { c =>
          val rows = docs.filter(_._1 % 3 <= c).map { case (id, t) =>
            (id, if (id % 2 == 0) s"$t v$c" else t) }
          mem.addData(rows.toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      GTable(s.read.parquet(s"$work/delta")
          .select("doc_id", "status", "_batch"))
        .order(GTable.orderKeys(Seq("_batch", "doc_id")))
        .result
    },
    Some("""SELECT doc_id, status, _batch FROM (
              SELECT doc_id, 'added' AS status, CAST(0 AS BIGINT) AS _batch
              FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id, 'added', 1 FROM documents WHERE doc_id % 3 = 1
              UNION ALL
              SELECT doc_id, 'changed', 1 FROM documents
              WHERE doc_id % 3 = 0 AND doc_id % 2 = 0
              UNION ALL
              SELECT doc_id, 'added', 2 FROM documents WHERE doc_id % 3 = 2
              UNION ALL
              SELECT doc_id, 'changed', 2 FROM documents
              WHERE doc_id % 3 <= 1 AND doc_id % 2 = 0)
            ORDER BY _batch, doc_id"""))

  /** Snapshot.asOf: time-travel read off the snapshotSink delta log —
    * same 3-batch upsert fixture as q_stream_snapshot, reconstructed as
    * of MID-history batch 1 (the interesting version: batch-0 content
    * superseded for even keys, batch-2 keys invisible). The oracle
    * recomputes the expected state from the deterministic feed
    * construction, independent of the log layout. */
  val q_snapshot_asof = Q(
    "q_snapshot_asof",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "text").as[(Long, String)].collect()
      val work = java.nio.file.Files.createTempDirectory("graft_asof").toString
      val mem = MemoryStream[(Long, String)](s)
      val q = StreamOps.snapshotSink(
        mem.toDF.toDF("doc_id", "text"), Seq("doc_id"), Seq("text"),
        stateDir = s"$work/state", deltaDir = s"$work/delta",
        checkpoint = s"$work/ckpt",
        trigger = Trigger.ProcessingTime(0))
      try {
        (0 until 3).foreach { c =>
          val rows = docs.filter(_._1 % 3 <= c).map { case (id, t) =>
            (id, if (id % 2 == 0) s"$t v$c" else t) }
          mem.addData(rows.toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val delta = s.read.parquet(s"$work/delta")
      GTable(graft.operators.Snapshot.asOf(delta, Seq("doc_id"), version = 1),
          denseRid = false)
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN text || ' v1' ELSE text END AS text
          FROM documents WHERE doc_id % 3 <= 1
          ORDER BY doc_id"""))

  /** Served time travel: the delta log mounted as an extra parquet root
    * (the deployment shape — a service pointed at a sink's output) and
    * reconstructed via the GraphQL `snapshotAsOf` field, counts grouped
    * by content-version suffix so the response stays column-shaped. */
  val q_gql_snapshot_asof = Q(
    "q_gql_snapshot_asof",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "text").as[(Long, String)].collect()
      val work = java.nio.file.Files.createTempDirectory("graft_asof_gql").toString
      val mem = MemoryStream[(Long, String)](s)
      val q = StreamOps.snapshotSink(
        mem.toDF.toDF("doc_id", "text"), Seq("doc_id"), Seq("text"),
        stateDir = s"$work/state", deltaDir = s"$work/delta",
        checkpoint = s"$work/ckpt",
        trigger = Trigger.ProcessingTime(0))
      try {
        (0 until 3).foreach { c =>
          val rows = docs.filter(_._1 % 3 <= c).map { case (id, t) =>
            (id, if (id % 2 == 0) s"$t v$c" else t) }
          mem.addData(rows.toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      GqlBridge.frame(s, dir,
        """{ t: deltas {
             a: snapshotAsOf(on: ["doc_id"], version: 1) {
               o: order(by: ["doc_id"]) {
                 c: columns { doc_id { values } text { values } } } } } }""",
        Seq("t", "a", "o", "c"), "doc_id BIGINT, text STRING",
        extra = Map("deltas" -> s"$work/delta"))
    },
    Some("""SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN text || ' v1' ELSE text END AS text
          FROM documents WHERE doc_id % 3 <= 1
          ORDER BY doc_id"""))

  /** Live keyword search: the documents table streams through
    * [[StreamOps.textIndexSink]] in two micro-batches (bootstrap build on
    * batch one, posting append on batch two, compaction mid-run), then the
    * LIVE index answers an AND search — which must equal the oracle's full
    * recompute over the raw table. Crash-replay idempotence and the
    * restart path are spec'd in StreamingSpec. */
  val q_stream_text_search = Q(
    "q_stream_text_search",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val spark2 = s
      import spark2.implicits._
      val d = Tables.load(s, dir, "documents")
      val work = java.nio.file.Files.createTempDirectory("graft_tx_sink").toString
      val batch = d.select("doc_id", "text")
        .as[(Long, String)].collect()
      val (b1, b2) = batch.partition(_._1 % 2 == 0)
      val mem = MemoryStream[(Long, String)](s)
      val q = StreamOps.textIndexSink(
        mem.toDF.toDF("doc_id", "text"), "text", "doc_id",
        indexDir = s"$work/idx", outDir = s"$work/out",
        checkpoint = s"$work/ckpt", buckets = 32, compactFiles = 24,
        trigger = Trigger.ProcessingTime(0))
      try {
        mem.addData(b1.toSeq: _*)
        q.processAllAvailable()
        mem.addData(b2.toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      val idx = graft.operators.Similarity
        .readMeta[graft.operators.TextSearch.TextIndex](s, s"$work/idx")
        .getOrElse(throw new IllegalStateException("sink left no index sidecar"))
      GTable(graft.operators.TextSearch.searchIds(idx, Seq("join", "filter"))
          .withColumnRenamed("id", "doc_id"))
        .order(GTable.orderKeys(Seq("doc_id"))).result
    },
    Some("""SELECT doc_id FROM (
              SELECT doc_id,
                unnest(regexp_split_to_array(lower(text), '\s+')) AS t
              FROM documents)
            WHERE t IN ('join', 'filter')
            GROUP BY doc_id HAVING count(DISTINCT t) = 2
            ORDER BY doc_id"""))

  def all: Seq[Q] = Seq(q_stream_tumbling, q_stream_sliding, q_stream_session, q_stream_join,
    q_stream_dedup, q_stream_micro, q_stream_dedup_incr, q_stream_dedup_neardup,
    q_stream_ann_ingest, q_stream_semantic, q_stream_snapshot,
    q_stream_text_search,
    q_snapshot_asof, q_gql_snapshot_asof)
}
