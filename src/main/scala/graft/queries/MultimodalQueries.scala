package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GTable, Tables}
import graft.operators.Multimodal

/** Multimodal plumbing queries: blob packing, typed metadata, frame
  * sampling, and the typed mapPartitions decode path.
  */
object MultimodalQueries {

  /** Blob + frame-sampling plumbing; frame geometry is pure arithmetic on
    * byte lengths, so the oracle recomputes it relationally. */
  val q_media_frames = Q(
    "q_media_frames",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.project("blob" -> Multimodal.packBlob(col("text")))
        .project(
          "n_bytes" -> octet_length(col("blob")),
          "frames" -> Multimodal.frameSample(col("blob"), n = 4, stride = 256, frameLen = 64))
        .project(
          "n_frames" -> size(col("frames")),
          // serialized for the gate: array cells are unhashable in the
          // driver's comparator, a joined string proves the same geometry
          "frame_lens" -> array_join(
            transform(col("frames"), f => octet_length(f).cast("string")), ","))
        .select("doc_id", "n_bytes", "n_frames", "frame_lens")
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""WITH t AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
            f AS (SELECT doc_id, n_bytes,
              list_filter(list_transform(range(0, 4),
                i -> least(64, greatest(n_bytes - i * 256, 0))), x -> x > 0) AS fl
              FROM t)
            SELECT doc_id, CAST(n_bytes AS INTEGER) AS n_bytes,
              CAST(len(fl) AS INTEGER) AS n_frames,
              array_to_string(CAST(fl AS INTEGER[]), ',') AS frame_lens
            FROM f ORDER BY doc_id"""))

  /** Typed mapPartitions decode path (per-partition decoder lifecycle);
    * the stub decoder's byte-fold is reproduced relationally in the oracle
    * (ASCII corpus → char codes = bytes). */
  val q_media_features = Q(
    "q_media_features",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val rows = Tables.load(s, dir, "documents")
        .select(col("doc_id"), Multimodal.packBlob(col("text")).as("blob"))
        .as[Multimodal.MediaRow]
      // feature vector unpacked to scalar columns for the gate (array cells
      // are unhashable in the driver's comparator); k=2 features -> f0, f1
      GTable(Multimodal.decodeBatch(rows, k = 2).toDF())
        .project("f0" -> col("features")(0), "f1" -> col("features")(1))
        .select("doc_id", "n_bytes", "f0", "f1")
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""WITH t AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
            f AS (SELECT doc_id, nb,
              list_transform(range(0, 2), feat ->
                CAST(CAST(list_reduce(list_prepend(CAST(7 + feat AS BIGINT),
                  list_transform(range(1, CAST(nb AS INTEGER) + 1),
                    j -> CAST(ascii(substr(text, CAST(j AS INTEGER), 1)) AS BIGINT))),
                  (acc, b) -> (acc * 131 + b) % 1000000007) % 1000000
                  AS DOUBLE) / 1000000.0 AS FLOAT)) AS features
              FROM t)
            SELECT doc_id, CAST(nb AS INTEGER) AS n_bytes,
              features[1] AS f0, features[2] AS f1
            FROM f ORDER BY doc_id"""))

  /** Metadata struct + resize transform: the md5-derived fake header fields
    * and the exact integer half-up resize are both recomputed relationally
    * in the oracle (hex digits folded to ints with list_reduce; the corpus
    * is ASCII so DuckDB's md5(VARCHAR) sees the same bytes as Spark's
    * md5(BINARY)). Struct fields are unpacked to scalar columns for the
    * gate's comparator. */
  val q_media_meta = Q(
    "q_media_meta",
    (s, dir) => {
      val d = GTable(Tables.load(s, dir, "documents"))
      d.project("blob" -> Multimodal.packBlob(col("text")))
        .project("meta" -> Multimodal.metadata(col("blob")))
        .project("resized" -> Multimodal.resizeMeta(col("meta"), maxSide = 512))
        .project(
          "n_bytes" -> col("meta.n_bytes"),
          "format" -> col("meta.format"),
          "width" -> col("meta.width"),
          "height" -> col("meta.height"),
          "r_width" -> col("resized.width"),
          "r_height" -> col("resized.height"))
        .select("doc_id", "n_bytes", "format", "width", "height",
          "r_width", "r_height")
        .order(GTable.orderKeys(Seq("doc_id")))
        .result
    },
    Some("""WITH h AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
              md5(text) AS hex FROM documents),
            m AS (SELECT doc_id, n_bytes,
              list_reduce(list_transform(range(1, 16), i ->
                CAST(strpos('0123456789abcdef', substr(hex, CAST(i AS INT), 1)) - 1
                  AS BIGINT)), (a, b) -> a * 16 + b) AS h1,
              list_reduce(list_transform(range(16, 24), i ->
                CAST(strpos('0123456789abcdef', substr(hex, CAST(i AS INT), 1)) - 1
                  AS BIGINT)), (a, b) -> a * 16 + b) AS h2,
              list_reduce(list_transform(range(24, 32), i ->
                CAST(strpos('0123456789abcdef', substr(hex, CAST(i AS INT), 1)) - 1
                  AS BIGINT)), (a, b) -> a * 16 + b) AS h3
              FROM h),
            d AS (SELECT doc_id, CAST(n_bytes AS INTEGER) AS n_bytes,
              (['jpeg', 'png', 'webp'])[CAST(h1 % 3 + 1 AS INTEGER)] AS format,
              h2 % 1920 + 1 AS width, h3 % 1080 + 1 AS height FROM m),
            r AS (SELECT *, greatest(width, height) AS m FROM d)
            SELECT doc_id, n_bytes, format,
              CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
              CAST(CASE WHEN m <= 512 THEN width
                ELSE (width * 512 + m // 2) // m END AS INTEGER) AS r_width,
              CAST(CASE WHEN m <= 512 THEN height
                ELSE (height * 512 + m // 2) // m END AS INTEGER) AS r_height
            FROM r ORDER BY doc_id"""))

  /** Shared fixture set: spec-conformant bytes of every supported format
    * plus the degraded shapes; used by the library gate AND the served
    * twin (q_gql_imagemeta writes them to a parquet root). */
  private[graft] def imageFixtures: Seq[(String, Array[Byte])] = {
    import Multimodal.SyntheticImages
    Seq(
      "png_37x23" -> SyntheticImages.png(37, 23),
      "png_1920x1080" -> SyntheticImages.png(1920, 1080),
      "gif_640x480" -> SyntheticImages.gif(640, 480),
      "gif_65535x1" -> SyntheticImages.gif(65535, 1),
      "jpeg_800x600" -> SyntheticImages.jpeg(800, 600),
      "jpeg_31x97" -> SyntheticImages.jpeg(31, 97),
      "bmp_5x7" -> SyntheticImages.bmp(5, 7),
      "webp_vp8_320x240" -> SyntheticImages.webpVp8(320, 240),
      "webp_vp8l_2x3" -> SyntheticImages.webpVp8l(2, 3),
      "webp_vp8x_4000x3000" -> SyntheticImages.webpVp8x(4000, 3000),
      "webp_truncated" -> SyntheticImages.webpVp8(320, 240).take(14),
      "jpeg_truncated" -> SyntheticImages.jpeg(800, 600).take(20),
      "not_an_image" -> "hello world, plain bytes".getBytes("UTF-8"))
  }

  /** Publish the fixtures as a parquet root (atomic-rename, idempotent) —
    * the served twin's extra root. Versioned by content so a fixture
    * change regenerates. */
  private[graft] def imageFixturePath(s: org.apache.spark.sql.SparkSession): String = {
    import s.implicits._
    val fx = imageFixtures
    val ver = java.util.Arrays.hashCode(
      fx.flatMap(x => x._1.getBytes("UTF-8") ++ x._2).toArray).toHexString
    val path = s"/tmp/graft_imgfx_$ver"
    if (!new java.io.File(path).exists()) {
      val tmp = path + s".tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}"
      fx.toDF("name", "blob").coalesce(1).write.mode("overwrite").parquet(tmp)
      if (!new java.io.File(tmp).renameTo(new java.io.File(path))) {
        val p = new org.apache.hadoop.fs.Path(tmp)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
    path
  }

  /** REAL byte-format header parsing (round-9 verdict #3; WebP added in
    * round 11): spec-conformant PNG/GIF/JPEG/BMP/WebP (VP8 lossy, VP8L
    * lossless, VP8X extended) bytes built by [[Multimodal.SyntheticImages]] flow
    * through a real exchange and the fused ImageMeta expression; the gate
    * asserts TRUE widths/heights/format tags plus the degraded shapes — a
    * truncated JPEG keeps its format tag with null dimensions, non-image
    * bytes parse to a null struct. Oracle = the expected constants (the
    * dimensions are the builders' parameters). */
  val q_media_imagemeta = Q(
    "q_media_imagemeta",
    (s, dir) => {
      import s.implicits._
      val df = imageFixtures.toDF("name", "blob")
        .repartition(4) // the expression must survive a real exchange
      GTable(df.withColumn("meta", Multimodal.imageMetadata(s, col("blob")))
        .select(col("name"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height")))
        .order(GTable.orderKeys(Seq("name")))
        .result
    },
    Some("""SELECT * FROM (VALUES
            ('bmp_5x7', 'bmp', 5, 7),
            ('gif_640x480', 'gif', 640, 480),
            ('gif_65535x1', 'gif', 65535, 1),
            ('jpeg_31x97', 'jpeg', 31, 97),
            ('jpeg_800x600', 'jpeg', 800, 600),
            ('jpeg_truncated', 'jpeg', NULL, NULL),
            ('not_an_image', NULL, NULL, NULL),
            ('png_1920x1080', 'png', 1920, 1080),
            ('png_37x23', 'png', 37, 23),
            ('webp_vp8_320x240', 'webp', 320, 240),
            ('webp_vp8l_2x3', 'webp', 2, 3),
            ('webp_vp8x_4000x3000', 'webp', 4000, 3000),
            ('webp_truncated', 'webp', NULL, NULL))
            AS t(name, format, width, height) ORDER BY name"""))

  def all: Seq[Q] = Seq(q_media_frames, q_media_features, q_media_meta,
    q_media_imagemeta)
}
