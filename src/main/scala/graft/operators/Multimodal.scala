package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample are modeled two ways:
  *
  *  1. Column-expression path for metadata-level ops (sizes, slicing,
  *     sampling) — stays inside whole-stage codegen;
  *  2. a typed `mapPartitions` batch path (the Scala analog of PySpark's
  *     mapInPandas) for the per-item decoder, with per-partition decoder
  *     init — the pattern a real codec (ffmpeg/imageio JNI) needs.
  *
  * DECODE IS STUBBED: this container has no image/audio libraries, so
  * [[FakeDecoder]] produces a deterministic fake. The Spark-side plumbing —
  * schema, batch shape, partitioning, per-partition resource lifecycle — is
  * real and tested.
  */
object Multimodal {

  /** Pack a string column into the opaque media blob (stand-in for real
    * image/audio bytes in the synthetic corpus). */
  def packBlob(text: Column): Column = encode(text, "UTF-8")

  /** Typed media metadata derived deterministically from the blob: the
    * schema a real decoder would fill from the container header. Fields
    * derive from md5 hex slices (not xxhash64) so the synthetic header is
    * reproducible in any engine with md5 — the correctness oracle recomputes
    * the same fold relationally. Slices stay ≤ 15 hex digits (60 bits), so
    * the conv() result fits a signed long exactly. */
  def metadata(blob: Column): Column = {
    def slice(from: Int, len: Int): Column = Hashing.md5Long(blob, from, len)
    struct(
      octet_length(blob).as("n_bytes"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (slice(1, 15) % 3 + 1).cast("int")).as("format"),
      (slice(16, 8) % 1920 + 1).cast("int").as("width"),
      (slice(24, 8) % 1080 + 1).cast("int").as("height"))
  }

  /** STUB feature extraction as pure expressions: k pseudo-features from
    * seeded blob hashes in [0,1). A real image model would replace this with
    * the mapPartitions path below. */
  def fakeFeatures(blob: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      (pmod(xxhash64(blob, i), lit(1000000L)).cast("double") / 1000000.0)
        .cast("float"))

  /** Frame sampling: n byte-range "frames" of `frameLen` every `stride`
    * bytes — the real slicing plumbing of video frame extraction (the codec
    * boundary is the only stubbed part). Short blobs yield fewer frames. */
  def frameSample(blob: Column, n: Int, stride: Int, frameLen: Int): Column =
    filter(
      transform(sequence(lit(0), lit(n - 1)), i =>
        substr(blob, (i * stride + 1).cast("int"), lit(frameLen))),
      f => octet_length(f) > 0)

  /** "Resize": metadata-level transform preserving aspect ratio — the shape
    * a real resize kernel (mapPartitions) would update after re-encoding.
    * Scaled dims use exact integer half-up arithmetic, (d*maxSide + m/2)/m,
    * rather than FP round(): Spark rounds half-up and other engines half-even,
    * so an FP formulation could not be verified cross-engine. The long side
    * lands on exactly maxSide. */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast("long")
    val h = meta.getField("height").cast("long")
    val m = greatest(w, h)
    def scaled(d: Column): Column =
      floor((d * maxSide + (m / 2).cast("long")) / m.cast("double")).cast("int")
    struct(meta.getField("n_bytes").as("n_bytes"), meta.getField("format").as("format"),
      when(m <= maxSide, w.cast("int")).otherwise(scaled(w)).as("width"),
      when(m <= maxSide, h.cast("int")).otherwise(scaled(h)).as("height"))
  }

  /** REAL byte-format header parsing (round-9 verdict #3): JPEG/PNG/GIF/
    * BMP/WebP container headers parsed by the fused [[graft.expressions.ImageMeta]]
    * expression — struct(format, width, height), null for non-image bytes.
    * This replaces the md5-derived stand-in for any column holding actual
    * encoded images; [[metadata]] stays as the deterministic fake for the
    * synthetic text corpus. */
  def imageMetadata(spark: org.apache.spark.sql.SparkSession,
                    blob: Column): Column =
    graft.expressions.MediaFunctions.imageMeta(spark, blob)

  // ─── typed batch path (mapInPandas analog) ───

  final case class MediaRow(doc_id: Long, blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  /** STUB for a native decoder handle: deterministic byte-fold features.
    * The open()/close() lifecycle is what a JNI codec needs per partition. */
  final class FakeDecoder private () {
    def decode(blob: Array[Byte], k: Int): Array[Float] = {
      val out = new Array[Float](k)
      var i = 0
      while (i < k) {
        var acc = 7L + i
        var j = 0
        while (j < blob.length) { acc = (acc * 131 + (blob(j) & 0xff)) % 1000000007L; j += 1 }
        out(i) = (acc % 1000000L).toFloat / 1000000.0f
        i += 1
      }
      out
    }
    def close(): Unit = ()
  }
  object FakeDecoder { def open(): FakeDecoder = new FakeDecoder() }

  /** Programmatic REAL encoded images for fixtures and specs — each builder
    * emits spec-conformant bytes of the named container format (PNG with
    * CRC-correct chunks and a genuine zlib IDAT; GIF89a with a logical
    * screen descriptor and a minimal LZW image block; BMP with a full
    * BITMAPINFOHEADER and padded pixel rows; JPEG as a structurally valid
    * JFIF marker stream). Public byte-format knowledge only; dimensions are
    * parameters so gates can assert TRUE width/height round-trips through
    * [[graft.expressions.ImageMeta]]. */
  object SyntheticImages {
    private def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    /** Fully valid 8-bit grayscale PNG: signature, CRC'd IHDR, one zlib
      * IDAT of zero-filled filtered scanlines, IEND. */
    def png(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0)
      def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
        val crc = new java.util.zip.CRC32
        val t = tpe.getBytes("US-ASCII")
        crc.update(t); crc.update(data)
        be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
      }
      val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](8, 0, 0, 0, 0) // depth 8, grayscale, deflate, none, none
      val raw = new Array[Byte]((w + 1) * h) // filter byte 0 + w gray bytes/row
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = deflater.deflate(buf); deflater.end()
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
        chunk("IEND", Array.empty[Byte])
    }

    /** GIF89a: header + logical screen descriptor (w, h, no GCT) + a 1×1
      * image block with the canonical minimal LZW payload + trailer. */
    def gif(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff)
      "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
        Array[Byte](0x00, 0x00, 0x00) ++ // no GCT, bg 0, no aspect
        Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++ le16(1) ++ le16(1) ++
        Array[Byte](0x00, 0x02, 0x02, 0x44, 0x01, 0x00, 0x3b)
    }

    /** BMP: BITMAPFILEHEADER + BITMAPINFOHEADER + 24-bit zero pixels with
      * 4-byte row padding. */
    def bmp(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0)
      val rowBytes = (w * 3 + 3) / 4 * 4
      val pixels = rowBytes * h
      "BM".getBytes("US-ASCII") ++ le32(54L + pixels) ++ le32(0L) ++ le32(54L) ++
        le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
        le32(0L) ++ le32(pixels.toLong) ++ le32(2835L) ++ le32(2835L) ++
        le32(0L) ++ le32(0L) ++ new Array[Byte](pixels)
    }

    private def le24(v: Int) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
    private def riff(fourCC: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(4L + 8L + payload.length) ++
        "WEBP".getBytes("US-ASCII") ++ fourCC.getBytes("US-ASCII") ++
        le32(payload.length.toLong) ++ payload

    /** WebP lossy: RIFF/WEBP container, "VP8 " chunk — 3-byte frame tag,
      * the 9D 01 2A sync code, then 14-bit little-endian dimensions. */
    def webpVp8(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && w <= 0x3fff && h > 0 && h <= 0x3fff)
      riff("VP8 ", Array[Byte](0x00, 0x00, 0x00,
        0x9d.toByte, 0x01, 0x2a) ++ le16(w) ++ le16(h))
    }

    /** WebP lossless: "VP8L" chunk — 0x2F signature then width-1/height-1
      * as back-to-back 14-bit fields of a little-endian 32-bit pack. */
    def webpVp8l(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && w <= 0x4000 && h > 0 && h <= 0x4000)
      val bits = ((w - 1) & 0x3fff).toLong | (((h - 1) & 0x3fff).toLong << 14)
      riff("VP8L", Array[Byte](0x2f) ++ le32(bits))
    }

    /** WebP extended: "VP8X" chunk — flags + reserved, then 24-bit
      * little-endian canvas width-1 / height-1. */
    def webpVp8x(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && w <= 0x1000000 && h > 0 && h <= 0x1000000)
      riff("VP8X", Array[Byte](0x00, 0x00, 0x00, 0x00) ++
        le24(w - 1) ++ le24(h - 1))
    }

    /** JPEG/JFIF marker stream: SOI, APP0, DQT, baseline SOF0 carrying the
      * dimensions, DHT, SOS, two entropy bytes, EOI. */
    def jpeg(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff)
      val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x10,
        'J', 'F', 'I', 'F', 0x00, 0x01, 0x01, 0x00,
        0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
      val dqt = Array[Byte](0xff.toByte, 0xdb.toByte, 0x00, 0x43, 0x00) ++
        Array.fill[Byte](64)(0x10)
      val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x0b, 0x08) ++
        be16(h) ++ be16(w) ++ Array[Byte](0x01, 0x01, 0x11, 0x00)
      val dht = Array[Byte](0xff.toByte, 0xc4.toByte, 0x00, 0x14, 0x00) ++
        Array.fill[Byte](15)(0x00) ++ Array[Byte](0x01, 0x00)
      val sos = Array[Byte](0xff.toByte, 0xda.toByte, 0x00, 0x08, 0x01,
        0x01, 0x00, 0x00, 0x3f, 0x00, 0x7f, 0x00)
      val eoi = Array[Byte](0xff.toByte, 0xd9.toByte)
      soi ++ app0 ++ dqt ++ sof0 ++ dht ++ sos ++ eoi
    }
  }

  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Batched decode: one decoder per partition (expensive-init pattern),
    * streaming iterator — constant memory per partition regardless of
    * partition size. This is where a real `mapInPandas`/Arrow batch decode
    * would live. */
  def decodeBatch(ds: Dataset[MediaRow], k: Int): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      val decoder = FakeDecoder.open()
      new Iterator[MediaFeatures] {
        def hasNext: Boolean = { val h = rows.hasNext; if (!h) decoder.close(); h }
        def next(): MediaFeatures = {
          val r = rows.next()
          MediaFeatures(r.doc_id, r.blob.length, decoder.decode(r.blob, k))
        }
      }
    }
}
