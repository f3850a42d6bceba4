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
