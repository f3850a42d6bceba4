package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("metadata struct has the typed header schema and stable values") {
    val d = Tables.load(spark, sf, "documents").limit(10)
      .select(col("doc_id"), Multimodal.metadata(Multimodal.packBlob(col("text"))).as("m"))
    val schema = d.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("n_bytes", "format", "width", "height"))
    val twice = d.collect().zip(d.collect())
    assert(twice.forall { case (a, b) => a.toString == b.toString })
  }

  test("resizeMeta caps the long side at maxSide preserving aspect") {
    val d = Tables.load(spark, sf, "documents").limit(50)
      .select(Multimodal.resizeMeta(
        Multimodal.metadata(Multimodal.packBlob(col("text"))), 512).as("r"))
    val rows = d.select(col("r.width"), col("r.height")).collect()
    assert(rows.forall(r => r.getInt(0) <= 512 && r.getInt(1) <= 512))
  }

  test("ImageMeta parses real container headers; PNG/BMP cross-validated by ImageIO") {
    import Multimodal.SyntheticImages
    // cross-validation: the JDK's own decoders fully decode the PNG and BMP
    // builders' output — the fixture bytes are REAL images, not just
    // parser-shaped prefixes
    for ((w, h) <- Seq((37, 23), (512, 1), (1, 800))) {
      val png = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(SyntheticImages.png(w, h)))
      assert(png != null && png.getWidth == w && png.getHeight == h,
        s"ImageIO must decode the synthetic ${w}x$h PNG")
      val bmp = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(SyntheticImages.bmp(w, h)))
      assert(bmp != null && bmp.getWidth == w && bmp.getHeight == h,
        s"ImageIO must decode the synthetic ${w}x$h BMP")
    }
    // expression round-trip for every format at assorted dimensions
    import graft.expressions.ImageMeta
    def dims(b: Array[Byte]): (String, Any, Any) = {
      val r = ImageMeta.parse(b)
      if (r == null) (null, null, null)
      else (if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getInt(2))
    }
    assert(dims(SyntheticImages.png(1920, 1080)) == ("png", 1920, 1080))
    assert(dims(SyntheticImages.gif(65535, 42)) == ("gif", 65535, 42))
    assert(dims(SyntheticImages.jpeg(800, 600)) == ("jpeg", 800, 600))
    assert(dims(SyntheticImages.bmp(3, 9)) == ("bmp", 3, 9))
    // degraded shapes: format tag survives, dimensions go null
    assert(dims(SyntheticImages.jpeg(800, 600).take(20)) == ("jpeg", null, null))
    assert(dims(SyntheticImages.png(8, 8).take(10)) == ("png", null, null))
    assert(dims("plain text".getBytes("UTF-8")) == (null, null, null))
    assert(dims(Array[Byte]()) == (null, null, null))
    // JPEG marker walk must skip APPn/DQT/DHT segments and fill bytes:
    // inject extra 0xFF padding before the SOF marker
    val j = SyntheticImages.jpeg(31, 97)
    val sofAt = j.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val padded = j.take(sofAt) ++ Array[Byte](0xff.toByte, 0xff.toByte) ++ j.drop(sofAt)
    assert(dims(padded) == ("jpeg", 31, 97))
    // WebP: all three chunk flavors, dimension-field boundaries included
    assert(dims(SyntheticImages.webpVp8(320, 240)) == ("webp", 320, 240))
    assert(dims(SyntheticImages.webpVp8(16383, 1)) == ("webp", 16383, 1))
    assert(dims(SyntheticImages.webpVp8l(1, 1)) == ("webp", 1, 1))
    assert(dims(SyntheticImages.webpVp8l(16384, 16384)) == ("webp", 16384, 16384))
    assert(dims(SyntheticImages.webpVp8x(4000, 3000)) == ("webp", 4000, 3000))
    assert(dims(SyntheticImages.webpVp8x(1 << 24, 1)) == ("webp", 1 << 24, 1))
    // truncated RIFF shapes: container recognized, dimensions unreadable
    assert(dims(SyntheticImages.webpVp8(320, 240).take(14)) == ("webp", null, null))
    assert(dims(SyntheticImages.webpVp8(320, 240).take(25)) == ("webp", null, null))
    assert(dims(SyntheticImages.webpVp8l(9, 9).take(21)) == ("webp", null, null))
    // a VP8 chunk with a corrupted sync code is not trusted for dims
    val badSync = SyntheticImages.webpVp8(320, 240)
    badSync(24) = 0x77
    assert(dims(badSync) == ("webp", null, null))
    // RIFF but not WEBP (e.g. a WAV) is NOT an image
    val wav = "RIFF".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0) ++
      "WAVE".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0)
    assert(dims(wav) == (null, null, null))
  }

  test("imageMetadata column survives codegen and an exchange") {
    val spark2 = spark
    import spark2.implicits._
    import Multimodal.SyntheticImages
    val df = Seq(
      ("a", SyntheticImages.png(10, 20)),
      ("b", SyntheticImages.gif(7, 7)),
      ("c", "nope".getBytes("UTF-8")),
      ("d", null.asInstanceOf[Array[Byte]])).toDF("name", "blob")
      .repartition(3)
      .withColumn("m", Multimodal.imageMetadata(spark2, col("blob")))
      .select(col("name"), col("m.format"), col("m.width"), col("m.height"))
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getAs[String](1), if (r.isNullAt(2)) null else r.getInt(2))).toMap
    assert(rows("a") == ("png", 10))
    assert(rows("b") == ("gif", 7))
    assert(rows("c") == (null, null))
    assert(rows("d") == (null, null))
    // SQL registration path
    df.sparkSession.sql("SELECT image_meta(CAST(NULL AS BINARY))").collect()
  }

  test("decodeBatch streams per-partition with correct feature shape") {
    val spark2 = spark
    import spark2.implicits._
    val ds = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Multimodal.packBlob(col("text")).as("blob"))
      .repartition(4)
      .as[Multimodal.MediaRow]
    val out = Multimodal.decodeBatch(ds, k = 3).collect()
    assert(out.length == 500)
    assert(out.forall(_.features.length == 3))
    assert(out.forall(_.features.forall(f => f >= 0f && f < 1f)))
  }
}
