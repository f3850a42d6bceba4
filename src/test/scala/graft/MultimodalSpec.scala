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
