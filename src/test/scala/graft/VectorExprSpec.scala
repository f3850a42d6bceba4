package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expressions.VectorFunctions
import graft.operators.Similarity

class VectorExprSpec extends SparkSpec {

  test("FloatVectorDot is bit-identical to the composable fold") {
    val e = Tables.load(spark, sf, "embeddings").limit(100)
    val both = e.select(
      Similarity.dot(col("embedding"), col("embedding")).as("fold"),
      VectorFunctions.dot(spark, col("embedding"), col("embedding")).as("native"))
      .collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1))) // exact, no epsilon
  }

  test("vec_dot callable from SQL after registration") {
    VectorFunctions.register(spark)
    Tables.load(spark, sf, "embeddings").limit(5).createOrReplaceTempView("emb5")
    val r = spark.sql("SELECT vec_dot(embedding, embedding) d FROM emb5").collect()
    assert(r.forall(_.getDouble(0) >= 0.0))
  }

  test("codegen path active (no fallback exception) on wide scan") {
    val e = Tables.load(spark, sf, "embeddings")
    val n = e.select(VectorFunctions.dot(spark, col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0).count()
    assert(n > 0)
  }
}
