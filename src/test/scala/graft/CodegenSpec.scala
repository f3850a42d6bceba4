package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expressions.{MinHashFunctions, QuantizeFunctions, TextFunctions}

/** Guards the round-6 codegen promotion of the fused expression tier: the
  * text/minhash expressions must not reintroduce a CodegenFallback boundary
  * (which forces per-row InternalRow materialization and boxed interpreted
  * eval on exactly the paths the engine wins on), and their generated code
  * must actually COMPILE — Spark silently falls back to interpreted
  * execution on Janino errors, so a green run with the default config
  * proves nothing about the generated code.
  */
class CodegenSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  private def fusedProjection = docs.select(
    TextFunctions.textStats(spark, col("text")).as("st"),
    TextFunctions.fingerprint(spark, col("text")).as("fp"),
    TextFunctions.simhash(spark, col("text")).as("sh"),
    TextFunctions.wordShingles(spark, col("text"), 3).as("shg"),
    TextFunctions.wordSpans(spark, col("text"), 10).as("sp"),
    TextFunctions.collapseRepeats(spark, col("text")).as("cr"),
    MinHashFunctions.signature(spark, col("text"), 3, 64).as("sig"))

  private def quantProjection = Tables.load(spark, sf, "embeddings").select(
    QuantizeFunctions.quantize(spark, col("embedding")).as("qz"))

  test("fused text/minhash expressions carry no CodegenFallback boundary") {
    for (proj <- Seq(fusedProjection, quantProjection)) {
      val plan = proj.queryExecution.optimizedPlan
      val fallbacks = plan.expressions.flatMap(_.collect {
        case e: CodegenFallback => e
      })
      assert(fallbacks.isEmpty,
        s"CodegenFallback on the fused tier: ${fallbacks.map(_.prettyName)}")
    }
  }

  test("fused projection plans inside a WholeStageCodegen stage") {
    val exec = fusedProjection.queryExecution.executedPlan
    val inWsc = exec.collect { case w: WholeStageCodegenExec => w }
      .exists(_.collect { case p: ProjectExec => p }.nonEmpty)
    assert(inWsc, s"fused projection not inside WholeStageCodegen:\n$exec")
  }

  test("generated code compiles and evaluates (fallback disabled)") {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      // scalar projections only — the gate comparator rule applies to
      // results, not here; this is an execution smoke over every codegen'd
      // expression with compile-failure promotion to a hard error
      // max, not sum, on the 64-bit hash outputs: ANSI long-sum overflows
      val row = fusedProjection.select(
        sum(col("st.n_tokens")), max(col("fp")), max(col("sh")),
        sum(size(col("shg"))), sum(size(col("sp"))),
        sum(length(col("cr"))), max(element_at(col("sig"), 1)))
        .head()
      assert(!row.anyNull)
      val qrow = quantProjection
        .select(sum(col("qz.scale")), sum(size(col("qz.q")))).head()
      assert(!qrow.anyNull)
    } finally spark.conf.set(key, prev)
  }
}
