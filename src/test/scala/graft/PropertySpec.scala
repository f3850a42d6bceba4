package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.core.{GTable, Natural, Tables}
import graft.operators.Sampling

/** Randomized property checks (scalacheck driven directly — no bridge):
  * positional semantics (take/slice) against a collected local reference,
  * and the deterministic-sampling invariants, across arbitrary inputs
  * rather than the fixed examples of the unit specs. */
class PropertySpec extends SparkSpec {

  private def holds(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private lazy val t = GTable(Tables.loadOrdered(spark, sf, "nation"))
  private lazy val naturalIds: Vector[Int] =
    t.df.orderBy(col(Natural.rid)).select("n_nationkey")
      .collect().map(_.getInt(0)).toVector

  test("take(indices) returns exactly the requested positions, in order, with duplicates") {
    val gen = Gen.listOfN(6, Gen.choose(0, naturalIds.length - 1))
    holds(Prop.forAll(gen) { idx =>
      val got = t.take(idx.map(_.toLong)).result
        .select("n_nationkey").collect().map(_.getInt(0)).toSeq
      got == idx.map(naturalIds)
    }, n = 20)
  }

  test("slice(offset, limit) matches local slice semantics incl. negative offsets") {
    val gen = for {
      off <- Gen.choose(-30L, 30L)
      lim <- Gen.option(Gen.choose(0L, 12L))
    } yield (off, lim)
    holds(Prop.forAll(gen) { case (off, lim) =>
      val start = if (off < 0) math.max(0L, naturalIds.length + off) else off
      val local0 = naturalIds.drop(start.toInt)
      val local = lim.fold(local0)(l => local0.take(l.toInt))
      val got = t.slice(off, lim).result
        .select("n_nationkey").collect().map(_.getInt(0)).toVector
      got == local
    }, n = 30)
  }

  test("split is total and respects bucket-space proportions for any weights") {
    val gen = for {
      k <- Gen.choose(1, 4)
      ws <- Gen.listOfN(k, Gen.choose(1, 9))
    } yield ws
    val docs = Tables.load(spark, sf, "documents")
    holds(Prop.forAll(gen) { ws =>
      val shares = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val assigned = docs
        .withColumn("sp", Sampling.split(col("doc_id"), shares))
        .groupBy("sp").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      // total: every row lands in some named share
      assigned.values.sum == docs.count() &&
        assigned.keys.forall(k => shares.exists(_._1 == k))
    }, n = 15)
  }

  test("hashBucket stays within [0, buckets) for any bucket count") {
    val docs = Tables.load(spark, sf, "documents")
    holds(Prop.forAll(Gen.choose(1, 1000)) { b =>
      docs.select(Sampling.hashBucket(col("doc_id"), b).as("bk"))
        .filter(col("bk") < 0 || col("bk") >= b).count() == 0
    }, n = 15)
  }

  test("fused text expressions match composable forms on random adversarial strings") {
    import graft.operators.{Dedup, TextAnalysis}
    import graft.expressions.TextFunctions
    val spark2 = spark
    import spark2.implicits._
    // segments chosen to hit every quirk at once: stopwords of all three
    // languages, unicode, digits, symbol-only, empty strings, and RAW
    // whitespace segments (tab/newline/multi-space) that produce leading/
    // trailing/consecutive separators — the split(-1) empty-token cases
    val seg = Gen.oneOf("the", "a", "of", "el", "de", "der", "in", "fast",
      "123", "#!%", "é", "ñá", "你好", "x", "", " ", "  ", "\t", "\n",
      "Mixed", "WORLD", "the the")
    val strGen = Gen.choose(0, 40).flatMap(k => Gen.listOfN(k, seg)).map(_.mkString)
    val sample = Iterator.continually(strGen.sample).flatten.take(300).toList
    val df = sample.toDF("text")
      .select(col("text"), TextAnalysis.stats(col("text")).as("_st"))
    val pairs: Seq[(String, org.apache.spark.sql.Column)] =
      (for (n <- 1 to 3) yield s"shingles$n" ->
        (TextFunctions.wordShingles(spark, col("text"), n) <=>
          Dedup.shinglesComposable(col("text"), n))) ++
      (for (sp <- Seq(1, 3, 10)) yield s"spans$sp" ->
        (TextFunctions.wordSpans(spark, col("text"), sp) <=>
          Dedup.spansComposable(col("text"), sp))) ++
      Seq(
        "collapse" -> (TextAnalysis.dedupConsecutiveTokens(col("text")) <=>
          TextAnalysis.dedupConsecutiveTokensComposable(col("text"))),
        "lang" -> (TextAnalysis.langIdFrom(col("_st")) <=>
          TextAnalysis.langIdComposable(col("text"))),
        "gopher" -> (TextAnalysis.gopherFilterFrom(col("_st")) <=>
          TextAnalysis.gopherFilterComposable(col("text")))) ++
      TextAnalysis.qualityMetricsFrom(col("_st"))
        .zip(TextAnalysis.qualityMetricsComposable(col("text")))
        .map { case ((n, f), (_, c)) => s"quality:$n" -> (f <=> c) } ++
      TextAnalysis.repetitionMetricsFrom(col("_st"))
        .zip(TextAnalysis.repetitionMetricsComposable(col("text")))
        .map { case ((n, f), (_, c)) => s"rep:$n" -> (f <=> c) } ++
      TextAnalysis.gopherMetricsFrom(col("_st"))
        .zip(TextAnalysis.gopherMetricsComposable(col("text")))
        .map { case ((n, f), (_, c)) => s"gm:$n" -> (f <=> c) }
    val flags = df.select(pairs.map { case (n, c) => c.as(n) }: _*)
    val bad = flags.filter(!pairs.map(p => col(p._1)).reduce(_ && _))
    val badRows = bad.count()
    if (badRows != 0) {
      val row = bad.head()
      val failing = pairs.map(_._1).filter(n => !row.getAs[Boolean](n))
      fail(s"$badRows/300 random strings diverge; failing checks: $failing")
    }
  }
}
