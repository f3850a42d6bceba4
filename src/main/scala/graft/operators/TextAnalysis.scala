package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-ratio heuristic), quality scoring, token counting, and a
  * deterministic rolling-hash document fingerprint. Pure Column expressions
  * — every one reproducible in ANSI SQL for the oracle.
  */
object TextAnalysis {

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "den", "von", "ist", "mit"))

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val sw = stopwords(lang)
    val toks = tokens(text)
    size(filter(toks, t => t.isInCollection(sw))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Heuristic language ID over the configured stopword sets: highest
    * ratio wins, ties broken by language code order (en > es > de by
    * >= comparisons). */
  def langId(text: Column): Column = {
    val en = stopwordRatio(text, "en")
    val es = stopwordRatio(text, "es")
    val de = stopwordRatio(text, "de")
    when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Quality metrics: char/token counts, mean token length, type-token
    * ratio, stopword ratio, and a composite [0,1] score. */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val meanLen = nChars.cast("double") / greatest(nToks, lit(1))
    val ttr = size(array_distinct(toks)).cast("double") / greatest(nToks, lit(1))
    val swr = stopwordRatio(text, "en")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "mean_tok_len" -> meanLen,
      "type_token_ratio" -> ttr,
      "stopword_ratio" -> swr,
      "quality" -> least(greatest(
        (ttr * 0.5) + (swr * 0.3) +
          (when(nToks >= 50 && nToks <= 1000, 0.2).otherwise(0.0)),
        lit(0.0)), lit(1.0)))
  }

  /** Token counts: whitespace tokens and BPE-ish regex pieces
    * (letter runs / digit runs / single other chars). */
  def tokenCounts(text: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(tokens(text)),
    "bpe_ish_tokens" -> size(call_function("regexp_extract_all",
      lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))

  /** Deterministic rolling-hash fingerprint: outer polynomial fold over
    * tokens, inner fold over character codes — mod 1e9+7 keeps every
    * intermediate exact in a long (ANSI-safe) and is reproducible in SQL.
    * Composable reference form; [[fingerprint]] is the fused compiled
    * expression with bit-identical results (spec-asserted). */
  def fingerprintComposable(text: Column): Column = {
    val toks = tokens(text)
    val tokenKey = (t: Column) => aggregate(
      transform(sequence(lit(1), greatest(length(t), lit(1))),
        i => ascii(substring(t, i, lit(1))).cast("long")),
      lit(7L), (acc, c) => (acc * 131 + c) % 1000000007L)
    aggregate(toks, lit(0L), (acc, t) => (acc * 31 + tokenKey(t)) % 1000000007L)
  }

  /** Fused fingerprint (one compiled pass per doc — the per-character
    * interpreted lambdas of the composable form dominate at scale). */
  def fingerprint(text: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.expressions.TextFunctions.fingerprint(spark, text)
  }

  /** CCNet-style LM quality score: per-document mean unigram
    * log-probability under the corpus's OWN unigram distribution (documents
    * of improbable tokens — boilerplate, gibberish, wrong-language — score
    * low and get filtered). Two passes: corpus token counts (map-side
    * combinable groupBy) with the total collected as one driver scalar,
    * then a broadcast join of the vocab onto the exploded tokens and a
    * per-doc mean of ln p(token). At 100 TB the vocab frame is the only
    * broadcast state and the doc-level mean is a map-side-combinable
    * aggregation — no row-scale shuffle beyond the token join. */
  def unigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as(idCol),
      explode(tokens(col(textCol))).as("_gq_t"))
    val vocab = toks.groupBy("_gq_t").agg(count(lit(1)).as("_gq_c"))
    // sum() over an empty vocab is SQL NULL — an empty corpus must yield an
    // empty result, not a driver NullPointerException
    val total = Option(vocab.agg(sum(col("_gq_c"))).collect()(0).get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    toks.join(broadcast(vocab), Seq("_gq_t"))
      .groupBy(idCol)
      .agg(avg(log(col("_gq_c").cast("double") / total)).as("logprob"))
  }
}
