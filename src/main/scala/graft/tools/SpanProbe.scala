package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Measures dedupSpans' reassembly volume — the round-11 verdict's lead
  * efficiency item: the old shape exploded EVERY document into spans and
  * collect_list-regrouped the whole corpus (and whitespace-normalized every
  * survivor) even though most documents lose no span. The round-12 split
  * routes span-clean docs around the text-carrying explode/regroup verbatim,
  * the same semi-join split dedupSubstrings took in round 11.
  *
  * Prints PROBE rows:
  *   docs total / cut docs (docs losing ≥1 span to an earlier occurrence)
  *   spans total (old regroup input) / spans in cut docs (new input)
  *   wall time: split dedupSpans vs the old corpus-wide shape
  *
  * Args: <sf dir> [span] [reps].
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val span = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sf/documents.parquet")

    // volume accounting: the occurrence/loser construction mirrored once
    val occ = d.select(col("doc_id").as("id"),
        posexplode(Dedup.spans(spark, col("text"), span)).as(Seq("pos", "sp")))
      .select(col("id"), col("pos"), xxhash64(lower(col("sp"))).as("h"))
    val firsts = occ.groupBy("h")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
      .select(col("f.id").as("id"), col("f.pos").as("pos"))
    val cutIds = occ.select("id", "pos")
      .join(firsts, Seq("id", "pos"), "left_anti")
      .select("id").distinct()
    val spanCounts = d.select(col("doc_id").as("id"),
      size(Dedup.spans(spark, col("text"), span)).cast("long").as("nsp"))
    val total = spanCounts.agg(count(lit(1)), sum(col("nsp"))).head()
    val cut = spanCounts.join(cutIds, Seq("id"), "left_semi")
      .agg(count(lit(1)), coalesce(sum(col("nsp")), lit(0L))).head()
    println(s"PROBE docs total=${total.getLong(0)} cut=${cut.getLong(0)}")
    println(s"PROBE regroup_spans old=${total.getLong(1)} " +
      s"new=${cut.getLong(1)} " +
      f"ratio=${cut.getLong(1).toDouble / total.getLong(1)}%.4f")

    // the old corpus-wide shape (pre-round-12 dedupSpans), inlined for the
    // timing comparison: every doc explodes WITH text and regroups
    def oldShape: org.apache.spark.sql.DataFrame = {
      val ex = d.select(col("doc_id").as("id"),
        posexplode(Dedup.spans(spark, col("text"), span)).as(Seq("pos", "sp")))
      val f = ex
        .select(xxhash64(lower(col("sp"))).as("h"), col("id"), col("pos"))
        .groupBy("h").agg(min(struct(col("id"), col("pos"))).as("f"))
        .select(col("f.id").as("id"), col("f.pos").as("pos"))
      ex.join(f, Seq("id", "pos"), "left_semi")
        .groupBy("id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("sp")))),
            x => x.getField("sp")), " ").as("text"))
    }

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-6s best=${secs.min}%.2f s runs=" +
        secs.map(s => f"$s%.2f").mkString(","))
    }
    time("split")(Dedup.dedupSpans(d, "text", "doc_id", span))
    time("old")(oldShape)
    spark.stop()
  }
}
