package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Measures dedupSubstrings' reassembly volume — the round-10 verdict's
  * lead efficiency item: the old shape exploded the ENTIRE corpus to one
  * row per token and collect_list-regrouped it even though most documents
  * have no cut ranges. The round-11 split routes cut-free docs around the
  * explode/window/regroup verbatim.
  *
  * Prints PROBE rows:
  *   docs total / cut docs (docs with ≥1 duplicated window)
  *   tokens total (old reassembly input) / tokens in cut docs (new input)
  *   wall time: split dedupSubstrings vs the old corpus-wide shape
  *
  * Args: <sf dir> [window] [reps].
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val w = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sf/documents.parquet")

    // volume accounting: the occurrence/cut construction mirrored once
    val occ = d.select(col("doc_id").as("id"),
      posexplode(graft.expressions.TextFunctions.wordWindowHashes(
        spark, col("text"), w)).as(Seq("p", "h")))
    val firsts = occ.groupBy("h")
      .agg(min(struct(col("id"), col("p"))).as("f"))
      .select(col("f.id").as("id"), col("f.p").as("p"))
    val cutIds = occ.select("id", "p")
      .join(firsts, Seq("id", "p"), "left_anti")
      .select("id").distinct()
    val tokCounts = d.select(col("doc_id").as("id"),
      size(split(col("text"), "\\s+", -1)).cast("long").as("ntok"))
    val total = tokCounts.agg(count(lit(1)), sum(col("ntok"))).head()
    val cut = tokCounts.join(cutIds, Seq("id"), "left_semi")
      .agg(count(lit(1)), sum(col("ntok"))).head()
    println(s"PROBE docs total=${total.getLong(0)} cut=${cut.getLong(0)}")
    println(s"PROBE reassembly_tokens old=${total.getLong(1)} " +
      s"new=${cut.getLong(1)} " +
      f"ratio=${cut.getLong(1).toDouble / total.getLong(1)}%.4f")

    // the old corpus-wide shape, inlined for the timing comparison
    def oldShape: org.apache.spark.sql.DataFrame = {
      val dups = occ.select("id", "p").join(firsts, Seq("id", "p"), "left_anti")
      val toks = d.select(col("doc_id").as("id"),
        posexplode(split(col("text"), "\\s+", -1)).as(Seq("pos", "tok")))
      val marks = dups.select(col("id"), col("p").cast("long").as("pos"),
        lit(0).as("kind"), (col("p") + w).cast("long").as("end"),
        lit(null).cast("string").as("tok"))
      val tokRows = toks.select(col("id"), col("pos").cast("long").as("pos"),
        lit(1).as("kind"), lit(null).cast("long").as("end"), col("tok"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("pos"), col("kind"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      marks.union(tokRows)
        .withColumn("_cut_end", max(col("end")).over(wDoc))
        .filter(col("kind") === 1 &&
          (col("_cut_end").isNull || col("_cut_end") <= col("pos")))
        .groupBy("id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("text"))
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
    val split0 = Dedup.substrSplitCount.get
    val dense0 = Dedup.substrDenseCount.get
    // auto = the production default (cut-ratio dispatch, round 12);
    // split = routing forced (threshold 2 disables the probe);
    // old   = the pre-round-11 corpus-wide shape
    time("auto")(Dedup.dedupSubstrings(d, "text", "doc_id", w))
    time("split")(Dedup.dedupSubstrings(d, "text", "doc_id", w,
      denseCutRatio = 2.0))
    time("old")(oldShape)
    println(s"PROBE dispatch split=${Dedup.substrSplitCount.get - split0} " +
      s"dense=${Dedup.substrDenseCount.get - dense0}")
    spark.stop()
  }
}
