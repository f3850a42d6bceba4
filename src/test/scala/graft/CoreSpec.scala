package graft

import org.apache.spark.sql.functions._
import graft.core.{GTable, Natural, Tables}

class CoreSpec extends SparkSpec {

  test("natural row id is stable, contiguous, 0-based") {
    val df = Tables.loadOrdered(spark, sf, "region")
    val ids = df.select(Natural.rid).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until ids.length))
  }

  test("slice / rowAt observe natural order") {
    val t = GTable(Tables.loadOrdered(spark, sf, "nation"))
    val sliced = t.slice(2, Some(3)).result.collect()
    assert(sliced.length == 3)
    val all = t.slice(0, None).result.collect()
    assert(sliced.map(_.getInt(0)).toSeq == all.slice(2, 5).map(_.getInt(0)).toSeq)
    assert(t.rowAt(-1).result.count() == 1)
  }

  test("deep slice on a sparse rid dispatches densify; answers match the gather path") {
    val li = GTable(Tables.loadOrdered(spark, sf, "lineitem"))
      .filter(col("l_quantity") > 25)
    def run(): Seq[(Long, Int)] = li.slice(500, Some(50)).result
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val shallow = run() // default knob: Offset+Limit gather
    val prev = spark.conf.getOption("spark.graft.slice.densifyOffset")
    spark.conf.set("spark.graft.slice.densifyOffset", "100")
    val deep = try run() finally prev match {
      case Some(v) => spark.conf.set("spark.graft.slice.densifyOffset", v)
      case None => spark.conf.unset("spark.graft.slice.densifyOffset")
    }
    assert(deep == shallow, "densify slice path diverged from the gather path")
    assert(deep.size == 50)
  }

  test("q1_agg returns grouped rows with expected columns") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc", "count_order"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // group counts sum back to the filtered row count
    val li = Tables.load(spark, sf, "lineitem")
    val expected = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum == expected)
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("take of no indices returns an empty table on dense, sorted and filtered paths") {
    val t = GTable(Tables.loadOrdered(spark, sf, "nation"))
    assert(t.take(Seq()).result.count() == 0)
    // sorted / filtered tables go through the non-dense path (indices.max
    // used to throw on an empty request)
    assert(t.order(GTable.orderKeys(Seq("n_name"))).take(Seq()).result.count() == 0)
    assert(t.filter(col("n_regionkey") === 2).take(Seq()).result.count() == 0)
  }
}
