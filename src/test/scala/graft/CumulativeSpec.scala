package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GTable, Natural, Tables}

class CumulativeSpec extends SparkSpec {

  test("distributed cumulative sum/max equal the global window") {
    val e = GTable(Tables.loadOrdered(spark, sf, "events"))
    val w = Window.orderBy(col(Natural.rid))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val serial = e.df
      .withColumn("cs", sum(col("value")).over(w))
      .withColumn("cm", max(col("value")).over(w))
      .select("event_id", "cs", "cm")
      .orderBy("event_id").collect()
    val dist = e
      .cumulative(col("value"), "cs", sum, _ + _, blockSize = 128)
      .cumulative(col("value"), "cm", max, (a, b) => greatest(a, b), blockSize = 128)
      .result.select("event_id", "cs", "cm")
      .orderBy("event_id").collect()
    // FP sum association differs at block boundaries — compare at 1e-9
    serial.zip(dist).foreach { case (s, d) =>
      assert(s.getLong(0) == d.getLong(0))
      assert(math.abs(s.getDouble(1) - d.getDouble(1)) < 1e-6)
      assert(s.getDouble(2) == d.getDouble(2))
    }
  }
}
