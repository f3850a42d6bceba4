package graft.expressions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.util.sketch.BloomFilter

/** Column-API access to Spark's native codegen'd Bloom-filter membership
  * test ([[BloomFilterMightContain]] — the expression Spark's own
  * InjectRuntimeFilter rule plants for runtime row-level filtering).
  *
  * The filter is embedded as a BINARY LITERAL: literals ride the task
  * binary, which Spark broadcasts once per executor (TorrentBroadcast), so
  * this has the distribution profile of an explicit `sparkContext
  * .broadcast` while staying a plain Catalyst expression — visible to the
  * optimizer (reorderable, pushable) and fully codegen'd, unlike a Scala
  * UDF closure over a broadcast handle which is an opaque per-row boxed
  * call.
  */
object BloomFunctions {

  /** Serialize a sketch BloomFilter for literal embedding. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Membership test of a LONG column against a pre-built filter:
    * deterministic (Spark's Bloom hashing is seedless), no false negatives.
    * The expression deserializes the filter once per task, not per row. */
  def mightContainLong(spark: SparkSession, bf: BloomFilter,
                       value: Column): Column = {
    Registration.ensure(spark, "bloom_might_contain") { exprs =>
      BloomFilterMightContain(exprs(0), exprs(1))
    }
    call_function("bloom_might_contain", lit(serialize(bf)), value)
  }
}
