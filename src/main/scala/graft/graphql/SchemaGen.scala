package graft.graphql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.core.Tables

/** SDL derivation from table schemas (reference: middleware.py:104-141 —
  * schema generated from the source, never declared; invalid field names
  * are skipped with a warning, scalars mapped per §1.2).
  */
object SchemaGen {

  /** §1.2 scalar mapping (reference scalars.py:59-87). */
  def scalarOf(dt: DataType): String = dt match {
    case BooleanType => "Boolean"
    case LongType => "BigInt"
    case _: IntegerType | ShortType | ByteType => "Int"
    case FloatType | DoubleType => "Float"
    case _: DecimalType => "Decimal"
    case DateType => "Date"
    case TimestampType | TimestampNTZType => "DateTime"
    case _: DayTimeIntervalType | _: YearMonthIntervalType => "Duration"
    case BinaryType => "Base64"
    case StringType => "String"
    case ArrayType(e, _) => s"[${scalarOf(e)}]"
    case _: StructType => "JSON"
    case other => "String"
  }

  private val validName = "^[_A-Za-z][_A-Za-z0-9]*$".r
  private val reserved = Set("query", "mutation", "subscription", "type",
    "schema", "on", "fragment")

  /** GraphQL-legal fields only: invalid identifiers are warned and skipped,
    * not fatal (reference scalars.py:96-99). */
  def typeFields(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        // map columns: warn-and-drop from the reflected schema, matching
        // the reference (tests/test_core.py:39-41) — GraphQL has no map
        // scalar and the reference skips them the same way
        case _: MapType =>
          System.err.println(s"[schema] skipping map-typed field '${f.name}'")
          None
        case _ if validName.matches(f.name) && !reserved.contains(f.name.toLowerCase) =>
          Some(f.name -> scalarOf(f.dataType))
        case _ =>
          System.err.println(s"[schema] skipping invalid field name '${f.name}'")
          None
      }
    }

  def sdl(spark: SparkSession, sfDir: String, names: Seq[String],
          keys: Map[String, Seq[String]] = Map.empty): String =
    sdlOf(names.map(n => n -> Tables.load(spark, sfDir, n).schema), keys)

  /** SDL from explicit (root name, schema) pairs — lets a service expose
    * extra roots (custom parquet paths) and boot-time projections in its
    * reflected schema, not just the star-schema tables. */
  def sdlOf(tables: Seq[(String, org.apache.spark.sql.types.StructType)],
            keys: Map[String, Seq[String]] = Map.empty): String = {
    val sb = new StringBuilder
    sb.append("type Query {\n")
    tables.foreach { case (n, _) => sb.append(s"  $n: ${typeName(n)}\n") }
    sb.append("  sql(query: String!): Table\n")
    sb.append("  _entities(representations: [_Any!]!): [_Entity]!\n")
    sb.append("  _service: _Service!\n")
    sb.append("}\n")
    tables.foreach { case (n, schema) =>
      // federation @key directive per configured table (reference
      // middleware.py:138-141 strawberry.federation.type(keys=...))
      val keyDir = keys.get(n).filter(_.nonEmpty)
        .map(ks => s""" @key(fields: "${ks.mkString(" ")}")""").getOrElse("")
      sb.append(s"\ntype ${typeName(n)}$keyDir {\n")
      typeFields(schema).foreach { case (f, t) => sb.append(s"  $f: $t\n") }
      sb.append("}\n")
    }
    sb.toString
  }

  def typeName(table: String): String =
    table.head.toUpper +: table.tail
}
