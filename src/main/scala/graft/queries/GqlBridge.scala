package graft.queries

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.graphql.GraphQLService

import scala.jdk.CollectionConverters._

/** Bridge from a GraphQL response back to a DataFrame, so GraphQL-served
  * queries run through the same DuckDB oracle gate as the Scala API
  * (VERDICT round 1: prove the service surface with q_gql_* entries).
  *
  * The query must end in a `columns { col { values } ... }` selection; the
  * JSON column arrays are zipped into rows and cast to the declared DDL
  * schema — so the parquet the driver hashes has exact, intentional types.
  */
object GqlBridge {

  private val mapper = new ObjectMapper()
  private val services =
    scala.collection.concurrent.TrieMap.empty[String, GraphQLService]

  /** One memoized service per (sf dir, extra roots, federation keys) —
    * root row-id attach runs once. `extra` adds hive-root tables
    * (name → path); `keys` configures federation @key tables. */
  def service(spark: SparkSession, dir: String,
              extra: Map[String, String] = Map.empty,
              keys: Map[String, Seq[String]] = Map.empty): GraphQLService =
    services.getOrElseUpdate(
      dir + extra.toSeq.sorted.mkString("|") +
        keys.toSeq.sortBy(_._1).map { case (t, ks) => s"$t:${ks.mkString(",")}" }
          .mkString("|"),
      new GraphQLService(spark, dir, extraRoots = extra, keys = keys))

  /** Execute `query`, walk `path` (response outNames from `data` to the
    * columns object), and build a DataFrame with schema `ddl`. */
  def frame(spark: SparkSession, dir: String, query: String,
            path: Seq[String], ddl: String,
            variables: Map[String, graft.graphql.GVal] = Map.empty,
            extra: Map[String, String] = Map.empty): DataFrame = {
    val resp = service(spark, dir, extra).execute(query, variables)
    val root = mapper.readTree(resp)
    val err = Option(root.get("errors"))
    require(err.isEmpty, s"GraphQL errors: $err")
    val colsNode = path.foldLeft(root.get("data")) { (n, p) =>
      require(n != null && n.get(p) != null, s"missing '$p' in response path")
      n.get(p)
    }
    val schema = StructType.fromDDL(ddl)
    val columns: Seq[Vector[Any]] = schema.fields.toSeq.map { f =>
      val valuesNode = colsNode.get(f.name).get("values")
      require(valuesNode != null && valuesNode.isArray,
        s"column '${f.name}' has no values array")
      valuesNode.elements().asScala.map(convert(_, f.dataType)).toVector
    }
    val n = columns.headOption.map(_.length).getOrElse(0)
    require(columns.forall(_.length == n), "ragged column arrays")
    val rows = (0 until n).map(i => Row.fromSeq(columns.map(_(i)))).asJava
    spark.createDataFrame(rows, schema)
  }

  /** Execute a federation `_entities` query and concatenate each resolved
    * entity's `columns {...}` selection (reached via `innerPath` from the
    * entity object) into ONE DataFrame — entities answer in representation
    * order, so the result order is the caller's to make deterministic.
    * Puts the `_entities` surface under the same DuckDB gate as the rest
    * of the service (it was spec-only through round 7). */
  def frameEntities(spark: SparkSession, dir: String, query: String,
                    innerPath: Seq[String], ddl: String,
                    keys: Map[String, Seq[String]]): DataFrame = {
    val resp = service(spark, dir, keys = keys).execute(query)
    val root = mapper.readTree(resp)
    val err = Option(root.get("errors"))
    require(err.isEmpty, s"GraphQL errors: $err")
    val ents = root.get("data").get("_entities")
    require(ents != null && ents.isArray, "missing _entities array")
    val schema = StructType.fromDDL(ddl)
    val rows = ents.elements().asScala.flatMap { ent =>
      val colsNode = innerPath.foldLeft(ent) { (n, p) =>
        require(n != null && n.get(p) != null, s"missing '$p' in entity")
        n.get(p)
      }
      val columns: Seq[Vector[Any]] = schema.fields.toSeq.map { f =>
        val valuesNode = colsNode.get(f.name).get("values")
        require(valuesNode != null && valuesNode.isArray,
          s"column '${f.name}' has no values array")
        valuesNode.elements().asScala.map(convert(_, f.dataType)).toVector
      }
      val n = columns.headOption.map(_.length).getOrElse(0)
      require(columns.forall(_.length == n), "ragged column arrays")
      (0 until n).map(i => Row.fromSeq(columns.map(_(i))))
    }.toSeq.asJava
    spark.createDataFrame(rows, schema)
  }

  /** JSON leaf → Scala value of the target Spark type. */
  private def convert(node: JsonNode, dt: DataType): Any =
    if (node == null || node.isNull) null
    else dt match {
      case IntegerType => node.asInt()
      case LongType => node.asLong()
      case ShortType => node.asInt().toShort
      case DoubleType => node.asDouble()
      case FloatType => node.asDouble().toFloat
      case BooleanType => node.asBoolean()
      case StringType => node.asText()
      case d: DecimalType => new java.math.BigDecimal(node.asText())
      case DateType => java.sql.Date.valueOf(node.asText())
      case TimestampType =>
        java.sql.Timestamp.valueOf(node.asText().replace("T", " "))
      case TimestampNTZType =>
        java.time.LocalDateTime.parse(node.asText().replace(" ", "T"))
      case ArrayType(et, _) =>
        node.elements().asScala.map(convert(_, et)).toSeq
      case other => throw new IllegalArgumentException(s"unsupported bridge type $other")
    }
}
