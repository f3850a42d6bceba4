package graft

import org.apache.spark.sql.SparkSession

import graft.graphql.{GraphQLHttpServer, GraphQLService, Json}
import graft.graphql.GVal._

/** Deployable GraphQL service entry point — the counterpart of the
  * reference's example service (reference service.py:19-35): point the
  * engine at a dataset with environment variables, no Scala required.
  *
  *   - `PARQUET_PATH` (required): parquet file or hive-partitioned
  *     directory to serve.
  *   - `NAME` (optional): root field name; defaults to the path's basename
  *     (minus a `.parquet` suffix), as the reference defaults to
  *     `PARQUET_PATH.name`.
  *   - `COLUMNS` (optional, JSON): boot-time projection — either a list of
  *     column names (`["a","b"]`) or an alias map (`{"alias": "column"}`),
  *     matching service.py:26-31. Applied as a Catalyst select, so pruning
  *     reaches the scan.
  *   - `PORT` (optional): HTTP port, default 8080. (The reference delegates
  *     this to uvicorn; here the transport is in-process.)
  *   - `GRAFT_CPUS` (optional): local parallelism, default all cores —
  *     irrelevant when submitted to a real cluster via spark-submit, where
  *     the master comes from the submit context.
  *   - `GRAFT_SPARK_CONF` (optional, JSON object): arbitrary Spark confs
  *     applied at session build (`{"spark.sql.files.maxPartitionBytes":
  *     "256m", ...}`) — the deployment-tuning escape hatch (partition
  *     sizing, AQE knobs, shuffle compression) without a rebuild.
  *     spark-submit `--conf` flags remain the cluster-native route.
  *   - `GRAFT_INDEX_GC_PERIOD_MS` (optional, default 900000 = 15 min):
  *     period of the prebuilt-index orphan sweep (GraphQLService.indexGc);
  *     `0` disables. With `GRAFT_INDEX_CACHE_MAX` (LRU cap of the
  *     in-memory index caches, default 256) this bounds a long-lived
  *     service's heap AND disk: evicted plans' trees age out of the live
  *     set and are swept once older than `GRAFT_INDEX_GC_GRACE_MS`
  *     (default 3600000 = 1 h — sized to cover another JVM's build-to-use
  *     window on a shared index dir).
  *
  * Serves `POST /graphql` until terminated.
  */
object ServiceMain {
  /** COLUMNS json → (alias, source) pairs; list form aliases to itself. */
  def parseColumns(json: String): Seq[(String, String)] = Json.parse(json) match {
    case GList(items) => items.map {
      case GStr(s) => s -> s
      case other => throw new IllegalArgumentException(
        s"COLUMNS list entries must be strings, got $other")
    }
    case GObj(fields) => fields.map {
      case (alias, GStr(src)) => alias -> src
      case (alias, other) => throw new IllegalArgumentException(
        s"COLUMNS['$alias'] must be a column name string, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"COLUMNS must be a JSON list or object, got $other")
  }

  /** GRAFT_SPARK_CONF json object → (key, value) pairs. */
  def parseSparkConf(json: String): Seq[(String, String)] = Json.parse(json) match {
    case GObj(fields) => fields.map {
      case (k, GStr(v)) => k -> v
      case (k, other) => throw new IllegalArgumentException(
        s"GRAFT_SPARK_CONF['$k'] must be a string value, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"GRAFT_SPARK_CONF must be a JSON object, got $other")
  }

  /** Deployment-entry safety default: the serve cap is ON out of the box
    * (generous 1M rows/leaf) — a fresh production deployment cannot be
    * driver-OOM'd by one `values` leaf over a huge root. Embedded use
    * (GraphQLService directly) stays unlimited for reference parity;
    * operators override via GRAFT_SERVE_MAX_VALUES / GRAFT_SPARK_CONF
    * (an explicit spark.graft.serve.maxValues wins; "0" disables). */
  private[graft] def applyServeCapDefault(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.graft.serve.maxValues").exists(_.nonEmpty)
        && !sys.env.get("GRAFT_SERVE_MAX_VALUES").exists(_.nonEmpty))
      spark.conf.set("spark.graft.serve.maxValues", "1000000")

  def rootName(path: String): String = {
    val base = path.stripSuffix("/").split('/').last.stripSuffix(".parquet")
    // GraphQL field names can't contain dots/dashes; normalize like the
    // reference normalizes nothing (it errors later) — be forgiving here
    base.replaceAll("[^_A-Za-z0-9]", "_") match {
      case n if n.headOption.exists(c => c.isDigit) => "_" + n
      case n => n
    }
  }

  def main(args: Array[String]): Unit = {
    val path = sys.env.getOrElse("PARQUET_PATH",
      throw new IllegalArgumentException("PARQUET_PATH is required"))
    val name = sys.env.get("NAME").filter(_.nonEmpty).getOrElse(rootName(path))
    val columns = sys.env.get("COLUMNS").filter(_.nonEmpty).map(parseColumns)
    val port = sys.env.get("PORT").filter(_.nonEmpty).map(_.toInt).getOrElse(8080)
    val cpus = sys.env.getOrElse("GRAFT_CPUS", "*")

    val builder = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", s"local[$cpus]"))
      .appName("graft-service")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("GRAFT_SPARK_CONF").filter(_.nonEmpty)
      .map(parseSparkConf)
      .map(_.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) })
      .getOrElse(builder).getOrCreate()
    applyServeCapDefault(spark)

    val service = new GraphQLService(spark, sfDir = "", names = Nil,
      extraRoots = Map(name -> path),
      rootProjections = columns.map(c => Map(name -> c)).getOrElse(Map.empty))
    val server = new GraphQLHttpServer(service, port).start()
    // periodic orphan-tree sweep (round-12 verdict #2): the LRU-bounded
    // index caches retire cold entries; this reclaims their on-disk trees
    val gcPeriod = sys.env.get("GRAFT_INDEX_GC_PERIOD_MS")
      .map(_.toLong).getOrElse(900000L)
    val gcGrace = sys.env.get("GRAFT_INDEX_GC_GRACE_MS")
      .map(_.toLong).getOrElse(3600000L)
    if (gcPeriod > 0) {
      val gc = new Thread(() => {
        while (true) {
          Thread.sleep(gcPeriod)
          try {
            val swept = service.indexGc(gcGrace)
            if (swept.nonEmpty)
              // scalastyle:off println — operator-facing maintenance log
              println(s"graft index gc: swept ${swept.size} orphaned " +
                s"trees (${swept.take(3).mkString(", ")}...)")
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"graft index gc failed: ${e.getMessage}")
          }
        }
      }, "graft-index-gc")
      gc.setDaemon(true)
      gc.start()
    }
    // scalastyle:off println — operator-facing startup banner
    println(s"graft GraphQL service: root '$name' over $path " +
      s"at http://localhost:${server.boundPort}/graphql")
    sys.addShutdownHook(server.stop())
    Thread.currentThread.join() // serve until killed
  }
}
