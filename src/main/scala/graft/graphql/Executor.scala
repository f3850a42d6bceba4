package graft.graphql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GTable, Natural, Tables}
import GVal._

/** GraphQL execution over the engine: each root field is a table
  * (reference's multi-root Query, middleware.py:55-90); every table field
  * is a lazy relational operator returning a new table scope; scalars
  * materialize only at the leaves (reference README.md:107). The resolver
  * fold IS the plan build — Catalyst sees one composed DataFrame per leaf
  * group.
  *
  * Served operator surface (round 1): count, any(limit), type, schema,
  * slice(offset,limit), filter(<col>: {eq ne lt le gt ge isin}), order(by,
  * limit), group(by, counts, aggregate {sum mean min max count}), distinct
  * (on, counts), columns {<col> {values count countDistinct min max sum
  * mean}}, row(index).
  */
final class GraphQLService(spark: SparkSession, sfDir: String,
                           names: Seq[String] = Tables.names) {

  /** Per-table roots; natural order attached so slice/row work. Memoized —
    * the row-id attach runs a (metadata-only) per-file count job once per
    * table, not once per request. */
  private val rootCache = scala.collection.concurrent.TrieMap.empty[String, GTable]
  private val roots: Map[String, () => GTable] =
    names.map(n => n -> (() =>
      rootCache.getOrElseUpdate(n, GTable(Tables.loadOrdered(spark, sfDir, n))))).toMap

  def execute(query: String): String = {
    val doc = Parser.parse(query)
    val timings = Seq.newBuilder[(String, String)]
    val out = doc.sels.map { f =>
      if (f.name == "_service") {
        // federation-style reflection (reference _service{sdl},
        // middleware.py:55-90)
        f.outName -> Json.obj(f.sels.map(s => s.outName -> (s.name match {
          case "sdl" => Json.quote(sdl)
          case other => throw new IllegalArgumentException(s"unknown _service field '$other'")
        })))
      } else {
        val root = roots.getOrElse(f.name,
          throw new IllegalArgumentException(s"unknown table '${f.name}'"))
        val t0 = System.nanoTime()
        val r = f.outName -> resolveTable(root(), f, Some(s"SELECT * FROM ${f.name}"))
        timings += (f.outName -> ((System.nanoTime() - t0) / 1e6).round.toString)
        r
      }
    }
    // per-root resolver durations (reference's Apollo-tracing-style metrics,
    // middleware.py:22-38)
    Json.obj(Seq(
      "data" -> Json.obj(out),
      "extensions" -> Json.obj(Seq("timing_ms" -> Json.obj(timings.result())))))
  }

  /** SDL reflection (reference `_service { sdl }`). */
  def sdl: String = SchemaGen.sdl(spark, sfDir, names)

  // ─── resolvers ───

  private def resolveTable(t: GTable, field: GField,
                           sql: Option[String]): String = {
    // §4 persist policy: >1 materializing sibling → persist the shared plan
    val consumers = field.sels.count(f =>
      !Set("type", "schema", "toSql").contains(f.name))
    val persisted = consumers > 1
    if (persisted) t.df.persist()
    try Json.obj(field.sels.map(f => f.outName -> resolveField(t, f, sql)))
    finally if (persisted) { t.df.unpersist(); () }
  }

  private def resolveField(t: GTable, f: GField, sql: Option[String]): String = f.name match {
    case "count" => t.count().toString
    case "any" => t.any(intArg(f, "limit").getOrElse(1)).toString
    case "type" => Json.quote("ParquetSource")
    case "schema" => resolveSchema(t, f)
    case "toSql" =>
      // SQL reflection (reference toSql, interface.py:109-115): the SQL text
      // accumulated along the operator fold; null after a non-SQL op
      Json.quote(sql.getOrElse(
        throw new IllegalArgumentException("toSql: not SQL-expressible after this operator")))
    case "slice" =>
      val off = longArg(f, "offset").getOrElse(0L)
      val lim = longArg(f, "limit")
      resolveTable(t.slice(off, lim), f,
        sql.map(q => s"SELECT * FROM ($q) LIMIT ${lim.getOrElse(Long.MaxValue)} OFFSET $off"))
    case "filter" =>
      resolveTable(t.filter(filterPreds(t, f): _*), f,
        sql.map(q => s"SELECT * FROM ($q) WHERE ${filterPredsSql(f).mkString(" AND ")}"))
    case "order" =>
      val by = strListArg(f, "by")
      val lim = intArg(f, "limit")
      val bySql = by.map(k => if (k.startsWith("-")) s"${k.drop(1)} DESC" else s"$k ASC")
      resolveTable(t.order(GTable.orderKeys(by), lim), f,
        sql.map(q => s"SELECT * FROM ($q) ORDER BY ${bySql.mkString(", ")}" +
          lim.fold("")(k => s" LIMIT $k")))
    case "group" => resolveGroup(t, f, sql)
    case "distinct" =>
      val on = strListArg(f, "on")
      resolveTable(t.distinctOn(on,
        f.arg("keep").collect { case GEnum(k) => k; case GStr(k) => k }.getOrElse("first"),
        f.arg("counts").collect { case GStr(c) => c }), f, None)
    case "columns" => resolveColumns(t, f)
    case "row" => resolveRow(t, longArg(f, "index").getOrElse(0L))
    case "project" =>
      // project(columns: [{alias: "x", ...expr}]): expression trees
      val cols = f.arg("columns").toSeq.flatMap {
        case GList(items) => items.map {
          case o @ GObj(fields) =>
            val alias = o.get("alias").collect { case GStr(a) => a }
              .getOrElse(throw new IllegalArgumentException("projection needs alias"))
            alias -> Exprs.compile(GObj(fields.filterNot(_._1 == "alias")))
          case _ => throw new IllegalArgumentException("projection must be an object")
        }
        case _ => throw new IllegalArgumentException("project(columns:) expects a list")
      }
      val projSql = f.arg("columns").toSeq.flatMap {
        case GList(items) => items.collect {
          case o @ GObj(fields2) =>
            val alias = o.get("alias").collect { case GStr(a) => a }.get
            s"${Exprs.toSql(GObj(fields2.filterNot(_._1 == "alias")))} AS $alias"
        }
        case _ => Nil
      }
      resolveTable(t.project(cols: _*), f,
        sql.map(q => s"SELECT *, ${projSql.mkString(", ")} FROM ($q)"))
    case "join" =>
      val rightName = f.arg("right").collect { case GStr(r) => r }
        .getOrElse(throw new IllegalArgumentException("join needs right:"))
      val right = roots.getOrElse(rightName,
        throw new IllegalArgumentException(s"unknown table '$rightName'"))
      val how = f.arg("how").collect { case GStr(h) => h; case GEnum(h) => h }
        .getOrElse("inner")
      val keys = strListArg(f, "keys")
      val rkeys0 = strListArg(f, "rkeys")
      val rkeys = if (rkeys0.isEmpty) keys else rkeys0
      val howSql = Map("inner" -> "JOIN", "left" -> "LEFT JOIN",
        "right" -> "RIGHT JOIN", "full" -> "FULL OUTER JOIN")
      val joinSql = sql.flatMap(q => howSql.get(how).map { hs =>
        val cond = keys.zip(rkeys).map { case (k, rk) => s"l.$k = r.$rk" }.mkString(" AND ")
        s"SELECT * FROM ($q) l $hs (SELECT * FROM $rightName) r ON $cond"
      })
      resolveTable(t.join(right(), keys, rkeys0, how), f, joinSql)
    case "asofJoin" =>
      // asofJoin(right: "events_errors"|table, on: "ts", rOn: "ts",
      //          keys: [...], rkeys: [...]) — backward nearest match
      val rightName = f.arg("right").collect { case GStr(r) => r }
        .getOrElse(throw new IllegalArgumentException("asofJoin needs right:"))
      val right = roots.getOrElse(rightName,
        throw new IllegalArgumentException(s"unknown table '$rightName'"))
      val on = f.arg("on").collect { case GStr(o) => o }
        .getOrElse(throw new IllegalArgumentException("asofJoin needs on:"))
      val rOn = f.arg("rOn").collect { case GStr(o) => o }.getOrElse("")
      resolveTable(t.asofJoin(right(), on, rOn,
        strListArg(f, "keys"), strListArg(f, "rkeys")), f, None)
    case "first" =>
      resolveTable(t.firstRank(strListArg(f, "by"),
        intArg(f, "rank").getOrElse(1),
        f.arg("dense").collect { case GBool(b) => b }.getOrElse(false),
        strListArg(f, "over")), f, None)
    case "take" =>
      val idx = f.arg("indices").toSeq.flatMap {
        case GList(items) => items.collect { case GInt(i) => i }
        case _ => Nil
      }
      resolveTable(t.take(idx), f, None)
    case "unnest" =>
      val name = f.arg("name").collect { case GStr(n) => n }
        .getOrElse(throw new IllegalArgumentException("unnest needs name:"))
      resolveTable(t.unnest(name,
        f.arg("offset").collect { case GStr(o) => o },
        f.arg("keep_empty").collect { case GBool(b) => b }.getOrElse(false)), f, None)
    case "runs" =>
      resolveTable(t.runs(strListArg(f, "by"),
        counts = f.arg("counts").collect { case GStr(c) => c }), f, None)
    case "window" =>
      // window(over: [...], by: ["±col"], rowNumber: "rn0",
      //        lag: [{name, offset, default, alias}],
      //        sum: [{name, alias}]  — cumulative when `by` given)
      val over = strListArg(f, "over").map(col)
      val byKeys = strListArg(f, "by")
      val w = graft.functions.GWindows.spec(over, GTable.orderKeys(byKeys))
      var out = t
      f.arg("rowNumber").foreach { case GStr(a) =>
        out = out.project(a -> graft.functions.GWindows.rowNumber0(w)); case _ => () }
      f.arg("lag").foreach {
        case GList(specs) => specs.foreach {
          case o: GObj =>
            val nm = o.get("name").collect { case GStr(n) => n }.get
            val off = o.get("offset").collect { case GInt(i) => i.toInt }.getOrElse(1)
            val dflt = o.get("default").map(Exprs.scalaOf).orNull
            val al = o.get("alias").collect { case GStr(a) => a }.getOrElse(s"lag_$nm")
            out = out.project(al ->
              graft.functions.GWindows.lagDefault(col(nm), off, dflt, w))
          case _ => ()
        }
        case _ => ()
      }
      f.arg("sum").foreach {
        case GList(specs) => specs.foreach {
          case o: GObj =>
            val nm = o.get("name").collect { case GStr(n) => n }.get
            val al = o.get("alias").collect { case GStr(a) => a }.getOrElse(s"sum_$nm")
            out = out.project(al ->
              (if (byKeys.nonEmpty)
                 graft.functions.GWindows.cumulative(sum, col(nm), w)
               else graft.functions.GWindows.overPartition(sum, col(nm), over)))
          case _ => ()
        }
        case _ => ()
      }
      resolveTable(out, f, None)
    case "optional" =>
      // nullable self: stops error propagation for partial results
      // (reference interface.py:138-141)
      try resolveTable(t, f, sql) catch { case _: Exception => "null" }
    case "plan" =>
      // plan reflection (nearest Spark analog of the reference's toSql,
      // interface.py:109-115 — Spark has no plan→SQL printer)
      Json.quote(t.df.queryExecution.analyzed.toString)
    case other => throw new IllegalArgumentException(s"unknown field '$other'")
  }

  private def resolveSchema(t: GTable, f: GField): String = {
    val fields = t.result.schema.fields
    Json.obj(f.sels.map(s => s.outName -> (s.name match {
      case "names" => Json.write(fields.map(_.name).toSeq)
      case "types" => Json.write(fields.map(_.dataType.simpleString).toSeq)
      case other => throw new IllegalArgumentException(s"unknown schema field '$other'")
    })))
  }

  /** filter(col: {eq: v, ...}, ...) → AND-ed per-column predicates. */
  private def filterPreds(t: GTable, f: GField): Seq[Column] =
    f.args.flatMap {
      case (colName, GObj(preds)) => preds.map { case (op, v) =>
        val c = col(colName)
        op match {
          case "eq" => if (v == GNull) c.isNull else c === litOf(v)
          case "ne" => if (v == GNull) c.isNotNull else c =!= litOf(v)
          case "lt" => c < litOf(v)
          case "le" => c <= litOf(v)
          case "gt" => c > litOf(v)
          case "ge" => c >= litOf(v)
          case "isin" => v match {
            case GList(items) => c.isin(items.map(Exprs.scalaOf): _*)
            case _ => throw new IllegalArgumentException("isin expects a list")
          }
          case other => throw new IllegalArgumentException(s"unknown predicate '$other'")
        }
      }
      case (colName, other) =>
        throw new IllegalArgumentException(s"filter($colName:) expects an object")
    }

  /** SQL rendering of the per-column predicate objects (toSql support). */
  private def filterPredsSql(f: GField): Seq[String] =
    f.args.flatMap {
      case (colName, GObj(preds)) => preds.map { case (op, v) =>
        op match {
          case "eq" => if (v == GVal.GNull) s"$colName IS NULL" else s"$colName = ${Exprs.litSql(v)}"
          case "ne" => if (v == GVal.GNull) s"$colName IS NOT NULL" else s"$colName <> ${Exprs.litSql(v)}"
          case "lt" => s"$colName < ${Exprs.litSql(v)}"
          case "le" => s"$colName <= ${Exprs.litSql(v)}"
          case "gt" => s"$colName > ${Exprs.litSql(v)}"
          case "ge" => s"$colName >= ${Exprs.litSql(v)}"
          case "isin" => s"$colName IN ${Exprs.litSql(v)}"
          case other => throw new IllegalArgumentException(s"unknown predicate '$other'")
        }
      }
      case _ => Nil
    }

  /** group(by: [...], counts: "n", aggregate: {sum: [{name, alias}], ...}). */
  private def resolveGroup(t: GTable, f: GField, sql: Option[String]): String = {
    val by = strListArg(f, "by")
    val counts = f.arg("counts").collect { case GStr(c) => c }
    val aggs = f.arg("aggregate").toSeq.flatMap {
      case GObj(kinds) => kinds.flatMap { case (fn, GList(specs)) =>
        specs.map {
          case o: GObj =>
            val name = o.get("name").collect { case GStr(n) => n }
              .getOrElse(throw new IllegalArgumentException("aggregate needs name"))
            val alias = o.get("alias").collect { case GStr(a) => a }
              .getOrElse(s"${fn}_$name")
            val c = col(name)
            (fn match {
              case "sum" => sum(c); case "mean" => avg(c)
              case "min" => min(c); case "max" => max(c)
              case "count" => count(c)
              case other => throw new IllegalArgumentException(s"unknown aggregate '$other'")
            }).as(alias)
          case _ => throw new IllegalArgumentException("aggregate spec must be an object")
        }
      case (fn, _) => throw new IllegalArgumentException(s"aggregate.$fn expects a list")
      }
      case _ => throw new IllegalArgumentException("aggregate expects an object")
    }
    val aggSqls = f.arg("aggregate").toSeq.flatMap {
      case GObj(kinds) => kinds.flatMap {
        case (fn, GList(specs)) => specs.collect { case o: GObj =>
          val nm = o.get("name").collect { case GStr(n) => n }.get
          val al = o.get("alias").collect { case GStr(a) => a }.getOrElse(s"${fn}_$nm")
          val sqlFn = if (fn == "mean") "avg" else fn
          s"$sqlFn($nm) AS $al"
        }
        case _ => Nil
      }
      case _ => Nil
    } ++ counts.map(c => s"count(*) AS $c")
    val groupSql = sql.map { q =>
      val sel = (by ++ aggSqls).mkString(", ")
      s"SELECT $sel FROM ($q)" + (if (by.nonEmpty) s" GROUP BY ${by.mkString(", ")}" else "")
    }
    resolveTable(t.group(by, aggs, counts, firstSeenOrder = Natural.hasRowId(t.df)), f, groupSql)
  }

  /** columns { name { values count countDistinct min max sum mean } } —
    * pruned to the referenced columns; aggregate leaves batched into ONE
    * df.agg pass per column set (no per-leaf jobs). */
  private def resolveColumns(t: GTable, f: GField): String = {
    val wanted = f.sels
    val pruned = t.select(wanted.map(_.name): _*)
    Json.obj(wanted.map { cf =>
      val c = col(cf.name)
      val leafs = cf.sels
      val aggLeafs = leafs.filterNot(l => l.name == "values" || l.name == "distinct")
      val aggCols = aggLeafs.map(l => (l.name match {
        case "count" => count(c)
        case "countDistinct" => countDistinct(c)
        case "min" => min(c)
        case "max" => max(c)
        case "sum" => sum(c)
        case "mean" => avg(c)
        case other => throw new IllegalArgumentException(s"unknown column leaf '$other'")
      }).as(l.outName))
      val aggRow = if (aggCols.nonEmpty)
        Some(pruned.result.agg(aggCols.head, aggCols.tail: _*).collect()(0)) else None
      val parts = leafs.map { l =>
        l.outName -> (l.name match {
          case "values" =>
            // explicit sort order (if any) wins over the natural row id
            val ordered =
              if (pruned.isSorted) pruned.df
              else if (Natural.hasRowId(pruned.df)) pruned.df.orderBy(col(Natural.rid))
              else pruned.df
            val rows = Natural.strip(ordered).select(cf.name).collect()
            Json.write(rows.map(_.get(0)).toSeq)
          case "distinct" =>
            // the reference's Set: distinct values + counts pair
            // (models.py:86-98) — one value_counts aggregation
            val vc = Natural.strip(pruned.df).groupBy(c).agg(count(lit(1)).as("n"))
              .orderBy(c).collect()
            Json.obj(l.sels.map(s => s.outName -> (s.name match {
              case "values" => Json.write(vc.map(_.get(0)).toSeq)
              case "counts" => Json.write(vc.map(_.getLong(1)).toSeq)
              case "length" => vc.length.toString
              case other => throw new IllegalArgumentException(s"unknown Set field '$other'")
            })))
          case _ => Json.write(aggRow.get.getAs[Any](l.outName))
        })
      }
      cf.outName -> Json.obj(parts)
    })
  }

  private def resolveRow(t: GTable, index: Long): String = {
    val rows = t.rowAt(index).result.collect()
    if (rows.isEmpty) "null" else Json.write(rows(0))
  }

  // ─── arg helpers ───

  private def litOf(v: GVal): Column = lit(Exprs.scalaOf(v))
  private def intArg(f: GField, name: String): Option[Int] =
    f.arg(name).collect { case GInt(v) => v.toInt }
  private def longArg(f: GField, name: String): Option[Long] =
    f.arg(name).collect { case GInt(v) => v }
  private def strListArg(f: GField, name: String): Seq[String] =
    f.arg(name).toSeq.flatMap {
      case GList(items) => items.collect { case GStr(s) => s }
      case GStr(s) => Seq(s)
      case _ => Nil
    }
}
