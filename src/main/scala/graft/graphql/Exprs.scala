package graft.graphql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{GFunctions, GWindows}
import GVal._

/** Expression-tree input → Spark Column (reference Expression input,
  * inputs.py:249-315): exactly-one-leaf objects composing column refs,
  * literals, typed scalars, comparisons, boolean ops, arithmetic,
  * coalesce/ifelse, and the array/numeric/string/temporal/window function
  * sub-blocks (inputs.py:329-557).
  *
  * Shape: {name: "col" | ["struct", "field"]} | {value: json} |
  *        {scalar: {date|datetime|decimal|duration|time|base64: "..."}} |
  *        {add|sub|mul|div|eq|ne|lt|le|gt|ge|xor: [e, e]} |
  *        {and|or|coalesce: [e, ...]} | {not|inv: e} |
  *        {isin|notin: [e, {value: [...]}]} | {ifelse: [c, t, f]} |
  *        {string: {lower: e, ...}} | {numeric: {round: [e, {value: 2}], ...}} |
  *        {temporal: {truncate: e, unit: "month"}} |
  *        {array: {slice: e, offset: 1, limit: 2, ...}} |
  *        {window: {over: [...], by: [...], rank: true, ...}}
  *
  * Field names accept both GraphQL camelCase (the reference's strawberry
  * auto-camelizing, e.g. `reExtract`, `dayOfYear`) and the underlying
  * snake_case — matching is underscore-insensitive.
  */
object Exprs {

  /** Parameter (non-op) keys inside each sub-block (inputs.py:351-360,
    * 402-406, 474-475, 494-533). */
  private val paramKeys = Set(
    "offset", "limit", "sep", "n", "buckets", "closed", "closeextreme",
    "includeunder", "includeover", "unit", "formatstr", "over", "by",
    "default", "scalar", "preceding", "following", "range", "alias")

  private def norm(s: String): String = s.replace("_", "").toLowerCase

  /** Detect a table-level cumulative op over natural order: top-level
    * cummax/cummin or numeric-block cumsum/cummean (inputs.py:275-276,
    * 399-400). These must NOT compile to a global single-partition window —
    * the executor routes them through GTable.cumulative (block prefix sums).
    * Returns (op, operand expression). */
  def cumulativeOf(v: GVal): Option[(String, GVal)] = v match {
    case o @ GObj(fields) if fields.length == 1 =>
      val (op, arg) = fields.head
      norm(op) match {
        case "cummax" | "cummin" => Some(norm(op) -> arg)
        case "numeric" => arg match {
          case GObj(Seq((op2, arg2))) if Set("cumsum", "cummean", "cummax", "cummin")(norm(op2)) =>
            Some(norm(op2) -> arg2)
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  def compile(v: GVal): Column = v match {
    case o @ GObj(fields) =>
      if (fields.length != 1)
        throw new IllegalArgumentException(
          s"expression object must have exactly one key, got ${fields.map(_._1)}")
      val (op0, arg) = fields.head
      norm(op0) match {
        case "name" => nameCol(arg)
        case "value" => lit(scalaOf(arg))
        case "scalar" => scalarLit(arg)
        case "add" => binary(arg, _ + _)
        case "sub" => binary(arg, _ - _)
        case "mul" => binary(arg, _ * _)
        case "div" | "truediv" => binary(arg, _ / _)
        // sign-of-dividend (Spark/Java %), matching the reference's DuckDB
        // backend ((-3) % 2 = -1 in both) — NOT Python's sign-of-divisor
        case "mod" => binary(arg, _ % _)
        case "eq" => binary(arg, _ === _)
        case "ne" => binary(arg, _ =!= _)
        case "lt" => binary(arg, _ < _)
        case "le" => binary(arg, _ <= _)
        case "gt" => binary(arg, _ > _)
        case "ge" => binary(arg, _ >= _)
        case "isin" => isinOf(arg)
        case "notin" => !isinOf(arg)
        case "and" => nary(arg).reduce(_ && _)
        case "or" => nary(arg).reduce(_ || _)
        case "xor" => binary(arg, _ =!= _) // boolean xor
        case "not" | "inv" => !compile(arg)
        case "coalesce" => coalesce(nary(arg): _*)
        case "ifelse" =>
          val Seq(c, t, e) = nary(arg)
          when(c, t).otherwise(e)
        case "cummax" | "cummin" =>
          throw new IllegalArgumentException(
            s"$op0 is table-level (natural-order cumulative); only valid as a " +
              "top-level projection, where the executor runs the distributed path")
        // round-1 back-compat direct leaves
        case "length" => length(compile(arg))
        case "lower" => lower(compile(arg))
        case "upper" => upper(compile(arg))
        case "abs" => abs(compile(arg))
        case "string" => block(arg, stringOp)
        case "numeric" => block(arg, numericOp)
        case "temporal" => block(arg, temporalOp)
        case "array" => block(arg, arrayOp)
        case "window" => windowOp(arg)
        case other => throw new IllegalArgumentException(s"unknown expression op '$op0'")
      }
    case other => throw new IllegalArgumentException(s"expression must be an object, got $other")
  }

  /** Column reference; list form drills into struct fields / array offsets
    * (reference name: [str], core.py getitems — negative ints from the end). */
  private def nameCol(v: GVal): Column = v match {
    case GStr(s) => col(s)
    case GList(parts) =>
      parts match {
        case (GStr(head)) +: rest =>
          rest.foldLeft(col(head)) {
            case (c, GStr(f)) => c.getField(f)
            case (c, GInt(i)) =>
              // 0-based; negative = from the end (reference getitems)
              if (i >= 0) element_at(c, i.toInt + 1) else element_at(c, i.toInt)
            case (_, other) => throw new IllegalArgumentException(s"bad name part $other")
          }
        case _ => throw new IllegalArgumentException("name list must start with a column")
      }
    case other => throw new IllegalArgumentException(s"name must be a string or list, got $other")
  }

  /** Typed scalar literal (reference Scalars input, inputs.py:234-246;
    * scalars.py:25-87 codecs). */
  def scalarLit(v: GVal): Column = v match {
    case o @ GObj(Seq((kind, GStr(s)))) => norm(kind) match {
      case "date" => lit(java.time.LocalDate.parse(s))
      case "datetime" => lit(java.time.LocalDateTime.parse(s.replace(" ", "T")))
      case "decimal" => lit(new java.math.BigDecimal(s))
      case "base64" => lit(java.util.Base64.getDecoder.decode(s))
      case "time" =>
        // no TIME type in Spark: seconds-of-day micros as day-time interval
        lit(java.time.Duration.ofNanos(java.time.LocalTime.parse(s).toNanoOfDay))
      case "duration" => durationLit(s)
      case other => throw new IllegalArgumentException(s"unknown scalar kind '$kind'")
    }
    case other => throw new IllegalArgumentException(s"scalar expects {kind: \"...\"}, got $other")
  }

  /** ISO-8601 duration, month-day-nano semantics (reference Duration scalar,
    * scalars.py:25-56): pure time / pure date map to Spark's interval types;
    * mixed month+day+time builds a CalendarInterval via make_interval. */
  def durationLit(s: String): Column = {
    val (datePart, timePart) = s.indexOf('T') match {
      case -1 => (s, "")
      case i => (s.substring(0, i), s.substring(i)) // timePart keeps the 'T'
    }
    val hasYM = datePart.matches(".*[0-9](Y|M).*")
    val hasD = datePart.matches(".*[0-9][DW].*")
    if (!hasYM && (hasD || timePart.nonEmpty))
      lit(java.time.Duration.parse((if (hasD) datePart else "P0D") + timePart))
    else if (hasYM && !hasD && timePart.isEmpty)
      lit(java.time.Period.parse(s))
    else {
      val p = java.time.Period.parse(datePart)
      val d = if (timePart.isEmpty) java.time.Duration.ZERO
              else java.time.Duration.parse("PT" + timePart.drop(1))
      make_interval(
        lit(p.getYears), lit(p.getMonths), lit(0), lit(p.getDays),
        lit(d.toHours.toInt), lit((d.toMinutes % 60).toInt),
        // seconds + micros as DECIMAL(18,6) — make_interval's secs type
        lit(java.math.BigDecimal.valueOf(
          (d.getSeconds % 60) * 1000000L + d.getNano / 1000L, 6)))
    }
  }

  /** isin/notin (inputs.py:261-262): [target, {value: [...]}]. */
  private def isinOf(arg: GVal): Column = arg match {
    case GList(Seq(target, GObj(Seq(("value", GList(values)))))) =>
      compile(target).isin(values.map(scalaOf): _*)
    case GList(Seq(target, GList(values))) =>
      compile(target).isin(values.map(scalaOf): _*)
    case other => throw new IllegalArgumentException(
      "isin/notin expects [expr, {value: [literals]}]")
  }

  // ─── sub-blocks ───

  /** A sub-block object = one op key + block parameter keys. */
  private final case class Block(op: String, args: Seq[GVal], params: GObj)

  private def block(v: GVal, f: Block => Column): Column = v match {
    case o @ GObj(fields) =>
      val (ops, params) = fields.partition { case (k, _) => !paramKeys.contains(norm(k)) }
      if (ops.length != 1)
        throw new IllegalArgumentException(
          s"function block must have exactly one op, got ${ops.map(_._1)}")
      val (op, arg) = ops.head
      val args = arg match {
        case GList(items) => items
        case single => Seq(single)
      }
      f(Block(norm(op), args, GObj(params)))
    case other => throw new IllegalArgumentException(s"function block must be an object")
  }

  private def p1(b: Block): Column = compile(b.args.head)
  private def lit1(b: Block, i: Int): Any = b.args(i) match {
    case GObj(Seq(("value", v))) => scalaOf(v)
    case v => scalaOf(v)
  }
  private def strParam(b: Block, key: String, dflt: String): String =
    b.params.v.collectFirst { case (k, GStr(s)) if norm(k) == key => s }.getOrElse(dflt)
  private def intParam(b: Block, key: String, dflt: Int): Int =
    b.params.v.collectFirst { case (k, GInt(i)) if norm(k) == key => i.toInt }.getOrElse(dflt)
  private def boolParam(b: Block, key: String, dflt: Boolean): Boolean =
    b.params.v.collectFirst { case (k, GBool(x)) if norm(k) == key => x }.getOrElse(dflt)

  /** String functions (reference Strings, inputs.py:423-447). */
  private def stringOp(b: Block): Column = b.op match {
    case "capitalize" => GFunctions.capitalize(p1(b))
    case "contains" => p1(b).contains(compile(b.args(1)))
    case "endswith" => p1(b).endsWith(compile(b.args(1)))
    case "find" => GFunctions.find(p1(b), lit1(b, 1).toString)
    case "length" => length(p1(b))
    case "lower" => lower(p1(b))
    case "lpad" => lpad(p1(b), lit1(b, 1).asInstanceOf[Long].toInt,
      if (b.args.length > 2) lit1(b, 2).toString else " ")
    case "lstrip" => ltrim(p1(b))
    case "reextract" => regexp_extract(p1(b), lit1(b, 1).toString,
      if (b.args.length > 2) lit1(b, 2).asInstanceOf[Long].toInt else 0)
    case "research" => p1(b).rlike(lit1(b, 1).toString)
    case "resplit" => split(p1(b), lit1(b, 1).toString)
    case "replace" => replace(p1(b), compile(b.args(1)), compile(b.args(2)))
    case "reverse" => reverse(p1(b))
    case "rpad" => rpad(p1(b), lit1(b, 1).asInstanceOf[Long].toInt,
      if (b.args.length > 2) lit1(b, 2).toString else " ")
    case "rstrip" => rtrim(p1(b))
    case "split" => split(p1(b), java.util.regex.Pattern.quote(lit1(b, 1).toString))
    case "startswith" => p1(b).startsWith(compile(b.args(1)))
    case "strip" => trim(p1(b))
    case "upper" => upper(p1(b))
    case other => throw new IllegalArgumentException(s"unknown string op '$other'")
  }

  /** Numeric functions (reference Numeric, inputs.py:377-420). */
  private def numericOp(b: Block): Column = b.op match {
    case "abs" => abs(p1(b))
    case "acos" => acos(p1(b))
    case "asin" => asin(p1(b))
    case "atan" => atan(p1(b))
    case "atan2" => atan2(p1(b), compile(b.args(1)))
    case "ceil" => ceil(p1(b))
    case "cos" => cos(p1(b))
    case "exp" => exp(p1(b))
    case "floor" => floor(p1(b))
    case "isinf" => GFunctions.isinf(p1(b))
    case "isnan" => isnan(p1(b))
    case "log" =>
      if (b.args.length > 1) log(lit1(b, 1) match {
        case d: Double => d
        case l: Long => l.toDouble
        case x => x.toString.toDouble
      }, p1(b))
      else log(p1(b))
    case "negate" => -p1(b)
    case "round" =>
      if (b.args.length > 1) round(p1(b), lit1(b, 1).asInstanceOf[Long].toInt)
      else round(p1(b))
    case "sign" => signum(p1(b))
    case "sin" => sin(p1(b))
    case "sqrt" => sqrt(p1(b))
    case "tan" => tan(p1(b))
    case "bucket" =>
      val buckets = b.params.v.collectFirst {
        case (k, GList(items)) if norm(k) == "buckets" =>
          items.map(scalaOf(_) match {
            case d: Double => d
            case l: Long => l.toDouble
            case x => x.toString.toDouble
          })
      }.getOrElse(throw new IllegalArgumentException("bucket needs buckets:"))
      GFunctions.bucket(p1(b), buckets, strParam(b, "closed", "left"))
    case other => throw new IllegalArgumentException(s"unknown numeric op '$other'")
  }

  /** Temporal functions (reference Temporal, inputs.py:450-487). */
  private def temporalOp(b: Block): Column = b.op match {
    case "date" => to_date(p1(b))
    case "day" => dayofmonth(p1(b))
    case "dayofyear" => dayofyear(p1(b))
    case "delta" => GFunctions.delta(p1(b), compile(b.args(1)), strParam(b, "unit", "second"))
    case "epochseconds" => unix_timestamp(p1(b).cast("timestamp"))
    case "hour" => hour(p1(b))
    case "microsecond" => (unix_micros(p1(b).cast("timestamp")) % 1000000L).cast("int")
    case "millisecond" => ((unix_micros(p1(b).cast("timestamp")) / 1000L) % 1000L).cast("int")
    case "minute" => minute(p1(b))
    case "month" => month(p1(b))
    case "quarter" => quarter(p1(b))
    case "second" => second(p1(b))
    case "strftime" => date_format(p1(b), strftimeToSparkPattern(strParam(b, "formatstr", "")))
    case "time" => date_format(p1(b), "HH:mm:ss")
    case "truncate" => date_trunc(strParam(b, "unit", "day"), p1(b))
    case "weekofyear" => weekofyear(p1(b))
    case "year" => year(p1(b))
    case other => throw new IllegalArgumentException(s"unknown temporal op '$other'")
  }

  /** C/Python strftime directives → Spark datetime pattern (the reference's
    * strftime format, inputs.py:466). Covers the common directives. */
  def strftimeToSparkPattern(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        sb.append(fmt(i + 1) match {
          case 'Y' => "yyyy"; case 'y' => "yy"; case 'm' => "MM"; case 'd' => "dd"
          case 'H' => "HH"; case 'M' => "mm"; case 'S' => "ss"; case 'j' => "DDD"
          case 'B' => "MMMM"; case 'b' => "MMM"; case 'A' => "EEEE"; case 'a' => "EEE"
          case '%' => "%"
          case other => throw new IllegalArgumentException(s"strftime %$other unsupported")
        })
        i += 2
      } else { sb.append(fmt(i)); i += 1 }
    }
    sb.toString
  }

  /** Array functions (reference Arrays, inputs.py:329-374). */
  private def arrayOp(b: Block): Column = b.op match {
    case "alls" => forall(p1(b), x => x)
    case "anys" => exists(p1(b), x => x)
    case "flatten" => flatten(p1(b))
    case "length" => size(p1(b))
    case "maxs" => array_max(p1(b))
    case "means" => GFunctions.arrayMean(p1(b))
    case "modes" => GFunctions.arrayMode(p1(b))
    case "mins" => array_min(p1(b))
    case "sort" => array_sort(p1(b))
    case "sums" => GFunctions.arraySum(p1(b))
    case "unique" => array_distinct(p1(b))
    case "concat" => concat(nary(GList(b.args)): _*)
    case "contains" => array_contains(p1(b), compile(b.args(1)))
    case "index" => GFunctions.arrayIndex(p1(b), compile(b.args(1)))
    case "intersect" => array_intersect(p1(b), compile(b.args(1)))
    case "remove" => array_remove(p1(b), compile(b.args(1)))
    case "union" => array_union(p1(b), compile(b.args(1)))
    case "zip" => arrays_zip(nary(GList(b.args)): _*)
    case "slice" =>
      val off = intParam(b, "offset", 0)
      val limO = b.params.v.collectFirst { case (k, GInt(i)) if norm(k) == "limit" => i.toInt }
      limO match {
        case Some(l) => GFunctions.arraySlice(p1(b), off, l)
        case None => slice(p1(b), lit(off + 1), size(p1(b)))
      }
    case "value" =>
      val off = intParam(b, "offset", 0)
      if (off >= 0) element_at(p1(b), off + 1) else element_at(p1(b), off)
    case "join" => array_join(p1(b), strParam(b, "sep", ""))
    case "repeat" => array_repeat(p1(b), intParam(b, "n", 1))
    case other => throw new IllegalArgumentException(s"unknown array op '$other'")
  }

  /** Window expressions (reference Window, inputs.py:490-557): the block
    * carries its own partition (`over`) and order (`by`) spec, so it
    * compiles to a self-contained Column. Ranking is 0-based like the
    * reference; aggregates over `by` without an explicit frame are
    * cumulative (inputs.py:542-543). */
  private def windowOp(v: GVal): Column = v match {
    case o @ GObj(fields) =>
      def strList(key: String): Seq[String] = o.get(key).toSeq.flatMap {
        case GList(items) => items.collect { case GStr(s) => s }
        case GStr(s) => Seq(s)
        case _ => Nil
      }
      val over = strList("over").map(col)
      val byKeys = strList("by")
      val w = GWindows.spec(over, graft.core.GTable.orderKeys(byKeys))
      val offset = o.get("offset").collect { case GInt(i) => i.toInt }.getOrElse(1)
      val default = o.get("default").map(scalaOf)
        .orElse(o.get("scalar").map(s => scalarLit(s))).orNull
      val preceding = o.get("preceding").collect { case GInt(i) => i }
      val following = o.get("following").collect { case GInt(i) => i }
      val ranged = o.get("range").collect { case GBool(x) => x }.getOrElse(false)
      val (ops, _) = fields.partition { case (k, _) => !paramKeys.contains(norm(k)) }
      if (ops.length != 1)
        throw new IllegalArgumentException(
          s"window block must have exactly one op, got ${ops.map(_._1)}")
      val (op, arg) = ops.head
      def framed(agg: Column => Column): Column = {
        val c = compile(arg)
        (preceding, following) match {
          case (None, None) =>
            if (byKeys.nonEmpty) GWindows.cumulative(agg, c, w)
            else GWindows.overPartition(agg, c, over)
          case _ =>
            val lo = preceding.map(-_).getOrElse(Long.MinValue)
            val hi = following.getOrElse(Long.MaxValue)
            if (ranged) agg(c).over(w.rangeBetween(lo, hi))
            else agg(c).over(w.rowsBetween(lo, hi))
        }
      }
      def pairwise(f: (Column, Column) => Column): Column =
        GWindows.pairwise(compile(arg), f, offset, default, w)
      norm(op) match {
        case "rownumber" => GWindows.rowNumber0(w)
        case "rank" => GWindows.rank0(w)
        case "denserank" => GWindows.denseRank0(w)
        case "percentrank" => GWindows.percentRank(w)
        case "cumedist" => GWindows.cumeDist(w)
        case "ntile" => GWindows.ntile0(arg match {
          case GInt(n) => n.toInt
          case other => throw new IllegalArgumentException("ntile expects an int")
        }, w)
        case "lag" => GWindows.lagDefault(compile(arg), offset, default, w)
        case "lead" => GWindows.leadDefault(compile(arg), offset, default, w)
        case "eq" => pairwise(_ === _)
        case "ne" => pairwise(_ =!= _)
        case "lt" => pairwise(_ < _)
        case "le" => pairwise(_ <= _)
        case "gt" => pairwise(_ > _)
        case "ge" => pairwise(_ >= _)
        case "sub" => pairwise(_ - _)
        case "count" => framed(count)
        case "sum" => framed(sum)
        case "mean" => framed(avg)
        case "min" => framed(min)
        case "max" => framed(max)
        case other => throw new IllegalArgumentException(s"unknown window op '$other'")
      }
    case _ => throw new IllegalArgumentException("window block must be an object")
  }

  // ─── shared helpers ───

  private def binary(v: GVal, f: (Column, Column) => Column): Column = {
    val args = nary(v)
    if (args.length != 2) throw new IllegalArgumentException("binary op needs 2 operands")
    f(args(0), args(1))
  }

  private def nary(v: GVal): Seq[Column] = v match {
    case GList(items) => items.map(compile)
    case single => Seq(compile(single))
  }

  /** SQL-text mirror of [[compile]] for the core operator set — powers the
    * `toSql` reflection field (reference interface.py:109-115). Ops outside
    * the SQL-expressible core return None, which the executor propagates as
    * a null toSql. */
  def toSqlOpt(v: GVal): Option[String] =
    try Some(toSql(v)) catch { case _: IllegalArgumentException => None }

  def toSql(v: GVal): String = v match {
    case GObj(fields) if fields.length == 1 =>
      val (op, arg) = fields.head
      def bin(sym: String) = { val Seq(a, b) = naryS(arg); s"($a $sym $b)" }
      norm(op) match {
        case "name" => arg match {
          case GStr(s) => s
          case _ => throw new IllegalArgumentException("toSql: nested name")
        }
        case "value" => litSql(arg)
        case "add" => bin("+")
        case "sub" => bin("-")
        case "mul" => bin("*")
        case "div" | "truediv" => bin("/")
        case "mod" => bin("%")
        case "eq" => bin("=")
        case "ne" => bin("<>")
        case "lt" => bin("<")
        case "le" => bin("<=")
        case "gt" => bin(">")
        case "ge" => bin(">=")
        case "and" => naryS(arg).mkString("(", " AND ", ")")
        case "or" => naryS(arg).mkString("(", " OR ", ")")
        case "not" | "inv" => s"(NOT ${toSql(arg)})"
        case "isin" => { val Seq(a, b) = naryS(arg); s"($a IN $b)" }
        case "notin" => { val Seq(a, b) = naryS(arg); s"($a NOT IN $b)" }
        case "coalesce" => naryS(arg).mkString("coalesce(", ", ", ")")
        case "ifelse" =>
          val Seq(c, t, e) = naryS(arg)
          s"CASE WHEN $c THEN $t ELSE $e END"
        case "length" => s"length(${toSql(arg)})"
        case "lower" => s"lower(${toSql(arg)})"
        case "upper" => s"upper(${toSql(arg)})"
        case "abs" => s"abs(${toSql(arg)})"
        case other => throw new IllegalArgumentException(s"toSql: unknown op '$other'")
      }
    case GObj(Seq(("value", v2))) => litSql(v2)
    case other => throw new IllegalArgumentException(s"toSql: expression must be an object")
  }

  private def naryS(v: GVal): Seq[String] = v match {
    case GList(items) => items.map {
      case GObj(Seq(("value", GList(xs)))) => xs.map(litSql).mkString("(", ", ", ")")
      case item => toSql(item)
    }
    case single => Seq(toSql(single))
  }

  def litSql(v: GVal): String = v match {
    case GInt(x) => x.toString
    case GFloat(x) => x.toString
    case GStr(x) => "'" + x.replace("'", "''") + "'"
    case GBool(x) => x.toString.toUpperCase
    case GNull => "NULL"
    case GEnum(x) => "'" + x + "'"
    case GList(xs) => xs.map(litSql).mkString("(", ", ", ")")
    case _: GObj => throw new IllegalArgumentException("litSql: unexpected object")
  }

  def scalaOf(v: GVal): Any = v match {
    case GInt(x) => x
    case GFloat(x) => x
    case GStr(x) => x
    case GBool(x) => x
    case GEnum(x) => x
    case GNull => null
    case GList(xs) => xs.map(scalaOf)
    case _: GObj => throw new IllegalArgumentException("unexpected object value")
  }
}
