package graft.graphql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import GVal._

/** Expression-tree input → Spark Column (reference Expression input,
  * inputs.py:249-315): exactly-one-leaf objects composing column refs,
  * literals, comparisons, boolean ops, arithmetic, coalesce/ifelse, and
  * string/numeric function sub-blocks.
  *
  * Shape: {name: "col"} | {value: 3.5} |
  *        {add|sub|mul|div: [e, e]} | {eq|ne|lt|le|gt|ge: [e, e]} |
  *        {and|or: [e, ...]} | {not: e} | {coalesce: [e, ...]} |
  *        {ifelse: [cond, then, else]} |
  *        {length|lower|upper|abs: e}
  */
object Exprs {

  def compile(v: GVal): Column = v match {
    case o @ GObj(fields) =>
      if (fields.length != 1)
        throw new IllegalArgumentException(
          s"expression object must have exactly one key, got ${fields.map(_._1)}")
      val (op, arg) = fields.head
      op match {
        case "name" => col(str(arg))
        case "value" => lit(scalaOf(arg))
        case "add" => binary(arg, _ + _)
        case "sub" => binary(arg, _ - _)
        case "mul" => binary(arg, _ * _)
        case "div" => binary(arg, _ / _)
        case "eq" => binary(arg, _ === _)
        case "ne" => binary(arg, _ =!= _)
        case "lt" => binary(arg, _ < _)
        case "le" => binary(arg, _ <= _)
        case "gt" => binary(arg, _ > _)
        case "ge" => binary(arg, _ >= _)
        case "and" => nary(arg).reduce(_ && _)
        case "or" => nary(arg).reduce(_ || _)
        case "not" => !compile(arg)
        case "coalesce" => coalesce(nary(arg): _*)
        case "ifelse" =>
          val Seq(c, t, e) = nary(arg)
          when(c, t).otherwise(e)
        case "length" => length(compile(arg))
        case "lower" => lower(compile(arg))
        case "upper" => upper(compile(arg))
        case "abs" => abs(compile(arg))
        case other => throw new IllegalArgumentException(s"unknown expression op '$other'")
      }
    case other => throw new IllegalArgumentException(s"expression must be an object, got $other")
  }

  private def binary(v: GVal, f: (Column, Column) => Column): Column = {
    val args = nary(v)
    if (args.length != 2) throw new IllegalArgumentException("binary op needs 2 operands")
    f(args(0), args(1))
  }

  private def nary(v: GVal): Seq[Column] = v match {
    case GList(items) => items.map(compile)
    case single => Seq(compile(single))
  }

  private def str(v: GVal): String = v match {
    case GStr(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }

  /** SQL-text mirror of [[compile]] — powers the `toSql` reflection field
    * (reference interface.py:109-115 compiles its expression tree to SQL;
    * here the same input renders to ANSI SQL). */
  def toSql(v: GVal): String = v match {
    case GObj(fields) if fields.length == 1 =>
      val (op, arg) = fields.head
      def bin(sym: String) = { val Seq(a, b) = naryS(arg); s"($a $sym $b)" }
      op match {
        case "name" => arg match {
          case GStr(s) => s
          case _ => throw new IllegalArgumentException("name must be a string")
        }
        case "value" => litSql(arg)
        case "add" => bin("+")
        case "sub" => bin("-")
        case "mul" => bin("*")
        case "div" => bin("/")
        case "eq" => bin("=")
        case "ne" => bin("<>")
        case "lt" => bin("<")
        case "le" => bin("<=")
        case "gt" => bin(">")
        case "ge" => bin(">=")
        case "and" => naryS(arg).mkString("(", " AND ", ")")
        case "or" => naryS(arg).mkString("(", " OR ", ")")
        case "not" => s"(NOT ${toSql(arg)})"
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
    case other => throw new IllegalArgumentException(s"toSql: expression must be an object")
  }

  private def naryS(v: GVal): Seq[String] = v match {
    case GList(items) => items.map(toSql)
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
