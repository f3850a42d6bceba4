package graft.graphql

import java.util.Base64

/** Minimal JSON writer for response serialization (§1.2 scalar codecs:
  * timestamps/dates ISO, decimals as strings, binary as base64). */
object Json {
  def write(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case f: Float => num(f.toDouble)
    case d: Double => num(d)
    case d: java.math.BigDecimal => quote(d.toPlainString)
    case d: BigDecimal => quote(d.bigDecimal.toPlainString)
    case t: java.sql.Timestamp => quote(t.toLocalDateTime.toString)
    case t: java.time.LocalDateTime => quote(t.toString)
    case t: java.time.Instant => quote(t.toString)
    case d: java.sql.Date => quote(d.toLocalDate.toString)
    case d: java.time.LocalDate => quote(d.toString)
    case b: Array[Byte] => quote(Base64.getEncoder.encodeToString(b))
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${quote(k.toString)}:${write(x)}" }.mkString("{", ",", "}")
    case s: Seq[_] => s.map(write).mkString("[", ",", "]")
    case a: Array[_] => a.map(write).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.zip(r.toSeq)
        .map { case (k, x) => s"${quote(k)}:${write(x)}" }.mkString("{", ",", "}")
    case other => quote(other.toString)
  }

  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  /** Ordered object writer (selection order is significant in GraphQL). */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${quote(k)}:$v" }.mkString("{", ",", "}")
}
