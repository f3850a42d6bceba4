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
    case t: java.time.LocalTime => quote(t.toString)
    case d: java.time.Duration =>
      quote(isoDuration(0, d.toDays, d.getSeconds % 86400L, d.getNano))
    case p: java.time.Period =>
      quote(isoDuration(p.getYears * 12 + p.getMonths, p.getDays, 0, 0))
    case i: org.apache.spark.unsafe.types.CalendarInterval =>
      // month-day-nano semantics: months always rendered, even when zero
      // (reference Duration codec, scalars.py:34-42)
      quote(isoDuration(i.months, i.days, i.microseconds / 1000000L,
        (i.microseconds % 1000000L) * 1000L, forceMonths = true))
    case b: Array[Byte] => quote(Base64.getEncoder.encodeToString(b))
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${quote(k.toString)}:${write(x)}" }.mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(write).mkString("[", ",", "]")
    case a: Array[_] => a.map(write).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.zip(r.toSeq)
        .map { case (k, x) => s"${quote(k)}:${write(x)}" }.mkString("{", ",", "}")
    case other => quote(other.toString)
  }

  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  /** ISO-8601 duration (reference Duration scalar, scalars.py:25-56):
    * `P[nM][nD][T[nH][nM][n[.f]S]]`; zero → "P0D"; `forceMonths` renders
    * the month component even when 0 (month-day-nano contract). */
  def isoDuration(months: Long, days: Long, secs: Long, nanos: Long,
                  forceMonths: Boolean = false): String = {
    val sb = new StringBuilder("P")
    if (months != 0 || forceMonths) sb.append(months).append('M')
    if (days != 0) sb.append(days).append('D')
    var s = secs
    val h = s / 3600; s %= 3600
    val m = s / 60; s %= 60
    if (h != 0 || m != 0 || s != 0 || nanos != 0) {
      sb.append('T')
      if (h != 0) sb.append(h).append('H')
      if (m != 0) sb.append(m).append('M')
      if (s != 0 || nanos != 0) {
        if (nanos == 0) sb.append(s)
        else sb.append(java.math.BigDecimal.valueOf(s * 1000000000L + nanos, 9)
          .stripTrailingZeros().toPlainString)
        sb.append('S')
      }
    }
    if (sb.length == 1) sb.append("0D")
    sb.toString
  }

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
