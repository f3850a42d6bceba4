package graft.graphql

import GVal._

/** Recursive-descent parser for the GraphQL executable-document subset:
  * `[query [Name][(vars)]] { field(arg: value, ...) { ... } ... }` plus
  * `fragment Name on Type { ... }` definitions, `...Name` spreads,
  * `... on Type { ... }` inline fragments, and `$var` values with
  * operation-level defaults. Aliases (`out: field`), int/float/string/
  * boolean/null/enum/list/object values. Commas are whitespace; `#`
  * comments to end of line. (Reference column queries rely on inline
  * fragments on typed columns, tests/test_models.py.)
  */
final class ParseError(msg: String, pos: Int) extends RuntimeException(s"$msg at offset $pos")

object Parser {
  def parse(text: String): GDocument = parse(text, Map.empty)

  def parse(text: String, variables: Map[String, GVal]): GDocument =
    parse(text, variables, None)

  /** Multi-operation documents: `operationName` selects the operation to
    * execute (GraphQL-over-HTTP contract); with several operations and no
    * name the request is ambiguous and rejected, per the spec. */
  def parse(text: String, variables: Map[String, GVal],
            operationName: Option[String]): GDocument =
    new Parser(text, variables).document(operationName)
}

private final class Parser(s: String, provided: Map[String, GVal]) {
  private var i = 0
  private var vars = Map.empty[String, GVal]
  private val fragments =
    scala.collection.mutable.Map.empty[String, (String, Seq[GField])]

  private def err(msg: String): Nothing = throw new ParseError(msg, i)

  private def ws(): Unit = {
    while (i < s.length && (s(i).isWhitespace || s(i) == ',' || s(i) == '#')) {
      if (s(i) == '#') while (i < s.length && s(i) != '\n') i += 1
      else i += 1
    }
  }

  private def atEnd: Boolean = i >= s.length
  private def peek: Char = if (i < s.length) s(i) else '\u0000'

  private def expect(c: Char): Unit = {
    ws()
    if (peek != c) err(s"expected '$c' but found '$peek'")
    i += 1
  }

  private def isNameStart(c: Char) = c == '_' || c.isLetter
  private def isNamePart(c: Char) = c == '_' || c.isLetterOrDigit

  private def name(): String = {
    ws()
    if (!isNameStart(peek)) err(s"expected name, found '$peek'")
    val start = i
    while (i < s.length && isNamePart(s(i))) i += 1
    s.substring(start, i)
  }

  def document(operationName: Option[String] = None): GDocument = {
    ws()
    // definitions in any order: operations + any number of fragments
    val ops = Seq.newBuilder[(Option[String], Seq[GField])]
    while (!atEnd) {
      ws()
      if (atEnd) ()
      else if (peek == '{') {
        vars = Map.empty
        ops += (None -> selectionSet())
      } else if (isNameStart(peek)) {
        name() match {
          case "query" =>
            ws()
            val opName = if (isNameStart(peek)) Some(name()) else None
            ws()
            vars = Map.empty // variable definitions are per-operation
            if (peek == '(') variableDefs()
            ops += (opName -> selectionSet())
          case "fragment" =>
            val fname = name()
            val on = name()
            if (on != "on") err("expected 'on' in fragment definition")
            val cond = name() // type condition, enforced where types can vary
            fragments(fname) = (cond, selectionSet())
          case kw => err(s"unsupported operation '$kw'")
        }
      } else err(s"unexpected '$peek'")
      ws()
    }
    val parsed = ops.result()
    if (parsed.isEmpty) err("no operation found")
    val sels = operationName match {
      case Some(n) => parsed.collectFirst { case (Some(`n`), s) => s }
        .getOrElse(err(s"unknown operation '$n'"))
      case None =>
        if (parsed.length > 1)
          err("operationName required for multi-operation documents")
        parsed.head._2
    }
    GDocument(sels.flatMap(resolveSpreads))
  }

  /** `($x: Type = default, ...)` — types are parsed but not enforced. */
  private def variableDefs(): Unit = {
    expect('(')
    ws()
    while (peek != ')') {
      expect('$')
      val vn = name()
      expect(':')
      // type: Name, [Type], trailing ! — skipped structurally
      ws()
      def skipType(): Unit = {
        ws()
        if (peek == '[') { i += 1; skipType(); expect(']') } else name()
        ws()
        if (peek == '!') i += 1
      }
      skipType()
      ws()
      val default = if (peek == '=') { i += 1; Some(value()) } else None
      vars += (vn -> provided.getOrElse(vn,
        default.getOrElse(GNull)))
      ws()
    }
    i += 1
  }

  private def selectionSet(): Seq[GField] = {
    expect('{')
    val fields = Seq.newBuilder[GField]
    ws()
    while (peek != '}') {
      if (atEnd) err("unterminated selection set")
      fields += selection()
      ws()
    }
    i += 1 // consume }
    fields.result()
  }

  /** A field, a named spread `...F`, or an inline fragment `... on T {…}`.
    * Spreads are carried as marker fields and spliced by resolveSpreads. */
  private def selection(): GField = {
    ws()
    if (peek == '.') {
      if (!s.startsWith("...", i)) err("expected '...'")
      i += 3
      ws()
      if (isNameStart(peek)) {
        val n = name()
        if (n == "on") {
          val cond = name()
          GField(None, "...inline", Seq("on" -> GStr(cond)), selectionSet())
        } else GField(None, "...spread", Seq("name" -> GStr(n)), Nil)
      } else err("expected fragment name or 'on'")
    } else field()
  }

  private def field(): GField = {
    val first = name()
    ws()
    val (alias, fname) =
      if (peek == ':') { i += 1; (Some(first), name()) } else (None, first)
    ws()
    val args = if (peek == '(') arguments() else Nil
    ws()
    val sels = if (peek == '{') selectionSet() else Nil
    GField(alias, fname, args, sels)
  }

  /** Splice fragment spreads / inline fragments into the selection they
    * appear in. Spliced fields carry the fragment's type condition
    * (innermost wins for nested fragments); the executor enforces it where
    * the parent type can actually vary (_entities batches, typed columns)
    * and ignores it where GraphQL validation makes it trivially true. */
  private def resolveSpreads(f: GField): Seq[GField] =
    resolveSpreads(f, Set.empty)

  /** `visiting` = fragment names on the current expansion path: GraphQL
    * requires fragment-spread cycles be rejected, and without the guard a
    * self- or mutually-referencing fragment would recurse unboundedly. */
  private def resolveSpreads(f: GField, visiting: Set[String]): Seq[GField] =
    f.name match {
      case "...spread" =>
        val fname = f.arg("name").collect { case GStr(n) => n }.get
        if (visiting(fname)) err(s"fragment cycle through '$fname'")
        val (cond, sels) =
          fragments.getOrElse(fname, err(s"unknown fragment '$fname'"))
        sels.flatMap(resolveSpreads(_, visiting + fname)).map(tagCond(_, cond))
      case "...inline" =>
        val cond = f.arg("on").collect { case GStr(c) => c }
        f.sels.flatMap(resolveSpreads(_, visiting))
          .map(s => cond.fold(s)(tagCond(s, _)))
      case _ => Seq(f.copy(sels = f.sels.flatMap(resolveSpreads(_, visiting))))
    }

  private def tagCond(f: GField, cond: String): GField =
    if (f.typeCond.isDefined) f else f.copy(typeCond = Some(cond))

  private def arguments(): Seq[(String, GVal)] = {
    expect('(')
    val args = Seq.newBuilder[(String, GVal)]
    ws()
    while (peek != ')') {
      if (atEnd) err("unterminated arguments")
      val n = name()
      expect(':')
      args += (n -> value())
      ws()
    }
    i += 1
    args.result()
  }

  private def value(): GVal = {
    ws()
    peek match {
      case '"' => GStr(stringLit())
      case '$' =>
        i += 1
        val vn = name()
        vars.getOrElse(vn, provided.getOrElse(vn, err(s"undefined variable $$$vn")))
      case '[' =>
        i += 1; val items = Seq.newBuilder[GVal]; ws()
        while (peek != ']') {
          if (atEnd) err("unterminated list")
          items += value(); ws()
        }
        i += 1; GList(items.result())
      case '{' =>
        i += 1; val fields = Seq.newBuilder[(String, GVal)]; ws()
        while (peek != '}') {
          if (atEnd) err("unterminated object")
          val n = name(); expect(':'); fields += (n -> value()); ws()
        }
        i += 1; GObj(fields.result())
      case c if c == '-' || c.isDigit => numberLit()
      case c if isNameStart(c) =>
        name() match {
          case "true" => GBool(true)
          case "false" => GBool(false)
          case "null" => GNull
          case e => GEnum(e)
        }
      case c => err(s"unexpected '$c' in value")
    }
  }

  private def stringLit(): String = {
    expect('"')
    val sb = new StringBuilder
    while (peek != '"') {
      if (i >= s.length) err("unterminated string")
      if (peek == '\\') {
        i += 1
        sb.append(peek match {
          case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
          case 'b' => '\b'; case 'f' => '\f'
          case 'u' =>
            val hex = s.substring(i + 1, i + 5); i += 4
            Integer.parseInt(hex, 16).toChar
          case other => other
        })
        i += 1
      } else { sb.append(peek); i += 1 }
    }
    i += 1
    sb.toString
  }

  private def numberLit(): GVal = {
    val start = i
    if (peek == '-') i += 1
    while (i < s.length && s(i).isDigit) i += 1
    var isFloat = false
    if (peek == '.') { isFloat = true; i += 1; while (i < s.length && s(i).isDigit) i += 1 }
    if (peek == 'e' || peek == 'E') {
      isFloat = true; i += 1
      if (peek == '+' || peek == '-') i += 1
      while (i < s.length && s(i).isDigit) i += 1
    }
    val text = s.substring(start, i)
    if (isFloat) GVal.GFloat(text.toDouble) else GVal.GInt(text.toLong)
  }
}
