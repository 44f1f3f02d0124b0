package graft.config

import scala.collection.mutable

/** Minimal TOML parser covering the subset the reference's config files
  * use (`config.example.toml`, `historical_personal_bests.example.toml`,
  * `historical_collection_logs.example.toml`): tables, dotted table
  * headers, arrays of tables (`[[a.b]]`), inline tables, arrays (incl.
  * nested), basic/literal/triple-quoted strings, integers, floats,
  * booleans, and comments.
  *
  * No third-party dependency exists in this environment (zero egress), so
  * this is hand-rolled against the TOML v1 grammar for exactly that
  * subset — enough for a reference user to point the engine at their
  * existing config unchanged. Values surface as
  * String | Long | Double | Boolean | Seq[Any] | Map[String, Any].
  */
object Toml {

  type Table = Map[String, Any]

  /** A located parse/validation diagnostic — the counterpart of the
    * reference's `Validate_toml.py` caret report (reference
    * `src/Validate_toml.py:13-55`): 1-based line/column, the message,
    * and the offending physical line for rendering.
    */
  final case class TomlError(line: Int, column: Int, message: String,
      lineText: String) {
    /** The reference validator's display shape: message with location,
      * then the offending line with a caret under the column.
      */
    def render: String =
      s"TOML error: $message (at line $line, column $column)\n" +
        s"  | $lineText\n" +
        s"  | ${" " * math.max(0, column - 1)}^"
  }

  final class TomlParseException(val error: TomlError)
    extends RuntimeException(
      s"TOML error: ${error.message} " +
        s"(at line ${error.line}, column ${error.column})")

  // Raised by parseValue on a strict-mode violation; the line loop
  // attaches the location (parseValue itself has none) by finding the
  // token in the offending line.
  private final class BareValueException(val token: String, message: String)
    extends RuntimeException(message)

  def parse(text: String): Table = parseImpl(text, strict = false)

  /** [[parse]] plus the checks the lenient reader tolerates (a bare
    * non-date token as a value; see [[validate]]). The lenient mode is
    * the load path — existing configs keep working — and strict is the
    * lint path.
    */
  def parseStrict(text: String): Table = parseImpl(text, strict = true)

  /** Lint `text`: None when it parses strictly, or the FIRST located
    * diagnostic. This (with [[TomlError.render]]) is the engine's
    * `Validate_toml.py` parity surface.
    */
  def validate(text: String): Option[TomlError] =
    try { parseStrict(text); None }
    catch { case e: TomlParseException => Some(e.error) }

  private def parseImpl(text: String, strict: Boolean): Table = {
    val root = mutable.LinkedHashMap[String, Any]()
    var current = root
    val physical = text.split("\n", -1)
    val lines = physical.iterator.buffered
    var lineNo = 0 // 1-based number of the last physical line consumed
    val buffer = new StringBuilder

    def fail(startLine: Int, column: Int, message: String): Nothing =
      throw new TomlParseException(TomlError(startLine, column, message,
        physical(math.min(startLine, physical.length) - 1)))

    // Comments are stripped PER PHYSICAL LINE before joining — a '#'
    // inside a multi-line array would otherwise truncate the whole rest of
    // the buffer and leave the bracket depth unclosed. (Limitation: '#'
    // inside a multi-line triple-quoted string isn't supported; the
    // reference configs keep regexes on one line.)
    def logicalLines: Iterator[(String, Int)] = new Iterator[(String, Int)] {
      override def hasNext: Boolean = lines.hasNext
      override def next(): (String, Int) = {
        buffer.clear()
        buffer.append(stripComment(lines.next()))
        lineNo += 1
        val start = lineNo
        // Table headers are single-line by grammar: never join them, so a
        // corrupt '[header' reports as an unterminated header at ITS line
        // instead of swallowing the rest of the file as a "multi-line
        // value" (a key's value can also open with '[', but then the
        // line carries an '=').
        val headerLike = buffer.toString.trim.startsWith("[") &&
          topLevelIndexOf(buffer.toString, '=') == -1
        // Join continuation lines of unclosed multi-line strings / arrays.
        while (!headerLike && lines.hasNext && needsMore(buffer.toString)) {
          buffer.append("\n").append(stripComment(lines.next()))
          lineNo += 1
        }
        if (!headerLike && needsMore(buffer.toString))
          fail(start, 1,
            "unclosed multi-line value (string or array reaches end of file)")
        (buffer.toString, start)
      }
    }

    for ((rawLine, startLine) <- logicalLines) {
      val line = rawLine.trim
      if (line.nonEmpty) {
        try {
          if (line.startsWith("[[")) {
            if (!line.endsWith("]]"))
              fail(startLine, rawLine.length,
                "unterminated array-of-tables header (expected ']]')")
            val path = parseKeyPath(line.substring(2, line.length - 2))
            current = descendForArrayOfTables(root, path)
          } else if (line.startsWith("[")) {
            if (!line.endsWith("]"))
              fail(startLine, rawLine.length,
                "unterminated table header (expected ']')")
            val path = parseKeyPath(line.substring(1, line.length - 1))
            current = descend(root, path)
          } else {
            val eq = topLevelIndexOf(line, '=')
            if (eq <= 0)
              fail(startLine, 1, "expected 'key = value', '[table]' or " +
                s"'[[array-of-tables]]', got: ${line.take(40)}")
            val key = unquoteKey(line.substring(0, eq).trim)
            val value = parseValue(line.substring(eq + 1).trim, strict)
            current.put(key, value)
          }
        } catch {
          case e: TomlParseException => throw e
          case e: BareValueException =>
            // rawLine is the newline-JOINED logical line: map the match
            // offset back to its PHYSICAL line and in-line column, so a
            // bad token on a continuation line gets the right line
            // number, the right lineText, and a caret that lands on it.
            rawLine.indexOf(e.token) match {
              case -1 => fail(startLine, 1, e.getMessage)
              case i =>
                val before = rawLine.substring(0, i)
                val lineOff = before.count(_ == '\n')
                val col = i - (before.lastIndexOf('\n') + 1) + 1
                fail(startLine + lineOff, col, e.getMessage)
            }
          case scala.util.control.NonFatal(e) =>
            fail(startLine, 1, Option(e.getMessage).getOrElse(e.toString))
        }
      }
    }
    deepImmutable(root).asInstanceOf[Table]
  }

  /** A logical line (already comment-stripped) is incomplete while inside
    * an unclosed array or triple-quoted string.
    */
  private def needsMore(s: String): Boolean = {
    val noComment = s
    val tripleCount = "'''".r.findAllIn(noComment).size + "\"\"\"".r.findAllIn(noComment).size
    if (tripleCount % 2 == 1) return true
    var depth = 0
    var i = 0
    var inStr: Char = 0
    while (i < noComment.length) {
      val c = noComment.charAt(i)
      if (inStr != 0) { if (c == inStr) inStr = 0 }
      else c match {
        case '"' | '\'' => inStr = c
        case '[' => depth += 1
        case ']' => depth -= 1
        case _ =>
      }
      i += 1
    }
    depth > 0
  }

  private def stripComment(line: String): String = {
    var inStr: Char = 0
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inStr != 0) { if (c == inStr && (inStr != '\'' || true)) inStr = 0 }
      else c match {
        case '"' | '\'' => inStr = c
        case '#' => return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def parseKeyPath(s: String): Seq[String] =
    splitTopLevel(s, '.').map(unquoteKey)

  private def unquoteKey(k: String): String = {
    val t = k.trim
    if ((t.startsWith("\"") && t.endsWith("\"")) ||
      (t.startsWith("'") && t.endsWith("'"))) t.substring(1, t.length - 1)
    else t
  }

  private def descend(root: mutable.LinkedHashMap[String, Any],
      path: Seq[String]): mutable.LinkedHashMap[String, Any] =
    path.foldLeft(root) { (acc, k) =>
      acc.get(k) match {
        case Some(m: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) => m
        case Some(buf: mutable.ArrayBuffer[Any @unchecked]) =>
          buf.last.asInstanceOf[mutable.LinkedHashMap[String, Any]]
        case None =>
          val m = mutable.LinkedHashMap[String, Any]()
          acc.put(k, m)
          m
        case other => sys.error(s"TOML path conflict at $k: $other")
      }
    }

  private def descendForArrayOfTables(root: mutable.LinkedHashMap[String, Any],
      path: Seq[String]): mutable.LinkedHashMap[String, Any] = {
    val parent = descend(root, path.init)
    val entry = mutable.LinkedHashMap[String, Any]()
    parent.get(path.last) match {
      case Some(buf: mutable.ArrayBuffer[Any @unchecked]) => buf += entry
      case None =>
        parent.put(path.last, mutable.ArrayBuffer[Any](entry))
      case other => sys.error(s"TOML [[${path.mkString(".")}]] conflicts with $other")
    }
    entry
  }

  private[config] def parseValue(s: String): Any =
    parseValue(s, strict = false)

  private def parseValue(s: String, strict: Boolean): Any = {
    val t = s.trim
    if (t.startsWith("'''") && t.endsWith("'''") && t.length >= 6)
      t.substring(3, t.length - 3).stripPrefix("\n")
    else if (t.startsWith("\"\"\"") && t.endsWith("\"\"\"") && t.length >= 6)
      unescape(t.substring(3, t.length - 3).stripPrefix("\n"))
    else if (t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1)
    else if (t.startsWith("\"") && t.endsWith("\""))
      unescape(t.substring(1, t.length - 1))
    else if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any]
      else splitTopLevel(inner, ',').map(_.trim).filter(_.nonEmpty)
        .map(parseValue(_, strict))
    } else if (t.startsWith("{") && t.endsWith("}")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) Map.empty[String, Any]
      else splitTopLevel(inner, ',').map { kv =>
        val eq = topLevelIndexOf(kv, '=')
        if (eq <= 0)
          throw new BareValueException(kv.trim,
            s"expected 'key = value' in inline table, got: ${kv.trim.take(40)}")
        unquoteKey(kv.substring(0, eq).trim) ->
          parseValue(kv.substring(eq + 1).trim, strict)
      }.toMap
    } else if (t == "true") true
    else if (t == "false") false
    else {
      val n = t.replace("_", "")
      if (n.matches("[+-]?\\d+")) n.toLong
      else if (n.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") ||
        n.matches("[+-]?\\d+[eE][+-]?\\d+")) n.toDouble
      else {
        // Lenient mode keeps unknown bare tokens as strings (dates and
        // times ride through this way). Strict mode — the lint path —
        // accepts only what TOML itself accepts bare: dates, times,
        // prefixed ints, and the float specials.
        if (strict && !bareTokenOk(t))
          throw new BareValueException(t,
            s"invalid bare value (quote it if it is a string): ${t.take(40)}")
        t
      }
    }
  }

  // TOML bare tokens that are NOT plain ints/floats/bools: local dates,
  // date-times (space or T separator, optional fraction and offset),
  // local times, hex/oct/bin integers, inf/nan.
  private def bareTokenOk(t: String): Boolean =
    t.matches("\\d{4}-\\d{2}-\\d{2}" +
      "([Tt ]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?([Zz]|[+-]\\d{2}:\\d{2})?)?") ||
    t.matches("\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?") ||
    t.matches("0[xX][0-9a-fA-F_]+|0[oO][0-7_]+|0[bB][01_]+") ||
    t.matches("[+-]?(inf|nan)")

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split on `sep` outside strings/brackets/braces. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var depth = 0
    var inStr: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr != 0) { sb.append(c); if (c == inStr) inStr = 0 }
      else c match {
        case '"' | '\'' => inStr = c; sb.append(c)
        case '[' | '{' => depth += 1; sb.append(c)
        case ']' | '}' => depth -= 1; sb.append(c)
        case `sep` if depth == 0 => parts += sb.toString; sb.clear()
        case _ => sb.append(c)
      }
      i += 1
    }
    if (sb.nonEmpty) parts += sb.toString
    parts.toSeq
  }

  private def topLevelIndexOf(s: String, target: Char): Int = {
    var inStr: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr != 0) { if (c == inStr) inStr = 0 }
      else if (c == '"' || c == '\'') inStr = c
      else if (c == target) return i
      i += 1
    }
    -1
  }

  // VectorMap keeps declaration order — variant/group order is the
  // dispatch order and MUST survive (first-match-wins semantics).
  private def deepImmutable(v: Any): Any = v match {
    case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
      scala.collection.immutable.VectorMap.from(
        m.iterator.map { case (k, x) => k -> deepImmutable(x) })
    case buf: mutable.ArrayBuffer[Any @unchecked] => buf.map(deepImmutable).toSeq
    case other => other
  }
}
