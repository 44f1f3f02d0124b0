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

  def parse(text: String): Table = {
    val root = mutable.LinkedHashMap[String, Any]()
    var current = root
    val lines = text.split("\n", -1).iterator.buffered
    val buffer = new StringBuilder

    // Comments are stripped PER PHYSICAL LINE before joining — a '#'
    // inside a multi-line array would otherwise truncate the whole rest of
    // the buffer and leave the bracket depth unclosed. (Limitation: '#'
    // inside a multi-line triple-quoted string isn't supported; the
    // reference configs keep regexes on one line.)
    def logicalLines: Iterator[String] = new Iterator[String] {
      override def hasNext: Boolean = lines.hasNext
      override def next(): String = {
        buffer.clear()
        buffer.append(stripComment(lines.next()))
        // Join continuation lines of unclosed multi-line strings / arrays.
        while (lines.hasNext && needsMore(buffer.toString)) {
          buffer.append("\n").append(stripComment(lines.next()))
        }
        buffer.toString
      }
    }

    for (rawLine <- logicalLines) {
      val line = rawLine.trim
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val path = parseKeyPath(line.substring(2, line.length - 2))
          current = descendForArrayOfTables(root, path)
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val path = parseKeyPath(line.substring(1, line.length - 1))
          current = descend(root, path)
        } else {
          val eq = topLevelIndexOf(line, '=')
          require(eq > 0, s"bad TOML line: $line")
          val key = unquoteKey(line.substring(0, eq).trim)
          val value = parseValue(line.substring(eq + 1).trim)
          current.put(key, value)
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

  private[config] def parseValue(s: String): Any = {
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
      else splitTopLevel(inner, ',').map(_.trim).filter(_.nonEmpty).map(parseValue)
    } else if (t.startsWith("{") && t.endsWith("}")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) Map.empty[String, Any]
      else splitTopLevel(inner, ',').map { kv =>
        val eq = topLevelIndexOf(kv, '=')
        unquoteKey(kv.substring(0, eq).trim) -> parseValue(kv.substring(eq + 1).trim)
      }.toMap
    } else if (t == "true") true
    else if (t == "false") false
    else {
      val n = t.replace("_", "")
      if (n.matches("[+-]?\\d+")) n.toLong
      else if (n.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") ||
        n.matches("[+-]?\\d+[eE][+-]?\\d+")) n.toDouble
      else t // dates etc. stay strings
    }
  }

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
