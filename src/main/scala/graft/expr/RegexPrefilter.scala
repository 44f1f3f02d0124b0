package graft.expr

/** Conservative required-literal extraction from a Java regex: returns the
  * longest plain substring that EVERY match of the pattern must contain,
  * or None when no literal can be proven required. Used as an `indexOf`
  * prefilter in front of `Matcher.find` — regex engines pay their full
  * cost on non-matching inputs (the common case for a 35-variant
  * first-match dispatch), while an indexOf over the row is a SIMD-friendly
  * scan.
  *
  * Conservative rules (anything uncertain → not required):
  *  - only TOP-LEVEL characters count (inside any group `(...)` the
  *    contents may be optional/alternated — skipped entirely);
  *  - a top-level alternation `|` makes the whole pattern bail (None);
  *  - class shorthands (`\d`, `\s`, …), character classes, `.`, anchors
  *    break the current run;
  *  - a literal directly followed by `?`, `*` or `{` is optional → dropped
  *    and the run breaks; `+` keeps the char (≥1 occurrence, and the last
  *    repetition stays adjacent to what follows) but breaks the run after;
  *  - escaped literals (`\.`, `\(`, …) count as their character.
  */
object RegexPrefilter {

  // Zero-operand class/anchor shorthands: consume the escape, break the
  // current run, and keep scanning. Any OTHER escaped alphanumeric
  // (\uXXXX \xhh \p{...} \k<...> \Q \E \0n, multi-digit backrefs, ...)
  // takes an operand this scanner does not model — the operand's
  // characters would be misread as required literals — so the whole
  // pattern conservatively yields no prefilter. Escaped punctuation
  // (\. \( \* \| ...) denotes the char itself.
  private val ZeroOperandEscape = "dDsSwWbBAGZz"

  def requiredLiteral(regex: String, minLength: Int = 3): Option[String] = {
    val runs = Seq.newBuilder[String]
    val cur = new StringBuilder
    def breakRun(): Unit = { if (cur.nonEmpty) runs += cur.result(); cur.clear() }

    var i = 0
    var depth = 0
    val n = regex.length
    while (i < n) {
      regex.charAt(i) match {
        case '\\' =>
          if (i + 1 >= n) { breakRun(); i += 1 }
          else {
            val next = regex.charAt(i + 1)
            if (ZeroOperandEscape.indexOf(next) >= 0) { breakRun(); i += 2 }
            else if (Character.isLetterOrDigit(next)) return None
            else {
              // escaped literal — subject to a following quantifier
              val after = if (i + 2 < n) regex.charAt(i + 2) else ' '
              if (depth == 0) {
                if (after == '?' || after == '*' || after == '{') breakRun()
                else if (after == '+') { cur += next; breakRun() }
                else cur += next
              }
              i += 2
            }
          }
        case '[' =>
          breakRun()
          // skip the class, tracking NESTED classes ([a&&[^b]]) so the
          // outer ']' is never misread as a top-level literal
          i += 1
          if (i < n && regex.charAt(i) == '^') i += 1
          if (i < n && regex.charAt(i) == ']') i += 1
          var classDepth = 1
          while (i < n && classDepth > 0) {
            regex.charAt(i) match {
              case '\\' => i += 2
              case '[' => classDepth += 1; i += 1
              case ']' => classDepth -= 1; i += 1
              case _ => i += 1
            }
          }
        case '(' =>
          breakRun()
          // "(?..." special constructs: lookarounds/named/non-capturing
          // ('=', '!', ':', '<') are safe — their contents are depth-
          // skipped. Anything else after "(?" is an inline FLAG construct
          // ((?i), (?im:...), (?x) ...) that changes matching semantics
          // for the rest of the pattern (case-insensitivity, comment
          // mode), so no literal can be proven required: bail.
          if (i + 1 < n && regex.charAt(i + 1) == '?') {
            if (i + 2 >= n) return None
            val c2 = regex.charAt(i + 2)
            if (c2 != '=' && c2 != '!' && c2 != ':' && c2 != '<') return None
          }
          depth += 1; i += 1
        case ')' => breakRun(); depth = math.max(0, depth - 1); i += 1
        case '|' =>
          if (depth == 0) return None // top-level alternation: nothing required
          i += 1
        case '{' =>
          breakRun()
          while (i < n && regex.charAt(i) != '}') i += 1
          i += 1
        case c @ ('.' | '^' | '$' | '?' | '*' | '+') =>
          // quantifiers here apply to a group/class/shorthand (a quantified
          // top-level literal is handled at the literal); all break the run.
          breakRun(); i += 1; val _ = c
        case c =>
          if (depth == 0) {
            val after = if (i + 1 < n) regex.charAt(i + 1) else ' '
            if (after == '?' || after == '*' || after == '{') breakRun()
            else if (after == '+') { cur += c; breakRun() }
            else cur += c
          }
          i += 1
      }
    }
    breakRun()
    runs.result().filter(_.length >= minLength)
      .sortBy(-_.length).headOption
  }
}
