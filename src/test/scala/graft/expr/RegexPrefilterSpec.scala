package graft.expr

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

class RegexPrefilterSpec extends AnyFunSuite {

  private def lit(regex: String) = RegexPrefilter.requiredLiteral(regex)

  test("extracts the longest top-level literal run") {
    assert(lit("^(.+?)\\s+received a drop: (.*?)$").contains("received a drop: "))
    assert(lit("^(.+?)\\s+has reached ([\\w\\s]+) level (\\d+)\\.?$")
      .contains("has reached "))
  }

  test("bails on top-level alternation; ignores group-internal ones") {
    assert(lit("foo bar|baz qux").isEmpty)
    assert(lit("(alpha|beta) completed a quest").contains(" completed a quest"))
  }

  test("quantified literals are not required") {
    assert(lit("colou?r and more").contains("r and more")) // 'u?' optional
    assert(lit("ab{0,3}cdef").contains("cdef"))
    assert(lit("abc*defg").contains("defg"))
    // 'a+' requires at least one 'a', adjacent to what follows
    assert(lit("xy+z mnopq").contains("z mnopq"))
  }

  test("classes, shorthands, dots and escapes break runs correctly") {
    assert(lit("abc[de]fghi").contains("fghi"))
    assert(lit("total \\d+ coins").contains("total ")) // length tie → first run
    assert(lit("end of msg\\.").contains("end of msg."))
    assert(lit("a.b.c.d").isEmpty) // only 1-char runs
    assert(lit("\\(escaped parens\\)").contains("(escaped parens)"))
    // Escapes with operands this scanner doesn't model (\Q..\E, \p{..},
    // \uXXXX, backrefs) bail the whole pattern — their operand chars
    // would otherwise be misclaimed as required literals.
    assert(lit("ab\\Qcdefgh\\Eij").isEmpty)
    assert(lit("\\p{Lu}big literal here").isEmpty)
    assert(lit("\\u0041xyz runs here").isEmpty)
    assert(lit("(group)\\1 with backref").isEmpty)
  }

  test("inline flag groups bail; nested classes are skipped whole") {
    // (?i) makes the literal case-insensitive — claiming it would skip
    // genuinely matching upper-case rows.
    assert(lit("(?i)^(.+?)\\s+received a drop: (.*)$").isEmpty)
    assert(lit("(?im:abc) and literals").isEmpty)
    // Safe "(?" constructs keep working (the config prefix shape).
    assert(lit("^(?:<:\\w+:\\d+>){0,2}\\s*(.+?)\\s+has reached a combat level")
      .contains("has reached a combat level"))
    assert(lit("(?=lookahead)big literal run").contains("big literal run"))
    // Nested class: the outer ']' must not leak into a literal run.
    assert(lit("[a-z&&[^b]]abcdef").contains("abcdef"))
  }

  test("every matching fixture message contains its variant's prefilter") {
    // The load-bearing property: a string that MATCHES a pattern always
    // contains that pattern's claimed literal — so skipping the regex on
    // indexOf-miss can never change results. Checked over the full
    // fixture corpus (every broadcast family + edge cases) crossed with
    // EVERY variant, not just the one that wins the dispatch.
    val variants = graft.parse.OsrsPatterns.default.groups.flatMap(_.variants)
    assert(variants.nonEmpty)
    var withPrefilter = 0
    variants.foreach { v =>
      lit(v.regex).foreach { p =>
        withPrefilter += 1
        val pat = Pattern.compile(v.regex)
        graft.parse.OsrsFixtures.messages.foreach { case (_, m) =>
          if (pat.matcher(m).find())
            assert(m.contains(p), s"match without literal '$p': $m ~ ${v.regex}")
        }
      }
    }
    // The config's phrase-style patterns should nearly all get a prefilter.
    assert(withPrefilter >= variants.size / 2,
      s"only $withPrefilter of ${variants.size} variants got a prefilter")
  }

  test("dispatch results are identical with and without prefilters") {
    val payload = graft.parse.PatternCompiler.broadcastPayload
    val variants = graft.parse.OsrsPatterns.default.groups.flatMap(g =>
      g.variants.map(v => graft.expr.DispatchVariant(
        v.regex, v.columns, v.required, Some(g.broadcastType))))
    val table = ParseDispatch.compile(variants, payload)
    val noPrefilter = new DispatchTable(table.variants.map(v =>
      new CompiledDispatchVariant(v.pattern, v.kinds, v.groups, v.btype,
        v.requiredIdx, null)))
    val extra = Seq("Noise that matches nothing at all", "")
    (graft.parse.OsrsFixtures.messages.map(_._2) ++ extra).foreach { m =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(m)
      val a = ParseDispatch.run(table, s)
      val b = ParseDispatch.run(noPrefilter, s)
      assert(a == b, s"prefilter changed result for: $m")
    }
  }
}
