package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Config-lint parity with the reference's `Validate_toml.py` (reference
  * `src/Validate_toml.py:13-55`): corrupted variants of the reference's
  * OWN config.example.toml must produce located diagnostics — right line
  * number, sensible column, the offending line, a caret render — while
  * the pristine files stay diagnostic-free.
  */
class TomlValidateSpec extends AnyFunSuite {

  private val refDir = "/root/reference/src"

  private def read(name: String): Vector[String] =
    new String(Files.readAllBytes(Paths.get(s"$refDir/$name")),
      StandardCharsets.UTF_8).split("\n", -1).toVector

  private def firstIndexOf(lines: Vector[String], p: String => Boolean): Int = {
    val i = lines.indexWhere(p)
    assert(i >= 0, s"fixture line not found in the reference config")
    i
  }

  test("the reference's own TOMLs validate clean (strict parse)") {
    Seq("config.example.toml", "historical_personal_bests.example.toml",
      "historical_collection_logs.example.toml", "secrets.example.toml")
      .foreach { f =>
        val diag = Toml.validate(read(f).mkString("\n"))
        assert(diag.isEmpty, s"$f: ${diag.map(_.render)}")
      }
  }

  test("corruption 1: unterminated table header reports its line") {
    val lines = read("config.example.toml")
    // Break the first section header: "[something]" → "[something".
    val i = firstIndexOf(lines,
      l => l.trim.startsWith("[") && l.trim.endsWith("]") &&
        !l.trim.startsWith("[["))
    val bad = lines.updated(i, lines(i).trim.dropRight(1))
    val diag = Toml.validate(bad.mkString("\n"))
    assert(diag.isDefined)
    assert(diag.get.line == i + 1, diag.get.render)
    assert(diag.get.message.contains("unterminated table header"))
    assert(diag.get.lineText == bad(i))
  }

  test("corruption 2: '=' replaced by ':' reports the key/value line") {
    val lines = read("config.example.toml")
    val i = firstIndexOf(lines, l => l.contains(" = ") && !l.trim.startsWith("#"))
    val bad = lines.updated(i, lines(i).replaceFirst(" = ", " : "))
    val diag = Toml.validate(bad.mkString("\n"))
    assert(diag.isDefined)
    assert(diag.get.line == i + 1, diag.get.render)
    assert(diag.get.message.contains("expected 'key = value'"))
  }

  test("corruption 3: unquoted string value reports line AND column") {
    val lines = read("config.example.toml")
    // Strip the quotes off the first quoted single-line string value.
    val i = firstIndexOf(lines, l => l.matches("""\s*[A-Za-z0-9_]+\s*=\s*"[^"\\]+"\s*""") &&
      !l.contains("true") && !l.contains("false"))
    val unquoted = lines(i).replaceAll("\"", "")
    val bad = lines.updated(i, unquoted)
    val diag = Toml.validate(bad.mkString("\n"))
    assert(diag.isDefined)
    assert(diag.get.line == i + 1, diag.get.render)
    assert(diag.get.message.contains("invalid bare value"))
    // Column points INTO the bare token, not at the start of the line.
    val valueStart = unquoted.indexOf('=') + 1
    assert(diag.get.column > valueStart, diag.get.render)
    // The caret render carries all three pieces.
    val r = diag.get.render
    val caretLine = r.linesIterator.toSeq.last
    assert(r.contains(s"at line ${i + 1}") && r.contains(unquoted) &&
      caretLine.endsWith("^") &&
      // caret sits under the reported column ("  | " prefix is 4 wide)
      caretLine.length == 4 + diag.get.column, r)
  }

  test("unclosed multi-line array reports the line that opened it") {
    val text = "a = 1\nxs = [1, 2,\n  3,\nb = 2"
    // The array never closes; strict and lenient both refuse, locating
    // the opening line.
    val diag = Toml.validate(text)
    assert(diag.isDefined)
    assert(diag.get.line == 2, diag.get.render)
    assert(diag.get.message.contains("unclosed multi-line"))
    val err = intercept[Toml.TomlParseException](Toml.parse(text))
    assert(err.error.line == 2)
  }

  test("bare value on a CONTINUATION line reports the physical line " +
      "and an in-line column") {
    // The bad token sits on line 2 of a multi-line array; the diagnostic
    // must name line 2 with a column inside that line (not an offset
    // into the newline-joined logical line past line 1's end), and show
    // line 2 as the quoted lineText.
    val text = "xs = [1,\n  oops]"
    val diag = Toml.validate(text)
    assert(diag.isDefined)
    assert(diag.get.line == 2, diag.get.render)
    assert(diag.get.column == 3, diag.get.render)
    assert(diag.get.lineText == "  oops]", diag.get.render)
  }

  test("ConfigLoader.validate maps paths to diagnostics, missing file " +
      "included") {
    val good = s"$refDir/config.example.toml"
    val tmp = Files.createTempFile("toml_lint", ".toml")
    Files.write(tmp, "x = [1,\n".getBytes(StandardCharsets.UTF_8))
    val out = ConfigLoader.validate(
      Seq(good, tmp.toString, "/nonexistent/nope.toml")).toMap
    assert(out(good).isEmpty)
    assert(out(tmp.toString).exists(_.line == 1))
    assert(out("/nonexistent/nope.toml").exists(_.line == 0))
  }
}
