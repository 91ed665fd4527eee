package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Diagnostics

/** The reference's REAL diagnostics rules (lsp_tool.py:141-156, :202-230,
  * :250-267) over real file content: every rule fires on these fixtures and
  * every negative guard (comment prefixes, ' as ' imports, line endings that
  * suppress the missing-semicolon heuristic) is covered. */
class DiagnosticsCodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val pyFile =
    """import *
      |import numpy as np_star  # has ' as ' and '*'? no star; guard below
      |print("hi")
      |# print("commented out")
      |x = 1
      |""".stripMargin + "y = " + ("1 + " * 40) + "1\n" // > 120 chars

  private val jsFile =
    """console.log("boot");
      |// console.log("commented")
      |let a = 1; let b = 2;
      |const x = 1
      |if (x > 0) {
      |}
      |""".stripMargin

  private val txtFile = "trailing spaces   \nok line\n" + ("z" * 201) // no final newline

  // net +1 paren (split across lines), odd """ count -> both error rules fire
  private val brokenPy =
    "def f(:\n    s = \"\"\"unterminated\n    return (1 + 2\n"

  // balanced parens, net +1 brace -> delimiter rule alone fires
  private val brokenJs = "function f() {\n  return 1;\n"

  private def reports = {
    import spark.implicits._
    val files = Seq(
      ("check.py", pyFile),
      ("app.js", jsFile),
      ("broken.py", brokenPy),
      ("broken.js", brokenJs),
      ("notes.rst", txtFile),
      ("empty.cfg", "")).toDF("file_path", "content")
    Diagnostics.codeDiagnostics(files).collect()
      .map(r => r.getAs[String]("file_path") -> r).toMap
  }

  test("python rules: wildcard import, print(), long line; comment guard") {
    val msgs = reports("check.py").getAs[String]("messages")
    assert(msgs.contains("1:warning:Wildcard import detected"))
    assert(msgs.contains("3:warning:print() statement found (consider logging)"))
    assert(msgs.contains("Line too long ("))
    // commented-out print on line 4 must NOT fire
    assert(!msgs.contains("4:warning:print()"))
    // `import numpy as np_star` has ' as ' -> wildcard guard holds
    assert(!msgs.contains("2:warning:Wildcard"))
    assert(reports("check.py").getAs[Long]("warning_count") == 3)
  }

  test("js rules: console.log, multi-statement, missing semicolon; guards") {
    val msgs = reports("app.js").getAs[String]("messages")
    assert(msgs.contains("1:warning:console.log() found"))
    assert(!msgs.contains("2:warning:console.log")) // '//' comment guard
    assert(msgs.contains("3:warning:Multiple statements on one line"))
    assert(msgs.contains("4:warning:Missing semicolon?"))
    // 'if (' line and '{'/'}' endings suppress the semicolon heuristic
    assert(!msgs.contains("5:warning:Missing") && !msgs.contains("6:warning:Missing"))
  }

  test("generic rules: trailing whitespace, very long line, file-level checks") {
    val msgs = reports("notes.rst").getAs[String]("messages")
    assert(msgs.contains("1:warning:Trailing whitespace"))
    assert(msgs.contains("3:warning:Very long line (201 chars)"))
    assert(msgs.contains("0:warning:File doesn't end with newline"))
    val empty = reports("empty.cfg").getAs[String]("messages")
    assert(empty.contains("0:warning:File is empty"))
    assert(empty.contains("0:warning:File doesn't end with newline"))
  }

  test("clean files are valid: line-rule banks are warning-only") {
    val clean = Seq("check.py", "app.js", "notes.rst", "empty.cfg")
    assert(clean.forall(reports(_).getAs[Boolean]("valid")))
    assert(clean.forall(reports(_).getAs[Long]("error_count") == 0L))
  }

  test("syntax channel: unbalanced delimiters and odd triple-quotes are errors") {
    val py = reports("broken.py")
    val pyMsgs = py.getAs[String]("messages")
    assert(pyMsgs.contains(
      "0:error:Syntax error: unbalanced delimiters (paren=2, bracket=0, brace=0)"))
    assert(pyMsgs.contains("0:error:Syntax error: unterminated triple-quoted string"))
    assert(py.getAs[Long]("error_count") == 2L)
    assert(!py.getAs[Boolean]("valid"))

    val js = reports("broken.js")
    assert(js.getAs[String]("messages").contains(
      "0:error:Syntax error: unbalanced delimiters (paren=0, bracket=0, brace=1)"))
    assert(js.getAs[Long]("error_count") == 1L)
    assert(!js.getAs[Boolean]("valid"))
  }
}
