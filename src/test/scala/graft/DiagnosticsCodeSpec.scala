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

  private def reports = {
    import spark.implicits._
    val files = Seq(
      ("check.py", pyFile),
      ("app.js", jsFile),
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

  test("reports are valid (no error-severity rules in these banks)") {
    assert(reports.values.forall(_.getAs[Boolean]("valid")))
    assert(reports.values.forall(_.getAs[Long]("error_count") == 0L))
  }
}
