package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sandbox

/** The reference's complete tool surface driven through the [[Graft]]
  * facade against the sample project — the "switch by name" contract: every
  * tool a reference user calls has a working same-shaped entry point.
  */
class FacadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val projectDir =
    Paths.get(getClass.getResource("/sample_project").toURI).toString
  private lazy val indexDir = {
    val d = Files.createTempDirectory("graft_facade_idx").toString
    Graft.indexCodebase(spark, projectDir, d).collect()
    d
  }

  test("index_codebase + search_code honor element-type and file-type filters") {
    val hits = Graft.searchCode(spark, indexDir, "process data", maxResults = 5,
      elementTypes = Seq("function"), fileType = Some(".py")).collect()
    assert(hits.nonEmpty && hits.length <= 5)
    assert(hits.forall(_.getAs[String]("element_type") == "function"))
    assert(hits.forall(_.getAs[String]("file_path").endsWith(".py")))
  }

  test("search_code text output renders the reference's result blocks") {
    val text = Graft.searchCodeText(spark, indexDir, "process data", maxResults = 3)
    assert(text.startsWith("Result 1 (similarity: "))
    assert(text.contains("  Name: ") && text.contains("  Type: ") &&
      text.contains("  File: ") && text.contains("  Lines: "))
    assert(text.contains("-" * 50))
    // reference join shape: blank line between result blocks, trailing \n
    assert(text.contains("-" * 50 + "\n\nResult 2 (similarity: "))
    assert(text.endsWith("\n"))
    // zero hits is the reference's message, not the empty string
    assert(Graft.searchCodeText(spark, indexDir, "process data",
      elementTypes = Seq("nosuchtype")) == "No results found for query: 'process data'")
  }

  test("search_files returns ranked file summaries") {
    val hits = Graft.searchFiles(spark, indexDir, "markdown documentation", maxResults = 3).collect()
    assert(hits.nonEmpty && hits.length <= 3)
  }

  test("get_file_context lists a file's elements in source order") {
    val anyFile = Graft.searchCode(spark, indexDir, "data", maxResults = 1)
      .collect()(0).getAs[String]("file_path")
    val ctx = Graft.getFileContext(spark, indexDir, anyFile).collect()
    assert(ctx.nonEmpty)
    val starts = ctx.map(_.getAs[Int]("start_line"))
    assert(starts.sorted.sameElements(starts))
  }

  test("get_diagnostics + validate_code: unbalanced brackets fail, clean code passes") {
    val bad = "def f(x):\n    return (x\n"
    val diag = Graft.getDiagnostics(spark, "bad.py", bad).collect()
    assert(diag.nonEmpty && diag.head.getAs[Long]("error_count") > 0)
    assert(!Graft.validateCode(spark, "bad.py", bad))
    assert(Graft.validateCode(spark, "ok.py", "def f(x):\n    return x\n"))
  }

  test("symbol navigation finds defs and refs over the corpus") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val nav = Graft.symbolNavigation(docs, Seq("spark", "table")).collect()
    assert(nav.nonEmpty)
  }

  test("missing index degrades gracefully like the reference, never throws") {
    val nowhere = "/tmp/graft_facade_no_such_index"
    assert(Graft.searchCode(spark, nowhere, "q").isEmpty)
    assert(Graft.searchFiles(spark, nowhere, "q").isEmpty)
    assert(Graft.getFileContext(spark, nowhere, "a.py").isEmpty)
    assert(Graft.searchCodeText(spark, nowhere, "q") ==
      "No code index found. Please run indexing first.")
  }

  test("sandboxed read_file / write_file round-trip, escapes rejected") {
    val sb = new Sandbox(Files.createTempDirectory("graft_facade_sb").toString)
    assert(Graft.writeFile(sb, "a/b.txt", "hello").isRight)
    assert(Graft.readFile(sb, "a/b.txt") == Right("hello"))
    assert(Graft.readFile(sb, "../outside.txt").isLeft)
  }
}
