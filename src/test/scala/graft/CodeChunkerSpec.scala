package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CodeChunker

class CodeChunkerSpec extends AnyFunSuite {
  private def read(rel: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource(s"/sample_project/$rel").toURI)))

  test("python chunker finds functions, class, imports, docstring") {
    val els = CodeChunker.chunkFile("sample.py", read("sample.py"))
    val byType = els.groupBy(_.element_type).view.mapValues(_.map(_.name)).toMap
    assert(byType("import").size == 2)
    assert(byType("function").toSet.contains("greet"))
    assert(byType("class").map(_.toString).contains("Greeter"))
    val greet = els.find(_.name == "greet").get
    assert(greet.docstring == "Say hello to name.")
    assert(greet.start_line == 4)  // 1-based like the reference
    assert(greet.content.startsWith("def greet"))
    // nested methods of the class are found as functions too
    assert(byType("function").contains("run"))
  }

  test("js/ts chunker finds function, class, import") {
    val els = CodeChunker.chunkFile("pkg/sample.ts", read("pkg/sample.ts"))
    assert(els.exists(e => e.element_type == "function" && e.name == "parseThing"))
    assert(els.exists(e => e.element_type == "class" && e.name == "Widget"))
    assert(els.count(_.element_type == "import") == 1)
    val fn = els.find(_.name == "parseThing").get
    assert(fn.content.contains("return y;"))
  }

  test("python chunker recurses: nested defs, nested imports, multi-line docstrings") {
    val els = CodeChunker.chunkFile("nested.py", read("nested.py"))
    val fns = els.filter(_.element_type == "function").map(_.name)
    assert(fns.contains("outer") && fns.contains("inner"))
    // top-level `import os` plus `import json` inside outer's body
    assert(els.count(_.element_type == "import") == 2)
    val outer = els.find(_.name == "outer").get
    assert(outer.docstring.startsWith("Outer does things."))
    assert(outer.docstring.contains("Across multiple lines."))
    assert(!outer.docstring.contains("\"\"\""))
    val inner = els.find(_.name == "inner").get
    assert(inner.docstring == "Inner helper.")
    // outer's span still covers its whole body, nested def included
    assert(outer.content.contains("def inner"))
  }

  test("js/ts chunker finds class methods (method_definition)") {
    val els = CodeChunker.chunkFile("pkg/widget.ts", read("pkg/widget.ts"))
    assert(els.exists(e => e.element_type == "class" && e.name == "Panel"))
    val fns = els.filter(_.element_type == "function").map(_.name).toSet
    assert(fns == Set("constructor", "load", "size"))
    // control-flow keywords never read as methods
    assert(!els.exists(_.name == "if"))
    val load = els.find(_.name == "load").get
    assert(load.content.contains("return fetch(url);"))
  }

  test("ts method fidelity: return types, modifiers, generators, generics, multi-line sigs; signatures not emitted") {
    val els = CodeChunker.chunkFile("pkg/service.ts", read("pkg/service.ts"))
    // abstract class is still a class_declaration node
    assert(els.exists(e => e.element_type == "class" && e.name == "Service"))
    val fns = els.filter(_.element_type == "function")
    // return-type annotation (lookup), accessibility modifier (private/
    // protected override), static with type params (of), generator
    // (entries), async generator with MULTI-LINE params (stream),
    // multi-line params with Allman-adjacent body (reload)
    assert(fns.map(_.name).toSet == Set("lookup", "of", "entries", "stream", "reload"))
    // overload signature (ASI, no `;`) rejected: exactly ONE lookup element,
    // the implementation (its span starts at the impl line, not the sig)
    val lookups = fns.filter(_.name == "lookup")
    assert(lookups.size == 1 && lookups.head.content.contains("return this.cache.get(key);"))
    assert(!lookups.head.content.linesIterator.next().trim.endsWith("undefined"))
    // method_signature members (abstract, `;`- or ASI-terminated) never emit
    assert(!fns.exists(e => e.name == "describe" || e.name == "touch"))
    // class FIELDS are not methods
    assert(!fns.exists(_.name == "cache"))
    // multi-line signature spans run from the header to the body close
    val stream = fns.find(_.name == "stream").get
    assert(stream.content.contains("limit: number,") &&
      stream.content.contains("yield prefix + limit;"))
    // dynamic import is a call_expression, not an import_statement
    val imports = els.filter(_.element_type == "import")
    assert(imports.size == 1 && imports.head.content.contains("import type"))
  }

  test("markdown chunker: Introduction for leading prose, empty sections dropped") {
    val els = CodeChunker.chunkFile("README.md", read("README.md"))
    val names = els.map(_.name)
    assert(names.head == "Introduction")
    assert(names.contains("Setup") && names.contains("Usage"))
    assert(!names.contains("Empty Section"))
  }

  test("text chunker: 50-line blocks, all-blank block skipped, chunk_<i> names") {
    val els = CodeChunker.chunkFile("notes.txt", read("notes.txt"))
    // 120 lines -> blocks [0,50) [50,100) (all blank -> skipped) [100,120)
    assert(els.map(_.name) == Seq("chunk_0", "chunk_2"))
    assert(els.head.start_line == 1 && els.head.end_line == 50)
    assert(els(1).start_line == 101 && els(1).end_line == 120)
  }

  test("recognizers skip def/class/import text inside triple-quoted strings") {
    val q3 = "\"\"\""
    val src = Seq(
      "def real():",
      "    '''docstring mentioning def fake(x) and",
      "    import os",
      "    class NotAClass:",
      "    '''",
      "    return 1",
      "",
      s"DOC = $q3",
      "def also_fake():",
      "import sys",
      q3,
      "import json",
      "").mkString("\n")
    val els = CodeChunker.chunkPython("s.py", src)
    assert(els.map(e => (e.name, e.element_type)) ==
      Seq(("real", "function"), ("import", "import")))
    assert(els.last.content == "import json")
  }

  test("round-4 recognizer fixes: async def, export default, import boundary, case, masks") {
    // async def is a function_definition
    val py1 = CodeChunker.chunkPython("a.py", "async def fetch(url):\n    return url\n")
    assert(py1.map(e => (e.name, e.element_type)) == Seq(("fetch", "function")))
    // a ''' inside an ordinary string or comment must not poison the mask
    val py2 = CodeChunker.chunkPython("b.py",
      Seq("SEP = \"'''\"", "# strip the ''' prefix", "def real():", "    return 1").mkString("\n"))
    assert(py2.exists(e => e.name == "real" && e.element_type == "function"))
    // docstring found through a multi-line signature
    val py3 = CodeChunker.chunkPython("c.py",
      Seq("def f(a,", "      b):", "    \"\"\"Doc.\"\"\"", "    return a").mkString("\n"))
    assert(py3.head.docstring == "Doc.")
    // export default declarations are elements
    val js1 = CodeChunker.chunkJs("m.ts",
      "export default function main() {\n  return 1;\n}\n")
    assert(js1.map(e => (e.name, e.element_type)) == Seq(("main", "function")))
    // importantConfig is not an import; function text in a template literal
    // or block comment is prose, not a node
    val js2 = CodeChunker.chunkJs("n.js", Seq(
      "importantConfig.load();",
      "const help = `usage: function demo() { ... }`;",
      "/* function example(x) { */",
      "function real() {",
      "  return \"}\";",
      "}").mkString("\n"))
    assert(js2.map(e => (e.name, e.element_type)) == Seq(("real", "function")))
    // the brace inside the string must not truncate the span
    assert(js2.head.end_line == 6)
    // extension dispatch is case-insensitive
    val up = CodeChunker.chunkFile("SETUP.PY", "def go():\n    return 2\n")
    assert(up.map(_.element_type) == Seq("function"))
  }

  test("decorated definitions span from the first decorator (decorated_definition fidelity)") {
    val py =
      """@app.route("/x")
        |@cached
        |def handler(req):
        |    return req
        |
        |class Plain:
        |    @property
        |    def value(self):
        |        return 1
        |""".stripMargin
    val els = CodeChunker.chunkFile("deco.py", py)
    val handler = els.find(e => e.name == "handler").get
    assert(handler.start_line == 1 && handler.content.startsWith("@app.route"))
    val value = els.find(e => e.name == "value").get
    assert(value.content.startsWith("    @property"))
    // a "@" inside a docstring must NOT attach
    val tricky = "'''\n@fake\n'''\ndef real():\n    pass\n"
    val r = CodeChunker.chunkFile("t.py", tricky).find(_.name == "real").get
    assert(r.start_line == 4 && r.content.startsWith("def real"))
    // TS class decorator attaches; decorator text in a comment does not
    val ts =
      """@Component({sel: 'x'})
        |class Widget {
        |  render() { return 1; }
        |}
        |// @NotADecorator
        |class Plain {
        |}
        |""".stripMargin
    val tls = CodeChunker.chunkFile("w.ts", ts)
    val widget = tls.find(_.name == "Widget").get
    assert(widget.start_line == 1 && widget.content.startsWith("@Component"))
    assert(tls.find(_.name == "Plain").get.content.startsWith("class Plain"))
  }

  test("multi-line headers, decorators, and imports span like tree-sitter nodes (round-9 fidelity)") {
    // black-style multi-line signature: the closing `) -> int:` sits at the
    // def's own indent — the suite must still be included
    val py =
      """def f(
        |    a,
        |    b,
        |) -> int:
        |    '''Adds.'''
        |    return a + b
        |
        |@app.route(
        |    "/path",
        |    methods=["GET", "POST"],
        |)
        |@cached
        |def handler(req):
        |    return req
        |
        |from pkg import (
        |    alpha,
        |    beta,
        |)
        |import os, \
        |    sys
        |""".stripMargin
    val els = CodeChunker.chunkFile("ml.py", py)
    val f = els.find(_.name == "f").get
    assert(f.start_line == 1 && f.end_line == 6, s"got ${f.start_line}..${f.end_line}")
    assert(f.content.endsWith("return a + b"))
    assert(f.docstring == "Adds.")
    val handler = els.find(_.name == "handler").get
    assert(handler.start_line == 8, s"multi-line decorator must attach: got ${handler.start_line}")
    assert(handler.content.startsWith("@app.route("))
    val imports = els.filter(_.element_type == "import")
    assert(imports.exists(e => e.content.contains("alpha") && e.content.contains("beta")
      && e.end_line - e.start_line == 3), "paren-group from-import must span all lines")
    assert(imports.exists(e => e.content.contains("os") && e.content.contains("sys")
      && e.end_line - e.start_line == 1), "backslash-continued import must span both lines")
    // a paren inside a default-arg STRING must not extend the header
    val tricky = "def g(x=\"(\"):\n    return x\ndef h():\n    pass\n"
    val tEls = CodeChunker.chunkFile("t.py", tricky)
    assert(tEls.find(_.name == "g").get.end_line == 2)
    assert(tEls.exists(_.name == "h"))
    // JS multi-line named-import list
    val ts =
      """import {
        |  alpha,
        |  beta,
        |} from './mod';
        |function go() { return alpha + beta; }
        |""".stripMargin
    val tls = CodeChunker.chunkFile("m.ts", ts)
    val imp = tls.find(_.element_type == "import").get
    assert(imp.start_line == 1 && imp.end_line == 4)
    assert(tls.exists(_.name == "go"))
  }

  test("round-10 verdict pathological sources: decorator-embedded def strings, semicolon-packed JS") {
    // 1. a decorator whose STRING argument contains a def header (single-
    //    and multi-line forms): tree-sitter sees one decorated_definition;
    //    the regex chunker must not hallucinate `fake`/`fake2` elements,
    //    and `real`'s span starts at its first decorator
    val py =
      """@wrap("def fake(): pass", other=1)
        |@multi(
        |    "def fake2(x): return x",
        |)
        |def real(x):
        |    return x
        |""".stripMargin
    val els = CodeChunker.chunkFile("p.py", py)
    val fns = els.filter(_.element_type == "function")
    assert(fns.map(_.name) == Seq("real"), fns.map(_.name).toString)
    assert(fns.head.start_line == 1 && fns.head.end_line == 6)
    // 2. semicolon-packed JS: multiple declarations per line, and a
    //    declaration opening on the PREVIOUS one's closing line — all
    //    found (tree-sitter emits each function_declaration), each span
    //    closed by its own brace group, not its neighbor's
    val js =
      """function a(){return 1};function b(){
        |  if (x) { y() }
        |  return 2
        |};function c(){return 3}
        |const k = 1; function d(){return 4}
        |""".stripMargin
    val jels = CodeChunker.chunkFile("p.js", js)
    val names = jels.filter(_.element_type == "function").map(e => (e.name, e.start_line, e.end_line))
    assert(names.contains(("a", 1, 1)), names.toString)
    assert(names.contains(("b", 1, 4)), names.toString) // body closes on line 4
    assert(names.contains(("c", 4, 4)), names.toString)
    assert(names.contains(("d", 5, 5)), names.toString)
    assert(names.map(_._1).sorted == Seq("a", "b", "c", "d"), names.toString)
    // 3. class-first packed line (round-11 ADVICE #2): `class A{};function
    //    b(){}` — tree-sitter emits BOTH declarations; the jsClass branch
    //    must run the same same-line scan as the jsFunction branch
    val js2 =
      """class A{};function e(){return 5}
        |export class B{};function f(){
        |  return 6
        |}
        |""".stripMargin
    val j2 = CodeChunker.chunkFile("q.js", js2)
    val cls = j2.filter(_.element_type == "class").map(_.name)
    val fn2 = j2.filter(_.element_type == "function").map(e => (e.name, e.start_line, e.end_line))
    assert(cls.sorted == Seq("A", "B"), cls.toString)
    assert(fn2.contains(("e", 1, 1)), fn2.toString)
    assert(fn2.contains(("f", 2, 4)), fn2.toString)
    // 4. a declaration on a MULTI-LINE class's closing line: the body
    //    range includes its closer, which used to hide the (top-level)
    //    function that starts right after the closing brace
    val js3 =
      """class C{
        |  m(){ return 1 }
        |};function g(){return 7}
        |""".stripMargin
    val j3 = CodeChunker.chunkFile("r.js", js3)
    assert(j3.filter(_.element_type == "class").map(_.name) == Seq("C"))
    val fn3 = j3.filter(_.element_type == "function").map(e => (e.name, e.start_line, e.end_line))
    assert(fn3.contains(("g", 3, 3)), fn3.toString)
    assert(fn3.exists(_._1 == "m"), fn3.toString)
  }

  test("content hash is stable and md5-shaped (C7)") {
    val a = CodeChunker.chunkFile("sample.py", read("sample.py"))
    val b = CodeChunker.chunkFile("sample.py", read("sample.py"))
    assert(a.map(_.hash) == b.map(_.hash))
    assert(a.head.hash.matches("[0-9a-f]{32}"))
  }

  test("distributed flatMap matches local chunker") {
    val spark = TestSpark.spark
    import spark.implicits._
    val files = Seq(("sample.py", read("sample.py"))).toDS()
    val dist = CodeChunker.chunk(files).collect().toSeq.sortBy(e => (e.file_path, e.start_line))
    val local = CodeChunker.chunkFile("sample.py", read("sample.py")).sortBy(e => (e.file_path, e.start_line))
    assert(dist == local)
  }
}
