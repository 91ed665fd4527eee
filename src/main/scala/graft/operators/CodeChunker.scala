package graft.operators

import org.apache.spark.sql.Dataset
import graft.functions.Md5

/** One chunk of source code — the engine's core domain record, mirroring the
  * reference's CodeElement
  * (/root/reference/coding_agent/tools/indexing_agent.py:15-43): 8 fixed
  * fields + content-address hash. Paths are stored RELATIVE (the reference's
  * absolute/relative mismatch is a documented fix, SURVEY.md §2.9#3). */
case class CodeElement(
    name: String,
    element_type: String,
    file_path: String,
    start_line: Int,
    end_line: Int,
    content: String,
    docstring: String,
    hash: String)

object CodeElement {
  def make(name: String, elementType: String, filePath: String,
           startLine: Int, endLine: Int, content: String, docstring: String = ""): CodeElement =
    CodeElement(name, elementType, filePath, startLine, endLine, content, docstring,
      Md5.hex(s"$name:$elementType:$content"))
}

/** Structural code chunker — the reference's tree-sitter capability (C1-C4,
  * indexing_agent.py:150-240) re-expressed as a pure-Scala recognizer inside
  * a typed `flatMap` (1 file → N typed spans; the Generator/UDTF shape).
  * Tree-sitter itself is a C library — out of scope per SURVEY.md §2.2; the
  * recognizer handles the same node sets: python def/class/imports with
  * docstrings, JS/TS function/class/import, markdown sections (C5), 50-line
  * fallback text chunks (C6, the reference's "this worked the best" size,
  * indexing_agent.py:296).
  *
  * Runs distributed over a `Dataset[(path, content)]` from the codebase scan
  * (S1/S2) — per-file work only, no shuffle.
  */
object CodeChunker {

  val TextChunkLines = 50
  val CodeExtensions = Set("py", "js", "ts", "tsx", "jsx", "md")

  private def ext(path: String): String = {
    val i = path.lastIndexOf('.')
    // lowercased: SETUP.PY must structurally chunk like setup.py
    if (i < 0) "" else path.substring(i + 1).toLowerCase
  }

  /** Dispatcher (the reference's `_index_file`, indexing_agent.py:126-148). */
  def chunkFile(path: String, content: String): Seq[CodeElement] = ext(path) match {
    case "py" => chunkPython(path, content)
    case "js" | "ts" | "tsx" | "jsx" => chunkJs(path, content)
    case "md" => chunkMarkdown(path, content)
    case _ => textChunks(path, content)
  }

  private def indentOf(l: String): Int = l.takeWhile(c => c == ' ' || c == '\t').length

  /** Net bracket balance of one Python line with string/comment content
    * excluded — the line-local scrubber the multi-line-header and
    * decorator walks need: a paren inside a default-arg string
    * (`def f(x="(")`) or after `#` must not count. Triple-quoted spans are
    * the caller's job ([[tripleStringMask]]); this handles the line-local
    * states. */
  private def pyBracketNet(l: String): Int = {
    var net = 0
    var pos = 0
    var inS = false
    var inD = false
    var done = false
    while (pos < l.length && !done) {
      val c = l.charAt(pos)
      if (inS) { if (c == '\\') pos += 1 else if (c == '\'') inS = false }
      else if (inD) { if (c == '\\') pos += 1 else if (c == '"') inD = false }
      else c match {
        case '#' => done = true
        case '\'' => inS = true
        case '"' => inD = true
        case '(' | '[' | '{' => net += 1
        case ')' | ']' | '}' => net -= 1
        case _ =>
      }
      pos += 1
    }
    net
  }

  /** Last line of a possibly MULTI-LINE header: from `start`, advance while
    * the cumulative bracket balance stays open — `def f(\n  a,\n) -> int:`
    * closes on the `)` line (black's house style). Without this, the
    * suite scan below would treat the closing line's SHALLOW indent as the
    * end of the block and cut the whole body off — tree-sitter spans the
    * full definition. */
  private def headerEnd(lines: Array[String], start: Int): Int = {
    var bal = pyBracketNet(lines(start))
    var i = start
    while (bal > 0 && i + 1 < lines.length) {
      i += 1
      bal += pyBracketNet(lines(i))
    }
    i
  }

  /** Block span: from `start` (a possibly multi-line header) until the last
    * nonblank line whose indent is greater than the HEADER LINE's
    * (python-style suite), inclusive. The suite scan begins after the line
    * that closes the header's bracket group ([[headerEnd]]). */
  private def blockEnd(lines: Array[String], start: Int): Int = {
    val indent = indentOf(lines(start))
    val h = headerEnd(lines, start)
    var end = h
    var i = h + 1
    while (i < lines.length &&
      (lines(i).trim.isEmpty || indentOf(lines(i)) > indent)) {
      if (lines(i).trim.nonEmpty) end = i
      i += 1
    }
    end
  }

  private val pyDef = """^\s*(?:async\s+)?def\s+([A-Za-z_][A-Za-z0-9_]*)""".r.unanchored
  private val pyClass = """^\s*class\s+([A-Za-z_][A-Za-z0-9_]*)""".r.unanchored
  private def isPyImport(l: String): Boolean = {
    val t = l.trim
    t.startsWith("import ") || t.startsWith("from ")
  }

  private def stripEdgeChars(s: String, c: Char): String =
    s.dropWhile(_ == c).reverse.dropWhile(_ == c).reverse

  /** C4: full first triple-quoted string literal of the block, spanning
    * multiple lines, post-processed exactly like the reference's
    * `_extract_python_docstring` (indexing_agent.py:227-240):
    * `'\n'.join(lines).strip().strip('\"\"\"').strip(\"'''\").strip()`
    * — i.e. whitespace, then edge quote CHARACTERS (Python `str.strip`
    * takes a character set), then whitespace again. */
  private def pyDocstring(lines: Array[String], start: Int, end: Int): String = {
    // multi-line signatures: the docstring follows the line that CLOSES the
    // header (trailing ':'), not necessarily the def line itself (round-4
    // review); trailing comments are stripped before the check
    var h = start
    while (h <= end && !lines(h).split("#", 2)(0).trim.endsWith(":")) h += 1
    if (h > end) return ""
    var i = h + 1
    while (i <= end && lines(i).trim.isEmpty) i += 1
    if (i > end) return ""
    val t = lines(i).trim
    val q =
      if (t.startsWith("\"\"\"")) "\"\"\""
      else if (t.startsWith("'''")) "'''"
      else return ""
    val closeLine =
      if (t.substring(3).contains(q)) i
      else {
        var j = i + 1
        while (j <= end && !lines(j).contains(q)) j += 1
        math.min(j, end)
      }
    val joined = lines.slice(i, closeLine + 1).mkString("\n")
    stripEdgeChars(stripEdgeChars(joined.trim, '"'), '\'').trim
  }

  /** Lines that BEGIN inside an open triple-quoted string. Recognizers must
    * not fire on them: a `def name(` or `import` inside a docstring is
    * string content, not a node — tree-sitter would never emit it. The scan
    * tracks line-local single/double-quote state and `#` comments while
    * looking for openers, so a `'''` inside `"'''"` or after `#` cannot
    * poison the mask for the rest of the file (round-4 review); the opening
    * line itself is not masked (a def cannot also start inside a string it
    * opens). */
  private def tripleStringMask(lines: Array[String]): Array[Boolean] = {
    val mask = new Array[Boolean](lines.length)
    var open: String = null
    for (i <- lines.indices) {
      if (open != null) mask(i) = true
      val l = lines(i)
      var pos = 0
      var inS = false
      var inD = false
      var done = false
      while (pos < l.length && !done) {
        if (open != null) {
          val idx = l.indexOf(open, pos)
          if (idx < 0) done = true
          else { open = null; pos = idx + 3; inS = false; inD = false }
        } else if (inS) {
          if (l.charAt(pos) == '\\') pos += 2
          else { if (l.charAt(pos) == '\'') inS = false; pos += 1 }
        } else if (inD) {
          if (l.charAt(pos) == '\\') pos += 2
          else { if (l.charAt(pos) == '"') inD = false; pos += 1 }
        } else l.charAt(pos) match {
          case '#' => done = true // comment: nothing after it counts
          case '\'' =>
            if (l.startsWith("'''", pos)) { open = "'''"; pos += 3 }
            else { inS = true; pos += 1 }
          case '"' =>
            if (l.startsWith("\"\"\"", pos)) { open = "\"\"\""; pos += 3 }
            else { inD = true; pos += 1 }
          case _ => pos += 1
        }
      }
    }
    mask
  }

  /** Span start of a decorated definition: tree-sitter wraps decorators
    * and the def/class in ONE `decorated_definition` node whose text
    * begins at the first decorator (the reference chunks that node,
    * indexing_agent.py:158-172), so the element must include `@decorator`
    * lines directly above the header — INCLUDING multi-line decorator
    * argument lists (`@app.route(\n  "/x",\n)`): walking upward, a
    * negative cumulative bracket balance means we are inside an argument
    * group that opens further up, and a same-indent `@` line that brings
    * the balance back to zero is that decorator's start. (This closes the
    * round-8 declared deviation.) */
  private def decoratedStart(lines: Array[String], inStr: Array[Boolean],
                             header: Int): Int = {
    val indent = indentOf(lines(header))
    var s = header
    var j = header - 1
    var bal = 0
    var stop = false
    while (j >= 0 && !stop) {
      if (inStr(j)) stop = true
      else {
        val t = lines(j).trim
        bal += pyBracketNet(lines(j))
        if (t.startsWith("@") && indentOf(lines(j)) == indent && bal == 0) {
          s = j; j -= 1 // decorator complete; look for one more above
        } else if (bal < 0) {
          j -= 1 // inside a decorator's argument group, keep walking up
        } else stop = true
      }
    }
    s
  }

  def chunkPython(path: String, content: String): Seq[CodeElement] = {
    val lines = content.split("\n", -1)
    val inStr = tripleStringMask(lines)
    val out = Seq.newBuilder[CodeElement]
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      l match {
        case _ if inStr(i) => i += 1 // string content is never a node
        case pyDef(name) if !l.trim.startsWith("#") =>
          // i advances by 1, not to block end: the reference's traverse_node
          // recurses into every child (indexing_agent.py:158-172), so nested
          // defs and imports inside a function body are emitted too.
          val end = blockEnd(lines, i)
          val start = decoratedStart(lines, inStr, i)
          out += CodeElement.make(name, "function", path, start + 1, end + 1,
            lines.slice(start, end + 1).mkString("\n"), pyDocstring(lines, i, end))
          i += 1
        case pyClass(name) if !l.trim.startsWith("#") =>
          // class header is emitted as one element; nested defs still found
          val end = blockEnd(lines, i)
          val start = decoratedStart(lines, inStr, i)
          out += CodeElement.make(name, "class", path, start + 1, end + 1,
            lines.slice(start, end + 1).mkString("\n"), pyDocstring(lines, i, end))
          i += 1
        case _ if isPyImport(l) =>
          // multi-line import spans: `from x import (\n a,\n b)` closes on
          // bracket balance; `import a, \` continues by backslash — the
          // tree-sitter node spans all of it
          var end = headerEnd(lines, i)
          while (end + 1 < lines.length &&
            lines(end).split("#", 2)(0).trim.endsWith("\\")) end += 1
          out += CodeElement.make("import", "import", path, i + 1, end + 1,
            lines.slice(i, end + 1).mkString("\n"), "")
          i = end + 1
        case _ => i += 1
      }
    }
    val els = out.result()
    if (els.nonEmpty) els else textChunks(path, content)
  }

  private val jsFunction = """^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s+([A-Za-z_$][A-Za-z0-9_$]*)""".r.unanchored
  // statement-boundary form: a function declaration AFTER `;` or `}` on
  // the same line (`function a(){..};function b(){..}` — tree-sitter
  // emits both declarations; a line-start-only recognizer missed b, the
  // round-10 verdict's semicolon-packed-JS example). Element spans stay
  // line-granular (the chunker's declared model): the extra declaration
  // shares its start line, and its brace scan starts AFTER the boundary
  // char so the previous declaration's closer never miscounts.
  private val jsFunctionMid = """[;}]\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s+([A-Za-z_$][A-Za-z0-9_$]*)""".r
  // declare/abstract: tree-sitter-typescript still types these
  // class_declaration (ambient/abstract classes are the same node kind)
  private val jsClass = """^\s*(?:export\s+)?(?:default\s+)?(?:declare\s+)?(?:abstract\s+)?class\s+([A-Za-z_$][A-Za-z0-9_$]*)""".r.unanchored
  // word boundary after "import": `importantConfig.load()` is not an
  // import; neither is a DYNAMIC import `import('./mod')` — tree-sitter
  // parses that as a call_expression (the `import` token as callee), not
  // an import_statement, so the reference's node list never emits it
  private def isJsImport(l: String): Boolean = {
    val t = l.trim
    t.startsWith("import") && (t.length == 6 || {
      val c = t.charAt(6)
      !Character.isLetterOrDigit(c) && c != '_' && c != '$' && c != '('
    })
  }

  /** Brace-balanced span from `start` (JS/TS block bodies). Callers pass
    * MASKED lines ([[jsMasked]]) so braces inside strings/comments never
    * count. Depth is tracked per CHARACTER: a `} function b() {` line
    * (close-then-reopen) crosses zero mid-line, which a per-line sum would
    * hide, swallowing the next declaration (round-4 review). */
  private def braceEnd(lines: Array[String], start: Int): Int =
    braceEndFrom(lines, start, 0)

  /** [[braceEnd]] with the FIRST line scanned from column `col` — the
    * statement-boundary function recognizer needs it: on a
    * `};function b(){` line the leading `}` belongs to the PREVIOUS
    * declaration, and counting it would return at b's first nested
    * close (round-11: the semicolon-packed-JS fidelity gap the round-10
    * verdict named). */
  private def braceEndFrom(lines: Array[String], start: Int, col: Int): Int = {
    var depth = 0
    var seen = false
    var i = start
    while (i < lines.length) {
      val l = lines(i)
      var j = if (i == start) col else 0
      while (j < l.length) {
        l.charAt(j) match {
          case '{' => depth += 1; seen = true
          case '}' =>
            depth -= 1
            if (seen && depth <= 0) return i
          case _ =>
        }
        j += 1
      }
      i += 1
    }
    lines.length - 1
  }

  /** Recognition mask for JS/TS: string, template-literal, and comment
    * CONTENT blanked to spaces (the structural chars around them kept), so
    * recognizer regexes and [[braceEnd]] never fire on text inside them —
    * a `function demo()` in a template literal or block comment is prose,
    * not a node (round-4 review; the Python side's tripleStringMask is the
    * same idea). Block comments and template literals carry state ACROSS
    * lines; plain strings and // comments are line-local. Content slices
    * still come from the ORIGINAL lines. */
  private def jsMasked(lines: Array[String]): Array[String] = {
    val out = new Array[String](lines.length)
    var state: Char = 'n' // n = code, b = block comment, t = template literal
    for (i <- lines.indices) {
      val l = lines(i)
      val sb = new StringBuilder(l.length)
      var pos = 0
      var inS = false
      var inD = false
      while (pos < l.length) {
        state match {
          case 'b' =>
            if (l.startsWith("*/", pos)) { state = 'n'; sb.append("  "); pos += 2 }
            else { sb.append(' '); pos += 1 }
          case 't' =>
            if (l.charAt(pos) == '\\') { sb.append("  "); pos += 2 }
            else if (l.charAt(pos) == '`') { state = 'n'; sb.append(' '); pos += 1 }
            else { sb.append(' '); pos += 1 }
          case _ =>
            if (inS || inD) {
              val c = l.charAt(pos)
              if (c == '\\') { sb.append("  "); pos += 2 }
              else {
                if (inS && c == '\'') inS = false
                if (inD && c == '"') inD = false
                sb.append(' '); pos += 1
              }
            } else if (l.startsWith("//", pos)) {
              sb.append(" " * (l.length - pos)); pos = l.length
            } else if (l.startsWith("/*", pos)) {
              state = 'b'; sb.append("  "); pos += 2
            } else {
              l.charAt(pos) match {
                case '`' => state = 't'; sb.append(' ')
                case '\'' => inS = true; sb.append(' ')
                case '"' => inD = true; sb.append(' ')
                case c => sb.append(c)
              }
              pos += 1
            }
        }
      }
      out(i) = sb.toString
    }
    out
  }

  /** method_definition HEAD recognizer (indexing_agent.py:165): modifier
    * run (any order — TS allows `public static async *`), optional
    * generator `*`, name, optional type-parameter list, opening paren.
    * Control-flow keywords are excluded so `if (...) {` never reads as a
    * method; a method NAMED like a modifier (`get(key) {`) still matches
    * because the modifier group requires trailing whitespace. */
  private val jsMethodHead =
    """^\s*(?:(?:public|private|protected|override|readonly|static|async|get|set)\s+)*(?:\*\s*)?([A-Za-z_$][A-Za-z0-9_$]*)\s*(?:<[^>]*>)?\s*\(""".r.unanchored
  private val jsKeywords =
    Set("if", "for", "while", "switch", "catch", "function", "return", "else",
      "do", "try", "new", "typeof", "await", "yield")

  /** Full method_definition recognizer at line `i` of the MASKED text:
    * match the head, walk the (possibly multi-line) parameter list to its
    * closing paren, then — allowing a TS return-type annotation between —
    * require a body `{` before any `;`. A `;` first means a TS
    * `method_signature` (abstract/interface/declare member), which
    * tree-sitter types differently and the reference's node list does NOT
    * emit. Returns (name, bodyOpenLine). Known corner: a return type whose
    * FIRST token group is a brace-balanced object type (`(): { a: X } {`)
    * reads the type literal as the body open — rare enough to document
    * rather than parse. */
  private def jsMethodAt(m: Array[String], i: Int): Option[(String, Int)] =
    m(i) match {
      case jsMethodHead(name) if !jsKeywords(name) =>
        var j = i
        var pos = m(i).indexOf('(')
        var bal = 0
        // walk to the param list's closing paren across lines
        while (j < m.length && { // scan current line from pos
          var closed = -1
          var p = pos
          while (p < m(j).length && closed < 0) {
            m(j).charAt(p) match {
              case '(' => bal += 1
              case ')' => bal -= 1; if (bal == 0) closed = p
              case _ =>
            }
            p += 1
          }
          if (closed >= 0) { pos = closed + 1; false }
          else { j += 1; pos = 0; j < m.length }
        }) ()
        if (j >= m.length) None
        else {
          // body `{` before `;`, scanning from just after the close paren
          var k = j
          var q = pos
          var res: Option[(String, Int)] = None
          var done = false
          while (k < m.length && !done) {
            val rest = m(k).substring(q)
            val ib = rest.indexOf('{')
            val isc = rest.indexOf(';')
            if (ib >= 0 && (isc < 0 || ib < isc)) { res = Some((name, k)); done = true }
            else if (isc >= 0) done = true // method_signature: not emitted
            else {
              k += 1; q = 0
              // a NEW member head before any `{` means the previous member
              // was an ASI-terminated signature (no `;`) — still a
              // method_signature, still not emitted
              if (k < m.length && jsMethodHead.findFirstIn(m(k)).isDefined)
                done = true
            }
          }
          res
        }
      case _ => None
    }

  def chunkJs(path: String, content: String): Seq[CodeElement] = {
    val lines = content.split("\n", -1)
    // recognition runs over the MASKED text; emitted content over the raw
    val m = jsMasked(lines)
    // Class body ranges, so method_definition recognition fires only inside a
    // class body (the reference's tree-sitter node set includes
    // method_definition, indexing_agent.py:165; its extractor names it like a
    // function).
    val classBodies = Seq.newBuilder[(Int, Int)]
    for (i <- m.indices) m(i) match {
      case jsClass(_) => classBodies += ((i + 1, braceEnd(m, i)))
      case _ =>
    }
    val bodies = classBodies.result()
    def inClassBody(i: Int): Boolean = bodies.exists { case (s, e) => i >= s && i <= e }
    val out = Seq.newBuilder[CodeElement]
    var i = 0
    while (i < lines.length) {
      m(i) match {
        case jsFunction(name) =>
          // i += 1, not end+1: traverse_node recursion means nested function
          // declarations are emitted too (indexing_agent.py:158-172).
          val end = braceEnd(m, i)
          out += CodeElement.make(name, "function", path, i + 1, end + 1,
            lines.slice(i, end + 1).mkString("\n"))
          // same-line statement-boundary declarations (`;function b(){`)
          for (mm <- jsFunctionMid.findAllMatchIn(m(i))) {
            val e2 = braceEndFrom(m, i, mm.start + 1)
            out += CodeElement.make(mm.group(1), "function", path, i + 1, e2 + 1,
              lines.slice(i, e2 + 1).mkString("\n"))
          }
          i += 1
        case jsClass(name) =>
          val end = braceEnd(m, i)
          // TS/stage-3 decorators (@Component etc.) belong to the class
          // node in the tree-sitter grammar — same attachment as Python's
          // decorated_definition (masked lines: a "@" inside a string or
          // comment is blanked and cannot attach)
          var start = i
          while (start > 0 && m(start - 1).trim.startsWith("@") &&
            indentOf(m(start - 1)) == indentOf(m(i))) start -= 1
          out += CodeElement.make(name, "class", path, start + 1, end + 1,
            lines.slice(start, end + 1).mkString("\n"))
          // same-line statement-boundary declarations after the class
          // head (`class A{};function b(){}`) — the jsFunction branch's
          // loop, which this branch was missing (round-11 ADVICE #2;
          // tree-sitter emits both declarations)
          for (mm <- jsFunctionMid.findAllMatchIn(m(i))) {
            val e2 = braceEndFrom(m, i, mm.start + 1)
            out += CodeElement.make(mm.group(1), "function", path, i + 1, e2 + 1,
              lines.slice(i, e2 + 1).mkString("\n"))
          }
          i += 1
        case _ if (!inClassBody(i) || bodies.exists(_._2 == i)) &&
          jsFunctionMid.findFirstIn(m(i)).isDefined =>
          // the line STARTS with other code (a previous declaration's
          // closer, a statement) and declares functions after boundaries.
          // A class body's own CLOSING line qualifies too (round-12): in
          // `}; function g(){}` the brace ends the class, so the
          // declaration is top-level — tree-sitter emits it; the body
          // range (which includes its closer line) was hiding it
          for (mm <- jsFunctionMid.findAllMatchIn(m(i))) {
            val end = braceEndFrom(m, i, mm.start + 1)
            out += CodeElement.make(mm.group(1), "function", path, i + 1, end + 1,
              lines.slice(i, end + 1).mkString("\n"))
          }
          i += 1
        case _ if inClassBody(i) && jsMethodAt(m, i).isDefined =>
          val (name, open) = jsMethodAt(m, i).get
          val end = braceEnd(m, open)
          out += CodeElement.make(name, "function", path, i + 1, end + 1,
            lines.slice(i, end + 1).mkString("\n"))
          i += 1
        case _ if isJsImport(m(i)) =>
          // multi-line named-import lists: `import {\n a,\n} from 'x'` —
          // the import_statement node closes with the brace group (scan
          // the MASKED lines so braces in strings/comments never count)
          var end = i
          var bal = m(i).count(_ == '{') - m(i).count(_ == '}')
          while (bal > 0 && end + 1 < lines.length) {
            end += 1
            bal += m(end).count(_ == '{') - m(end).count(_ == '}')
          }
          out += CodeElement.make("import", "import", path, i + 1, end + 1,
            lines.slice(i, end + 1).mkString("\n"), "")
          i = end + 1
        case _ => i += 1
      }
    }
    val els = out.result()
    if (els.nonEmpty) els else textChunks(path, content)
  }

  /** C5: '#'-heading sections; leading prose becomes "Introduction"; empty
    * sections dropped (indexing_agent.py:242-288). */
  def chunkMarkdown(path: String, content: String): Seq[CodeElement] = {
    val lines = content.split("\n", -1)
    val out = Seq.newBuilder[CodeElement]
    var heading = "Introduction"
    var sectionStart = 0
    var buf = Vector.empty[String]
    def flush(endLine: Int): Unit = {
      if (buf.exists(_.trim.nonEmpty))
        out += CodeElement.make(heading, "markdown_section", path,
          sectionStart + 1, endLine, buf.mkString("\n"))
    }
    for ((l, i) <- lines.zipWithIndex) {
      if (l.startsWith("#")) {
        flush(i)
        heading = l.dropWhile(_ == '#').trim
        sectionStart = i
        buf = Vector.empty
      } else buf :+= l
    }
    flush(lines.length)
    out.result()
  }

  /** C6: 50-line blocks, all-blank blocks skipped, names `chunk_<i>`
    * (indexing_agent.py:290-312). */
  def textChunks(path: String, content: String): Seq[CodeElement] = {
    val lines = content.split("\n", -1)
    lines.grouped(TextChunkLines).zipWithIndex.flatMap { case (block, i) =>
      if (block.forall(_.trim.isEmpty)) None
      else Some(CodeElement.make(s"chunk_$i", "text_chunk", path,
        i * TextChunkLines + 1, i * TextChunkLines + block.length,
        block.mkString("\n")))
    }.toSeq
  }

  /** Distributed form: typed flatMap over (path, content) rows. */
  def chunk(files: Dataset[(String, String)]): Dataset[CodeElement] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.flatMap { case (p, c) => chunkFile(p, c) }
  }
}
