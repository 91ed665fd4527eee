package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sandbox

/** Port of the reference's only real unit-test module
  * (/root/reference/coding_agent/tests/test_file_system_tool.py:27-128):
  * path-safety valid/invalid incl. traversal, read success/not-found/unsafe,
  * write success/mkdir/unsafe/overwrite. */
class SandboxSpec extends AnyFunSuite {
  private val root = Files.createTempDirectory("graft_sandbox").toString
  private val sb = new Sandbox(root)

  test("safe relative paths accepted") {
    assert(sb.isSafe("a.txt"))
    assert(sb.isSafe("sub/dir/b.txt"))
    assert(sb.isSafe("./c.txt"))
    assert(sb.isSafe("sub/../d.txt")) // normalizes inside root
  }

  test("traversal and absolute escapes rejected") {
    assert(!sb.isSafe("../outside.txt"))
    assert(!sb.isSafe("../../etc/passwd"))
    assert(!sb.isSafe("a/../../../x"))
    assert(!sb.isSafe("/etc/passwd"))
  }

  test("write then read round-trips") {
    assert(sb.writeFile("f.txt", "line1\nline2").isRight)
    assert(sb.readFile("f.txt") == Right("line1\nline2"))
  }

  test("write creates parent dirs; overwrite replaces") {
    assert(sb.writeFile("deep/nested/g.txt", "v1").isRight)
    assert(sb.writeFile("deep/nested/g.txt", "v2").isRight)
    assert(sb.readFile("deep/nested/g.txt") == Right("v2"))
  }

  test("symlinked escapes rejected (physical containment, not just lexical)") {
    val outside = Files.createTempDirectory("graft_outside")
    Files.write(outside.resolve("secret.txt"), "top secret".getBytes)
    val rootPath = java.nio.file.Paths.get(root)
    Files.createSymbolicLink(rootPath.resolve("link_dir"), outside)
    Files.createSymbolicLink(rootPath.resolve("link_file"), outside.resolve("secret.txt"))
    Files.createSymbolicLink(rootPath.resolve("broken"), outside.resolve("gone.txt"))
    assert(!sb.isSafe("link_dir"))
    assert(!sb.isSafe("link_dir/secret.txt"))
    assert(!sb.isSafe("link_dir/new.txt")) // write THROUGH the link: refused
    assert(!sb.isSafe("link_file"))
    assert(!sb.isSafe("broken")) // unresolvable link: refused, not followed
    assert(sb.readFile("link_file").isLeft)
    assert(sb.writeFile("link_dir/new.txt", "x").isLeft)
    // a symlink inside the root pointing INSIDE the root stays allowed
    Files.write(rootPath.resolve("inside.txt"), "ok".getBytes)
    Files.createSymbolicLink(rootPath.resolve("link_inside"), rootPath.resolve("inside.txt"))
    assert(sb.isSafe("link_inside"))
    assert(sb.readFile("link_inside") == Right("ok"))
  }

  test("read missing file and unsafe paths error") {
    assert(sb.readFile("nope.txt").isLeft)
    assert(sb.readFile("../escape.txt").isLeft)
    assert(sb.writeFile("../escape.txt", "x").isLeft)
  }

  test("IO failures return Left, never escape as exceptions (reference contract)") {
    // writing under an existing FILE as if it were a directory
    assert(sb.writeFile("collide.txt", "x").isRight)
    assert(sb.writeFile("collide.txt/child.txt", "y").isLeft)
    // reading a directory as a file
    assert(sb.writeFile("adir/inner.txt", "z").isRight)
    assert(sb.readFile("adir").isLeft)
  }
}
