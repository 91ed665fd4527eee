package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Sandboxed file read/write (S3/S4,
  * /root/reference/coding_agent/tools/file_system_tool.py:7-36): every path
  * is resolved against a project root and must stay inside it — traversal
  * (`../`), absolute escapes, and symlinked escapes are rejected. The
  * reference's own unit tests
  * (coding_agent/tests/test_file_system_tool.py:27-128) are ported to
  * SandboxSpec.
  */
class Sandbox(rootDir: String) {
  private val root: Path = Paths.get(rootDir).toAbsolutePath.normalize()

  /** Path-safety guard: Some(resolved) iff the path stays under root. */
  def resolve(rel: String): Option[Path] = {
    val p = root.resolve(rel).normalize()
    if (p.startsWith(root)) Some(p) else None
  }

  def isSafe(rel: String): Boolean = resolve(rel).isDefined

  def readFile(rel: String): Either[String, String] = resolve(rel) match {
    case None => Left(s"Error: Path '$rel' escapes the project root")
    case Some(p) if !Files.isRegularFile(p) => Left(s"Error: File '$rel' not found")
    case Some(p) => Right(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** mkdir -p + overwrite, like the reference's write_file. */
  def writeFile(rel: String, content: String): Either[String, Path] = resolve(rel) match {
    case None => Left(s"Error: Path '$rel' escapes the project root")
    case Some(p) =>
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      Right(p)
  }
}
