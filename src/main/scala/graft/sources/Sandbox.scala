package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, LinkOption, Path, Paths}

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

  // The root is materialized at construction, BEFORE realRoot is resolved:
  // a lazily cached lexical fallback would permanently reject every path
  // when the root did not exist at first resolve() (and writeFile could no
  // longer bootstrap a fresh workspace), or cache a stale lexical value if
  // the root later appeared under a symlinked parent.
  Files.createDirectories(root)
  private val realRoot: Path = root.toRealPath()

  /** Path-safety guard: Some(resolved) iff the path stays under root.
    * Two checks: lexical (normalize + startsWith, catching `../` and
    * absolute escapes) and physical (the deepest existing ancestor's
    * toRealPath must still sit under the real root, catching a symlink
    * INSIDE the root that points outside it). A broken/unresolvable link
    * is rejected rather than followed. */
  def resolve(rel: String): Option[Path] = {
    val p = root.resolve(rel).normalize()
    if (!p.startsWith(root)) None
    else {
      var e = p
      while (e != null && e.startsWith(root) &&
        !Files.exists(e, LinkOption.NOFOLLOW_LINKS)) e = e.getParent
      val physicallyInside =
        try e == null || e.toRealPath().startsWith(realRoot)
        catch { case _: java.io.IOException => false }
      if (physicallyInside) Some(p) else None
    }
  }

  def isSafe(rel: String): Boolean = resolve(rel).isDefined

  /** IO failures become Left, never escaped exceptions — the reference's
    * read_file/write_file wrap everything in try/except and return error
    * strings (file_system_tool.py), and this surface keeps that contract
    * for permission errors, name collisions (a.txt/b.txt under an existing
    * file a.txt), directories passed as files, and invalid path characters
    * (round-4 review). */
  def readFile(rel: String): Either[String, String] =
    try resolve(rel) match {
      case None => Left(s"Error: Path '$rel' escapes the project root")
      case Some(p) if !Files.isRegularFile(p) => Left(s"Error: File '$rel' not found")
      case Some(p) => Right(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    } catch { case e: Exception => Left(s"Error reading '$rel': ${e.getMessage}") }

  /** mkdir -p + overwrite, like the reference's write_file. */
  def writeFile(rel: String, content: String): Either[String, Path] =
    try resolve(rel) match {
      case None => Left(s"Error: Path '$rel' escapes the project root")
      case Some(p) =>
        Files.createDirectories(p.getParent)
        Files.write(p, content.getBytes(StandardCharsets.UTF_8))
        Right(p)
    } catch { case e: Exception => Left(s"Error writing '$rel': ${e.getMessage}") }
}
