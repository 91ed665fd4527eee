package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Driver/executor-side md5 hex (same value as Spark's `md5` SQL function
  * and DuckDB's `md5`); used by the typed chunker for content hashes (C7,
  * /root/reference/coding_agent/tools/indexing_agent.py:28-31). */
object Md5 {
  def hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
