package graft

/** One fixture-fingerprint convention for every per-fixture artifact
  * and memo key (r14 verdict Next #6). The hazard: keys built from a
  * parquet DIRECTORY's top-level (length, lastModified) miss a
  * regenerated fixture whose part files change while the top-level dir
  * stats happen not to move — the artifact (partitioned copy, bucketed
  * table, persisted index, bloom rewrite) is then served stale. The
  * fix is a recursive walk: every file's (name, length, mtime) under
  * the path feeds the key, so ANY part-file change invalidates.
  *
  * The walk is collapsed to an MD5 hex digest so the result is safe to
  * embed in filesystem artifact names (a sf0.1 fixture dir holds
  * dozens of part files; the raw walk string would blow past name
  * limits) and in memo-map keys. MD5 here is a cache key, not a
  * security boundary.
  */
object Fixtures {

  /** Content fingerprint of a file or directory tree: 32 hex chars. */
  def fingerprint(f: java.io.File): String = {
    def fp(x: java.io.File): String =
      if (x.isDirectory)
        Option(x.listFiles()).map(_.sortBy(_.getName).map(fp).mkString(","))
          .getOrElse("<unlistable>")
      else s"${x.getName}:${x.length}:${x.lastModified}"
    val walk = s"${f.getAbsolutePath}|${fp(f)}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(walk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  def fingerprint(path: String): String =
    fingerprint(new java.io.File(path))
}
