package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.Fixtures — the one per-fixture artifact fingerprint (r14
  * verdict Next #6). The property that motivated it: a part-file
  * change must move the fingerprint EVEN IF the enclosing directory's
  * own (length, mtime) stats do not move — the exact case the old
  * top-level keys served stale artifacts for. r16 adds the per-JVM
  * TTL memo (verdict Next #6: don't re-stat every part file 584 × 3
  * times per bench pass) and the directory-name fragments (r15
  * ADVICE: a nested subdir rename must move the digest).
  */
class FixturesSpec extends AnyFunSuite {

  private def write(f: java.io.File, s: String): Unit = {
    val w = new java.io.FileWriter(f)
    try w.write(s) finally w.close()
  }

  test("stable across recomputation; sensitive to hidden part-file change") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp_spec").toFile
    val part = new java.io.File(dir, "part-00000.parquet")
    write(part, "alpha")
    val dirMtime = dir.lastModified
    Fixtures.invalidate()
    val fp1 = Fixtures.fingerprint(dir)
    assert(fp1 == Fixtures.fingerprint(dir), "recomputation must be stable")
    assert(fp1.matches("[0-9a-f]{32}"), "digest form: 32 hex chars")
    // regenerate the part file with different content but FORCE the
    // part file's mtime and the directory's stats back to their old
    // values — only the length differs, as when a fixture is rewritten
    write(part, "alphabeta")
    part.setLastModified(dirMtime)
    dir.setLastModified(dirMtime)
    Fixtures.invalidate()
    val fp2 = Fixtures.fingerprint(dir)
    assert(fp2 != fp1, "part-file length change must move the fingerprint")
    // and an mtime-only change (same length) must move it too
    write(part, "gamma!!!!")           // same 9-byte length as alphabeta
    part.setLastModified(dirMtime + 12345L)
    dir.setLastModified(dirMtime)
    Fixtures.invalidate()
    val fp3 = Fixtures.fingerprint(dir)
    assert(fp3 != fp2, "part-file mtime change must move the fingerprint")
  }

  test("memo: within-TTL hit skips the walk; invalidation re-walks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp_memo").toFile
    val part = new java.io.File(dir, "part-00000.parquet")
    write(part, "first")
    Fixtures.invalidate()
    val fp1 = Fixtures.fingerprint(dir)
    // mutate within the TTL: the memo serves the old digest (this is
    // the bench-pass saving — no re-stat per invocation)
    write(part, "second-changed")
    assert(Fixtures.fingerprint(dir) == fp1,
      "within-TTL call must hit the memo, not re-walk")
    // after invalidation the same call sees the change
    Fixtures.invalidate()
    val fp2 = Fixtures.fingerprint(dir)
    assert(fp2 != fp1, "post-invalidation walk must catch the change")
    // an expired TTL re-walks without explicit invalidation
    write(part, "third-changed!!")
    val saved = Fixtures.ttlMillis
    try {
      Fixtures.ttlMillis = 0L
      assert(Fixtures.fingerprint(dir) != fp2,
        "expired TTL must force a re-walk")
    } finally Fixtures.ttlMillis = saved
  }

  test("nested subdirectory rename moves the digest (dir-name fragments)") {
    val root = java.nio.file.Files.createTempDirectory("graft_fp_dir").toFile
    val sub = new java.io.File(root, "cell=0"); sub.mkdir()
    val leaf = new java.io.File(sub, "part-00000"); write(leaf, "payload")
    Fixtures.invalidate()
    val fp1 = Fixtures.fingerprint(root)
    val sub2 = new java.io.File(root, "cell=1")
    val mt = leaf.lastModified
    assert(sub.renameTo(sub2), "test setup: rename must succeed")
    new java.io.File(sub2, "part-00000").setLastModified(mt)
    Fixtures.invalidate()
    assert(Fixtures.fingerprint(root) != fp1,
      "subdir rename with identical leaf stats must move the digest")
  }

  test("distinct paths never collide even with identical trees") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_fp_a").toFile
    val d2 = java.nio.file.Files.createTempDirectory("graft_fp_b").toFile
    write(new java.io.File(d1, "x"), "same")
    write(new java.io.File(d2, "x"), "same")
    new java.io.File(d2, "x").setLastModified(
      new java.io.File(d1, "x").lastModified)
    Fixtures.invalidate()
    assert(Fixtures.fingerprint(d1) != Fixtures.fingerprint(d2),
      "absolute path participates in the digest")
  }
}
