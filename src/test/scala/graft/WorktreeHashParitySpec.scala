package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.worktreeSrcSha256]]'s walk semantics to the Python twin's
  * (`tools/adversarial_corpus.py` `_worktree_src_sha256`: `os.walk` with
  * `followlinks=False` over a netstring framing) — the two artifact
  * families must produce byte-identical anchors for the same tree
  * (ADVICE r16), including the symlink edge cases ADVICE r17 flagged: a
  * dir-symlink under src/ must contribute nothing (os.walk lists it in
  * `dirnames` and never descends), while a file-symlink reads as its
  * target's bytes (os.walk classifies by following, `open()` follows).
  * The parity test runs the REAL Python walk over the same temp tree.
  */
class WorktreeHashParitySpec extends AnyFunSuite {
  import java.nio.file.{Files, Path}

  /** A root with src/ containing nested dirs, framing-hostile bytes
    * (NULs, ':' — the netstring must stay injective), and empty files.
    */
  private def mkTree(): Path = {
    val root = Files.createTempDirectory("graft_wt_parity")
    val src = root.resolve("src")
    Files.createDirectories(src.resolve("a/b"))
    Files.createDirectories(src.resolve("m"))
    Files.write(src.resolve("a/one.txt"), "alpha\n".getBytes("UTF-8"))
    Files.write(src.resolve("a/b/two.bin"), Array[Byte](0, 1, ':', 0, 57))
    Files.write(src.resolve("m/empty.txt"), Array.empty[Byte])
    Files.write(src.resolve("zed.txt"), "tail".getBytes("UTF-8"))
    root
  }

  private def rmTree(root: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(root)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  private def trySymlink(link: Path, target: Path): Boolean =
    try { Files.createSymbolicLink(link, target); true }
    catch { case _: Exception => false } // FS without symlink support: skip

  test("deterministic, content- and path-sensitive") {
    val root = mkTree()
    try {
      val h1 = Bench.worktreeSrcSha256(root)
      assert(h1 == Bench.worktreeSrcSha256(root), "same tree, same hash")
      Files.write(root.resolve("src/a/one.txt"), "alphb\n".getBytes("UTF-8"))
      val h2 = Bench.worktreeSrcSha256(root)
      assert(h2 != h1, "a one-byte content change must move the anchor")
      Files.move(root.resolve("src/a/one.txt"), root.resolve("src/a/one2.txt"))
      assert(Bench.worktreeSrcSha256(root) != h2,
        "a rename must move the anchor (path is framed with the bytes)")
    } finally rmTree(root)
  }

  test("a dir-symlink under src contributes nothing (os.walk followlinks=False)") {
    val root = mkTree()
    try {
      val base = Bench.worktreeSrcSha256(root)
      // an out-of-src target dir with content that must NOT leak in
      val target = Files.createDirectories(root.resolve("outside"))
      Files.write(target.resolve("secret.txt"), "leak".getBytes("UTF-8"))
      assume(trySymlink(root.resolve("src/linkdir"), target))
      assert(Bench.worktreeSrcSha256(root) == base,
        "a dir-symlink classifies as a dir (followed) but is never recursed")
    } finally rmTree(root)
  }

  test("a file-symlink reads as its target bytes (os.walk classifies by follow)") {
    val root = mkTree()
    try {
      val h0 = Bench.worktreeSrcSha256(root)
      assume(trySymlink(root.resolve("src/alias.txt"), root.resolve("src/zed.txt")))
      val h1 = Bench.worktreeSrcSha256(root)
      assert(h1 != h0, "the symlink contributes its name + target bytes")
      // replacing the symlink with a real copy of the same bytes at the
      // same path hashes identically — exactly what open() on a symlink
      // produces in the Python twin
      Files.delete(root.resolve("src/alias.txt"))
      Files.write(root.resolve("src/alias.txt"), "tail".getBytes("UTF-8"))
      assert(Bench.worktreeSrcSha256(root) == h1)
    } finally rmTree(root)
  }

  /** Run the twin's exact logic (adversarial_corpus.py
    * `_worktree_src_sha256`) over `root`; None when python3 is absent.
    */
  private def pythonTwinHash(root: Path): Option[String] = {
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => Files.isExecutable(java.nio.file.Paths.get(p)))
    python.map { py =>
      val script =
        """import hashlib, os, sys
          |repo = sys.argv[1]
          |h = hashlib.sha256()
          |for root, dirs, files in os.walk(os.path.join(repo, "src")):
          |    dirs.sort()
          |    for fn in sorted(files):
          |        p = os.path.join(root, fn)
          |        rel = os.path.relpath(p, repo).encode()
          |        with open(p, "rb") as fh:
          |            data = fh.read()
          |        h.update(str(len(rel)).encode() + b":" + rel)
          |        h.update(str(len(data)).encode() + b":" + data)
          |print(h.hexdigest())
          |""".stripMargin
      val pb = new ProcessBuilder(py, "-c", script, root.toString)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8").trim
      assert(proc.waitFor() == 0, "python twin failed: " +
        new String(proc.getErrorStream.readAllBytes(), "UTF-8").take(300))
      out
    }
  }

  test("byte-identical to the Python os.walk netstring twin on the same tree") {
    val root = mkTree()
    try {
      // symlink cases included when the FS allows them
      val t = Files.createDirectories(root.resolve("outside"))
      Files.write(t.resolve("secret.txt"), "leak".getBytes("UTF-8"))
      trySymlink(root.resolve("src/linkdir"), t)
      trySymlink(root.resolve("src/alias.txt"), root.resolve("src/zed.txt"))
      val twin = pythonTwinHash(root)
      assume(twin.nonEmpty, "python3 not on this box")
      assert(Bench.worktreeSrcSha256(root) == twin.get,
        "Scala and Python walks must produce byte-identical anchors")
    } finally rmTree(root)
  }

  test("non-BMP names order by code points like the Python twin (ADVICE r18)") {
    // U+E000 (one UTF-16 unit, 0xE000) vs U+10000 (surrogate pair starting
    // 0xD800): Java's String order puts the supplementary name FIRST while
    // Python's code-point order puts U+E000 first — the one regime where
    // the two walks could diverge, exercised with real files so the
    // code-point sort in worktreeSrcSha256 is proven, not assumed
    val root = mkTree()
    try {
      val src  = root.resolve("src")
      val pua  = "\uE000.txt"                                   // one UTF-16 unit
      val supp = new String(Character.toChars(0x10000)) + ".txt" // surrogate pair
      // a JVM without a UTF-8 sun.jnu.encoding (no LANG in the env and no
      // build-injected LC_ALL) cannot even FORM such a path \u2014 skip, named
      val canEncode =
        try { src.resolve(pua); true }
        catch { case _: java.nio.file.InvalidPathException => false }
      assume(canEncode, "filesystem-name encoding cannot represent non-ASCII names on this JVM")
      Files.write(src.resolve(pua), "private-use".getBytes("UTF-8"))
      Files.write(src.resolve(supp), "supplementary".getBytes("UTF-8"))
      // same pair as DIRECTORY names (the walk sorts dirs independently)
      val puaDir  = "\uE001dir"
      val suppDir = new String(Character.toChars(0x10001)) + "dir"
      Files.createDirectories(src.resolve(puaDir))
      Files.createDirectories(src.resolve(suppDir))
      Files.write(src.resolve(puaDir).resolve("x.txt"), "a".getBytes("UTF-8"))
      Files.write(src.resolve(suppDir).resolve("y.txt"), "b".getBytes("UTF-8"))
      val twin = pythonTwinHash(root)
      assume(twin.nonEmpty, "python3 not on this box")
      assert(Bench.worktreeSrcSha256(root) == twin.get,
        "mixed BMP-private-use / supplementary-plane names must hash identically cross-language")
    } finally rmTree(root)
  }
}
