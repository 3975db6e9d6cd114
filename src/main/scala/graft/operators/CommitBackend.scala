package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable single-file publish primitive for the optimistic commit
  * protocols — the manifest create in `Upsert.commitSnapshot` and the
  * claim markers in `Upsert.claimSnapshotId` both reduce to "create this
  * small immutable file iff absent, atomically if the store can, and tell
  * me who won".
  *
  * [[putIfAbsent]] returns None when THIS writer's body is durably the
  * file's content (the caller owns the commit) or Some(winnerBody) when
  * another writer's content is (the caller must retire its attempt and
  * surface a conflict). `afterWrite` fires once the body has been written
  * but before the verify — the seam the crash/race tests inject into.
  *
  * Three implementations span the storage-semantics spectrum the
  * protocol must survive:
  *  - [[HadoopFsBackend]] (default): content-atomic publish + read-back
  *    verify. Local FS: tmp + hard-link (kernel-atomic AND exclusive).
  *    Other Hadoop FSes: tmp + rename — atomic-no-overwrite on HDFS; on
  *    stores whose rename is emulated, arbitration falls to the
  *    read-back and two PUTs landing inside the write→verify gap
  *    (milliseconds) can both believe they won — the documented honest
  *    limit of an FS-only protocol. Either way the manifest becomes
  *    visible with its FULL content or not at all (ADVICE r16).
  *  - [[CasBackend]]: true compare-and-set arbitration, modeling S3
  *    conditional PUT (`If-None-Match: *`) / GCS `ifGenerationMatch: 0` /
  *    etcd txn. The residual window is ZERO: of N racers on one path,
  *    exactly one ever sees None, regardless of timing. The winning body
  *    is still written through to the filesystem so every reader-side
  *    protocol (manifest resolution, pointer repair, GC liveness) is
  *    unchanged.
  *  - [[BlindPutBackend]]: a deliberately racy store with NO exclusive
  *    create at all — every PUT overwrites — and a WIDENED write→verify
  *    gap. Exists for the test suite to prove two things: the read-back
  *    layer alone still detects any overwrite landing before the verify,
  *    and (unlike CAS) a write landing after a racer's verify is
  *    undetectable by construction, which is why conditional PUT is the
  *    production recommendation.
  */
trait CommitBackend {

  /** Create `path` with `body` iff absent. None = this writer owns the
    * path; Some(winnerBody) = another writer does ("unreadable" when the
    * winning content could not be read back). */
  def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte],
      afterWrite: () => Unit = () => ()): Option[String]

  /** Remove a file this backend arbitrates (stale claim-marker
    * reclamation) — backends holding arbitration state beyond the
    * filesystem must clear it here or the path could never be re-won. */
  def delete(fs: FileSystem, path: Path): Unit = fs.delete(path, false)

  protected def readBackOr(fs: FileSystem, path: Path, fallback: String): String =
    try {
      val in = fs.open(path)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, UTF_8)
      } finally in.close()
    } catch { case _: java.io.IOException => fallback }
}

/** Default backend: exclusive-create where the FS provides one, read-back
  * verify where it does not (see [[CommitBackend]] for the window).
  *
  * On the LOCAL filesystem Hadoop's `create(overwrite=false)` is
  * check-then-create, NOT atomic across processes — the round-16
  * cross-JVM soak (`tools/soak_commit.sh`) caught two writer JVMs both
  * "winning" one snapshot id inside the write→verify gap (12 merges, 11
  * ids, one batch silently swallowed). POSIX has a real primitive for
  * this — `open(O_CREAT|O_EXCL)` via `java.nio.Files.createFile` — so
  * `file://` paths take that branch: of N processes racing one path,
  * the kernel hands exactly one the create. HDFS's own create-exclusive
  * is atomic already; object stores without conditional PUT keep the
  * documented read-back-arbitration window and should use [[CasBackend]]
  * semantics (S3 `If-None-Match: *`, GCS `ifGenerationMatch: 0`). */
object HadoopFsBackend extends CommitBackend {
  // serialize in-JVM create-then-write for the non-local branch: the
  // Hadoop create(false) is check-then-create, so two threads of THIS
  // process could otherwise interleave between the check and the body
  // write (cross-process racers on such stores are what the read-back
  // below is for)
  private val createLock = new Object

  override def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte],
      afterWrite: () => Unit): Option[String] = {
    val localAtomic =
      fs.getScheme == "file" && !Upsert.createOverwriteForTest &&
        !Upsert.forceGenericPublishForTest
    if (localAtomic) {
      // write the body to a sibling tmp, then hard-LINK it into place:
      // link(2) is kernel-atomic AND exclusive, and the manifest becomes
      // visible with its FULL content in one syscall — a concurrent
      // reader never observes a half-written manifest (fs.create exposes
      // the file empty-first). Filesystems without hard links fall back
      // to O_EXCL create + write (atomic arbitration, tiny visibility
      // window — still strictly better than check-then-create).
      val local = java.nio.file.Paths.get(fs.makeQualified(path).toUri.getPath)
      Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
      val tmp = local.resolveSibling(
        local.getFileName.toString + ".mftmp-" +
          java.util.UUID.randomUUID().toString.take(8))
      java.nio.file.Files.write(tmp, body)
      try java.nio.file.Files.createLink(local, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp)
          return Some(readBackOr(fs, path, "unreadable"))
        case _: UnsupportedOperationException =>
          // no hard links on this FS: rename the already-written tmp into
          // place. Files.move WITHOUT REPLACE_EXISTING refuses an existing
          // target, so arbitration is check-then-rename (tiny window — the
          // read-back verify below still covers it) while content
          // visibility stays atomic. The previous createFile-then-write
          // could crash between the two and permanently claim the snapshot
          // id with an EMPTY manifest (ADVICE r16) — a rename either
          // publishes the full body or nothing.
          try java.nio.file.Files.move(tmp, local)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              java.nio.file.Files.deleteIfExists(tmp)
              return Some(readBackOr(fs, path, "unreadable"))
          }
      }
      java.nio.file.Files.deleteIfExists(tmp)
    } else if (Upsert.createOverwriteForTest) createLock.synchronized {
      // test fixture: model a store whose PUT blindly overwrites — the
      // read-back verify below is the only arbitration (by design)
      val out = fs.create(path, true)
      try out.write(body) finally out.close()
    } else createLock.synchronized {
      // Content-atomic publish for non-local Hadoop FSes (ADVICE r16):
      // fs.create(path) exposes the file EMPTY first and fills it as the
      // stream writes, so a roll-forward reader racing the commit could
      // read a truncated manifest and silently serve a partial table.
      // Stage the full body in a sibling tmp, then rename into place:
      // on HDFS rename is atomic AND refuses an existing destination
      // (arbitration and content visibility in one namespace op). Object
      // stores whose rename is copy+delete should use [[CasBackend]]
      // semantics — their PUT is already all-or-nothing, conditional PUT
      // closes the arbitration window too.
      if (fs.exists(path)) return Some(readBackOr(fs, path, "unreadable"))
      val tmp = new Path(path.getParent,
        path.getName + ".mftmp-" + java.util.UUID.randomUUID().toString.take(8))
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      val renamed =
        try fs.rename(tmp, path)
        catch { case _: java.io.IOException => false }
      if (!renamed) {
        fs.delete(tmp, false)
        // rename refused: a racer won the destination (or a transient FS
        // error — surfaced as a conflict either way; the caller's
        // progress-aware retry re-attempts against the visible state)
        return Some(readBackOr(fs, path, "unreadable"))
      }
    }
    afterWrite()
    val back = readBackOr(fs, path, null)
    if (back == new String(body, UTF_8)) None
    else Some(if (back == null) "unreadable" else back)
  }
}

/** Conditional-PUT simulation: atomic in-memory arbitration keyed by the
  * qualified path, winning bodies written through to the FS. Zero
  * residual window — a racer arriving ANY time after the winner, even
  * years after the winner's verify, is refused with the winner's body.
  * Arbitration state lives for the JVM (like the store's object
  * generation numbers); [[delete]] clears it so reclaimed claim markers
  * can be re-won, and [[reset]] isolates test suites. */
object CasBackend extends CommitBackend {
  private val owners =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def key(fs: FileSystem, path: Path): String =
    fs.makeQualified(path).toString

  override def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte],
      afterWrite: () => Unit): Option[String] = {
    val prev = owners.putIfAbsent(key(fs, path), body)
    if (prev != null) return Some(new String(prev, UTF_8))
    // this writer won the (atomic) arbitration: the write-through and the
    // hook need no verify — no concurrent PUT can be accepted for this key.
    // The write-through is still staged tmp-then-rename so a READER never
    // observes a half-written body (the modeled store's PUT is
    // all-or-nothing; the filesystem mirror must be too — ADVICE r16).
    val tmp = new Path(path.getParent,
      path.getName + ".mftmp-" + java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(body) finally out.close()
    if (!{ try fs.rename(tmp, path) catch { case _: java.io.IOException => false } }) {
      // Destination existed (stale file from a reclaimed path) — replace
      // it CONTENT-atomically (ADVICE r17: the old blind fs.create last
      // resort could expose a missing or half-written manifest to a
      // reader in the window). This writer won the in-memory arbitration,
      // so no concurrent WRITER exists on this path — only readers — and
      // a rename-with-overwrite publishes the full staged body in one
      // namespace op where the FS provides it (java.nio ATOMIC_MOVE on
      // local; FileContext OVERWRITE elsewhere). Failure here is an
      // infrastructure error and surfaces loud: this owner's commit
      // cannot be silently half-published.
      if (fs.getScheme == "file") {
        val l = java.nio.file.Paths.get(fs.makeQualified(path).toUri.getPath)
        val t = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
        java.nio.file.Files.move(t, l,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } else {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.getUri, fs.getConf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(path),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    }
    afterWrite()
    None
  }

  override def delete(fs: FileSystem, path: Path): Unit = {
    owners.remove(key(fs, path))
    super.delete(fs, path)
  }

  def reset(): Unit = owners.clear()
}

/** No-arbitration store: every PUT overwrites, and the verify is delayed
  * by [[verifyDelayMs]] so concurrent racers demonstrably land INSIDE the
  * window — the configuration under which the read-back layer must catch
  * them. See [[CommitBackend]] for why this store is a test fixture, not
  * a production option. */
object BlindPutBackend extends CommitBackend {
  @volatile var verifyDelayMs: Long = 50L

  override def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte],
      afterWrite: () => Unit): Option[String] = {
    val out = fs.create(path, true) // blind: no exclusive create at all
    try out.write(body) finally out.close()
    afterWrite()
    if (verifyDelayMs > 0) Thread.sleep(verifyDelayMs)
    val back = readBackOr(fs, path, null)
    if (back == new String(body, UTF_8)) None
    else Some(if (back == null) "unreadable" else back)
  }
}
