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
  *  - [[HadoopFsBackend]] (default): `create(overwrite=false)` +
  *    read-back verify. The create is truly atomic on HDFS; on the local
  *    FS (and S3 without conditional PUT) it is check-then-act, so
  *    arbitration falls to the read-back and two PUTs landing inside the
  *    write→verify gap (milliseconds) can both believe they won — the
  *    documented honest limit of an FS-only protocol.
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
      fs.getScheme == "file" && !Upsert.createOverwriteForTest
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
          java.nio.file.Files.deleteIfExists(tmp)
          try java.nio.file.Files.createFile(local) // kernel-atomic O_EXCL
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              return Some(readBackOr(fs, path, "unreadable"))
          }
          java.nio.file.Files.write(local, body)
      }
      java.nio.file.Files.deleteIfExists(tmp)
    } else createLock.synchronized {
      val out =
        try fs.create(path, Upsert.createOverwriteForTest)
        catch {
          case _ @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                    _: java.io.IOException) if fs.exists(path) =>
            return Some(readBackOr(fs, path, "unreadable"))
        }
      try out.write(body) finally out.close()
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
    // hook need no verify — no concurrent PUT can be accepted for this key
    val out = fs.create(path, true)
    try out.write(body) finally out.close()
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
