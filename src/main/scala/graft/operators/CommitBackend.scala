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
  * verify where it does not (see [[CommitBackend]] for the window). */
object HadoopFsBackend extends CommitBackend {
  // serialize in-JVM create-then-write: the local FS create(false) is
  // check-then-create, so two threads of THIS process could otherwise
  // interleave between the check and the body write (cross-process racers
  // are what the read-back below is for)
  private val createLock = new Object

  override def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte],
      afterWrite: () => Unit): Option[String] = {
    createLock.synchronized {
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
