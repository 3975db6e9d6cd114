package graft

/** The plan-regression gate (VERDICT r15 #2): rebuilds every registered
  * entry's normalized physical plan under the canonical knobs and diffs
  * it byte-for-byte against the committed authoritative map
  * `bench/plans_canonical/` — a plan change (new shuffle, lost
  * broadcast, lost pushdown, operator swap) fails `sbt test` NAMING the
  * entry, instead of surfacing rounds later as an unexplained bench
  * hash move. After an INTENTIONAL plan change, regenerate with
  * `sbt "runMain graft.PlanSnap"` and review the git diff — that
  * regeneration is the explicit, reviewed action.
  *
  * Rebuilt texts land in `target/plans_gate/` so a failure is
  * `diff bench/plans_canonical/<e>.txt target/plans_gate/<e>.txt` away
  * from a root cause. Needs the sf0.1 testdata (cancels without it). */
class PlanGateSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.1"

  test("registered plans match the committed canonical map (bench/plans_canonical)") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val canonDir = java.nio.file.Paths.get(PlanCanon.canonicalDir)
    assert(java.nio.file.Files.isDirectory(canonDir),
      s"${PlanCanon.canonicalDir} missing — run sbt \"runMain graft.PlanSnap\"")
    val committed: Map[String, String] = {
      val ls = java.nio.file.Files.list(canonDir)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala
          .filter(_.toString.endsWith(".txt"))
          .map(p => p.getFileName.toString.stripSuffix(".txt") ->
            java.nio.file.Files.readString(p))
          .toMap
      } finally ls.close()
    }
    val s = PlanCanon.configured(spark)
    PlanCanon.buildSharedCaches(s, sfDir)
    val outDir = java.nio.file.Paths.get("target/plans_gate")
    java.nio.file.Files.createDirectories(outDir)
    val changed = Seq.newBuilder[String]
    val added = Seq.newBuilder[String]
    val broken = Seq.newBuilder[String]
    val seen = Set.newBuilder[String]
    PlanCanon.frames(s, sfDir).foreach { case (name, mk) =>
      seen += name
      try {
        val rebuilt = PlanCanon.normalizedPlan(mk)
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), rebuilt)
        committed.get(name) match {
          case None => added += name
          case Some(c) if c != rebuilt => changed += name
          case _ =>
        }
      } catch { case e: Throwable => broken += s"$name (${e.getClass.getSimpleName})" }
    }
    val removed = (committed.keySet -- seen.result()).toSeq.sorted
    val problems = Seq(
      "PLAN CHANGED" -> changed.result().sorted,
      "NEW ENTRY (not in canonical map)" -> added.result().sorted,
      "REMOVED ENTRY (canonical file is orphaned)" -> removed,
      "PLAN CONSTRUCTION FAILED" -> broken.result().sorted)
      .filter(_._2.nonEmpty)
    assert(problems.isEmpty, problems.map { case (kind, names) =>
      s"\n  $kind: ${names.mkString(", ")}"
    }.mkString + "\n  diff bench/plans_canonical/<entry>.txt " +
      "target/plans_gate/<entry>.txt for the shape change; if intentional, " +
      "regenerate with sbt \"runMain graft.PlanSnap\" and review the git diff")
  }
}
