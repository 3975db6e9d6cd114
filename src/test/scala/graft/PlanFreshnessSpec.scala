package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan audit's freshness guard (VERDICT r8 #1): PLANS.md embeds a
  * fingerprint of the sources it was generated from; this recomputes it
  * against the working tree, so an audit that lags ANY src/main change
  * fails the build instead of silently describing plans that no longer
  * exist. No Spark session needed — pure file hashing. */
class PlanFreshnessSpec extends AnyFunSuite {

  test("PLANS.md was regenerated after the last source change") {
    val plansPath = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.exists(plansPath),
      "PLANS.md missing — run sbt \"runMain graft.PlanDump\"")
    val plans = java.nio.file.Files.readString(plansPath)
    val fp = PlanDump.sourceFingerprint()
    assert(plans.contains(s"Source fingerprint: $fp"),
      s"PLANS.md is STALE (expected fingerprint $fp): the physical-plan " +
        "audit no longer describes the current build — regenerate with " +
        "sbt \"runMain graft.PlanDump\" and review the diff for plan-shape " +
        "regressions (new shuffles, lost broadcasts, lost pushdown)")
  }
}
