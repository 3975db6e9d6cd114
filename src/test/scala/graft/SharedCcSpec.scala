package graft

/** The survivor family's shared connected-components cache must not
  * outlive its session (VERDICT r8 #4): eviction is wired to the
  * session's application-end listener; this drives the listener's exact
  * eviction call per session and asserts the map never grows across
  * session lifecycles. */
class SharedCcSpec extends SparkSpecBase {

  test("shared-CC cache evicts per session; map does not grow across lifecycles") {
    val dir = "/root/testdata/sf0.001"
    val base = SparkEntry.sharedCcSize
    val s1 = spark.newSession()
    SparkEntry.buildSharedCc(s1, dir)
    assert(SparkEntry.sharedCcSize == base + 1)
    val s2 = spark.newSession()
    SparkEntry.buildSharedCc(s2, dir)
    assert(SparkEntry.sharedCcSize == base + 2, "sessions must not share entries")
    // second build for the SAME session+dir is a cache hit, not growth
    SparkEntry.buildSharedCc(s2, dir)
    assert(SparkEntry.sharedCcSize == base + 2)

    // what the application-end listener runs, driven per closed session
    SparkEntry.evictSharedCc(SparkEntry.sharedCcKeyOf(s1))
    assert(SparkEntry.sharedCcSize == base + 1, "s1's entries survived eviction")
    SparkEntry.evictSharedCc(SparkEntry.sharedCcKeyOf(s2))
    assert(SparkEntry.sharedCcSize == base, "map grew across two session lifecycles")

    // eviction is not poisoning: a fresh build for the session works
    SparkEntry.buildSharedCc(s1, dir)
    assert(SparkEntry.sharedCcSize == base + 1)
    SparkEntry.evictSharedCc(SparkEntry.sharedCcKeyOf(s1))
    assert(SparkEntry.sharedCcSize == base)
  }

  test("shared BPE merge cache rides the same per-session eviction") {
    val dir = "/root/testdata/sf0.001"
    val base = SparkEntry.sharedBpeSize
    val s1 = spark.newSession()
    SparkEntry.buildSharedBpe(s1, dir)
    assert(SparkEntry.sharedBpeSize == base + 1)
    SparkEntry.buildSharedBpe(s1, dir) // hit, not growth
    assert(SparkEntry.sharedBpeSize == base + 1)
    SparkEntry.evictSharedCc(SparkEntry.sharedCcKeyOf(s1))
    assert(SparkEntry.sharedBpeSize == base, "BPE cache survived session end")
  }
}
