package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def naivePairs(strs: Seq[String], k: Int): Set[(String, String, Long)] =
    (for {
      a <- strs; b <- strs if a < b
      d = lev(a, b) if d <= k
    } yield (a, b, d.toLong)).toSet

  // independent reference implementation (classic DP), NOT Spark's builtin
  private def lev(a: String, b: String): Int = {
    val (m, n) = (a.length, b.length)
    val dp = Array.tabulate(m + 1, n + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to m; j <- 1 to n)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(m)(n)
  }

  private def run(strs: Seq[String], k: Int, maxLen: Int = 64): Set[(String, String, Long)] =
    EditDistance.pairs(strs.toDF("s").withColumn("id", col("s")), "id", "s", k, maxLen)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("deletion variants: levels, dedup, empty string") {
    val df = Seq("abc", "aa", "").toDF("s")
      .select(EditDistance.deletionVariants(col("s"), 2).as("v"))
    val got = df.collect().map(_.getSeq[String](0)).toSeq
    // abc: itself, 3 single deletions, 3 distinct double deletions
    assert(got(0) == Seq("abc", "bc", "ac", "ab", "c", "b", "a"))
    // aa: single deletions collapse to one "a", doubles to one ""
    assert(got(1) == Seq("aa", "a", ""))
    // empty string survives with only itself (sequence(1,0) guard; its
    // deletion levels are empty arrays, so flatten leaves just "")
    assert(got(2) == Seq(""))
  }

  test("hand case: typo pairs found at k=2, far pairs excluded") {
    val got = run(Seq("red widget", "red widgets", "red wifget", "blue bolt"), 2)
    assert(got == Set(
      ("red widget", "red widgets", 1L),
      ("red widget", "red wifget", 1L),
      ("red widgets", "red wifget", 2L)))
  }

  test("completeness: every planted <=k-edit twin is recovered") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh"
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 1 to edits) {
        val i = rnd.nextInt(math.max(cur.length, 1))
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.take(i) + cur.drop(i + 1)            // delete
          case 1 => cur.take(i) + alpha(rnd.nextInt(alpha.length)) + cur.drop(i) // insert
          case _ if cur.nonEmpty =>
            cur.take(i) + alpha(rnd.nextInt(alpha.length)) + cur.drop(i + 1) // substitute
          case _ => cur + alpha(rnd.nextInt(alpha.length))
        }
      }
      cur
    }
    val bases = (0 until 30).map(i =>
      (0 until 6 + rnd.nextInt(8)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString + i)
    val twins = bases.map(b => b -> mutate(b, 1 + rnd.nextInt(2)))
    val corpus = (bases ++ twins.map(_._2)).distinct
    val found = run(corpus, 2)
    val foundKeys = found.map(t => (t._1, t._2))
    for ((b, t) <- twins if b != t) {
      val d = lev(b, t)
      if (d <= 2) {
        val key = if (b < t) (b, t) else (t, b)
        assert(foundKeys.contains(key), s"missing planted pair $key (dist $d)")
      }
    }
  }

  test("exactness: equals naive all-pairs on a mixed corpus, incl. unicode") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcde"
    val corpus = ((0 until 60).map(_ =>
      (0 until 4 + rnd.nextInt(6)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      ++ Seq("café", "cafe", "cafés", "naïve", "naive", "", "a")).distinct
    assert(run(corpus, 2) == naivePairs(corpus, 2))
    assert(run(corpus, 1) == naivePairs(corpus, 1))
  }

  test("exactness holds at k=3 (deeper deletion neighborhoods)") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcd"
    val corpus = ((0 until 40).map(_ =>
      (0 until 5 + rnd.nextInt(5)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      ++ Seq("abc", "", "a", "abcdef")).distinct
    assert(run(corpus, 3) == naivePairs(corpus, 3))
  }

  test("maxLen excludes long strings from pairing") {
    val long1 = "x" * 70
    val long2 = "x" * 70 + "y"
    val got = run(Seq(long1, long2, "short", "shorp"), 2)
    assert(got == Set(("shorp", "short", 1L)))
  }
}
