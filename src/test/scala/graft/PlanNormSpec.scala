package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PlanNorm]] against the REAL flapping variants captured from
  * round-15 back-to-back full-suite bench runs — each pair is two
  * renderings of the SAME plan from sessions with different histories,
  * and must normalize byte-identically. */
class PlanNormSpec extends AnyFunSuite {

  test("multi-distinct Expand: gid binding + within-row position flips collapse") {
    // q21_waiting_supplier, observed in runs M vs N: the gid rewrite
    // swapped which Expand row carries the CASE projection AND which
    // column slot it lands in.
    val a = "+- Expand [[none#xL, none#xL, null, 1], [none#xL, null, " +
      "CASE WHEN (R = none#x) THEN none#xL END, 2]], [none#xL, none#xL, none#xL, none#x]"
    val b = "+- Expand [[none#xL, CASE WHEN (R = none#x) THEN none#xL END, " +
      "null, 1], [none#xL, null, none#xL, 2]], [none#xL, none#xL, none#xL, none#x]"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
  }

  test("multi-distinct HashAggregate: FILTER-group order flips collapse") {
    val a = "+- HashAggregate(keys=[none#xL], functions=[partial_count(none#xL) " +
      "FILTER (WHERE (1 = none#x)), partial_count(none#xL) FILTER (WHERE (2 = none#x))], " +
      "output=[none#xL, none#xL, none#xL])"
    val b = "+- HashAggregate(keys=[none#xL], functions=[partial_count(none#xL) " +
      "FILTER (WHERE (2 = none#x)), partial_count(none#xL) FILTER (WHERE (1 = none#x))], " +
      "output=[none#xL, none#xL, none#xL])"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
  }

  test("lambda-variable counter and object identity hashes normalize") {
    val a = "Project [filter(split(text#12,  , -1), lambdafunction(NOT " +
      "(lambda x_1#34 = ), lambda x_1#34, false)) AS ws#56]"
    val b = "Project [filter(split(text#999,  , -1), lambdafunction(NOT " +
      "(lambda x_478#77 = ), lambda x_478#77, false)) AS ws#88]"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
    assert(PlanNorm.normalize("agg(graft.functions.Foo@1c5f6292)") ==
      PlanNorm.normalize("agg(graft.functions.Foo@54519d74)"))
  }

  test("multi-distinct raw rendering: gid BINDING flip collapses (protocol v2)") {
    // captured from source_diversity under two session histories: which
    // distinct agg gets gid 1 vs 2 flips, and the rewrite's column order
    // inside keys/output/partitioning flips with it
    val a = Seq(
      "+- HashAggregate(keys=[source#12], functions=[partial_count(__id#3L) FILTER (WHERE (gid#7 = 1)), partial_count(__s#4L) FILTER (WHERE (gid#7 = 2))], output=[source#12, count#8L, count#9L])",
      "   +- Exchange hashpartitioning(source#12, __id#3L, __s#4L, gid#7, 4), ENSURE_REQUIREMENTS, [plan_id=5]",
      "      +- HashAggregate(keys=[source#12, __id#3L, __s#4L, gid#7], functions=[partial_count(1)], output=[source#12, __id#3L, __s#4L, gid#7, count#10L])").mkString("\n")
    val b = Seq(
      "+- HashAggregate(keys=[source#12], functions=[partial_count(__id#3L) FILTER (WHERE (gid#7 = 2)), partial_count(__s#4L) FILTER (WHERE (gid#7 = 1))], output=[source#12, count#8L, count#9L])",
      "   +- Exchange hashpartitioning(source#12, __s#4L, __id#3L, gid#7, 4), ENSURE_REQUIREMENTS, [plan_id=5]",
      "      +- HashAggregate(keys=[source#12, __s#4L, __id#3L, gid#7], functions=[partial_count(1)], output=[source#12, __s#4L, __id#3L, gid#7, count#10L])").mkString("\n")
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
    // distinct aggs over DIFFERENT columns still hash apart
    val c = b.replace("partial_count(__s#4L)", "partial_count(__t#4L)")
    assert(PlanNorm.normalize(a) != PlanNorm.normalize(c))
  }

  test("multicommutativeop: JVM-varying child order collapses; meta slots stay") {
    // captured from back-to-back fresh-JVM PlanSnap runs (derive_record):
    // the evalContext enum's identity hashCode flips the canonical sort
    val a = "Filter multicommutativeop((0 < size(CASE WHEN NOT ((none#xL % 13) = 0) " +
      "THEN array(cast(none#xL as float)) END, false)), CASE WHEN NOT ((none#xL % 97) = 0) " +
      "THEN isnotnull(none#x) ELSE false END, (NOT ((none#xL % 13) = 0) <=> true), " +
      "class org.apache.spark.sql.catalyst.expressions.And, None)"
    val b = "Filter multicommutativeop(CASE WHEN NOT ((none#xL % 97) = 0) " +
      "THEN isnotnull(none#x) ELSE false END, (0 < size(CASE WHEN NOT ((none#xL % 13) = 0) " +
      "THEN array(cast(none#xL as float)) END, false)), (NOT ((none#xL % 13) = 0) <=> true), " +
      "class org.apache.spark.sql.catalyst.expressions.And, None)"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
    // nested ops normalize inside-out (q19's Or-of-Ands flip)
    val n1 = "multicommutativeop(multicommutativeop(p, q, class X.And, None), " +
      "multicommutativeop(r, s, class X.And, None), class X.Or, None)"
    val n2 = "multicommutativeop(multicommutativeop(s, r, class X.And, None), " +
      "multicommutativeop(q, p, class X.And, None), class X.Or, None)"
    assert(PlanNorm.normalize(n1) == PlanNorm.normalize(n2))
    // the trailing metadata slots are NOT sorted into the operands
    assert(PlanNorm.normalize("multicommutativeop(z, a, class X.And, None)") ==
      "multicommutativeop(a, z, class X.And, None)")
    // real operand differences stay visible
    assert(PlanNorm.normalize("multicommutativeop(a, b, class X.And, None)") !=
      PlanNorm.normalize("multicommutativeop(a, c, class X.And, None)"))
  }

  test("different plans still hash apart") {
    // normalization must not erase REAL differences: operator, column
    // content, and structure survive
    assert(PlanNorm.normalize("+- HashAggregate(keys=[none#1x], functions=[sum(none#2)])") !=
      PlanNorm.normalize("+- HashAggregate(keys=[none#1x], functions=[max(none#2)])"))
    assert(PlanNorm.normalize("+- Expand [[a, null, 1], [b, null, 2]], [o]") !=
      PlanNorm.normalize("+- Expand [[a, null, 1], [c, null, 2]], [o]"))
    // bare-int gid normalization is scoped to the TRAILING row slot
    // (ADVICE r15): a changed integer literal elsewhere in the row is a
    // real plan change and must stay visible...
    assert(PlanNorm.normalize("+- Expand [[a, 5, null, 1]], [o]") !=
      PlanNorm.normalize("+- Expand [[a, 7, null, 1]], [o]"))
    // ...while the trailing gid itself still collapses
    assert(PlanNorm.normalize("+- Expand [[a, null, 1]], [o]") ==
      PlanNorm.normalize("+- Expand [[a, null, 2]], [o]"))
    assert(PlanNorm.normalize("Filter (a > 1)\n+- Scan x") !=
      PlanNorm.normalize("Scan x"))
  }

  test("unbalanced or bracket-free lines pass through untouched") {
    val s = "some line without lists"
    assert(PlanNorm.normalize(s) == s)
    val unbalanced = "+- Expand [[a, b"
    assert(PlanNorm.normalize(unbalanced) == unbalanced)
  }

  test("persisted-layout path tokens normalize: snapFp, run suffix, part uuid") {
    // captured from PlanGateSpec going red on 21 entries after a testdata
    // re-deploy changed parquet MTIMES (cachedIndexDir folds mtime into
    // the snapshot fingerprint) — identical code, identical plan shape,
    // different cache-dir/run/part tokens
    val a = "FileScan parquet [vec_id#xL] ... InMemoryFileIndex(1 paths)[" +
      "file:/tmp/graft-ivf-index-c1aa66c82e7bfc30-bb9c058b00fd425a/cells/" +
      "data/run-000000000-352742aa/__cell_p=6/" +
      "part-00000-10d78fc7-dd08-4ddf-b8f4-404a0ac57d6c.c000.snappy.parquet]"
    val b = "FileScan parquet [vec_id#xL] ... InMemoryFileIndex(1 paths)[" +
      "file:/tmp/graft-ivf-index-c1aa66c82e7bfc30-dcc3818d5018cc4b/cells/" +
      "data/run-000000000-15eadf8f/__cell_p=6/" +
      "part-00000-4036b438-aa8d-49bc-9b81-a6d694fcff43.c000.snappy.parquet]"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
    // the SOURCE tag (first hex token) is a corpus identity, not a
    // run-varying token: two different corpora must stay apart
    assert(PlanNorm.normalize("/tmp/graft-ivf-index-aaaa1111-e1/cells") !=
      PlanNorm.normalize("/tmp/graft-ivf-index-bbbb2222-e1/cells"))
    // the part NUMBER is layout (file count/ordering), not noise
    assert(PlanNorm.normalize(
      "part-00000-10d78fc7-dd08-4ddf-b8f4-404a0ac57d6c.c000.snappy.parquet") !=
      PlanNorm.normalize(
        "part-00001-10d78fc7-dd08-4ddf-b8f4-404a0ac57d6c.c000.snappy.parquet"))
  }
}
