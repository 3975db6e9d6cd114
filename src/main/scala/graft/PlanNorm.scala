package graft

/** Canonicalized-plan-string normalization behind the bench's plan
  * fingerprints: strips every RUN-VARYING token so that the same code on
  * the same data always hashes to the same value, regardless of JVM or
  * session history — "the plan changed" in a round-over-round diff then
  * means the CODE changed the plan, never that the box replanned.
  *
  * The input is `executedPlan.canonicalized.toString` (attribute ids
  * already normalized to `none#N` there). The leaks this layer closes,
  * each found by diffing real back-to-back full-suite runs (round 15):
  *
  *  1. exprIds / AQE plan ids (`#123`, `plan_id=45`) — per-session
  *     counters.
  *  2. Object-identity renderings (`TopKByScore@1c5f6292`): Aggregator
  *     instances render verbatim inside ObjectHashAggregate lines, and
  *     the default `Object.toString` prints a fresh-per-JVM hash. The
  *     repo's own aggregators carry stable toStrings; the `@hex`
  *     normalization is belt-and-braces for third-party objects.
  *  3. Lambda variables (`x_478` vs `x_1`) — a JVM-global counter; the
  *     name LENGTH also shifts fixed-width metadata truncation, which is
  *     why the bench session raises `spark.sql.maxMetadataStringLength`.
  *  4. Multi-distinct aggregates: `RewriteDistinctAggregates` assigns
  *     its group ids by iterating a HashMap keyed on ExpressionSets
  *     whose hashes include RAW exprIds, so the FILTER-group binding,
  *     the Expand projection ROW order, and the WITHIN-row column
  *     positions all flip with session history — semantically identical
  *     plans, different text. Sorting the top-level elements of
  *     `functions=[…]` / `Expand […]` lists (recursively, so each
  *     Expand row sorts as an element multiset, and each row's TRAILING
  *     bare-int slot — the rewrite's gid — normalizes to `N`) collapses
  *     every ordering to one fingerprint. Tradeoff, deliberate: a
  *     regression that merely permutes those list elements becomes
  *     invisible; structure, operators, and element CONTENT still hash
  *     (incl. non-trailing integer literals inside Expand rows, which
  *     round 16 stopped erasing).
  *  6. Persisted-layout path tokens (round 18, found when a testdata
  *     re-deploy turned PlanGateSpec red on 21 entries with ZERO code
  *     change): plans that scan a persisted graft index/table embed the
  *     cache dir's snapshot fingerprint ([[graft.operators.Ivf
  *     .cachedIndexDir]] folds the source MTIME into it), the commit
  *     run dir's random suffix, and parquet part-file UUIDs — all
  *     run-varying environment tokens, not plan properties. The
  *     SOURCE-path tag (first hex of the cache dir name) is kept: two
  *     different corpora stay distinguishable; a rebuild of the same
  *     corpus hashes identically. Tradeoff, deliberate and documented:
  *     a build-knob change no longer moves the fingerprint via the
  *     snapFp token — knob changes still surface as literals in the
  *     probe plan and through the labeled shared-build frames.
  */
object PlanNorm {

  def normalize(canonicalizedPlan: String): String =
    sortCommutative(normalizeAggOrder(canonicalizedPlan
      .replaceAll("#\\d+", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[id=#x\\]", "")
      .replaceAll("@[0-9a-f]+", "@x")
      // any single-letter lambda variable: the JVM-global counter names
      // x_478 / y_101 etc. (r16: y_* vars surfaced in the unigram HOFs);
      // single-letter base only, so a real column like col_2 never
      // collapses
      .replaceAll("\\blambda ([a-z])_\\d+", "lambda $1_N")
      .replaceAll("\\b([a-z])_\\d+#x", "$1_N#x")
      // Range splits and Par.spread's round-robin width default to the
      // CONTEXT's parallelism (local[N]), which differs between the
      // bench JVM and the test JVM — environment tokens, not plan
      // properties. A hand-written numSlices/repartition(N) change
      // becomes invisible (magnitude only — the Exchange itself still
      // fingerprints); no registered query hardcodes either.
      .replaceAll("splits=\\d+", "splits=N")
      .replaceAll("RoundRobinPartitioning\\(\\d+\\)", "RoundRobinPartitioning(N)")
      // RewriteDistinctAggregates binds its FILTER groups by iterating a
      // HashMap keyed on raw-exprId ExpressionSets, so WHICH distinct agg
      // gets gid 1 vs 2 flips with session history; the raw rendering
      // (protocol v2) keeps real attribute names, so the flip shows as
      // (gid#x = 1) ↔ (gid#x = 2) inside functions elements and as column
      // ORDER inside the rewrite's keys/output/partitioning lists.
      // Normalize the gid literal here; normalizeAggOrder sorts every
      // list on gid-carrying lines.
      .replaceAll("\\(gid#x = \\d+\\)", "(gid#x = N)")
      // leak 6: run-varying file-layout tokens inside scan Locations.
      // Cache-dir snapshot fingerprint (mtime-derived; srcTag kept),
      // commit run-dir random suffix, parquet part-file UUID (the
      // part NUMBER and the c000/codec suffix stay visible).
      .replaceAll("(graft-ivf-index-[0-9a-f]{1,16})-[0-9a-f]{1,16}", "$1-x")
      .replaceAll("(run-\\d+)-[0-9a-f]{8}\\b", "$1-x")
      .replaceAll(
        "(part-\\d+)-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        "$1-x")))

  /** Leak 5 (round 16, found by back-to-back fresh-JVM PlanSnap runs):
    * `multicommutativeop(child…, class <op>, <evalContext>)` renders its
    * children in canonicalization's hashCode order, and an evalContext
    * like `Some(NumericEvalContext(ANSI,true))` carries a JAVA ENUM whose
    * hashCode is identity-based — per-JVM — so nested commutative chains
    * flip child order across JVMs on identical plans. The ops are
    * semantically commutative (And/Or/Add/Multiply), so sorting the
    * OPERAND prefix textually is exact, not a tradeoff; the trailing two
    * metadata slots (op class, eval context) stay in place. */
  private[graft] def sortCommutative(s: String): String = {
    val tok = "multicommutativeop("
    val i = s.indexOf(tok)
    if (i < 0) return s
    val open = i + tok.length - 1 // index of '('
    var depth = 0
    var j = open
    var close = -1
    while (j < s.length && close < 0) {
      s.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = j
        case _ =>
      }
      j += 1
    }
    if (close < 0) return s // unbalanced rendering: pass through
    val inner = sortCommutative(s.substring(open + 1, close))
    val parts = splitTopLevel(inner)
    val rebuilt =
      if (parts.length <= 3) parts.mkString(", ") // nothing to reorder
      else {
        val (operands, meta) = parts.splitAt(parts.length - 2)
        (operands.sorted ++ meta).mkString(", ")
      }
    s.substring(0, open + 1) + rebuilt + ")" +
      sortCommutative(s.substring(close + 1))
  }

  /** Split a parenthesized arg list's body on top-level commas (both
    * paren and bracket nesting respected), trimming each part. */
  private def splitTopLevel(body: String): Vector[String] = {
    val parts = Vector.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          parts += body.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += body.substring(start).trim
    parts.result()
  }

  /** Sort the top-level elements of the bracketed list that starts at
    * `open` (index of a '['), recursing into bracketed elements.
    * `normBareInts` (set on the recursive row level) replaces the LAST
    * element with `N` when it is a bare integer literal — inside an
    * Expand row the rewrite's group id is the trailing projection slot,
    * and it flips with the binding. Scoped to the last slot only
    * (ADVICE r15): an integer literal a real plan change introduces
    * elsewhere in the row stays visible to the fingerprint. */
  private[graft] def sortTopLevel(line: String, open: Int,
      normBareInts: Boolean = false): String = {
    var depth = 0
    var i = open
    val parts = Seq.newBuilder[String]
    var start = open + 1
    var end = -1
    while (i < line.length && end < 0) {
      line.charAt(i) match {
        case '[' | '(' => depth += 1
        case ']' | ')' =>
          depth -= 1
          if (depth == 0) { parts += line.substring(start, i); end = i }
        case ',' if depth == 1 =>
          parts += line.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    if (end < 0) line
    else {
      val raw = parts.result().map(_.trim)
      val sortedParts = raw.zipWithIndex.map { case (part, idx) =>
        if (part.startsWith("[")) sortTopLevel(part, 0, normBareInts = true)
        else if (normBareInts && idx == raw.length - 1 &&
          part.nonEmpty && part.forall(_.isDigit)) "N"
        else part
      }.sorted
      line.substring(0, open + 1) + sortedParts.mkString(", ") +
        line.substring(end)
    }
  }

  private def normalizeAggOrder(s: String): String =
    s.split("\n", -1).map { line =>
      var out = line
      val fm = out.indexOf("functions=[")
      if (fm >= 0) out = sortTopLevel(out, fm + "functions=".length)
      val em = out.indexOf("Expand [")
      if (em >= 0) out = sortTopLevel(out, em + "Expand ".length)
      // multi-distinct rewrite lines (they carry the generated gid
      // column): the rewrite's column ORDER inside keys=[…]/output=[…]/
      // hashpartitioning(…) flips with the same session-history HashMap
      // iteration as the gid binding — sort every list on these lines
      if (out.contains("gid#x")) out = sortAllLists(out)
      out
    }.mkString("\n")

  /** Sort every top-level bracketed list on `line` (and every
    * `hashpartitioning(…)` argument list) — applied only to
    * multi-distinct rewrite lines, where element order is generated, not
    * meaningful. */
  private def sortAllLists(line: String): String = {
    var out = line
    var i = 0
    while (i < out.length) {
      if (out.charAt(i) == '[') {
        out = sortTopLevel(out, i)
        i = skipBalanced(out, i)
      } else i += 1
    }
    var from = 0
    while ({ val h = out.indexOf("hashpartitioning(", from); h >= 0 && {
      val open = h + "hashpartitioning".length
      out = sortTopLevel(out, open)
      from = skipBalanced(out, open)
      true
    }}) ()
    out
  }

  /** Index just past the bracket/paren group opening at `open`. */
  private def skipBalanced(s: String, open: Int): Int = {
    var depth = 0
    var j = open
    while (j < s.length) {
      s.charAt(j) match {
        case '[' | '(' => depth += 1
        case ']' | ')' =>
          depth -= 1
          if (depth == 0) return j + 1
        case _ =>
      }
      j += 1
    }
    s.length
  }
}
