package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain analytics — the unit of trust in web-scale curation is
  * the REGISTRABLE domain (one owner registers `example.co.uk`;
  * `a.example.co.uk` and `b.example.co.uk` are the same publisher), so
  * domain-level quality aggregation, allow/deny-listing and per-domain
  * caps all need host → registrable-domain extraction first. Pure
  * `Column` string ops (split/element_at/concat) — scan-stage,
  * codegen'd, no UDF, no regex-dialect risk. */
object Web {

  /** Host of a URL: strips the scheme if present (taking the segment
    * after the FIRST `://` — a URL embedded in a query parameter must
    * not hijack the host), then the path / `?query` / `#fragment`,
    * then `user:pass@` userinfo, then a `:port`; finally lowercases
    * and drops a trailing FQDN dot (hostnames are case-insensitive).
    * Scheme-less inputs ("example.com/x") and bare hosts pass
    * through. A bracketed IPv6 literal (`http://[::1]:8080/x`) is
    * returned WITHOUT its brackets (`::1`) — the colons inside the
    * brackets must not be mistaken for the port separator, so the
    * bracketed form is unwrapped before the `:port` strip. */
  def hostOf(url: Column): Column = {
    val sp = split(url, "://")
    val afterScheme = when(size(sp) >= 2, element_at(sp, 2))
      .otherwise(element_at(sp, 1))
    val beforePath = element_at(split(afterScheme, "/"), 1)
    val beforeQuery = element_at(split(beforePath, "\\?"), 1)
    val beforeFrag = element_at(split(beforeQuery, "#"), 1)
    val afterUser = element_at(split(beforeFrag, "@"), -1)
    // RFC 3986 IP-literal: everything inside [...] is the host and may
    // contain colons; split-on-":" only applies to the unbracketed form
    val bracketed = substring_index(substring_index(afterUser, "]", 1), "[", -1)
    val beforePort = when(startswith(afterUser, lit("[")), bracketed)
      .otherwise(element_at(split(afterUser, ":"), 1))
    rtrim(lower(beforePort), ".")
  }

  /** Registrable domain of a host under a fixed multi-label-suffix list
    * (the public-suffix-list mechanism, shipped with the handful of
    * two-label suffixes the caller cares about; load the full PSL with
    * [[loadPsl]] + [[registrableDomainPsl]]). `www.a.example.com` →
    * `example.com`; `b.example.co.uk` → `example.co.uk`; a host at or
    * below the suffix boundary passes through unchanged. */
  def registrableDomain(host: Column,
      multiLabelSuffixes: Seq[String] =
        Seq("co.uk", "com.au", "co.jp", "com.br")): Column =
    registrableDomainPsl(host,
      PslRules(plain = multiLabelSuffixes.map(_.toLowerCase).toSet,
        wildcard = Set.empty, exceptions = Set.empty))

  /** A parsed public-suffix rule set: `plain` suffixes matched verbatim,
    * `wildcard` BASES (the rule `*.ck` is stored as base `ck` — any one
    * label atop the base completes the suffix), and `exceptions` (the
    * rule `!www.ck` means `www.ck` is NOT a public suffix despite
    * `*.ck`; its public suffix is the rule minus its leftmost label).
    * All lowercase. */
  final case class PslRules(plain: Set[String], wildcard: Set[String],
      exceptions: Set[String])

  /** Parse public-suffix-list lines: `//` comments and blank lines drop;
    * `!rule` → exception; `*.base` → wildcard base; anything else a
    * plain suffix. (The real PSL's ICANN/PRIVATE sections are both just
    * rules; callers wanting only one section slice before parsing.) */
  def parsePsl(lines: Seq[String]): PslRules = {
    val rules = lines.iterator
      .map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      // a rule line is the rule up to the first whitespace (PSL format)
      .map(_.takeWhile(!_.isWhitespace))
      .toSeq
    PslRules(
      plain = rules.filter(r => !r.startsWith("!") && !r.startsWith("*.")).toSet,
      wildcard = rules.filter(_.startsWith("*.")).map(_.drop(2)).toSet,
      exceptions = rules.filter(_.startsWith("!")).map(_.drop(1)).toSet)
  }

  /** Load a public-suffix list file through the Hadoop FileSystem API —
    * one rule per line, `//` comments — so the same call works on HDFS /
    * object stores, not just local disk. The parsed rule set is a
    * driver-side value baked into the plan as literals (an `isin` per
    * label depth — Catalyst turns large lists into `InSet` hash probes),
    * the broadcast-small-side posture for a ≤ few-thousand-entry list. */
  def loadPsl(spark: org.apache.spark.sql.SparkSession, path: String): PslRules = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      parsePsl(src.getLines().toSeq)
    } finally in.close()
  }

  /** Registrable domain under a full PSL rule set (longest-match-wins,
    * exceptions beat wildcards — publicsuffix.org semantics; the
    * implicit `*` default makes the last label a suffix when nothing
    * matches). A host at or below its public-suffix boundary passes
    * through unchanged (the fixed-list method's contract). Pure
    * codegen'd Column ops: one split, then per-depth suffix-join +
    * set-probe conditions, longest effective suffix first. */
  def registrableDomainPsl(host: Column, rules: PslRules): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    // try_element_at: a single-label host ("localhost") has no -2/-3
    // index — it must pass through, not throw
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => try_element_at(parts, lit(-i))): _*)
    def lastKLower(k: Int): Column = lower(lastK(k))
    def inSet(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isin(s.toSeq: _*)
    // candidate matches as (effectiveSuffixDepth, condition, registrable):
    //   exception rule of d labels: public suffix = d-1 labels, so the
    //     registrable domain is the rule's own d labels
    //   plain rule of d labels: registrable = d+1 labels
    //   wildcard base of d labels: suffix = d+1 labels, registrable = d+2
    val excs = rules.exceptions.groupBy(r => r.count(_ == '.') + 1).toSeq
      .map { case (d, s) =>
        (d - 1, inSet(lastKLower(d), s) && n >= d, lastK(d), 2) }
    val plains = rules.plain.groupBy(r => r.count(_ == '.') + 1).toSeq
      .map { case (d, s) =>
        (d, inSet(lastKLower(d), s) && n >= d + 1, lastK(d + 1), 1) }
    val wilds = rules.wildcard.groupBy(r => r.count(_ == '.') + 1).toSeq
      .map { case (d, s) =>
        (d + 1, inSet(lastKLower(d), s) && n >= d + 2, lastK(d + 2), 0) }
    // exception rules prevail over everything (publicsuffix.org: "If
    // more than one rule matches, the prevailing rule is the exception
    // rule"); among the rest the longest effective suffix wins, plain
    // before wildcard on ties
    val ordered = (excs ++ plains ++ wilds)
      .sortBy { case (d, _, _, rank) => (if (rank == 2) 0 else 1, -d, -rank) }
    val dflt = when(n >= 2, lastK(2)).otherwise(host)
    ordered.foldLeft(Option.empty[Column]) { case (acc, (_, cond, out, _)) =>
      Some(acc.fold(when(cond, out))(_.when(cond, out)))
    }.fold(dflt)(_.otherwise(dflt))
  }

  /** Tracking query parameters dropped by [[canonicalizeUrl]]'s default:
    * the `utm_*` campaign family by prefix plus the common per-click
    * identifiers — parameters that vary per visit while addressing the
    * same resource, i.e. exactly what makes one page look like a million
    * distinct URLs to a crawl-frontier dedup. */
  val DefaultTrackingPrefixes: Seq[String] = Seq("utm_")
  val DefaultTrackingParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "igshid", "mc_eid", "ref")

  /** URL canonicalization for crawl-frontier / document dedup: two URLs
    * that address the same resource should compare EQUAL as strings.
    * Normalizations applied: scheme and host lowercase; trailing FQDN
    * dot and `user:pass@` userinfo dropped; default ports stripped
    * (`:80` for http, `:443` for https); empty path becomes `/`;
    * `#fragment` dropped (client-side only); tracking parameters
    * removed (prefix + exact lists, case-insensitive names); surviving
    * query parameters SORTED (param order is almost never semantic;
    * sorting buys `?a=1&b=2` == `?b=2&a=1`). A bracketed IPv6 literal
    * keeps its brackets (they are required syntax when a port follows).
    * Pure codegen'd Column ops — scan-stage, no UDF.
    *
    * Deliberately NOT done: percent-encoding normalization and path
    * segment resolution (`/a/../b`) — both need a spec-complete parser
    * whose corner cases (invalid escapes, encoded separators) silently
    * MERGE distinct resources when done half-way; the conservative
    * canonical form only merges aliases it is sure about. */
  def canonicalizeUrl(url: Column,
      dropPrefixes: Seq[String] = DefaultTrackingPrefixes,
      dropParams: Seq[String] = DefaultTrackingParams): Column = {
    val sp = split(url, "://")
    val hasScheme = size(sp) >= 2
    val scheme = lower(element_at(sp, 1))
    val rest = when(hasScheme, element_at(sp, 2)).otherwise(element_at(sp, 1))
    val noFrag = element_at(split(rest, "#"), 1)
    val authority =
      element_at(split(element_at(split(noFrag, "/"), 1), "\\?"), 1)
    // everything after the authority: "", "/path", "?q", "/path?q"
    val pq = noFrag.substr(length(authority) + 1, length(noFrag))
    val path0 = element_at(split(pq, "\\?"), 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qsp = split(pq, "\\?", 2)
    val query0 = when(size(qsp) >= 2, element_at(qsp, 2)).otherwise(lit(""))
    // host/port from the authority (the hostOf decomposition, keeping
    // the port this time)
    val afterUser = element_at(split(authority, "@"), -1)
    val isBr = startswith(afterUser, lit("["))
    val brHost =
      substring_index(substring_index(afterUser, "]", 1), "[", -1)
    val host = rtrim(lower(when(isBr, brHost)
      .otherwise(element_at(split(afterUser, ":"), 1))), ".")
    val rawPort = when(isBr,
        when(afterUser.contains("]:"),
          element_at(split(afterUser, "\\]:"), -1)).otherwise(lit("")))
      .otherwise(when(size(split(afterUser, ":")) >= 2,
        element_at(split(afterUser, ":"), 2)).otherwise(lit("")))
    val port = when(
        (scheme === "http" && rawPort === "80") ||
        (scheme === "https" && rawPort === "443"), lit(""))
      .otherwise(rawPort)
    val hostOut = when(host.contains(":"), concat(lit("["), host, lit("]")))
      .otherwise(host)
    val hostPort = concat(hostOut,
      when(port =!= "", concat(lit(":"), port)).otherwise(lit("")))
    // query params: drop tracking names, drop empties, sort survivors
    val keptParams = filter(split(query0, "&"), p => {
      val name = lower(substring_index(p, "=", 1))
      val byPrefix =
        if (dropPrefixes.isEmpty) lit(false)
        else dropPrefixes.map(pr => name.startsWith(pr.toLowerCase))
          .reduce(_ || _)
      val byName =
        if (dropParams.isEmpty) lit(false)
        else name.isin(dropParams.map(_.toLowerCase): _*)
      p =!= "" && !byPrefix && !byName
    })
    val q = array_join(array_sort(keptParams), "&")
    concat(
      when(hasScheme, concat(scheme, lit("://"))).otherwise(lit("")),
      hostPort, path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Visible text of an HTML payload — the extraction step between a raw
    * crawl and every text-quality operator in the library. Drops
    * `<script>`/`<style>` subtrees (their CONTENT is code, not prose),
    * comments, then all tags (each replaced by a space so adjacent words
    * don't fuse across block boundaries), decodes the six ubiquitous
    * entities (`&amp;` LAST — decoding it first would double-decode
    * `&amp;lt;` into `<`), and collapses whitespace runs. All patterns
    * are RE2-compatible (no backreferences or lookarounds), so an
    * external SQL engine can mirror the chain verbatim.
    *
    * Honest limits (documented, not hidden): no CDATA, no conditional
    * comments, no entity table beyond the six, no attribute-aware parse
    * (a literal `>` inside an attribute value truncates that tag) — the
    * 99% crawl case, with the long tail left to a real parser off-path. */
  def stripHtml(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Domain-level quality prior joined back to documents — the
    * URL-prior trick of web-curation pipelines: a page's quality
    * estimate borrows strength from its PUBLISHER (registrable domain)
    * when per-page signals are noisy, so the per-domain mean of a
    * quality metric rides along as a feature (`prior_micro`, exact
    * integer micro-units: `10⁶·Σmetric div n`) with the domain's doc
    * count (`n_docs_domain` — the confidence weight a downstream blend
    * applies). Null-metric docs contribute nothing to the prior but
    * still RECEIVE it.
    *
    * Scale shape: staged host/domain projections (§7.4 item 0 — never
    * one composed expression), one domain-keyed map-side-combined
    * aggregate (the domain table is orders of magnitude smaller than
    * the corpus), and one join back — the prior side is
    * broadcast-class at any realistic domain cardinality. */
  def domainPrior(df: org.apache.spark.sql.DataFrame, idCol: String,
      urlCol: String, metric: Column): org.apache.spark.sql.DataFrame = {
    // checkpoint the parsed slim table: it feeds BOTH the prior
    // aggregate and the join-back (the Cooccur replicated-subtree
    // lesson), and it caps the codegen unit — the fused
    // url→host→domain projection stack otherwise exceeds the 64 KB
    // method limit and silently drops the whole stage to interpreted
    // mode (observed: 2.5 s vs 0.5 s on 50k docs)
    val docs = df
      .select(col(idCol), metric.as("__m"), col(urlCol).as("__u"))
      .select(col(idCol), col("__m"), hostOf(col("__u")).as("__h"))
      .select(col(idCol), col("__m"),
        registrableDomain(col("__h")).as("domain"))
      .localCheckpoint()
    val prior = docs.groupBy("domain")
      .agg(count(lit(1)).as("n_docs_domain"),
        sum(col("__m").cast("long")).as("__s"),
        count(col("__m")).as("__nm"))
      .selectExpr("domain", "CAST(n_docs_domain AS BIGINT) AS n_docs_domain",
        // decimal widen: 10⁶ × a domain's token sum wraps a Long at
        // realistic corpus sizes (the epochBudget convention)
        """CAST(CASE WHEN __nm > 0
          |  THEN CAST(1000000 AS DECIMAL(38,0)) * __s div __nm
          |  ELSE 0 END AS BIGINT) AS prior_micro""".stripMargin)
    docs.select(col(idCol), col("domain"))
      .join(broadcast(prior), Seq("domain"))
      .select(col(idCol), col("domain"), col("n_docs_domain"),
        col("prior_micro"))
  }

  /** One robots-exclusion rule: an `Allow:`/`Disallow:` line's path
    * pattern (RFC 9309 syntax — literal path prefix, `*` wildcards, an
    * optional trailing `$` end anchor). */
  final case class RobotRule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body for one crawler (RFC 9309 group
    * semantics): groups open with one or more `User-agent:` lines and
    * carry the `Allow:`/`Disallow:` rules that follow; the rules that
    * apply are ALL groups naming `agent` (case-insensitive product
    * token), falling back to the `*` groups when none do — the
    * most-specific-group rule of the spec, with same-agent groups
    * merged. Empty-pattern rules drop (an empty `Disallow:` is the
    * classic "allow everything" idiom, and an empty pattern must not
    * win longest-match against real rules). Comments (`#` to EOL) and
    * unknown directives (Crawl-delay, Sitemap) are ignored. */
  def parseRobots(lines: Seq[String], agent: String = "*"): Seq[RobotRule] = {
    final case class Group(agents: Set[String], rules: Vector[RobotRule])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var cur: Option[Group] = None
    var openingAgents = true // consecutive User-agent lines share a group
    def directive(l: String): Option[(String, String)] = {
      val noComment = l.takeWhile(_ != '#')
      val i = noComment.indexOf(':')
      if (i < 0) None
      else Some((noComment.take(i).trim.toLowerCase, noComment.drop(i + 1).trim))
    }
    lines.foreach { raw =>
      directive(raw) match {
        case Some(("user-agent", a)) =>
          if (openingAgents && cur.isDefined)
            cur = Some(cur.get.copy(agents = cur.get.agents + a.toLowerCase))
          else {
            cur.foreach(groups += _); openingAgents = true
            cur = Some(Group(Set(a.toLowerCase), Vector.empty))
          }
        case Some((d, p)) if d == "allow" || d == "disallow" =>
          openingAgents = false
          if (p.nonEmpty)
            cur = cur.map(g =>
              g.copy(rules = g.rules :+ RobotRule(d == "allow", p)))
        case _ => ()
      }
    }
    cur.foreach(groups += _)
    val want = agent.toLowerCase
    val named = groups.filter(_.agents.contains(want)).flatMap(_.rules)
    val fallback =
      if (named.nonEmpty || want == "*") named
      else groups.filter(_.agents.contains("*")).flatMap(_.rules)
    fallback.toSeq
  }

  /** Escape a literal string for use inside a regex that BOTH Java's
    * engine and RE2 (the common SQL-engine regex) accept: per-character
    * backslash escaping of the shared metacharacter set — `\Q...\E`
    * would be Java-only. */
  private[operators] def escapeRe2(s: String): String =
    s.flatMap(c =>
      if ("\\^$.|?*+()[]{}".contains(c)) s"\\$c" else c.toString)

  /** A robots rule pattern as an anchored, RE2-compatible regex:
    * matched from the path START (prefix semantics), `*` → `.*`, a
    * TRAILING `$` becomes the end anchor (RFC 9309's only `$` meaning;
    * elsewhere it is literal), everything else escaped. */
  private[operators] def robotsPatternRegex(pattern: String): String = {
    val (body, anchor) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), "$") else (pattern, "")
    "^" + body.split("\\*", -1).map(escapeRe2).mkString(".*") + anchor
  }

  /** Is `path` fetchable under `rules`? RFC 9309 precedence: among all
    * matching rules the LONGEST pattern (octet length) wins; on a
    * length tie `Allow` prevails; no match → allowed. The rule set is a
    * driver-side value (parsed once with [[parseRobots]] from the
    * site's robots.txt — the [[loadPsl]] data-file posture) baked into
    * the plan as a sorted `when` chain of anchored regex probes: the
    * first match in (length DESC, allow-first) order IS the decision,
    * so per row the work is at most |rules| codegen'd RE2 prefix
    * matches — scan-stage, no join, no UDF. Rule sets are tens of
    * lines for almost every real site; a pathological thousands-line
    * robots.txt would instead join against a broadcast rule table. */
  def robotsAllowed(path: Column, rules: Seq[RobotRule]): Column = {
    val ordered = rules.distinct
      .sortBy(r => (-r.pattern.length, !r.allow))
    ordered.foldLeft(Option.empty[Column]) { case (acc, r) =>
      val cond = regexp_like(path, lit(robotsPatternRegex(r.pattern)))
      Some(acc.fold(when(cond, lit(r.allow)))(_.when(cond, lit(r.allow))))
    }.fold(lit(true))(_.otherwise(lit(true)))
  }

  /** All `href` targets of an HTML payload as an array — the outlink
    * extraction feeding the link-graph family ([[hostOf]] →
    * [[registrableDomain]] → per-domain census → PageRank/TrustRank).
    * Fragment-only and empty targets are excluded by the character
    * class; RE2-compatible, group-1 extraction. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)href\\s*=\\s*[\"']([^\"'#\\s>]+)"), lit(1))

  /** Politeness scheduling for a crawl frontier: every URL gets its
    * fetch WAVE — its 1-based position in the per-host queue under the
    * caller's priority order (ties broken by `tieCol`, so the schedule
    * is a deterministic total order) — and its earliest start time
    * `eta_sec = (wave − 1) · delaySec`, the crawl-delay arithmetic of a
    * one-connection-per-host fetcher. Wave 1 is fetchable immediately
    * across ALL hosts in parallel; a host's queue serializes. `delaySec`
    * is a per-row column so robots crawl-delay / host-reputation tiers
    * plug in directly.
    *
    * Scale shape: ONE exchange on host + a per-host window — hosts are
    * the natural partition and real frontiers are wide (millions of
    * hosts), so the window is healthy; a pathological single-host
    * frontier should be capped FIRST (the `domain_cap` per-publisher
    * budget composes upstream of this), which also bounds the wave
    * numbers. No global sort: the cross-host interleaving is implied by
    * `eta_sec`, never materialized. */
  def politenessWaves(df: org.apache.spark.sql.DataFrame, hostCol: Column,
      orderCol: Column, tieCol: Column, delaySec: Column)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(hostCol).orderBy(orderCol, tieCol)
    df.withColumn("wave", row_number().over(w).cast("long"))
      .withColumn("eta_sec", (col("wave") - 1L) * delaySec.cast("long"))
  }
}
