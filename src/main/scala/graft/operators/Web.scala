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
    * through. */
  def hostOf(url: Column): Column = {
    val sp = split(url, "://")
    val afterScheme = when(size(sp) >= 2, element_at(sp, 2))
      .otherwise(element_at(sp, 1))
    val beforePath = element_at(split(afterScheme, "/"), 1)
    val beforeQuery = element_at(split(beforePath, "\\?"), 1)
    val beforeFrag = element_at(split(beforeQuery, "#"), 1)
    val afterUser = element_at(split(beforeFrag, "@"), -1)
    val beforePort = element_at(split(afterUser, ":"), 1)
    rtrim(lower(beforePort), ".")
  }

  /** Registrable domain of a host under a fixed multi-label-suffix list
    * (the public-suffix-list mechanism, shipped with the handful of
    * two-label suffixes the caller cares about; the full PSL is a data
    * file a deployment broadcasts the same way). `www.a.example.com` →
    * `example.com`; `b.example.co.uk` → `example.co.uk`; a host at or
    * below the suffix boundary passes through unchanged. */
  def registrableDomain(host: Column,
      multiLabelSuffixes: Seq[String] =
        Seq("co.uk", "com.au", "co.jp", "com.br")): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    // try_element_at: a single-label host ("localhost") has no -2/-3
    // index — it must pass through, not throw
    val lastTwo = concat_ws(".",
      try_element_at(parts, lit(-2)), try_element_at(parts, lit(-1)))
    // case-insensitive: callers may pass hosts that didn't go through
    // hostOf's normalization
    val isMulti = multiLabelSuffixes
      .map(s => lower(lastTwo) === s.toLowerCase).reduce(_ || _)
    when(isMulti && n >= lit(3),
        concat_ws(".", try_element_at(parts, lit(-3)), lastTwo))
      .when(!isMulti && n >= lit(2), lastTwo)
      .otherwise(host)
  }
}
