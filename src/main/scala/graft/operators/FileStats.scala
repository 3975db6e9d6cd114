package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Per-file column statistics for manifest-bucketed tables — Delta/Iceberg
  * style DATA SKIPPING, reduced to what the engine's read paths need.
  *
  * At commit time [[Upsert.commitSnapshot]] reads the parquet FOOTERS of
  * the run's new files (pure metadata I/O, same cost class as the file
  * listing the commit already does — nothing rescans data) and records
  * min/max/null-count per supported top-level column in the manifest under
  * a flat `"file_stats"` object. Untouched buckets carry their previous
  * entries forward, so stats stay exact for every referenced file without
  * ever re-opening old files.
  *
  * At read time [[Upsert.readManifestTable]] accepts [[ColRange]]
  * predicates and drops manifest entries whose recorded interval cannot
  * intersect them — BEFORE Spark ever lists or opens the file. Bucket
  * pruning already kills key-equality lookups; file stats add the
  * orthogonal axis a 100 TB table is actually range-scanned on (event
  * time, ingest batch, id ranges): a reader asking for one day of a
  * year-long table opens ~1/365 of the files, and the decision costs one
  * manifest read on the driver. Row-group pruning inside a file still
  * happens (files are key-sorted / z-ordered); file-level stats make the
  * same decision WITHOUT the object-store round-trip per footer — at
  * 100 TB the footer reads themselves are the bottleneck this kills.
  *
  * Supported stat types: INT64, INT32, FLOAT, DOUBLE physical parquet
  * columns (covers bigint/int/double/float plus timestamp-micros and
  * date-days, which Spark stores as INT64/INT32). Strings are deliberately
  * NOT recorded: truncation-correct string bounds (Iceberg's
  * increment-last-byte dance) buy little on this engine's read paths and
  * a wrong bound silently drops data. A column with no recorded stats
  * never prunes — absence is always safe (legacy manifests included).
  *
  * Encoding is FLAT — `"<relpath>|<col>": "<t>|<min>|<max>|<nulls>"` —
  * so the same regex discipline as the rest of the manifest parser
  * applies (no nested-brace parsing; values contain no braces or
  * brackets). An all-null column encodes empty min/max and still prunes
  * range predicates (a range never matches NULL).
  */
object FileStats {

  /** One file-column statistic: physical type tag, decimal-comparable
    * min/max (None = column all-null in this file), null count. */
  final case class ColStats(typ: String, min: Option[BigDecimal],
      max: Option[BigDecimal], nulls: Long)

  /** Inclusive-by-default range predicate over one column, in the
    * column's PHYSICAL domain: micros since epoch for timestamps, days
    * for dates, the numeric value otherwise. AND-composed by the read
    * path. */
  final case class ColRange(col: String,
      lo: Option[BigDecimal] = None, hi: Option[BigDecimal] = None,
      loInclusive: Boolean = true, hiInclusive: Boolean = true) {

    /** Could a file with these stats contain a matching row? Missing
      * stats ⇒ yes (never prune blind); all-null column ⇒ no (NULL
      * never satisfies a range). */
    def mayMatch(s: Option[ColStats]): Boolean = s match {
      case None => true
      case Some(cs) => (cs.min, cs.max) match {
        case (Some(mn), Some(mx)) =>
          lo.forall(l => if (loInclusive) mx >= l else mx > l) &&
            hi.forall(h => if (hiInclusive) mn <= h else mn < h)
        case _ => false // all-null file column
      }
    }
  }

  object ColRange {
    def eqTo(col: String, v: Long): ColRange =
      ColRange(col, Some(BigDecimal(v)), Some(BigDecimal(v)))
    def atLeast(col: String, v: Long): ColRange =
      ColRange(col, lo = Some(BigDecimal(v)))
    def atMost(col: String, v: Long): ColRange =
      ColRange(col, hi = Some(BigDecimal(v)))
    def between(col: String, lo: Long, hi: Long): ColRange =
      ColRange(col, Some(BigDecimal(lo)), Some(BigDecimal(hi)))
  }

  /** Read footers of `files` (relativePath → absolutePath) and collect
    * stats for `cols`. A column is recorded only when EVERY row group
    * carries usable statistics for it — a single stats-less row group
    * makes the whole file's column unknown (conservative: unknown never
    * prunes). Unsupported physical types are skipped silently. */
  def collect(conf: Configuration, files: Seq[(String, String)],
      cols: Seq[String]): Map[String, Map[String, ColStats]] = {
    val wanted = cols.toSet
    files.map { case (rel, abs) =>
      rel -> collectOne(conf, abs, wanted)
    }.toMap
  }

  private def collectOne(conf: Configuration, absPath: String,
      wanted: Set[String]): Map[String, ColStats] = {
    val in = HadoopInputFile.fromPath(new Path(absPath), conf)
    val reader = ParquetFileReader.open(in)
    try {
      // (min, max, nulls, ok) accumulated across row groups per column
      val acc = scala.collection.mutable.Map
        .empty[String, (Option[BigDecimal], Option[BigDecimal], Long, String)]
      var bad = Set.empty[String]
      reader.getFooter.getBlocks.forEach { bg =>
        bg.getColumns.forEach { cc =>
          val path = cc.getPath.toArray
          if (path.length == 1 && wanted.contains(path(0)) && !bad(path(0))) {
            val name = path(0)
            val tpe = cc.getPrimitiveType.getPrimitiveTypeName
            val tag = tpe match {
              case PrimitiveTypeName.INT64 => "i64"
              case PrimitiveTypeName.INT32 => "i32"
              case PrimitiveTypeName.DOUBLE => "f64"
              case PrimitiveTypeName.FLOAT => "f32"
              case _ => null
            }
            val st = cc.getStatistics
            if (tag == null || st == null || st.isEmpty && cc.getValueCount > 0) {
              bad += name; acc.remove(name)
            } else {
              val (mn, mx): (Option[BigDecimal], Option[BigDecimal]) =
                if (!st.hasNonNullValue) (None, None)
                else (Some(toDecimal(st.genericGetMin.asInstanceOf[AnyRef])),
                  Some(toDecimal(st.genericGetMax.asInstanceOf[AnyRef])))
              val prev = acc.getOrElse(name, (None, None, 0L, tag))
              if (prev._4 != tag) { bad += name; acc.remove(name) }
              else acc(name) = (minOpt(prev._1, mn), maxOpt(prev._2, mx),
                prev._3 + st.getNumNulls, tag)
            }
          }
        }
      }
      acc.iterator.map { case (c, (mn, mx, nulls, tag)) =>
        c -> ColStats(tag, mn, mx, nulls)
      }.toMap
    } finally reader.close()
  }

  private def toDecimal(v: AnyRef): BigDecimal = v match {
    case l: java.lang.Long => BigDecimal(l.longValue())
    case i: java.lang.Integer => BigDecimal(i.intValue())
    case d: java.lang.Double => BigDecimal(java.lang.Double.toString(d))
    case f: java.lang.Float => BigDecimal(java.lang.Float.toString(f))
    case other => BigDecimal(other.toString)
  }

  private def minOpt(a: Option[BigDecimal], b: Option[BigDecimal]) =
    (a.toSeq ++ b.toSeq).reduceOption(_ min _)
  private def maxOpt(a: Option[BigDecimal], b: Option[BigDecimal]) =
    (a.toSeq ++ b.toSeq).reduceOption(_ max _)

  // ---- flat JSON encoding ------------------------------------------------
  // "file_stats": {"<rel>|<col>": "<t>|<min>|<max>|<nulls>", ...}
  // Paths are generated (no '|' or '"'); column names are identifiers.

  /** Render the flat file_stats object body (no surrounding braces). */
  def encode(stats: Map[String, Map[String, ColStats]]): String =
    stats.toSeq.sortBy(_._1).flatMap { case (rel, byCol) =>
      byCol.toSeq.sortBy(_._1).map { case (c, s) =>
        val mn = s.min.map(_.bigDecimal.toPlainString).getOrElse("")
        val mx = s.max.map(_.bigDecimal.toPlainString).getOrElse("")
        s""""$rel|$c": "${s.typ}|$mn|$mx|${s.nulls}""""
      }
    }.mkString(",")

  /** Parse a manifest body's file_stats object back to the stats map.
    * Absent field (pre-round-10 manifests) parses as empty. */
  def parse(body: String): Map[String, Map[String, ColStats]] = {
    val obj = """"file_stats"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
    val entry = """"([^"|]+)\|([^"|]+)"\s*:\s*"([^"|]*)\|([^"|]*)\|([^"|]*)\|([^"|]*)"""".r
    entry.findAllMatchIn(obj).toSeq.groupBy(_.group(1)).map { case (rel, ms) =>
      rel -> ms.map { m =>
        val mn = if (m.group(4).isEmpty) None else Some(BigDecimal(m.group(4)))
        val mx = if (m.group(5).isEmpty) None else Some(BigDecimal(m.group(5)))
        m.group(2) -> ColStats(m.group(3), mn, mx, m.group(6).toLong)
      }.toMap
    }
  }

  /** Partition `files` (relative paths) into (kept, pruned) under the
    * AND of `ranges`, given a manifest's stats map. */
  def split(stats: Map[String, Map[String, ColStats]],
      files: Seq[String], ranges: Seq[ColRange]): (Seq[String], Seq[String]) =
    files.partition { rel =>
      val byCol = stats.getOrElse(rel, Map.empty)
      ranges.forall(r => r.mayMatch(byCol.get(r.col)))
    }
}
