package graft

import org.apache.spark.sql.SparkSession

/** Optimization evidence dumper: writes the `.explain("formatted")`
  * rendering of named registered queries to
  * `plans/<round>/<name>_<tag>.txt` — the before/after artifacts an
  * optimization round commits next to its notes (OPTIMIZATION_rN.md).
  *
  * Usage: `runMain graft.ExplainSnap <tag> <name>[,<name>…] [round]`
  * (`round` defaults to r19). Reads `$SPARK_GRAFT_SF_DIR` (default
  * sf0.1) under the bench session knobs so the rendered plan is the
  * shape the bench actually runs.
  */
object ExplainSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainSnap <tag> <names,comma-sep> [round]")
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val round = args.lift(2).getOrElse("r19")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxMetadataStringLength", 100000)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(s"plans/$round")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"${n}_$tag.txt"), txt)
      System.err.println(s"[explain] wrote ${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
