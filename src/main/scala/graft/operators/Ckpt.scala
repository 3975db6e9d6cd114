package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage pin for iterative loops, with a configurable FAULT CONTRACT
  * (VERDICT r13 #2).
  *
  * Every fixed-point loop in the engine (CC label/star, k-core, PageRank,
  * TrustRank, LPA, BFS, the two-slice monitor histograms, the HNSW
  * search/build steps, the distributed BPE and unigram rounds) must truncate
  * lineage each round: a step that references its predecessor twice grows
  * the logical plan exponentially in rounds without a pin. The DEFAULT pin
  * is `localCheckpoint()` — fast (executor-local blocks, no DFS write),
  * but NOT fault-tolerant: the blocks live only in executor storage, so on
  * a preemptible fleet one lost executor kills the whole job with no
  * recompute path (the lineage was deliberately cut).
  *
  * Setting the session conf `spark.graft.checkpointDir` to a reliable
  * (DFS-visible) path switches every loop to RELIABLE `checkpoint()`:
  * each round's frame is written to the checkpoint dir, and a lost
  * executor merely re-reads it. The price is one DFS round-trip per loop
  * round — the right trade on a 100 TB fleet where losing hour N of an
  * N-hour iterative job costs more than the writes. Checkpoint files
  * accumulate for the life of the application unless the context was
  * started with `spark.cleaner.referenceTracking.cleanCheckpoints=true`;
  * either way they are bounded by rounds × frame size and vanish with the
  * checkpoint dir.
  *
  * Both paths are EAGER (the loops rely on the pin executing the round's
  * single job — convergence `Observation`s fire during it) and both
  * return a frame whose plan is a flat scan of the pinned data.
  */
object Ckpt {

  /** Session conf naming the reliable checkpoint root. Absent/empty →
    * localCheckpoint. */
  val DirConf = "spark.graft.checkpointDir"

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val conf = spark.conf.getOption(DirConf).filter(_.nonEmpty)
    conf match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — set it
        // only when unset (or pointed elsewhere) so one application's
        // rounds share a directory.
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint() // eager, reliable
      case None => df.localCheckpoint() // eager, executor-local
    }
  }

  /** `df.pin()` sugar so call sites chain like `.localCheckpoint()` did. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Ckpt.pin(df)
  }
}
