package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state operator for
  * event streams (SURVEY.md §2.9): consecutive events of a key belong to
  * one session while the gap between them stays under `gapSeconds`.
  *
  * Two implementations with identical semantics:
  *  - [[sessions]]: declarative batch plan (lag → gap flag → running sum →
  *    aggregate). One shuffle on the key; the window sort is per-key and
  *    spills safely. This is the backfill / bounded-input path.
  *  - [[sessionsStreaming]]: `flatMapGroupsWithState` with an event-time
  *    timeout — the unbounded path; state per key is O(1) (the open
  *    session's aggregates, never the events).
  */
object Sessionize {

  /** Batch sessionization. Output: one row per closed session —
    * (key, session_start, session_end, n_events, session_id) where
    * session_id numbers a key's sessions in time order from 1. */
  def sessions(events: DataFrame, gapSeconds: Long,
      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val gapFlag = when(
      col(tsCol).cast("long") - lag(col(tsCol), 1).over(byKey).cast("long")
        > gapSeconds, 1L).otherwise(0L)
    events
      .withColumn("__new_session", gapFlag)
      .withColumn("__session_id",
        sum(col("__new_session")).over(byKey) + 1L)
      .groupBy(col(keyCol), col("__session_id").as("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"))
  }

  /** Top navigation PATHS: the product-analytics census over
    * [[sessions]]' islands — per (key, session) the event-type sequence
    * in deterministic `(event time, tieCol)` order, truncated to the
    * first `maxSteps` steps and joined with `>`, then the `k` most
    * common paths ranked `(n_sessions DESC, path ASC)`. The truncation
    * is the scale guard: a bot session with 10^6 events contributes a
    * bounded string, and the path-domain cardinality stays bounded by
    * `|event types|^maxSteps` instead of by session length.
    *
    * Shape: the same single key-partitioned exchange as [[sessions]]
    * (gap flag + running island id reuse one sort), a per-session
    * collect bounded by construction at the aggregation (sort_array of
    * ≤ session-length structs, sliced to maxSteps), then a map-side-
    * combined path count and a bounded TakeOrdered — no global sort. A
    * hot KEY serializes its sort like sessions' (same chunked-twin
    * escape applies); a hot PATH costs one count row. */
  def topPaths(events: DataFrame, gapSeconds: Long, k: Int,
      maxSteps: Int = 8, keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", tieCol: String = "event_id"): DataFrame = {
    require(k > 0 && maxSteps > 0, "k and maxSteps must be positive")
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val gapFlag = when(
      col(tsCol).cast("long") - lag(col(tsCol), 1).over(byKey).cast("long")
        > gapSeconds, 1L).otherwise(0L)
    events
      .withColumn("__new_session", gapFlag)
      .withColumn("__session_id", sum(col("__new_session")).over(byKey) + 1L)
      .groupBy(col(keyCol), col("__session_id"))
      .agg(array_join(slice(transform(
          sort_array(collect_list(struct(
            unix_micros(col(tsCol)).as("t"), col(tieCol).as("e"),
            col(typeCol).as("y")))),
          s => s("y")), 1, maxSteps), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(k)
  }

  /** Time-chunked batch sessionization — the skew escape for [[sessions]]
    * (SURVEY §6.-2f): a per-key gaps-and-islands window cannot split one
    * key across tasks, so a key holding p% of all events degrades the plain
    * path toward single-core over its rows. This variant spends a second
    * (tiny) pass to break that floor:
    *
    *  1. events shuffle on `(key, floor(epoch / chunkSeconds))` and the gap
    *     logic runs within each chunk — a hot key's work spreads over its
    *     whole time range (parallelism = chunks it spans), and the local
    *     session aggregate reuses the same exchange;
    *  2. local sessions (one row per island per chunk — session-count-sized,
    *     not event-count-sized) re-shuffle on the key alone and merge across
    *     chunk boundaries with the identical gap criterion.
    *
    * Output is EXACTLY [[sessions]]'s, session ids included: chunks
    * partition time, so a key's local sessions are disjoint intervals with
    * strictly increasing starts, within-chunk islands are already separated
    * by more than `gap`, and `chunkSeconds > gapSeconds` guarantees any two
    * events within `gap` land in the same or adjacent chunks — the merge
    * pass's `start − prev_end > gap` flag therefore reproduces the plain
    * algorithm's islands verbatim (equality property-tested in
    * SessionizeSpec; the registered query shares `sessions`' oracle).
    *
    * Cost: one extra exchange of one row per session. Worth it only when a
    * key can plausibly own a task-sized share of events; benign
    * distributions should keep [[sessions]] (single pass). */
  def sessionsChunked(events: DataFrame, gapSeconds: Long, chunkSeconds: Long,
      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(chunkSeconds > gapSeconds,
      s"chunkSeconds ($chunkSeconds) must exceed gapSeconds ($gapSeconds): " +
        "a session could otherwise skip over an entire empty chunk and the " +
        "adjacent-chunk merge would split it")
    val chunked = events.withColumn("__chunk",
      floor(col(tsCol).cast("long") / lit(chunkSeconds)))
    val byKeyChunk =
      Window.partitionBy(col(keyCol), col("__chunk")).orderBy(col(tsCol))
    val localGap = when(
      col(tsCol).cast("long") - lag(col(tsCol), 1).over(byKeyChunk).cast("long")
        > gapSeconds, 1L).otherwise(0L)
    val local = chunked
      .withColumn("__lid", sum(localGap).over(byKeyChunk))
      .groupBy(col(keyCol), col("__chunk"), col("__lid"))
      .agg(
        min(col(tsCol)).as("__start"),
        max(col(tsCol)).as("__end"),
        count(lit(1)).as("__n"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("__start"))
    val mergeGap = when(
      col("__start").cast("long") - lag(col("__end"), 1).over(byKey).cast("long")
        > gapSeconds, 1L).otherwise(0L)
    local
      .withColumn("__session_id", sum(mergeGap).over(byKey) + 1L)
      .groupBy(col(keyCol), col("__session_id").as("session_id"))
      .agg(
        min(col("__start")).as("session_start"),
        max(col("__end")).as("session_end"),
        sum(col("__n")).as("n_events"))
      .select(col(keyCol), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"))
  }

  case class SessionEvent(key: Long, ts: Timestamp)
  /** Per-key state: the id the *open* session carries (or the next id to
    * assign when none is open) plus the open session's aggregates;
    * `n == 0` ⇔ no session is open. O(1) per key — never the events. */
  case class SessState(id: Long, start: Long, end: Long, n: Long)
  case class Session(key: Long, sessionId: Long, start: Timestamp,
      end: Timestamp, nEvents: Long)

  /** Streaming sessionization over a keyed event stream: a session closes
    * when the event-time watermark passes its end + gap (state timeout).
    * The session-id counter lives in the state, so ids keep increasing
    * across closed sessions. Use `OutputMode.Append` with a watermark on
    * the event time.
    *
    * State is O(1) per key AND bounded in key count: after a session
    * closes, the counter-only state survives `idleTtlSeconds` (so a key
    * that comes back keeps its id sequence) and is then evicted by a
    * re-armed cleanup timeout — an infinite stream of transient keys
    * cannot grow the state store without bound. A key returning after
    * eviction restarts its ids at 1. */
  def sessionsStreaming(events: Dataset[SessionEvent],
      gapSeconds: Long, idleTtlSeconds: Long = 86400L): Dataset[Session] = {
    val gapMs = gapSeconds * 1000L
    val ttlMs = idleTtlSeconds * 1000L
    def emit(key: Long, s: SessState): Session =
      Session(key, s.id, new Timestamp(s.start), new Timestamp(s.end), s.n)
    val func = (key: Long, it: Iterator[SessionEvent], state: GroupState[SessState]) => {
      val prior = state.getOption.getOrElse(SessState(1L, 0L, 0L, 0L))
      if (state.hasTimedOut) {
        if (prior.n == 0L) {
          // cleanup timeout of an idle counter-only state: evict it
          state.remove()
          Iterator.empty
        } else {
          // watermark passed end+gap: close the open session, keep the
          // counter for id continuity, and arm the eviction timeout (must
          // stay above the current watermark or Spark rejects it).
          state.update(SessState(prior.id + 1, 0L, 0L, 0L))
          state.setTimeoutTimestamp(
            math.max(prior.end + gapMs, state.getCurrentWatermarkMs()) + ttlMs)
          Iterator.single(emit(key, prior))
        }
      } else {
        // Events are merged in sorted order; an out-of-order arrival within
        // `gap` of the open session (incl. BEFORE its start) extends it on
        // either side. Events more than `gap` older than the open session's
        // start would belong to an already-gone earlier session — pick the
        // watermark delay >= the source's max disorder to exclude them.
        val sorted = it.map(_.ts.getTime).toArray.sorted
        var open = if (prior.n > 0) Some(prior) else None
        var nextId = prior.id
        var closed = List.empty[SessState]
        sorted.foreach { t =>
          open match {
            case Some(s) if t - s.end <= gapMs =>
              open = Some(s.copy(start = math.min(s.start, t),
                end = math.max(s.end, t), n = s.n + 1))
            case Some(s) =>
              closed ::= s
              nextId = s.id + 1
              open = Some(SessState(nextId, t, t, 1L))
            case None =>
              open = Some(SessState(nextId, t, t, 1L))
          }
        }
        open match {
          case Some(s) =>
            state.update(s)
            state.setTimeoutTimestamp(s.end + gapMs)
          case None => // no events this batch; leave state untouched
        }
        closed.reverse.map(emit(key, _)).iterator
      }
    }
    events
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(func)(
        Encoders.product[SessState], Encoders.product[Session])
  }

  /** Stationary distribution of the within-session event-type Markov
    * chain, in exact integer ppm — "where does a user's attention settle
    * if the observed click dynamics run forever", the summary number
    * behind next-event prediction and funnel-leak ranking. Transitions
    * are consecutive event pairs of a key no more than `gapSeconds`
    * apart (the [[sessions]] gap criterion), totally ordered by
    * `(tsCol, tieCol)`. States are every type observed in a transition
    * (source or target); DANGLING states — targets with no outgoing
    * transition — redistribute their mass uniformly each round (the
    * PageRank dangling-node treatment), so no absorber silently drains
    * the chain. The power iteration runs `iters` rounds in
    * deterministic integer fixed-point (SCALE = 10¹²):
    * `v'(j) = Σ_i (v(i)·c_ij) div r_i + (Σ_dangling v(d)) div n` —
    * per-term floor division, identical in BigInt and the oracle's
    * HUGEINT `//`, so the result is engine-exact (the tiny mass the
    * floors shave is well-defined, not float noise).
    *
    * Scale shape: ONE key exchange + per-key lag window (the
    * [[sessions]] shape — the [[sessionsChunked]] escape applies to hot
    * keys) collapses the corpus to ≤|types|² transition counts; the
    * iteration itself is driver-side BigInt over that bounded matrix
    * (the broadcast-build-side convention — |event types| is a domain
    * constant, never data-scale). */
  def transitionStationary(events: DataFrame, gapSeconds: Long,
      iters: Int = 20, keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", tieCol: String = "event_id")
      : DataFrame = {
    require(iters > 0 && gapSeconds > 0, "iters and gapSeconds must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__b", lead(col(typeCol), 1).over(w))
      .withColumn("__gap",
        lead(col(tsCol), 1).over(w).cast("long") - col(tsCol).cast("long"))
      .where(col("__b").isNotNull && col("__gap") <= gapSeconds)
      .groupBy(col(typeCol).as("a"), col("__b").as("b"))
      .agg(count(lit(1)).as("c"))
    val t0 = pairs.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (t0.map(_._1) ++ t0.map(_._2)).distinct.sorted
    val rowSum = t0.groupBy(_._1).map { case (a, xs) =>
      a -> BigInt(xs.map(_._3).sum) }
    val dangling = states.filterNot(rowSum.contains)
    val Scale = BigInt(1000000000000L)
    var v: Map[String, BigInt] =
      if (states.isEmpty) Map.empty
      else states.map(_ -> Scale / states.length).toMap
    for (_ <- 0 until iters) {
      val next = scala.collection.mutable.Map(
        states.map(_ -> BigInt(0)): _*)
      for ((a, b, c) <- t0) next(b) += (v(a) * c) / rowSum(a)
      val share =
        if (states.isEmpty) BigInt(0)
        else dangling.map(v).sum / states.length
      v = next.map { case (k, x) => k -> (x + share) }.toMap
    }
    states.map(a => (a, (v(a) / 1000000).toLong)).toSeq
      .toDF(typeCol, "stationary_ppm")
  }
}
