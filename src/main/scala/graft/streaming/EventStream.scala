package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators. The reference has no streaming surface
  * (its README names Flink/Kafka only as future work — `README.md:129`), so
  * these are the Spark-native streaming generalizations of its batch ops:
  * the same count-per-key aggregation under event-time windows + watermarks,
  * and the WordCount pipeline as an incremental query.
  *
  * All transforms are source-agnostic `DataFrame -> DataFrame` so they run
  * identically on `readStream` (Kafka/file/socket) and on batch frames in
  * tests (MemoryStream).
  */
object EventStream {

  /** Tumbling event-time window counts per key with late-data handling.
    * Watermark bounds state: at 100 TB/day the state store holds only
    * windows within the lateness horizon, not the full history. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window: String = "1 hour",
                     lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window)
        .as("win"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("cnt"))

  /** Sliding event-time windows: each event lands in window/slide
    * overlapping windows (the generator multiplies rows BEFORE the
    * aggregation — state size scales with the overlap factor, another
    * reason the watermark is mandatory on unbounded input). */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    window: String = "1 hour", slide: String = "15 minutes",
                    lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions
        .window(col(tsCol), window, slide).as("win"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("cnt"))

  /** Incremental WordCount: the reference's T1..F3+A1 pipeline as a
    * streaming aggregation (update/complete mode). */
  def streamingWordCount(lines: DataFrame, textCol: String = "value")
  : DataFrame =
    lines
      .select(explode(TextOps.cleanTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Per-user running session state via mapGroupsWithState: counts events
    * and closes the session after `gapMs` of processing-time inactivity.
    * Demonstrates the custom-state path (KeyValueGroupedDataset) that
    * windowed aggregation can't express. */
  case class SessionUpdate(userId: Long, nEvents: Long, closed: Boolean)

  /** `timeout = NoTimeout` disables session closing (sessions only grow) —
    * the right mode for bounded replays: with `ProcessingTimeTimeout`, the
    * engine keeps constructing micro-batches to fire pending timeouts, so
    * `processAllAvailable()` on a drained source never settles. Production
    * unbounded streams pass the default `ProcessingTimeTimeout`. */
  def runningSessions(events: Dataset[(Long, Long)], gapMs: Long = 30 * 60 * 1000L,
                      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
  : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val timed = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events.groupByKey(_._1)
      .mapGroupsWithState[Long, SessionUpdate](timeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            SessionUpdate(userId, n, closed = true)
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            if (timed) state.setTimeoutDuration(gapMs)
            SessionUpdate(userId, n, closed = false)
          }
      }
  }

  /** A closed event-time session: [startUs, endUs] with its event count. */
  case class ClosedSession(userId: Long, startUs: Long, endUs: Long,
                           nEvents: Long)
  /** Open-session state carried between micro-batches. */
  case class OpenSession(startUs: Long, endUs: Long, nEvents: Long)

  /** Event-time sessionization via flatMapGroupsWithState — the 0..n-rows-
    * per-group shape mapGroupsWithState can't express: each invocation
    * EMITS every session that closed (a gap > `gapUs` between consecutive
    * event times) and keeps only the still-open tail session in state.
    * Input: (userId, tsUs). Per group per batch the new event times are
    * sorted in memory — bounded by that user's per-batch volume, the
    * standard sessionization contract (identical to what
    * `session_window` aggregation buffers per key).
    *
    * `NoTimeout` for bounded replays (see [[runningSessions]]); unbounded
    * production streams would add an event-time timeout to also flush
    * sessions closed by pure inactivity. */
  def closedSessions(events: Dataset[(Long, Long)],
                     gapUs: Long = 30L * 60 * 1000 * 1000)
  : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)],
         state: GroupState[OpenSession]) =>
          val ts = rows.map(_._2).toArray
          java.util.Arrays.sort(ts)
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var i = 0
          while (i < ts.length) {
            val t = ts(i)
            open match {
              case Some(o) if t - o.endUs <= gapUs =>
                open = Some(OpenSession(o.startUs, t, o.nEvents + 1))
              case Some(o) =>
                closed += ClosedSession(userId, o.startUs, o.endUs, o.nEvents)
                open = Some(OpenSession(t, t, 1L))
              case None =>
                open = Some(OpenSession(t, t, 1L))
            }
            i += 1
          }
          open.foreach(state.update)
          closed.iterator
      }
  }

  case class AsOfCarry(lastViewUs: Long)
  case class AsOfRow(userId: Long, eventId: Long, lastViewUs: Option[Long])

  /** Streaming event-time AS-OF enrichment via flatMapGroupsWithState:
    * each purchase carries the instant of the most recent STRICTLY PRIOR
    * view by the same user under the (tsUs, eventId) total order — the
    * unbounded-stream twin of the batch as-of window
    * (`rel_asof_last_view`'s `max(view ts) OVER (... ROWS UNBOUNDED
    * PRECEDING AND 1 PRECEDING)`).
    *
    * Unlike a stream-stream interval join, state is ONE long per user
    * (the latest view instant seen) — no buffered stream side, no
    * watermark-horizon retention: the canonical as-of shape where the
    * lookup side only ever needs its latest value. Per group per batch
    * the new rows sort in memory (bounded by that user's per-batch
    * volume, the same contract sessionization makes); the in-order fold
    * emits each purchase against the carry BEFORE any same-instant,
    * larger-id view updates it, exactly matching the batch window's
    * 1-PRECEDING frame. A multi-batch production stream additionally
    * assumes per-key batch boundaries respect event-time order (or adds
    * a lateness buffer); the bounded replay drains in one batch, where
    * the fold is exact unconditionally.
    *
    * Input: (userId, eventId, tsUs, isView). */
  def asOfLastView(events: Dataset[(Long, Long, Long, Boolean)])
  : Dataset[AsOfRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[AsOfCarry, AsOfRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Long, Boolean)],
         state: GroupState[AsOfCarry]) =>
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr,
            (a: (Long, Long, Long, Boolean),
             b: (Long, Long, Long, Boolean)) =>
              a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
          var last = state.getOption.map(_.lastViewUs).getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfRow]
          var i = 0
          while (i < arr.length) {
            val (_, eventId, tsUs, isView) = arr(i)
            if (isView) last = tsUs
            else out += AsOfRow(userId, eventId,
              if (last == Long.MinValue) None else Some(last))
            i += 1
          }
          if (last != Long.MinValue) state.update(AsOfCarry(last))
          out.iterator
      }
  }

  case class AsOfTypedRow(userId: Long, eventId: Long, lookupType: String,
                          lastUs: Option[Long])

  /** GROUPED/MULTI-LOOKUP streaming as-of: each target event (purchase)
    * carries the most recent strictly-prior instant of EVERY lookup type
    * (view, click, ...) by the same user — the composite-key
    * generalization of [[asOfLastView]], enriching one fact stream
    * against N lookup streams in a single pass. State is ONE long per
    * (user, lookup type) — |lookupTypes| longs per user, still bounded
    * at key cardinality, never a buffered join side. Emits long-format
    * rows (one per target event x lookup type) so the lookup-type set
    * scales without schema changes. Same bounded-replay contract as
    * [[asOfLastView]]; the same-instant tiebreak follows the
    * (tsUs, eventId) total order.
    *
    * Input: (userId, eventId, tsUs, eventType). */
  def asOfLastByType(events: Dataset[(Long, Long, Long, String)],
                     lookupTypes: Seq[String] = Seq("view", "click"),
                     targetType: String = "purchase")
  : Dataset[AsOfTypedRow] = {
    import events.sparkSession.implicits._
    val lookups = lookupTypes.toArray
    events.groupByKey(_._1)
      .flatMapGroupsWithState[List[(String, Long)], AsOfTypedRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[List[(String, Long)]]) =>
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr,
            (a: (Long, Long, Long, String),
             b: (Long, Long, Long, String)) =>
              a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
          val carry = scala.collection.mutable.LinkedHashMap[String, Long](
            state.getOption.getOrElse(Nil): _*)
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfTypedRow]
          var i = 0
          while (i < arr.length) {
            val (_, eventId, tsUs, tpe) = arr(i)
            if (lookups.contains(tpe)) carry(tpe) = tsUs
            if (tpe == targetType) {
              var j = 0
              while (j < lookups.length) {
                out += AsOfTypedRow(userId, eventId, lookups(j),
                  carry.get(lookups(j)))
                j += 1
              }
            }
            i += 1
          }
          if (carry.nonEmpty) state.update(carry.toList)
          out.iterator
      }
  }

  /** Watermark-ordered input row for [[asOfLastViewBounded]]: `ts` drives
    * the event-time watermark; `tsUs` carries the exact microsecond
    * instant (the watermark column itself is ms-granular in the stats). */
  case class AsOfIn(userId: Long, eventId: Long, ts: java.sql.Timestamp,
                    tsUs: Long, isView: Boolean)

  /** Per-user bounded as-of state: the strictly-prior-view carry, the
    * last event-time activity (drives the TTL), and the lateness buffer
    * of rows not yet finalized by the watermark. */
  case class AsOfPending(lastViewUs: Long, lastActivityUs: Long,
                         buf: List[(Long, Long, Boolean)])

  /** PRODUCTION-PARITY streaming as-of enrichment — the unbounded-,
    * out-of-order-stream twin of [[asOfLastView]] (which is exact only
    * when per-key batch boundaries respect event time, e.g. the bounded
    * one-batch replay).
    *
    * Correctness on a multi-batch out-of-order stream comes from a
    * LATENESS BUFFER keyed on event time: rows park in per-user state
    * until the watermark passes them, then drain in (tsUs, eventId)
    * order through the same strictly-prior-view fold as the batch
    * window — so a purchase is emitted only once every view that could
    * precede it (up to the declared lateness) has arrived, whatever
    * batch it rode in on. Rows arriving AFTER the watermark passed them
    * are dropped (the standard late-data contract). State is bounded on
    * both axes: the buffer holds at most the lateness horizon of one
    * user's rows, and the one-long view carry expires via
    * EventTimeTimeout once a user has been idle past `ttl` — no
    * per-user state lives forever.
    *
    * Emission is watermark-gated, so at any instant the enriched output
    * covers exactly the purchases at or before `watermark = max event
    * time − lateness`; the tail inside the lateness horizon is emitted
    * as the watermark advances (on a finite replay it stays pending —
    * the oracle applies the same horizon cut). */
  def asOfLastViewBounded(events: Dataset[AsOfIn],
                          lateness: String = "10 minutes",
                          ttlUs: Long = 30L * 86400L * 1000000L)
  : Dataset[AsOfRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AsOfPending, AsOfRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[AsOfIn],
         state: GroupState[AsOfPending]) =>
          val wUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption
            .getOrElse(AsOfPending(Long.MinValue, Long.MinValue, Nil))
          // Boundary convention (symmetric on both sides): a row whose
          // event time is EXACTLY the watermark is still accepted
          // (>= wUs below) and is finalized on this invocation
          // (<= wUs in the partition) — so whether a boundary-instant
          // row is included never depends on which batch it arrived in,
          // matching Spark's own "late iff strictly older than the
          // watermark" aggregation contract and the batch oracle's
          // `ts <= horizon` cut.
          // RESIDUAL CAVEAT (same-instant cross-batch ties): INCLUSION
          // is batch-independent, but the FOLD ORDER of two rows at
          // exactly the watermark instant is not — a purchase finalized
          // in batch N cannot be enriched by a lower-eventId same-
          // instant view that only arrives in batch N+1 while the
          // watermark is stalled at that instant (the batch oracle
          // folds by (tsUs, eventId) globally). Holding boundary rows
          // pending until the watermark STRICTLY passes (finalize on
          // < wUs) would close it, but rows at the stream's final
          // watermark would then never finalize; the divergence needs
          // two same-microsecond boundary rows split across batches
          // under a stalled watermark — accepted and documented.
          val incoming = rows
            .map(r => (r.tsUs, r.eventId, r.isView))
            .filter(_._1 >= wUs).toList
          val all = (prev.buf ++ incoming).sortBy(t => (t._1, t._2))
          val (ready, pending) = all.partition(_._1 <= wUs)
          var last = prev.lastViewUs
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfRow]
          ready.foreach { case (tsUs, eventId, isView) =>
            if (isView) last = tsUs
            else out += AsOfRow(userId, eventId,
              if (last == Long.MinValue) None else Some(last))
          }
          val lastActivity = (prev.lastActivityUs ::
            all.lastOption.map(_._1).toList).max
          val expired = state.hasTimedOut && pending.isEmpty &&
            incoming.isEmpty && wUs >= lastActivity + ttlUs
          if (expired || (pending.isEmpty && last == Long.MinValue &&
            lastActivity == Long.MinValue)) {
            if (state.exists) state.remove()
          } else {
            state.update(AsOfPending(last, lastActivity, pending))
            // wake when the earliest pending row becomes final, else at
            // TTL expiry; EventTimeTimeout requires a timestamp beyond
            // the current watermark
            val wakeMs = pending.headOption
              .map(_._1 / 1000L + 1L)
              .getOrElse(lastActivity / 1000L + ttlUs / 1000L)
            state.setTimeoutTimestamp(
              math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  /** Stream-stream interval join: attribute each purchase to the views by
    * the same user in the preceding `window`. Watermarks on BOTH sides
    * bound the join state (each side keeps only rows within the lateness +
    * interval horizon — mandatory for an unbounded 100 TB/day stream).
    * Expects columns (user_id, ts[, ...]) on both inputs. */
  def attributeToViews(views: DataFrame, purchases: DataFrame,
                       window: String = "30 minutes",
                       lateness: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", lateness)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $window"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("v_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: every view, with the
    * purchases by the same user in the FOLLOWING `window` (null-padded
    * when none arrives). Unlike the inner join, the null-padded rows can
    * only be emitted once the watermark proves no matching purchase can
    * still arrive — the state-eviction and emission clocks are the same
    * here, which is why outer stream-stream joins REQUIRE watermarks on
    * both sides plus the interval condition. */
  def viewsWithPurchases(views: DataFrame, purchases: DataFrame,
                         window: String = "30 minutes",
                         lateness: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", lateness)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    v.join(p,
      col("p_user") === col("v_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $window"),
      "left_outer")
      .select(col("v_user").as("user_id"), col("v_ts"), col("p_ts"))
  }

  /** Streaming exact dedup: drop repeats of `keys` arriving within the
    * watermark horizon — the streaming face of [[graft.ops.Dedup]]. State
    * is bounded by the watermark (old keys age out), so it runs forever on
    * an unbounded stream; `dropDuplicates` without a watermark would grow
    * state without bound. Requires an event-time column named `ts`. */
  def dedupStream(df: DataFrame, keys: Seq[String],
                  lateness: String = "10 minutes"): DataFrame =
    df.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static corpus dedup: drop incoming rows that collide with the
    * static `index` on ANY of the given key columns (chained left_anti
    * joins — a row survives only if every probe misses). The join is
    * STATELESS on the stream side: each micro-batch probes the static
    * relation, so it runs forever with ZERO streaming state — the index
    * is the only footprint. With `bcast` (the default) the index rides a
    * broadcast and each probe is a map-side filter; for an index too big
    * to broadcast, pass false and the probes plan as shuffled joins (or
    * pre-filter with a Bloom index — `rel_bloom_join_prune`'s pattern). */
  def dropCollidingWithIndex(stream: DataFrame, index: DataFrame,
      keys: Seq[String], bcast: Boolean = true): DataFrame = {
    val idx =
      if (bcast) org.apache.spark.sql.functions.broadcast(index) else index
    val indexCol = index.columns.head
    keys.foldLeft(stream)((df, k) =>
      df.join(idx.withColumnRenamed(indexCol, k), Seq(k), "left_anti"))
  }

  /** Output-mode helper: windowed aggregations with watermark support
    * Append (emit once, on watermark passing) — the scalable default. */
  val AppendMode: OutputMode = OutputMode.Append()

  /** Per-shard streaming Misra-Gries state: rows this shard has seen and
    * the bounded counter map (<= cap entries at every point). */
  case class HhState(seen: Long, counts: Map[Long, Long])

  /** One candidate emission: the shard's cumulative row count (a strictly
    * increasing version — the reader keeps each shard's max) and its
    * current candidate keys. */
  case class HhCandidates(shard: Int, seen: Long, keys: Seq[Long])

  /** Hash-sharded STREAMING Misra-Gries frequent-items maintenance — the
    * unbounded-stream face of [[graft.ops.FrequentItems.exactHeavyHitters]]'
    * candidate pass. Keys hash-partition across `shards` groups, each
    * group holds one classic MG summary of capacity `cap` in the state
    * store (insert-or-decrement; the decrement consumes the incoming
    * key's unit against every resident counter). Because a key's entire
    * count lands in exactly ONE shard, the per-shard bound applies to its
    * full count: estimate >= true - seen_shard/(cap+1), so the shard's
    * survivors are a superset of every key with count > seen_shard/(cap+1)
    * — state is shards x cap entries FOREVER, no matter the key
    * cardinality of the stream. Each micro-batch emits the updated
    * shards' current candidates (Update mode); a periodic batch pass
    * turns candidates into exact counts (`stream_heavy_hitters`). */
  def heavyHitterCandidates(keys: DataFrame, keyCol: String,
      shards: Int, cap: Int): DataFrame = {
    require(shards > 0 && cap > 0)
    import keys.sparkSession.implicits._
    keys.select(col(keyCol).cast("long")).as[Long]
      .groupByKey(k => ((k.hashCode % shards) + shards) % shards)
      .flatMapGroupsWithState[HhState, HhCandidates](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Long], state: GroupState[HhState]) =>
          val st = state.getOption.getOrElse(HhState(0L, Map.empty))
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          m ++= st.counts
          var seen = st.seen
          rows.foreach { k =>
            seen += 1
            if (m.contains(k) || m.size < cap) {
              m.update(k, m.getOrElse(k, 0L) + 1L)
            } else {
              // classic MG decrement: the new key's unit cancels one
              // unit of every resident counter (all >= 1); zeros leave
              val resident = m.toArray
              var i = 0
              while (i < resident.length) {
                val (kk, v) = resident(i)
                if (v == 1L) m.remove(kk) else m.update(kk, v - 1L)
                i += 1
              }
            }
          }
          state.update(HhState(seen, m.toMap))
          Iterator.single(HhCandidates(shard, seen, m.keys.toSeq.sorted))
      }.toDF("shard", "seen", "keys")
  }

  /** Streaming OHLC downsampling — the TSDB bar rollup as an incremental
    * windowed aggregation: open/close are lexicographic struct min/max
    * arg-extrema folding in the state store, so an open bar's state is a
    * few scalars however many rows stream through it. Input needs
    * columns (ts TIMESTAMP, t LONG micros, event_id, v, event_type). */
  def windowedOhlc(events: DataFrame, window: String = "5 minutes")
  : DataFrame =
    events
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window)
        .as("win"), col("event_type"))
      .agg(
        min(struct(col("t"), col("event_id"), col("v"))).getField("v")
          .as("open"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        max(struct(col("t"), col("event_id"), col("v"))).getField("v")
          .as("close"),
        count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** One per-shard moment-sums snapshot (flat
    * [[graft.functions.VectorOuterSumAgg]] layout: [n, Σxᵢ…, upper-tri
    * Σxᵢxⱼ…]) after this micro-batch, with the emission version. */
  case class MomentSnap(shard: Int, ver: Long, buf: Seq[Double])

  /** STREAMING COVARIANCE/PCA "train": per-shard second-moment sums in
    * mapGroupsWithState — the unbounded-stream twin of the batch
    * [[graft.functions.VectorOuterSumAgg]] one-pass aggregate. State is
    * ONE flat (1 + d + d(d+1)/2)-double buffer per hash shard FOREVER
    * (~17 KB at d = 64, × `shards`), regardless of how many vectors
    * stream through; every field is a sum — COMMUTATIVE — so unordered
    * multi-batch replay provably equals the batch moments (the oracle),
    * modulo float accumulation order (consumers round derived
    * statistics, exactly like the batch path). Emits one cumulative
    * snapshot per shard per micro-batch (update mode) — readers keep the
    * max-version row per shard and SUM the shard buffers (the partial →
    * final merge, model-sized), then derive covariance via
    * [[graft.ops.Pca.parseMoments]]/[[graft.ops.Pca.covariance]]. */
  def momentSumsStream(vecs: Dataset[(Long, Seq[Float])], shards: Int = 8)
  : Dataset[MomentSnap] = {
    import vecs.sparkSession.implicits._
    require(shards >= 1)
    vecs.groupByKey { case (id, _) => java.lang.Math.floorMod(id, shards.toLong).toInt }
      .mapGroupsWithState[(Array[Double], Long), MomentSnap](
        GroupStateTimeout.NoTimeout) {
        case (shard, it, state) =>
          val (prev, ver) = state.getOption
            .getOrElse((null: Array[Double], 0L))
          // copy-on-write: the state store may hold the previous array
          var buf = if (prev == null) null else prev.clone()
          it.foreach { case (_, v) =>
            if (v != null) {
              val d = v.length
              if (buf == null) buf = new Array[Double](1 + d + d * (d + 1) / 2)
              else require(buf.length == 1 + d + d * (d + 1) / 2,
                s"momentSumsStream: vector length $d does not match state")
              buf(0) += 1.0
              var i = 0
              var k = 1 + d
              while (i < d) {
                buf(1 + i) += v(i)
                val xi = v(i).toDouble
                var j = i
                while (j < d) { buf(k) += xi * v(j); j += 1; k += 1 }
                i += 1
              }
            }
          }
          val out = if (buf == null) Array.empty[Double] else buf
          state.update((out, ver + 1))
          MomentSnap(shard, ver + 1, out.toSeq)
      }
  }

  case class ThetaSnap(key: String, ver: Long, ks: Seq[Long])

  /** STREAMING THETA/KMV SKETCH: the k smallest distinct hashes per key
    * in mapGroupsWithState — the unbounded-stream twin of the batch
    * [[graft.functions.KmvSketchAgg]]. State is ONE sorted ≤ k long
    * array per key FOREVER, regardless of stream volume; min-retention
    * insert is COMMUTATIVE and IDEMPOTENT (a set of smallest values is
    * order-independent and duplicate-proof), so an unordered multi-batch
    * replay equals the batch sketch EXACTLY — the oracle value-checks
    * the derived estimate, not a tolerance. Emits one cumulative
    * snapshot per key per micro-batch (update mode); readers keep the
    * max-version row per key. */
  def thetaSketchStream(rows: Dataset[(String, Long)], k: Int = 128)
  : Dataset[ThetaSnap] = {
    import rows.sparkSession.implicits._
    require(k > 0)
    rows.groupByKey(_._1)
      .mapGroupsWithState[(Array[Long], Long), ThetaSnap](
        GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          val (prev, ver) =
            state.getOption.getOrElse((Array.empty[Long], 0L))
          val set = new java.util.TreeSet[java.lang.Long]()
          prev.foreach(v => set.add(v))
          it.foreach { case (_, h) =>
            if (set.size < k) set.add(h)
            else if (h < set.last() && set.add(h)) set.pollLast()
          }
          val out = new Array[Long](set.size())
          var i = 0
          val iter = set.iterator()
          while (iter.hasNext) { out(i) = iter.next(); i += 1 }
          state.update((out, ver + 1))
          ThetaSnap(key, ver + 1, out.toSeq)
      }
  }

  case class QSketchSnap(key: String, ver: Long, qs: Seq[Long])

  /** STREAMING QUANTILE SKETCH: the deterministic level sample per key
    * in mapGroupsWithState — the unbounded-stream twin of the batch
    * [[graft.functions.QuantileSketchAgg]]. State is ONE level + <= cap
    * (hash, value) pairs per key FOREVER, regardless of stream volume.
    * The retained set is the minimal-level rule — a pure function of
    * the row multiset, not of arrival order or batch slicing — so an
    * unordered multi-batch replay equals the batch sketch BIT-FOR-BIT
    * (wire format included) and the same from-scratch oracle checks
    * both. Emits one cumulative wire-format snapshot per key per
    * micro-batch (update mode); readers keep the max-version row. */
  def qsketchStream(rows: Dataset[(String, Long, Long)], cap: Int = 256)
  : Dataset[QSketchSnap] = {
    import rows.sparkSession.implicits._
    require(cap > 0)
    rows.groupByKey(_._1)
      .mapGroupsWithState[(Int, Array[Long], Long), QSketchSnap](
        GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          val (lvl0, flat, ver) =
            state.getOption.getOrElse((0, Array.empty[Long], 0L))
          val buf = new graft.functions.QSketch.Buf(lvl0,
            scala.collection.mutable.ArrayBuffer.empty)
          var i = 0
          while (i < flat.length) {
            buf.pairs += ((flat(i), flat(i + 1))); i += 2
          }
          it.foreach { case (_, h, v) =>
            graft.functions.QSketch.insert(buf, h, v, cap)
          }
          val next = new Array[Long](2 * buf.pairs.size)
          var j = 0
          buf.pairs.foreach { case (h, v) =>
            next(j) = h; next(j + 1) = v; j += 2
          }
          state.update((buf.level, next, ver + 1))
          // emit the canonical wire format (sorted pairs)
          val sorted = buf.pairs.sortBy(identity)
          QSketchSnap(key, ver + 1,
            buf.level.toLong +: sorted.flatMap(p => Seq(p._1, p._2)).toSeq)
      }
  }

  /** One exact-distinct bitmap snapshot: popcount of the (key, bucket)
    * bitmap after this micro-batch, with the emission version. */
  case class BitmapSnap(key: String, bucket: Long, distinct: Long, ver: Long)

  /** STREAMING EXACT DISTINCT via per-(key, 2^15-value-bucket) BITMAPS in
    * mapGroupsWithState: 4 KB of state FOREVER per occupied bucket,
    * regardless of how many rows stream through — where streaming
    * `dropDuplicates` keeps one state row PER DISTINCT VALUE and an HLL
    * surrenders exactness. The batch twin is rel_bitmap_distinct's
    * mergeable-bitmap rollup; this is its unbounded-stream form. Bitmap
    * OR is commutative and idempotent, so arrival order and re-delivery
    * across micro-batches cannot change the final snapshot. Emits one
    * cumulative (key, bucket, popcount, version) row per occupied bucket
    * per micro-batch (update mode) — readers keep the max-version row
    * and sum popcounts per key. */
  def bitmapDistinct(rows: Dataset[(String, Long)]): Dataset[BitmapSnap] = {
    import rows.sparkSession.implicits._
    val bits = 1 << 15
    rows.groupByKey { case (k, v) => (k, Math.floorDiv(v, bits.toLong)) }
      .mapGroupsWithState[(Array[Byte], Long), BitmapSnap](
        GroupStateTimeout.NoTimeout) {
        case ((key, bucket), it, state) =>
          val (prev, ver) = state.getOption
            .getOrElse((new Array[Byte](bits / 8), 0L))
          // copy-on-write: the state store may hold the previous array
          val bm = prev.clone()
          it.foreach { case (_, v) =>
            val bit = Math.floorMod(v, bits.toLong).toInt
            bm(bit >> 3) = (bm(bit >> 3) | (1 << (bit & 7))).toByte
          }
          var pc = 0L
          var i = 0
          while (i < bm.length) {
            pc += java.lang.Integer.bitCount(bm(i) & 0xff); i += 1
          }
          state.update((bm, ver + 1))
          BitmapSnap(key, bucket, pc, ver + 1)
      }
  }

  /** First-touch funnel state: earliest event-time per step (Long.MaxValue
    * = step never seen), total rows, and a snapshot version — a few longs
    * per user FOREVER, and every field is a min/count, so the state is
    * COMMUTATIVE: arrival order across micro-batches cannot change the
    * final snapshot (the property that makes an unordered replay exact).
    * A strict "did step k+1 first happen after step k" over arbitrary
    * interleavings would instead need every step-k+1 timestamp retained —
    * unbounded; first-touch ordering is the bounded-state funnel. */
  case class TouchState(s: Long, v: Long, p: Long, n: Long, ver: Long)
  case class TouchSnap(userId: Long, s: Long, v: Long, p: Long, n: Long,
                       ver: Long)

  /** Per-user first-touch funnel over (user, step, tsUs) rows via
    * mapGroupsWithState; emits one cumulative snapshot per user per
    * micro-batch (update mode) — readers keep the max-version row.
    * Steps are the literal strings "signup" / "view" / "purchase";
    * other rows are ignored (not counted). */
  def firstTouchFunnel(events: Dataset[(Long, String, Long)])
  : Dataset[TouchSnap] = {
    import events.sparkSession.implicits._
    val none = Long.MaxValue
    events.groupByKey(_._1)
      .mapGroupsWithState[TouchState, TouchSnap](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[TouchState]) =>
          var st = state.getOption
            .getOrElse(TouchState(none, none, none, 0L, 0L))
          rows.foreach { case (_, step, ts) =>
            st = step match {
              case "signup"   => st.copy(s = math.min(st.s, ts), n = st.n + 1)
              case "view"     => st.copy(v = math.min(st.v, ts), n = st.n + 1)
              case "purchase" => st.copy(p = math.min(st.p, ts), n = st.n + 1)
              case _          => st
            }
          }
          st = st.copy(ver = st.ver + 1)
          state.update(st)
          TouchSnap(uid, st.s, st.v, st.p, st.n, st.ver)
      }
  }
}
