package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Fns

/** Typed event row for the streaming analytics (the envelope subset
  * the state machine needs; `ts` is epoch nanos as everywhere else). */
case class Event(event_id: Long, ts: Long, user_id: Long,
                 event_type: String, value: Double)

case class SessionState(start: Long, last: Long, n: Long)

/** Streaming funnel DP state: `f(k)` = latest chain-start reaching
  * level k+1 (Long.MinValue = unset), plus the max level so far. */
case class FunnelState(f: Seq[Long], level: Int)

case class SessionOut(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

/** Streaming decayed-sum state: ONE (lastTs, sum, n) triple per user. */
case class DecayState(lastTs: Long, sum: Double, n: Long)

case class DecayOut(user_id: Long, n_events: Long, last_ts_s: Long,
                    decayed_sum: Double)

/** Capped distinct-user state: ≤ n+1 ids, the uniqUpTo contract. */
case class UniqUpToState(ids: Seq[Long])

case class UniqUpToOut(event_type: String, event_date: String,
                       uniq_upto: Long)

/** Streaming transition state: the user's last event (ts, id, type) —
  * O(1) per user, whatever the stream length. */
case class TransState(lastTs: Long, lastId: Long, lastType: String)

case class TransitionOut(from_type: String, to_type: String)

/** Streaming growth state: the user's last ACTIVE epoch-day — O(1)
  * per user, whatever the history length. -1 = never seen. */
case class GrowthState(lastDay: Long)

case class GrowthOut(day: Long, user_id: Long, status: String)

/** Streaming OHLC state: one fixed-size record per (type, hour) —
  * open/close carry their (ts, id) rank keys so late events resolve
  * identically to the batch rank windows. */
case class OhlcState(openTs: Long, openId: Long, open: Double,
                     high: Double, low: Double,
                     closeTs: Long, closeId: Long, close: Double,
                     n: Long, sum: Double)

case class OhlcOut(event_type: String, h: Long, n: Long, open: Double,
                   high: Double, low: Double, close: Double,
                   sum_value: Double)

/** Streaming twins of the batch analytics: the rollup the reference's
  * ClickHouse tables serve (B8) as a watermarked windowed aggregation,
  * and sessionization (B6) as explicit keyed state — the two
  * Structured Streaming shapes (built-in windowing vs
  * flatMapGroupsWithState) a stream consumer of these tables needs.
  */
object StreamingAnalytics {

  /** Per-type tumbling-window rollup over event time with a watermark
    * bounding state (B8's streaming twin — works on a readStream OR a
    * batch frame for parity tests). */
  def windowedRollup(events: DataFrame, windowDur: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("event_time", Fns.nanosToTimestamp(col("ts")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Fns.sumExact(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sessionization via Spark's NATIVE `session_window` gap window —
    * the built-in-first twin of [[sessionize]]: when the output is
    * per-session AGGREGATES, the gap window needs no custom state
    * code, merges sessions across micro-batches under the watermark,
    * and costs the same single user_id exchange. ([[sessionize]]
    * remains the shape for semantics the built-in can't express —
    * emit-on-close rows, open-tail inspection.) Boundary rule,
    * pinned by spec: an event exactly `gap` after the previous one
    * still MERGES (Spark coalesces touching windows); a new session
    * starts strictly past the gap. Works on a readStream or a batch
    * frame identically. */
  def sessionWindowRollup(events: DataFrame,
                          gapNs: Long = 1800L * 1000000000L,
                          watermarkNs: Long = 600L * 1000000000L): DataFrame =
    events
      // ts is exact epoch-NANOS but timestamps carry µs: flooring ns→µs
      // made an ns gap in (gap, gap+999ns] LOOK ≤ gap, merging sessions
      // the ns contract splits (caught by the sf1 sweep). Instead the ns
      // value rides AS the timestamp's µs payload — a pure ×1000 scale
      // of the whole time axis (gap and watermark scale with it), so
      // every session_window comparison happens on exact ns. Range is
      // safe: 2^63 µs ≈ ±292k years absorbs any ns epoch.
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", s"$watermarkNs microseconds")
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapNs microseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        Fns.sumExact(col("value")).as("sum_value"))
      .select(col("user_id"),
        Fns.nanosToEpochSec(unix_micros(col("sw.start"))).as("session_start_s"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup keyed on `idCols`, with state bounded by
    * the event-time watermark (Spark keeps one key per id only until
    * the watermark passes it — the unbounded-stream analogue of C1's
    * batch hash-dedup; without the watermark the key store grows
    * forever). Duplicates arriving later than `watermark` can
    * reappear — that's the documented at-least-once trade. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("event_time", Fns.nanosToTimestamp(col("ts")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval join (B11's streaming twin): each left
    * event joined to same-key right events at-or-after it within
    * `maxDeltaNs`. Both sides watermarked so Spark can discard
    * buffered state once no future match is possible — the state
    * bound is (watermark + maxDelta) per side, independent of stream
    * length.
    *
    * The event clock is the SCALED nanos clock the session-window path
    * above already uses: `timestamp_micros(ts)` reads the epoch-NANOS
    * long as if it were µs, so 1 ns of real time is 1 µs of engine
    * time and the ns-exact bound is a plain
    * `r_time <= l_time + INTERVAL maxDeltaNs MICROSECOND` constraint.
    * That shape matters beyond exactness: the r10 form kept timestamps
    * in real µs and re-applied the exact ns bound as a raw-long filter
    * on `ts` after the join — arithmetic StreamingJoinHelper cannot
    * analyze, so Spark WARNed "Error trying to extract state
    * constraint" and the join buffered more state than the watermark
    * allows. With the constraint purely on the watermarked timestamp
    * columns, both sides' state is watermark-pruned
    * (StreamingDedupJoinSpec asserts state rows shrink across
    * batches). `watermarkNs` is on the same scaled clock (a real-time
    * duration in ns). */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         maxDeltaNs: Long,
                         watermarkNs: Long = 600L * 1000000000L): DataFrame = {
    val l = left
      .withColumn("l_time", timestamp_micros(col("ts")))
      .withWatermark("l_time", s"$watermarkNs microseconds")
      .select(col(key).as("l_key"), col("l_time"),
        col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = right
      .withColumn("r_time", timestamp_micros(col("ts")))
      .withWatermark("r_time", s"$watermarkNs microseconds")
      .select(col(key).as("r_key"), col("r_time"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
    val deltaExpr = expr(
      s"r_time >= l_time AND r_time <= l_time + INTERVAL $maxDeltaNs MICROSECOND")
    l.join(r, col("l_key") === col("r_key") && deltaExpr)
      .select(col("l_key").as(key), col("l_id"), col("r_id"),
        ((col("r_ts") - col("l_ts")) / 1000000000L).cast("long").as("delta_s"))
  }

  /** Streaming windowFunnel (operators.Funnel's unbounded twin): the
    * same cascading running-max DP, carried as per-user keyed state
    * across micro-batches — each user's current max funnel level is
    * re-emitted whenever new events move it. State is L longs + an int
    * per user, independent of history length.
    *
    * Ordering contract: events must arrive per-user in (ts, event_id)
    * order across batches (within a batch they're sorted here); a
    * straggler older than already-processed state can only undercount
    * its own chain — the standard mapGroupsWithState trade, fixable
    * upstream with a watermark-sorted stage. */
  def funnelStream(events: Dataset[Event], condTypes: Seq[String],
                   windowNs: Long): Dataset[(Long, Long)] = {
    require(condTypes.nonEmpty, "funnelStream needs at least one condition")
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc = Encoders.scalaLong
    val L = condTypes.length
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val st = state.getOption
          val f = st.map(_.f.toArray).getOrElse(Array.fill(L)(Long.MinValue))
          var lvl = st.map(_.level).getOrElse(0)
          it.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            // descending levels: an event extends at most one chain step
            var k = L - 1
            while (k >= 1) {
              // lower bound is load-bearing across batches: a straggler
              // OLDER than the recorded chain start would pass the
              // window check on the negative delta and advance a funnel
              // that never happened (the batch twin never sees this —
              // its events are globally time-sorted, so ts >= f(k-1) is
              // implicit there)
              if (e.event_type == condTypes(k) && f(k - 1) != Long.MinValue &&
                  e.ts >= f(k - 1) && e.ts - f(k - 1) <= windowNs) {
                if (f(k - 1) > f(k)) f(k) = f(k - 1)
                if (k + 1 > lvl) lvl = k + 1
              }
              k -= 1
            }
            if (e.event_type == condTypes.head) {
              if (e.ts > f(0)) f(0) = e.ts
              if (lvl < 1) lvl = 1
            }
          }
          state.update(FunnelState(f.toSeq, lvl))
          (uid, lvl.toLong)
      }
  }

  /** Streaming exponentialTimeDecayedSum (b57's unbounded twin —
    * operators.Stats.decayedSumAtLast): each user's recency-decayed
    * activity score, maintained as ONE (lastTs, sum, n) triple per
    * user — the fold `sum ← sum·e^((last−ts)/τ) + value` telescopes to
    * exactly the batch Σ vⱼ·e^((tⱼ−T)/τ), so state is O(1) per user
    * however long the stream runs (the property CH's mergeable decay
    * states exist for). Same per-user ordering contract as
    * [[funnelStream]]. */
  def decayStream(events: Dataset[Event], tauNs: Long): Dataset[DecayOut] = {
    implicit val stateEnc = Encoders.product[DecayState]
    implicit val outEnc = Encoders.product[DecayOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[DecayState]) =>
          var st = state.getOption.getOrElse(DecayState(Long.MinValue, 0.0, 0L))
          it.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val decayed = if (st.lastTs == Long.MinValue) 0.0
              else st.sum * math.exp((st.lastTs - e.ts).toDouble / tauNs.toDouble)
            st = DecayState(e.ts, decayed + e.value, st.n + 1)
          }
          state.update(st)
          DecayOut(uid, st.n, st.lastTs / 1000000000L, st.sum)
      }
  }

  /** Streaming uniqUpTo(n) (b47's unbounded twin): exact distinct
    * users per (type, day) up to n, >n reports n+1 — state is a set
    * CAPPED at n+1 ids per group, so it never grows with stream
    * length (the bounded-state contract that distinguishes uniqUpTo
    * from uniqExact on an unbounded stream). The count is
    * hash-free — any n+1 distinct ids saturate the cap — so streaming
    * and batch agree exactly, not just statistically. */
  def uniqUpToStream(events: Dataset[Event], n: Int): Dataset[UniqUpToOut] = {
    require(n >= 1, "uniqUpTo needs n >= 1")
    implicit val stateEnc = Encoders.product[UniqUpToState]
    implicit val outEnc = Encoders.product[UniqUpToOut]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    def dayOf(tsNs: Long): String =
      java.time.LocalDate.ofEpochDay(
        Math.floorDiv(tsNs, 86400L * 1000000000L)).toString
    events.groupByKey(e => (e.event_type, dayOf(e.ts)))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: (String, String), it: Iterator[Event],
         state: GroupState[UniqUpToState]) =>
          var ids = state.getOption.map(_.ids.toSet).getOrElse(Set.empty[Long])
          it.foreach { e => if (ids.size <= n) ids += e.user_id }
          state.update(UniqUpToState(ids.toSeq.sorted))
          UniqUpToOut(key._1, key._2, math.min(ids.size, n + 1).toLong)
      }
  }

  /** Streaming OHLC bars (b70's unbounded twin): open/high/low/close
    * + count + sum per (type, hour) from ONE fixed-size state record
    * per bar — open/close keep their (ts, event_id) rank keys, so
    * out-of-order and cross-micro-batch arrivals resolve EXACTLY as
    * the batch rank windows do (high/low/n are order-free; only the
    * float sum differs by fp association, the same trade as
    * [[decayStream]]). State is bounded by live (type, hour) bars —
    * a production deployment adds a GroupStateTimeout keyed to the
    * watermark to retire closed hours; the semantics here don't
    * depend on it. */
  def ohlcStream(events: Dataset[Event]): Dataset[OhlcOut] = {
    val HourNs = 3600L * 1000000000L
    implicit val stateEnc = Encoders.product[OhlcState]
    implicit val outEnc = Encoders.product[OhlcOut]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    events.groupByKey(e => (e.event_type, Math.floorDiv(e.ts, HourNs)))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: (String, Long), it: Iterator[Event],
         state: GroupState[OhlcState]) =>
          var st = state.getOption.orNull
          it.foreach { e =>
            st = if (st == null)
              OhlcState(e.ts, e.event_id, e.value, e.value, e.value,
                e.ts, e.event_id, e.value, 1L, e.value)
            else {
              val first = e.ts < st.openTs ||
                (e.ts == st.openTs && e.event_id < st.openId)
              val last = e.ts > st.closeTs ||
                (e.ts == st.closeTs && e.event_id > st.closeId)
              OhlcState(
                if (first) e.ts else st.openTs,
                if (first) e.event_id else st.openId,
                if (first) e.value else st.open,
                math.max(st.high, e.value), math.min(st.low, e.value),
                if (last) e.ts else st.closeTs,
                if (last) e.event_id else st.closeId,
                if (last) e.value else st.close,
                st.n + 1L, st.sum + e.value)
            }
          }
          state.update(st)
          OhlcOut(key._1, key._2, st.n, st.open, st.high, st.low,
            st.close, st.sum)
      }
  }

  /** Streaming transition emission (b89's unbounded twin): each
    * user's consecutive-event (from → to) edges emitted as they
    * happen via flatMapGroupsWithState in Append mode — state is ONE
    * (ts, id, type) triple per user. Downstream, the matrix is a
    * plain streaming aggregation over the emitted edges; same
    * per-user ordering contract as [[funnelStream]] (in-batch sort,
    * in-order across batches). An out-of-order event arriving in a
    * LATER batch emits edges that diverge from the batch b89 lag
    * semantics (StreamingAnalyticsSpec pins the exact divergence) —
    * buffer by watermark upstream if batch parity under disorder is
    * required. */
  def transitionStream(events: Dataset[Event]): Dataset[TransitionOut] = {
    implicit val stateEnc = Encoders.product[TransState]
    implicit val outEnc = Encoders.product[TransitionOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[TransState]) =>
          val outs = scala.collection.mutable.ListBuffer[TransitionOut]()
          var st = state.getOption.orNull
          it.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            if (st != null) outs += TransitionOut(st.lastType, e.event_type)
            st = TransState(e.ts, e.event_id, e.event_type)
          }
          if (st != null) state.update(st)
          outs.iterator
      }
  }

  /** Streaming growth accounting (b93's unbounded twin): each
    * (user, active-day) classified new / retained / resurrected as it
    * happens, via flatMapGroupsWithState in Append mode — state is ONE
    * epoch-day per user. Downstream, b93's daily decomposition is a
    * plain streaming aggregation over the emitted rows (churn, being
    * forward-looking, stays a batch read of yesterday). Same ordering
    * contract as [[transitionStream]]: in-batch sort, in-order across
    * batches; a day arriving LATE (≤ the user's last active day)
    * cannot re-classify history and is dropped — the divergence spec
    * documents it. */
  def growthStream(events: Dataset[Event]): Dataset[GrowthOut] = {
    implicit val stateEnc = Encoders.product[GrowthState]
    implicit val outEnc = Encoders.product[GrowthOut]
    implicit val keyEnc = Encoders.scalaLong
    val dayNs = 86400L * 1000000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[GrowthState]) =>
          val outs = scala.collection.mutable.ListBuffer[GrowthOut]()
          var last = state.getOption.map(_.lastDay).getOrElse(-1L)
          val seen = state.exists
          it.map(e => java.lang.Math.floorDiv(e.ts, dayNs))
            .toSeq.distinct.sorted.foreach { day =>
              if (day > last) {
                val status =
                  if (last < 0 && !seen) "new"
                  else if (day - last == 1) "retained"
                  else "resurrected"
                outs += GrowthOut(day, uid, status)
                last = day
              } // day <= last: late arrival, history already classified
            }
          state.update(GrowthState(last))
          outs.iterator
      }
  }

  /** Streaming sessionization: 30-min-gap sessions per user via
    * flatMapGroupsWithState. Closed sessions emit as soon as a
    * later event proves the gap (Append mode); the open tail of each
    * user's stream stays in state. State is one small case class per
    * active user — bounded by active users, not by history, which is
    * the property that matters on an unbounded stream. */
  def sessionize(events: Dataset[Event],
                 gapNs: Long = 1800L * 1000000000L): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong
    def toOut(uid: Long, s: SessionState): SessionOut =
      SessionOut(uid, s.start / 1000000000L, s.last / 1000000000L, s.n)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val closed = scala.collection.mutable.ListBuffer[SessionOut]()
          var st = state.getOption
          it.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            st match {
              case Some(s) if e.ts - s.last > gapNs =>
                closed += toOut(uid, s)
                st = Some(SessionState(e.ts, e.ts, 1))
              case Some(s) =>
                // min/max, not plain e.ts: a cross-batch straggler older
                // than the session tail must not move `last` BACKWARDS
                // (a later on-time event would then see a fake gap and
                // split one real session, possibly emitting end < start)
                st = Some(SessionState(math.min(s.start, e.ts),
                  math.max(s.last, e.ts), s.n + 1))
              case None =>
                st = Some(SessionState(e.ts, e.ts, 1))
            }
          }
          st.foreach(state.update)
          closed.iterator
      }
  }
}
