package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse-style behavioral analytics — `windowFunnel`, `retention`,
  * `sequenceMatch` — the signature functions the reference's MergeTree
  * tables exist to serve (the reference creates per-event-type tables
  * `ORDER BY sent_at` precisely so CH can run these over them;
  * src/clickhouse-batch-client.class.ts:492-568).
  *
  * Spark-first shape: CH evaluates these as per-key sorted scans inside
  * its aggregator. Here each one is a single hash-shuffle on the key +
  * one sort within partitions, expressed with cascading window
  * functions — no UDAF, no collect_list, fully codegen-friendly, and
  * the same one-shuffle cost profile at any corpus size. A 100 TB
  * events table funnels with exactly one exchange on `user_id` (its
  * natural analysis key), and all L levels reuse the same sorted run —
  * Catalyst plans one Window node for the lot.
  */
object Funnel {

  /** `windowFunnel(window)(ts, cond_1 … cond_L)`: the max funnel level
    * per key — the largest L' such that events e_1 … e_L' exist with
    * cond_i(e_i), ordered strictly by (time, tieBreak) row order, and
    * time(e_L') - time(e_1) ≤ windowSpan.
    *
    * DP over the per-key (time, tieBreak)-sorted run: f_1(e) = latest
    * cond_1 time strictly before e; f_k(e) = latest *chain-start* time
    * among chains reaching level k strictly before e (taking the
    * latest start is optimal — the window constraint only compares the
    * current time against the start). Each f_k is one running-max
    * window over the previous level's column.
    *
    * Returns one row per key: `(key, funnel_level)` with level 0 for
    * keys whose events never match cond_1.
    */
  def windowFunnel(events: DataFrame, key: String, time: String,
                   tieBreak: String, conds: Seq[Column],
                   windowSpan: Long): DataFrame = {
    require(conds.nonEmpty, "windowFunnel needs at least one condition")
    // Strictly-preceding frame: an event can't occupy two funnel
    // levels at once (conds are usually disjoint, but the operator
    // shouldn't depend on that).
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, -1)

    var acc = events
    conds.zipWithIndex.foreach { case (cond, i) =>
      val lvl = i + 1
      val start =
        if (i == 0) when(cond, col(time))
        else when(cond && col(time) - col(s"_f$i") <= windowSpan, col(s"_f$i"))
      // _hit_k marks "this event completes a chain to level k";
      // _f_k carries the best chain-start forward for level k+1.
      acc = acc
        .withColumn(s"_hit$lvl", start.isNotNull.cast("int"))
        .withColumn(s"_f$lvl", max(start).over(w))
    }
    // Chain-reachability is monotone (level k implies level k-1), so
    // the sum of per-level any-hit flags IS the max level reached.
    val levelFlags = conds.indices.map(i => max(col(s"_hit${i + 1}")))
    acc.groupBy(col(key))
      .agg(levelFlags.reduce(_ + _).cast("long").as("funnel_level"))
  }

  /** `windowFunnel(..., 'strict_order')`: CH's strict-order mode — the
    * chain dies on ANY intervening event, so only runs of CONSECUTIVE
    * events count: the max L' such that consecutive events
    * e_i … e_{i+L'-1} in (time, tieBreak) order match cond_1 … cond_L'
    * with time(e_{i+L'-1}) − time(e_i) ≤ windowSpan.
    *
    * Same single hash-shuffle + sort as [[windowFunnel]]; the DP
    * becomes `lead` columns (chain depth starting at each event), all
    * sharing one Window sort. Chain-depth is monotone in k, so the
    * sum of the per-k flags is the depth at each start event. */
  def windowFunnelStrictOrder(events: DataFrame, key: String, time: String,
                              tieBreak: String, conds: Seq[Column],
                              windowSpan: Long): DataFrame = {
    require(conds.nonEmpty, "windowFunnel needs at least one condition")
    var acc = events
    conds.zipWithIndex.foreach { case (c, i) =>
      acc = acc.withColumn(s"_c${i + 1}", c.cast("int"))
    }
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    var ok: Column = col("_c1") === 1
    var lvl: Column = when(ok, 1).otherwise(0)
    (2 to conds.length).foreach { k =>
      ok = ok && lead(col(s"_c$k"), k - 1).over(w) === 1 &&
        lead(col(time), k - 1).over(w) - col(time) <= windowSpan
      lvl = lvl + when(ok, 1).otherwise(0)
    }
    acc.select(col(key), lvl.as("_lvl"))
      .groupBy(col(key))
      .agg(max(col("_lvl")).cast("long").as("funnel_level"))
  }

  /** `retention(cond_1 … cond_L)` per key: flag_1 = did cond_1;
    * flag_i (i>1) = did cond_1 AND did cond_i. One conditional
    * aggregation — no ordering, no window, map-side combinable. */
  def retention(events: DataFrame, key: String, conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val did = conds.zipWithIndex.map { case (c, i) =>
      max(c.cast("int")).as(s"_did${i + 1}")
    }
    val base = events.groupBy(col(key)).agg(did.head, did.tail: _*)
    val flags = conds.indices.map { i =>
      val f =
        if (i == 0) col("_did1")
        else col("_did1") * col(s"_did${i + 1}")
      f.cast("long").as(s"r${i + 1}")
    }
    base.select(col(key) +: flags: _*)
  }

  /** `sequenceCount('(?1).*(?2)')` per key: how many NON-OVERLAPPING
    * cond_1 … cond_2 matches the key's event stream contains, scanned
    * left to right the way CH's FSM does (find cond_1, then the next
    * cond_2 completes a match and the automaton restarts).
    *
    * Distributed formulation: restrict to events matching either
    * condition, order per key, and count cond_2 events whose
    * IMMEDIATELY PRECEDING restricted event matches cond_1. In the
    * FSM the automaton is in "armed" state exactly when the previous
    * restricted event was a cond_1 (extra cond_1s re-arm, a counted
    * cond_2 disarms, uncounted cond_2s stay disarmed) — so match
    * completions are exactly the cond_1→cond_2 run boundaries. One
    * filter + one keyed window, no state machine materialized.
    *
    * Returns `(key, n_seq)` for keys with ≥1 restricted event;
    * keys with zero cond_1/cond_2 events carry no information here
    * (CH likewise only reports over rows it aggregates). */
  def sequenceCount2(events: DataFrame, key: String, time: String,
                     tieBreak: String, cond1: Column, cond2: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    events.filter(cond1 || cond2)
      .select(col(key), col(time), col(tieBreak),
        cond1.cast("int").as("_is1"), cond2.cast("int").as("_is2"))
      .withColumn("_prev1", lag(col("_is1"), 1).over(w))
      .groupBy(col(key))
      .agg(sum(when(col("_is2") === 1 && col("_prev1") === 1, 1L)
        .otherwise(0L)).cast("long").as("n_seq"))
  }

  /** `sequenceMatch('(?1).*(?2)')` per key: does a cond_1 event
    * precede (strictly, by time) a cond_2 event? min/max conditional
    * aggregation — no join, no window. */
  def sequenceMatch2(events: DataFrame, key: String, time: String,
                     cond1: Column, cond2: Column): DataFrame =
    events.groupBy(col(key))
      .agg(
        min(when(cond1, col(time))).as("_first1"),
        max(when(cond2, col(time))).as("_last2"))
      .select(col(key),
        (col("_first1").isNotNull && col("_last2").isNotNull &&
          col("_first1") < col("_last2")).cast("int").as("matched"))

  /** `sequenceMatch('(?1)(?t<T)(?2)')` per key: a cond_2 event
    * DIRECTLY follows a cond_1 event among the key's condition-
    * matching events (non-matching events may intervene — CH's
    * pattern walks the matched subsequence), with the pair's time gap
    * under `maxGap`. One keyed sort window over the FILTERED stream
    * (the condition disjunction pushes to the scan), lag does the
    * adjacency, the gap guard is the time condition. */
  def sequenceMatchTime(events: DataFrame, key: String, time: String,
                        tieBreak: String, cond1: Column, cond2: Column,
                        maxGap: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    events.filter(cond1 || cond2)
      .withColumn("_is1", cond1.cast("int"))
      .withColumn("_is2", cond2.cast("int"))
      .withColumn("_p1", lag(col("_is1"), 1, 0).over(w))
      .withColumn("_pt", lag(col(time), 1).over(w))
      .groupBy(col(key))
      .agg(max(when(col("_is2") === 1 && col("_p1") === 1 &&
          col(time) - col("_pt") < maxGap, 1).otherwise(0))
        .cast("int").as("matched"),
        sum(when(col("_is2") === 1 && col("_p1") === 1 &&
          col(time) - col("_pt") < maxGap, 1L).otherwise(0L))
        .as("n_matches"))
  }

  /** `windowFunnel(..., 'strict_increase')` mode: same chain semantics
    * as [[windowFunnel]] but each step's timestamp must STRICTLY
    * increase — two same-timestamp events can never occupy consecutive
    * levels (CH uses this to kill artificial funnels from batched
    * writes that land whole sessions on one timestamp).
    *
    * Same single exchange; the only change is the window FRAME: the
    * running-max of chain starts ranges over `time` values strictly
    * below the current one (RANGE … 1 PRECEDING on the numeric time
    * axis) instead of strictly-preceding ROWS. Equal-time events then
    * see the same predecessor set, which is exactly the strict-increase
    * rule — no tie-break column is needed or consulted. */
  def windowFunnelStrictIncrease(events: DataFrame, key: String, time: String,
                                 conds: Seq[Column], windowSpan: Long): DataFrame = {
    require(conds.nonEmpty, "windowFunnel needs at least one condition")
    val w = Window.partitionBy(col(key))
      .orderBy(col(time))
      .rangeBetween(Window.unboundedPreceding, -1)
    var acc = events
    conds.zipWithIndex.foreach { case (cond, i) =>
      val lvl = i + 1
      val start =
        if (i == 0) when(cond, col(time))
        else when(cond && col(time) - col(s"_f$i") <= windowSpan, col(s"_f$i"))
      acc = acc
        .withColumn(s"_hit$lvl", start.isNotNull.cast("int"))
        .withColumn(s"_f$lvl", max(start).over(w))
    }
    val levelFlags = conds.indices.map(i => max(col(s"_hit${i + 1}")))
    acc.groupBy(col(key))
      .agg(levelFlags.reduce(_ + _).cast("long").as("funnel_level"))
  }

  /** CH `sequenceNextNode('forward', 'first_match')(ts, node, cond)`:
    * per key, the node (event type) of the event IMMEDIATELY AFTER the
    * first event matching `cond` — the "what do users do next"
    * primitive behind CH's path-analysis dashboards.
    *
    * One keyed sort window: `lead(node)` is evaluated on every row but
    * only the first matching row's value survives the min-by. Keys
    * whose first match is their last event return NULL next_node; keys
    * with no match drop (CH returns NULL there too — callers wanting
    * those rows outer-join the key dim). Single exchange on the key,
    * same shape as sessionization. */
  def sequenceNextNode(events: DataFrame, key: String, time: String,
                       tieBreak: String, node: Column,
                       cond: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    // A chain-final first match has no successor: carry that as an
    // explicit sentinel through min_by (engines disagree on whether
    // arg_min skips NULL payloads) and surface NULL at the end.
    val none = " __none"
    events
      .select(col(key), col(time), col(tieBreak), node.as("_node"),
        cond.cast("int").as("_m"))
      .withColumn("_next", coalesce(lead(col("_node"), 1).over(w), lit(none)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_m") === 1)
      .groupBy(col(key))
      .agg(min_by(col("_next"), col("_rn")).as("_nn"))
      .select(col(key),
        when(col("_nn") === none, lit(null)).otherwise(col("_nn"))
          .as("next_node"))
  }
}
