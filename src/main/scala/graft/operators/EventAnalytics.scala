package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over the cell-log/events surface — the
  * funnel and cohort shapes every product-events pipeline reports. The
  * reference stores the events (its north-star workload is exactly
  * this kind of timestamped activity log); the analytics layer is ours,
  * expressed as plain aggregations and equi-joins so every number is
  * an exact integer the oracle replays.
  *
  * Scale design: nothing here uses a window function or driver state.
  * Funnels fold one keyed aggregation per step (k tiny, fixed);
  * retention is two hash aggregations and one equi-join on the key.
  * All exchanges hash-partition on the entity key.
  */
object EventAnalytics {

  /** Chain-advance semantics for [[funnel]] — the four modes analysts
    * know from ClickHouse's `windowFunnel` (same names, same intent),
    * each defined here as a DETERMINISTIC rule so the whole funnel
    * replays in plain SQL:
    *
    *  - [[FunnelMode.Greedy]] (default): earliest match at-or-after
    *    the previous step's time (`>=` — two steps may share a
    *    timestamp).
    *  - [[FunnelMode.StrictIncrease]]: as Greedy but strictly after
    *    (`>`) — a shared timestamp cannot satisfy two steps.
    *  - [[FunnelMode.StrictOrder]]: the chain must be CONSECUTIVE —
    *    step i+1 must be the very next event after step i's time; any
    *    intervening event (matching a funnel condition or not) breaks
    *    the chain. Tie rule: an unrelated event SHARING the matching
    *    event's timestamp does not break (both are "the next event").
    *  - [[FunnelMode.StrictDedup]]: a repeat of an ALREADY-MATCHED
    *    step's condition strictly between the previous step's time and
    *    the candidate match breaks the chain. Tie rule: a duplicate at
    *    exactly the candidate's timestamp does not break (advance
    *    wins).
    *
    * Strict modes compare with `>` (strictly after the previous step);
    * only Greedy keeps the `>=` share-a-timestamp contract.
    */
  sealed trait FunnelMode
  object FunnelMode {
    case object Greedy extends FunnelMode
    case object StrictIncrease extends FunnelMode
    case object StrictOrder extends FunnelMode
    case object StrictDedup extends FunnelMode
  }

  /** Ordered-step funnel with EARLIEST-CHAIN semantics: step 1 anchors
    * at each key's earliest matching event; each later step takes the
    * earliest matching event at-or-after the previous step's chosen
    * time, and the whole chain must complete within `withinUs` of the
    * anchor. Greedy-from-earliest is deterministic and SQL-replicable
    * (it can under-count completions a later anchor would admit — the
    * standard funnel trade, documented rather than hidden; ClickHouse's
    * windowFunnel makes the same choice in its default mode).
    *
    * `steps` are boolean predicates over the event columns, in funnel
    * order. Output: one row per key that fired step 1 —
    * `(key, steps_completed, step1_us .. stepK_us)` with NULL times
    * from the first uncompleted step on. Keys that never fired step 1
    * emit nothing (a funnel over them is undefined, not zero).
    *
    * Scale shape: one filtered min-aggregation per step plus an
    * equi-join against the (one-row-per-key) accumulator — k shuffles
    * of key-sized frames for a k-step funnel, never a window, never a
    * per-key event buffer. Event-time ties: two steps may share one
    * timestamp (>= is the at-or-after contract); the aggregation is
    * min, so duplicate events cost nothing.
    */
  def funnel(events: DataFrame, key: Column, tsUs: Column,
      steps: Seq[Column], withinUs: Long = Long.MaxValue,
      mode: FunnelMode = FunnelMode.Greedy): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinUs >= 0, s"withinUs must be >= 0, got $withinUs")
    val k = steps.length
    // null keys/timestamps carry no funnel semantics and would
    // otherwise form a phantom null-key group that every later step's
    // equi-join silently drops half-way — exclude them up front
    val ev = events.select(
      key.as("_k") +: tsUs.as("_ts") +:
        steps.zipWithIndex.map { case (p, i) => p.as(s"_s$i") }: _*)
      .where(col("_k").isNotNull && col("_ts").isNotNull)
    // Greedy keeps at-or-after (>=); every strict mode is strictly-after
    val after: (Column, Column) => Column = mode match {
      case FunnelMode.Greedy => _ >= _
      case _                 => _ > _
    }
    var acc = ev.where(col("_s0")).groupBy(col("_k"))
      .agg(min(col("_ts")).as("_t0"))
    (1 until k).foreach { i =>
      val windowOk =
        if (withinUs == Long.MaxValue) lit(true)
        else col("_ts") <= col("_t0") + withinUs
      // earliest in-window candidate for step i (all modes need it)
      val cand = ev.where(col(s"_s$i")).join(acc, Seq("_k"))
        .where(after(col("_ts"), col(s"_t${i - 1}")) && windowOk)
        .groupBy(col("_k")).agg(min(col("_ts")).as("_b"))
      val stepMin = (mode match {
        case FunnelMode.Greedy | FunnelMode.StrictIncrease => cand
        case FunnelMode.StrictOrder =>
          // the candidate must be the very NEXT event: min over ALL
          // events strictly after t_{i-1} (window-free — if an earlier
          // event intervenes it breaks regardless; it cannot be a
          // matching one, else it would be the candidate)
          val next = ev.join(acc, Seq("_k"))
            .where(col("_ts") > col(s"_t${i - 1}"))
            .groupBy(col("_k")).agg(min(col("_ts")).as("_m"))
          cand.join(next, Seq("_k")).where(col("_b") === col("_m"))
        case FunnelMode.StrictDedup =>
          // a repeat of any ALREADY-matched condition strictly between
          // t_{i-1} and the candidate breaks the chain; a repeat at
          // exactly the candidate's timestamp does not (advance wins)
          val dupPred = (0 until i).map(j => col(s"_s$j")).reduce(_ || _)
          val dup = ev.where(dupPred).join(acc, Seq("_k"))
            .where(col("_ts") > col(s"_t${i - 1}"))
            .groupBy(col("_k")).agg(min(col("_ts")).as("_d"))
          cand.join(dup, Seq("_k"), "left")
            .where(col("_d").isNull || col("_b") <= col("_d"))
      }).select(col("_k"), col("_b").as(s"_t$i"))
      acc = acc.join(stepMin, Seq("_k"), "left")
    }
    val completed = (1 until k)
      .map(i => when(col(s"_t$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    acc.select(
      col("_k").as("key") +: completed.cast("int").as("steps_completed") +:
        (0 until k).map(i => col(s"_t$i").as(s"step${i + 1}_us")): _*)
  }

  /** Event-flow TRANSITIONS — how many times each `(from, to)` label
    * pair occurs as CONSECUTIVE events of the same key (the edge
    * weights of a user-journey/sankey graph; the empirical Markov
    * transition counts of the event process). Output:
    * `(from_label, to_label, n)`.
    *
    * Determinism under ties: events of one key sharing a timestamp are
    * ordered by label, so the LABEL SEQUENCE is a pure function of the
    * data (rows duplicated on (key, ts, label) are interchangeable) —
    * the count replays exactly in any engine with the same
    * `(ts, label)` ordering rule. Null keys/timestamps/labels carry no
    * sequence semantics and are excluded up front.
    *
    * Scale shape: ONE window per key partition (`lead` keeps O(1)
    * rolling state per row — the [[Stats.forwardFill]] per-key-series
    * shape, never a corpus-wide window) followed by a label-pair hash
    * aggregation with map-side partials. A pathologically hot key
    * serializes its own partition only — the documented per-key-series
    * trade, same as sessionize. */
  def transitions(events: DataFrame, key: Column, tsUs: Column,
      label: Column): DataFrame = {
    val ev = events
      .select(key.as("_k"), tsUs.as("_ts"), label.cast("string").as("_l"))
      .where(col("_k").isNotNull && col("_ts").isNotNull &&
        col("_l").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k")).orderBy(col("_ts"), col("_l"))
    ev.withColumn("_next", lead(col("_l"), 1).over(w))
      .where(col("_next").isNotNull)
      .groupBy(col("_l").as("from_label"), col("_next").as("to_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cohort retention: keys cohort by the bucket of their FIRST
    * activity; `n_active` counts the cohort's distinct keys active
    * `age` buckets later (age 0 row = cohort size — every key is
    * active in its own first bucket). Output:
    * `(cohort_us, age, n_active)`, exact integers, buckets
    * floor-divided like [[Stats.regularize]] (pre-epoch safe). Ages
    * with no active keys emit no row — [[Stats.regularize]] gap-fills
    * downstream when a dense grid is wanted.
    *
    * Scale shape: distinct (key, bucket) is one exchange over the
    * events; the cohort min and the final (cohort, age) count are
    * key- and cohort-sized aggregations; the join is a key equi-join.
    * No windows, no driver state. */
  def retention(events: DataFrame, key: Column, tsUs: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val kb = events
      .select(key.as("_k"), Stats.ldiv(tsUs, bucketUs).as("_b"))
      .where(col("_k").isNotNull && col("_b").isNotNull)
      .distinct()
    val cohort = kb.groupBy(col("_k")).agg(min(col("_b")).as("_c"))
    kb.join(cohort, Seq("_k"))
      .groupBy(col("_c"), (col("_b") - col("_c")).as("age"))
      .agg(count(lit(1)).as("n_active"))
      .select((col("_c") * bucketUs).as("cohort_us"), col("age"),
        col("n_active"))
  }
}
