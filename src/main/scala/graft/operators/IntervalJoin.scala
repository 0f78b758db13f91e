package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval join — every (left, right) pair with
  * `right.ts ∈ [left.ts + lowerUs, left.ts + upperUs]` (and equal key,
  * when keyed), WITHOUT the theta-join plan: Spark executes a raw
  * time-band predicate as a broadcast-nested-loop / cartesian, which
  * dies at the first real fact×fact join. This is the equi-join
  * rewrite every stream/batch engine ships for the shape (Flink's
  * interval join, KDB's window join): time quantizes into buckets as
  * wide as the band, each LEFT row probes the 2-3 buckets its band can
  * reach, the RIGHT side keys by its own bucket, and the exact band
  * predicate filters the joined candidates. Every true pair shares
  * exactly one (right-bucket, probe) coordinate, so no distinct is
  * needed — candidates are unique by construction.
  *
  * The reference's closest shape is the time-range scan predicate
  * (include/tera/scan.h:96-99) driven per anchor row (the TPC-C
  * StockLevel "recent orders" pattern, src/benchmark/tpcc/tpccdb.h:368);
  * this is that access path as a single distributed join.
  *
  * Scale shape: one explode of ≤ `⌈band/width⌉ + 1 ≤ 3` probe rows per
  * left row, one hash shuffle per side on (key, bucket), a codegen'd
  * band filter on the joined rows. Candidate volume is the true-pair
  * volume plus same-bucket near-misses — band-proportional, never
  * quadratic in the table. A hot (key, bucket) is AQE's skew-join to
  * split, same as any equi-join.
  */
object IntervalJoin {

  /** Streaming note: the left plan is one explode of per-row
    * expressions plus an inner equi-join — a STREAMING left frame
    * against a static right works as-is (stream-static interval join,
    * zero stateful operators, append mode), spec-proven in
    * StreamingSpec. For BOTH sides streaming, use [[joinStreams]].
    *
    * @param left    anchor rows; all its columns survive
    * @param right   probed rows; `carried` columns survive (renamed as
    *                given)
    * @param key     optional equality key column name (same name both
    *                sides); None = band-only join
    * @param leftTs  epoch-µs long column in `left`
    * @param rightTs epoch-µs long column in `right`
    * @param lowerUs band start relative to left.ts (inclusive; may be
    *                negative)
    * @param upperUs band end relative to left.ts (inclusive; must be
    *                >= lowerUs)
    * @param carried columns of `right` to carry into the output
    * @param joinType "inner" (default), "left_outer", or "full_outer".
    *                 left_outer keeps unmatched left rows with NULL
    *                 carried columns, and flips the explode to the
    *                 RIGHT side (each right row registers in the ≤ 3
    *                 left buckets it can serve) so every left row
    *                 appears exactly once un-duplicated; matched pairs
    *                 still share exactly one bucket coordinate.
    *                 full_outer ADDITIONALLY emits one all-NULL-left
    *                 row per right row that matches nothing ("clicks
    *                 that precede no purchase"): an exploded side's
    *                 unmatched COPIES can't know a sibling bucket
    *                 matched, so the pair space splits by construction
    *                 — the left_outer pass (matched + unmatched-left)
    *                 unioned with an ANTI join of the un-exploded
    *                 right against the left's probe buckets
    *                 (unmatched-right, exactly once) — two banded
    *                 equi-joins, no distinct, no cartesian
    * @return one row per matching pair: left columns + carried columns
    *         (plus one NULL-carried row per unmatched left row when
    *         left_outer/full_outer, and one NULL-left row per
    *         unmatched right row when full_outer)
    */
  def join(left: DataFrame, right: DataFrame, key: Option[String],
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long,
      carried: Seq[String], joinType: String = "inner"): DataFrame = {
    require(upperUs >= lowerUs,
      s"upperUs ($upperUs) must be >= lowerUs ($lowerUs)")
    require(carried.nonEmpty, "carry at least one right column")
    require(Set("inner", "left_outer", "full_outer").contains(joinType),
      s"joinType must be inner, left_outer or full_outer, got $joinType")
    val clash = carried.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"carried columns collide with left columns: ${clash.mkString(", ")} " +
        "— alias them on the right side first")
    val width = math.max(upperUs - lowerUs, 1L)
    def bucketOf(ts: Column): Column = Stats.ldiv(ts, width)
    val rCols = col(rightTs).as("_rts") +:
      (key.toSeq.map(k => col(k).as("_rkey")) ++
        carried.map(c => col(c).as(s"_c_$c")))
    val band = col("_rts") >= col(leftTs) + lowerUs &&
      col("_rts") <= col(leftTs) + upperUs
    def keyEq(c: Column) = key match {
      case Some(k) => c && col(k) === col("_rkey")
      case None => c
    }
    if (joinType == "inner") {
      // the band [ts+lower, ts+upper] spans at most 2 width-sized
      // buckets, plus 1 for the boundary — probe exactly the covered
      // range (sequence is 2 or 3 elements, computed per row)
      val l = left
        .withColumn("_lb", bucketOf(col(leftTs) + lowerUs))
        .withColumn("_ub", bucketOf(col(leftTs) + upperUs))
        .withColumn("_bkt", explode(sequence(col("_lb"), col("_ub"))))
        .drop("_lb", "_ub")
      val r = right
        .withColumn("_bkt", bucketOf(col(rightTs)))
        .select(col("_bkt").as("_rbkt") +: rCols: _*)
      l.join(r, keyEq(col("_bkt") === col("_rbkt")))
        .where(band)
        .select(left.columns.map(col) ++
          carried.map(c => col(s"_c_$c").as(c)): _*)
    } else {
      // left_outer: the LEFT side must stay un-exploded (an exploded
      // left would emit one null row per unmatched probe bucket), so
      // the RIGHT side registers in every left bucket it can serve —
      // leftTs ∈ [rightTs - upper, rightTs - lower] spans the same
      // ≤ 3 buckets. The band moves INTO the join condition: a
      // post-join filter would erase the unmatched rows it just kept.
      val l = left.withColumn("_bkt", bucketOf(col(leftTs)))
      val r = right
        .withColumn("_sl", bucketOf(col(rightTs) - upperUs))
        .withColumn("_su", bucketOf(col(rightTs) - lowerUs))
        .withColumn("_rbkt", explode(sequence(col("_sl"), col("_su"))))
        .select(col("_rbkt") +: rCols: _*)
      val lo = l.join(r, keyEq(col("_bkt") === col("_rbkt")) && band,
          "left_outer")
        .select(left.columns.map(col) ++
          carried.map(c => col(s"_c_$c").as(c)): _*)
      if (joinType == "left_outer") lo
      else {
        // full_outer = the left_outer pass (matched pairs once +
        // unmatched-left once) ∪ the rights no pair touches, found by
        // an ANTI join of the UN-exploded right against the left's
        // probe buckets: every true pair shares a probe coordinate,
        // so "no probe matches" ⟺ globally unmatched — one row per
        // unmatched right, by construction
        val lProbe = left
          .withColumn("_lb", bucketOf(col(leftTs) + lowerUs))
          .withColumn("_ub", bucketOf(col(leftTs) + upperUs))
          .withColumn("_bkt", explode(sequence(col("_lb"), col("_ub"))))
          .drop("_lb", "_ub")
        val rKeyed = right
          .withColumn("_rbkt", bucketOf(col(rightTs)))
          .select(col("_rbkt") +: rCols: _*)
        val ro = rKeyed
          .join(lProbe, keyEq(col("_bkt") === col("_rbkt")) && band,
            "left_anti")
          .select(left.columns.map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) ++
            carried.map(c => col(s"_c_$c").as(c)): _*)
        lo.unionByName(ro)
      }
    }
  }

  /** BOTH-SIDES-STREAMING interval join (Flink's interval join shape):
    * the same banded equi-join rewrite, planned as Spark's symmetric
    * stateful stream-stream join with WATERMARK-BOUNDED state on both
    * sides. Spark refuses a stream-stream join without an equality
    * predicate — the band bucket IS that equality key here, so even
    * the keyless band shape plans (the bucket inherits the band's
    * locality; a raw theta condition would be rejected outright).
    *
    * State bound: the band predicate is expressed as a time-range
    * condition between the two sides' watermarked event-time columns
    * (epoch-µs longs lifted via `timestamp_micros` — exact at µs
    * resolution, so the timestamp band ≡ the long band), which is
    * exactly what Spark's state cleanup derives eviction thresholds
    * from: each side retains only rows within
    * `band + watermark delay` of the global watermark, independent of
    * stream length. Inner join, append mode.
    *
    * Columns mirror [[join]]: all left columns survive plus `carried`
    * right columns. `delay` is each side's `withWatermark` threshold
    * (how far out-of-order events may arrive, e.g. "10 minutes").
    * Event times must be within `timestamp_micros` range (±~292k
    * years) — the batch [[join]] has no such bound; no real event
    * feed does either.
    *
    * `joinType = "left_outer"` keeps unmatched left rows (NULL carried
    * columns), emitted when the watermark proves no match can still
    * arrive — Spark's outer stream-stream contract. As in the batch
    * [[join]], the explode flips to the RIGHT side so each left row
    * exists exactly once and the null row is unique per unmatched
    * left row.
    *
    * `joinType = "full_outer"` additionally emits one NULL-left row
    * per right row the watermark proves unmatched. As in the batch
    * [[join]], an exploded side's unmatched copies can't know a
    * sibling bucket matched, so the shape is TWO symmetric stateful
    * joins unioned — the left_outer pass above, plus a right_outer
    * pass (left exploded, right un-exploded) filtered to its
    * null-left rows via a literal marker column (a left row can carry
    * legitimate NULLs; the marker can't). Each pass keeps its own
    * watermark-bounded state — the honest 2× cost of full-outer under
    * the bucket rewrite; both evict by the same band + delay horizon.
    *
    * Spec-proven equal to the batch [[join]] on a replayed feed pair
    * (all three join types), with `stateOperators` present (it IS
    * stateful — that is the point) in StreamingSpec.
    */
  def joinStreams(left: DataFrame, right: DataFrame, key: Option[String],
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long,
      carried: Seq[String], delay: String,
      joinType: String = "inner"): DataFrame = {
    require(upperUs >= lowerUs,
      s"upperUs ($upperUs) must be >= lowerUs ($lowerUs)")
    require(carried.nonEmpty, "carry at least one right column")
    require(Set("inner", "left_outer", "full_outer").contains(joinType),
      s"joinType must be inner, left_outer or full_outer, got $joinType")
    val clash = carried.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"carried columns collide with left columns: ${clash.mkString(", ")} " +
        "— alias them on the right side first")
    val width = math.max(upperUs - lowerUs, 1L)
    def bucketOf(ts: Column): Column = Stats.ldiv(ts, width)
    val lBase = left
      .withColumn("_levt", timestamp_micros(col(leftTs)))
      .withWatermark("_levt", delay)
    val rBase = right
      .select(col(rightTs).as("_rts") +:
        (key.toSeq.map(k => col(k).as("_rkey")) ++
          carried.map(c => col(c).as(s"_c_$c"))): _*)
      .withColumn("_revt", timestamp_micros(col("_rts")))
      .withWatermark("_revt", delay)
    // probe-explode the left (the inner shape); serve-explode the right
    // (the outer shapes) — an outer join's preserved side must stay
    // un-duplicated or an unmatched row would emit one null row per
    // exploded bucket
    def lProbe = lBase
      .withColumn("_lb", bucketOf(col(leftTs) + lowerUs))
      .withColumn("_ub", bucketOf(col(leftTs) + upperUs))
      .withColumn("_bkt", explode(sequence(col("_lb"), col("_ub"))))
      .drop("_lb", "_ub")
    def lPlain = lBase.withColumn("_bkt", bucketOf(col(leftTs)))
    def rServe = rBase
      .withColumn("_sl", bucketOf(col("_rts") - upperUs))
      .withColumn("_su", bucketOf(col("_rts") - lowerUs))
      .withColumn("_rbkt", explode(sequence(col("_sl"), col("_su"))))
      .drop("_sl", "_su")
    def rPlain = rBase.withColumn("_rbkt", bucketOf(col("_rts")))
    // the band as event-time arithmetic: state eviction reads these
    // range conditions off the join predicate (a post-join filter on
    // the long columns would leave state unbounded)
    val band =
      col("_revt") >= col("_levt") + expr(s"INTERVAL '$lowerUs' MICROSECOND") &&
      col("_revt") <= col("_levt") + expr(s"INTERVAL '$upperUs' MICROSECOND")
    val cond = key match {
      case Some(k) =>
        col("_bkt") === col("_rbkt") && col(k) === col("_rkey") && band
      case None => col("_bkt") === col("_rbkt") && band
    }
    val outCols = left.columns.map(col) ++
      carried.map(c => col(s"_c_$c").as(c))
    joinType match {
      case "inner" => lProbe.join(rPlain, cond, "inner").select(outCols: _*)
      case "left_outer" =>
        lPlain.join(rServe, cond, "left_outer").select(outCols: _*)
      case _ =>
        // full_outer: the left_outer pass (matched once + unmatched-
        // left once) ∪ the right_outer pass reduced to its null-left
        // rows (unmatched-right once — matched pairs already emitted
        // by the first pass, and the marker filter drops them here)
        val lo = lPlain.join(rServe, cond, "left_outer").select(outCols: _*)
        val ro = lProbe.withColumn("_lmark", lit(1))
          .join(rPlain, cond, "right_outer")
          .where(col("_lmark").isNull)
          .select(left.columns.map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) ++
            carried.map(c => col(s"_c_$c").as(c)): _*)
        lo.unionByName(ro)
    }
  }
}
