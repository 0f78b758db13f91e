package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the newest right row
  * with the same key and right.ts <= left.ts.
  *
  * Reference analogue: snapshot reads pick the newest version with
  * ts <= snapshot (tera src/io/tablet_io.cc:2331-2345); the TPC-C
  * driver's "newest order for a customer" lookups are the same shape
  * (src/benchmark/tpcc/tpccdb.h:385-411).
  *
  * Implementation is the union + last-value window pattern, NOT a range
  * join: both sides shuffle once on the key, tagged rows interleave in
  * (ts, tag) order, and `last(right_value, ignoreNulls)` over the
  * running frame carries the as-of match to each left row. Cost is one
  * shuffle + sort — no quadratic key-range explosion, and it survives a
  * 100× scale-up where a theta join would not. Caveat: AQE does NOT
  * split window partitions, so one hot key still lands on one task —
  * [[joinSalted]] is the mitigation (range-buckets the ts domain per
  * key), exactness-tested against this implementation.
  */
object AsOfJoin {

  /** NOTE: `carried` columns are each carried by an independent
    * last-non-null window; when a right row can hold nulls in some
    * carried columns, values from different right rows may combine.
    * Carry a single struct column when row-atomic carry is required.
    *
    * @param left        driving rows
    * @param right       lookup rows
    * @param key         join key column name (same name both sides)
    * @param leftTs      event-time column in `left`
    * @param rightTs     event-time column in `right`
    * @param carried     columns of `right` to carry to the matches
    * @param toleranceUs max staleness: a carried value whose supplying
    *                    right row is older than `leftTs - toleranceUs`
    *                    reports null instead — the pandas merge_asof
    *                    `tolerance` contract. The gate is PER carried
    *                    column, on the row that actually supplied the
    *                    value (each column's carry already skips null
    *                    values independently — see the NOTE above — so
    *                    gating on the newest matched row alone would let
    *                    a stale value slip through behind a newer row
    *                    whose value was null). Requires numeric
    *                    (epoch-µs) ts columns; the default means
    *                    unbounded lookback.
    * @return `left` columns + carried right columns (null when no match)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      carried: Seq[String],
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    val needTol = toleranceUs != Long.MaxValue

    val leftCols = left.columns
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(1))
      .select(Seq(col(key), col("_ts"), col("_tag")) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_tag", lit(0))
      .select(Seq(col(key), col("_ts"), col("_tag")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carried.map(c => col(c).as(s"_r_$c")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carriedCols: Seq[Column] = carried.map { c =>
      if (!needTol) last(col(s"_r_$c"), ignoreNulls = true).over(w).as(c)
      else {
        // carry (supplying ts, value) together, then gate on the
        // supplier's own age — the newest OVERALL match may carry a
        // null for this column while an older, beyond-tolerance row
        // supplies the value; that value must not leak through
        val cell = last(
          when(col(s"_r_$c").isNotNull,
            struct(col("_ts").as("t"), col(s"_r_$c").as("v"))),
          ignoreNulls = true).over(w)
        when(cell.getField("t") >= col("_ts") - toleranceUs,
          cell.getField("v")).as(c)
      }
    }

    l.unionAll(r)
      .select(Seq(col(key), col("_tag")) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++ carriedCols: _*)
      .where(col("_tag") === 1)
      .drop("_tag")
  }

  /** Hot-key-safe as-of join: same result as [[join]], but the ts
    * domain is range-bucketed so ONE pathologically hot key spreads
    * over up to `buckets` tasks instead of landing on one.
    *
    * Two passes: (1) the usual last-value carry within each
    * (key, ts-bucket) window partition; (2) left rows whose bucket has
    * no earlier right row back-fill from the newest right row of any
    * EARLIER bucket — a fan-out join against the per-(key, bucket)
    * last-rights, which holds at most `buckets` rows per key, so the
    * fan-out is bounded and the backfill side is small by construction.
    * Carried columns travel as one struct (row-atomic, unlike [[join]]'s
    * independent per-column windows — see its NOTE).
    *
    * Cost when keys are NOT hot: one extra small aggregation + a join
    * over the (usually few) carry-miss rows — prefer [[join]] unless a
    * key is hot enough to dominate a stage.
    */
  def joinSalted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      carried: Seq[String],
      buckets: Int = 32,
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    require(!carried.contains("_asof_ts"),
      "carried column name _asof_ts is reserved")

    val leftCols = left.columns
    val st = org.apache.spark.sql.types.StructType(
      carried.map(right.schema(_)) :+
        org.apache.spark.sql.types.StructField("_asof_ts",
          org.apache.spark.sql.types.LongType))

    // ts bounds: one tiny aggregation, two driver scalars (the same
    // scalar-handshake class as pagination's resume key)
    val bounds = left.select(col(leftTs).cast("long").as("t"))
      .unionAll(right.select(col(rightTs).cast("long").as("t")))
      .agg(min(col("t")).as("lo"), max(col("t")).as("hi")).collect()(0)
    if (bounds.isNullAt(0))
      return join(left, right, key, leftTs, rightTs, carried, toleranceUs)
    val lo = bounds.getLong(0)
    val width = math.max((bounds.getLong(1) - lo + 1) / buckets, 1L)
    def bucketOf(ts: Column): Column =
      least((ts - lo) / width, lit(buckets - 1L)).cast("int")

    val lU = left.withColumn("_ts", col(leftTs).cast("long"))
      .select(Seq(col(key), col("_ts"), lit(1).as("_tag"),
        monotonically_increasing_id().as("_rid")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(st).as("_rv"): _*)
    val rU = right.withColumn("_ts", col(rightTs).cast("long"))
      .select(Seq(col(key), col("_ts"), lit(0).as("_tag"), lit(-1L).as("_rid")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carried.map(col) :+ col("_ts").as("_asof_ts"): _*).as("_rv"): _*)

    val u = lU.unionAll(rU).withColumn("_bkt", bucketOf(col("_ts")))
    val w1 = Window.partitionBy(col(key), col("_bkt"))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pass1 = u
      .withColumn("_c1", last(col("_rv"), ignoreNulls = true).over(w1))
      .where(col("_tag") === 1)

    // newest right row per (key, bucket) — ≤ `buckets` rows per key
    val bucketLast = rU.withColumn("_bkt", bucketOf(col("_ts")))
      .groupBy(col(key), col("_bkt"))
      .agg(max_by(col("_rv"), struct(col("_ts"), col("_tag"))).as("_blast"))
      .select(col(key).as("_blk"), col("_bkt").as("_blb"), col("_blast"))

    // pinned: `fills` and `filled` both branch off this frame, and the
    // _rid they join on is monotonically_increasing_id — recomputing the
    // lineage per branch could re-assign ids if the upstream source is
    // order-unstable (sample, task retry). The carry-miss set is small,
    // so the materialization is cheap.
    val haveCarry = pass1.where(col("_c1").isNotNull)
    val needFill = pass1.where(col("_c1").isNull).localCheckpoint()
    val fills = needFill.select(col("_rid"), col(key), col("_bkt"))
      .join(bucketLast, col(key) === col("_blk") && col("_blb") < col("_bkt"))
      .groupBy(col("_rid"))
      .agg(max_by(col("_blast"), col("_blb")).as("_c1"))
    val filled = needFill.drop("_c1").join(fills, Seq("_rid"), "left")

    // tolerance: the struct carries the matched row's own ts, so a
    // stale match nulls ALL carried columns together (row-atomic here,
    // unlike join()'s per-column carries)
    val ok =
      if (toleranceUs == Long.MaxValue) lit(true)
      else col("_c1").getField("_asof_ts") >= col("_ts") - toleranceUs
    haveCarry.unionByName(filled, allowMissingColumns = false)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        carried.map(c => when(ok, col("_c1").getField(c)).as(c)): _*)
  }
}
