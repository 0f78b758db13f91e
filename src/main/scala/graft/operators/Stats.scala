package graft.operators

import graft.functions.Codecs
import graft.functions.cellfunctions.double_sortable_bits
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics at corpus scale — the data-card numbers
  * (median document length, p99 token count, quantile gates) computed
  * EXACTLY, without a sort and without a single-node percentile
  * buffer.
  *
  * Algorithm: radix selection over an order-preserving long image of
  * the value (longs are their own image; doubles map through
  * [[graft.functions.Codecs.doubleSortableBits]] — signed image order
  * equals numeric order). The k-th smallest element is found 16 bits
  * at a time: each round is ONE map-side-combinable histogram over at
  * most 65,536 buckets (a bounded scalar handshake, like the IVF
  * centroid collects), the driver walks the cumulative counts to pick
  * the k-th bucket, and the next round filters to that prefix. Four
  * rounds pin all 64 bits — exact selection in ≤ 4 aggregation passes
  * regardless of data size, shape, or skew (a radix round never
  * degenerates: bucket membership is a bit test, not a pivot guess).
  *
  * Spark's own exact `percentile` buffers values per group and
  * `approx_percentile` is approximate; this is the published
  * alternative shape for exact quantiles over data too large to
  * buffer (BigTable/Dremel-era multi-pass selection).
  *
  * Rank convention: `k = max(1, ceil(q * n))`, the smallest value with
  * at least k elements ≤ it — integer-exact, no interpolation, always
  * an element of the data (so cross-engine comparison is bit-exact).
  * Nulls and NaNs are excluded before selection.
  */
object Stats {

  /** Exact quantiles of a double-valued column. Returns one value per
    * q (each an actual element). Cost: ≤ 4 scan+histogram passes per
    * DISTINCT 48-bit prefix path — quantiles sharing early buckets
    * share nothing here for simplicity; the histograms are tiny and
    * the scans dominate, so cost ≈ 4 · |qs| passes. */
  def exactQuantiles(df: DataFrame, value: Column,
      qs: Seq[Double]): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must lie in [0, 1]: $qs")
    val imgs = df
      .select(value.cast("double").as("_v"))
      .where(col("_v").isNotNull && !isnan(col("_v")))
      .select(double_sortable_bits(col("_v")).as("_img"))
    kthImagesQ(imgs, qs, "exactQuantiles")
      .map(Codecs.sortableBitsToDouble)
  }

  /** Exact quantiles of an integral column (returned as the actual
    * long elements). */
  def exactQuantilesLong(df: DataFrame, value: Column,
      qs: Seq[Double]): Seq[Long] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must lie in [0, 1]: $qs")
    val imgs = df.select(value.cast("long").as("_img"))
      .where(col("_img").isNotNull)
    kthImagesQ(imgs, qs, "exactQuantilesLong")
  }

  /** Per-stratum exact quantile — the per-source data-card median/p99.
    * Same radix selection, run for ALL strata simultaneously: each
    * round is ONE histogram aggregation over (stratum, next 8-16
    * bits) and the driver advances every stratum's prefix in the same
    * walk, so the whole frame costs ≤ 5 aggregation passes for the
    * few-strata data-card shape (adaptively more, up to the byte-round
    * 8, only when thousands of live (stratum, q) states would blow the
    * bounded-census driver handshake — see
    * [[stratumQuantileImages]]). Output: `(stratum, value)` per
    * stratum, the exact element at rank max(1, ceil(q·n_stratum)).
    */
  def exactQuantilesBy(df: DataFrame, stratum: Column, value: Column,
      q: Double): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile must lie in [0, 1]: $q")
    val spark = df.sparkSession
    import spark.implicits._
    stratumQuantileImages(stratumImages(df, stratum, value), Seq(q))
      .toSeq.map { case (s, imgs) =>
        (s, Codecs.sortableBitsToDouble(imgs.head))
      }.toDF("stratum", "value")
  }

  /** Per-stratum WINSORIZE — every stratum clipped at its OWN exact
    * [loQ, hiQ] elements, the per-source data-card clamp ("clip each
    * source at its own p01/p99 before mixing"): bounds come from the
    * same multi-stratum radix selection as [[exactQuantilesBy]]
    * — BOTH quantiles of EVERY stratum advance through one shared
    * histogram per round, ≤ 5 aggregation passes for the few-strata
    * shape — and apply through one broadcast join (|strata| rows).
    * Adds `as` = `min(max(value, lo_stratum), hi_stratum)` as a
    * double. NULL values stay NULL and NaNs stay NaN ([[winsorize]]'s
    * contract); rows with a NULL stratum, or in a stratum with no
    * non-null finite values, pass through UNCLIPPED — an absent census
    * has no bounds, and fabricating global ones would leak mass across
    * sources. */
  def winsorizeBy(df: DataFrame, stratum: Column, value: Column,
      loQ: Double, hiQ: Double, as: String): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ,
      s"need 0 <= loQ <= hiQ <= 1, got $loQ, $hiQ")
    val spark = df.sparkSession
    import spark.implicits._
    val bounds = stratumQuantileImages(
        stratumImages(df, stratum, value), Seq(loQ, hiQ))
      .toSeq.map { case (s, imgs) =>
        (s, Codecs.sortableBitsToDouble(imgs.head),
          Codecs.sortableBitsToDouble(imgs(1)))
      }.toDF("_wb_s", "_wb_lo", "_wb_hi")
    val v = value.cast("double")
    df.withColumn("_wb_s", stratum.cast("string"))
      .join(broadcast(bounds), Seq("_wb_s"), "left")
      .withColumn(as,
        when(v.isNull || isnan(v) || col("_wb_lo").isNull, v)
          .otherwise(least(greatest(v, col("_wb_lo")), col("_wb_hi"))))
      .drop("_wb_s", "_wb_lo", "_wb_hi")
  }

  /** (stratum, order-preserving long image) rows — nulls, NaNs, and
    * null strata excluded (shared by the per-stratum selections). */
  private def stratumImages(df: DataFrame, stratum: Column,
      value: Column): DataFrame =
    df.select(stratum.cast("string").as("_s"), value.cast("double").as("_v"))
      .where(col("_s").isNotNull && col("_v").isNotNull && !isnan(col("_v")))
      .select(col("_s"), double_sortable_bits(col("_v")).as("_img"))

  /** The multi-rank kernel behind [[exactQuantilesBy]]/[[winsorizeBy]]:
    * for every stratum, the exact image element at rank
    * max(1, ceil(q·n_stratum)) for EACH q — all strata and all ranks
    * advancing through the SAME radix rounds.
    *
    * Round sizing (round 15 — the previous shape paid 1 count scan +
    * 8 byte-rounds = 9 full passes over the input):
    *  - round 1 is a fixed 8-bit histogram over (stratum, top signed
    *    byte); its per-stratum SUM is n_stratum, so the dedicated
    *    count scan is gone (the ranks seed from the same collect);
    *  - later rounds consume an ADAPTIVE 8-16 bits each: the driver
    *    knows the live (stratum, prefix) pair count exactly, so each
    *    round takes the widest slice that keeps the worst-case
    *    handshake under ~2M rows (`pairs · 2^w ≤ 2^21`, floored at 8
    *    bits — the historical |strata|·|qs|·256 bound). Few strata
    *    (the data-card shape: sources/languages × 1-2 quantiles) pin
    *    all 64 bits in 1 + ⌈56/16⌉ = 5 scans instead of 9; a
    *    many-thousand-strata census degrades gracefully back toward
    *    byte rounds rather than blowing the driver handshake.
    * Every round is one histogram aggregation over (stratum,
    * found-prefix, next w bits); the driver walks every (stratum, q)
    * state's bucket list from the shared collect. The selected
    * elements are identical at any round width — only the navigation
    * granularity changes. */
  private def stratumQuantileImages(imgs: DataFrame,
      qs: Seq[Double]): Map[String, Seq[Long]] = {
    require(qs.nonEmpty, "need at least one quantile")
    val spark = imgs.sparkSession
    import spark.implicits._
    // per stratum, per q: (prefix so far, remaining rank within it) —
    // seeded from round 1's histogram sums
    var state: Map[String, Seq[(Long, Long)]] = null
    def walk(buckets: Seq[(Long, Long)], prefix: Long, kk: Long,
        first: Boolean, w: Int, s: String): (Long, Long) = {
      var k = kk
      var p = prefix
      var found = false
      val mask = (1L << w) - 1
      buckets.foreach { case (b, c) =>
        if (!found) {
          if (k <= c) {
            // first round keeps the SIGNED bucket unmasked so negative
            // prefixes compare correctly downstream
            p = if (first) b else (p << w) | (b & mask)
            found = true
          } else k -= c
        }
      }
      require(found, s"stratum $s walked past its histogram")
      (p, k)
    }
    // round 1: 8 bits, no prefixes yet — one histogram over (stratum,
    // top signed byte); n_stratum is its sum, every (stratum, q) then
    // walks its stratum's shared bucket list
    val first = imgs
      .groupBy(col("_s"), shiftright(col("_img"), 56).as("_b"))
      .agg(count(lit(1)).as("_c"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      }
    state = first.map { case (s, buckets) =>
      val n = buckets.iterator.map(_._2).sum
      s -> qs.map { q =>
        val k = math.max(1L, math.ceil(q * n).toLong)
        walk(buckets, 0L, k, first = true, w = 8, s)
      }
    }
    if (state.isEmpty) return Map.empty
    var bitsLeft = 56
    while (bitsLeft > 0) {
      // different qs hold different prefixes now: scope rows to the
      // live (stratum, prefix) pairs (each row matches at most one —
      // its own shifted image) and histogram per pair
      val pairs = state.toSeq
        .flatMap { case (s, sts) => sts.map { case (p, _) => (s, p) } }
        .distinct
      val budget = 1L << 21
      var w = 8
      while (w < 16 && w < bitsLeft &&
        pairs.size.toLong << (w + 1) <= budget) w += 1
      w = math.min(w, bitsLeft)
      val shift = bitsLeft - w
      val pf = pairs.toDF("_s", "_pf")
      val hist = imgs.join(broadcast(pf), Seq("_s"))
        .where(shiftright(col("_img"), bitsLeft) === col("_pf"))
        .groupBy(col("_s"), col("_pf"),
          shiftright(col("_img"), shift)
            .bitwiseAND(lit((1L << w) - 1)).as("_b"))
        .agg(count(lit(1)).as("_c"))
        .collect()
        .groupBy(r => (r.getString(0), r.getLong(1)))
        .map { case (k, rows) =>
          k -> rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
        }
      state = state.map { case (s, sts) =>
        s -> sts.map { case (p, k) =>
          walk(hist((s, p)), p, k, first = false, w, s)
        }
      }
      bitsLeft -= w
    }
    state.map { case (s, sts) => s -> sts.map(_._1) }
  }

  /** One-pass column profile — the data-card / scan-planning summary
    * for any relational table: per column, row count, non-null and
    * null counts, EXACT distinct count, and min/max (computed in the
    * column's native order, then rendered as strings so the output
    * schema is uniform). Output: one row per profiled column —
    * `(col_name, n_rows, n_nonnull, n_null, n_distinct, min_value,
    * max_value)`.
    *
    * Shape: ONE aggregation. The exact multi-column distincts plan as
    * Spark's standard multi-distinct Expand — the input replicates
    * once per distinct-counted column plus once for the plain
    * aggregates, all inside a single shuffle with map-side partials.
    * That is the honest cost of exact NDV on every column; profile in
    * column batches if the table is very wide, or drop to the HLL
    * sketch (`approx_count_distinct`) when ±2% is acceptable. The
    * driver never sees data — the one result row unpivots through an
    * expression, not a collect.
    *
    * Only atomic-typed columns are profiled: with an explicit
    * `columns` list a non-atomic name is an error; with the default
    * (all columns) array/map/struct columns are skipped — a container
    * column has no total order for min/max, so "profile everything
    * else" is the useful default.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    def atomic(c: String): Boolean = df.schema(c).dataType match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
    val cols =
      if (columns.nonEmpty) {
        val missing = columns.filterNot(df.columns.contains)
        require(missing.isEmpty, s"no such columns: ${missing.mkString(", ")}")
        val bad = columns.filterNot(atomic)
        require(bad.isEmpty,
          s"non-atomic columns cannot be profiled: ${bad.mkString(", ")}")
        columns
      } else df.columns.toSeq.filter(atomic)
    require(cols.nonEmpty, "no atomic columns to profile")
    // backtick-quote every reference: a column named "a.b" (legal, and
    // common from JSON/CSV sources) would otherwise parse as struct
    // field access and fail to resolve
    def q(c: String): Column = col(s"`${c.replace("`", "``")}`")
    val aggs = cols.flatMap { c =>
      Seq(count(q(c)).as(s"_nn_$c"),
        count_distinct(q(c)).as(s"_nd_$c"),
        min(q(c)).cast("string").as(s"_mn_$c"),
        max(q(c)).cast("string").as(s"_mx_$c"))
    } :+ count(lit(1)).as("_n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("_n").as("n_rows"),
        q(s"_nn_$c").as("n_nonnull"),
        (col("_n") - q(s"_nn_$c")).as("n_null"),
        q(s"_nd_$c").as("n_distinct"),
        q(s"_mn_$c").as("min_value"),
        q(s"_mx_$c").as("max_value"))): _*)).as("_p"))
      .select(col("_p.*"))
  }

  /** Heavy-hitter bucket count per hash table — kept at the radix
    * histogram width so the driver handshake stays in the documented
    * bounded-collect class. */
  private val HhBuckets = 65536L

  /** EXACT heavy hitters — every key whose row count strictly exceeds
    * `phiNum/phiDen` of the table — without shuffling the full key
    * space. The standard exact plan (`GROUP BY key HAVING cnt > φ·n`)
    * shuffles one row per DISTINCT key; over a 100 TB corpus keyed by
    * URL/fingerprint the partial aggregation barely compresses and the
    * exchange is the job. This runs the count-min filter idea
    * (Cormode & Muthukrishnan, J. Algorithms 2005) as a two-pass
    * EXACT plan:
    *
    *  1. one map-side-combinable histogram over (hash-table, bucket)
    *     — two independent xxhash64 tables of 65,536 buckets each, the
    *     same bounded-handshake width as the radix quantile rounds. A
    *     key with count > φ·n sits in a bucket counting ≥ it, so the
    *     buckets that strictly clear the threshold form a GUARANTEED
    *     candidate superset; since bucket counts sum to n, fewer than
    *     phiDen/phiNum buckets can qualify per table (bounded, by
    *     construction, no matter the data).
    *  2. one exact recount of the rows whose key lands in a qualifying
    *     bucket of BOTH tables (two broadcast joins on the bucket id),
    *     filtered by the exact strict threshold. A light key survives
    *     the pre-filter only by colliding with heavy buckets in both
    *     tables (~(phiDen/phiNum / 65536)² of them) — it then gets an
    *     exact count and drops out, so collisions cost a little work,
    *     never correctness.
    *
    * The result is EXACT (the sketch only prunes; the final counts
    * are real), deterministic, and the only corpus-wide exchange is
    * the fixed-width histogram. Null keys are excluded (a null is a
    * missing key, not a key). Output: `(<key column name>, cnt)`,
    * strict `cnt · phiDen > n · phiNum`.
    */
  def heavyHitters(df: DataFrame, key: Column,
      phiNum: Long, phiDen: Long): DataFrame = {
    require(phiNum >= 1 && phiDen > phiNum,
      s"phi must be a rational in (0, 1): $phiNum/$phiDen")
    require(phiDen / phiNum <= 8192,
      s"phi below 1/8192 makes the candidate bucket list unbounded — " +
        s"got $phiNum/$phiDen")
    val spark = df.sparkSession
    import spark.implicits._
    val keyName = df.select(key).columns.head
    val keyed = df.select(key.as(keyName))
      .where(col(keyName).isNotNull)
      .withColumn("_b1",
        pmod(xxhash64(lit(1), col(keyName)), lit(HhBuckets)))
      .withColumn("_b2",
        pmod(xxhash64(lit(2), col(keyName)), lit(HhBuckets)))
    val hist = keyed
      .select(explode(array(
        struct(lit(1).as("h"), col("_b1").as("b")),
        struct(lit(2).as("h"), col("_b2").as("b")))).as("_hb"))
      .groupBy(col("_hb.h").as("_h"), col("_hb.b").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .collect()
    val n = hist.iterator.filter(_.getInt(0) == 1).map(_.getLong(2)).sum
    if (n == 0) {
      keyed.select(col(keyName)).limit(0)
        .withColumn("cnt", lit(0L)).where(lit(false))
    } else {
      require(n <= Long.MaxValue / phiDen,
        s"n · phiDen would overflow Long — n=$n phiDen=$phiDen")
      def cand(h: Int): Seq[Long] = hist.iterator
        .filter(r => r.getInt(0) == h && r.getLong(2) * phiDen > n * phiNum)
        .map(_.getLong(1)).toSeq
      val (c1, c2) = (cand(1), cand(2))
      if (c1.isEmpty || c2.isEmpty)
        keyed.select(col(keyName)).limit(0)
          .withColumn("cnt", lit(0L)).where(lit(false))
      else keyed
        .join(broadcast(c1.toDF("_b1")), "_b1")
        .join(broadcast(c2.toDF("_b2")), "_b2")
        .groupBy(col(keyName))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * phiDen > lit(n * phiNum))
    }
  }

  /** WINSORIZE a double column at its EXACT quantile bounds — the
    * outlier clamp of feature/label preprocessing (clip at p01/p99
    * before normalization), with the bounds found by the same radix
    * selection as [[exactQuantiles]] so they are actual elements and
    * the clamp replays bit-exactly in any engine. Adds `as` holding
    * `min(max(value, q_lo), q_hi)`. NULLs stay NULL and NaNs stay NaN
    * (Spark's `least`/`greatest` skip nulls and sort NaN above every
    * number — unguarded, a null would silently BECOME the lower bound
    * and a NaN the upper; a missing measurement must not turn into a
    * fabricated boundary value). Cost: the two-rank selection (≤ 4
    * histogram passes) plus one per-row projection. */
  def winsorize(df: DataFrame, value: Column, loQ: Double, hiQ: Double,
      as: String): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ,
      s"need 0 <= loQ <= hiQ <= 1, got $loQ, $hiQ")
    val Seq(lo, hi) = exactQuantiles(df, value, Seq(loQ, hiQ))
    val v = value.cast("double")
    df.withColumn(as,
      when(v.isNull || isnan(v), v)
        .otherwise(least(greatest(v, lit(lo)), lit(hi))))
  }

  /** [[winsorize]] for integral columns — bounds from
    * [[exactQuantilesLong]], clamp in exact long arithmetic. */
  def winsorizeLong(df: DataFrame, value: Column, loQ: Double, hiQ: Double,
      as: String): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ,
      s"need 0 <= loQ <= hiQ <= 1, got $loQ, $hiQ")
    val Seq(lo, hi) = exactQuantilesLong(df, value, Seq(loQ, hiQ))
    val v = value.cast("long")
    df.withColumn(as,
      when(v.isNull, v).otherwise(least(greatest(v, lit(lo)), lit(hi))))
  }

  /** Exact floor division of a long column by a positive long constant
    * — through decimals, because a double-typed `/` loses integer
    * precision above 2^53 (an epoch-µs timestamp far from 1970 could
    * land in the wrong bucket). The numerator is exactly divisible by
    * construction, so the decimal quotient is an exact integer. */
  private[operators] def ldiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))).cast(org.apache.spark.sql.types.DecimalType(38, 0))
      / lit(b)).cast("long")

  /** Regularize an event series onto a fixed time grid — the gap-fill /
    * resample step of metrics and training-telemetry analytics: every
    * key gets ONE row per `stepUs` bucket across its own observed
    * [min, max] time range, including the buckets where nothing
    * happened (a plain groupBy silently skips those, and downstream
    * rate/trend math over a grid with holes is wrong). The reference
    * has no analytics layer; this generalizes its time-range scan
    * predicate (include/tera/scan.h:96-99) from filtering a series to
    * shaping one.
    *
    * `aggs` are aggregate expressions over the event columns, evaluated
    * per (key, bucket); `zeroFill` supplies the value an EMPTY bucket
    * reports per output column (e.g. count → 0); unfilled columns stay
    * NULL there (see [[forwardFill]] for last-observation-carried-
    * forward). Output: `(key, bucket_us, <agg columns>)`, where
    * `bucket_us` is the bucket's inclusive start in epoch-µs (floor
    * division, correct for pre-epoch timestamps too).
    *
    * Scale shape: one hash aggregation over (key, bucket) — the only
    * corpus-sized exchange; the per-key bounds derive from the
    * AGGREGATED frame (bucket-count-sized, not event-count-sized) and
    * the grid explodes one row per OUTPUT bucket, so grid cost is
    * output-proportional by definition. No windows, no driver state. A
    * key spanning years at millisecond steps makes a huge grid because
    * the caller asked for one — that is the contract, not a blowup. */
  def regularize(events: DataFrame, key: Column, tsUs: Column, stepUs: Long,
      aggs: Seq[Column], zeroFill: Map[String, Column] = Map.empty): DataFrame = {
    require(stepUs >= 1, s"stepUs must be >= 1, got $stepUs")
    require(aggs.nonEmpty, "regularize needs at least one aggregate")
    val bucketed = events
      .withColumn("_k", key)
      .withColumn("_b", ldiv(tsUs, stepUs))
      .where(col("_k").isNotNull && col("_b").isNotNull)
    val agg = bucketed.groupBy(col("_k"), col("_b"))
      .agg(aggs.head, aggs.tail: _*)
    val aggCols = agg.columns.filterNot(Set("_k", "_b"))
    zeroFill.keys.foreach(c => require(aggCols.contains(c),
      s"zeroFill names '$c', which is not an aggregate output column"))
    val grid = agg.groupBy(col("_k"))
      .agg(min(col("_b")).as("_mn"), max(col("_b")).as("_mx"))
      .select(col("_k"), explode(sequence(col("_mn"), col("_mx"))).as("_b"))
    val joined = grid.join(agg, Seq("_k", "_b"), "left")
    val filled = zeroFill.foldLeft(joined) { case (df, (name, v)) =>
      df.withColumn(name, coalesce(col(name), v))
    }
    filled.select(col("_k").as("key") +: (col("_b") * stepUs).as("bucket_us") +:
      aggCols.map(col): _*)
  }

  /** Last observation carried forward: each named column's NULLs are
    * replaced by the latest non-null value at or before the row, per
    * key in `order` — the standard fill for [[regularize]]'s empty
    * buckets on gauge-like series (counts zero-fill; levels carry).
    * One window per key partition; `last(ignoreNulls)` over a running
    * frame keeps O(1) state per row. Leading NULLs (no observation yet)
    * remain NULL — fabricating a level before the first measurement
    * would be invention, not fill. */
  def forwardFill(df: DataFrame, key: Column, order: Column,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "forwardFill needs at least one column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Quantile images by 16-bit radix rounds — ALL quantiles advance
    * through the SAME FOUR scans: each round filters to the union of
    * the live prefixes (broadcast), histograms (prefix, next 16 bits)
    * once, and the driver walks every rank's bucket list from the
    * shared collect. The total row count — needed to turn quantiles
    * into 1-based ranks max(1, ceil(q·n)) — is the SUM of the first
    * round's histogram, so no separate count scan runs (round 15: the
    * dedicated `imgs.count()` was a fifth full pass over the input).
    * The first round's buckets are the signed top 16 bits (ordered);
    * later rounds append 16 unsigned bits under the found prefix. */
  private def kthImagesQ(imgs: DataFrame, qs: Seq[Double],
      opName: String): Seq[Long] = {
    val spark = imgs.sparkSession
    import spark.implicits._
    // per rank: (prefix so far, remaining rank within it) — seeded
    // from the first round's histogram sum
    var state: Seq[(Long, Long)] = null
    Seq(48, 32, 16, 0).foreach { shift =>
      val scoped =
        if (shift == 48) imgs.select(lit(0L).as("_pf"), col("_img"))
        else {
          val pfs = state.map(_._1).distinct.toDF("_pf")
          imgs.join(broadcast(pfs),
              shiftright(col("_img"), shift + 16) === col("_pf"))
            .select(col("_pf"), col("_img"))
        }
      val bucket =
        if (shift == 48) shiftright(col("_img"), 48)
        else shiftright(col("_img"), shift).bitwiseAND(lit(0xffffL))
      val rows = scoped.groupBy(col("_pf"), bucket.as("_b"))
        .agg(count(lit(1)).as("_c"))
        .collect()
      if (shift == 48) {
        val n = rows.iterator.map(_.getLong(2)).sum
        require(n > 0, s"$opName over an empty (or all-null) column")
        state = qs.map(q => (0L, math.max(1L, math.ceil(q * n).toLong)))
      }
      val hist = rows
        .groupBy(_.getLong(0))
        .map { case (pf, rs) =>
          pf -> rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        }
      state = state.map { case (prefix, kk) =>
        val key = if (shift == 48) 0L else prefix
        var k = kk
        var p = prefix
        var found = false
        hist(key).foreach { case (b, c) =>
          if (!found) {
            if (k <= c) {
              // first round keeps the SIGNED bucket unmasked so
              // negative prefixes compare correctly downstream
              p = if (shift == 48) b else (p << 16) | (b & 0xffffL)
              found = true
            } else k -= c
          }
        }
        require(found, s"rank walked past the histogram (k=$kk) — " +
          "concurrent mutation of the input?")
        (p, k)
      }
    }
    state.map(_._1)
  }
}
