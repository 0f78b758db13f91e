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
    val n = imgs.count()
    require(n > 0, "exactQuantiles over an empty (or all-null) column")
    qs.map { q =>
      val k = math.max(1L, math.ceil(q * n).toLong)
      Codecs.sortableBitsToDouble(kthImage(imgs, k))
    }
  }

  /** Exact quantiles of an integral column (returned as the actual
    * long elements). */
  def exactQuantilesLong(df: DataFrame, value: Column,
      qs: Seq[Double]): Seq[Long] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must lie in [0, 1]: $qs")
    val imgs = df.select(value.cast("long").as("_img"))
      .where(col("_img").isNotNull)
    val n = imgs.count()
    require(n > 0, "exactQuantilesLong over an empty (or all-null) column")
    qs.map { q =>
      val k = math.max(1L, math.ceil(q * n).toLong)
      kthImage(imgs, k)
    }
  }

  /** Per-stratum exact quantile — the per-source data-card median/p99.
    * Same radix selection, run for ALL strata simultaneously: each
    * round is ONE histogram aggregation over (stratum, next 8 bits)
    * and the driver advances every stratum's prefix in the same walk,
    * so the whole frame costs 8 aggregation passes regardless of how
    * many strata there are or how skewed they come. 8-bit rounds keep
    * the per-round collect at |strata| × 256 rows (strata are
    * domains/languages — the bounded-census shape `temperatureQuotas`
    * already documents). Output: `(stratum, value)` per stratum, the
    * exact element at rank max(1, ceil(q·n_stratum)).
    */
  def exactQuantilesBy(df: DataFrame, stratum: Column, value: Column,
      q: Double): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile must lie in [0, 1]: $q")
    val spark = df.sparkSession
    import spark.implicits._
    val imgs = df
      .select(stratum.cast("string").as("_s"), value.cast("double").as("_v"))
      .where(col("_s").isNotNull && col("_v").isNotNull && !isnan(col("_v")))
      .select(col("_s"), double_sortable_bits(col("_v")).as("_img"))
    val counts = imgs.groupBy(col("_s")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // state per stratum: (prefix so far, remaining rank)
    var state = counts.map { case (s, n) =>
      s -> (0L, math.max(1L, math.ceil(q * n).toLong))
    }
    (7 to 0 by -1).foreach { round =>
      val shift = round * 8
      // fix each stratum's found prefix via a broadcast join (first
      // round: no prefix yet — every row participates)
      val scoped = if (round == 7) imgs else {
        val pf = state.toSeq.map { case (s, (p, _)) => (s, p) }
          .toDF("_s", "_pf")
        imgs.join(broadcast(pf), Seq("_s"))
          .where(shiftright(col("_img"), shift + 8) === col("_pf"))
      }
      val bucket =
        if (round == 7) shiftright(col("_img"), 56)
        else shiftright(col("_img"), shift).bitwiseAND(lit(0xffL))
      val hist = scoped.groupBy(col("_s"), bucket.as("_b"))
        .agg(count(lit(1)).as("_c"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (s, rows) =>
          s -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        }
      state = state.map { case (s, (prefix, kk)) =>
        var k = kk
        var p = prefix
        var found = false
        hist(s).foreach { case (b, c) =>
          if (!found) {
            if (k <= c) {
              p = if (round == 7) b else (p << 8) | (b & 0xffL)
              found = true
            } else k -= c
          }
        }
        require(found, s"stratum $s walked past its histogram")
        s -> (p, k)
      }
    }
    state.toSeq.map { case (s, (img, _)) =>
      (s, Codecs.sortableBitsToDouble(img))
    }.toDF("stratum", "value")
  }

  /** k-th smallest image (1-based) by 16-bit radix rounds. The first
    * round's buckets are the signed top 16 bits (ordered); later
    * rounds fix the found prefix by equality and bucket the next 16
    * bits (unsigned, ordered within the prefix). */
  private def kthImage(imgs: DataFrame, k: Long): Long = {
    var prefix = 0L
    var kk = k
    Seq(48, 32, 16, 0).foreach { shift =>
      val scoped =
        if (shift == 48) imgs
        else imgs.where(shiftright(col("_img"), shift + 16) === prefix)
      val bucket =
        if (shift == 48) shiftright(col("_img"), 48)
        else shiftright(col("_img"), shift).bitwiseAND(lit(0xffffL))
      val hist = scoped.groupBy(bucket.as("_b"))
        .agg(count(lit(1)).as("_c"))
        .orderBy(col("_b"))
        .collect()
      var i = 0
      var found = false
      while (!found && i < hist.length) {
        val c = hist(i).getLong(1)
        if (kk <= c) {
          // the first round's bucket is the SIGNED top 16 bits — keep
          // it unmasked so negative prefixes compare correctly; later
          // rounds append 16 unsigned bits under it
          prefix =
            if (shift == 48) hist(i).getLong(0)
            else (prefix << 16) | (hist(i).getLong(0) & 0xffffL)
          found = true
        } else { kk -= c; i += 1 }
      }
      require(found, s"rank walked past the histogram (k=$k) — " +
        "concurrent mutation of the input?")
    }
    prefix
  }
}
