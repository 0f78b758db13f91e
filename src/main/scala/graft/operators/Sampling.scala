package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-stratum sampling for corpus curation (domain
  * balancing, heldout carving). `DataFrame.sampleBy`'s Bernoulli draws
  * depend on seed AND partition layout, so two runs of the same
  * pipeline can train on different rows; these operators are exact and
  * reproducible: rank within the stratum in a stable order, keep by
  * rank. One window shuffle on the stratum key; AQE handles stratum
  * skew like any other aggregation key.
  */
object Sampling {

  private def ranked(df: DataFrame, parts: Seq[Column], order: Column): DataFrame =
    df.withColumn("_rn",
      row_number().over(Window.partitionBy(parts: _*).orderBy(order)))

  /** Systematic 1-in-`k` sample per stratum: keeps ranks 1, k+1, 2k+1, …
    * of the stratum's `order`-sorted rows — every stratum is sampled at
    * the same rate regardless of its size.
    *
    * Scale: a corpus usually has FEW strata (domains), and a window
    * partitioned on the stratum alone would push the whole corpus
    * through |strata| tasks. `subStratum` splits each stratum into
    * deterministic sub-partitions the sample rate applies to
    * independently — e.g. `col("doc_id") % 256` — restoring full
    * parallelism while keeping the selection exact, reproducible, and
    * reproducible OUTSIDE the engine too (a plain modulo, unlike a
    * partition-dependent Bernoulli draw or an engine-specific hash).
    * Per-stratum sample size stays within +1 row per sub-stratum of
    * n/k.
    */
  def systematic(df: DataFrame, stratum: Column, order: Column,
      k: Int, subStratum: Option[Column] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ranked(df, stratum +: subStratum.toSeq, order)
      .where((col("_rn") - 1) % k === 0)
      .drop("_rn")
  }

  /** Exactly the first `n` rows of each stratum in `order` — fixed
    * per-domain quotas (the balancing counterpart of [[systematic]]'s
    * fixed rate). Quotas are small by construction, so the per-stratum
    * window is acceptable here; for rate-based sampling of huge strata
    * use [[systematic]] with a `subStratum`.
    */
  def takePerStratum(df: DataFrame, stratum: Column, order: Column,
      n: Int): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    ranked(df, Seq(stratum), order)
      .where(col("_rn") <= n)
      .drop("_rn")
  }
}
