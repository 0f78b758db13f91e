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

  private def ranked(df: DataFrame, stratum: Column, order: Column): DataFrame =
    df.withColumn("_rn",
      row_number().over(Window.partitionBy(stratum).orderBy(order)))

  /** Systematic 1-in-`k` sample per stratum: keeps ranks 1, k+1, 2k+1, …
    * of the stratum's `order`-sorted rows — every stratum is sampled at
    * the same rate regardless of its size.
    */
  def systematic(df: DataFrame, stratum: Column, order: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ranked(df, stratum, order)
      .where((col("_rn") - 1) % k === 0)
      .drop("_rn")
  }

  /** Exactly the first `n` rows of each stratum in `order` — fixed
    * per-domain quotas (the balancing counterpart of [[systematic]]'s
    * fixed rate).
    */
  def takePerStratum(df: DataFrame, stratum: Column, order: Column,
      n: Int): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    ranked(df, stratum, order)
      .where(col("_rn") <= n)
      .drop("_rn")
  }
}
