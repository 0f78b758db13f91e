package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the engine-level analogue of tera's
  * hash sharding that breaks up hot tablets (`EnableHash` murmur key
  * prefixing, src/sdk/table_impl.cc:98): AQE's skew-join handles
  * sort-merge skew at runtime; this explicit salt covers aggregations
  * and joins AQE can't split (e.g. a hot group key in a two-phase agg).
  */
object Skew {

  /** Two-phase aggregation over a skewed key: per-(key, salt) partials
    * then a final merge per key. `partialAggs`/`finalAggs` must compose
    * (sum/sum, count/sum, min/min, ...).
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col("_key"))
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Salted join of a skewed fact side against a small-ish dim side:
    * the fact side gets a random salt in [0, salts); the dim side is
    * replicated `salts` times so every (key, salt) pair still matches.
    * Spreads one hot key over `salts` shuffle partitions.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
