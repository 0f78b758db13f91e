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

  /** Aggregations that decompose correctly into per-salt partials plus a
    * final merge. A closed set BY DESIGN: a free-form partial/final
    * column pair lets a non-decomposable aggregate (avg, distinct
    * count, ...) silently produce wrong results; these four compose the
    * rest (avg = Sum/Count at the call site).
    */
  sealed trait SaltableAgg { def as: String }
  object SaltableAgg {
    case class Sum(column: String, as: String) extends SaltableAgg
    case class Count(as: String) extends SaltableAgg
    case class Min(column: String, as: String) extends SaltableAgg
    case class Max(column: String, as: String) extends SaltableAgg
  }

  /** Two-phase aggregation over a skewed key: per-(key, salt) partials
    * then a final merge per key — the partial/final pair for each
    * aggregate is derived internally so they always compose. The
    * output key keeps the caller's column name (`df.select(key)`'s
    * resolved name — alias an expression key with `.as` to control
    * it), so downstream code and oracles see the same schema a plain
    * `groupBy(key)` would produce.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      aggs: Seq[SaltableAgg]): DataFrame = {
    import SaltableAgg._
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val keyName = df.select(key).columns.head
    // an output alias equal to the key (or a duplicate alias) would
    // make the final groupBy ambiguous — refuse loudly
    val aliases = aggs.map(_.as)
    require(aliases.distinct.size == aliases.size,
      s"duplicate aggregate aliases: ${aliases.mkString(", ")}")
    require(!aliases.contains(keyName),
      s"aggregate alias collides with the key column '$keyName'")
    val saltCol = Iterator.from(0).map(i => s"_salt$i")
      .find(n => !df.columns.contains(n) && n != keyName &&
        !aliases.contains(n)).get
    val partials = aggs.map {
      case Sum(c, as)  => sum(c).as(as)
      case Count(as)   => count(lit(1)).as(as)
      case Min(c, as)  => min(c).as(as)
      case Max(c, as)  => max(c).as(as)
    }
    val finals = aggs.map {
      case Sum(_, as) => sum(as).as(as)
      case Count(as)  => sum(as).as(as)
      case Min(_, as) => min(as).as(as)
      case Max(_, as) => max(as).as(as)
    }
    // the salt only spreads rows — any value works; the row-id variant
    // round-robins so one hot key fans over all `salts` partials even
    // when its rows arrive clustered
    df.withColumn(saltCol, pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as(keyName), col(saltCol))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(keyName))
      .agg(finals.head, finals.tail: _*)
  }

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
    // correct under task retry (the dim side is replicated across ALL
    // salts, so every salt value matches) but row→salt placement is
    // NONDETERMINISTIC across runs: monotonically_increasing_id
    // depends on partitioning. Join RESULTS are deterministic; only
    // the shuffle routing varies.
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
