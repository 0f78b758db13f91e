package graft.operators

import graft.functions.cellfunctions.{bucket_rank, interleave_bits}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional parquet
  * min/max skipping.
  *
  * The reference gets scan locality from ONE dimension: tablets are
  * row-key-range shards, so a key-range scan touches only the tablets
  * it overlaps (src/master/tablet_manager.cc; scan routing
  * src/sdk/table_impl.cc:414-490). A second predicate dimension —
  * timestamp, a qualifier value — always pays a full pass over the
  * selected range. At 100 TB the analogue matters in BOTH directions:
  * a table laid out by one column answers box predicates on any other
  * column by reading everything. Z-ordering generalizes the locality:
  * each clustered column quantizes to an equi-depth bucket rank
  * (driver-side quantile handshake, 2^bits-1 doubles per column — skew
  * cannot collapse the curve onto one axis the way raw-value bit
  * interleaving would), the ranks' bits interleave into one long, and
  * the frame range-partitions + sorts by that key. Every written file
  * then carries a tight min/max box on EVERY clustered column, so
  * Spark's parquet reader prunes row groups for a predicate on any of
  * them (the pushed filter evaluates against row-group statistics).
  *
  * Scale shape: one quantile pass (approxQuantile — a single
  * aggregation, driver receives only the bounds), then exactly one
  * range-exchange over the data; the z-key computation is a codegen'd
  * expression column. No window, no collect of data rows. The curve
  * composition (equi-depth rank + bit interleave) is the publicly
  * documented one (Morton 1966; Delta Lake / Iceberg OPTIMIZE ZORDER).
  */
object ZOrder {

  /** Max interleaved width; bits * nCols must fit a non-negative long. */
  private val MaxKeyBits = 63

  /** Per-column equi-depth quantile bounds for the z-key: 2^bits - 1
    * interior quantiles of each clustered column, cast to double
    * (timestamps via epoch micros). One aggregation pass; the driver
    * holds only nCols * (2^bits - 1) doubles — the same bounded-scalar
    * handshake class as IVF centroids. `relErr` trades pass cost for
    * bucket evenness; skipping only needs approximate equi-depth.
    */
  def quantileBounds(df: DataFrame, cols: Seq[String], bits: Int,
      relErr: Double = 0.001): Array[Array[Double]] = {
    require(cols.nonEmpty, "need at least one z-order column")
    require(bits >= 1 && bits * cols.size <= MaxKeyBits,
      s"bits * nCols must be in [1, $MaxKeyBits], got $bits * ${cols.size}")
    val asDouble = df.select(cols.map(n =>
      toDoubleCol(df, n).as(n)): _*)
    val probes = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    asDouble.stat.approxQuantile(cols.toArray, probes, relErr)
      .map(_.toArray)
  }

  /** The z-order sort key: equi-depth rank per column against `bounds`,
    * bits interleaved (column 0 in the least-significant lane). NULLs
    * rank 0 — they cluster at the curve start, and a null-rejecting
    * predicate then skips those files too.
    */
  def zkey(df: DataFrame, cols: Seq[String], bounds: Array[Array[Double]],
      bits: Int): Column = {
    require(cols.size == bounds.length,
      s"${cols.size} columns but ${bounds.length} bound sets")
    val ranks = cols.zip(bounds).map { case (n, b) =>
      coalesce(bucket_rank(toDoubleCol(df, n), b), lit(0))
    }
    interleave_bits(array(ranks: _*), bits)
  }

  /** Write `df` z-clustered by `cols` into `numFiles` range-disjoint
    * parquet files, each sorted by the z-key. Content is exactly `df`
    * (clustering is a pure reorder — the key column is dropped before
    * the write). One quantile pass + one range exchange.
    */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 10, relErr: Double = 0.001): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val bounds = quantileBounds(df, cols, bits, relErr)
    df.withColumn(ZKeyCol, zkey(df, cols, bounds, bits))
      .repartitionByRange(numFiles, col(ZKeyCol))
      .sortWithinPartitions(ZKeyCol)
      .drop(ZKeyCol)
      .write.mode("overwrite").parquet(path)
  }

  private val ZKeyCol = "_graft_zkey"

  /** Numeric/timestamp/date column as double (timestamps at epoch-µs
    * precision — bucket ranks only need ORDER, and double keeps µs
    * order exactly within any realistic epoch range; NTZ maps through
    * the session zone, which every engine session pins to UTC). */
  private def toDoubleCol(df: DataFrame, name: String): Column = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    df.schema(name).dataType match {
      case TimestampType =>
        unix_micros(col(name)).cast("double")
      case TimestampNTZType =>
        unix_micros(col(name).cast(TimestampType)).cast("double")
      case DateType => col(name).cast("timestamp").cast("long").cast("double")
      case _ => col(name).cast("double")
    }
  }
}
