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
    * StreamingSpec.
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
    * @return one row per matching pair: left columns + carried columns
    */
  def join(left: DataFrame, right: DataFrame, key: Option[String],
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long,
      carried: Seq[String]): DataFrame = {
    require(upperUs >= lowerUs,
      s"upperUs ($upperUs) must be >= lowerUs ($lowerUs)")
    require(carried.nonEmpty, "carry at least one right column")
    val clash = carried.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"carried columns collide with left columns: ${clash.mkString(", ")} " +
        "— alias them on the right side first")
    val width = math.max(upperUs - lowerUs, 1L)
    def bucketOf(ts: Column): Column = Stats.ldiv(ts, width)
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
      .select(col("_bkt").as("_rbkt") +: col(rightTs).as("_rts") +:
        (key.toSeq.map(k => col(k).as("_rkey")) ++
          carried.map(c => col(c).as(s"_c_$c"))): _*)
    val cond = key match {
      case Some(k) => col("_bkt") === col("_rbkt") && col(k) === col("_rkey")
      case None => col("_bkt") === col("_rbkt")
    }
    l.join(r, cond)
      .where(col("_rts") >= col(leftTs) + lowerUs &&
        col("_rts") <= col(leftTs) + upperUs)
      .select(left.columns.map(col) ++
        carried.map(c => col(s"_c_$c").as(c)): _*)
  }
}
