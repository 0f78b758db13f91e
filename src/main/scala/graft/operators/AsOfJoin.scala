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
  * split window partitions, so one hot key still lands on one task;
  * when a key is pathologically hot, pre-salt it (range-bucket the ts
  * domain per salt) — the design itself stays the right one.
  */
object AsOfJoin {

  /** NOTE: `carried` columns are each carried by an independent
    * last-non-null window; when a right row can hold nulls in some
    * carried columns, values from different right rows may combine.
    * Carry a single struct column when row-atomic carry is required.
    *
    * @param left      driving rows
    * @param right     lookup rows
    * @param key       join key column name (same name both sides)
    * @param leftTs    event-time column in `left`
    * @param rightTs   event-time column in `right`
    * @param carried   columns of `right` to carry to the matches
    * @return `left` columns + carried right columns (null when no match)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      carried: Seq[String]): DataFrame = {

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
    val carriedCols: Seq[Column] =
      carried.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(c))

    l.unionAll(r)
      .select(Seq(col(key), col("_tag")) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++ carriedCols: _*)
      .where(col("_tag") === 1)
      .drop("_tag")
  }
}
