package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Secondary index tables — the reference's application-side index
  * pattern made first-class (tera keeps value→key index TABLES, not an
  * index subsystem: `t_customer_last_index` / `t_order_index`,
  * src/benchmark/tpcc/tpcc_schemas/, maintained by the TPC-C driver
  * alongside the base table). An index is itself a cell-log table whose
  * row key is `<indexed value>\0<primary row key>`, so an equality or
  * range predicate on the indexed column becomes a PREFIX RANGE SCAN in
  * global key order and returns the primary keys without reading base
  * data — the same "index scan, then primary get" plan the reference's
  * TPC-C transactions run (tera_tpccdb.cc OrderStatus-by-last-name).
  *
  * Correctness under updates: the reference maintains index entries
  * transactionally (old entry deleted + new inserted in one global txn).
  * A batch engine cannot assume every writer did that, so [[lookup]]
  * VERIFIES candidates against the base table's resolved cells — "the
  * index narrows, the base decides". A stale index entry costs one
  * wasted candidate, never a wrong answer; a missing entry is repaired
  * by the next [[buildOps]] rebuild (the compaction-time analogue).
  *
  * Scale: the index is range-scannable (its key order IS value order),
  * entries are a few dozen bytes, and the verify step joins a pruned
  * candidate set against cells already filtered to one (cf, qualifier)
  * — both sides shrink before the only shuffle.
  */
object SecondaryIndex {

  /** Separator between indexed value and primary key in the index row
    * key: NUL sorts before every other byte, so the composite keys of
    * one value form a contiguous range `[v\0, v\1)` that cannot
    * interleave with a longer value sharing the prefix. */
  val Sep = "\u0000"
  private val SepEnd = "\u0001"

  /** CF the index entries live in. */
  val IndexCf = "i"

  /** Index mutation batch for `(cf, qualifier)` from RESOLVED cells —
    * the full-build / rebuild path (run it over a compaction's resolved
    * output to repair drift). Values are indexed in UTF-8 string space.
    */
  def buildOps(cells: DataFrame, cf: String, qualifier: String): DataFrame = {
    // \u0000/\u0001 are reserved by the key encoding: a value containing
    // NUL would land inside another value's [v\0, v\1) range and
    // candidates() would hand back a truncated indexed_value. Refuse at
    // build time — a loud error beats silently wrong range scans.
    val v = decode(col("value"), "UTF-8")
    val safeValue = when(contains(v, lit(Sep)) || contains(v, lit(SepEnd)),
      raise_error(concat(lit("indexed value contains reserved byte \\u0000/\\u0001"
        + " (index key separator) at base row "), col("row_key"))))
      .otherwise(v)
    cells.where(col("cf") === cf && col("qualifier") === qualifier)
      .select(
        concat(safeValue, lit(Sep), col("row_key")).as("row_key"),
        lit(IndexCf).as("cf"),
        lit("").as("qualifier"),
        col("ts"),
        lit(graft.model.OpType.Value).as("op"),
        encode(col("row_key"), "UTF-8").as("value"),
        col("seq"))
  }

  /** Incremental index inserts for a base-table put batch (VALUE ops on
    * the indexed column only — deletes and atomics don't carry the new
    * value, so their index repair is the rebuild's job, and stale
    * entries are harmless by the verify-on-lookup rule). */
  def opsForBatch(batch: DataFrame, cf: String, qualifier: String): DataFrame =
    buildOps(batch.where(col("op") === graft.model.OpType.Value), cf, qualifier)

  /** Candidate (primary key, indexed value) pairs for a value range
    * `[lo, hi)` (equality: `candidatesEq`) — one index range scan, no
    * base-table IO. Indexed values are NUL/SOH-free by [[buildOps]]'s
    * build-time check, so `substring_index` on the separator is exact. */
  def candidates(indexCells: DataFrame, lo: String, hi: Option[String]): DataFrame = {
    val hiBound = hi.map(h => col("row_key") < h)
      .getOrElse(lit(true))
    indexCells
      .where(col("cf") === IndexCf && col("row_key") >= lo && hiBound)
      .select(decode(col("value"), "UTF-8").as("base_key"),
        substring_index(col("row_key"), Sep, 1).as("indexed_value"))
  }

  /** Candidates for an exact value: the contiguous `[v\0, v\1)` range. */
  def candidatesEq(indexCells: DataFrame, value: String): DataFrame =
    candidates(indexCells, value + Sep, Some(value + SepEnd))

  /** Verified lookup: index candidates for `value`, confirmed against
    * the base table's CURRENT resolved cells of the indexed column.
    * Returns the matching base row keys. */
  def lookup(baseCells: DataFrame, indexCells: DataFrame,
      cf: String, qualifier: String, value: String): DataFrame = {
    val current = baseCells.where(
      col("cf") === cf && col("qualifier") === qualifier &&
        decode(col("value"), "UTF-8") === value)
      .select(col("row_key").as("base_key"))
    candidatesEq(indexCells, value)
      .select(col("base_key"))
      .join(current, Seq("base_key"), "left_semi")
  }
}
