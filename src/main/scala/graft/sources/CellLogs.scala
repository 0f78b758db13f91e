package graft.sources

import graft.functions.cellfunctions._
import graft.model.OpType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic cell-log fixtures derived from the driver test tables
  * (FIXTURES.md §2). These reshape relational rows into the tagged
  * mutation log the resolve pipeline consumes; the DuckDB oracles in
  * [[graft.SparkEntry.oracleSql]] recompute the expected visible state
  * directly from the base tables.
  */
object CellLogs {
  import OpType._

  // statically-known op sets per fixture, for Resolve's adaptive paths
  val valueOnly: Option[Set[Int]] = Some(Set(Value))
  val counterOps: Option[Set[Int]] = Some(Set(Add))
  val addInt64Ops: Option[Set[Int]] = Some(Set(AddInt64))
  val appendOps: Option[Set[Int]] = Some(Set(Append))
  val putIfAbsentOps: Option[Set[Int]] = Some(Set(PutIfAbsent))
  val tombstoneOps: Option[Set[Int]] = Some(Set(Value, DelQualifiers, DelRow))
  val delGranularityOps: Option[Set[Int]] = Some(Set(Value, DelColumn, DelQualifier))

  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
    e.withColumn("ts_us", Tables.eventTsUs(e))
  }

  /** events → VALUE cells: row=user, qualifier=event_type, payload=props.
    * seq = event_id (unique, arrival-ordered). */
  def eventsLog(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").cast("string").as("row_key"),
      lit("ev").as("cf"),
      col("event_type").as("qualifier"),
      col("ts_us").as("ts"),
      lit(Value).as("op"),
      encode(col("props"), "UTF-8").as("value"),
      col("event_id").as("seq"))

  /** events → counter ADD ops (big-endian int64 delta = floor(value*100),
    * an exact integer so Spark and DuckDB agree bit-for-bit). */
  def counterLog(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").cast("string").as("row_key"),
      lit("ev").as("cf"),
      col("event_type").as("qualifier"),
      col("ts_us").as("ts"),
      lit(Add).as("op"),
      be64_encode(floor(col("value") * 100).cast("long")).as("value"),
      col("event_id").as("seq"))

  /** events → ADDINT64 ops (little-endian host-order int64 delta, tera
    * src/io/atomic_merge_strategy.cc:41-43; same exact-integer payload as
    * [[counterLog]] so the DuckDB oracle is a plain sum). */
  def addInt64Log(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").cast("string").as("row_key"),
      lit("ev").as("cf"),
      col("event_type").as("qualifier"),
      col("ts_us").as("ts"),
      lit(AddInt64).as("op"),
      le64_encode(floor(col("value") * 100).cast("long")).as("value"),
      col("event_id").as("seq"))

  /** DelColumn + DelQualifier fixture (the two delete granularities the
    * tombstoneLog doesn't cover; tera tera_key.h:14-27, drop logic
    * src/io/default_compact_strategy.cc:59-120): per distinct
    * (orderkey k, linenumber q), VALUE cells at ts=1..3 in CFs 'a' and
    * 'b'; k%3==0 gets DEL_COLUMN on cf 'a' at ts=2 (kills ts<=2 of the
    * whole CF); k%5==0 gets DEL_QUALIFIER (single version) on cf 'b' at
    * exactly ts=2. seq: deletes arrive after all values of their row.
    */
  def delGranularityLog(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("q"))
      .distinct()
    def valueCells(cf: String, tsOff: Int) = li
      .crossJoin(spark.range(1, 4).select(col("id").as("ts")))
      .select(
        col("k").cast("string").as("row_key"),
        lit(cf).as("cf"),
        col("q").cast("string").as("qualifier"),
        col("ts"),
        lit(Value).as("op"),
        encode(concat_ws(":", col("k"), lit(cf), col("q"), col("ts")), "UTF-8")
          .as("value"),
        (col("k") * 1000 + col("q") * 10 + col("ts") + tsOff).as("seq"))
    val delCf = li.where(col("k") % 3 === 0).select(col("k")).distinct()
      .select(
        col("k").cast("string").as("row_key"),
        lit("a").as("cf"),
        lit("").as("qualifier"),
        lit(2L).as("ts"),
        lit(DelColumn).as("op"),
        lit(null).cast("binary").as("value"),
        (col("k") * 1000 + 999).as("seq"))
    val delVer = li.where(col("k") % 5 === 0)
      .select(
        col("k").cast("string").as("row_key"),
        lit("b").as("cf"),
        col("q").cast("string").as("qualifier"),
        lit(2L).as("ts"),
        lit(DelQualifier).as("op"),
        lit(null).cast("binary").as("value"),
        (col("k") * 1000 + col("q") * 10 + 8).as("seq"))
    valueCells("a", 0).unionAll(valueCells("b", 3))
      .unionAll(delCf).unionAll(delVer)
  }

  /** events → APPEND ops over the props payload (chronological concat). */
  def appendLog(spark: SparkSession, sfDir: String): DataFrame =
    eventsLog(spark, sfDir).withColumn("op", lit(Append))

  /** events → PUT_IF_ABSENT ops (oldest write per column wins). */
  def putIfAbsentLog(spark: SparkSession, sfDir: String): DataFrame =
    eventsLog(spark, sfDir).withColumn("op", lit(PutIfAbsent))

  /** lineitem → one VALUE cell per (orderkey, linenumber): row=orderkey,
    * qualifier=linenumber, payload=price cents (big-endian int64). Orders
    * have 1-7 lines, so high line-number qualifiers are naturally MISSING
    * on most rows — the filter_if_missing fixture. */
  def lineitemLog(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      // the synthetic data has duplicate (orderkey, linenumber) pairs;
      // collapse deterministically so cell identity is unique
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(max(floor(col("l_extendedprice") * 100).cast("long")).as("price"))
      .select(
        col("l_orderkey").cast("string").as("row_key"),
        lit("li").as("cf"),
        col("l_linenumber").cast("string").as("qualifier"),
        lit(1L).as("ts"),
        lit(Value).as("op"),
        be64_encode(col("price")).as("value"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("seq"))

  /** Tombstone/version fixture from lineitem (FIXTURES.md §2.3, mirroring
    * the reference OverWrite/Compact tests, src/io/test/tablet_io_test.cc:215,241):
    * per (orderkey, linenumber): VALUE at ts=1..5; odd orderkeys get
    * DEL_QUALIFIERS at ts=4; orderkeys %100==0 get DEL_ROW at ts=4.
    * seq encodes arrival order: all deletes after all values.
    */
  def tombstoneLog(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("q"))
    val values = li
      .crossJoin(spark.range(1, 6).select(col("id").as("ts")))
      .select(
        col("k").cast("string").as("row_key"),
        lit("lg0").as("cf"),
        col("q").cast("string").as("qualifier"),
        col("ts"),
        lit(Value).as("op"),
        encode(concat_ws(":", col("k"), col("q"), col("ts")), "UTF-8").as("value"),
        (col("k") * 1000 + col("q") * 10 + col("ts")).as("seq"))
    val delQuals = li.where(col("k") % 2 === 1)
      .select(
        col("k").cast("string").as("row_key"),
        lit("lg0").as("cf"),
        col("q").cast("string").as("qualifier"),
        lit(4L).as("ts"),
        lit(DelQualifiers).as("op"),
        lit(null).cast("binary").as("value"),
        (col("k") * 1000 + col("q") * 10 + 6).as("seq"))
    val delRows = li.where(col("k") % 100 === 0).select(col("k")).distinct()
      .select(
        col("k").cast("string").as("row_key"),
        lit("lg0").as("cf"),
        lit("").as("qualifier"),
        lit(4L).as("ts"),
        lit(DelRow).as("op"),
        lit(null).cast("binary").as("value"),
        (col("k") * 1000 + 999).as("seq"))
    values.unionAll(delQuals).unionAll(delRows)
  }

  /** orders → a multi-CF wide table: cf 'meta' holds status/priority
    * strings, cf 'amt' holds the price cents counter — exercises
    * locality-group-style CF projection (P1) and point gets (S3/S4). */
  def ordersWideLog(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    def cell(cf: String, qual: String, value: org.apache.spark.sql.Column, slot: Int) =
      o.select(
        col("o_orderkey").cast("string").as("row_key"),
        lit(cf).as("cf"),
        lit(qual).as("qualifier"),
        lit(1L).as("ts"),
        lit(Value).as("op"),
        value.as("value"),
        (col("o_orderkey") * 10 + slot).as("seq"))
    cell("meta", "status", encode(col("o_orderstatus"), "UTF-8"), 1)
      .unionAll(cell("meta", "priority", encode(col("o_orderpriority"), "UTF-8"), 2))
      .unionAll(cell("amt", "price",
        be64_encode(floor(col("o_totalprice") * 100).cast("long")), 3))
  }

  /** Binary raw-key twin of [[ordersWideLog]]: row_key = 0x00 ++
    * utf8(orderkey) ++ 0xFF. Every key carries a NUL and a bare 0xFF —
    * invalid UTF-8, so the fixture round-trips only through a genuinely
    * byte-preserving BinaryType key path, and memcmp order differs from
    * what string order over the digits would give (tera
    * `RawKey::Binary`, table_schema.proto:10-15). */
  def ordersWideBinaryLog(spark: SparkSession, sfDir: String): DataFrame =
    ordersWideLog(spark, sfDir).withColumn("row_key",
      concat(lit(Array[Byte](0)), encode(col("row_key"), "UTF-8"),
        lit(Array(0xFF.toByte))))

  /** Binary raw-key KV fixture from part: key = 0x00 ++ utf8(partkey) ++
    * 0xFF 0x80 (NUL + invalid-UTF-8 tail), value = name bytes, never
    * expires. A [lo, hi) byte-range over these keys selects a DIFFERENT
    * row set than the readable-key scan would — e.g. partkey "1" sorts
    * inside ["1000", "2000") because 0xFF outranks every digit — so the
    * oracle must (and does) compare blobs, not strings. */
  def kvBinaryLog(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "part").select(
      concat(lit(Array[Byte](0)),
        encode(col("p_partkey").cast("string"), "UTF-8"),
        lit(Array(0xFF.toByte, 0x80.toByte))).as("key"),
      encode(col("p_name"), "UTF-8").as("value"),
      lit(0L).as("expire_ts_us"),
      col("p_partkey").as("seq"))

  /** events → VALUE cells with f64-encoded numeric payload (typed
    * comparator fixture, P11). */
  def eventsF64Log(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").cast("string").as("row_key"),
      lit("ev").as("cf"),
      col("event_type").as("qualifier"),
      col("ts_us").as("ts"),
      lit(Value).as("op"),
      f64_encode(col("value")).as("value"),
      col("event_id").as("seq"))

  /** events → VALUE cells carrying uint64 LE payloads with the SIGN BIT
    * SET (logical cents | 2^63) — the unsigned-comparator fixture (P11b):
    * as signed int64 every value is negative, so only a genuinely
    * unsigned compare orders them correctly. */
  def eventsUintLog(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").cast("string").as("row_key"),
      lit("ev").as("cf"),
      col("event_type").as("qualifier"),
      col("ts_us").as("ts"),
      lit(Value).as("op"),
      le64_encode(floor(col("value") * 100).cast("long")
        .bitwiseOR(Long.MinValue)).as("value"),
      col("event_id").as("seq"))

  /** part → a 1-cell-per-row KV-shaped cell log (row=partkey,
    * value=name) — the pagination fixture, shared by both q_o2 rows so
    * the resume pair cannot silently diverge. */
  def partKvLog(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "part").select(
      col("p_partkey").cast("string").as("row_key"),
      lit("kv").as("cf"),
      lit("v").as("qualifier"),
      lit(1L).as("ts"),
      lit(Value).as("op"),
      encode(col("p_name"), "UTF-8").as("value"),
      col("p_partkey").as("seq"))

  /** TTLKv fixture from part: one KV per partkey with a baked expiry
    * (expire_ts_us = epoch + partkey seconds; every 4th key never
    * expires), and every 5th key rewritten at seq=2 — latest wins.
    */
  def kvTtlLog(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.load(spark, sfDir, "part").select(
      col("p_partkey").cast("string").as("key"),
      col("p_name").as("value"),
      when(col("p_partkey") % 4 === 0, 0L)
        .otherwise(lit(1700000000000000L) + col("p_partkey") * 1000000L)
        .as("expire_ts_us"),
      col("p_partkey").as("pk"))
    val v1 = base.select(col("key"), col("value"), col("expire_ts_us"),
      lit(1L).as("seq"))
    val v2 = base.where(col("pk") % 5 === 0)
      .select(col("key"), concat(col("value"), lit("+v2")).as("value"),
        col("expire_ts_us"), lit(2L).as("seq"))
    v1.unionAll(v2)
  }

  /** Percolator committed-state fixture from orders (FIXTURES.md §2.4):
    * every order writes data at ts=10; even orderkeys also carry a
    * commit pointer `!Wq` at commit_ts=20 whose value encodes the data
    * ts (big-endian int64, as in tera src/sdk/global_txn_internal.h:68-71).
    * Odd orderkeys are uncommitted — invisible to a snapshot read.
    */
  def percolatorLog(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val data = o.select(
      col("o_orderkey").cast("string").as("row_key"),
      lit("cf").as("cf"),
      lit("q").as("qualifier"),
      lit(10L).as("ts"),
      lit(Value).as("op"),
      encode(col("o_orderstatus"), "UTF-8").as("value"),
      (col("o_orderkey") * 10 + 1).as("seq"))
    val writePtrs = o.where(col("o_orderkey") % 2 === 0).select(
      col("o_orderkey").cast("string").as("row_key"),
      lit("cf").as("cf"),
      lit("!Wq").as("qualifier"),
      lit(20L).as("ts"),
      lit(Value).as("op"),
      be64_encode(lit(10L)).as("value"),
      (col("o_orderkey") * 10 + 2).as("seq"))
    data.unionAll(writePtrs)
  }
}
