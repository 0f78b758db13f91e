package graft.model

import org.apache.spark.sql.types._

/** Mutation type tags of the cell log.
  *
  * Mirrors the reference engine's key-embedded type tags
  * (tera: src/leveldb/include/leveldb/tera_key.h:14-27): a cell's logical
  * value is the fold of a tagged, append-only mutation log, resolved
  * lazily at read time (tera resolves at scan/compaction).
  */
object OpType {
  val Value: Int = 0
  /** Deletes the whole row for cells with ts <= tombstone ts. */
  val DelRow: Int = 1
  /** Deletes one column family of a row, ts-bounded. */
  val DelColumn: Int = 2
  /** Deletes all versions of one (cf, qualifier), ts-bounded. */
  val DelQualifiers: Int = 3
  /** Deletes exactly one version: same (row, cf, qualifier, ts). */
  val DelQualifier: Int = 4
  /** Counter add, int64 big-endian operand (tera `Add`). */
  val Add: Int = 5
  /** Counter add, int64 little-endian ("native") operand (tera `AddInt64`). */
  val AddInt64: Int = 6
  /** Write only if no visible value exists (oldest such write wins). */
  val PutIfAbsent: Int = 7
  /** Byte-concat in chronological order. */
  val Append: Int = 8

  val deletes: Seq[Int] = Seq(DelRow, DelColumn, DelQualifiers, DelQualifier)
  val atomics: Seq[Int] = Seq(Add, AddInt64, PutIfAbsent, Append)
  val dataOps: Seq[Int] = Value +: atomics
}

/** One mutation in the cell log — the engine's source of truth.
  *
  * @param row_key   row identifier; the unit of atomicity
  * @param cf        column family
  * @param qualifier dynamic column qualifier (schemaless)
  * @param ts        cell timestamp, microseconds
  * @param op        [[OpType]] tag
  * @param value     operand bytes (delete ops: null)
  * @param seq       arrival order, unique; tie-break for same-ts ops
  *                  (tera: the LevelDB sequence number)
  */
case class CellOp(
    row_key: String,
    cf: String,
    qualifier: String,
    ts: Long,
    op: Int,
    value: Array[Byte],
    seq: Long)

object CellOp {
  val schema: StructType = StructType(Seq(
    StructField("row_key", StringType, nullable = false),
    StructField("cf", StringType, nullable = false),
    StructField("qualifier", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("op", IntegerType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("seq", LongType, nullable = false)))

  /** Log schema for the table's key mode: binary raw keys swap
    * `row_key` to `BinaryType` ([[TableDesc.rawKeyBinary]]). */
  def schemaFor(binaryKey: Boolean): StructType =
    if (!binaryKey) schema
    else StructType(schema.map(f =>
      if (f.name == "row_key") f.copy(dataType = BinaryType) else f))
}

/** Per-column-family resolve knobs (tera table_schema.proto:31-44). */
case class CfSpec(
    maxVersions: Int = 1,
    minVersions: Int = 0,
    ttlSec: Long = 0L)

/** Table metadata driving the resolve pipeline. */
case class TableDesc(
    default: CfSpec = CfSpec(),
    cfs: Map[String, CfSpec] = Map.empty,
    /** Hash-sharded row keys (tera `EnableHash`,
      * include/tera/table_descriptor.h:217-218): storage keys carry a
      * murmur hex prefix ([[graft.functions.Codecs.hashedKey]]), so rows
      * spread uniformly across shards. Scans observe HASHED order, not
      * logical order, and a start/stop range only makes sense as a point
      * range — exactly the reference's behavior (table_impl.cc:398-405).
      */
    hashKeys: Boolean = false,
    /** KV-mode table (tera's key-value flavor, `kv_only` in
      * table_schema.proto): 2-column model, one version per key,
      * per-KV expiry baked at write time. The log schema is
      * [[KvEntry.schema]], not [[CellOp.schema]]. */
    kvMode: Boolean = false,
    /** Locality groups (tera `LocalityGroupSchema`,
      * table_schema.proto:17-30): cf → LG name. tera stores each LG as
      * a separate LevelDB sub-database so a CF-projected scan opens
      * only the LGs it needs (src/io/tablet_io.cc:1018-1024); here each
      * LG is a parquet PARTITION DIRECTORY (`lg=<name>/`), so the same
      * projection becomes directory-level partition pruning — whole
      * LGs are never listed, opened, or read. Unlisted CFs land in
      * [[TableDesc.DefaultLg]]. Empty map = unpartitioned layout
      * (single-LG table, no directory overhead). */
    lgs: Map[String, String] = Map.empty,
    /** Hash-bucketed physical layout (> 0 = bucket count). tera
      * pre-shards a table into tablets and every read/merge happens
      * tablet-locally (src/master/master_impl.cc tablet placement;
      * compaction merges inside one tablet's LevelDB) — the Spark
      * analogue is a bucketed table: files are clustered by
      * `murmur3(row_key) % buckets` and the scan REPORTS that
      * partitioning, so resolve's whole fold pipeline (version windows,
      * tombstone application, counter folds — all keyed on row_key
      * prefixes) runs with ZERO shuffle, and a point get prunes to one
      * bucket. Mutually exclusive with [[lgs]]: one physical clustering
      * per table (pick row-locality or column-locality). 0 = the
      * default range-clustered flat layout. */
    buckets: Int = 0,
    /** Binary raw-key mode (tera `RawKey::Binary`,
      * src/proto/table_schema.proto:10-15): row keys are arbitrary
      * bytes — `row_key`/`key` is `BinaryType` end-to-end and key order
      * is memcmp (`BinaryRawKeyOperator`,
      * src/leveldb/include/leveldb/raw_key_operator.h:27-29), which is
      * exactly Spark's unsigned-lexicographic `BinaryType` ordering.
      * The readable default keeps `StringType` keys (SURVEY §1.5).
      * Mutually exclusive with [[hashKeys]] (the reference hashes
      * readable keys; a hex prefix over raw bytes is a different key
      * space). */
    rawKeyBinary: Boolean = false) {
  def spec(cf: String): CfSpec = cfs.getOrElse(cf, default)

  /** The LG a cf's cells live in. */
  def lgOf(cf: String): String = lgs.getOrElse(cf, TableDesc.DefaultLg)
}

object TableDesc {
  /** LG for CFs not named in [[TableDesc.lgs]]. */
  val DefaultLg = "default"
  /** LG holding row-wide tombstones. tera replicates a row-delete into
    * every LG's LevelDB (each compacts independently); one shared
    * always-scanned partition is the Spark-first equivalent — no
    * duplicate tombstone rows to dedupe on multi-LG scans, and
    * compaction here rewrites the whole resolved log anyway. */
  val RowTombstoneLg = "_row"
}

/** One write in a KV-mode table's log.
  *
  * @param key          the KV key
  * @param value        value bytes
  * @param expire_ts_us absolute expiry baked at write time
  *                     (tera src/io/ttlkv_compact_strategy.h:18-49:
  *                     <= 0 never expires, else dead once
  *                     expire_ts_us <= now)
  * @param seq          arrival order, unique; newest write per key wins
  */
case class KvEntry(key: String, value: Array[Byte], expire_ts_us: Long, seq: Long)

object KvEntry {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("expire_ts_us", LongType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Log schema for the table's key mode (see [[CellOp.schemaFor]]). */
  def schemaFor(binaryKey: Boolean): StructType =
    if (!binaryKey) schema
    else StructType(schema.map(f =>
      if (f.name == "key") f.copy(dataType = BinaryType) else f))
}
