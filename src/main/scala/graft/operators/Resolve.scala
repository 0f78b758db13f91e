package graft.operators

import graft.functions.cellfunctions._
import graft.model.{OpType, TableDesc}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The resolve pipeline — the engine's core bespoke operator.
  *
  * Turns the append-only tagged cell log into the visible cells a reader
  * observes, reproducing the reference's lazy merge-on-read semantics
  * (tera folds the mutation log at scan/compaction time:
  * DefaultCompactStrategy::ScanDrop / ScanMergedValue,
  * src/io/default_compact_strategy.cc:59-330 and
  * src/io/atomic_merge_strategy.cc:36-103).
  *
  * Pipeline order matches the reference scan loop
  * (src/io/tablet_io.cc:939-1137): snapshot bound → tombstones → TTL
  * (with min_versions survivors) → version cap → atomic-op fold.
  *
  * Scale design: every step is a window over partitions keyed on
  * `row_key` (or a superset). Spark hash-partitions once on `row_key`;
  * the finer-keyed windows reuse that exchange (HashPartitioning on a
  * subset of the cluster keys satisfies the ClusteredDistribution
  * requirement), so the whole pipeline costs ONE shuffle plus
  * within-partition sorts — no per-step reshuffle, no driver-side state.
  */
object Resolve {
  import OpType._

  private val minTs = Long.MinValue

  /** Resolve the visible versioned cells of a cell log.
    *
    * @param log         DataFrame with [[graft.model.CellOp]] schema;
    *                    `seq` must be unique within the log
    * @param desc        per-CF max/min versions and TTL
    * @param nowUs       "current time" for TTL expiry — an explicit
    *                    parameter, never wall-clock, for determinism
    * @param snapshotSeq time-travel bound: only ops with seq <= snapshot
    *                    are visible (tera snapshot reads bound the
    *                    LevelDB sequence, src/io/tablet_io.cc:2331-2345)
    * @return visible cells (row_key, cf, qualifier, ts, value, seq)
    */
  def resolve(
      log: DataFrame,
      desc: TableDesc = TableDesc(),
      nowUs: Long = Long.MaxValue,
      snapshotSeq: Option[Long] = None): DataFrame = {

    val bounded = snapshotSeq.fold(log)(s => log.where(col("seq") <= s))

    // --- tombstones ---------------------------------------------------
    // A delete with (ts_d, seq_d) kills data cells in its scope with
    // cell.ts <= ts_d written before it (cell.seq < seq_d). Running max
    // of delete-ts over strictly-later-seq ops gives, per data cell, the
    // strongest tombstone that can apply — one ordered window pass per
    // delete granularity, all sharing the row_key exchange.
    val laterOps = Window.orderBy(col("seq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRow  = laterOps.partitionBy(col("row_key"))
    val wCf   = laterOps.partitionBy(col("row_key"), col("cf"))
    val wQual = laterOps.partitionBy(col("row_key"), col("cf"), col("qualifier"))
    val wVer  = laterOps.partitionBy(col("row_key"), col("cf"), col("qualifier"), col("ts"))

    def delTs(opTag: Int, w: org.apache.spark.sql.expressions.WindowSpec): Column =
      coalesce(max(when(col("op") === opTag, col("ts"))).over(w), lit(minTs))

    val withDels = bounded
      .withColumn("_del_row_ts", delTs(DelRow, wRow))
      .withColumn("_del_cf_ts", delTs(DelColumn, wCf))
      .withColumn("_del_qual_ts", delTs(DelQualifiers, wQual))
      .withColumn("_del_ver",
        coalesce(max(when(col("op") === DelQualifier, lit(1))).over(wVer), lit(0)))

    val alive = withDels
      .where(col("op").isin(dataOps: _*) &&
        col("ts") > col("_del_row_ts") &&
        col("ts") > col("_del_cf_ts") &&
        col("ts") > col("_del_qual_ts") &&
        col("_del_ver") === 0)
      .drop("_del_row_ts", "_del_cf_ts", "_del_qual_ts", "_del_ver")

    // --- TTL + version caps -------------------------------------------
    // Per-CF knobs become a tiny when-chain (the CF set is schema-scale,
    // not data-scale). min_versions newest cells survive expiry; after
    // the TTL drop, the newest max_versions remain.
    def cfKnob(f: graft.model.CfSpec => Long): Column =
      desc.cfs.foldLeft(lit(f(desc.default)): Column) { case (acc, (cf, spec)) =>
        when(col("cf") === cf, lit(f(spec))).otherwise(acc)
      }

    val versionOrder = Window
      .partitionBy(col("row_key"), col("cf"), col("qualifier"))
      .orderBy(col("ts").desc, col("seq").desc)

    val ttlUs = cfKnob(_.ttlSec) * lit(1000000L)
    val surviving = alive
      .withColumn("_vrank0", row_number().over(versionOrder))
      .where(ttlUs === 0L || (col("ts") + ttlUs) > lit(nowUs) ||
        col("_vrank0") <= cfKnob(_.minVersions.toLong))
      .drop("_vrank0")

    val capped = surviving
      .withColumn("_vrank", row_number().over(versionOrder))
      .withColumn("_has_atomic",
        max(when(col("op").isin(atomics: _*), 1).otherwise(0))
          .over(Window.partitionBy(col("row_key"), col("cf"), col("qualifier"))))

    // --- atomic fold --------------------------------------------------
    // Columns written only with plain VALUEs keep their newest
    // max_versions versions. Columns touched by atomic ops collapse to a
    // single merged cell: the chronological fold of the surviving ops
    // (VALUE resets the state; ADD/ADDINT64 sum onto it; PUT_IF_ABSENT
    // writes only into emptiness; APPEND concatenates) — the batch
    // equivalent of tera's AtomicMergeStrategy.
    val plain = capped
      .where(col("_has_atomic") === 0 && col("_vrank") <= cfKnob(_.maxVersions.toLong))
      .select("row_key", "cf", "qualifier", "ts", "value", "seq")

    val foldMerge = (s: Column, x: Column) =>
      when(x.getField("op") === Value, x.getField("value"))
        .when(x.getField("op") === Add,
          be64_encode(coalesce(be64_decode(s), lit(0L)) + be64_decode(x.getField("value"))))
        .when(x.getField("op") === AddInt64,
          le64_encode(coalesce(le64_decode(s), lit(0L)) + le64_decode(x.getField("value"))))
        .when(x.getField("op") === PutIfAbsent, coalesce(s, x.getField("value")))
        .when(x.getField("op") === Append,
          concat(coalesce(s, lit(Array.emptyByteArray)), x.getField("value")))
        .otherwise(s)

    val folded = capped
      .where(col("_has_atomic") === 1)
      .groupBy(col("row_key"), col("cf"), col("qualifier"))
      .agg(
        max(col("ts")).as("ts"),
        aggregate(
          array_sort(collect_list(struct(col("ts"), col("seq"), col("op"), col("value")))),
          lit(null).cast("binary"),
          foldMerge).as("value"),
        max(col("seq")).as("seq"))
      .select("row_key", "cf", "qualifier", "ts", "value", "seq")

    plain.unionAll(folded)
  }

  /** Wide row view — `RowReader::ToMap` equivalent
    * (tera include/tera/reader.h:52-55):
    * row_key -> map(cf -> map(qualifier -> array of (ts, value) desc)).
    */
  def toWideRows(resolved: DataFrame): DataFrame = {
    val versions = resolved
      .groupBy(col("row_key"), col("cf"), col("qualifier"))
      .agg(reverse(array_sort(collect_list(struct(col("ts"), col("value")))))
        .as("versions"))
    val cfMaps = versions
      .groupBy(col("row_key"), col("cf"))
      .agg(map_from_entries(collect_list(struct(col("qualifier"), col("versions"))))
        .as("quals"))
    cfMaps
      .groupBy(col("row_key"))
      .agg(map_from_entries(collect_list(struct(col("cf"), col("quals")))).as("cells"))
  }
}
