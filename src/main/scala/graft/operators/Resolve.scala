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
  * Scale design:
  *  - every windowed step partitions on `row_key` or a superset, so the
  *    whole pipeline costs ONE shuffle plus within-partition sorts;
  *  - the pipeline is ADAPTIVE: each step materializes only if the op
  *    types / schema knobs that require it are present (`opsPresent`,
  *    statically known for engine-written logs). A delete-free,
  *    atomic-free, max_versions=1 table — the reference default
  *    (table_schema.proto:37) and the dominant analytical case —
  *    resolves as a single `max_by` hash aggregation: partial
  *    (map-side) + final, no window sort at all, the cheapest shape
  *    Spark can execute at 100 TB.
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
    * @param opsPresent  the op tags the log may contain, when known
    *                    statically; `None` probes with a cheap
    *                    distinct-scan of the op column. Drives the
    *                    adaptive step elision.
    * @return visible cells (row_key, cf, qualifier, ts, value, seq)
    */
  def resolve(
      log: DataFrame,
      desc: TableDesc = TableDesc(),
      nowUs: Long = Long.MaxValue,
      snapshotSeq: Option[Long] = None,
      opsPresent: Option[Set[Int]] = None,
      useTopKAggregate: Boolean = false,
      deleteStrategy: String = "auto",
      /** Known tombstone count of the log, when carried by a stored
        * table's descriptor — lets "auto" pick its strategy without
        * running a count job. A strategy HINT only: both strategies are
        * exact, so a stale count cannot affect correctness. */
      deleteCountHint: Option[Long] = None): DataFrame = {

    val bounded = snapshotSeq.fold(log)(s => log.where(col("seq") <= s))

    // ad-hoc logs (no declared op-set) probe ONCE for both adaptive
    // inputs — the op tags present AND the tombstone count — instead of
    // a distinct job now and a count job later; stored tables carry
    // both on their descriptor and never reach this
    val (present: Set[Int], probedDelCount: Option[Long]) = opsPresent match {
      case Some(p) => (p, None)
      case None =>
        val row = bounded.agg(
          collect_set(col("op")),
          count(when(col("op").isin(deletes: _*), 1))).collect()(0)
        (row.getSeq[Int](0).toSet, Some(row.getLong(1)))
    }
    val hasAtomic = present.exists(atomics.contains)
    val hasValue = present.contains(Value)

    def cfKnob(f: graft.model.CfSpec => Long): Column =
      desc.cfs.foldLeft(lit(f(desc.default)): Column) { case (acc, (cf, spec)) =>
        when(col("cf") === cf, lit(f(spec))).otherwise(acc)
      }
    val allSpecs = desc.default +: desc.cfs.values.toSeq
    val anyTtl = allSpecs.exists(_.ttlSec > 0)
    val anyMinVersions = allSpecs.exists(_.minVersions > 0)
    val uncapped = allSpecs.forall(_.maxVersions == Int.MaxValue)
    val allSingleVersion = allSpecs.forall(_.maxVersions == 1)

    // --- tombstones ---------------------------------------------------
    // A delete with (ts_d, seq_d) kills data cells in its scope with
    // cell.ts <= ts_d written before it (cell.seq < seq_d). Two
    // physical strategies:
    //  - "window": running max of delete-ts over strictly-later-seq ops,
    //    one ordered window pass per delete granularity present, all
    //    sharing the row_key exchange. Robust for ANY delete density
    //    (O((n+m) log) via sort, spills like any sort).
    //  - "join": collect the (few) tombstones per scope into arrays and
    //    left-join them to the data cells — no sort at all; the dels
    //    side is usually broadcast-sized. Wins when deletes are sparse,
    //    which is the realistic shape of a mutation log.
    // "auto" counts the deletes (a pushed-filter scan of the op column)
    // and picks join only when the tombstone side is broadcast-sized —
    // then every per-granularity join is a broadcast and the data side
    // never re-sorts or re-shuffles for deletes at all.
    val presentDels = deletes.filter(present.contains)
    val keepData = col("op").isin(dataOps.filter(present.contains): _*)

    val strategy =
      if (presentDels.isEmpty) "none"
      else deleteStrategy match {
        case "auto" =>
          // the probe's count is EXACT and already paid for — a stored
          // hint (possibly stale) only decides when no probe ran
          val n = probedDelCount.orElse(deleteCountHint).getOrElse(
            bounded.where(col("op").isin(presentDels: _*)).count())
          if (n <= 100000L) "join" else "window"
        case s => s
      }

    val alive = strategy match {
      case "none" => bounded.where(keepData)

      case "join" =>
        var cur = bounded.where(keepData)
        def applyDel(tag: Int, scope: Seq[String], tsScoped: Boolean): Unit =
          if (present.contains(tag)) {
            val dname = s"_dels_$tag"
            val dels = bounded.where(col("op") === tag)
              .groupBy(scope.map(col): _*)
              .agg(collect_list(struct(col("seq").as("dseq"),
                col("ts").as("dts"))).as(dname))
            val killed = exists(col(dname), d =>
              d.getField("dseq") > col("seq") &&
                (if (tsScoped) lit(true) else d.getField("dts") >= col("ts")))
            cur = cur.join(dels, scope, "left")
              .where(col(dname).isNull || !killed)
              .drop(dname)
          }
        applyDel(DelRow, Seq("row_key"), tsScoped = false)
        applyDel(DelColumn, Seq("row_key", "cf"), tsScoped = false)
        applyDel(DelQualifiers, Seq("row_key", "cf", "qualifier"), tsScoped = false)
        applyDel(DelQualifier, Seq("row_key", "cf", "qualifier", "ts"), tsScoped = true)
        cur

      case _ =>  // "window"
        val laterOps = Window.orderBy(col("seq").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        def delScope(opTag: Int, parts: Seq[String]): Option[Column] =
          if (!present.contains(opTag)) None
          else Some(coalesce(
            max(when(col("op") === opTag, col("ts")))
              .over(laterOps.partitionBy(parts.map(col): _*)),
            lit(minTs)))
        val delCols: Seq[(String, Column, Column => Column)] = Seq(
          delScope(DelRow, Seq("row_key")).map(("_del_row_ts", _,
            (c: Column) => col("ts") > c)),
          delScope(DelColumn, Seq("row_key", "cf")).map(("_del_cf_ts", _,
            (c: Column) => col("ts") > c)),
          delScope(DelQualifiers, Seq("row_key", "cf", "qualifier"))
            .map(("_del_qual_ts", _, (c: Column) => col("ts") > c)),
          (if (!present.contains(DelQualifier)) None
           else Some(("_del_ver",
            coalesce(
              max(when(col("op") === DelQualifier, lit(1)))
                .over(laterOps.partitionBy(col("row_key"), col("cf"),
                  col("qualifier"), col("ts"))),
              lit(0)),
            (c: Column) => c === 0)))).flatten
        val withDels = delCols.foldLeft(bounded) { case (df, (name, c, _)) =>
          df.withColumn(name, c)
        }
        val pred = delCols.map { case (name, _, test) => test(col(name)) }
          .foldLeft(keepData)(_ && _)
        withDels.where(pred).drop(delCols.map(_._1): _*)
    }

    // --- TTL + min_versions survivors ---------------------------------
    val versionOrder = Window
      .partitionBy(col("row_key"), col("cf"), col("qualifier"))
      .orderBy(col("ts").desc, col("seq").desc)

    val surviving =
      if (!anyTtl) alive
      else {
        val ttlUs = cfKnob(_.ttlSec) * lit(1000000L)
        val fresh = ttlUs === 0L || (col("ts") + ttlUs) > lit(nowUs)
        if (!anyMinVersions) alive.where(fresh)
        else alive
          .withColumn("_vrank0", row_number().over(versionOrder))
          .where(fresh || col("_vrank0") <= cfKnob(_.minVersions.toLong))
          .drop("_vrank0")
      }

    // --- version cap + atomic fold ------------------------------------
    // Columns written only with plain VALUEs keep their newest
    // max_versions versions. Columns touched by atomic ops collapse to a
    // single merged cell: the chronological fold of the surviving ops
    // (VALUE resets the state; ADD/ADDINT64 sum onto it; PUT_IF_ABSENT
    // writes only into emptiness; APPEND concatenates) — the batch
    // equivalent of tera's AtomicMergeStrategy.
    val outCols = Seq("row_key", "cf", "qualifier", "ts", "value", "seq").map(col)

    def cappedPlain(df: DataFrame): DataFrame =
      if (uncapped) df.select(outCols: _*)
      else if (allSingleVersion)
        // max_versions=1 fast path: hash aggregation with map-side
        // partial combine — no window sort (SURVEY §4 optional strategy)
        df.groupBy(col("row_key"), col("cf"), col("qualifier"))
          .agg(max_by(struct(col("ts"), col("seq"), col("value")),
            struct(col("ts"), col("seq"))).as("_c"))
          .select(col("row_key"), col("cf"), col("qualifier"),
            col("_c.ts").as("ts"), col("_c.value").as("value"),
            col("_c.seq").as("seq"))
      else if (useTopKAggregate && allSpecs.forall(_.maxVersions <= 256)) {
        // opt-in bounded top-k aggregate: O(k) buffer in partial AND
        // final stages — no sort of the version history, and the shuffle
        // carries at most k rows per column. Wins when columns hold DEEP
        // histories; for shallow ones the window sort's better constants
        // win (measured at sf0.1), hence opt-in rather than default.
        val kmax = allSpecs.map(_.maxVersions).max
        val topk = org.apache.spark.sql.graft.Shim.column(
          graft.functions.TopKVersions(
            org.apache.spark.sql.graft.Shim.expression(
              struct(col("ts"), col("seq"), col("value"))),
            kmax).toAggregateExpression())
        df.groupBy(col("row_key"), col("cf"), col("qualifier"))
          .agg(topk.as("_vs"))
          .select(col("row_key"), col("cf"), col("qualifier"),
            posexplode(col("_vs")))
          .where(col("pos") < cfKnob(_.maxVersions.toLong))
          .select(col("row_key"), col("cf"), col("qualifier"),
            col("col.ts").as("ts"), col("col.value").as("value"),
            col("col.seq").as("seq"))
      } else df
        .withColumn("_vrank", row_number().over(versionOrder))
        .where(col("_vrank") <= cfKnob(_.maxVersions.toLong))
        .select(outCols: _*)

    // Counter fast paths. NO fold path buffers a column's history: the
    // mixed-op fallback below streams each column's sorted ops (O(1)
    // state), and for the dominant counter shapes the fold is
    // expressible as plain associative aggregation, which Spark
    // executes as a partial (map-side) + final hash aggregate:
    //  - ops ⊆ {Add} (or {AddInt64}): the fold IS the sum of the decoded
    //    operands — no sort, no window, no history buffer;
    //  - ops ⊆ {Value, Add}: a VALUE resets the fold, so the result is the
    //    newest VALUE (by (ts, seq), the fold order) plus the sum of ADDs
    //    after it. One partition-only window (sorts by the grouping key,
    //    spills like any sort, never buffers a column in memory) finds the
    //    newest-VALUE bound; a hash aggregate does the rest.
    def pureSum(df: DataFrame, dec: Column => Column, enc: Column => Column): DataFrame =
      df.groupBy(col("row_key"), col("cf"), col("qualifier"))
        .agg(max(col("ts")).as("ts"),
          enc(sum(dec(col("value")))).as("value"),
          max(col("seq")).as("seq"))
        .select(outCols: _*)

    def seededSum(df: DataFrame, addOp: Int,
        dec: Column => Column, enc: Column => Column): DataFrame = {
      val colWin = Window.partitionBy(col("row_key"), col("cf"), col("qualifier"))
      val tsSeq = struct(col("ts"), col("seq"))
      val isVal = col("op") === Value
      df
        .withColumn("_vmax", max(when(isVal, tsSeq)).over(colWin))
        .withColumn("_mts", max(col("ts")).over(colWin))
        .withColumn("_mseq", max(col("seq")).over(colWin))
        // keep the newest VALUE and the ADDs after it (fold order (ts, seq))
        .where((isVal && tsSeq === col("_vmax")) ||
          (col("op") === addOp && (col("_vmax").isNull || tsSeq > col("_vmax"))))
        .groupBy(col("row_key"), col("cf"), col("qualifier"))
        .agg(
          max(col("_mts")).as("ts"),
          max(when(isVal, col("value"))).as("_seed"),
          sum(when(col("op") === addOp, dec(col("value")))).as("_dsum"),
          count(when(col("op") === addOp, lit(1))).as("_nadds"),
          max(col("_mseq")).as("seq"))
        // no trailing ADDs → the newest VALUE's bytes pass through verbatim
        // (exactly the general fold's behavior, even for non-canonical bytes)
        .withColumn("value", when(col("_nadds") === 0, col("_seed"))
          .otherwise(enc(coalesce(dec(col("_seed")), lit(0L)) + col("_dsum"))))
        .select(outCols: _*)
    }

    def folded(df: DataFrame, ops: Set[Int]): DataFrame =
      if (ops.subsetOf(Set(Add))) pureSum(df, be64_decode, be64_encode)
      else if (ops.subsetOf(Set(AddInt64))) pureSum(df, le64_decode, le64_encode)
      else if (ops.subsetOf(Set(Value, Add)))
        seededSum(df, Add, be64_decode, be64_encode)
      else if (ops.subsetOf(Set(Value, AddInt64)))
        seededSum(df, AddInt64, le64_decode, le64_encode)
      else {
        // genuinely mixed columns (PutIfAbsent/Append/both Add kinds):
        // a STREAMING fold over each column's (ts, seq)-sorted iterator
        // — O(1) state per column, like the reference's scan-loop merge
        // (tera src/io/atomic_merge_strategy.cc:36-103), where the
        // previous collect_list fold buffered the whole history in one
        // aggregation buffer (an OOM on a hot column with millions of
        // ops between compactions). groupByKey plans a clustered
        // distribution — a bucketed table satisfies it straight from
        // the scan (zero shuffle) — and the per-group sort is a
        // spillable SortExec, never an in-memory array.
        val session = df.sparkSession
        import session.implicits._
        import graft.functions.Codecs
        // the streamed fold body, shared by both key types; mirrors
        // foldMerge's expression semantics exactly, incl. null operands
        // (a null Add/Append operand nulls the state — expression
        // arithmetic/concat propagate null; a poison cell must not kill
        // the scan). Input tuples are (ts, op, value, seq).
        def foldColumn(it: Iterator[(Long, Int, Array[Byte], Long)])
            : (Long, Array[Byte], Long) = {
          var maxTs = Long.MinValue
          var maxSeq = Long.MinValue
          var state: Array[Byte] = null
          it.foreach { case (ts, op, v, seq) =>
            if (ts > maxTs) maxTs = ts
            if (seq > maxSeq) maxSeq = seq
            op match {
              case Value => state = v
              case Add => state = if (v == null) null
                else Codecs.encodeBE64(
                  (if (state == null) 0L else Codecs.decodeBE64(state)) +
                    Codecs.decodeBE64(v))
              case AddInt64 => state = if (v == null) null
                else Codecs.encodeLE64(
                  (if (state == null) 0L else Codecs.decodeLE64(state)) +
                    Codecs.decodeLE64(v))
              case PutIfAbsent => if (state == null) state = v
              case Append => state = if (v == null) null
                else (if (state == null) Array.emptyByteArray else state) ++ v
              case _ => ()
            }
          }
          (maxTs, state, maxSeq)
        }
        // grouping COLUMNS, not a key lambda: an opaque groupByKey key
        // is an appended attribute EnsureRequirements cannot equate
        // with row_key, which would force the shuffle back in.
        // op and value extend the sort key past (ts, seq): seq eras are
        // claimed via unsynchronized read-then-write (nextSeqEra), so
        // two cells CAN share (ts, seq) — the full-struct key keeps the
        // fold order total and deterministic, like the old whole-struct
        // collect_list sort did.
        // Keyed by the log's ACTUAL key type: a Dataset encoder over
        // String would silently up-cast a binary raw key, replacing
        // invalid-UTF-8 bytes and collapsing distinct keys.
        val selected = df.select(col("row_key"), col("cf"), col("qualifier"),
          col("ts"), col("op"), col("value"), col("seq"))
        val sortKeys = Seq(col("ts"), col("seq"), col("op"), col("value"))
        val grouped = selected.groupBy(col("row_key"), col("cf"), col("qualifier"))
        val result =
          if (df.schema("row_key").dataType ==
              org.apache.spark.sql.types.BinaryType)
            grouped
              .as[(Array[Byte], String, String),
                (Array[Byte], String, String, Long, Int, Array[Byte], Long)]
              .flatMapSortedGroups(sortKeys: _*) { case ((rk, cfn, q), it) =>
                val (ts, v, seq) = foldColumn(it.map(r => (r._4, r._5, r._6, r._7)))
                Iterator((rk, cfn, q, ts, v, seq))
              }
              .toDF("row_key", "cf", "qualifier", "ts", "value", "seq")
          else
            grouped
              .as[(String, String, String),
                (String, String, String, Long, Int, Array[Byte], Long)]
              .flatMapSortedGroups(sortKeys: _*) { case ((rk, cfn, q), it) =>
                val (ts, v, seq) = foldColumn(it.map(r => (r._4, r._5, r._6, r._7)))
                Iterator((rk, cfn, q, ts, v, seq))
              }
              .toDF("row_key", "cf", "qualifier", "ts", "value", "seq")
        result.select(outCols: _*)
      }

    val presentData = present.intersect(dataOps.toSet)
    if (!hasAtomic) cappedPlain(surviving)
    else if (!hasValue) folded(surviving, presentData)
    else {
      // mixed log: split per column by whether atomic ops touched it
      val marked = surviving.withColumn("_has_atomic",
        max(when(col("op").isin(atomics.filter(present.contains): _*), 1).otherwise(0))
          .over(Window.partitionBy(col("row_key"), col("cf"), col("qualifier"))))
      cappedPlain(marked.where(col("_has_atomic") === 0).drop("_has_atomic"))
        .unionAll(folded(marked.where(col("_has_atomic") === 1).drop("_has_atomic"),
          presentData))
    }
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
