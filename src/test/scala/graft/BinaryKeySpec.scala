package graft

import graft.model.{OpType, TableDesc}
import graft.operators.ScanQuery
import java.nio.file.Files
import java.util.Arrays
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary raw-key mode (tera `RawKey::Binary`, table_schema.proto:10-15):
  * arbitrary-byte row keys, memcmp order (`BinaryRawKeyOperator`,
  * src/leveldb/include/leveldb/raw_key_operator.h:27-29). The mode is
  * only sound because Spark's BinaryType ordering IS memcmp — the first
  * test proves that property on random full-range keys; the rest drive
  * keys containing 0x00 / 0xFF / invalid UTF-8 through the real store.
  */
class BinaryKeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def memcmpLt(a: Array[Byte], b: Array[Byte]): Boolean =
    Arrays.compareUnsigned(a, b) < 0

  test("Spark BinaryType order == memcmp on random full-range keys") {
    val session = spark
    import session.implicits._
    val rng = new scala.util.Random(0xb1)
    // full byte range (0x00-0xFF), lengths 0..12 — prefixes, empty key,
    // and sign-bit bytes all land in the sample
    val keys = Seq.fill(800)(
      Array.fill(rng.nextInt(13))((rng.nextInt(256) - 128).toByte))
    val df = keys.map(Tuple1(_)).toDF("k")

    val sparkSorted = df.orderBy(col("k")).collect().map(_.getAs[Array[Byte]](0))
    val expected = keys.sortWith(memcmpLt)
    sparkSorted.zip(expected).foreach { case (x, y) =>
      assert(Arrays.equals(x, y),
        s"order diverged: spark=${x.mkString(",")} memcmp=${y.mkString(",")}")
    }

    // range predicate agrees with driver-side memcmp too (the scan-bound
    // comparison path, not just the sort path)
    val lo = Array[Byte](0x20, 0x80.toByte)
    val hi = Array[Byte](0x60, 0x00)
    val got = df.where(col("k") >= lit(lo) && col("k") < lit(hi)).count()
    val want = keys.count(k =>
      Arrays.compareUnsigned(k, lo) >= 0 && Arrays.compareUnsigned(k, hi) < 0)
    assert(got == want)
  }

  /** Keys deliberately hostile to a string path: NULs, 0xFF, lone
    * continuation bytes (invalid UTF-8), and a prefix pair. */
  private val k1 = Array[Byte](0x00, 0x41, 0xFF.toByte)
  private val k2 = Array[Byte](0x00, 0x41, 0xFF.toByte, 0x00)  // k1's successor
  private val k3 = Array[Byte](0x00, 0x41, 0xFF.toByte, 0x61)  // extends k1
  private val k4 = Array[Byte](0x80.toByte, 0x9F.toByte)       // invalid UTF-8

  test("binary cell table: put / scan bounds / point get / compact") {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-binkey").toString
    val t = Graft.createTable(spark, dir, TableDesc(rawKeyBinary = true),
      ops = Some(Set(OpType.Value)))

    val ops = Seq(
      (k1, "cf", "q", 1L, OpType.Value, "v1".getBytes, 1L),
      (k2, "cf", "q", 1L, OpType.Value, "v2".getBytes, 2L),
      (k3, "cf", "q", 1L, OpType.Value, "v3".getBytes, 3L),
      (k4, "cf", "q", 1L, OpType.Value, "v4".getBytes, 4L))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    t.put(ops)

    // the stored descriptor recovers the mode: a fresh open reads
    // BinaryType keys byte-for-byte
    val reopened = Graft.openTable(spark, dir)
    assert(reopened.desc.rawKeyBinary)
    val stored = reopened.log.select("row_key").collect()
      .map(_.getAs[Array[Byte]](0))
    Seq(k1, k2, k3, k4).foreach(k =>
      assert(stored.exists(Arrays.equals(_, k)), s"lost key ${k.mkString(",")}"))

    // point get [k1, k1 ++ 0x00): exactly k1 — NOT its successor k2 and
    // NOT its extension k3 (the reference's exact-row semantics)
    val point = reopened.scan.forRowBin(k1).run()
      .select("row_key", "value").collect()
    assert(point.length == 1 && Arrays.equals(point(0).getAs[Array[Byte]](0), k1))
    assert(new String(point(0).getAs[Array[Byte]](1)) == "v1")

    // binary get() equality twin
    assert(reopened.get(k1).count() == 1)

    // range [k2, k4): holds k2 and k3, excludes k1 (below) and k4 (at stop)
    val ranged = reopened.scan.withStartBin(k2).withStopBin(k4).run()
      .select("row_key").collect().map(_.getAs[Array[Byte]](0))
    assert(ranged.length == 2)
    assert(ranged.exists(Arrays.equals(_, k2)) && ranged.exists(Arrays.equals(_, k3)))

    // compaction round-trips binary keys (desc carries the mode)
    val cdir = Files.createTempDirectory("graft-binkey-c").toString
    reopened.compact(cdir)
    assert(Graft.openTable(spark, cdir).get(k4).count() == 1)
  }

  test("binary KV table, bucketed: put / get / range / compact") {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-binkv").toString
    val kt = Graft.createKvTable(spark, dir, buckets = 4, binaryKeys = true)
    val entries = Seq(
      (k1, "a".getBytes, 0L, 1L),
      (k3, "b".getBytes, 0L, 2L),
      (k4, "c".getBytes, 0L, 3L),
      (k4, "c2".getBytes, 0L, 4L))  // rewrite: newest seq wins
      .toDF("key", "value", "expire_ts_us", "seq")
    kt.putEntries(entries)

    val reopened = Graft.openKvTable(spark, dir)
    assert(new String(reopened.get(k4, Long.MaxValue)
      .collect()(0).getAs[Array[Byte]]("value")) == "c2")
    // memcmp range over the bucketed layout
    val inRange = reopened.kvs()
      .where(col("key") >= lit(k1) && col("key") < lit(k4))
      .count()
    assert(inRange == 2)  // k1, k3

    val cdir = Files.createTempDirectory("graft-binkv-c").toString
    reopened.compact(cdir)
    val compacted = Graft.openKvTable(spark, cdir)
    assert(compacted.log.count() == 3)
    assert(new String(compacted.get(k1, Long.MaxValue)
      .collect()(0).getAs[Array[Byte]]("value")) == "a")
  }

  test("binary keys survive the mixed-op streaming fold byte-for-byte") {
    val session = spark
    import session.implicits._
    // Append + PutIfAbsent forces the flatMapSortedGroups fold — the one
    // resolve path with a Dataset encoder on row_key, where a String
    // encoder would U+FFFD-mangle invalid UTF-8 and collapse k1/k4
    val log = Seq(
      (k1, "cf", "q", 1L, OpType.Append, "a".getBytes, 1L),
      (k1, "cf", "q", 2L, OpType.Append, "b".getBytes, 2L),
      (k4, "cf", "q", 1L, OpType.PutIfAbsent, "first".getBytes, 3L),
      (k4, "cf", "q", 2L, OpType.PutIfAbsent, "late".getBytes, 4L))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    val out = graft.operators.Resolve.resolve(log,
        opsPresent = Some(Set(OpType.Append, OpType.PutIfAbsent)))
      .collect().map(r =>
        (r.getAs[Array[Byte]]("row_key"), r.getAs[Array[Byte]]("value")))
    assert(out.length == 2)
    val byKey = out.map { case (k, v) => k.toSeq -> new String(v) }.toMap
    assert(byKey(k1.toSeq) == "ab")
    assert(byKey(k4.toSeq) == "first")
  }

  test("binary mode refusals: hashKeys combo, secondary index, KV string get") {
    val dir = Files.createTempDirectory("graft-binkey-bad").toString
    intercept[IllegalArgumentException] {
      Graft.createTable(spark, dir,
        TableDesc(hashKeys = true, rawKeyBinary = true))
    }
    val okDir = Files.createTempDirectory("graft-binkey-ok").toString
    val t = Graft.createTable(spark, okDir, TableDesc(rawKeyBinary = true))
    intercept[IllegalArgumentException] {
      t.buildIndex(Files.createTempDirectory("graft-binkey-ix").toString,
        "cf", "q")
    }
    // a binary get against a READABLE-key KV table is refused, same as
    // the cell-table twin
    val kvDir = Files.createTempDirectory("graft-binkey-kv-str").toString
    val kvStr = Graft.createKvTable(spark, kvDir)
    intercept[IllegalArgumentException] {
      kvStr.get(k1, Long.MaxValue)
    }
    // the raw-key mode cannot flip under stored data: the files are
    // physically typed
    intercept[IllegalArgumentException] {
      Graft.alterTable(spark, okDir, TableDesc(rawKeyBinary = false))
    }
  }

  test("bare binary log (no descriptor) opens through the fallback desc") {
    val session = spark
    import session.implicits._
    // simulate a hand-imported binary-keyed parquet dir: descriptor-less
    val dir = Files.createTempDirectory("graft-binkey-bare").toString
    Seq((k1, "cf", "q", 1L, OpType.Value, "v".getBytes, 1L))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
      .write.mode("overwrite").parquet(dir)
    val t = Graft.openTable(spark, dir, TableDesc(rawKeyBinary = true))
    val got = t.get(k1).collect()
    assert(got.length == 1 &&
      Arrays.equals(got(0).getAs[Array[Byte]]("row_key"), k1))
  }

  test("percolator 2PC over a binary-raw-key table: commit, dangling-lock cleanup") {
    val session = spark
    import session.implicits._
    import graft.operators.{BatchTxn, PercolatorRead}
    val dir = Files.createTempDirectory("graft-bin-2pc").toString
    val t = Graft.createTable(spark, dir, TableDesc(rawKeyBinary = true))

    // txn1 (primary k1) commits; txn2 (primary k4) crashes after prewrite
    val m1 = Seq((k1, "cf", "q", "a".getBytes), (k3, "cf", "q", "b".getBytes))
      .toDF("row_key", "cf", "qualifier", "value")
    val p1 = BatchTxn.prewrite(t.log, m1, startTs = 10)
    assert(p1.where(col("conflict")).count() == 0)
    t.put(BatchTxn.prewriteOps(p1, 10L, k1, 1L << 40))
    t.put(BatchTxn.commitOps(t.log, startTs = 10, commitTs = 20, 2L << 40))

    val m2 = Seq((k4, "cf", "q", "c".getBytes))
      .toDF("row_key", "cf", "qualifier", "value")
    val p2 = BatchTxn.prewrite(t.log, m2, startTs = 30)
    t.put(BatchTxn.prewriteOps(p2, 30L, k4, 3L << 40))
    // k4's lock dangles (no commit); its payload is the raw primary bytes
    val pend = PercolatorRead.pendingLocks(t.log, Long.MaxValue).collect()
    assert(pend.length == 1 &&
      Arrays.equals(pend(0).getAs[Array[Byte]]("primary"), k4))

    // one-pass cleanup decides per lock: no commit pointer on k4 → back
    t.putStored(BatchTxn.resolveLockOps(t.log, 4L << 40))
    assert(PercolatorRead.pendingLocks(t.log, Long.MaxValue).count() == 0)
    val vis = PercolatorRead.resolve(t.log, snapshotTs = Long.MaxValue)
      .collect().map(r => r.getAs[Array[Byte]]("row_key").toSeq).toSet
    assert(vis == Set(k1.toSeq, k3.toSeq))
  }

  test("pagination: withResumeAfter literal == afterPage plan-side bound") {
    val session = spark
    import session.implicits._
    val log = (1 to 50).map(i =>
      (f"k$i%03d", "cf", "q", 1L, OpType.Value, s"v$i".getBytes, i.toLong))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    val q = ScanQuery(log, opsPresent = Some(Set(OpType.Value)))

    val page1 = q.withLimit(10).run()
    val last = page1.agg(max(col("row_key"))).collect()(0).getString(0)
    assert(last == "k010")

    val viaLiteral = q.withResumeAfter(last).withLimit(10).run()
      .select("row_key").collect().map(_.getString(0))
    val viaPage = q.afterPage(page1).withLimit(10).run()
      .select("row_key").collect().map(_.getString(0))
    assert(viaLiteral.toSeq == (11 to 20).map(i => f"k$i%03d"))
    assert(viaPage.toSeq == viaLiteral.toSeq)

    // an empty previous page = nothing consumed: scan runs from the start
    val fromStart = q.afterPage(page1.limit(0)).withLimit(5).run()
      .select("row_key").collect().map(_.getString(0))
    assert(fromStart.toSeq == (1 to 5).map(i => f"k$i%03d"))

    // cell-granular afterPage: a page limit that splits a multi-cell
    // row must not lose the row's remaining cells (withResumeAfter is
    // row-granular by contract; afterPage is the safe general form)
    val wide = (1 to 5).flatMap(i => Seq("q1", "q2", "q3").map(qn =>
      (f"w$i%02d", "cf", qn, 1L, OpType.Value, "v".getBytes,
        (i * 10 + qn.last - '0').toLong)))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    val wq = ScanQuery(wide, opsPresent = Some(Set(OpType.Value)))
    val wp1 = wq.withLimit(2).run()   // (w01,q1),(w01,q2) — row w01 split
    val wp2 = wq.afterPage(wp1).withLimit(2).run()
      .select("row_key", "qualifier").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(wp2.toSeq == Seq(("w01", "q3"), ("w02", "q1")))
    // and stitched pages reproduce the full scan with nothing dropped
    val all = Iterator.iterate(
      (wq.withLimit(7).run(), Seq.empty[(String, String)])) { case (page, acc) =>
        (wq.afterPage(page).withLimit(7).run(),
          acc ++ page.select("row_key", "qualifier").collect()
            .map(r => (r.getString(0), r.getString(1))))
      }.drop(3).next()._2
    assert(all == wq.run().select("row_key", "qualifier").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq)

    // binary resume twin
    val binLog = Seq(k1, k2, k3, k4).zipWithIndex.map { case (k, i) =>
      (k, "cf", "q", 1L, OpType.Value, "v".getBytes, i.toLong) }
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    val after = ScanQuery(binLog, opsPresent = Some(Set(OpType.Value)))
      .withResumeAfterBin(k2).run()
      .select("row_key").collect().map(_.getAs[Array[Byte]](0))
    assert(after.length == 2)  // k3, k4 strictly after k2
    assert(Arrays.equals(after(0), k3) && Arrays.equals(after(1), k4))
  }

  test("maxQualifiers across an afterPage boundary: reference-parity restart") {
    val session = spark
    import session.implicits._
    // tera's sync-scan resume reconstructs version_num but NOT qu_num
    // (tablet_io.cc:1034-1046 vs :1063-1070): a page boundary inside a
    // row restarts QUALIFIER counting on the remaining cells, while the
    // VERSION cap stays exact. Same here, by construction.
    val log = Seq("q1", "q2", "q3", "q4").zipWithIndex.map { case (qn, i) =>
      ("w01", "cf", qn, 1L, OpType.Value, "v".getBytes, i.toLong) }
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    val q = ScanQuery(log, opsPresent = Some(Set(OpType.Value)))
      .withMaxQualifiers(2)
    // unpaged: cap exact
    assert(q.run().select("qualifier").collect().map(_.getString(0)).toSeq
      == Seq("q1", "q2"))
    // page boundary inside the row: counting restarts after the cut, so
    // the stitched pages over-deliver (q1 + q2,q3) — documented parity
    val p1 = q.withLimit(1).run()
    assert(p1.select("qualifier").collect().map(_.getString(0)).toSeq
      == Seq("q1"))
    assert(q.afterPage(p1).run()
      .select("qualifier").collect().map(_.getString(0)).toSeq
      == Seq("q2", "q3"))

    // maxVersions does NOT over-deliver: the boundary row resolves in
    // full before the cell cut, so the version cap sees every version
    val vlog = (1 to 5).map(ts =>
      ("r", "cf", "q", ts.toLong, OpType.Value, s"v$ts".getBytes, ts.toLong))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    val vq = ScanQuery(vlog,
      desc = TableDesc(default = graft.model.CfSpec(maxVersions = 2)),
      opsPresent = Some(Set(OpType.Value)))
    assert(vq.run().select("ts").collect().map(_.getLong(0)).toSeq
      == Seq(5L, 4L))
    val vp1 = vq.withLimit(1).run()
    assert(vp1.select("ts").collect().map(_.getLong(0)).toSeq == Seq(5L))
    // second page delivers ONLY ts=4 — versions never exceed the cap
    assert(vq.afterPage(vp1).run()
      .select("ts").collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("unordered scan: same row set, no global sort") {
    val session = spark
    import session.implicits._
    val log = (1 to 100).map(i =>
      (f"k$i%03d", "cf", "q", 1L, OpType.Value, s"v$i".getBytes, i.toLong))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    val q = ScanQuery(log, opsPresent = Some(Set(OpType.Value)))
    val ordered = q.run().select("row_key").collect().map(_.getString(0))
    val unordered = q.unordered.run().select("row_key").collect().map(_.getString(0))
    assert(unordered.sorted.toSeq == ordered.toSeq)
  }
}
