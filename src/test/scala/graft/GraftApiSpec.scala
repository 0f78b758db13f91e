package graft

import graft.functions.Codecs
import graft.model.{CellOp, OpType}
import graft.operators.{ScanFilter, TypedValue}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end SDK surface: open table, put mutations, scan/get,
  * snapshot, compact, SQL façade — the reference user's workflow.
  */
class GraftApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("put / get / delete / counter / scan / snapshot lifecycle") {
    val dir = Files.createTempDirectory("graft-table").toString
    val t = Graft.openTable(spark, dir)

    // batch 1: two rows, a counter, then batch 2: overwrite + delete
    t.put(Seq(
      CellOp("alice", "prof", "name", 100, OpType.Value, "Alice".getBytes, 1),
      CellOp("alice", "stats", "visits", 100, OpType.Add, Codecs.encodeBE64(1), 2),
      CellOp("bob", "prof", "name", 100, OpType.Value, "Bob".getBytes, 3)))
    t.put(Seq(
      CellOp("alice", "stats", "visits", 200, OpType.Add, Codecs.encodeBE64(4), 4),
      CellOp("bob", "prof", "name", 150, OpType.DelQualifiers, null, 5)))

    // get: alice has name + folded counter 5
    val alice = t.get("alice").collect()
      .map(r => (r.getString(2), r.getAs[Array[Byte]]("value"))).toMap
    assert(new String(alice("name")) == "Alice")
    assert(Codecs.decodeBE64(alice("visits")) == 5L)
    // bob's name deleted
    assert(t.get("bob").count() == 0)

    // scan with a typed filter on the counter
    val rows = t.scan
      .withFilter(ScanFilter.ValueFilter("stats", "visits", ">=",
        TypedValue.Int64BE(5L), filterIfMissing = true))
      .run().select("row_key").distinct().collect().map(_.getString(0)).toSet
    assert(rows == Set("alice"))

    // snapshot before the delete still sees bob
    val snap = t.snapshot(4).where(col("row_key") === "bob").count()
    assert(snap == 1)

    // compaction keeps exactly the live cells
    val cdir = Files.createTempDirectory("graft-compact").toString
    t.compact(cdir)
    val compacted = Graft.openTable(spark, cdir)
    assert(compacted.log.count() == 2)
    assert(Codecs.decodeBE64(
      compacted.get("alice").where(col("qualifier") === "visits")
        .collect()(0).getAs[Array[Byte]]("value")) == 5L)
  }

  test("bucketed layout: shuffle-free resolve, pruned point get, reopen") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bkt").toString
    val desc = model.TableDesc(buckets = 8)
    val t = Graft.createTable(spark, dir, desc,
      ops = Some(Set(OpType.Value, OpType.Add, OpType.DelQualifiers)))
    t.put(Seq(
      CellOp("alice", "prof", "name", 100, OpType.Value, "Alice".getBytes, 1),
      CellOp("alice", "stats", "visits", 100, OpType.Add, Codecs.encodeBE64(1), 2),
      CellOp("bob", "prof", "name", 100, OpType.Value, "Bob".getBytes, 3)))
    t.put(Seq(
      CellOp("alice", "stats", "visits", 200, OpType.Add, Codecs.encodeBE64(4), 4),
      CellOp("bob", "prof", "name", 150, OpType.DelQualifiers, null, 5)))

    // same answers as the flat layout
    val alice = t.get("alice").collect()
      .map(r => (r.getString(2), r.getAs[Array[Byte]]("value"))).toMap
    assert(new String(alice("name")) == "Alice")
    assert(Codecs.decodeBE64(alice("visits")) == 5L)
    assert(t.get("bob").count() == 0)

    // the layout's point: the scan reports HashPartitioning(row_key), so
    // the whole resolve pipeline plans WITHOUT a hash exchange...
    val plan = t.cells().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // ...and a point get prunes to a single bucket's files
    val gplan = t.get("alice").queryExecution.executedPlan.toString
    assert(gplan.contains("SelectedBucketsCount: 1 out of 8"), gplan)

    // fresh-session reopen: the catalog entry is gone, the descriptor
    // re-registers the bucket spec, answers and plan shape survive
    spark.sql(s"DROP TABLE ${graft.sources.CellLogStore.catalogName(dir)}")
    val re = Graft.openTable(spark, dir)
    assert(re.desc.buckets == 8)
    assert(Codecs.decodeBE64(re.get("alice").where(col("qualifier") === "visits")
      .collect()(0).getAs[Array[Byte]]("value")) == 5L)
    assert(!re.cells().queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))

    // compaction carries the bucketed layout to the output table
    val cdir = Files.createTempDirectory("graft-bkt-compact").toString
    re.compact(cdir)
    val c = Graft.openTable(spark, cdir)
    assert(c.desc.buckets == 8)
    assert(c.log.count() == 2)

    // physical-layout guards: no bucket change under data, no LG mix
    intercept[IllegalArgumentException] {
      Graft.alterTable(spark, cdir, c.desc.copy(buckets = 4))
    }
    intercept[IllegalArgumentException] {
      Graft.createTable(spark, Files.createTempDirectory("graft-bad").toString,
        model.TableDesc(buckets = 4, lgs = Map("a" -> "hot")))
    }
    // layout-mismatch appends are refused BEFORE any file lands: a flat
    // (default-desc) write into this bucketed log would poison every
    // later catalog read with INVALID_BUCKET_FILE
    val stray = Seq(CellOp("x", "cf", "q", 1, OpType.Value, null, 99)).toDF()
    intercept[IllegalArgumentException] {
      graft.sources.CellLogStore.append(stray, dir)
    }
    intercept[IllegalArgumentException] {   // wrong bucket count, same hazard
      graft.sources.CellLogStore.append(stray, dir,
        desc = model.TableDesc(buckets = 4))
    }
    // a stale catalog entry (table re-created at this path with another
    // bucket count) loses to the descriptor: reads re-register
    spark.sql(s"DROP TABLE ${graft.sources.CellLogStore.catalogName(cdir)}")
    spark.sql(
      s"""CREATE TABLE ${graft.sources.CellLogStore.catalogName(cdir)}
         |(row_key STRING, cf STRING, qualifier STRING, ts BIGINT, op INT,
         | value BINARY, seq BIGINT) USING parquet
         |CLUSTERED BY (row_key) INTO 2 BUCKETS LOCATION '$cdir'""".stripMargin)
    assert(Codecs.decodeBE64(
      Graft.openTable(spark, cdir).get("alice")
        .where(col("qualifier") === "visits")
        .collect()(0).getAs[Array[Byte]]("value")) == 5L)
  }

  test("bucketed catalog: location with a quote registers intact") {
    // the registration DDL inlines the path into a SQL string literal;
    // Spark's lexer is backslash-style, so ' escapes as \' (doubling
    // would tokenize as two adjacent strings -> parse error) and \ as
    // \\. Only the quote is driven end-to-end here: a backslash in a
    // directory NAME dies upstream of the DDL (Hadoop's glob layer
    // treats \ as its own escape during LOCATION resolution), so the
    // \\ escaping matters for paths that embed literal \t-style
    // sequences, which the lexer would otherwise unescape.
    val dir = Files.createTempDirectory("graft-esc").toString + "/o'brien"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val t = Graft.createTable(spark, dir, model.TableDesc(buckets = 4),
      ops = Some(Set(OpType.Value)))
    t.put(Seq(CellOp("alice", "cf", "q", 100, OpType.Value, "x".getBytes, 1)))
    // the catalog read resolves files at the REAL location
    val got = t.get("alice").collect()
    assert(got.length == 1 &&
      new String(got(0).getAs[Array[Byte]]("value")) == "x")
    assert(t.get("alice").queryExecution.executedPlan.toString
      .contains("SelectedBucketsCount: 1 out of 4"))
  }

  test("hash-sharded table lifecycle: put / get / point scan round-trip") {
    import graft.model.TableDesc
    val dir = Files.createTempDirectory("graft-hash").toString
    val t = Graft.openTable(spark, dir, TableDesc(hashKeys = true))

    t.put(Seq(
      CellOp("user#1", "cf", "q", 100, OpType.Value, "v1".getBytes, 1),
      CellOp("user#2", "cf", "q", 100, OpType.Value, "v2".getBytes, 2),
      CellOp("user#11", "cf", "q", 100, OpType.Value, "v11".getBytes, 3)))

    // storage keys carry the reference's 16-hex murmur(seed 823) prefix
    val stored = t.log.select("row_key").collect().map(_.getString(0)).toSet
    assert(stored == Set("user#1", "user#2", "user#11").map(Codecs.hashedKey))
    assert(Codecs.hashedKey("user#1").take(16).forall(
      c => c.isDigit || ('a' to 'f').contains(c)))
    assert(Codecs.logicalKey(Codecs.hashedKey("user#1")) == "user#1")

    // point get routes by hashed key; "user#1" must not match "user#11"
    val got = t.get("user#1").collect()
    assert(got.length == 1 && new String(got(0).getAs[Array[Byte]]("value")) == "v1")

    // point scan via forRow: storage-space successor, exactly one row
    val scanned = t.scan.forRow("user#1").run()
      .collect().map(r => new String(r.getAs[Array[Byte]]("value")))
    assert(scanned.toSeq == Seq("v1"))

    // full scan sees all rows, in hashed (storage) order
    val all = t.scan.run().select("row_key").collect().map(_.getString(0))
    assert(all.length == 3 && all.sorted.sameElements(all))
  }

  test("secondary index: build, incremental maintain, stale-entry-safe lookup") {
    val dir = Files.createTempDirectory("graft-ix-base").toString
    val ixDir = Files.createTempDirectory("graft-ix").toString
    val t = Graft.openTable(spark, dir)
    t.put(Seq(
      CellOp("r1", "c", "seg", 100, OpType.Value, "A".getBytes, 1),
      CellOp("r2", "c", "seg", 100, OpType.Value, "B".getBytes, 2),
      CellOp("r3", "c", "seg", 100, OpType.Value, "A".getBytes, 3)))
    val ix = t.buildIndex(ixDir, "c", "seg")

    def keys(v: String): Set[String] =
      t.lookupViaIndex(ix, "c", "seg", v).collect().map(_.getString(0)).toSet
    assert(keys("A") == Set("r1", "r3"))
    assert(keys("B") == Set("r2"))

    // overwrite r1 A->B, maintaining the index like the reference's
    // transactional writers do (new entry appended; old entry left
    // stale — the verify-on-lookup rule makes it harmless)
    val batch = Seq(CellOp("r1", "c", "seg", 200, OpType.Value, "B".getBytes, 4))
    t.put(batch)
    val session = spark
    import session.implicits._
    ix.put(graft.operators.SecondaryIndex.opsForBatch(batch.toDF(), "c", "seg"))
    assert(keys("A") == Set("r3"))          // stale A->r1 entry verified away
    assert(keys("B") == Set("r1", "r2"))

    // base-side delete: index untouched, lookup still correct
    t.put(Seq(CellOp("r3", "c", "seg", 300, OpType.DelQualifiers, null, 5)))
    assert(keys("A") == Set.empty)

    // index entries are range keys: a value prefix is one contiguous scan
    val cand = graft.operators.SecondaryIndex
      .candidatesEq(ix.cells(), "B").collect().map(_.getString(0)).toSet
    assert(cand == Set("r1", "r2"))

    // rebuild IS allowed on an existing index dir, and repairs drift:
    // the stale A->r1 entry disappears from the candidates
    val ix2 = t.buildIndex(ixDir, "c", "seg")
    assert(graft.operators.SecondaryIndex
      .candidatesEq(ix2.cells(), "A").count() == 0)
    assert(keys("B") == Set("r1", "r2"))
  }

  test("locality groups: per-LG layout, row deletes visible to every projection") {
    import graft.model.TableDesc
    val dir = Files.createTempDirectory("graft-lg").toString
    val desc = TableDesc(lgs = Map("prof" -> "hot", "blob" -> "cold"))
    val t = Graft.createTable(spark, dir, desc,
      Some(Set(OpType.Value, OpType.DelRow)))
    t.put(Seq(
      CellOp("r1", "prof", "name", 100, OpType.Value, "n1".getBytes, 1),
      CellOp("r1", "blob", "img", 100, OpType.Value, "b1".getBytes, 2),
      CellOp("r1", "misc", "x", 100, OpType.Value, "m1".getBytes, 3),
      CellOp("r2", "prof", "name", 100, OpType.Value, "n2".getBytes, 4),
      CellOp("r2", "blob", "img", 100, OpType.Value, "b2".getBytes, 5)))

    // physical layout: one parquet partition directory per LG (misc is
    // unlisted, so it lands in the default LG)
    val lgDirs = new java.io.File(dir).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(lgDirs == Set("lg=hot", "lg=cold", "lg=default"))

    // unprojected reads see everything, schema unchanged (no lg column)
    assert(t.scan.run().count() == 5)
    assert(t.log.columns.toSeq == graft.model.CellOp.schema.fieldNames.toSeq)

    // a row-wide delete lands in the shared _row LG...
    t.put(Seq(CellOp("r2", "prof", "", 200, OpType.DelRow, null, 6)))
    assert(new java.io.File(dir, "lg=_row").isDirectory)
    // ...and a scan projected to a DIFFERENT cf still honors it
    val blob = t.scan.addColumnFamily("blob").run()
    assert(blob.select("row_key").collect().map(_.getString(0)).toSet
      == Set("r1"))

    // the pruned source physically reads only its LG dirs + _row:
    // lg=hot and lg=default are pruned at file-listing time (the
    // resolved scan is a self-join, where input_file_name is undefined —
    // PlanSpec asserts the scan-level PartitionFilters)
    val filesRead = graft.sources.CellLogStore
      .readLgs(spark, dir, Some(Seq("cold")))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(filesRead.nonEmpty)
    assert(filesRead.forall(f => f.contains("lg=cold") || f.contains("lg=_row")),
      filesRead.mkString("\n"))

    // descriptor round-trip: a fresh open recovers the LG map
    assert(Graft.openTable(spark, dir).desc == desc)
    // LG mapping is physical: alterTable refuses to change it
    intercept[IllegalArgumentException] {
      Graft.alterTable(spark, dir, desc.copy(lgs = Map("prof" -> "cold")))
    }

    // compaction preserves the LG layout and the resolved content
    val cdir = Files.createTempDirectory("graft-lg-compact").toString
    t.compact(cdir)
    val tc = Graft.openTable(spark, cdir)
    assert(new java.io.File(cdir, "lg=cold").isDirectory)
    assert(tc.scan.addColumnFamily("blob").run()
      .select("row_key").collect().map(_.getString(0)).toSet == Set("r1"))

    // a filter's verdict may need a cf OUTSIDE the projection (P9 order:
    // filter before projection) — its LG must be read too
    val filtered = t.scan.addColumnFamily("blob")
      .withFilter(ScanFilter.ValueFilter("prof", "name", "==",
        TypedValue.Utf8("n1"), filterIfMissing = true))
      .run()
    assert(filtered.collect().map(r =>
      (r.getString(0), r.getString(1))).toSet == Set(("r1", "blob")))
  }

  test("LG descriptor over a not-yet-partitioned log scans correctly") {
    import graft.model.TableDesc
    // a created-but-never-appended LG table has a descriptor declaring
    // LGs but no lg= directories yet; projected scans must fall back to
    // the plain read, not filter every row out on a null lg column
    val dir = Files.createTempDirectory("graft-lg-empty").toString
    val desc = TableDesc(lgs = Map("prof" -> "hot"))
    val t = Graft.createTable(spark, dir, desc, Some(Set(OpType.Value)))
    assert(t.scan.addColumnFamily("prof").run().count() == 0)

    // same mismatch with DATA: a bare unpartitioned import opened with
    // an LG-declaring descriptor still returns its rows
    val bare = Files.createTempDirectory("graft-lg-bare").toString
    val t0 = Graft.createTable(spark, bare, TableDesc(),
      Some(Set(OpType.Value)))
    t0.put(Seq(
      CellOp("r1", "prof", "name", 100, OpType.Value, "n1".getBytes, 1),
      CellOp("r1", "blob", "img", 100, OpType.Value, "b1".getBytes, 2)))
    val viaLgDesc = new GraftTable(spark, bare, desc, Some(Set(OpType.Value)))
    val got = viaLgDesc.scan.addColumnFamily("prof").run()
    assert(got.collect().map(r => (r.getString(0), r.getString(1))).toSet
      == Set(("r1", "prof")))
    // ...but an LG append next to the flat files would leave a
    // mixed-depth layout partition discovery rejects — refused up front
    val ex = intercept[IllegalArgumentException] {
      viaLgDesc.put(Seq(
        CellOp("r2", "prof", "name", 100, OpType.Value, "n2".getBytes, 3)))
    }
    assert(ex.getMessage.contains("locality groups"))
  }

  test("secondary index refuses values containing reserved separator bytes") {
    val session = spark
    import session.implicits._
    // a NUL inside an indexed value would land the composite key inside
    // another value's [v\0, v\1) range — buildOps must fail loudly, not
    // build a silently mis-sorting index
    val bad = Seq(
      CellOp("r1", "c", "seg", 100, OpType.Value, "A\u0000B".getBytes("UTF-8"), 1))
    val ex = intercept[Exception] {
      graft.operators.SecondaryIndex.buildOps(bad.toDF(), "c", "seg").collect()
    }
    assert(ex.getMessage.contains("reserved byte"))
    // clean values still build
    val ok = Seq(CellOp("r1", "c", "seg", 100, OpType.Value, "AB".getBytes, 1))
    assert(graft.operators.SecondaryIndex.buildOps(ok.toDF(), "c", "seg")
      .count() == 1)
  }

  test("replace() records the batch's real delete count in the hint") {
    val session = spark
    import session.implicits._
    import graft.model.TableDesc
    val dir = Files.createTempDirectory("graft-replace-hint").toString
    Graft.createTable(spark, dir)
    val batch = Seq(
      CellOp("r1", "cf", "q", 100, OpType.Value, "a".getBytes, 1),
      CellOp("r2", "cf", "q", 100, OpType.DelRow, null, 2),
      CellOp("r3", "cf", "q", 100, OpType.DelQualifiers, null, 3)).toDF()
    // undeclared op-set: the hint must count the tombstones, not assume 0
    graft.sources.CellLogStore.replace(batch, dir, TableDesc(), None)
    assert(graft.sources.CellLogStore.readDeleteCount(spark, dir) == Some(2L))
    // a declared delete-free op-set skips the count and records 0
    val valueOnly = Seq(
      CellOp("r1", "cf", "q", 100, OpType.Value, "a".getBytes, 1)).toDF()
    graft.sources.CellLogStore.replace(valueOnly, dir, TableDesc(),
      Some(Set(OpType.Value)))
    assert(graft.sources.CellLogStore.readDeleteCount(spark, dir) == Some(0L))
  }

  test("secondary index on a hash-sharded base: incremental ops match storage keys") {
    val dir = Files.createTempDirectory("graft-ix-hash-base").toString
    val ixDir = Files.createTempDirectory("graft-ix-hash").toString
    val t = Graft.createTable(spark, dir,
      graft.model.TableDesc(hashKeys = true))
    t.put(Seq(CellOp("r1", "c", "seg", 100, OpType.Value, "A".getBytes, 1)))
    val ix = t.buildIndex(ixDir, "c", "seg")
    // incremental maintenance must index the STORAGE key, or the verify
    // semi-join can never match it
    val batch = Seq(CellOp("r2", "c", "seg", 100, OpType.Value, "A".getBytes, 2))
    t.put(batch)
    val session = spark
    import session.implicits._
    ix.put(t.indexOpsForBatch(batch.toDF(), "c", "seg"))
    val got = t.lookupViaIndex(ix, "c", "seg", "A")
      .collect().map(_.getString(0)).toSet
    assert(got == Set(t.storageKey("r1"), t.storageKey("r2")))
  }

  test("online schema change: resolve knobs flip on next read, modes refuse") {
    import graft.model.{CfSpec, TableDesc}
    val dir = Files.createTempDirectory("graft-alter").toString
    val t = Graft.createTable(spark, dir, ops = Some(Set(OpType.Value)))
    t.put(Seq(
      CellOp("r", "cf", "q", 100, OpType.Value, "v1".getBytes, 1),
      CellOp("r", "cf", "q", 200, OpType.Value, "v2".getBytes, 2)))
    assert(t.cells().count() == 1)             // default max_versions = 1

    // raise max_versions online: same data, next read sees both versions
    val t2 = Graft.alterTable(spark, dir, TableDesc(CfSpec(maxVersions = 2)))
    assert(t2.cells().count() == 2)
    // and the stored descriptor is authoritative for a fresh open
    assert(Graft.openTable(spark, dir).cells().count() == 2)
    // the delete hint survived the descriptor rewrite
    assert(graft.sources.CellLogStore.readDeleteCount(spark, dir).contains(0L))

    // physical modes refuse to change under stored data
    intercept[IllegalArgumentException] {
      Graft.alterTable(spark, dir, TableDesc(hashKeys = true))
    }
    intercept[IllegalArgumentException] {
      Graft.alterTable(spark, dir, TableDesc(kvMode = true))
    }
  }

  test("stored descriptor survives reopen: TTL/max_versions/hash/ops") {
    import graft.model.{CfSpec, TableDesc}
    val dir = Files.createTempDirectory("graft-desc").toString
    val desc = TableDesc(
      default = CfSpec(maxVersions = 3, minVersions = 1, ttlSec = 86400),
      cfs = Map("meta" -> CfSpec(maxVersions = 1)),
      hashKeys = true)
    val ops = Some(Set(OpType.Value, OpType.Add))
    val t = Graft.createTable(spark, dir, desc, ops)
    t.put(Seq(CellOp("k", "meta", "q", 100, OpType.Value, "v".getBytes, 1)))

    // reopen WITHOUT passing a descriptor: the stored one is recovered,
    // including the op-set (so resolve skips its probe) and hash mode
    val t2 = Graft.openTable(spark, dir)
    assert(t2.desc == desc)
    assert(t2.opsPresent == ops)
    assert(t2.get("k").count() == 1) // hashKeys round-trips through reopen

    // compaction carries the descriptor to the output table, with a
    // VALUE-only op-set (folds/tombstones are physically applied)
    val cdir = Files.createTempDirectory("graft-desc-compact").toString
    t2.compact(cdir)
    val t3 = Graft.openTable(spark, cdir)
    assert(t3.desc == desc)
    assert(t3.opsPresent == Some(Set(OpType.Value)))
  }

  test("stored delete hint: reopened table plans resolve with zero jobs") {
    import graft.model.{CfSpec, TableDesc}
    val dir = Files.createTempDirectory("graft-delhint").toString
    val ops = Some(Set(OpType.Value, OpType.DelRow))
    val t = Graft.createTable(spark, dir,
      TableDesc(CfSpec(maxVersions = Int.MaxValue)), ops)
    t.put(Seq(
      CellOp("r1", "cf", "q", 100, OpType.Value, "a".getBytes, 1),
      CellOp("r2", "cf", "q", 100, OpType.Value, "b".getBytes, 2),
      CellOp("r1", "cf", "q", 100, OpType.DelRow, null, 3)))
    // the write path maintained the count
    assert(graft.sources.CellLogStore.readDeleteCount(spark, dir) == Some(1L))

    // reopen: building the resolve plan runs NO jobs — no op probe (the
    // stored op-set) and no tombstone count (the stored hint)
    val t2 = Graft.openTable(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val df =
      try {
        val planned = t2.cells()
        Thread.sleep(1000) // let listener-bus events drain
        assert(jobs.get() == 0, s"plan construction ran ${jobs.get()} jobs")
        planned
      } finally spark.sparkContext.removeSparkListener(listener)
    // and the plan is still correct: r1 is tombstoned
    assert(df.collect().map(_.getString(0)).toSet == Set("r2"))

    // a table whose descriptor PREDATES the hint must stay hint-less:
    // seeding 0+delta would ignore tombstones already in the log and
    // could steer auto to the join strategy against a window-sized log
    val oldDir = Files.createTempDirectory("graft-delhint-old").toString
    graft.sources.CellLogStore.writeDesc(spark, oldDir,
      TableDesc(CfSpec(maxVersions = Int.MaxValue)), ops)
    val told = Graft.openTable(spark, oldDir)
    told.put(Seq(
      CellOp("r1", "cf", "q", 100, OpType.Value, "a".getBytes, 1),
      CellOp("r1", "cf", "q", 100, OpType.DelRow, null, 2)))
    assert(graft.sources.CellLogStore.readDeleteCount(spark, oldDir).isEmpty)
    assert(told.cells().collect().isEmpty) // fallback count still correct
  }

  test("KV table lifecycle: put / overwrite / expire / compact / reopen") {
    val dir = Files.createTempDirectory("graft-kv").toString
    val t = Graft.createKvTable(spark, dir)

    // write at t=1s: a never expires, b carries a 10s TTL baked as
    // expire_ts_us = 11s
    t.put(Seq(("a", "1".getBytes, 0L), ("b", "2".getBytes, 10L)),
      nowUs = 1000000L)
    // overwrite a at t=2s
    t.put(Seq(("a", "1b".getBytes, 0L)), nowUs = 2000000L)

    def kvSet(tab: GraftKvTable, nowUs: Long): Set[(String, String)] =
      tab.kvs(nowUs).collect()
        .map(r => (r.getString(0), new String(r.getAs[Array[Byte]]("value"))))
        .toSet

    // before b's expiry: newest a + live b; after: b is dead
    assert(kvSet(t, 5000000L) == Set(("a", "1b"), ("b", "2")))
    assert(kvSet(t, 20000000L) == Set(("a", "1b")))
    assert(t.get("a", 5000000L).collect().length == 1)

    // the persisted kv flag guards the open paths
    val reopened = Graft.openKvTable(spark, dir)
    assert(kvSet(reopened, 5000000L) == Set(("a", "1b"), ("b", "2")))
    intercept[IllegalArgumentException](Graft.openTable(spark, dir))
    intercept[IllegalArgumentException](Graft.createKvTable(spark, dir))

    // compact after b died: dead KV and a's superseded write are
    // physically gone; the live KV keeps its (empty) expiry
    val cdir = Files.createTempDirectory("graft-kv-compact").toString
    t.compact(cdir, nowUs = 20000000L)
    val c = Graft.openKvTable(spark, cdir)
    assert(c.log.count() == 1)
    assert(kvSet(c, Long.MaxValue) == Set(("a", "1b")))

    // a TTL'd KV compacted BEFORE its expiry keeps the baked expiry:
    // it still dies later
    t.put(Seq(("c", "3".getBytes, 10L)), nowUs = 20000000L) // expires at 30s
    val cdir2 = Files.createTempDirectory("graft-kv-compact2").toString
    t.compact(cdir2, nowUs = 25000000L)
    val c2 = Graft.openKvTable(spark, cdir2)
    assert(kvSet(c2, 25000000L) == Set(("a", "1b"), ("c", "3")))
    assert(kvSet(c2, 35000000L) == Set(("a", "1b")))
  }

  test("bucketed MIXED-op fold: streaming fold plans without a hash exchange") {
    val dir = Files.createTempDirectory("graft-bkt-mixed").toString
    val t = Graft.createTable(spark, dir, model.TableDesc(buckets = 4),
      ops = Some(Set(OpType.Value, OpType.Append)))
    t.put(Seq(
      CellOp("r1", "cf", "q", 100, OpType.Value, "a".getBytes, 1),
      CellOp("r1", "cf", "q", 200, OpType.Append, "b".getBytes, 2)))
    // the sorted-group fold keys on the real grouping columns, so the
    // bucketed scan's partitioning satisfies it — no exchange (an
    // opaque groupByKey lambda would force the shuffle back in)
    val plan = t.cells().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(new String(t.get("r1").collect()(0)
      .getAs[Array[Byte]]("value")) == "ab")
  }

  test("two bucketed tables co-locate a resolved join: no exchange anywhere") {
    import spark.implicits._
    def mk(rows: Seq[(String, String)]): GraftTable = {
      val dir = Files.createTempDirectory("graft-bkt-join").toString
      val t = Graft.createTable(spark, dir, model.TableDesc(buckets = 4),
        ops = Some(Set(OpType.Value)))
      t.put(rows.zipWithIndex.map { case ((k, v), i) =>
        CellOp(k, "cf", "q", 100, OpType.Value, v.getBytes, i + 1) }.toDF())
      t
    }
    val a = mk(Seq("r1" -> "a1", "r2" -> "a2"))
    val b = mk(Seq("r1" -> "b1", "r3" -> "b3"))
    // broadcast would hide the property (tiny sides broadcast and no
    // hash exchange appears for ANY layout) — force the sort-merge
    // plan so the assert actually exercises bucket co-location
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // same bucket count on both sides: resolve preserves the scan's
      // partitioning, so even the cross-TABLE equi-join needs no shuffle
      // (the reference's tablets cannot co-locate across tables at all)
      val joined = a.cells().select(col("row_key"), col("value").as("va"))
        .join(b.cells().select(col("row_key"), col("value").as("vb")), "row_key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.collect().map(r => r.getString(0)).toSeq == Seq("r1"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucketed KV table: same answers, shuffle-free resolve, layout carries") {
    val dir = Files.createTempDirectory("graft-kv-bkt").toString
    val t = Graft.createKvTable(spark, dir, buckets = 4)
    t.put(Seq(("a", "1".getBytes, 0L), ("b", "2".getBytes, 10L)),
      nowUs = 1000000L)
    t.put(Seq(("a", "1b".getBytes, 0L)), nowUs = 2000000L)

    def kvSet(tab: GraftKvTable, nowUs: Long): Set[(String, String)] =
      tab.kvs(nowUs).collect()
        .map(r => (r.getString(0), new String(r.getAs[Array[Byte]]("value"))))
        .toSet
    assert(kvSet(t, 5000000L) == Set(("a", "1b"), ("b", "2")))
    assert(kvSet(t, 20000000L) == Set(("a", "1b")))

    // the layout's point: per-key max_by plans without a hash exchange,
    // and a point lookup prunes to one of 4 buckets
    val plan = t.kvs(5000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    val gplan = t.get("a", 5000000L).queryExecution.executedPlan.toString
    assert(gplan.contains("SelectedBucketsCount: 1 out of 4"), gplan)

    // fresh-session reopen re-registers from the descriptor
    spark.sql(s"DROP TABLE ${graft.sources.CellLogStore.catalogName(dir)}")
    assert(kvSet(Graft.openKvTable(spark, dir), 5000000L)
      == Set(("a", "1b"), ("b", "2")))

    // compaction carries the bucketed layout
    val cdir = Files.createTempDirectory("graft-kv-bkt-compact").toString
    t.compact(cdir, nowUs = 20000000L)
    val c = Graft.openKvTable(spark, cdir)
    assert(c.log.count() == 1)
    assert(graft.sources.CellLogStore.bucketCount(spark, cdir).contains(4))
    assert(kvSet(c, Long.MaxValue) == Set(("a", "1b")))
  }

  test("relational bulk load round-trips: resolve == source projection") {
    val sfDir = "/root/testdata/sf0.001"
    def cellSet(t: GraftTable): Set[(String, String, String, String)] =
      t.cells().select(col("row_key"), col("cf"), col("qualifier"),
          decode(col("value"), "UTF-8").as("v")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet

    // shape 1: lineitem (dup (orderkey, linenumber) keys in the synthetic
    // data -> aggregate first, the loader's documented contract), two CFs
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(max("l_quantity").as("qty"), max("l_returnflag").as("rf"))
      .withColumn("k", concat_ws(":", col("l_orderkey"), col("l_linenumber")))
    val dir1 = Files.createTempDirectory("graft-load1").toString
    val t1 = Graft.loadRelational(spark, dir1, li, "k",
      Map("m" -> Seq("qty"), "f" -> Seq("rf")))
    val want1 = li.select(col("k"),
        col("qty").cast("string").as("qty"), col("rf")).collect()
      .flatMap(r => Seq((r.getString(0), "m", "qty", r.getString(1)),
        (r.getString(0), "f", "rf", r.getString(2)))).toSet
    assert(cellSet(t1) == want1)
    // the declared VALUE-only op-set survives reopen
    assert(Graft.openTable(spark, dir1).opsPresent
      == Some(Set(graft.model.OpType.Value)))

    // shape 2: nation, one CF, string + int columns
    val nation = graft.sources.Tables.load(spark, sfDir, "nation")
    val dir2 = Files.createTempDirectory("graft-load2").toString
    val t2 = Graft.loadRelational(spark, dir2, nation, "n_nationkey",
      Map("n" -> Seq("n_name", "n_regionkey")))
    val want2 = nation.collect().flatMap(r => Seq(
      (r.getAs[Any]("n_nationkey").toString, "n", "n_name", r.getAs[String]("n_name")),
      (r.getAs[Any]("n_nationkey").toString, "n", "n_regionkey",
        r.getAs[Any]("n_regionkey").toString)))
      .toSet
    assert(cellSet(t2) == want2)
    assert(t2.cells().count() == nation.count() * 2)

    // export direction: cells -> relational, NULL for absent cells,
    // typed values round-trip through their SQL string form
    val back = graft.sources.RelationalLoader.fromCellLog(
        t2.cells(), Map("n" -> Seq("n_name", "n_regionkey")), "n_nationkey")
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val src = nation.select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(back == src)
    // a key with only one CF's columns exports NULLs for the rest
    val sparse = graft.sources.RelationalLoader.fromCellLog(
      t2.cells().where(col("qualifier") === "n_name"),
      Map("n" -> Seq("n_name", "n_regionkey")), "n_nationkey")
    assert(sparse.where(col("n_regionkey").isNull).count() == nation.count())
  }

  test("any Spark source loads as a cell table: CSV round-trip") {
    // the loader is source-agnostic by construction — anything
    // spark.read produces becomes a cell table (terautil-load analogue
    // for arbitrary formats)
    val csvDir = Files.createTempDirectory("graft-csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(csvDir, "in.csv"),
      "id,seg,score\n10,alpha,3\n11,beta,5\n")
    val src = spark.read.option("header", "true").csv(csvDir)
    val dir = Files.createTempDirectory("graft-csv-table").toString
    val t = Graft.loadRelational(spark, dir, src, "id",
      Map("c" -> Seq("seg", "score")))
    val cells = t.cells().collect()
      .map(r => (r.getString(0), r.getString(2),
        new String(r.getAs[Array[Byte]]("value")))).toSet
    assert(cells == Set(
      ("10", "seg", "alpha"), ("10", "score", "3"),
      ("11", "seg", "beta"), ("11", "score", "5")))
  }

  test("sql facade answers over resolved cell views") {
    Graft.registerSqlCatalog(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM events_cells c
        |JOIN customer ON CAST(c_custkey AS STRING) = c.row_key
        |WHERE c.qualifier = 'purchase'""".stripMargin)
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("percolator pending locks surface uncommitted transactions") {
    import spark.implicits._
    val log = Seq(
      // committed column: lock at 10 superseded by commit at 20
      CellOp("r1", "cf", "!Lq", 10, OpType.Value, Array[Byte](0), 1),
      CellOp("r1", "cf", "q", 10, OpType.Value, "v".getBytes, 2),
      CellOp("r1", "cf", "!Wq", 20, OpType.Value, Codecs.encodeBE64(10), 3),
      // dangling lock: never committed
      CellOp("r2", "cf", "!Lq", 15, OpType.Value, Array[Byte](0), 4),
      CellOp("r2", "cf", "q", 15, OpType.Value, "w".getBytes, 5)).toDF()
    val pending = graft.operators.PercolatorRead.pendingLocks(log, snapshotTs = 25)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(pending == Set(("r2", 15L)))
    val committed = graft.operators.PercolatorRead.resolve(log, snapshotTs = 25)
      .collect().map(_.getString(0)).toSet
    assert(committed == Set("r1"))
  }

  test("engine expressions are callable from SQL") {
    Graft.registerFunctions(spark)
    val r = spark.sql(
      """SELECT murmur64a(CAST('hello-tera' AS BINARY)) AS h,
        |       be64_decode(be64_encode(42L)) AS rt,
        |       f64_decode(f64_encode(2.5D)) AS d""".stripMargin).collect()(0)
    assert(r.getLong(0) == Codecs.murmur64a("hello-tera".getBytes("UTF-8")))
    assert(r.getLong(1) == 42L && r.getDouble(2) == 2.5)
    val r2 = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |       le_int_decode(le64_encode(-7L), 8, true) AS li,
        |       le_int_decode(le64_encode(255L), 1, false) AS u8""".stripMargin)
      .collect()(0)
    assert(r2.getDouble(0) == 11.0 && r2.getLong(1) == -7L && r2.getLong(2) == 255L)
    val r3 = spark.sql(
      s"""SELECT element_at(byte_histogram(CAST('aab' AS BINARY)), 98) AS a_cnt,
        |       nfc_normalize('é') AS nfc,
        |       deflate_size(CAST(repeat('x', 1000) AS BINARY), 6) AS dz""".stripMargin)
      .collect()(0)
    assert(r3.getLong(0) == 2L) // 'a' = byte 97 -> bin index 98 (1-based)
    assert(r3.getString(1) == "é")
    assert(r3.getInt(2) > 0 && r3.getInt(2) < 50) // 1000 x's deflate tiny
  }

  test("GraftExtensions injects the function surface at session build") {
    // getOrCreate returns the active session, bypassing extensions —
    // clear both handles so the builder constructs a fresh session
    // (same SparkContext) with the extensions applied, as a
    // `spark.sql.extensions=graft.GraftExtensions` deployment would
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = ext.sql(
        """SELECT murmur64a(CAST('hello-tera' AS BINARY)) AS h,
          |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp""".stripMargin)
        .collect()(0)
      assert(r.getLong(0) == Codecs.murmur64a("hello-tera".getBytes("UTF-8")))
      assert(r.getDouble(1) == 11.0)
      // injected into the catalog registry: visible from a derived
      // session too (temp-function registration would not be)
      val derived = ext.newSession()
      assert(derived.sql("SELECT be64_decode(be64_encode(7L)) AS x")
        .collect()(0).getLong(0) == 7L)
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }

  test("clearCaches: drive → clear → re-drive round-trips and releases the pinned checkpoint blocks") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    // make sure we start from a released state (other tests in the
    // same JVM may have populated the entry-point caches)
    Graft.clearCaches()
    val baseline = s.sparkContext.getPersistentRDDs.size
    val first = SparkEntry.queries("q_x_graph_communities")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the drive pinned the purchase-edge + LPA-label checkpoints
    assert(s.sparkContext.getPersistentRDDs.size > baseline)
    Graft.clearCaches()
    assert(s.sparkContext.getPersistentRDDs.size == baseline,
      "block-manager storage did not return to baseline after clearCaches")
    // re-drive rebuilds the caches and returns the identical labeling
    val again = SparkEntry.queries("q_x_graph_communities")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first)
    Graft.clearCaches()
  }
}
