package graft

import graft.model.{CellOp, OpType}
import graft.operators.{BatchTxn, PercolatorRead}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch conditional writes: CheckAndApply and the Percolator 2PC cell
  * protocol as mutation batches.
  */
class BatchTxnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("batch check-and-apply applies only value-matching intents") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cas").toString
    val t = Graft.openTable(spark, dir)
    t.put(Seq(
      CellOp("r1", "cf", "q", 100, OpType.Value, "v1".getBytes, 1),
      CellOp("r2", "cf", "q", 100, OpType.Value, "v2".getBytes, 2)))

    val intents = Seq(
      // matches current value -> applies
      ("r1", "cf", "q", 200L, OpType.Value, "w1".getBytes, 10L, "cf", "q", "v1".getBytes),
      // wrong expected value -> rejected
      ("r2", "cf", "q", 200L, OpType.Value, "w2".getBytes, 11L, "cf", "q", "XX".getBytes),
      // absent check column -> rejected (reference compares a read value)
      ("r3", "cf", "q", 200L, OpType.Value, "w3".getBytes, 12L, "cf", "q", "v?".getBytes))
      .toDF("row_key", "cf", "qualifier", "ts", "op", "value", "seq",
        "check_cf", "check_qualifier", "expected")

    val annotated = BatchTxn.checkAndApply(t.cells(), intents)
    val applied = annotated.where(col("applied"))
      .select("row_key", "cf", "qualifier", "ts", "op", "value", "seq")
    assert(annotated.where(col("applied")).collect().map(_.getString(0)).toSet
      == Set("r1"))
    t.put(applied)
    val r1 = t.get("r1").collect()
    assert(r1.length == 1 && new String(r1(0).getAs[Array[Byte]]("value")) == "w1")
  }

  test("percolator 2PC batch: prewrite conflicts, commit visibility, pending cleanup") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-2pc").toString
    val t = Graft.openTable(spark, dir)

    // txn1 stages r1+r2 at startTs=10: no conflicts on an empty table
    val m1 = Seq(("r1", "cf", "q", "a".getBytes), ("r2", "cf", "q", "b".getBytes))
      .toDF("row_key", "cf", "qualifier", "value")
    val p1 = BatchTxn.prewrite(t.log, m1, startTs = 10)
    assert(p1.where(col("conflict")).count() == 0)
    t.put(BatchTxn.prewriteOps(p1, startTs = 10, primaryKey = "r1", seqBase = 1L << 40))

    // txn2 overlaps on r2 -> lock conflict; r3 is free
    val m2 = Seq(("r2", "cf", "q", "c".getBytes), ("r3", "cf", "q", "d".getBytes))
      .toDF("row_key", "cf", "qualifier", "value")
    val p2 = BatchTxn.prewrite(t.log, m2, startTs = 12)
    assert(p2.where(col("conflict")).collect().map(_.getString(0)).toSet == Set("r2"))
    t.put(BatchTxn.prewriteOps(p2, startTs = 12, primaryKey = "r3", seqBase = 2L << 40))

    // commit txn1 at commitTs=20
    t.put(BatchTxn.commitOps(t.log, startTs = 10, commitTs = 20, seqBase = 3L << 40))

    // a snapshot reader sees exactly txn1's data; txn2 is uncommitted
    val visible = PercolatorRead.resolve(t.log, snapshotTs = 25)
      .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]]("value"))))
      .toSet
    assert(visible == Set(("r1", "a"), ("r2", "b")))
    // txn2's lock (primary r3) is the only pending one
    val pending = PercolatorRead.pendingLocks(t.log, snapshotTs = 25)
      .collect().map(_.getString(0)).toSet
    assert(pending == Set("r3"))

    // write-write conflict: a later txn with startTs BELOW txn1's commit
    val m3 = Seq(("r1", "cf", "q", "e".getBytes))
      .toDF("row_key", "cf", "qualifier", "value")
    val p3 = BatchTxn.prewrite(t.log, m3, startTs = 15)
    assert(p3.where(col("conflict")).count() == 1)
    // ...but a txn starting after the commit proceeds
    val p4 = BatchTxn.prewrite(t.log, m3, startTs = 30)
    assert(p4.where(col("conflict")).count() == 0)

    // seq-era allocation: each era clears everything already stored
    val era = graft.sources.CellLogStore.nextSeqEra(spark, t.logDir)
    assert(era % graft.sources.CellLogStore.SeqEra == 0)
    val maxSeq = t.log.agg(max(col("seq"))).collect()(0).getLong(0)
    assert(era > maxSeq)
  }
}
