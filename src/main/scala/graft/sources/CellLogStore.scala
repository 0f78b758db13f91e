package graft.sources

import graft.model.TableDesc
import graft.operators.Resolve
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable cell-log storage: append-only parquet, range-clustered by
  * row key, plus the background compaction job.
  *
  * Reference analogues: `TabletWriter` group commit batches mutations
  * into one LevelDB write (tera src/io/tablet_writer.cc:107-230) — here
  * a DataFrame of CellOps IS the batch and one parquet append is the
  * group commit (S7/S8). Background compaction physically applies the
  * fold/drop logic to bound read amplification
  * (src/io/default_compact_strategy.cc:59-120) — here a rewrite of the
  * resolved log (§4).
  *
  * Scale design: appends are range-repartitioned and sorted by
  * (row_key, cf, qualifier), so parquet row-group min/max statistics
  * give range scans tablet-style partition pruning, and resolve's
  * row_key shuffle reads pre-clustered files. `spark.sql.files.
  * maxPartitionBytes` then bounds per-task memory at any table size.
  */
object CellLogStore {

  /** Group-commit an op batch to the log (S7). */
  def append(batch: DataFrame, logDir: String, numFiles: Int = 0): Unit = {
    val n = if (numFiles > 0) numFiles
      else batch.sparkSession.sessionState.conf.numShufflePartitions
    batch
      .repartitionByRange(n, col("row_key"), col("cf"), col("qualifier"))
      .sortWithinPartitions(col("row_key"), col("cf"), col("qualifier"),
        col("ts"), col("seq"))
      .write.mode(SaveMode.Append)
      // row-key bloom filters per file ≙ tera's per-SST blooms
      // (table_schema.proto:62): point gets skip files cheaply
      .option("parquet.bloom.filter.enabled#row_key", "true")
      .parquet(logDir)
  }

  def read(spark: SparkSession, logDir: String): DataFrame =
    spark.read.schema(graft.model.CellOp.schema).parquet(logDir)

  /** Background compaction: rewrite the log as its resolved state.
    * Resolved cells re-enter the log as plain VALUE ops (their folds and
    * tombstones applied), preserving `ts` and `seq` so later appends
    * still order correctly against them. Output replaces `logDir`
    * content at `outDir`.
    */
  def compact(spark: SparkSession, logDir: String, outDir: String,
      desc: TableDesc = TableDesc(), nowUs: Long = Long.MaxValue): Unit = {
    val resolved = Resolve.resolve(read(spark, logDir), desc, nowUs)
      .select(col("row_key"), col("cf"), col("qualifier"), col("ts"),
        lit(graft.model.OpType.Value).as("op"), col("value"), col("seq"))
    val n = spark.sessionState.conf.numShufflePartitions
    resolved
      .repartitionByRange(n, col("row_key"), col("cf"), col("qualifier"))
      .sortWithinPartitions(col("row_key"), col("cf"), col("qualifier"),
        col("ts"), col("seq"))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }
}
