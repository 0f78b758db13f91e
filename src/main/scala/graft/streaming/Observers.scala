package graft.streaming

import graft.model.{CellOp, TableDesc}
import graft.operators.Resolve
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming reproduction of the reference's observer /
  * notification framework (tera Percolator-style observers:
  * `Scanner::Observe` include/observer/scanner.h:53-54, callback
  * `Observer::OnNotify` include/observer/observer.h:32-40, notification
  * discovery over the `_N_` column family
  * src/observer/executor/scanner_impl.cc:244-295).
  *
  * Mapping (SURVEY.md §2.8):
  *  - the cell-log append directory IS the change feed — no polling scan
  *    over a notify CF is needed (N2); a file-source stream tails it;
  *  - `observe(cf, qual)` filters the feed to observed columns (N1);
  *  - bucket partitioning ≙ `ScanStrategy::kTabletBucket` (N3);
  *  - exactly-once via checkpointed offsets + idempotent foreachBatch —
  *    stronger than the reference's at-least-once row locks (N4);
  *  - micro-batch offset commit ≙ notification Ack (N5).
  */
object Observers {

  /** Notify column family constant (tera src/types.h:53). */
  val NotifyCf = "_N_"

  /** Tail a cell-log parquet directory as a change-feed stream. */
  def cellLogStream(spark: SparkSession, logDir: String): DataFrame =
    spark.readStream
      .schema(CellOp.schema)
      .option("maxFilesPerTrigger", "16")
      .parquet(logDir)

  /** One observed notification — what `OnNotify` sees. */
  case class Notification(
      row_key: String, cf: String, qualifier: String, ts: Long,
      value: Array[Byte], bucket: Int)

  /** N1/N3: filter the feed to observed (cf, qualifier) columns and
    * assign consumption buckets by row hash.
    */
  def observed(feed: DataFrame, columns: Seq[(String, String)],
      buckets: Int = 16): DataFrame = {
    val colPred = columns
      .map { case (cf, q) => col("cf") === cf && col("qualifier") === q }
      .reduceOption(_ || _)
      .getOrElse(lit(true))
    feed.where(colPred && col("op") === graft.model.OpType.Value)
      .withColumn("bucket", pmod(hash(col("row_key")), lit(buckets)).cast("int"))
  }

  /** N1: run an observer callback per micro-batch. The callback receives
    * the batch of notifications; offset commit on return is the Ack.
    */
  def observe(
      feed: DataFrame,
      columns: Seq[(String, String)],
      checkpointDir: String,
      buckets: Int = 16)(onNotify: (DataFrame, Long) => Unit): StreamingQuery =
    observed(feed, columns, buckets).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) => onNotify(batch, id) }
      .trigger(Trigger.AvailableNow())
      .start()

  /** N6: event-time tumbling/sliding window aggregation with watermark
    * over the change feed (capability absent in the reference, required
    * for the events north star).
    */
  def windowedCounts(feed: DataFrame, window_ : String, slide: Option[String],
      watermark: String): DataFrame = {
    val ts = feed.withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", watermark)
    val win = slide match {
      case Some(s) => window(col("event_time"), window_, s)
      case None    => window(col("event_time"), window_)
    }
    ts.groupBy(win, col("cf"), col("qualifier"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("cf"),
        col("qualifier"), col("cnt"))
  }

  /** N6: session windows — activity sessions per row key closed after
    * `gap` of silence. */
  def sessionCounts(feed: DataFrame, gap: String, watermark: String): DataFrame = {
    val ts = feed.withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", watermark)
    ts.groupBy(session_window(col("event_time"), gap), col("row_key"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("row_key"), col("cnt"))
  }

  /** Custom keyed state (tera observers keep per-row processing state via
    * row locks; here arbitrary state via flatMapGroupsWithState):
    * running per-row cell counter emitted on every update.
    */
  def runningCellCounts(spark: SparkSession, feed: DataFrame)
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    feed.select(col("row_key")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[String], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator((key, total))
      }
  }
}
