package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver test data (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped both as parquet TIMESTAMP(NANOS) and as
    // TIMESTAMP(MICROS) across generator versions; keep the legacy
    // nanos-as-long mapping on so the ns form (which Spark 4 otherwise
    // refuses) arrives as an exact nanosecond long. [[eventTsUs]]
    // dispatches on whichever type actually arrives. Set once per
    // session, not per call (conf writes invalidate cached plans).
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts as epoch microseconds (the engine's cell timestamp unit,
    * matching DuckDB's µs TIMESTAMP precision), whatever physical form
    * the generator wrote: a nanosecond long truncates; a timestamp
    * converts via unix_micros; a TIMESTAMP_NTZ (what Spark 4 infers
    * for parquet µs timestamps without the UTC-adjusted flag) converts
    * through a session-TZ cast — every engine session pins
    * spark.sql.session.timeZone=UTC, so the naive wall time maps to
    * the same instant DuckDB reads.
    */
  def eventTsUs(df: DataFrame): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampType => unix_micros(col("ts"))
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(s"unsupported events.ts type $other")
    }
  }

  /** µs long → TimestampType, for event-time windowing. */
  def tsUsToTimestamp(c: Column): Column = timestamp_micros(c)

  /** Register every table as a temp view so `spark.sql` works as the
    * SQL façade (tera's MySQL handler analogue, SURVEY.md §2.9).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Widen a narrow batch input to the session's parallelism before a
    * CPU-amplifying per-row stage (shingling, hashing, per-token
    * feature extraction). A single-row-group parquet file arrives as
    * ONE input partition regardless of split configs — byte-range
    * splits can't cut inside a row group — so without this the explode
    * that fans each document into hundreds of shingles runs on one
    * core while the rest idle. No-op when the scan already carries >=
    * defaultParallelism partitions (the 100 TB case, where inputs come
    * pre-split at maxPartitionBytes granularity), so the round-robin
    * exchange only pays where the alternative is a serial stage.
    * Streaming frames pass through untouched (micro-batch sizing is
    * the source's job, and there is no RDD to inspect pre-start).
    */
  def widen(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      import org.apache.spark.sql.catalyst.plans.logical.{
        Aggregate, Join, RepartitionOperation, Sort, Window => LWindow}
      val target = df.sparkSession.sparkContext.defaultParallelism
      val plan = df.queryExecution.optimizedPlan
      // a plan that already crosses a shuffle boundary carries
      // spark.sql.shuffle.partitions — widening it again would be a
      // pure-cost exchange. widen targets scan-shaped inputs only.
      val shuffled = plan.collectFirst {
        case p @ (_: Aggregate | _: Join | _: Sort | _: LWindow |
          _: RepartitionOperation) => p
      }.isDefined
      if (shuffled) df
      else {
        // decide from optimizer statistics when they are real: below
        // target×openCostInBytes the file scan provably cannot produce
        // `target` splits (maxSplitBytes never drops under the open
        // cost); above it, Spark's own split sizing already targets
        // defaultParallelism. Stats-opaque sources (RDD-backed, JDBC)
        // report defaultSizeInBytes — only THEY pay the
        // df.rdd.getNumPartitions probe (physical planning + codegen of
        // a throwaway plan), because treating "unknown" as "big" would
        // silently skip the serial-explode case this helper exists for.
        val conf = df.sparkSession.sessionState.conf
        val bytes = plan.stats.sizeInBytes
        // small-stats inputs CONFIRM with the actual partition count
        // before paying the exchange: many small files already split
        // across >= target partitions despite tiny total bytes, and a
        // round-robin exchange there is pure cost. The df.rdd probe is
        // only ever paid on inputs already classified small (or
        // stats-opaque) — big healthy scans never plan it.
        def fewPartitions = df.rdd.getNumPartitions < target
        val narrow =
          if (bytes >= BigInt(conf.defaultSizeInBytes)) fewPartitions
          else bytes < BigInt(target) * conf.filesOpenCostInBytes.max(1L) &&
            fewPartitions
        if (narrow) df.repartition(target) else df
      }
    }
}
