package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver test data (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    // default; read it as a nanosecond long — exact, and trivially
    // truncated to the µs precision DuckDB also reads at. Set once per
    // session, not per call (conf writes invalidate cached plans).
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts (ns long) truncated to microseconds — the engine's cell
    * timestamp unit, matching DuckDB's µs TIMESTAMP truncation. */
  def eventTsUs: Column = expr("ts div 1000")

  /** µs long → TimestampType, for event-time windowing. */
  def tsUsToTimestamp(c: Column): Column = timestamp_micros(c)

  /** Register every table as a temp view so `spark.sql` works as the
    * SQL façade (tera's MySQL handler analogue, SURVEY.md §2.9).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
