package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted datasheet store: per-batch mergeable partials whose
  * fold must equal the direct one-pass corpusReport — exactly on the
  * exact fields, within sketch error on the distinct-content estimate.
  */
class DatasheetStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private lazy val docs =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-datasheet").toString

  private def exactRows(report: DataFrame): Map[String, Seq[Long]] =
    report.select(col("source"), col("n_docs"), col("n_tokens"),
        col("total_chars"), col("short_docs"), col("min_chars"),
        col("max_chars"), col("n_langs"))
      .collect()
      .map(r => r.getString(0) -> (1 to 7).map(r.getLong(_)))
      .toMap

  test("append-grown store report equals the direct corpusReport exactly") {
    val dir = tmpDir()
    TextAnalysis.writeDatasheetStore(docs.where(col("doc_id") % 3 === 0),
      dir, batch = "b0")
    TextAnalysis.appendToDatasheetStore(docs.where(col("doc_id") % 3 === 1),
      dir, batch = "b1")
    TextAnalysis.appendToDatasheetStore(docs.where(col("doc_id") % 3 === 2),
      dir, batch = "b2")
    val got = TextAnalysis.datasheetReport(spark, dir)
    assert(exactRows(got) == exactRows(TextAnalysis.corpusReport(docs)))
    // the one approximate field: HLL estimate within 5% of true
    // distinct fingerprints per source
    val truth = docs
      .groupBy(col("source"))
      .agg(count_distinct(TextAnalysis.fingerprint(col("text"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.select(col("source"), col("approx_distinct_docs")).collect()
      .foreach { r =>
        val (s, est) = (r.getString(0), r.getLong(1))
        assert(math.abs(est - truth(s)) <= math.max(2L, truth(s) / 20),
          s"source $s: estimate $est vs true ${truth(s)}")
      }
    // batches are visible
    assert(TextAnalysis.datasheetBatches(spark, dir)
      .collect().map(_.getString(0)).toSet == Set("b0", "b1", "b2"))
  }

  test("stored length histograms give exact per-source quantiles") {
    val dir = tmpDir()
    TextAnalysis.writeDatasheetStore(docs.where(col("doc_id") % 3 === 0),
      dir, batch = "b0")
    TextAnalysis.appendToDatasheetStore(docs.where(col("doc_id") % 3 =!= 0),
      dir, batch = "b1")
    val bync = docs.select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sorted }
    for (q <- Seq(0.0, 0.5, 0.9, 0.99, 1.0)) {
      val got = TextAnalysis.datasheetQuantile(spark, dir, q)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = bync.map { case (s, sorted) =>
        s -> sorted(math.max(1, math.ceil(q * sorted.length).toLong).toInt - 1)
      }
      assert(got == expect, s"q=$q")
    }
    // and it agrees with the corpus-side exact selection at the median
    val fromCorpus = graft.operators.Stats.exactQuantilesBy(
        docs, col("source"), col("n_chars"), 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1).toLong).toMap
    val fromStore = TextAnalysis.datasheetQuantile(spark, dir, 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromStore == fromCorpus)
  }

  test("duplicate batch id refuses; torn sidecar refuses") {
    val dir = tmpDir()
    TextAnalysis.writeDatasheetStore(docs, dir, batch = "b0")
    val e = intercept[IllegalArgumentException](
      TextAnalysis.appendToDatasheetStore(docs, dir, batch = "b0"))
    assert(e.getMessage.contains("double-count"))
    // simulate a torn commit: sidecar gone, data present
    val props = new org.apache.hadoop.fs.Path(dir, "_graft_datasheet.properties")
    props.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(props, false)
    val e2 = intercept[IllegalArgumentException](
      TextAnalysis.datasheetReport(spark, dir))
    assert(e2.getMessage.contains("sidecar"))
  }

  test("compaction drops a batch's contribution exactly and keeps batch identity") {
    import spark.implicits._
    val dir = tmpDir()
    val keepA = docs.where(col("doc_id") % 2 === 0)
    val keepB = docs.where(col("doc_id") % 2 === 1)
    val junk = docs.limit(50)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    TextAnalysis.writeDatasheetStore(keepA, dir, batch = "a")
    TextAnalysis.appendToDatasheetStore(keepB, dir, batch = "b")
    TextAnalysis.appendToDatasheetStore(junk, dir, batch = "junk")
    TextAnalysis.compactDatasheetStore(dir,
      dropBatches = Some(Seq("junk").toDF("batch")))
    val got = TextAnalysis.datasheetReport(spark, dir)
    assert(exactRows(got) == exactRows(TextAnalysis.corpusReport(docs)))
    // erasure granularity survives the physical fold
    assert(TextAnalysis.datasheetBatches(spark, dir)
      .collect().map(_.getString(0)).toSet == Set("a", "b"))
    // the store stays appendable at the pinned threshold after compaction
    TextAnalysis.appendToDatasheetStore(junk, dir, batch = "junk2")
    assert(TextAnalysis.datasheetReport(spark, dir)
      .agg(sum(col("n_docs"))).collect().head.getLong(0) ==
      docs.count() + 50)
  }
}
