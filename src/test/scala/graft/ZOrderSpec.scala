package graft

import graft.operators.ZOrder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: content preservation and per-file min/max
  * tightness (the property parquet row-group skipping prunes on). */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val li = graft.sources.Tables.load(spark, sfDir, "lineitem")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Mean fractional [min,max] span of `colName` across the files of a
    * written directory — 1.0 means every file covers the whole domain
    * (no skipping possible), small means tight boxes. */
  private def probeCol(df: org.apache.spark.sql.DataFrame,
      colName: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case TimestampType => unix_micros(col(colName)).cast("double")
      case TimestampNTZType =>
        unix_micros(col(colName).cast(TimestampType)).cast("double")
      case _ => col(colName).cast("double")
    }
  }

  private def meanFileSpan(path: String, colName: String): Double = {
    val all = spark.read.parquet(path)
    val Array(gmin, gmax) = all.agg(min(probeCol(all, colName)),
      max(probeCol(all, colName))).collect().head
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val domain = math.max(gmax - gmin, 1e-12)
    val files = all.inputFiles
    assert(files.nonEmpty)
    val spans = files.map { f =>
      val d = spark.read.parquet(f)
      val Array(lo, hi) = d.agg(min(probeCol(d, colName)),
        max(probeCol(d, colName)))
        .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
      (hi - lo) / domain
    }
    spans.sum / spans.length
  }

  test("z-clustered write is a pure reorder: content round-trips exactly") {
    val dir = tmp("graft-zorder-rt")
    ZOrder.writeClustered(li, dir, Seq("l_partkey", "l_suppkey"),
      numFiles = 8, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // multiset compare: (l_orderkey, l_linenumber) is NOT unique in the
    // synthetic data, so no column order is total — sort row strings
    val a = li.collect().map(_.toString).sorted
    val b = back.select(li.columns.map(col): _*)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("z-order keeps per-file boxes tight on BOTH dimensions; single-column sort does not") {
    val zDir = tmp("graft-zorder-z")
    val sDir = tmp("graft-zorder-s")
    ZOrder.writeClustered(li, zDir, Seq("l_partkey", "l_suppkey"),
      numFiles = 8, bits = 6)
    // the comparison layout: same file count, sorted by the FIRST
    // column only (the reference's single-dimension row-key locality)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir)
    // first dim: single-sort is optimal there; z pays a bounded tax
    val zPart = meanFileSpan(zDir, "l_partkey")
    val sPart = meanFileSpan(sDir, "l_partkey")
    // second dim: single-sort files span ~the whole domain, z files don't
    val zSupp = meanFileSpan(zDir, "l_suppkey")
    val sSupp = meanFileSpan(sDir, "l_suppkey")
    assert(sSupp > 0.9, s"single-sort second-dim span should be ~1, got $sSupp")
    assert(zSupp < 0.6 * sSupp,
      s"z-order second-dim span $zSupp not tighter than single-sort $sSupp")
    assert(zPart < 0.9,
      s"z-order first-dim span should still be far from full, got $zPart")
    assert(sPart < zPart, "single-sort should win its own dimension")
  }

  test("timestamp columns cluster too (epoch-micro bucketing)") {
    val dir = tmp("graft-zorder-ts")
    ZOrder.writeClustered(li, dir, Seq("l_shipdate", "l_extendedprice"),
      numFiles = 8, bits = 6)
    // meanFileSpan casts to double (timestamps -> epoch seconds): both
    // clustered dimensions must carry sub-domain boxes per file
    assert(meanFileSpan(dir, "l_shipdate") < 0.7)
    assert(meanFileSpan(dir, "l_extendedprice") < 0.7)
  }

  test("degenerate inputs refuse loudly") {
    intercept[IllegalArgumentException] {
      ZOrder.writeClustered(li, tmp("graft-zorder-bad"), Seq.empty, 4)
    }
    intercept[IllegalArgumentException] {
      // 8 bits x 8 cols = 64 > 63
      ZOrder.quantileBounds(li, Seq.fill(8)("l_partkey"), bits = 8)
    }
  }
}
