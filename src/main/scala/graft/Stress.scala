package graft

import graft.model.{OpType, TableDesc}
import graft.operators.Resolve
import graft.sources.CellLogStore
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-node throughput characterization against the reference's
  * published numbers (doc/en/performance.md: 9 MB/s sequential write,
  * 20 MB/s scan, 32k point reads/s on a 16-core node; BASELINE.md).
  * Shapes match the reference bench: ~24 B keys, 100 B values (the doc
  * uses 1000 B; value size is a parameter).
  *
  * Usage: runMain graft.Stress [nCells] [valueBytes]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val nCells = args.headOption.map(_.toLong).getOrElse(5000000L)
    val valueBytes = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("stress-log").toString
    val bytesPerCell = 24 + valueBytes
    val totalMb = nCells * bytesPerCell / 1e6

    // ~24B keys over 1M rows x 5 versions, deterministic payload
    val batch = spark.range(nCells).select(
      format_string("row-%016d", col("id") % (nCells / 5)).as("row_key"),
      lit("cf0").as("cf"),
      lit("q").as("qualifier"),
      (col("id") / (nCells / 5)).as("ts"),
      lit(OpType.Value).as("op"),
      expr(s"repeat(chr(65 + CAST(id % 26 AS INT)), $valueBytes)")
        .cast("binary").as("value"),
      col("id").as("seq"))

    var t0 = System.nanoTime()
    CellLogStore.append(batch, dir)
    val writeS = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val scanned = CellLogStore.read(spark, dir)
      .agg(sum(length(col("value"))), count(lit(1))).collect()(0).getLong(1)
    val scanS = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val resolved = Resolve.resolve(CellLogStore.read(spark, dir),
      opsPresent = Some(Set(OpType.Value))).count()
    val resolveS = (System.nanoTime() - t0) / 1e9

    // batch point-get: 10k keys through the semi-join path
    val keys = spark.range(10000).select(
      format_string("row-%016d", col("id") * 97 % (nCells / 5)).as("k"))
    t0 = System.nanoTime()
    val got = CellLogStore.read(spark, dir)
      .join(broadcast(keys), col("row_key") === col("k"), "left_semi").count()
    val getS = (System.nanoTime() - t0) / 1e9

    // the same log as a BUCKETED table: resolve plans without its
    // row-key shuffle (the scan itself reports the partitioning), so
    // this measures what the layout buys on the engine's core operator
    val bdir = Files.createTempDirectory("stress-bkt").toString
    val buckets = spark.sparkContext.defaultParallelism
    val bt = Graft.createTable(spark, bdir,
      TableDesc(buckets = buckets), ops = Some(Set(OpType.Value)))
    t0 = System.nanoTime()
    bt.put(batch)
    val bWriteS = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val bResolved = bt.cells().count()
    val bResolveS = (System.nanoTime() - t0) / 1e9
    require(bResolved == resolved,
      s"bucketed resolve disagrees: $bResolved vs $resolved")

    println(f"""{"stress":{"cells":$nCells,"mb":$totalMb%.0f,""" +
      f""""write_mb_s":${totalMb / writeS}%.1f,"scan_mb_s":${totalMb / scanS}%.1f,""" +
      f""""resolve_cells_s":${nCells / resolveS}%.0f,"resolved":$resolved,""" +
      f""""batch_get_keys_s":${10000 / getS}%.0f,"got":$got,""" +
      f""""bucketed_write_mb_s":${totalMb / bWriteS}%.1f,""" +
      f""""bucketed_resolve_cells_s":${nCells / bResolveS}%.0f}}""")
    spark.stop()
  }
}
