package graft

import graft.operators.Stats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact radix-selection quantiles vs a driver-side total-order sort. */
class StatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  private def rank(q: Double, n: Long): Int =
    math.max(1L, math.ceil(q * n).toLong).toInt

  test("double quantiles match a driver sort — negatives, ties, ±0.0, NaN/null excluded") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val values = Seq.fill(2000)(rng.nextGaussian() * 1e6) ++
      Seq.fill(500)(42.0) ++ // heavy tie block
      Seq(-0.0, 0.0, Double.MinPositiveValue, -1e308, 1e308)
    val withJunk = values.map(Option(_)) ++
      Seq(None, None, Some(Double.NaN))
    val df = withJunk.toDF("x")
    val got = Stats.exactQuantiles(df, col("x"), qs)
    val sorted = values.toArray
    java.util.Arrays.sort(sorted) // IEEE total order: -0.0 < 0.0
    val expect = qs.map(q => sorted(rank(q, sorted.length) - 1))
    assert(got == expect)
    // the selected values are bit-exact elements, ±0.0 included
    assert(java.lang.Double.doubleToRawLongBits(got.head) ==
      java.lang.Double.doubleToRawLongBits(sorted.head))
  }

  test("long quantiles match a driver sort — negatives and duplicates") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val values = Seq.fill(3000)(rng.nextLong() % 1000000L) ++
      Seq(Long.MinValue, Long.MaxValue, 0L, 0L, -1L)
    val got = Stats.exactQuantilesLong(values.toDF("x"), col("x"), qs)
    val sorted = values.sorted
    val expect = qs.map(q => sorted(rank(q, sorted.length) - 1))
    assert(got == expect)
  }

  test("real-table medians: radix selection equals a full sort of the column") {
    val li = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "lineitem")
    val col0 = col("l_extendedprice")
    val got = Stats.exactQuantiles(li, col0, Seq(0.5, 0.99))
    val sorted = li.select(col0.cast("double")).where(col0.isNotNull)
      .orderBy(col0).collect().map(_.getDouble(0))
    val expect = Seq(0.5, 0.99).map(q => sorted(rank(q, sorted.length) - 1))
    assert(got == expect)
  }

  test("grouped quantiles match per-group driver sorts — skewed sizes, negatives, singleton group") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    val rows = Seq.tabulate(4000)(i => ("big", rng.nextGaussian() * 100)) ++
      Seq.tabulate(37)(i => ("small", -50.0 + i)) ++
      Seq(("one", -7.25))
    val got = Stats.exactQuantilesBy(rows.toDF("s", "x"), col("s"),
        col("x"), q = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = rows.groupBy(_._1).map { case (s, vs) =>
      val sorted = vs.map(_._2).toArray
      java.util.Arrays.sort(sorted)
      s -> sorted(rank(0.5, sorted.length) - 1)
    }
    assert(got == expect)
  }

  test("empty or all-null input refuses") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException](
      Stats.exactQuantiles(Seq.empty[Option[Double]].toDF("x"), col("x"), Seq(0.5)))
    assert(e.getMessage.contains("empty"))
  }
}
