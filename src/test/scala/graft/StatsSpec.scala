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

  test("adaptive radix widths: many strata x extreme quantiles still select " +
      "the exact per-stratum elements (round-15 5-scan kernel)") {
    import spark.implicits._
    // 80 strata x 2 quantiles = 160 live states: past the 2^21/2^16
    // full-width budget boundary class the round-15 kernel sizes its
    // rounds from, so this pins the walk across MIXED round widths;
    // q=0.0/1.0 pin the rank clamp (max(1, ceil(q*n))) at both ends.
    val rng = new scala.util.Random(63)
    val rows = (0 until 80).flatMap { s =>
      Seq.tabulate(30 + s)(_ => (s"s$s", rng.nextGaussian() * 1e6))
    }
    val df = rows.toDF("s", "x")
    val got = Stats.winsorizeBy(df, col("s"), col("x"), 0.0, 1.0, "c")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // lo = element at rank max(1, ceil(0*n)) = min; hi = max: clipping
    // at [min, max] must be the identity on every row
    assert(got.forall { case (_, x, c) => c == x })
    // and a mid quantile matches the driver sort per stratum
    val mid = Stats.exactQuantilesBy(df, col("s"), col("x"), q = 0.37)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = rows.groupBy(_._1).map { case (s, vs) =>
      val sorted = vs.map(_._2).toArray
      java.util.Arrays.sort(sorted)
      s -> sorted(rank(0.37, sorted.length) - 1)
    }
    assert(mid == expect)
  }

  test("regularize: dense per-key grid, empty buckets zero-filled, matches a driver model") {
    import spark.implicits._
    val step = 10L
    // key A: buckets 0,3 (gap 1-2); key B: bucket -2 and 0 (PRE-EPOCH
    // ts exercises floor division: -15/10 must land in bucket -2);
    // key C: a single event
    val events = Seq(
      ("A", 1L, 5L), ("A", 9L, 7L), ("A", 35L, 11L),
      ("B", -15L, 100L), ("B", 3L, 1L),
      ("C", 42L, 9L)).toDF("k", "ts", "v")
    val got = Stats.regularize(events, col("k"), col("ts"), step,
        aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
        zeroFill = Map("n" -> lit(0L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    val expect = Set(
      ("A", 0L, 2L, Some(12L)), ("A", 10L, 0L, None),
      ("A", 20L, 0L, None), ("A", 30L, 1L, Some(11L)),
      ("B", -20L, 1L, Some(100L)), ("B", -10L, 0L, None),
      ("B", 0L, 1L, Some(1L)),
      ("C", 40L, 1L, Some(9L)))
    assert(got == expect)
  }

  test("forwardFill carries the last observation; leading nulls stay null") {
    import spark.implicits._
    val df = Seq(
      ("A", 0L, None), ("A", 1L, Some(5L)), ("A", 2L, None),
      ("A", 3L, None), ("A", 4L, Some(8L)), ("A", 5L, None),
      ("B", 0L, None), ("B", 1L, None)).toDF("k", "b", "v")
    val got = Stats.forwardFill(df, col("k"), col("b"), Seq("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    val expect = Set(
      ("A", 0L, None), ("A", 1L, Some(5L)), ("A", 2L, Some(5L)),
      ("A", 3L, Some(5L)), ("A", 4L, Some(8L)), ("A", 5L, Some(8L)),
      ("B", 0L, None), ("B", 1L, None))
    assert(got == expect)
  }

  test("profile: exact per-column counts/NDV/min-max; native order before stringify") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10), Some("b")),
      (2L, Some(9), None),
      (3L, Some(10), Some("a")),
      (4L, None, Some("a")))
      .toDF("id", "n", "s")
    val got = Stats.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))).toMap
    assert(got("id") == ((4L, 4L, 0L, 4L, "1", "4")))
    // native INT order: min is 9, not lexicographic "10"
    assert(got("n") == ((4L, 3L, 1L, 2L, "9", "10")))
    assert(got("s") == ((4L, 3L, 1L, 2L, "a", "b")))
    // ONE aggregation: the multi-distinct Expand, no extra shuffles
    val plan = Stats.profile(df).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("profile: explicit non-atomic column refuses; default skips containers") {
    import spark.implicits._
    val df = Seq((1L, Seq("x"))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException](
      Stats.profile(df, Seq("arr")))
    assert(e.getMessage.contains("arr"))
    val names = Stats.profile(df).select("col_name")
      .collect().map(_.getString(0)).toSet
    assert(names == Set("id"))
    val e2 = intercept[IllegalArgumentException](
      Stats.profile(df, Seq("nope")))
    assert(e2.getMessage.contains("nope"))
  }

  test("profile handles dotted column names (no struct-field misparse)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "a.b")
    val got = Stats.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got == Map("id" -> 2L, "a.b" -> 2L))
  }

  test("heavyHitters equals the exact GROUP BY/HAVING — zipf streams, threshold straddlers") {
    import spark.implicits._
    def brute(keys: Seq[String], num: Long, den: Long): Map[String, Long] = {
      val n = keys.length.toLong
      keys.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
        .filter { case (_, c) => c * den > n * num }
    }
    def run(keys: Seq[Option[String]], num: Long, den: Long): Map[String, Long] =
      Stats.heavyHitters(keys.toDF("k"), col("k"), num, den)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rng = new scala.util.Random(61L)
    for (round <- 0 until 3) {
      // zipf-ish: key i with probability ∝ 1/(i+1); ~40 distinct keys
      val keys = Seq.fill(4000) {
        val u = rng.nextDouble()
        var acc = 0.0; var i = 0
        val norm = (1 to 40).map(1.0 / _).sum
        while (acc < u * norm && i < 40) { i += 1; acc += 1.0 / i }
        s"key_$i"
      }
      for ((num, den) <- Seq((1L, 20L), (1L, 100L), (3L, 100L)))
        assert(run(keys.map(Option(_)), num, den) == brute(keys, num, den),
          s"round $round phi=$num/$den")
    }
    // strictness at the exact boundary: 4 keys × 25 rows each, φ=1/4 —
    // every count equals n·φ exactly, so NOTHING is heavy (strict >)
    val flat = (0 until 100).map(i => s"k${i % 4}")
    assert(run(flat.map(Option(_)), 1L, 4L).isEmpty)
    // ... but φ=24/100 admits all four
    assert(run(flat.map(Option(_)), 24L, 100L).keySet ==
      Set("k0", "k1", "k2", "k3"))
    // null keys are excluded from both the count base and the output
    val withNulls = Seq.fill(30)(Some("hot")) ++ Seq.fill(20)(None) ++
      (0 until 10).map(i => Some(s"c$i"))
    assert(run(withNulls, 1L, 2L) == Map("hot" -> 30L))
    // single dominant key; empty input
    assert(run(Seq.fill(50)(Some("only")), 1L, 2L) == Map("only" -> 50L))
    assert(run(Seq.empty[Option[String]], 1L, 10L).isEmpty)
    // output key column keeps the caller's name
    val named = Stats.heavyHitters(
      Seq("a", "a", "b").toDF("my_key"), col("my_key"), 1L, 2L)
    assert(named.columns.toSeq == Seq("my_key", "cnt"))
    // long-typed keys work through the same hash path (7 appears 40
    // planted times plus once in the 1..20 run = 41 of 60 rows)
    val longs = Stats.heavyHitters(
        (Seq.fill(40)(7L) ++ (1L to 20L)).toDF("id"), col("id"), 1L, 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(longs == Map(7L -> 41L))
    // unbounded phi refuses; degenerate phi refuses
    intercept[IllegalArgumentException](
      Stats.heavyHitters(Seq("a").toDF("k"), col("k"), 1L, 100000L))
    intercept[IllegalArgumentException](
      Stats.heavyHitters(Seq("a").toDF("k"), col("k"), 3L, 3L))
  }

  test("winsorize clamps at the exact quantile elements; null/NaN pass through untouched") {
    import spark.implicits._
    val rng = new scala.util.Random(47L)
    val values = Seq.fill(500)(rng.nextGaussian() * 1000.0)
    val df = (values.map(Option(_)) ++ Seq(None, Some(Double.NaN)))
      .toDF("x")
    val got = Stats.winsorize(df, col("x"), 0.05, 0.95, "clipped")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getDouble(0))) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val sorted = values.sorted
    val lo = sorted(rank(0.05, values.length) - 1)
    val hi = sorted(rank(0.95, values.length) - 1)
    values.foreach { v =>
      assert(got(Some(v)) == Some(math.min(math.max(v, lo), hi)), v.toString)
    }
    // a null must NOT become the lower bound (Spark greatest skips
    // nulls); a NaN must NOT become the upper bound (NaN sorts above)
    assert(got(None).isEmpty)
    assert(got.keys.exists(_.exists(_.isNaN)) &&
      got.collect { case (Some(k), v) if k.isNaN => v }.head.exists(_.isNaN))
    // long variant: exact integer clamp, nulls stay null
    val ldf = ((1L to 100L).map(Option(_)) ++ Seq(None)).toDF("v")
    val lgot = Stats.winsorizeLong(ldf, col("v"), 0.10, 0.90, "c")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(lgot(Some(1L)) == Some(10L) && lgot(Some(50L)) == Some(50L) &&
      lgot(Some(100L)) == Some(90L) && lgot(None).isEmpty)
    intercept[IllegalArgumentException](
      Stats.winsorize(df, col("x"), 0.9, 0.1, "c"))
  }

  test("winsorizeBy clips each stratum at its own exact bounds; null stratum/value/NaN pass through") {
    import spark.implicits._
    val rng = new scala.util.Random(61L)
    // skewed strata + a singleton + a short stratum; nulls and a NaN
    val rows: Seq[(Option[String], Option[Double])] =
      Seq.tabulate(3000)(_ => (Some("big"), Some(rng.nextGaussian() * 100))) ++
      Seq.tabulate(23)(i => (Some("small"), Some(-40.0 + i))) ++
      Seq((Some("one"), Some(13.5)),
        (Some("big"), None), (Some("big"), Some(Double.NaN)),
        (None, Some(99999.0)))
    val got = Stats.winsorizeBy(rows.toDF("s", "x"), col("s"), col("x"),
        0.05, 0.95, "clipped")
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val bounds = rows.collect { case (Some(s), Some(v)) if !v.isNaN => (s, v) }
      .groupBy(_._1).map { case (s, vs) =>
        val sorted = vs.map(_._2).toArray
        java.util.Arrays.sort(sorted)
        s -> (sorted(rank(0.05, sorted.length) - 1),
          sorted(rank(0.95, sorted.length) - 1))
      }
    got.foreach {
      case (Some(s), Some(v), c) if !v.isNaN =>
        val (lo, hi) = bounds(s)
        assert(c == Some(math.min(math.max(v, lo), hi)), s"($s, $v)")
      case (Some(_), Some(v), c) => // the NaN row
        assert(c.exists(_.isNaN))
      case (Some(_), None, c) => assert(c.isEmpty) // null value stays null
      case (None, v, c) => assert(c == v) // null stratum: unclipped
    }
    // a singleton stratum clips to its only element
    assert(got.collect { case (Some("one"), _, c) => c }.head == Some(13.5))
    // equal quantiles degenerate to a constant per stratum
    val const = Stats.winsorizeBy(rows.toDF("s", "x"), col("s"), col("x"),
        0.5, 0.5, "c")
      .where(col("s") === "small" && col("x").isNotNull && !isnan(col("x")))
      .select(col("c")).distinct().collect()
    assert(const.length == 1)
    intercept[IllegalArgumentException](
      Stats.winsorizeBy(rows.toDF("s", "x"), col("s"), col("x"),
        0.9, 0.1, "c"))
  }

  test("regularize refuses bad arguments") {
    import spark.implicits._
    val ev = Seq(("A", 1L, 1L)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException](
      Stats.regularize(ev, col("k"), col("ts"), 0L,
        Seq(count(lit(1)).as("n"))))
    val e = intercept[IllegalArgumentException](
      Stats.regularize(ev, col("k"), col("ts"), 10L,
        Seq(count(lit(1)).as("n")), zeroFill = Map("nope" -> lit(0L))))
    assert(e.getMessage.contains("nope"))
  }
}
