package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel / retention vs driver-side first-principles models. */
class EventAnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("funnel: hand-built edge cases (order, window, ties, absent anchors)") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes A@10 -> B@20 -> C@30
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      // u2: B before A only — B@5 must not count, chain stops at A
      (2L, 5L, "B"), (2L, 10L, "A"),
      // u3: completes with a TIE (B at the same ts as A — >= admits it)
      (3L, 10L, "A"), (3L, 10L, "B"),
      // u4: B lands exactly at the window bound (10 + 15 = 25: included);
      // C beyond it (26 > 25: excluded)
      (4L, 10L, "A"), (4L, 25L, "B"), (4L, 26L, "C"),
      // u5 never fires A: absent from the output
      (5L, 10L, "B"), (5L, 20L, "C"),
      // u6: greedy anchor — earliest A@10 is the anchor even though
      // A@50 would admit the B@70; the chain stops (documented trade)
      (6L, 10L, "A"), (6L, 50L, "A"), (6L, 70L, "B"))
      .toDF("k", "ts", "typ")
    val got = EventAnalytics.funnel(ev, col("k"), col("ts"),
        steps = Seq(col("typ") === "A", col("typ") === "B", col("typ") === "C"),
        withinUs = 15L)
      .collect().map(r => r.getLong(0) -> (r.getInt(1),
        (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
      .toMap
    assert(got == Map(
      1L -> (2, Seq(Some(10L), Some(20L), None)), // C@30 > 10+15
      2L -> (1, Seq(Some(10L), None, None)),
      3L -> (2, Seq(Some(10L), Some(10L), None)),
      4L -> (2, Seq(Some(10L), Some(25L), None)),
      6L -> (1, Seq(Some(10L), None, None))))
    // no window: u1 completes fully
    val open = EventAnalytics.funnel(ev, col("k"), col("ts"),
      steps = Seq(col("typ") === "A", col("typ") === "B", col("typ") === "C"))
      .where(col("key") === 1L).collect().head
    assert(open.getInt(1) == 3 && open.getLong(4) == 30L)
  }

  test("funnel: random events match a driver-side greedy model") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val types = Seq("A", "B", "C", "X")
    val events = Seq.fill(3000)(
      (rng.nextInt(60).toLong, rng.nextInt(1000).toLong,
        types(rng.nextInt(types.size))))
    val within = 300L
    def model: Map[Long, (Int, Seq[Option[Long]])] = {
      val byKey = events.groupBy(_._1)
      byKey.flatMap { case (k, evs) =>
        def minAfter(typ: String, atLeast: Long, bound: Long): Option[Long] =
          evs.filter(e => e._3 == typ && e._2 >= atLeast && e._2 <= bound)
            .map(_._2).minOption
        minAfter("A", Long.MinValue, Long.MaxValue).map { t0 =>
          val t1 = minAfter("B", t0, t0 + within)
          val t2 = t1.flatMap(t => minAfter("C", t, t0 + within))
          val n = 1 + t1.size + t2.size
          k -> (n, Seq(Some(t0), t1, t2))
        }
      }.toMap
    }
    val got = EventAnalytics.funnel(events.toDF("k", "ts", "typ"),
        col("k"), col("ts"),
        Seq(col("typ") === "A", col("typ") === "B", col("typ") === "C"),
        withinUs = within)
      .collect().map(r => r.getLong(0) -> (r.getInt(1),
        (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
      .toMap
    assert(got == model)
    assert(got.nonEmpty)
  }

  test("null keys and timestamps are excluded, not half-joined") {
    import spark.implicits._
    val ev = Seq(
      (Some(1L), Some(10L), "A"), (Some(1L), Some(20L), "B"),
      (None, Some(5L), "A"), (Some(2L), None, "A"))
      .toDF("k", "ts", "typ")
    val got = EventAnalytics.funnel(ev, col("k"), col("ts"),
        Seq(col("typ") === "A", col("typ") === "B"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    val r = EventAnalytics.retention(ev, col("k"), col("ts"), 100L)
      .agg(sum(col("n_active"))).collect().head.getLong(0)
    assert(r == 1L) // only key 1, one bucket
  }

  test("retention: cohorts by first activity, age counts match a driver model") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val events = Seq.fill(2000)(
      (rng.nextInt(40).toLong, rng.nextInt(100).toLong - 20))
    val step = 7L
    def fdiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val kb = events.map { case (k, t) => (k, fdiv(t, step)) }.distinct
    val cohort = kb.groupBy(_._1).map { case (k, bs) => k -> bs.map(_._2).min }
    val model = kb.groupBy { case (k, b) => (cohort(k) * step, b - cohort(k)) }
      .map { case (key, rows) => key -> rows.size.toLong }
    val got = EventAnalytics.retention(events.toDF("k", "ts"),
        col("k"), col("ts"), step)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == model)
    // age-0 rows exist and equal cohort sizes
    val sizes = cohort.groupBy(_._2).map { case (c, ks) =>
      (c * step, 0L) -> ks.size.toLong }
    sizes.foreach { case (key, n) => assert(got(key) == n, s"$key") }
  }
}
