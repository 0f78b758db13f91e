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

  test("funnel strict modes: hand-built edge cases") {
    import spark.implicits._
    import EventAnalytics.FunnelMode
    val ev = Seq(
      // u1: consecutive A@10 B@20 C@30 — completes in every mode
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      // u2: A@10 X@15 B@20 — StrictOrder breaks at X; others complete
      (2L, 10L, "A"), (2L, 15L, "X"), (2L, 20L, "B"),
      // u3: A@10 A@15 B@20 — StrictDedup breaks at the duplicate A;
      // StrictOrder breaks too (A@15 intervenes); Greedy completes
      (3L, 10L, "A"), (3L, 15L, "A"), (3L, 20L, "B"),
      // u4: tie A@10 B@10 — Greedy admits (>=); strict modes need > so
      // B@10 is NOT after A@10; the B@40 is beyond the window
      (4L, 10L, "A"), (4L, 10L, "B"), (4L, 40L, "B"),
      // u5: StrictOrder tie rule — B@20 with unrelated X@20 at the SAME
      // ts does not break (both are "the next event")
      (5L, 10L, "A"), (5L, 20L, "B"), (5L, 20L, "X"),
      // u6: StrictDedup tie rule — duplicate A at exactly the candidate
      // B's timestamp does not break (advance wins)
      (6L, 10L, "A"), (6L, 20L, "B"), (6L, 20L, "A"))
      .toDF("k", "ts", "typ")
    val steps = Seq(col("typ") === "A", col("typ") === "B", col("typ") === "C")
    def run(m: EventAnalytics.FunnelMode): Map[Long, Int] =
      EventAnalytics.funnel(ev, col("k"), col("ts"), steps,
        withinUs = 25L, mode = m)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(FunnelMode.Greedy) ==
      Map(1L -> 3, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2, 6L -> 2))
    assert(run(FunnelMode.StrictIncrease) ==
      Map(1L -> 3, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 2, 6L -> 2))
    assert(run(FunnelMode.StrictOrder) ==
      Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 2))
    assert(run(FunnelMode.StrictDedup) ==
      Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 2))
  }

  test("funnel strict modes: random events match driver-side models") {
    import spark.implicits._
    import EventAnalytics.FunnelMode
    val rng = new scala.util.Random(23)
    val types = Seq("A", "B", "C", "X")
    // coarse timestamps force plenty of ties and duplicates
    val events = Seq.fill(3000)(
      (rng.nextInt(60).toLong, rng.nextInt(120).toLong,
        types(rng.nextInt(types.size))))
    val within = 40L
    val conds = Seq("A", "B", "C")
    // mirrors the aggregation definitions, not a scan: b = earliest
    // in-window candidate strictly after; per-mode advance rule
    def model(mode: EventAnalytics.FunnelMode)
        : Map[Long, (Int, Seq[Option[Long]])] =
      events.groupBy(_._1).flatMap { case (k, evs) =>
        def minWhere(p: ((Long, Long, String)) => Boolean): Option[Long] =
          evs.filter(p).map(_._2).minOption
        minWhere(_._3 == "A").map { t0 =>
          var times = Seq[Option[Long]](Some(t0))
          var tPrev: Option[Long] = Some(t0)
          (1 until conds.size).foreach { i =>
            val next = tPrev.flatMap { tp =>
              val b = minWhere(e =>
                e._3 == conds(i) && e._2 > tp && e._2 <= t0 + within)
              mode match {
                case FunnelMode.StrictIncrease => b
                case FunnelMode.StrictOrder =>
                  val m = minWhere(_._2 > tp)
                  b.filter(bb => m.contains(bb))
                case FunnelMode.StrictDedup =>
                  val d = minWhere(e =>
                    conds.take(i).contains(e._3) && e._2 > tp)
                  b.filter(bb => d.forall(bb <= _))
                case FunnelMode.Greedy => sys.error("not modeled here")
              }
            }
            times :+= next
            tPrev = next
          }
          k -> (times.count(_.isDefined), times)
        }
      }.toMap
    Seq(FunnelMode.StrictIncrease, FunnelMode.StrictOrder,
        FunnelMode.StrictDedup).foreach { m =>
      val got = EventAnalytics.funnel(events.toDF("k", "ts", "typ"),
          col("k"), col("ts"), conds.map(c => col("typ") === c),
          withinUs = within, mode = m)
        .collect().map(r => r.getLong(0) -> (r.getInt(1),
          (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
            .toSeq))
        .toMap
      assert(got == model(m), s"mode $m")
      assert(got.nonEmpty)
      // the fixture must actually exercise breaks: some keys stop early
      assert(got.values.exists(_._1 < 3), s"mode $m never breaks")
    }
  }

  test("funnel modes: window-size sweep (zero-width, tight, effectively open)") {
    import spark.implicits._
    import EventAnalytics.FunnelMode
    val rng = new scala.util.Random(29)
    val types = Seq("A", "B", "C", "X")
    val events = Seq.fill(1200)((rng.nextInt(25).toLong,
      rng.nextInt(60).toLong, types(rng.nextInt(types.size))))
    val conds = Seq("A", "B", "C")
    def model(mode: EventAnalytics.FunnelMode, within: Long)
        : Map[Long, Int] =
      events.groupBy(_._1).flatMap { case (k, evs) =>
        def minWhere(p: ((Long, Long, String)) => Boolean): Option[Long] =
          evs.filter(p).map(_._2).minOption
        minWhere(_._3 == "A").map { t0 =>
          var n = 1
          var tPrev: Option[Long] = Some(t0)
          (1 until conds.size).foreach { i =>
            val next = tPrev.flatMap { tp =>
              val after: Long => Boolean = mode match {
                case FunnelMode.Greedy => _ >= tp
                case _                 => _ > tp
              }
              val b = minWhere(e => e._3 == conds(i) && after(e._2) &&
                e._2 <= t0 + within)
              mode match {
                case FunnelMode.Greedy | FunnelMode.StrictIncrease => b
                case FunnelMode.StrictOrder =>
                  b.filter(bb => minWhere(_._2 > tp).contains(bb))
                case FunnelMode.StrictDedup =>
                  val d = minWhere(e =>
                    conds.take(i).contains(e._3) && e._2 > tp)
                  b.filter(bb => d.forall(bb <= _))
              }
            }
            if (next.isDefined) n += 1
            tPrev = next
          }
          k -> n
        }
      }.toMap
    for (within <- Seq(0L, 7L, 1000000L);
         m <- Seq(FunnelMode.Greedy, FunnelMode.StrictIncrease,
           FunnelMode.StrictOrder, FunnelMode.StrictDedup)) {
      val got = EventAnalytics.funnel(events.toDF("k", "ts", "typ"),
          col("k"), col("ts"), conds.map(c => col("typ") === c),
          withinUs = within, mode = m)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == model(m, within), s"mode $m within $within")
    }
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

  test("transitions: bigram counts match a driver model — tie-heavy streams, null hygiene") {
    import spark.implicits._
    def model(ev: Seq[(Long, Long, String)]): Map[(String, String), Long] =
      ev.groupBy(_._1).values.flatMap { es =>
        // the operator's ordering rule: (ts, label)
        val seq = es.map(e => (e._2, e._3)).sorted.map(_._2)
        seq.zip(seq.drop(1))
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    def run(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      EventAnalytics.transitions(df, col("k"), col("ts"), col("l"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rng = new scala.util.Random(31)
    for (round <- 0 until 3) {
      // few keys, tiny timestamp range, 4 labels: ties everywhere
      val ev = Seq.fill(600)((rng.nextInt(12).toLong,
        rng.nextInt(25).toLong, s"e${rng.nextInt(4)}"))
      assert(run(ev.toDF("k", "ts", "l")) == model(ev), s"round $round")
    }
    // duplicate (key, ts, label) rows: the label sequence — and so the
    // counts — stay deterministic (a,a,b at one ts → (a,a) and (a,b))
    val dup = Seq((1L, 5L, "a"), (1L, 5L, "a"), (1L, 5L, "b"))
    assert(run(dup.toDF("k", "ts", "l")) ==
      Map(("a", "a") -> 1L, ("a", "b") -> 1L))
    // single-event keys produce no pairs; null key/ts/label excluded
    val nulls = Seq(
      (Some(1L), Some(10L), Some("a")), (Some(1L), Some(20L), Some("b")),
      (None, Some(30L), Some("c")), (Some(1L), None, Some("c")),
      (Some(1L), Some(15L), None), (Some(2L), Some(1L), Some("z")))
    assert(run(nulls.toDF("k", "ts", "l")) == Map(("a", "b") -> 1L))
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
