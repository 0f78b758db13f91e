package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Banded interval join vs a driver-side theta-join model. */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("keyed interval join equals the brute-force band theta join, pairs unique") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val left = Seq.fill(800)(
      (rng.nextInt(10).toLong, rng.nextInt(100000).toLong - 50000, rng.nextInt(100)))
      .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
    val right = Seq.fill(800)(
      (rng.nextInt(10).toLong, rng.nextInt(100000).toLong - 50000, rng.nextInt(100)))
      .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
    // asymmetric band incl. negative lower bound; negative ts exercise
    // floor bucketing
    val (lo, hi) = (-1500L, 4000L)
    val got = IntervalJoin.join(
        left.toDF("lid", "k", "ts", "lv"),
        right.toDF("rid", "k", "rts", "rv").select(
          col("rid"), col("k"), col("rts"), col("rv")),
        key = Some("k"), leftTs = "ts", rightTs = "rts",
        lowerUs = lo, upperUs = hi, carried = Seq("rid", "rts", "rv"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rid"))).toList.sorted
    val brute = (for {
      (lid, lk, lt, _) <- left; (rid, rk, rt, _) <- right
      if lk == rk && rt >= lt + lo && rt <= lt + hi
    } yield (lid, rid)).sorted
    assert(got == brute)      // equality AND multiplicity (no dup pairs)
    assert(brute.nonEmpty)
  }

  test("unkeyed band join and degenerate zero-width band") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 200L)).toDF("lid", "ts")
    val right = Seq((10L, 100L), (11L, 150L), (12L, 305L)).toDF("rid", "rts")
    // zero-width band: exact-ts co-occurrence only
    val exact = IntervalJoin.join(left, right, None, "ts", "rts", 0L, 0L,
        Seq("rid")).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact == Set((1L, 10L)))
    // band [ts+100, ts+110]
    val band = IntervalJoin.join(left, right, None, "ts", "rts", 100L, 110L,
        Seq("rid")).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(band == Set((2L, 12L)))
  }

  test("left-outer interval join: brute-force equality, one null row per unmatched left") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    // ts range small enough that even the zero-width band matches
    // (~600·600/(8·6000) ≈ 7.5 expected exact-ts pairs per run)
    val left = Seq.fill(600)(
      (rng.nextInt(8).toLong, rng.nextInt(6000).toLong - 3000))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    val right = Seq.fill(600)(
      (rng.nextInt(8).toLong, rng.nextInt(6000).toLong - 3000))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    var sawNull = false
    var sawMatch = false
    for ((lo, hi) <- Seq((-1500L, 4000L), (-40L, -10L), (0L, 0L))) {
      val got = IntervalJoin.join(
          left.toDF("lid", "k", "ts"),
          right.toDF("rid", "k", "rts"),
          key = Some("k"), leftTs = "ts", rightTs = "rts",
          lowerUs = lo, upperUs = hi, carried = Seq("rid"),
          joinType = "left_outer")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toList.sortBy(p => (p._1, p._2.getOrElse(-1L)))
      val inner = (for {
        (lid, lk, lt) <- left; (rid, rk, rt) <- right
        if lk == rk && rt >= lt + lo && rt <= lt + hi
      } yield (lid, Some(rid))).toList
      val matchedLids = inner.map(_._1).toSet
      val brute = (inner ++ left.collect {
        case (lid, _, _) if !matchedLids(lid) => (lid, None)
      }).sortBy(p => (p._1, p._2.getOrElse(-1L)))
      assert(got == brute, s"band [$lo,$hi]")   // equality AND multiplicity
      sawNull ||= got.exists(_._2.isEmpty)
      sawMatch ||= got.exists(_._2.nonEmpty)
    }
    // across the band shapes both row kinds materialized
    assert(sawNull && sawMatch, s"degenerate: null=$sawNull match=$sawMatch")
    // bad joinType refuses
    intercept[IllegalArgumentException](IntervalJoin.join(
      left.toDF("lid", "k", "ts"), right.toDF("rid", "k", "rts"),
      Some("k"), "ts", "rts", 0L, 1L, Seq("rid"), joinType = "full"))
  }

  test("full-outer interval join: brute-force equality, both unmatched sides exactly once") {
    import spark.implicits._
    val rng = new scala.util.Random(37)
    val left = Seq.fill(500)(
      (rng.nextInt(8).toLong, rng.nextInt(6000).toLong - 3000))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    val right = Seq.fill(500)(
      (rng.nextInt(8).toLong, rng.nextInt(6000).toLong - 3000))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    var (sawL, sawR, sawM) = (false, false, false)
    for ((lo, hi) <- Seq((-1500L, 4000L), (-40L, -10L), (0L, 0L))) {
      // carry the right id so unmatched-right rows are identifiable
      val got = IntervalJoin.join(
          left.toDF("lid", "k", "ts"),
          right.toDF("rid", "k", "rts"),
          key = Some("k"), leftTs = "ts", rightTs = "rts",
          lowerUs = lo, upperUs = hi, carried = Seq("rid"),
          joinType = "full_outer")
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toList.sortBy(p => (p._1.getOrElse(-1L), p._2.getOrElse(-1L)))
      val inner = (for {
        (lid, lk, lt) <- left; (rid, rk, rt) <- right
        if lk == rk && rt >= lt + lo && rt <= lt + hi
      } yield (Some(lid), Some(rid))).toList
      val mL = inner.flatMap(_._1).toSet
      val mR = inner.flatMap(_._2).toSet
      val brute = (inner ++
        left.collect { case (lid, _, _) if !mL(lid) => (Some(lid), None) } ++
        right.collect { case (rid, _, _) if !mR(rid) => (None, Some(rid)) })
        .sortBy(p => (p._1.getOrElse(-1L), p._2.getOrElse(-1L)))
      assert(got == brute, s"band [$lo,$hi]")  // equality AND multiplicity
      sawL ||= got.exists(p => p._2.isEmpty)
      sawR ||= got.exists(p => p._1.isEmpty)
      sawM ||= got.exists(p => p._1.nonEmpty && p._2.nonEmpty)
    }
    // across the band shapes all three row kinds materialized
    assert(sawL && sawR && sawM, s"degenerate: L=$sawL R=$sawR M=$sawM")
    // a right row matching in ONE of its serve buckets must not leak a
    // null-left ghost from its other buckets: single pair straddling a
    // bucket boundary (band width 100 -> bucket 100; lt=95, rt=105
    // share no bucket with the pair's coordinate duplicated)
    val g2 = IntervalJoin.join(
        Seq((1L, 95L)).toDF("lid", "ts"),
        Seq((7L, 105L)).toDF("rid", "rts"),
        key = None, leftTs = "ts", rightTs = "rts",
        lowerUs = 0L, upperUs = 100L, carried = Seq("rid"),
        joinType = "full_outer")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(2)))
    assert(g2.toSeq == Seq((Some(1L), 7L)), g2.mkString(","))
  }

  test("plans as an equi-join: no cartesian, no nested loop") {
    import spark.implicits._
    val left = spark.range(10000).select(col("id").as("lid"),
      (col("id") * 13 % 100000).as("ts"))
    val right = spark.range(10000).select(col("id").as("rid"),
      (col("id") * 17 % 100000).as("rts"))
    val plan = IntervalJoin.join(left, right, None, "ts", "rts",
        -500L, 500L, Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the left_outer rewrite keeps the bucket equality in the ON
    // clause, so it must ALSO plan as an equi-join — a band-only ON
    // would silently degrade to a nested loop
    val outer = IntervalJoin.join(left, right, None, "ts", "rts",
        -500L, 500L, Seq("rid"), joinType = "left_outer")
      .queryExecution.executedPlan.toString
    assert(!outer.contains("CartesianProduct"), outer)
    assert(!outer.contains("BroadcastNestedLoopJoin"), outer)
    // full_outer = left_outer pass + anti pass: both banded equi-joins
    val full = IntervalJoin.join(left, right, None, "ts", "rts",
        -500L, 500L, Seq("rid"), joinType = "full_outer")
      .queryExecution.executedPlan.toString
    assert(!full.contains("CartesianProduct"), full)
    assert(!full.contains("BroadcastNestedLoopJoin"), full)
  }
}
