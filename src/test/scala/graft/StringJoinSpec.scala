package graft

import graft.operators.StringJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the exact string-similarity joins: the
  * lossless-rewrite claims ("result EQUALS the brute-force threshold
  * join") are checked literally, against driver-side brute force, over
  * random corpora with planted near-pairs, at several thresholds.
  * The PassJoin multi-match-aware window and the prefix-filter length
  * math are exactly the kind of off-by-one-rich code a fuzz catches
  * and a hand-picked example does not.
  */
class StringJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- driver-side references ----

  /** Classic O(nm) Levenshtein — the spec's independent reference
    * (the engine path uses Spark's threshold-bounded levenshtein). */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def bruteEdit(strs: Seq[(Long, String)], tau: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib
      d = lev(sa, sb)
      if d <= tau
    } yield (ia, ib, d)).toSet

  private def gotEdit(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Random string over a 3-letter alphabet — small on purpose, so
    * near-pairs arise naturally as well as by planting. */
  private def randStr(rng: scala.util.Random, maxLen: Int): String =
    Array.fill(rng.nextInt(maxLen + 1))(('a' + rng.nextInt(3)).toChar).mkString

  /** Up to `edits` random single-character edits applied to `s`. */
  private def mutate(rng: scala.util.Random, s: String, edits: Int): String = {
    var cur = s
    for (_ <- 0 until edits) {
      val c = ('a' + rng.nextInt(3)).toChar
      cur = rng.nextInt(3) match {
        case 0 if cur.nonEmpty => // substitute
          val p = rng.nextInt(cur.length); cur.updated(p, c)
        case 1 if cur.nonEmpty => // delete
          val p = rng.nextInt(cur.length); cur.take(p) + cur.drop(p + 1)
        case _ => // insert
          val p = rng.nextInt(cur.length + 1); cur.take(p) + c + cur.drop(p)
      }
    }
    cur
  }

  private def corpus(rng: scala.util.Random, n: Int, tau: Int): Seq[(Long, String)] = {
    val bases = (0 until n).map(i => (i.toLong, randStr(rng, 15)))
    // planted: mutations of random bases (0..tau+1 edits — the +1
    // plants just-outside-the-bound pairs too), duplicates, empties
    val planted = (0 until n / 2).map { j =>
      val (_, base) = bases(rng.nextInt(n))
      (n + j.toLong, mutate(rng, base, rng.nextInt(tau + 2)))
    }
    bases ++ planted :+ (9000L, "") :+ (9001L, "")
  }

  test("editDistanceNearDuplicates equals brute force (fuzz, tau 0-3)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(20260814L)
    for (round <- 0 until 6) {
      val tau = round % 4
      val strs = corpus(rng, 40, tau)
      val df = strs.toDF("doc_id", "s")
      val got = gotEdit(StringJoin.editDistanceNearDuplicates(df, tau))
      val want = bruteEdit(strs, tau)
      assert(got == want,
        s"tau=$tau round=$round missing=${want -- got} extra=${got -- want}")
    }
  }

  test("editMatchesBetween equals brute-force cross join, overlapping id spaces") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7L)
    val tau = 2
    val cp = corpus(rng, 30, tau)
    // batch ids deliberately collide with corpus ids: sides must never
    // be compared to themselves, only across
    val nw = (0 until 20).map { j =>
      val (_, base) = cp(rng.nextInt(cp.size))
      (j.toLong, mutate(rng, base, rng.nextInt(tau + 2)))
    }
    val got = gotEdit(StringJoin.editMatchesBetween(
      nw.toDF("doc_id", "s"), cp.toDF("doc_id", "s"), tau))
    val want = (for {
      (ia, sa) <- nw; (ib, sb) <- cp
      d = lev(sa, sb)
      if d <= tau
    } yield (ia, ib, d)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("edit join: no cartesian/nested-loop in the plan; narrow long keys") {
    val s = spark
    import s.implicits._
    val df = (0L until 50L).map(i => (i, s"str$i")).toDF("doc_id", "s")
    val plan = StringJoin.editDistanceNearDuplicates(df, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ---- exact Jaccard join ----

  private def bruteJaccard(sets: Seq[(Long, Set[String])], tNum: Int,
      tDen: Int): Set[(Long, Long, Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib
      inter = (sa & sb).size.toLong
      union = (sa | sb).size.toLong
      if inter * tDen >= union * tNum
    } yield (ia, ib, inter, union)).toSet

  test("setSimilarityJoin equals brute force (fuzz, several thresholds)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42L)
    val vocab = (0 until 12).map(i => s"t$i")
    for ((tNum, tDen) <- Seq((1, 2), (2, 3), (3, 10), (1, 1))) {
      val sets = (0 until 60).map { i =>
        (i.toLong, Array.fill(1 + rng.nextInt(7))(
          vocab(rng.nextInt(vocab.size))).toSet)
      }
      val rows = sets.flatMap { case (id, ts) => ts.map(t => (id, t)) }
        .toDF("doc_id", "s")
      val got = StringJoin.setSimilarityJoin(rows, tNum, tDen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = bruteJaccard(sets, tNum, tDen)
      assert(got == want,
        s"t=$tNum/$tDen missing=${want -- got} extra=${got -- want}")
    }
  }

  test("setSimilarityJoinBetween equals brute-force cross join, overlapping id spaces") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17L)
    val vocab = (0 until 12).map(i => s"t$i")
    def draw(): Set[String] =
      Array.fill(1 + rng.nextInt(7))(vocab(rng.nextInt(vocab.size))).toSet
    for ((tNum, tDen) <- Seq((1, 2), (3, 4))) {
      val corpus = (0 until 50).map(i => (i.toLong, draw()))
      // batch ids deliberately collide with corpus ids; half the batch
      // reuses a corpus set verbatim (certain matches)
      val batch = (0 until 25).map { j =>
        val ts = if (j % 2 == 0) corpus(rng.nextInt(corpus.size))._2 else draw()
        (j.toLong, ts)
      }
      def rows(sets: Seq[(Long, Set[String])]) =
        sets.flatMap { case (id, ts) => ts.map(t => (id, t)) }.toDF("doc_id", "s")
      val got = StringJoin.setSimilarityJoinBetween(
          rows(batch), rows(corpus), tNum, tDen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        (ia, sa) <- batch; (ib, sb) <- corpus
        inter = (sa & sb).size.toLong
        union = (sa | sb).size.toLong
        if inter * tDen >= union * tNum
      } yield (ia, ib, inter, union)).toSet
      assert(got == want,
        s"t=$tNum/$tDen missing=${want -- got} extra=${got -- want}")
    }
  }

  test("jaccardNearDuplicates: shingle-set convenience ≡ brute force on text") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(9L)
    val words = Seq("key", "row", "scan", "agg", "fast", "slow")
    def doc(): String =
      Array.fill(4 + rng.nextInt(10))(words(rng.nextInt(words.size))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, doc()))
    // near-dups: append one word to an existing doc
    val near = (0 until 10).map(j =>
      (100L + j, base(rng.nextInt(base.size))._2 + " " + words(rng.nextInt(words.size))))
    val docs = (base ++ near).toDF("doc_id", "text")
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    val sets = (base ++ near).map { case (id, t) => (id, shingleSet(t)) }
      .filter(_._2.nonEmpty)
    val got = StringJoin.jaccardNearDuplicates(docs, 3, 1, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == bruteJaccard(sets, 1, 2),
      s"diff=${got.diff(bruteJaccard(sets, 1, 2))} / ${bruteJaccard(sets, 1, 2).diff(got)}")
  }

  test("overlapSimilarityJoin equals brute force (fuzz, several bounds)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23L)
    val vocab = (0 until 10).map(i => s"t$i")
    for (c <- Seq(1, 2, 4)) {
      val sets = (0 until 60).map { i =>
        (i.toLong, Array.fill(1 + rng.nextInt(6))(
          vocab(rng.nextInt(vocab.size))).toSet)
      }
      val rows = sets.flatMap { case (id, ts) => ts.map(t => (id, t)) }
        .toDF("doc_id", "s")
      val got = StringJoin.overlapSimilarityJoin(rows, c).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib
        inter = (sa & sb).size.toLong
        if inter >= c
      } yield (ia, ib, inter)).toSet
      assert(got == want, s"c=$c missing=${want -- got} extra=${got -- want}")
    }
  }

  test("containmentJoin equals brute force (fuzz, directed, several thresholds)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(31L)
    val vocab = (0 until 12).map(i => s"t$i")
    for ((tNum, tDen) <- Seq((1, 2), (9, 10), (1, 1))) {
      val sets = (0 until 50).map { i =>
        (i.toLong, Array.fill(1 + rng.nextInt(7))(
          vocab(rng.nextInt(vocab.size))).toSet)
      } ++ Seq((900L, Set("t0", "t1")), (901L, vocab.toSet)) // strict subset pair
      val rows = sets.flatMap { case (id, ts) => ts.map(t => (id, t)) }
        .toDF("doc_id", "s")
      val got = StringJoin.containmentJoin(rows, tNum, tDen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia != ib
        inter = (sa & sb).size.toLong
        if inter * tDen >= sa.size.toLong * tNum
      } yield (ia, ib, inter, sa.size.toLong)).toSet
      assert(got == want,
        s"t=$tNum/$tDen missing=${want -- got} extra=${got -- want}")
      // directionality: the subset pair contains forward, not backward
      if (tNum == tDen)
        assert(got.contains((900L, 901L, 2L, 2L)) &&
          !got.exists(p => p._1 == 901L && p._2 == 900L))
    }
  }

  test("setSimilarityJoin: fine-grained threshold on large sets (no int overflow)") {
    val s = spark
    import s.implicits._
    // sz * tNum would overflow int32 at sz >= 2148 with a millionth-
    // granularity threshold; the long-crossing arithmetic must not
    val rows = (0 until 3000).flatMap(i =>
      Seq((1L, s"e$i"), (2L, s"e$i"))).toDF("doc_id", "s")
    val got = StringJoin.setSimilarityJoin(rows, 999999, 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 2L, 3000L, 3000L)))
    // and the denominator bound refuses past the exactness envelope
    val e = intercept[IllegalArgumentException](
      StringJoin.setSimilarityJoin(rows, 1, (1 << 20) + 1))
    assert(e.getMessage.contains("denominator"))
  }

  test("the exact join audits LSH recall: superset always, catches weak-banding misses") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(53L)
    // docs with planted near-dups whose Jaccard sits near the 0.8
    // threshold: 40-token base, twin tweaks its last 4 tokens
    // (shingle overlap ~ 32/44 .. 34/42 around 0.75-0.8)
    val words = (0 until 500).map(i => s"w$i")
    def base(): Array[String] =
      Array.fill(40)(words(rng.nextInt(words.size)))
    val docs = (0 until 40).flatMap { i =>
      val b = base()
      val twin = b.clone()
      for (j <- 36 until 40) twin(j) = words(rng.nextInt(words.size))
      Seq((i.toLong * 2, b.mkString(" ")), (i.toLong * 2 + 1, twin.mkString(" ")))
    }.toDF("doc_id", "text")
    def pairSet(dfm: org.apache.spark.sql.DataFrame) =
      dfm.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val threshold = (7, 10)
    // truth: the exact prefix-filter join at J >= 0.7
    val truth = pairSet(StringJoin.jaccardNearDuplicates(
      docs, 3, threshold._1, threshold._2))
    assert(truth.nonEmpty)
    // LSH with DEGENERATE banding (2 bands of 32 rows): P[candidate]
    // at J~0.75 is ~2·0.75^32 ≈ 1e-4 — the audit must surface misses
    val weak = pairSet(graft.operators.Dedup.minhashNearDuplicates(
      docs, threshold = 0.7, shingleLen = 3, numHashes = 64, bands = 2))
    assert(weak.subsetOf(truth), s"LSH found non-pairs: ${weak -- truth}")
    assert((truth -- weak).nonEmpty,
      "weak banding was expected to miss borderline pairs on this seed")
    // standard banding (16 x 4): recall 1.0 on this corpus — the audit
    // certifies the production configuration instead of trusting it
    val std = pairSet(graft.operators.Dedup.minhashNearDuplicates(
      docs, threshold = 0.7, shingleLen = 3, numHashes = 64, bands = 16))
    assert(std == truth, s"missing=${truth -- std} extra=${std -- truth}")
  }

  test("jaccard join: no cartesian/nested-loop in the plan") {
    val s = spark
    import s.implicits._
    val rows = (0L until 40L).flatMap(i =>
      Seq((i, s"a$i"), (i, "common"), (i, s"b${i % 5}"))).toDF("doc_id", "s")
    val plan = StringJoin.setSimilarityJoin(rows, 1, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
