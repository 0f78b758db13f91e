package graft

import graft.operators.{Graph, NodeEmbedding}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The trainer is full-batch deterministic GD, so the spec replays the
  * whole optimization on the driver — an INDEPENDENT implementation of
  * the same recurrence — and demands agreement to float-addition-order
  * tolerance; the md5-keyed negative draws replay exactly. */
class NodeEmbeddingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hex52(key: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      dig.take(7).map("%02x".format(_)).mkString.take(13), 16)
  }

  /** Independent driver replay of the SGNS recurrence. */
  private def replayTrain(pairs: Seq[(Long, Long, Long, Long)],
      dim: Int, epochs: Int, lr: Double, negK: Int,
      seed: String): Map[Long, Array[Double]] = {
    val vocab = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val rank = vocab.zipWithIndex.map { case (n, i) => n -> i }.toMap
    val v = vocab.size
    def init(r: Int, d: Int): Double =
      (hex52(s"$seed:init:$r:$d").toDouble / (1L << 52).toDouble - 0.5) / dim
    var w = Array.tabulate(v, dim)(init)
    var c = Array.fill(v, dim)(0.0)
    def sg(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
    val ex = pairs.map { case (ce, cx, off, cnt) =>
      (rank(ce), rank(cx), cnt.toDouble, (0 until negK).map(j =>
        (hex52(s"$seed:$ce:$cx:$off:$j") % v).toInt))
    }
    for (_ <- 0 until epochs) {
      val gw = Array.fill(v, dim)(0.0)
      val gc = Array.fill(v, dim)(0.0)
      for ((ci, xi, cnt, negs) <- ex) {
        val dot = (0 until dim).map(d => w(ci)(d) * c(xi)(d)).sum
        val g = cnt * (1.0 - sg(dot))
        for (d <- 0 until dim) {
          gw(ci)(d) += g * c(xi)(d); gc(xi)(d) += g * w(ci)(d)
        }
        for (ni <- negs) {
          val dn = (0 until dim).map(d => w(ci)(d) * c(ni)(d)).sum
          val gn = cnt * sg(dn)
          for (d <- 0 until dim) {
            gw(ci)(d) -= gn * c(ni)(d); gc(ni)(d) -= gn * w(ci)(d)
          }
        }
      }
      w = Array.tabulate(v, dim)((r, d) => w(r)(d) + lr * gw(r)(d))
      c = Array.tabulate(v, dim)((r, d) => c(r)(d) + lr * gc(r)(d))
    }
    vocab.zip(w).toMap
  }

  private def collectEmb(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Array[Double]] =
    df.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap

  test("negativeSamples equals the md5 driver replay; uniform range; deterministic") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L, 1L, 3L), (2L, 1L, -1L, 3L),
      (1L, 7L, 2L, 1L), (7L, 9L, 1L, 2L))
    val got = NodeEmbedding.negativeSamples(
        pairs.toDF("center", "context", "offset", "cnt"), k = 4, "ns")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) -> r.getLong(5)).toMap
    val vocab = Seq(1L, 2L, 7L, 9L)
    val want = (for {
      (ce, cx, off, cnt) <- pairs; j <- 0 until 4
    } yield (ce, cx, off, cnt, j.toLong) ->
      vocab((hex52(s"ns:$ce:$cx:$off:$j") % 4).toInt)).toMap
    assert(got == want)
    // deterministic: a second run is identical
    val again = NodeEmbedding.negativeSamples(
        pairs.toDF("center", "context", "offset", "cnt"), k = 4, "ns")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) -> r.getLong(5)).toMap
    assert(again == want)
    intercept[IllegalArgumentException](NodeEmbedding.negativeSamples(
      pairs.toDF("center", "context", "offset", "cnt"), k = 0, "ns"))
    intercept[IllegalArgumentException](NodeEmbedding.negativeSamples(
      pairs.toDF("center", "context", "offset", "cnt"), k = 2, "a:b"))
  }

  test("train equals the independent driver replay — epochs 0 through 5") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41L)
    val pairs = (0 until 60).map { _ =>
      val a = rng.nextInt(9).toLong; val b = rng.nextInt(9).toLong
      (a, b + 10, rng.nextInt(3).toLong - 1, rng.nextInt(4).toLong + 1)
    }.distinct
    for (epochs <- Seq(0, 1, 5)) {
      val got = collectEmb(NodeEmbedding.train(
        pairs.toDF("center", "context", "offset", "cnt"),
        dim = 6, epochs = epochs, lr = 0.1, negatives = 3, seed = "t"))
      val want = replayTrain(pairs, 6, epochs, 0.1, 3, "t")
      assert(got.keySet == want.keySet, s"epochs=$epochs")
      got.foreach { case (n, vec) =>
        vec.zip(want(n)).zipWithIndex.foreach { case ((g, e), d) =>
          assert(math.abs(g - e) < 1e-9,
            s"epochs=$epochs node=$n dim=$d got=$g want=$e")
        }
      }
    }
  }

  test("planted communities: intra-clique cosine beats inter after training on walk pairs") {
    val s = spark
    import s.implicits._
    def k5(off: Long) = for {
      i <- 0L until 5L; j <- (i + 1) until 5L
    } yield (off + i, off + j)
    val edges = (k5(0) ++ k5(10)) :+ (0L, 10L)
    val walks = Graph.randomWalks(edges.toDF("src", "dst"),
      walkLength = 6, walksPerNode = 8, seed = "pc", directed = false)
    val pairs = Graph.skipGramPairs(walks, window = 2)
    val emb = collectEmb(NodeEmbedding.train(pairs,
      dim = 8, epochs = 40, lr = 0.15, negatives = 4, seed = "pc"))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(t => t._1 * t._2).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val c1 = (0L until 5L).toSeq
    val c2 = (10L until 15L).toSeq
    def meanIntra(c: Seq[Long]) = (for {
      a <- c; b <- c if a < b
    } yield cos(emb(a), emb(b))).sum / (c.size * (c.size - 1) / 2)
    val inter = (for { a <- c1; b <- c2 }
      yield cos(emb(a), emb(b))).sum / (c1.size * c2.size)
    assert(meanIntra(c1) > inter,
      s"intra1=${meanIntra(c1)} inter=$inter")
    assert(meanIntra(c2) > inter,
      s"intra2=${meanIntra(c2)} inter=$inter")
  }

  test("pmiStats equals the driver count replay; marginal laws hold; empty refuses") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(53L)
    val pairs = (0 until 80).map { _ =>
      (rng.nextInt(6).toLong, rng.nextInt(6).toLong + 10,
        rng.nextInt(3).toLong - 1, rng.nextInt(5).toLong + 1)
    }
    val got = NodeEmbedding.pmiStats(
        pairs.toDF("center", "context", "offset", "cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    val nwc = pairs.groupBy(p => (p._1, p._2))
      .map { case (k, ps) => k -> ps.map(_._4).sum }
    val n = nwc.values.sum
    val nw = nwc.toSeq.groupBy(_._1._1)
      .map { case (w, xs) => w -> xs.map(_._2).sum }
    val nc = nwc.toSeq.groupBy(_._1._2)
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    val want = nwc.map { case ((w, c), m) =>
      (w, c) -> (m, nw(w), nc(c), n, m * n, nw(w) * nc(c)) }
    assert(got == want)
    // the marginal laws: Σ n_wc = N along both axes
    assert(nw.values.sum == n && nc.values.sum == n)
    // PMI sign sanity: pmi_num > pmi_den ⟺ positive association
    assert(got.values.forall(t => t._5 > 0 && t._6 > 0))
    intercept[IllegalArgumentException](NodeEmbedding.pmiStats(
      Seq.empty[(Long, Long, Long, Long)]
        .toDF("center", "context", "offset", "cnt")))
  }

  test("contract refusals: vocab cap, dim/epoch/lr bounds") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L, 1L, 1L), (2L, 3L, 1L, 1L))
      .toDF("center", "context", "offset", "cnt")
    intercept[IllegalArgumentException](
      NodeEmbedding.train(pairs, dim = 4, epochs = 1, maxVocab = 2))
    intercept[IllegalArgumentException](
      NodeEmbedding.train(pairs, dim = 1, epochs = 1))
    intercept[IllegalArgumentException](
      NodeEmbedding.train(pairs, dim = 4, epochs = 201))
    intercept[IllegalArgumentException](
      NodeEmbedding.train(pairs, dim = 4, epochs = 1, lr = 0.0))
    intercept[IllegalArgumentException](
      NodeEmbedding.train(pairs, dim = 4, epochs = 1, seed = "x:y"))
  }
}
