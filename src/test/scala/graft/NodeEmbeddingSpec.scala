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
      // mean over the example mass, the operator's normalization
      val n = pairs.map(_._4.toDouble).sum
      w = Array.tabulate(v, dim)((r, d) => w(r)(d) + lr * gw(r)(d) / n)
      c = Array.tabulate(v, dim)((r, d) => c(r)(d) + lr * gc(r)(d) / n)
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
    val trained = NodeEmbedding.train(pairs,
      dim = 8, epochs = 40, lr = 2.0, negatives = 4, seed = "pc")
    val emb = collectEmb(trained)
    // weights stay BOUNDED — the round-13 audit found the previous
    // sum-gradient recurrence diverging past 1e37 while this test's
    // mean-cosine assertion passed on degenerate parallel vectors
    // (intra = inter = 1.0000); the margin assertion below would have
    // caught that. Both predicates live in SpecInvariants so the
    // mutation audit proves they reject the degenerate outputs.
    SpecInvariants.boundedWeights(
      emb.values.flatMap(_.map(math.abs)).max)
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
    // a real MARGIN, not just >: degenerate diverged vectors read
    // intra ≈ inter ≈ 1.0 and pass a bare inequality on float noise
    SpecInvariants.embeddingMargin(meanIntra(c1), inter)
    SpecInvariants.embeddingMargin(meanIntra(c2), inter)
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
    // non-positive / fractional multiplicities are an ERROR, never a
    // silently flipped gradient (cnt scales the objective)
    intercept[IllegalArgumentException](NodeEmbedding.train(
      Seq((1L, 2L, 1L, 0L)).toDF("center", "context", "offset", "cnt"),
      dim = 4, epochs = 1))
    intercept[IllegalArgumentException](NodeEmbedding.negativeSamples(
      Seq((1L, 2L, 1L, -3L)).toDF("center", "context", "offset", "cnt"),
      k = 2, seed = "x"))
    intercept[IllegalArgumentException](NodeEmbedding.pmiStats(
      Seq((1L, 2L, 1L, 1.5)).toDF("center", "context", "offset", "cnt")))
  }

  test("embedding store + ANN pipeline: bit-exact round trip; intra-clique neighbors end to end; torn commit refuses") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    def k5(off: Long) = for {
      i <- 0L until 5L; j <- (i + 1) until 5L
    } yield (off + i, off + j)
    val edges = (k5(0) ++ k5(10)) :+ (0L, 10L)
    val walks = Graph.randomWalks(edges.toDF("src", "dst"),
      walkLength = 6, walksPerNode = 8, seed = "pc", directed = false)
    val emb = NodeEmbedding.train(Graph.skipGramPairs(walks, window = 2),
      dim = 8, epochs = 40, lr = 2.0, negatives = 4, seed = "pc")
    // store lifecycle: write one half, append the other — the stored
    // table must equal the trained frame BIT-exactly
    val dir = java.nio.file.Files.createTempDirectory("emb-store").toString
    NodeEmbedding.writeEmbeddings(emb.where(col("node") < 10), dir)
    NodeEmbedding.appendToEmbeddings(emb.where(col("node") >= 10), dir)
    val back = NodeEmbedding.readEmbeddings(s, dir)
    assert(back.exceptAll(emb).isEmpty && emb.exceptAll(back).isEmpty,
      "stored vectors drifted from the trained frame")
    // the composed ANN path: stored vectors → persisted IVF inverted
    // file → full-probe top-k; every neighbor stays intra-clique
    val vecs = back.select(col("node").as("vec_id"),
      expr("transform(emb, x -> CAST(x AS float))").as("embedding"))
    val ivf = java.nio.file.Files.createTempDirectory("emb-ivf").toString
    Similarity.writeIvfIndex(vecs, ivf, dim = 8, nlist = 2)
    val top = Similarity.ivfTopKOverIndex(vecs, ivf, k = 3, nprobe = 2)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.length == 30, s"expected 10 nodes x k=3, got ${top.length}")
    // the planted structure survives the WHOLE persisted pipeline:
    // every node's top-3 ANN neighbors are strictly intra-clique
    top.foreach { case (q, nb) =>
      assert((q < 10) == (nb < 10), s"cross-clique neighbor: $q -> $nb") }
    // compact with erase: erased rows are GONE; survivors bit-stable
    NodeEmbedding.compactEmbeddings(dir,
      dropNodes = Some(Seq(0L, 10L).toDF("node")))
    val compacted = NodeEmbedding.readEmbeddings(s, dir)
    val survivors = emb.where(col("node") =!= 0L && col("node") =!= 10L)
    assert(compacted.exceptAll(survivors).isEmpty &&
      survivors.exceptAll(compacted).isEmpty)
    // torn commit: a sidecar-less directory loudly refuses
    val props = new org.apache.hadoop.fs.Path(dir, "_graft_emb.properties")
    props.getFileSystem(s.sessionState.newHadoopConf())
      .delete(props, false)
    intercept[IllegalArgumentException](NodeEmbedding.readEmbeddings(s, dir))
    intercept[IllegalArgumentException](
      NodeEmbedding.appendToEmbeddings(emb, dir))
    // contract refusals: dim mismatch, duplicate nodes, empty write
    NodeEmbedding.writeEmbeddings(emb, dir)
    intercept[IllegalArgumentException](NodeEmbedding.appendToEmbeddings(
      Seq((99L, Seq(1.0, 2.0))).toDF("node", "emb"), dir))
    intercept[IllegalArgumentException](NodeEmbedding.writeEmbeddings(
      emb.union(emb),
      java.nio.file.Files.createTempDirectory("emb-dup").toString))
    intercept[IllegalArgumentException](NodeEmbedding.writeEmbeddings(
      emb.where(lit(false)),
      java.nio.file.Files.createTempDirectory("emb-empty").toString))
  }
}
