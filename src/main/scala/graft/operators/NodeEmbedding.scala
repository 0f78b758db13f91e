package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SGNS (skip-gram with negative sampling) node-embedding trainer —
  * the word2vec objective of Mikolov et al. (NIPS 2013) applied to
  * [[Graph.skipGramPairs]] walk co-occurrences, closing the
  * DeepWalk/node2vec pipeline (Perozzi et al. KDD 2014;
  * Grover/Leskovec KDD 2016) end to end: walks → skip-gram pairs →
  * trained vectors.
  *
  * Everything deterministic the repo's way:
  *
  *  - **Negative draws are md5-KEYED** (the [[Graph.randomWalks]] /
  *    [[Sampling]] keyed-uniform idiom): draw `j` for a pair row is
  *    `hex52(md5(seed:center:context:offset:j)) mod V`, a dense vocab
  *    RANK — uniform noise over the vocabulary (the NCE-style uniform
  *    variant of word2vec's unigram^0.75 table; uniform keeps the draw
  *    engine-portable and exactly replayable, and [[negativeSamples]]
  *    is gated bit-for-bit against a SQL oracle).
  *  - **Full-batch gradient descent**, not asynchronous SGD: each
  *    epoch computes the exact batch gradient from the PREVIOUS
  *    weights (tree-aggregated across executors — the
  *    [[QualityModel.train]] shape) and applies one update, so
  *    training is reproducible to floating-point addition order and a
  *    driver-side replay matches to ~1e-9 (the spec's differential).
  *    word2vec's hot-loop SGD races (Hogwild) trade determinism for
  *    throughput; a curation pipeline wants the replayable variant.
  *  - **Deterministic init**: center vectors seeded per (rank, dim)
  *    from the same md5 stream, scaled to ±0.5/dim (word2vec's init
  *    range); context vectors start at zero (word2vec's choice).
  *
  * Objective per aggregated pair row (c, x, cnt) with negatives n_j:
  * `cnt·[−log σ(u_c·v_x) − Σ_j log σ(−u_c·v_nj)]` — multiplicity as a
  * gradient weight, so the AGGREGATED pair table (one row per distinct
  * (center, context, offset)) trains identically to the expanded
  * corpus while the example count stays bounded by distinct pairs.
  *
  * Scale shape: the pair table and its ranks/negatives build
  * distributed (two broadcast-sized vocab joins + per-row hashes, one
  * checkpoint); each epoch is ONE treeAggregate over the examples —
  * gradient traffic is `2·V·dim` doubles per partial, never
  * corpus-sized. The vocabulary is the ONLY driver-materialized state
  * (`maxVocab` guard, default 65536 — the dictionary-shaped bounded
  * collect class of [[Bpe]]; a 100 TB walk corpus over a bounded node
  * set is the operator's target shape: corpus-side work distributes,
  * vocab-side state broadcasts). For vocabularies past the guard,
  * shard the embedding matrix (parameter-server style) — out of scope
  * here, an ERROR rather than a silent cliff.
  */
object NodeEmbedding {

  /** 52-bit uniform from the md5 keyed stream (the randomWalks idiom). */
  private def hex52(key: Column): Column =
    conv(substring(md5(key), 1, 13), 16, 10).cast("long")

  /** Project the pair-table columns, VALIDATING `cnt` first (the
    * [[Graph]] validateWeights idiom, one aggregated action): a null,
    * fractional, or non-positive multiplicity is an ERROR — a zero or
    * negative cnt would flip the gradient direction silently in
    * [[train]] and wreck [[pmiStats]]' marginals, and a fractional one
    * would truncate through the long cast. */
  private def pairCols(pairs: DataFrame): DataFrame = {
    val raw = col("cnt")
    val bad = pairs.agg(count(when(
      raw.isNull || raw =!= raw.cast("long") || raw.cast("long") < 1,
      1))).head().getLong(0)
    require(bad == 0,
      s"pair table has $bad null/fractional/non-positive cnt rows — " +
        "multiplicities must be positive integers")
    pairs.select(col("center"), col("context"),
      col("offset").cast("long").as("offset"),
      col("cnt").cast("long").as("cnt"))
  }

  /** Dense 0-based vocabulary ranks over the pair table's node set
    * (center ∪ context), ordered by node id — `(node, rank)`. */
  def vocabRanks(pairs: DataFrame): DataFrame = {
    val nodes = pairs.select(col("center").as("node"))
      .union(pairs.select(col("context").as("node")))
      .distinct()
    nodes.select(col("node"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("node"))) - 1).cast("long").as("rank"))
  }

  /** The DETERMINISTIC negative-sample table — `k` uniform draws per
    * aggregated pair row, each the vocab member whose dense rank is
    * `hex52(md5(seed:center:context:offset:j)) mod V`. Output
    * `(center, context, offset, cnt, j, negative)`; exactly the noise
    * examples [[train]] consumes, exposed as its own operator so the
    * sampling is SQL-gate-checkable bit for bit.
    *
    * A draw may land on the pair's own context (or center) node — no
    * rejection, BY DESIGN: word2vec's reference implementation accepts
    * the same collisions, the bias is O(k/V) and vanishes for any real
    * vocabulary, and rejection would make the draw count data-dependent
    * and the table no longer exactly replayable row for row.
    * Multiplicities must be positive integers (ERROR otherwise).
    *
    * Scale shape: one single-partition window to rank the vocab (V
    * rows — bounded by the node set, the one-time index-build class),
    * one per-row k-way explode, one equi-join rank → node. */
  def negativeSamples(pairs: DataFrame, k: Int,
      seed: String): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    require(!seed.contains(":"), "seed must not contain ':'")
    val p = pairCols(pairs)
    val vocab = vocabRanks(p)
    val v = vocab.count()
    require(v > 0, "empty pair table")
    val drawn = p
      .select(col("center"), col("context"), col("offset"), col("cnt"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("center"), col("context"), col("offset"), col("cnt"),
        col("j").cast("long").as("j"),
        pmod(hex52(concat_ws(":", lit(seed), col("center"),
          col("context"), col("offset"), col("j"))), lit(v)).as("rank"))
    drawn.join(vocab, Seq("rank"))
      .select(col("center"), col("context"), col("offset"), col("cnt"),
        col("j"), col("node").as("negative"))
  }

  /** CO-OCCURRENCE / PMI STATISTICS as EXACT INTEGERS — the matrix
    * SGNS implicitly factorizes (Levy/Goldberg, "Neural word embedding
    * as implicit matrix factorization", NIPS 2014: SGNS's optimum is
    * the shifted PMI matrix `PMI(w,c) − log k`). Per (center, context)
    * pair of a [[Graph.skipGramPairs]] table, summed over offsets:
    *
    *   n_wc  — pair multiplicity          n_w, n_c — marginals
    *   n_total = Σ n_wc                   PMI = ln(n_wc·N / (n_w·n_c))
    *
    * reported as the integers plus the ratio's exact numerator
    * `pmi_num = n_wc·n_total` and denominator `pmi_den = n_w·n_c` — the
    * ln() left to the caller, so the cross-engine gate is exact (the
    * repo's BM25 idiom). `max(0, PMI − ln k)` over these integers is
    * SPPMI, the standard spectral-embedding input. Overflow is an
    * ERROR up front: both products are bounded by n_total², so the
    * guard binds n_total at floor(√Long.MaxValue) ≈ 3.04e9 pair
    * occurrences.
    *
    * Scale shape: one pair aggregation, two marginal aggregations, two
    * equi-joins back — no iteration, no windows; the total is a
    * one-number driver read. */
  def pmiStats(pairs: DataFrame): DataFrame = {
    val p0 = pairCols(
      if (pairs.columns.contains("offset")) pairs
      else pairs.withColumn("offset", lit(0L)))
    // decimal-crossing total on the PRE-aggregation frame (the
    // communityStats ordering): cnt is validated >= 1 by pairCols, so
    // bounding the raw decimal sum here bounds every downstream long
    // sum (n_wc, n_w, n_c) — a near-Long.MaxValue cnt can no longer
    // wrap through the long aggregation BEFORE the guard runs
    val totDec = p0.agg(sum(col("cnt").cast("decimal(38,0)")))
      .head().getDecimal(0)
    require(totDec != null, "empty pair table")
    require(totDec.compareTo(
        java.math.BigDecimal.valueOf(3037000499L)) <= 0, // floor(sqrt(Long.Max))
      "total pair count exceeds the exact-long PMI bound " +
        "floor(sqrt(Long.MaxValue)) — shard the corpus")
    val n = totDec.longValueExact()
    val p = p0.groupBy(col("center"), col("context"))
      .agg(sum(col("cnt")).as("n_wc"))
    val nw = p.groupBy(col("center")).agg(sum(col("n_wc")).as("n_w"))
    val nc = p.groupBy(col("context")).agg(sum(col("n_wc")).as("n_c"))
    p.join(nw, Seq("center")).join(nc, Seq("context"))
      .select(col("center"), col("context"), col("n_wc"),
        col("n_w"), col("n_c"), lit(n).as("n_total"),
        (col("n_wc") * n).as("pmi_num"),
        (col("n_w") * col("n_c")).as("pmi_den"))
  }

  /** Train SGNS vectors over an aggregated skip-gram pair table
    * (`center, context, cnt` — [[Graph.skipGramPairs]] output; offset
    * is part of the negative-draw key when present, else keyed 0).
    * Returns `(node, emb)` — the center ("input") vectors, one
    * `array<double>` of length `dim` per vocab node. */
  def train(pairs: DataFrame, dim: Int, epochs: Int,
      lr: Double = 0.05, negatives: Int = 5, seed: String = "sgns",
      maxVocab: Int = 65536): DataFrame = {
    require(dim >= 2 && dim <= 256, s"dim must be in [2, 256], got $dim")
    require(epochs >= 0 && epochs <= 200,
      s"epochs must be in [0, 200], got $epochs")
    require(lr > 0 && lr <= 1.0, s"lr must be in (0, 1], got $lr")
    require(negatives >= 1 && negatives <= 100,
      s"negatives must be in [1, 100], got $negatives")
    require(!seed.contains(":"), "seed must not contain ':'")
    require(maxVocab >= 1, s"maxVocab must be positive, got $maxVocab")
    val spark = pairs.sparkSession
    val p = pairCols(
      if (pairs.columns.contains("offset")) pairs
      else pairs.withColumn("offset", lit(0L)))
    val vocab = vocabRanks(p)
    // the vocabulary is the one driver-materialized artifact (the Bpe
    // dictionary class of bounded collect) — guarded, never implicit
    val nodes = vocab.orderBy(col("rank")).select(col("node"))
      .limit(maxVocab + 1).collect().map(_.getLong(0))
    require(nodes.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab — shard the embedding " +
        "matrix or raise the guard consciously")
    val v = nodes.length
    require(v.toLong * dim <= (1L << 21),
      s"vocab×dim = ${v.toLong * dim} exceeds 2^21 — the gradient " +
        "aggregate would not fit a tree-combine partial; lower dim")
    require(v > 0, "empty pair table")
    // examples: ranks + the md5-keyed negative ranks, checkpointed
    // once — epochs iterate over this one frame
    val withRanks = p
      .join(vocab.select(col("node").as("center"),
        col("rank").as("_ci")), Seq("center"))
      .join(vocab.select(col("node").as("context"),
        col("rank").as("_xi")), Seq("context"))
    val negCols = (0 until negatives).map(j =>
      pmod(hex52(concat_ws(":", lit(seed), col("center"), col("context"),
        col("offset"), lit(j.toLong))), lit(v.toLong)))
    val examples = org.apache.spark.sql.graft.CheckpointStats
      .withMeasuredStats(withRanks
        .select(col("_ci").cast("int"), col("_xi").cast("int"),
          col("cnt"), array(negCols: _*).as("_negs"))
        .localCheckpoint(true))
    // deterministic init: center vectors ±0.5/dim from the md5 stream,
    // context vectors zero (word2vec's choices)
    def initVal(rank: Int, d: Int): Double = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:init:$rank:$d".getBytes("UTF-8"))
      val hx = dig.take(7).map("%02x".format(_)).mkString.take(13)
      val u = java.lang.Long.parseLong(hx, 16).toDouble / (1L << 52).toDouble
      (u - 0.5) / dim
    }
    var w = Array.tabulate(v, dim)((r, d) => initVal(r, d))
    var c = Array.fill(v, dim)(0.0)
    def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
    for (_ <- 0 until epochs) {
      val bw = spark.sparkContext.broadcast(w)
      val bc = spark.sparkContext.broadcast(c)
      val dimL = dim
      val zero = () => Array.fill(2 * v * dimL)(0.0)
      val grad = examples.rdd.treeAggregate(zero())(
        seqOp = (acc, row) => {
          val ci = row.getInt(0); val xi = row.getInt(1)
          val cnt = row.getLong(2).toDouble
          val negs = row.getSeq[Long](3)
          val wv = bw.value(ci)
          // positive example
          val vx = bc.value(xi)
          var dot = 0.0
          var d = 0
          while (d < dimL) { dot += wv(d) * vx(d); d += 1 }
          val g = cnt * (1.0 - sigmoid(dot))
          d = 0
          while (d < dimL) {
            acc(ci * dimL + d) += g * vx(d)
            acc((v + xi) * dimL + d) += g * wv(d)
            d += 1
          }
          // negatives
          negs.foreach { nL =>
            val ni = nL.toInt
            val vn = bc.value(ni)
            var dn = 0.0
            d = 0
            while (d < dimL) { dn += wv(d) * vn(d); d += 1 }
            val gn = cnt * sigmoid(dn)
            d = 0
            while (d < dimL) {
              acc(ci * dimL + d) -= gn * vn(d)
              acc((v + ni) * dimL + d) -= gn * wv(d)
              d += 1
            }
          }
          acc
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
      bw.destroy(); bc.destroy()
      val nw = Array.tabulate(v, dim)((r, d) =>
        w(r)(d) + lr * grad(r * dim + d))
      val nc = Array.tabulate(v, dim)((r, d) =>
        c(r)(d) + lr * grad((v + r) * dim + d))
      w = nw; c = nc
    }
    examples.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
    import spark.implicits._
    nodes.zip(w).toSeq.map { case (n, vec) => (n, vec.toSeq) }
      .toDF("node", "emb")
  }
}
