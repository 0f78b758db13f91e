package graft

/** The float-valued spec family's acceptance invariants, EXTRACTED so
  * the operator specs and the mutation audit provably test the same
  * predicate.
  *
  * Why this object exists (the round-12 trainer lesson): an operator
  * whose oracle row is rows-only (`no_oracle`) is correct exactly as
  * far as its spec's invariant discriminates — and round 12 shipped a
  * diverging SGNS trainer because its planted-structure assertion
  * `intra > inter` PASSED on degenerate output (diverged vectors go
  * parallel, every cosine reads 1.0000, and a bare `>` holds on float
  * noise). Nothing had ever fed the assertion garbage, so nobody knew
  * it couldn't fail.
  *
  * Discipline: every rows-only operator's acceptance invariant lives
  * here as a checker that THROWS (`IllegalArgumentException` via
  * `require`) on violation. The operator spec calls the checker on
  * real output; [[DegenerateOutputSpec]] calls the SAME checker on
  * each plausible failure mode — constant scores, parallel vectors,
  * all-NaN, all-zero, empty rankings — and REQUIRES the throw. A
  * checker both specs share cannot silently weaken: strengthening it
  * must keep the real output passing, and any change that lets a
  * degenerate feed through fails the audit.
  *
  * Checkers are pure driver-side functions of collected output —
  * deliberately Spark-free, so the mutation audit runs in
  * milliseconds and the predicates are readable at a glance. */
object SpecInvariants {

  private def finite(x: Double, what: String): Unit =
    require(java.lang.Double.isFinite(x),
      s"$what is non-finite ($x) — degenerate output")

  /** QualityModel held-out separation: both probabilities finite, on
    * the correct sides of 0.5, AND separated by a real margin. A
    * constant score table (failed LBFGS returning the prior), an
    * all-NaN table (diverged weights through the sigmoid), or a
    * barely-split one (0.51/0.49 — the model learned nothing but tie
    * noise) must all refuse. Margin 0.5: the spec's separable
    * fixture trains to ~0.99/~0.01, so the floor has ~4x headroom
    * while rejecting any not-actually-trained table. */
  def qualitySeparation(pos: Double, neg: Double,
      margin: Double = 0.5): Unit = {
    finite(pos, "positive held-out quality score")
    finite(neg, "negative held-out quality score")
    require(pos > 0.5 && neg < 0.5,
      s"held-out scores on the wrong sides of 0.5: pos=$pos neg=$neg")
    require(pos - neg >= margin,
      s"held-out separation ${pos - neg} below margin $margin " +
        s"(pos=$pos neg=$neg) — a constant or barely-split score " +
        "table is a failed trainer, not a quality model")
  }

  /** DSIR importance weights (log-space, signed): the target-marked
    * docs must carry strictly higher MEAN weight than the rest, the
    * top-|target| of the full ordering must be at least half
    * target-marked (the distribution check — random or shuffled
    * weights hit ~base rate), and a constant weight table refuses
    * outright (equal means tie-break through `>` only by luck; the
    * explicit all-equal check removes the luck). */
  def dsirSeparation(weights: Seq[(Long, Double)],
      targetIds: Set[Long]): Unit = {
    require(weights.nonEmpty, "importance weight table is empty")
    require(targetIds.nonEmpty, "no target docs to separate")
    weights.foreach { case (id, w) =>
      finite(w, s"importance weight of doc $id") }
    require(weights.map(_._2).distinct.size > 1,
      "importance weights are CONSTANT — no evidence was scored")
    val (dup, rest) = weights.partition(w => targetIds(w._1))
    require(dup.nonEmpty && rest.nonEmpty,
      "weight table does not cover both target and non-target docs")
    val meanDup = dup.map(_._2).sum / dup.size
    val meanRest = rest.map(_._2).sum / rest.size
    require(meanDup > meanRest,
      s"target docs do not carry higher mean importance weight " +
        s"($meanDup vs $meanRest)")
    val top = weights.sortBy(w => (-w._2, w._1))
      .take(targetIds.size).map(_._1)
    val hit = top.count(targetIds)
    require(hit >= (targetIds.size + 1) / 2,
      s"only $hit of ${targetIds.size} target docs in the " +
        "top-|target| by weight — base-rate ranking, not importance")
  }

  /** LM perplexity separation: both perplexities finite and positive
    * (a perplexity is exp(mean nll) — zero/negative means the score
    * column is not a perplexity at all), with the in-domain doc at
    * least `factor` under the gibberish doc. A constant-probability
    * LM scores both docs equally and refuses. */
  def perplexitySeparation(inDomain: Double, gibberish: Double,
      factor: Double = 10.0): Unit = {
    finite(inDomain, "in-domain perplexity")
    finite(gibberish, "gibberish perplexity")
    require(inDomain > 0 && gibberish > 0,
      s"perplexities must be positive: $inDomain / $gibberish")
    require(inDomain * factor < gibberish,
      s"in-domain ppl $inDomain not ${factor}x under gibberish " +
        s"$gibberish — the LM learned nothing")
  }

  /** ANN recall floor vs the exact reference, as (query, neighbor)
    * membership. EMPTINESS is a first-class failure on both sides:
    * an all-NaN or all-zero score table ranks NOTHING under the
    * non-finite guards, and 0/N must read "the index is broken",
    * never "recall 0.0 happens". Returns the recall for logging. */
  def recallFloor(approx: Set[(Long, Long)], exact: Set[(Long, Long)],
      floor: Double, what: String): Double = {
    require(exact.nonEmpty,
      s"$what: exact reference top-k is EMPTY — the reference " +
        "itself is degenerate")
    require(approx.nonEmpty,
      s"$what: approximate top-k is EMPTY — all-NaN/all-zero " +
        "scores rank nothing")
    val recall = (approx & exact).size.toDouble / exact.size
    require(recall >= floor, s"$what recall $recall below floor $floor")
    recall
  }

  /** Hybrid/RRF fusion head property over a planted-source fixture:
    * the dense run's rank-1 IS the planted source for every query
    * (constant or NaN dense scores re-rank by tie-break and fail),
    * fused ranks per query are exactly 1..k (a degenerate fusion
    * drops or duplicates candidates), and the source lands in the
    * fused top-(2 + both-run agreements) — the RRF arithmetic bound
    * a rank-1 single-run vote guarantees. `fusedRows` is
    * (query_id, rank, doc_id, n_runs). */
  def fusionHead(fusedRows: Seq[(Long, Int, Long, Int)],
      denseTop: Map[Long, Long], srcs: Map[Long, Long], k: Int): Unit = {
    require(srcs.nonEmpty, "no planted sources to check")
    require(denseTop.nonEmpty, "dense run ranked nothing")
    srcs.foreach { case (q, src) =>
      require(denseTop.get(q).contains(src),
        s"dense rank-1 of query $q is ${denseTop.get(q)}, not the " +
          s"planted source $src — degenerate dense scoring")
      val qRows = fusedRows.filter(_._1 == q)
      require(qRows.map(_._2).sorted == (1 to k),
        s"fused ranks of query $q are not exactly 1..$k: " +
          qRows.map(_._2).sorted.mkString(","))
      val agree = qRows.count(_._4 == 2)
      val srcRank = qRows.find(_._3 == src).map(_._2)
      require(srcRank.exists(_ <= 2 + agree),
        s"query $q: source fused rank $srcRank above the RRF bound " +
          s"${2 + agree}")
    }
  }

  /** Trained-embedding clique margin (the round-12 lesson verbatim):
    * mean intra-clique cosine must beat mean inter-clique cosine by a
    * REAL margin, and both must be valid cosines. Diverged parallel
    * vectors read intra = inter = 1.0 and pass a bare `>` on float
    * noise; all-zero vectors read NaN; both refuse here. */
  def embeddingMargin(intra: Double, inter: Double,
      margin: Double = 0.3): Unit = {
    finite(intra, "mean intra-clique cosine")
    finite(inter, "mean inter-clique cosine")
    require(intra <= 1.0 + 1e-9 && inter <= 1.0 + 1e-9 &&
        intra >= -1.0 - 1e-9 && inter >= -1.0 - 1e-9,
      s"cosines out of [-1, 1]: intra=$intra inter=$inter — " +
        "unnormalized or corrupt vectors")
    require(intra > inter + margin,
      s"intra $intra not above inter $inter by margin $margin — " +
        "diverged parallel vectors read 1.0/1.0 and pass a bare `>`")
  }

  /** Trained-weight bound: the largest |component| of a trained
    * vector table must be finite and under `bound` — the divergence
    * signature is weights racing to 1e37 before the NaN. */
  def boundedWeights(maxAbs: Double, bound: Double = 10.0): Unit = {
    finite(maxAbs, "max |trained weight|")
    require(maxAbs < bound,
      s"max |trained weight| $maxAbs exceeds $bound — training diverged")
  }
}
