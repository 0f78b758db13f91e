package graft

import org.scalatest.funsuite.AnyFunSuite

/** MUTATION AUDIT of the float-valued spec family (the round-13
  * directive, generalizing the round-12 trainer lesson): for every
  * rows-only operator whose correctness rests on a spec invariant
  * rather than a DuckDB hash, feed each plausible degenerate output —
  * constant scores, parallel vectors, all-NaN, all-zero, empty
  * rankings — through the SAME checker the operator spec uses
  * ([[SpecInvariants]]) and REQUIRE the failure.
  *
  * Why: round 12 shipped a diverging SGNS trainer whose planted
  * assertion `intra > inter` passed on the degenerate output (diverged
  * vectors go parallel; every cosine reads 1.0000). A gate that cannot
  * fail is no gate. This suite is the proof, per family, that the gate
  * CAN fail — and because the operator specs call the identical
  * checker, the proof cannot drift from the shipped assertion.
  *
  * Families audited here (each rows-only in CORRECTNESS, each with a
  * standing justification): QualityModel (LBFGS probabilities),
  * DataSelection DSIR (log importance weights) and LM perplexity,
  * Retrieval hybrid/RRF (fusion ranking), Similarity LSH/int8/IVF/
  * PQ-ADC (recall floors), NodeEmbedding (clique margin + weight
  * bound — the template). BPE is NOT here: its trainer gates are
  * differential against an independent brute-force reference, which
  * a degenerate output fails by construction.
  *
  * Deliberately Spark-free: the checkers are pure functions of
  * collected output, so the audit runs in milliseconds and each
  * degenerate feed is readable as data. */
class DegenerateOutputSpec extends AnyFunSuite {

  private def mustRefuse(what: String)(body: => Unit): Unit = {
    val thrown =
      try { body; false } catch { case _: IllegalArgumentException => true }
    assert(thrown, s"$what PASSED the invariant — the gate cannot fail")
  }

  // ---- QualityModel.train/score -----------------------------------

  test("quality separation rejects constant, NaN, and barely-split score tables") {
    // the real fixture's shape passes (≈0.99/0.01 with 4x margin room)
    SpecInvariants.qualitySeparation(0.99, 0.01)
    // failed LBFGS returning the prior: both docs score the base rate
    mustRefuse("constant 0.5/0.5 score table")(
      SpecInvariants.qualitySeparation(0.5, 0.5))
    mustRefuse("constant 0.7/0.7 score table")(
      SpecInvariants.qualitySeparation(0.7, 0.7))
    // diverged weights through the sigmoid: NaN on either side
    mustRefuse("NaN positive score")(
      SpecInvariants.qualitySeparation(Double.NaN, 0.1))
    mustRefuse("NaN negative score")(
      SpecInvariants.qualitySeparation(0.9, Double.NaN))
    // tie-noise split around 0.5: right sides, no real separation
    mustRefuse("barely-split 0.51/0.49 table")(
      SpecInvariants.qualitySeparation(0.51, 0.49))
    // saturated-but-wrong-side: perfectly confident, inverted labels
    mustRefuse("inverted 0.01/0.99 table")(
      SpecInvariants.qualitySeparation(0.01, 0.99))
  }

  // ---- DataSelection.importanceWeights (DSIR) ---------------------

  test("DSIR separation rejects constant, NaN, and base-rate-shuffled weight tables") {
    val targets = Set(5L, 25L, 45L, 65L, 85L)
    // a real-shaped table passes: targets carry clearly higher log_w
    val good = (1L to 100L).map(id =>
      id -> (if (targets(id)) 3.0 + (id % 7) * 0.01
             else -1.0 + (id % 13) * 0.05))
    SpecInvariants.dsirSeparation(good, targets)
    // constant table: no evidence scored — must refuse even though
    // tie-breaks could luckily order targets first
    mustRefuse("constant weight table")(
      SpecInvariants.dsirSeparation((1L to 100L).map(_ -> 2.5), targets))
    // all-NaN (degenerate log arithmetic)
    mustRefuse("all-NaN weight table")(
      SpecInvariants.dsirSeparation(
        (1L to 100L).map(_ -> Double.NaN), targets))
    // one NaN hiding in an otherwise-good table
    mustRefuse("single NaN weight")(
      SpecInvariants.dsirSeparation(
        good.map { case (id, w) => id -> (if (id == 50L) Double.NaN else w) },
        targets))
    // id-correlated weights uncorrelated with the target set: the
    // top-|target| fills with low ids (base rate), not targets
    mustRefuse("id-ordered weights (base-rate ranking)")(
      SpecInvariants.dsirSeparation(
        (1L to 100L).map(id => id -> (100.0 - id)), targets))
    // inverted separation: targets score LOWER
    mustRefuse("inverted separation")(
      SpecInvariants.dsirSeparation(
        (1L to 100L).map(id =>
          id -> (if (targets(id)) -3.0 else 1.0 + (id % 13) * 0.05)),
        targets))
  }

  // ---- DataSelection.perplexity -----------------------------------

  test("perplexity separation rejects constant, NaN, and non-positive perplexities") {
    SpecInvariants.perplexitySeparation(12.0, 5000.0)
    // a constant-probability LM scores every doc identically
    mustRefuse("constant perplexity")(
      SpecInvariants.perplexitySeparation(100.0, 100.0))
    // separated but under the 10x factor: the LM barely learned
    mustRefuse("2x separation")(
      SpecInvariants.perplexitySeparation(100.0, 200.0))
    mustRefuse("NaN in-domain ppl")(
      SpecInvariants.perplexitySeparation(Double.NaN, 5000.0))
    mustRefuse("Infinite gibberish ppl")(
      SpecInvariants.perplexitySeparation(12.0,
        Double.PositiveInfinity))
    // exp(mean nll) can never be <= 0 — such a column is not a ppl
    mustRefuse("zero in-domain ppl")(
      SpecInvariants.perplexitySeparation(0.0, 5000.0))
    mustRefuse("negative ppl")(
      SpecInvariants.perplexitySeparation(-3.0, 5000.0))
    // inverted: gibberish scores lower
    mustRefuse("inverted separation")(
      SpecInvariants.perplexitySeparation(5000.0, 12.0))
  }

  // ---- Similarity LSH / int8 / IVF / PQ recall floors -------------

  test("recall floor rejects empty rankings and constant-score top-k tables") {
    val exact = (for { q <- 1L to 20L; r <- 1L to 5L }
      yield (q, q * 100 + r)).toSet
    // the real shape: approximate agrees on most members
    SpecInvariants.recallFloor(
      exact.filter { case (q, n) => n % 100 != 3 }, exact, 0.6, "audit")
    // all-NaN / all-zero scores rank NOTHING under the non-finite
    // guards: emptiness must be a loud failure, not recall 0.0
    mustRefuse("empty approximate ranking")(
      SpecInvariants.recallFloor(Set.empty, exact, 0.6, "audit"))
    // an empty REFERENCE is an equally broken fixture
    mustRefuse("empty exact reference")(
      SpecInvariants.recallFloor(exact, Set.empty, 0.6, "audit"))
    // constant scores: every query returns the same k docs by
    // tie-break — overlap collapses to ~1 query's worth
    val constant = (for { q <- 1L to 20L; r <- 1L to 5L }
      yield (q, 100L + r)).toSet
    mustRefuse("constant-score ranking (same k docs for every query)")(
      SpecInvariants.recallFloor(constant, exact, 0.6, "audit"))
    // right shape, wrong neighbors (a mis-wired index)
    mustRefuse("disjoint neighbors")(
      SpecInvariants.recallFloor(
        exact.map { case (q, n) => (q, n + 1000000L) }, exact, 0.6,
        "audit"))
  }

  // ---- Retrieval.hybridTopK / reciprocalRankFusion ----------------

  test("fusion head invariant rejects degenerate dense scoring and broken rank sets") {
    val srcs = Map(1L -> 101L, 2L -> 202L, 3L -> 303L)
    def fusedFor(srcRank: Map[Long, Int]): Seq[(Long, Int, Long, Int)] =
      srcs.toSeq.flatMap { case (q, src) =>
        (1 to 5).map(r =>
          (q, r, if (r == srcRank(q)) src else q * 1000 + r, 1))
      }
    val goodDense = srcs
    // the real shape: source at fused rank 1 or 2, dense rank-1 = src
    SpecInvariants.fusionHead(
      fusedFor(Map(1L -> 1, 2L -> 2, 3L -> 1)), goodDense, srcs, k = 5)
    // constant/NaN dense scores re-rank by tie-break: rank-1 is the
    // lowest doc id, not the planted source
    mustRefuse("dense rank-1 not the source (constant dense scores)")(
      SpecInvariants.fusionHead(
        fusedFor(Map(1L -> 1, 2L -> 1, 3L -> 1)),
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L), srcs, k = 5))
    // dense ranked nothing (all scores NaN → guards dropped all rows)
    mustRefuse("empty dense run")(
      SpecInvariants.fusionHead(
        fusedFor(Map(1L -> 1, 2L -> 1, 3L -> 1)), Map.empty, srcs,
        k = 5))
    // degenerate fusion: source buried past the RRF bound
    mustRefuse("source buried at rank 5")(
      SpecInvariants.fusionHead(
        fusedFor(Map(1L -> 5, 2L -> 1, 3L -> 1)), goodDense, srcs,
        k = 5))
    // broken rank set: duplicate rank 1 (a non-window fusion bug)
    val dupRanks = srcs.toSeq.flatMap { case (q, src) =>
      Seq((q, 1, src, 2), (q, 1, q * 1000 + 1, 1), (q, 3, q * 1000 + 3, 1),
        (q, 4, q * 1000 + 4, 1), (q, 5, q * 1000 + 5, 1))
    }
    mustRefuse("duplicate fused ranks")(
      SpecInvariants.fusionHead(dupRanks, goodDense, srcs, k = 5))
    // dropped candidates: only 3 of k=5 ranks present
    val short = srcs.toSeq.flatMap { case (q, src) =>
      Seq((q, 1, src, 2), (q, 2, q * 1000 + 2, 1), (q, 3, q * 1000 + 3, 1))
    }
    mustRefuse("missing fused ranks")(
      SpecInvariants.fusionHead(short, goodDense, srcs, k = 5))
  }

  // ---- NodeEmbedding (the round-12 template, audited end to end) --

  test("embedding margin rejects parallel, NaN, zero, and unnormalized vectors") {
    // the real fixture's measured shape (r13: 0.986 vs 0.335)
    SpecInvariants.embeddingMargin(0.986, 0.335)
    // THE round-12 failure verbatim: diverged vectors go parallel,
    // every cosine reads 1.0 — a bare `>` passes on float noise,
    // the margin must not
    mustRefuse("diverged parallel vectors (intra=inter=1.0)")(
      SpecInvariants.embeddingMargin(1.0000001, 1.0))
    mustRefuse("parallel vectors (exactly equal cosines)")(
      SpecInvariants.embeddingMargin(1.0, 1.0))
    // all-zero vectors: cosine is 0/0
    mustRefuse("NaN cosines (zero vectors)")(
      SpecInvariants.embeddingMargin(Double.NaN, Double.NaN))
    // sub-margin separation: structure too weak to trust
    mustRefuse("sub-margin separation")(
      SpecInvariants.embeddingMargin(0.5, 0.4))
    // a "cosine" outside [-1,1] is corrupt arithmetic, not geometry
    mustRefuse("cosine above 1")(
      SpecInvariants.embeddingMargin(1.8, 0.2))
    mustRefuse("cosine below -1")(
      SpecInvariants.embeddingMargin(0.8, -1.5))
  }

  test("weight bound rejects diverged and NaN trained weights") {
    SpecInvariants.boundedWeights(0.73)
    // the divergence signature: weights race past 1e37 before NaN
    mustRefuse("diverged weights (1e37)")(
      SpecInvariants.boundedWeights(1e37))
    mustRefuse("weights just past the bound")(
      SpecInvariants.boundedWeights(10.0))
    mustRefuse("NaN weights")(
      SpecInvariants.boundedWeights(Double.NaN))
    mustRefuse("Infinite weights")(
      SpecInvariants.boundedWeights(Double.PositiveInfinity))
  }
}
