package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion — combining the lexical ([[TextIndex.bm25TopK]]) and
  * dense ([[Similarity.ivfTopKOverIndex]]) retrieval rings into one
  * hybrid ranking. The reference exposes both access paths to the same
  * rows (primary row-key order plus secondary index tables — the
  * t_order_index pattern, doc/en/onebox.md pattern mirrored by
  * [[SecondaryIndex]]); a retrieval-driven data-selection pipeline has
  * the same two paths over documents, and reciprocal rank fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009) is the published
  * parameter-free way to merge them.
  *
  * Scale posture: every input run is a per-query top-k frame —
  * candidate-sized (|queries| × k), never corpus-sized — so the fused
  * frame joins candidates against candidates; the only corpus-sized
  * work stays inside the per-run retrievers, which are already
  * index-backed. The fused score is computed ELEMENTWISE over the
  * pivoted run ranks in fixed run order (no cross-row double
  * summation), so it is deterministic and bit-reproducible across
  * engines — the property the DuckDB oracle gate rides.
  */
object Retrieval {

  /** Reciprocal rank fusion: `score(q,d) = Σ_i w_i / (k0 + rank_i(q,d))`
    * over the runs that returned `d` for `q`; absent runs contribute 0.
    *
    * Input runs carry `(query_id, doc_id, rank)` with `rank` 1-based
    * and unique per query (the shape every top-k in this library
    * emits). Runs are pivoted by a fold of full-outer equi-joins on
    * `(query_id, doc_id)` — not unioned-then-summed — so each
    * document's score is one fixed-order arithmetic expression and the
    * double is engine-portable. Output: `(query_id, rank, doc_id,
    * rrf_score, n_runs)`, rank dense in (score desc, doc_id) order,
    * `n_runs` = how many runs surfaced the pair (the agreement signal).
    *
    * `k0` damps the head of each ranking (60 in the paper); `weights`
    * defaults to uniform 1.0.
    */
  def reciprocalRankFusion(runs: Seq[DataFrame], k: Int, k0: Int = 60,
      weights: Seq[Double] = Nil): DataFrame = {
    require(runs.nonEmpty, "reciprocalRankFusion needs at least one run")
    val w = if (weights.isEmpty) Seq.fill(runs.size)(1.0) else weights
    require(w.size == runs.size,
      s"got ${w.size} weights for ${runs.size} runs")
    require(k0 >= 0, s"k0 must be non-negative, got $k0")
    val renamed = runs.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as(s"_rank_$i"))
    }
    val pivoted = renamed.reduce(
      (a, b) => a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    val score = renamed.indices.map { i =>
      coalesce(
        lit(w(i)) / (lit(k0.toDouble) + col(s"_rank_$i").cast("double")),
        lit(0.0))
    }.reduce(_ + _)
    val hits = renamed.indices
      .map(i => when(col(s"_rank_$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    pivoted
      .withColumn("rrf_score", score)
      .withColumn("n_runs", hits)
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score"), col("n_runs"))
  }

  /** Rank-run evaluation against relevance judgments — the measurement
    * half of the retrieval ring (compare lexical vs dense vs fused
    * runs in-engine, no driver loops). `run` carries `(query_id,
    * doc_id, rank)`, `qrels` the relevant `(query_id, doc_id)` pairs.
    * Output, one row per JUDGED query (queries the run missed
    * entirely included): `n_rel` (judged relevant), `rel_retrieved`
    * (relevant rows the run returned at any rank), `hits_at_k`
    * (within rank ≤ k), `first_rel_rank` (the reciprocal-rank
    * numerator's denominator; NULL when the run never surfaced a
    * relevant doc). All exact integers — MRR / recall@k derive as
    * ratios downstream, and the whole frame replays in plain SQL
    * (oracle-gated, q_x_fuse_eval). One equi-join + one aggregation;
    * both frames are candidate-sized. */
  def evaluate(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // a duplicated judgment must not double-count n_rel
    val judged = qrels.select(col("query_id"), col("doc_id")).distinct()
    val perQuery = judged
      .join(run.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("_rank")),
        Seq("query_id", "doc_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"),
        count(col("_rank")).as("rel_retrieved"),
        count(when(col("_rank") <= k, 1)).as("hits_at_k"),
        min(col("_rank")).as("first_rel_rank"))
    perQuery
  }

  /** The rank discounts `1/log2(r+1)` for r = 1..k — computed ONCE
    * here and shared verbatim by [[evaluateGraded]]'s engine side and
    * the oracle SQL (which embeds these exact doubles as literals), so
    * no cross-engine `log` implementation difference can reach the
    * gate. */
  private[graft] def ndcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Graded-relevance evaluation — nDCG@k (Järvelin & Kekäläinen,
    * TOIS 2002, the linear-gain form) alongside the exact counts of
    * [[evaluate]]. `qrels` carries `(query_id, doc_id, grade)` with
    * integer grades ≥ 0 (conflicting duplicate judgments resolve to
    * the max). Output per judged query: `n_rel` (judged docs), `hits_at_k`
    * (judged docs retrieved within k), `dcg`, `idcg`, `ndcg`
    * (NULL when the ideal gain is zero — an all-zero-graded query has
    * no defined normalization).
    *
    * Determinism: the DCG is NOT a cross-row double sum (those are
    * aggregation-order-dependent and never hash-gate). Each query's
    * gains land in a rank-keyed map, and the sum folds over positions
    * 1..k IN ORDER via an `aggregate` lambda — fixed operand order,
    * fixed literal discount table ([[ndcgDiscounts]]) — so the doubles
    * are bit-reproducible across engines, the same discipline as the
    * RRF gate. The ideal side sorts grades descending and folds the
    * same way. Per-query state is ≤ k map entries plus the judged
    * grade list — candidate-sized, like every frame in this ring. */
  def evaluateGraded(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val disc = typedlit(ndcgDiscounts(k))
    // a null grade is an unusable judgment, and it would poison the
    // gain fold (null * discount nulls the whole DCG) — drop it rather
    // than silently zero it
    val judged = qrels
      .select(col("query_id"), col("doc_id"), col("grade").cast("long").as("grade"))
      .where(col("grade").isNotNull)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("grade")).as("grade"))
    val j = judged.join(
      run.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("_rank")),
      Seq("query_id", "doc_id"), "left")
    val agg = j.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_rel"),
      count(when(col("_rank") <= k, 1)).as("hits_at_k"),
      map_from_entries(sort_array(collect_list(
        when(col("_rank") <= k, struct(col("_rank"), col("grade"))))))
        .as("_m"),
      sort_array(collect_list(col("grade")), asc = false).as("_g"))
    val dcg = aggregate(
      transform(sequence(lit(1), lit(k)), r =>
        coalesce(element_at(col("_m"), r.cast("long")), lit(0L)).cast("double")
          * element_at(disc, r)),
      lit(0.0), (acc, x) => acc + x)
    val idcg = aggregate(
      zip_with(slice(col("_g"), 1, k), disc,
        (g, d) => coalesce(g.cast("double") * d, lit(0.0))),
      lit(0.0), (acc, x) => acc + x)
    agg
      .withColumn("dcg", dcg)
      .withColumn("idcg", idcg)
      .withColumn("ndcg", when(col("idcg") > 0, col("dcg") / col("idcg")))
      .select(col("query_id"), col("n_rel"), col("hits_at_k"),
        col("dcg"), col("idcg"), col("ndcg"))
  }

  /** Average precision @k as an EXACT RATIONAL — the third evaluation
    * measure (with [[evaluate]]'s recall/MRR inputs and
    * [[evaluateGraded]]'s nDCG), kept integer end to end:
    * `AP@k = (Σ_{relevant r ≤ k} P@r) / min(n_rel, k)` where
    * `P@r = hits_at_r / r`. Every term is rational with denominator
    * dividing `lcm(1..k)`, so the output is the exact pair
    * `(ap_num, ap_den)` with `ap_num/ap_den = AP@k` — no doubles
    * anywhere, the ratio derives downstream. Queries with no judged
    * doc retrieved in k report `(0, den)`; `n_rel` rides along.
    *
    * Shape: one equi-join + one per-query fold over the ≤k retrieved
    * judged ranks (sorted array, fixed order — though with integers
    * the order is only for determinism of nothing; addition is exact). */
  def evaluateAveragePrecision(run: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 40,
      s"k must be in [1, 40] (lcm(1..k) must fit a long), got $k")
    val lcm = (1 to k).map(BigInt(_)).foldLeft(BigInt(1))(
      (a, b) => a * b / a.gcd(b)).toLong
    val judged = qrels.select(col("query_id"), col("doc_id")).distinct()
    val j = judged.join(
      run.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("_rank")),
      Seq("query_id", "doc_id"), "left")
    // per query: the sorted relevant ranks within k; fold
    // Σ (#relevant ≤ r) * (lcm / r) over them — position i (1-based)
    // in the sorted array IS the hits count at that rank
    val agg = j.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_rel"),
      sort_array(collect_list(when(col("_rank") <= k, col("_rank"))))
        .as("_rr"))
    val apNum = aggregate(
      zip_with(col("_rr"), sequence(lit(1), size(col("_rr"))),
        (r, i) => i.cast("long") * (lit(lcm) / r).cast("long")),
      lit(0L), (acc, x) => acc + x)
    agg
      .withColumn("ap_num", coalesce(apNum, lit(0L)))
      .withColumn("ap_den", lit(lcm) * least(col("n_rel"), lit(k.toLong)))
      .select(col("query_id"), col("n_rel"), col("ap_num"), col("ap_den"))
  }

  /** Hybrid lexical+dense retrieval over the two persisted indexes:
    * BM25 through the inverted text index and cosine top-k through the
    * IVF inverted file, fused by RRF. `queries` carries `(query_id,
    * text, embedding)`; each side retrieves its own top-`kPerRun`
    * (default 2k — the fusion window needs more than k candidates per
    * run to let cross-run agreement reorder the tail) and only the
    * fused top-k survives.
    *
    * The dense side inherits [[Similarity.ivfTopKOverIndex]]'s
    * self-exclusion: a query whose `query_id` equals a corpus `vec_id`
    * will not retrieve that vector (give queries their own id space —
    * e.g. negative ids — when self-retrieval matters). Fusion consumes
    * RANKS only, so any stored IVF form works as the dense run — the
    * int8-quantized index (4× fewer bytes) is a legitimate choice
    * here even though the exact-cosine consumers refuse it.
    */
  def hybridTopK(queries: DataFrame, textIndexDir: String,
      ivfIndexDir: String, k: Int, kPerRun: Int = 0, k0: Int = 60,
      lexWeight: Double = 1.0, vecWeight: Double = 1.0,
      nprobe: Int = 4, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val kr = if (kPerRun > 0) kPerRun else 2 * k
    val lex = TextIndex
      .bm25TopK(queries.select(col("query_id"), col("text")),
        textIndexDir, kr, k1, b)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity
      .ivfTopKOverIndex(
        queries.select(col("query_id").as("vec_id"), col("embedding")),
        ivfIndexDir, kr, nprobe)
      .select(col("qid").as("query_id"), col("vec_id").as("doc_id"),
        col("rank"))
    reciprocalRankFusion(Seq(lex, dense), k, k0,
      Seq(lexWeight, vecWeight))
  }
}
