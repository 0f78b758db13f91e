package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-weighted data selection — DSIR (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that look like a small
  * target corpus by the likelihood ratio of two hashed bag-of-n-grams
  * models. The generative complement to [[QualityModel]]'s trained
  * discriminative filter: no labels and no optimizer, just two count
  * vectors and a log-ratio — which is exactly why it scales: both
  * "models" are one aggregation each.
  *
  * Features are unigram + bigram counts hashed into `buckets` slots
  * (the paper's hashing trick — vocabulary-free, so a 100 TB raw corpus
  * never takes a vocabulary pass). Per-document weight:
  * log w(x) = Σ_b c_b(x) · (log p̂_target[b] − log p̂_raw[b]),
  * with add-α smoothing on both distributions.
  *
  * Selection is Gumbel top-k over `log w + g_i` — the paper's
  * importance RESAMPLING, not a hard threshold — with the Gumbel noise
  * derived from a seeded hash of the document id, so the sample is
  * deterministic and re-runnable (same discipline as every sampler in
  * [[Sampling]]).
  *
  * Scale shape: the target side aggregates to ≤ `buckets` rows and the
  * raw side's distribution is the same bounded size, so the log-ratio
  * frame always BROADCASTS; per-document weights are then one
  * broadcast join + one hash aggregation over the raw corpus — no
  * windows, no driver-held state, two corpus-sized shuffles total
  * (gram counts, weight fold). Selection is a TakeOrdered top-k, not a
  * global sort.
  */
object DataSelection {

  /** Unigram + bigram string grams of a token array (bigrams
    * space-joined; empty/one-token docs yield unigrams only). */
  def grams(toks: Column): Column = concat(
    toks,
    when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array()))

  /** (doc_id, gram) — one row per gram INSTANCE (multiplicity kept:
    * the weight of a doc that repeats a target-y phrase should count
    * it every time, matching the paper's bag-of-n-grams). */
  private def gramRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(grams(TextIndex.terms(col("text")))).as("gram"))

  /** (doc_id, bucket, cnt) hashed gram counts. */
  def hashedGramCounts(docs: DataFrame, buckets: Int): DataFrame =
    gramRows(docs)
      .select(col("doc_id"), pmod(xxhash64(col("gram")), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-raw-document DSIR importance weight `(doc_id, log_w)`.
    * Documents with zero grams (empty text) carry no evidence and are
    * omitted. α smooths both distributions over the full bucket range,
    * so buckets seen on only one side stay finite. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = 10000, alpha: Double = 0.01): DataFrame = {
    val rawCnt = hashedGramCounts(raw, buckets)
    // both distributions are ≤ `buckets` rows and the totals are one
    // row each — everything below the per-doc fold broadcasts
    val tC = hashedGramCounts(target, buckets)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("t_cnt"))
    val rC = rawCnt
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("r_cnt"))
    val llr = tC.join(rC, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tC.agg(sum(col("t_cnt")).as("t_tot"))))
      .crossJoin(broadcast(rC.agg(sum(col("r_cnt")).as("r_tot"))))
      .select(col("bucket"),
        (log(coalesce(col("t_cnt"), lit(0L)) + alpha) -
          log(col("t_tot") + alpha * buckets) -
          log(coalesce(col("r_cnt"), lit(0L)) + alpha) +
          log(col("r_tot") + alpha * buckets)).as("llr"))
    rawCnt.join(broadcast(llr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("llr")).as("log_w"))
  }

  /** Gumbel top-k importance resample: `k` raw documents drawn
    * approximately ∝ exp(log_w), deterministically (the Gumbel noise
    * is a seeded hash of the id — same seed, same sample). Output is
    * the selected ids with their weights, heaviest key first. */
  def resampleByImportance(raw: DataFrame, target: DataFrame, k: Int,
      seed: Long = 7L, buckets: Int = 10000,
      alpha: Double = 0.01): DataFrame = {
    val w = importanceWeights(raw, target, buckets, alpha)
    // u in (0,1) from 24 hash bits, center-offset so log(log(u)) is
    // always finite; g = -log(-log u) is standard Gumbel
    val u = (pmod(xxhash64(col("doc_id"), lit(seed)), lit(1L << 24))
      .cast("double") + 0.5) / (1L << 24).toDouble
    w.withColumn("_g", -log(-log(u)))
      .orderBy((col("log_w") + col("_g")).desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("log_w"))
  }

  /** (doc_id, ctx, bg) hashed (context, bigram) bucket per token
    * position ≥ 2 — the unit both LM training and scoring fold. */
  private def pairRows(docs: DataFrame, buckets: Int): DataFrame = {
    val toks = TextIndex.terms(col("text"))
    docs
      .where(size(toks) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("c"), concat_ws(" ", a, b).as("g")))).as("_p"))
      .select(col("doc_id"),
        pmod(xxhash64(col("_p.c")), lit(buckets.toLong)).as("ctx"),
        pmod(xxhash64(col("_p.g")), lit(buckets.toLong)).as("bg"))
  }

  /** Per-document perplexity under a hashed-bigram language model
    * trained on `lmCorpus` — the CCNet filtering signal (Wenzek et al.
    * 2020 score with a KenLM 5-gram; this is the hashed bigram
    * stand-in, vocabulary-free like everything else here):
    * ppl(x) = exp(−mean_i log p̂(w_i | w_{i−1})), with
    * p̂(w|c) = (count(c,w) + α) / (count(c) + α·buckets), both counts
    * bucket-hashed (collisions perturb, never zero, a probability).
    * Low perplexity = looks like the LM corpus. Documents under two
    * tokens carry no bigram and are omitted.
    *
    * Scale shape: both count tables are ≤ `buckets` rows and
    * BROADCAST; scoring is two broadcast joins + one per-doc fold —
    * the same two-corpus-shuffle budget as [[importanceWeights]]. */
  def perplexity(docs: DataFrame, lmCorpus: DataFrame,
      buckets: Int = 65536, alpha: Double = 0.1): DataFrame = {
    val lm = pairRows(lmCorpus, buckets)
    val bg = lm.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val ctx = lm.groupBy(col("ctx")).agg(count(lit(1)).as("c_ctx"))
    pairRows(docs, buckets)
      .join(broadcast(bg), Seq("bg"), "left")
      .join(broadcast(ctx), Seq("ctx"), "left")
      .select(col("doc_id"),
        (log(coalesce(col("c_bg"), lit(0L)) + alpha) -
          log(coalesce(col("c_ctx"), lit(0L)) + alpha * buckets)).as("_lp"))
      .groupBy(col("doc_id"))
      .agg(exp(-avg(col("_lp"))).as("ppl"))
  }

  /** Exact-gram coverage statistics of each raw document against the
    * target corpus's gram set — the oracle-checkable integer core of
    * the importance pipeline (gram construction, explode, target
    * membership, per-doc fold), free of hashing and of float sums:
    * `(doc_id, n_grams, n_hits, n_distinct, n_distinct_hits)`. */
  def gramCoverageStats(raw: DataFrame, target: DataFrame): DataFrame = {
    val tGrams = gramRows(target).select(col("gram")).distinct()
      .withColumn("_hit", lit(1))
    gramRows(raw)
      .join(broadcast(tGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("_hit")).as("n_hits"),
        countDistinct(col("gram")).as("n_distinct"),
        countDistinct(when(col("_hit") === 1, col("gram"))).as("n_distinct_hits"))
  }
}
