package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality analysis for training-data curation: token counting,
  * quality ratios, language-ID heuristic, fingerprinting. All
  * expression-level (codegen'd, no UDFs) and engine-portable: every
  * metric is reproducible in ANSI-ish SQL for oracle checks.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ", -1)
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Characters per token, whitespace excluded (int/int in double). */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - 1)).cast("double") / n.cast("double")
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      length(text).cast("double")

  private val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwordsEn.map(x => x: Any): _*)))
      .cast("double") / size(toks).cast("double")
  }

  /** Composite quality row per document. */
  def qualityTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      avgTokenLen(col("text")).as("avg_token_len"),
      punctRatio(col("text")).as("punct_ratio"),
      stopwordRatio(col("text")).as("stopword_ratio"))

  /** Language-ID heuristic: distinctive-stopword voting. Deterministic
    * and SQL-reproducible; returns the arg-max language or 'und' when no
    * dictionary token appears. (The real-corpus version would use
    * character n-gram profiles; the mechanism — per-language score +
    * arg-max — is the same shape.)
    */
  private val langDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langDicts.map { case (lang, dict) =>
      (lang, size(filter(toks, t => t.isin(dict.map(x => x: Any): _*))))
    }
    // arg-max with fixed precedence order (en > es > de) on ties
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Content fingerprint: md5 of lowercased text (exact-dup key). */
  def fingerprint(text: Column): Column = md5(encode(lower(text), "UTF-8"))

  /** One-pass curation gate — the composed front of a training-data
    * pipeline: token-count and punctuation quality bounds + target
    * language + exact-dedup keep (lowest doc_id per content
    * fingerprint). Every gate is a per-row codegen'd expression
    * evaluated in the SAME scan; the dedup keep is the single shuffle.
    * Survivors feed the next stages (near-dup, tokenization, packing).
    */
  def curate(docs: DataFrame, lang: String = "en", minTokens: Int = 5,
      maxPunctRatio: Double = 0.2): DataFrame =
    docs.where(
        tokenCount(col("text")) >= minTokens &&
        punctRatio(col("text")) <= maxPunctRatio &&
        langId(col("text")) === lang)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

  /** Benchmark decontamination: drop corpus documents sharing ANY
    * word n-gram with a benchmark/heldout set — the standard guard
    * against test-set leakage in training data (documents too short to
    * hold an n-gram cannot leak and are kept).
    *
    * Scale shape: a benchmark is small by definition, so its distinct
    * gram set BROADCASTS; the corpus side is one n-gram explode
    * streamed through the broadcast semi-join (no gram-set shuffle —
    * the explode is not deduped, membership is all that matters). The
    * only exchanges are the contaminated-id distinct (bounded by the
    * corpus DOC count, not its gram count) and the final broadcast
    * anti-join.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 3): DataFrame = {
    val benchGrams = Dedup.shingleRows(benchmark, n, distinctRows = false)
      .select(col("s")).distinct()
    val contaminated = Dedup.shingleRows(corpus, n, distinctRows = false)
      .join(broadcast(benchGrams), "s")
      .select(col("doc_id"))
      .distinct()
    // the anti-join is left to AQE: contaminated is usually broadcast-
    // sized, but a heavily leaked corpus shouldn't be forced through one
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }
}
