package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-stratum sampling for corpus curation (domain
  * balancing, heldout carving). `DataFrame.sampleBy`'s Bernoulli draws
  * depend on seed AND partition layout, so two runs of the same
  * pipeline can train on different rows; these operators are exact and
  * reproducible: rank within the stratum in a stable order, keep by
  * rank. One window shuffle on the stratum key; AQE handles stratum
  * skew like any other aggregation key.
  */
object Sampling {

  /** Rank rows within (parts, order) and keep those whose rank passes
    * `keep` — under a rank column name that cannot collide with (and
    * silently drop) a caller's own column. */
  private def ranked(df: DataFrame, parts: Seq[Column], orders: Column*)
      (keep: Column => Column): DataFrame = {
    val rn = Iterator.from(0).map(i => s"_rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn,
        row_number().over(Window.partitionBy(parts: _*).orderBy(orders: _*)))
      .where(keep(col(rn)))
      .drop(rn)
  }

  /** Systematic 1-in-`k` sample per stratum: keeps ranks 1, k+1, 2k+1, …
    * of the stratum's `order`-sorted rows — every stratum is sampled at
    * the same rate regardless of its size.
    *
    * Scale: a corpus usually has FEW strata (domains), and a window
    * partitioned on the stratum alone would push the whole corpus
    * through |strata| tasks. `subStratum` splits each stratum into
    * deterministic sub-partitions the sample rate applies to
    * independently — e.g. `col("doc_id") % 256` — restoring full
    * parallelism while keeping the selection exact, reproducible, and
    * reproducible OUTSIDE the engine too (a plain modulo, unlike a
    * partition-dependent Bernoulli draw or an engine-specific hash).
    * Per-stratum sample size stays within +1 row per sub-stratum of
    * n/k.
    */
  def systematic(df: DataFrame, stratum: Column, order: Column,
      k: Int, subStratum: Option[Column] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ranked(df, stratum +: subStratum.toSeq, order)(rn => (rn - 1) % k === 0)
  }

  /** Sequence packing for training-data assembly (the concat-then-chunk
    * shape: documents are concatenated in a deterministic order and cut
    * into fixed token-budget sequences, so a document can straddle a
    * boundary). Emits each row's sequence id and starting offset within
    * it: `seq_id = floor(exclusive-cumulative-tokens / budget)` over the
    * stratum's `order`.
    *
    * Scale: same sub-stratification lever as [[systematic]] — a corpus
    * has few strata, so pass `subStratum` (e.g. a shard id) to keep the
    * cumulative-sum window parallel; each (stratum, sub-stratum) packs
    * independently, which is exactly how a multi-worker tokenizer run
    * behaves anyway.
    */
  def packSequences(df: DataFrame, tokenCount: Column, budget: Long,
      stratum: Column, order: Column,
      subStratum: Option[Column] = None): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // seq_id/seq_offset are this function's documented output contract —
    // fail fast rather than emit ambiguous duplicates
    Seq("seq_id", "seq_offset").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column (packSequences emits it)"))
    val w = Window.partitionBy((stratum +: subStratum.toSeq): _*).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumul = sum(tokenCount).over(w) - tokenCount
    // both outputs in ONE select so Catalyst plans a single Window node
    // (chained withColumn re-instantiates the partition expression and
    // plans a second window + shuffle)
    df.select(col("*"),
      floor(cumul / budget).as("seq_id"),
      (cumul % budget).as("seq_offset"))
  }

  /** Deterministic corpus shuffle for epoch ordering: a content-free,
    * seed-keyed permutation key (md5 of seed + id — portable across
    * engines, unlike partition-dependent `rand`). Consumers sort or
    * range-partition by `shuffle_key`; materializing a global ordinal
    * is deliberately left out (a global row_number is a single-task
    * window — the key itself IS the order, and a range-partitioned
    * write by it scales).
    */
  def shuffleKey(df: DataFrame, id: Column, seed: String): DataFrame = {
    require(!df.columns.contains("shuffle_key"),
      "input already has a 'shuffle_key' column (shuffleKey emits it)")
    df.withColumn("shuffle_key", md5(concat(lit(seed), id.cast("string"))))
  }

  /** Epoch-shuffle export — the write stage [[shuffleKey]]'s contract
    * points at: rows land range-partitioned AND sorted by the
    * seed-keyed permutation key, so the written files ARE the shuffled
    * corpus in on-disk order (file k's keys all precede file k+1's) and
    * a sequential trainer reads them in shuffle order with zero
    * further work. One range exchange (sampled boundaries), a
    * per-partition sort, no global single-task stage, no driver
    * ordinal materialization.
    */
  def writeShuffled(df: DataFrame, id: Column, seed: String, path: String,
      partitions: Int): Unit = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    shuffleKey(df, id, seed)
      .repartitionByRange(partitions, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
      .write.mode("overwrite").parquet(path)
  }

  /** Temperature-damped domain mixing: each stratum's share of a total
    * `budget` is proportional to `count^(1/2)` instead of `count` — the
    * standard move for keeping head domains/languages from drowning the
    * tail when assembling a corpus (square-root damping is temperature
    * sampling at alpha = 0.5). The exponent is FIXED at 1/2 because the
    * whole derivation then stays engine-exact and reproducible:
    * `floor(sqrt(n))` is IEEE-exact integer weighting (a general
    * `pow(n, alpha)` is not bit-specified across engines), and quota =
    * `budget * w / sum(w)` in integer arithmetic. Selection is
    * [[takeQuotas]]' deterministic lowest-`order`-first.
    *
    * The stratum census collects to the driver — |strata| rows (domains
    * or languages), the same bounded-scalar-handshake class as IVF
    * centroids; the data path stays distributed.
    */
  def temperatureQuotas(df: DataFrame, stratum: Column, order: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // NULL strata claim no quota (default 0 below drops their rows) —
    // excluding them here keeps the quota map null-free
    val census = df.where(stratum.isNotNull)
      .groupBy(stratum.cast("string").as("_stratum"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val weighted = census.map { case (s, n) => (s, math.sqrt(n.toDouble).toLong) }
    val z = weighted.map(_._2).sum
    val quotas = weighted
      .map { case (s, w) => s -> (if (z == 0) 0L else budget * w / z) }
      .toMap
    takeQuotas(df, stratum, order, quotas, defaultQuota = 0L)
  }

  /** Deterministic train/val/test split: each row's md5(seed ++ id) is
    * compared against cumulative-fraction thresholds and the row gets
    * the matching `fractions` name in a new `split` column. The compare
    * happens on the digest's leading 16 hex chars as fixed-width
    * lowercase hex, where lexicographic order IS numeric order — so the
    * assignment is a pure per-row expression: no shuffle, no partition
    * or seed-stream dependence (unlike `randomSplit`), and bit-exact
    * reproducible in any engine with md5 (thresholds via
    * [[splitThresholds]]). Changing `seed` re-deals the split;
    * membership is stable under corpus growth (a new row never moves an
    * old row between splits — the property heldout carving needs).
    */
  def assignSplits(df: DataFrame, id: Column, seed: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(!df.columns.contains("split"),
      "input already has a 'split' column (assignSplits emits it)")
    require(fractions.size >= 2, "need at least two splits")
    require(fractions.map(_._1).distinct.size == fractions.size,
      "split names must be distinct")
    require(fractions.forall(_._2 > 0), "fractions must be > 0")
    val total = fractions.map(f => BigDecimal.valueOf(f._2)).sum
    require((total - 1).abs < BigDecimal("1e-9"),
      s"fractions must sum to 1, got $total")
    // a NULL id hashes to a NULL key, which every `<` branch passes
    // over — the row would silently land in the LAST split
    // (conventionally test/heldout). Malformed keys must be loud, not
    // contamination.
    val key = when(id.isNull,
        raise_error(lit("assignSplits: null id (every row needs a key)")))
      .otherwise(substring(md5(concat(lit(seed), id.cast("string"))), 1, 16))
    val expr = fractions.init.map(_._1).zip(splitThresholds(fractions))
      .foldRight(lit(fractions.last._1): Column) {
        case ((name, th), rest) => when(key < lit(th), lit(name)).otherwise(rest)
      }
    df.withColumn("split", expr)
  }

  /** The 16-hex-digit boundaries [[assignSplits]] compares against
    * (one per split except the last) — exposed so external systems and
    * SQL oracles can reproduce the exact assignment. Computed in exact
    * decimal arithmetic: `floor(cumulative_fraction * 2^64)` as
    * zero-padded lowercase hex.
    */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[String] = {
    fractions.init.map(f => BigDecimal.valueOf(f._2))
      .scanLeft(BigDecimal(0))(_ + _).tail
      .map { c =>
        val v = (c * BigDecimal(BigInt(1) << 64))
          .setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
        String.format("%016x", v.bigInteger)
      }
  }

  /** Exactly the first `n` rows of each stratum in `order` — fixed
    * per-domain quotas (the balancing counterpart of [[systematic]]'s
    * fixed rate). Quotas are small by construction, so the per-stratum
    * window is acceptable here; for rate-based sampling of huge strata
    * use [[systematic]] with a `subStratum`.
    */
  def takePerStratum(df: DataFrame, stratum: Column, order: Column,
      n: Int): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    ranked(df, Seq(stratum), order)(rn => rn <= n)
  }

  /** Per-stratum quota MAP — the domain-mixing form: each stratum gets
    * its own document budget (e.g. derived from target mixture weights),
    * strata absent from the map contribute `defaultQuota` (default 0 =
    * dropped). Deterministic like [[takePerStratum]]; the quota lookup
    * is a literal CASE expression, not a join, so the plan stays one
    * window shuffle.
    */
  def takeQuotas(df: DataFrame, stratum: Column, order: Column,
      quotas: Map[String, Long], defaultQuota: Long = 0L): DataFrame = {
    require(quotas.values.forall(_ >= 0) && defaultQuota >= 0,
      "quotas must be >= 0")
    ranked(df, Seq(stratum), order)(rn =>
      rn <= quotaExpr(stratum.isNull, stratum.cast("string"), quotas,
        defaultQuota))
  }

  /** Per-stratum quota lookup as a flat map literal, not a nested CASE
    * chain: web-corpus quota maps have thousands of domains, and a
    * |quotas|-deep when/otherwise tree is O(|quotas|) per row and a
    * driver stack overflow waiting at analysis time. NULL strata
    * (ordinary in web-corpus domain columns) can't be map keys —
    * element_at NPEs on one — so `isNull` guards them onto the default.
    */
  private def quotaExpr(isNull: Column, key: Column,
      quotas: Map[String, Long], defaultQuota: Long): Column =
    if (quotas.isEmpty) lit(defaultQuota)
    else when(isNull, lit(defaultQuota)).otherwise(coalesce(
      element_at(typedLit(quotas), key), lit(defaultQuota)))

  /** Per-stratum TOKEN budgets — the data-mixture form of
    * [[takeQuotas]]: each stratum keeps its `orderHex`-first documents
    * while the stratum's running token total stays within its quota,
    * i.e. the deterministic "truncate each source's shuffled stream at
    * its token allocation" step of corpus assembly. Selection is a
    * prefix take-while (token counts are required >= 0, so the running
    * sum is monotone and `cum <= quota` IS the prefix).
    *
    * Scale shape: a per-stratum cumulative sum is the textbook skew
    * trap — a window partitioned on the stratum alone pushes the whole
    * corpus through |strata| tasks. This runs a DISTRIBUTED prefix sum
    * instead: `orderHex` (a uniformly-distributed sortable hex key —
    * [[shuffleKey]]'s md5, unique per row) is prefix-bucketed into
    * 16^`bucketChars` order-aligned ranges, the heavy cumulative sum
    * windows over (stratum, bucket), and each bucket's starting offset
    * comes from a tiny (|strata| x buckets)-row totals table that
    * broadcast-joins back. Every corpus-sized stage is fully parallel;
    * the only narrow window runs over the totals table.
    */
  def takeTokenQuotas(df: DataFrame, stratum: Column, orderHex: Column,
      tokenCount: Column, quotas: Map[String, Long],
      defaultQuota: Long = 0L, bucketChars: Int = 2): DataFrame = {
    require(quotas.values.forall(_ >= 0) && defaultQuota >= 0,
      "quotas must be >= 0")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1, 8], got $bucketChars")
    require(!df.columns.exists(_.startsWith("_mix_")),
      "input already has _mix_* columns (takeTokenQuotas uses them internally)")
    // null strata flow as their own stratum under the default quota;
    // (isnull, coalesced-value) keys keep null off the join/group keys
    // (a null equi-join key silently drops the rows)
    val base = df.select(col("*"),
      coalesce(stratum.cast("string"), lit("")).as("_mix_s"),
      stratum.isNull.as("_mix_snull"),
      orderHex.as("_mix_o"),
      tokenCount.cast("long").as("_mix_t"),
      substring(orderHex, 1, bucketChars).as("_mix_b"))
    val localW = Window
      .partitionBy(col("_mix_s"), col("_mix_snull"), col("_mix_b"))
      .orderBy(col("_mix_o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = base
      .groupBy(col("_mix_s"), col("_mix_snull"), col("_mix_b"))
      .agg(sum(col("_mix_t")).as("_mix_btot"))
    val offW = Window.partitionBy(col("_mix_s"), col("_mix_snull"))
      .orderBy(col("_mix_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("_mix_s"), col("_mix_snull"), col("_mix_b"),
      coalesce(sum(col("_mix_btot")).over(offW), lit(0L)).as("_mix_off"))
    val quota = quotaExpr(col("_mix_snull"), col("_mix_s"), quotas,
      defaultQuota)
    base
      .withColumn("_mix_cum", sum(col("_mix_t")).over(localW))
      .join(broadcast(offsets), Seq("_mix_s", "_mix_snull", "_mix_b"))
      .where(col("_mix_off") + col("_mix_cum") <= quota)
      .drop("_mix_s", "_mix_snull", "_mix_b", "_mix_o", "_mix_t",
        "_mix_cum", "_mix_off")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 97(5), 2006 —
    * the A-ES scheme): every row draws a deterministic uniform
    * u ∈ (0, 1] from md5 bits of `(seed, id)` — the same keyed-
    * permutation idiom as [[shuffleKey]] — and the k rows with the
    * largest u^(1/w) are the sample. Equivalently (and as computed
    * here, the numerically stable form) the k SMALLEST exponential
    * race keys `-ln(u) / w`: a row's chance of winning any given draw
    * is proportional to its weight among the rows still unsampled,
    * which is the sequential weighted-urn-without-replacement
    * semantics [[ppsSample]]'s with-multiplicity design cannot give.
    * Deterministic and reproducible across runs and partitionings (the
    * key is a pure function of id and seed), but NOT SQL-replayable:
    * the key crosses `ln`, and cross-engine transcendental comparison
    * is exactly what this repo's gates avoid (see the nDCG discount
    * literals) — so the gate row is rows-only and the exactness
    * contract is spec-proven against a driver replay instead.
    *
    * Rows with weight <= 0, null, or NaN cannot win a draw (an urn
    * with no tickets — NaN needs its own test: Spark's comparison
    * semantics order NaN above every number, so `weight > 0` alone
    * would let NaN through with a NaN race key). `k` bounds driver
    * memory through the standard top-k plan (TakeOrderedAndProject —
    * per-partition heaps, one k-row merge; use
    * [[ppsSampleBy]]/[[weightedSampleBy]] shapes for per-stratum
    * budgets instead of one giant global k).
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
      seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val kc = wsKeyName(df)
    // id tie-breaks the race: duplicate ids draw IDENTICAL keys (the
    // key is a pure function of (seed, id)), so a key-only sort would
    // make the k-boundary depend on partitioning — the secondary sort
    // keeps the documented reproducibility contract even then
    df.where(ticketed(weight))
      .withColumn(kc, aesKey(id, weight, seed))
      .orderBy(col(kc), id)
      .limit(k)
      .drop(kc)
  }

  /** Per-stratum [[weightedSample]]: an independent k-row weighted
    * draw inside every stratum (null strata flow as their own
    * stratum). The rank filter over the per-stratum key order plans as
    * WindowGroupLimit — per-partition partial top-k before the
    * stratum shuffle — so few-strata corpora do not funnel through
    * |strata| tasks. */
  def weightedSampleBy(df: DataFrame, stratum: Column, id: Column,
      weight: Column, kPerStratum: Int, seed: String): DataFrame = {
    require(kPerStratum >= 1, s"kPerStratum must be >= 1, got $kPerStratum")
    val kc = wsKeyName(df)
    val base = df.where(ticketed(weight))
      .withColumn(kc, aesKey(id, weight, seed))
    ranked(base, Seq(stratum), col(kc), id)(_ <= kPerStratum)
      .drop(kc)
  }

  /** A weight holds tickets iff it is a positive real number. */
  private def ticketed(weight: Column): Column =
    weight.isNotNull && !isnan(weight.cast("double")) && weight > 0

  /** Collision-safe race-key column name (the [[ranked]] idiom). */
  private def wsKeyName(df: DataFrame): String =
    Iterator.from(0).map(i => s"_ws_key$i")
      .find(n => !df.columns.contains(n)).get

  /** The A-ES race key `-ln(u) / w` with u ∈ (0, 1] from the first 13
    * md5 hex chars of `(seed, id)` (52 bits — a double's full
    * precision; +1 keeps u strictly positive so ln is finite). */
  private def aesKey(id: Column, weight: Column, seed: String): Column =
    -log((conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 13),
      16, 10).cast("double") + 1d) / math.pow(16d, 13d)) /
      weight.cast("double")

  /** Systematic probability-proportional-to-size sampling (the classic
    * PPS design, e.g. Madow 1949): lay every row's integer `weight`
    * end-to-end along a line in `orderHex` order, then take one row at
    * every `step = totalW / k` marks — a row is selected iff its
    * interval covers a mark, so inclusion probability is exactly
    * `weight / step` (capped at full multiplicity for heavy rows), and
    * a row heavier than `step` is selected with multiplicity
    * (`pps_hits` > 1), which is what keeps a token-weighted draw
    * unbiased. Deterministic and engine-portable by construction: the
    * order key is [[shuffleKey]]'s md5, the mark phase is the caller's
    * `offset` parameter, and every computation is integer arithmetic —
    * the whole draw replays in plain SQL (oracle-gated,
    * q_x_sample_pps).
    *
    * Scale: the same distributed prefix sum as [[takeTokenQuotas]] —
    * hex-prefix buckets carry the heavy cumulative window in parallel,
    * a (buckets)-row totals table broadcast-joins starting offsets
    * back, and the grand total rides the same tiny table as a one-row
    * broadcast (no driver collect). Weights must be non-negative longs;
    * totals stay exact below 2^53 (the long-division helper crosses a
    * double) — 2.5e13 tokens at 100 TB leaves 350× headroom.
    */
  def ppsSample(df: DataFrame, orderHex: Column, weight: Column, k: Long,
      offset: Long = 0L, bucketChars: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(offset >= 0, s"offset must be >= 0, got $offset")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1, 8], got $bucketChars")
    require(!df.columns.exists(c => c.startsWith("_pps_") || c == "pps_hits"),
      "input already has _pps_*/pps_hits columns (ppsSample emits them)")
    // exact floor division of non-negative longs below 2^53
    def ldiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val base = df.select(col("*"),
      orderHex.as("_pps_o"),
      weight.cast("long").as("_pps_w"),
      substring(orderHex, 1, bucketChars).as("_pps_b"))
    val localW = Window.partitionBy(col("_pps_b")).orderBy(col("_pps_o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = base.groupBy(col("_pps_b"))
      .agg(sum(col("_pps_w")).as("_pps_btot"))
    val offW = Window.partitionBy().orderBy(col("_pps_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the totals table is 16^bucketChars rows — the empty-frame window
    // below is the one narrow stage, and it runs over that tiny table
    val offsets = totals.select(col("_pps_b"),
      coalesce(sum(col("_pps_btot")).over(offW), lit(0L)).as("_pps_off"))
    val grand = totals.agg(sum(col("_pps_btot")).as("_pps_tot"))
    // marks sit at offset + s*step; a row covers [prev, cum) on the
    // line and is kept iff that interval contains a mark. g(x) counts
    // marks below x, shifted +step so the numerator never goes negative
    val step = greatest(lit(1L), ldiv(col("_pps_tot"), lit(k)))
    val off = pmod(lit(offset), step)
    def marksBelow(x: Column): Column =
      ldiv(x + step - lit(1L) - off, step)
    base
      .withColumn("_pps_cum", sum(col("_pps_w")).over(localW))
      .join(broadcast(offsets), Seq("_pps_b"))
      .crossJoin(broadcast(grand))
      .withColumn("pps_hits",
        (marksBelow(col("_pps_off") + col("_pps_cum")) -
          marksBelow(col("_pps_off") + col("_pps_cum") - col("_pps_w")))
          .cast("int"))
      .where(col("pps_hits") >= 1)
      .drop("_pps_o", "_pps_w", "_pps_b", "_pps_cum", "_pps_off", "_pps_tot")
  }

  /** Per-stratum systematic PPS: [[ppsSample]] run independently
    * inside every stratum, ~`kPerStratum` rows drawn from each
    * domain/source in proportion to weight — the balanced variant a
    * mixture design uses when every source should contribute a fixed
    * number of (token-weighted) samples regardless of its size. Each
    * stratum gets its own line, mark step (`stratumW / kPerStratum`),
    * and offset phase; everything else is the same integer-exact,
    * SQL-replayable arithmetic (oracle-gated, q_x_sample_pps_by).
    *
    * Scale: identical to [[ppsSample]] with the stratum joined into
    * every key — the heavy cumulative window partitions by (stratum,
    * hex bucket), the offsets/totals tables are (|strata| × buckets)
    * and (|strata|) rows and broadcast. Null strata flow as their own
    * stratum (null-safe keys, like [[takeTokenQuotas]]). */
  def ppsSampleBy(df: DataFrame, stratum: Column, orderHex: Column,
      weight: Column, kPerStratum: Long, offset: Long = 0L,
      bucketChars: Int = 2): DataFrame = {
    require(kPerStratum >= 1, s"kPerStratum must be >= 1, got $kPerStratum")
    require(offset >= 0, s"offset must be >= 0, got $offset")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1, 8], got $bucketChars")
    require(!df.columns.exists(c => c.startsWith("_pps_") || c == "pps_hits"),
      "input already has _pps_*/pps_hits columns (ppsSampleBy emits them)")
    def ldiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val base = df.select(col("*"),
      coalesce(stratum.cast("string"), lit("")).as("_pps_s"),
      stratum.isNull.as("_pps_snull"),
      orderHex.as("_pps_o"),
      weight.cast("long").as("_pps_w"),
      substring(orderHex, 1, bucketChars).as("_pps_b"))
    val sKeys = Seq("_pps_s", "_pps_snull")
    val localW = Window
      .partitionBy((sKeys :+ "_pps_b").map(col): _*)
      .orderBy(col("_pps_o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = base
      .groupBy((sKeys :+ "_pps_b").map(col): _*)
      .agg(sum(col("_pps_w")).as("_pps_btot"))
    val offW = Window.partitionBy(sKeys.map(col): _*).orderBy(col("_pps_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("_pps_s"), col("_pps_snull"),
      col("_pps_b"),
      coalesce(sum(col("_pps_btot")).over(offW), lit(0L)).as("_pps_off"))
    val grand = totals.groupBy(sKeys.map(col): _*)
      .agg(sum(col("_pps_btot")).as("_pps_tot"))
    val step = greatest(lit(1L), ldiv(col("_pps_tot"), lit(kPerStratum)))
    val off = pmod(lit(offset), step)
    def marksBelow(x: Column): Column =
      ldiv(x + step - lit(1L) - off, step)
    base
      .withColumn("_pps_cum", sum(col("_pps_w")).over(localW))
      .join(broadcast(offsets), sKeys :+ "_pps_b")
      .join(broadcast(grand), sKeys)
      .withColumn("pps_hits",
        (marksBelow(col("_pps_off") + col("_pps_cum")) -
          marksBelow(col("_pps_off") + col("_pps_cum") - col("_pps_w")))
          .cast("int"))
      .where(col("pps_hits") >= 1)
      .drop("_pps_s", "_pps_snull", "_pps_o", "_pps_w", "_pps_b",
        "_pps_cum", "_pps_off", "_pps_tot")
  }
}
