package graft.operators

import graft.functions.cellfunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), n-gram Jaccard, MinHash + LSH banding, SimHash.
  *
  * Scale design: everything is expression-level per row (shingling,
  * signatures) plus equi-shuffles on compact keys (band buckets), never
  * an all-pairs product. The only quadratic step — candidate-pair exact
  * verification — runs on the LSH-pruned candidate set.
  */
object Dedup {

  /** Word tokens (documents are whitespace-delimited). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Distinct n-word shingles of a token array; empty when < n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Exact Jaccard similarity of two string arrays (as double). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** doc_id + distinct shingle set per document. */
  def shingleTable(docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      shingles(tokens(col(textCol)), n).as("shingles"))
      .where(size(col("shingles")) > 0)

  /** MinHash signatures: `numHashes` independent hash functions per
    * shingle (xxhash64 seeded by the function index — overflow-free
    * under ANSI arithmetic), taking the min per function.
    */
  def minhashSignatures(shingled: DataFrame, numHashes: Int = 128): DataFrame = {
    val sigCols: Seq[Column] = (0 until numHashes).map { i =>
      array_min(transform(col("shingles"), s => xxhash64(lit(i), s)))
    }
    shingled.select(col("doc_id"), col("shingles"), array(sigCols: _*).as("sig"))
  }

  /** LSH band buckets: signature split into `bands` bands of `rowsPerBand`
    * hashes; docs sharing any (band, bucket) become candidate pairs.
    */
  def lshCandidatePairs(signed: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        hash(slice(col("sig"), bi * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }
    val buckets = signed
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Near-duplicate pairs: MinHash-LSH candidates, exact-Jaccard verified.
    * With (numHashes=128, bands=32, rows=4) recall at J >= 0.8 is
    * 1-(1-0.8^4)^32 ≈ 1-5e-8 — the candidate step prunes, the verify step
    * decides, so output pairs are exactly the >= threshold pairs LSH
    * surfaced.
    */
  def minhashNearDuplicates(
      docs: DataFrame,
      threshold: Double = 0.8,
      shingleLen: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    val sh = shingleTable(docs, shingleLen)
    val signed = minhashSignatures(sh, numHashes)
    val cands = lshCandidatePairs(signed, bands, numHashes / bands)
    val shA = sh.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    cands.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard between consecutive doc ids (a bounded,
    * oracle-checkable instance of pairwise similarity). */
  def consecutivePairJaccard(docs: DataFrame, shingleLen: Int = 3): DataFrame = {
    val sh = shingleTable(docs, shingleLen)
    val a = sh.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val b = sh.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"),
      col("shingles").as("sh_b"))
    a.join(b, "id_a")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** 64-bit SimHash of a token array (custom Catalyst expression: per
    * token a murmur64a; each hash bit votes ±1; the sign of each
    * bit-position total forms the fingerprint). Near-duplicates land
    * within small Hamming distance.
    */
  def simhash64(toks: Column): Column = graft.functions.cellfunctions.simhash64(toks)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicates between consecutive doc ids. */
  def consecutiveSimhashPairs(docs: DataFrame, maxDistance: Int = 8): DataFrame = {
    val fp = docs.select(col("doc_id"), simhash64(tokens(col("text"))).as("fp"))
    val a = fp.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fp.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"),
      col("fp").as("fp_b"))
    a.join(b, "id_a")
      .select(col("id_a"), col("id_b"),
        hamming64(col("fp_a"), col("fp_b")).cast("int").as("distance"))
      .where(col("distance") <= maxDistance)
  }
}
