package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`), for training-data curation at scale.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    All math in double, expression-level (`zip_with` + `aggregate`
  *    fold), norms precomputed per row BEFORE the join so the pairwise
  *    step is one multiply-divide, not a re-reduction.
  *  - [[lshTopK]]: random-hyperplane LSH — the 100 TB path. Vectors
  *    bucket by sign signature; only same-bucket pairs are scored. At
  *    cluster scale the bucket join replaces the full cross product
  *    (candidates/vector ≈ N / 2^planes).
  */
object Similarity {

  /** Sequential-fold dot product in double (native codegen'd
    * expression; fold order matches DuckDB's list_sum for oracle
    * bit-parity). */
  def dot(a: Column, b: Column): Column =
    graft.functions.cellfunctions.vec_dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Exact cosine top-k of `corpus` vectors for each `queries` vector.
    * Output: (qid, rank, vec_id) — ranks are deterministic via
    * (sim desc, vec_id) ordering.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qnorm", norm(col("qv")))
    val c = corpus.select(col("vec_id"), col("embedding").as("cv"))
      .withColumn("cnorm", norm(col("cv")))
    val pairs = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"))
  }

  /** Random-hyperplane sign bucket (deterministic per-table seed).
    * `planes` bits -> int bucket id.
    */
  def hyperplaneBucket(v: Column, dim: Int, planes: Int, seed: Long): Column = {
    val rng = new scala.util.Random(seed)
    val hyper: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
    val bits = hyper.zipWithIndex.map { case (h, i) =>
      val hv = array(h.map(lit): _*)
      when(dot(v, hv) >= 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  private[operators] def withBuckets(df: DataFrame, vecCol: String, dim: Int,
      planes: Int, tables: Int): DataFrame = {
    val entries = (0 until tables).map { t =>
      struct(lit(t).as("table"),
        hyperplaneBucket(col(vecCol), dim, planes, 0x51a7L + t).as("bucket"))
    }
    df.withColumn("_tb", explode(array(entries: _*)))
      .withColumn("table", col("_tb.table"))
      .withColumn("bucket", col("_tb.bucket"))
      .drop("_tb")
  }

  /** LSH-bucketed cosine top-k — multiple hash tables of few planes;
    * candidates are the union of same-bucket vectors across tables,
    * scored exactly once. Approximate — recall measured against
    * [[bruteForceTopK]] in tests. At cluster scale the (table, bucket)
    * equi-join replaces the cross product; candidates/query ≈
    * tables * N / 2^planes.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      planes: Int = 4, tables: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qnorm", norm(col("qv")))
    val c = corpus.select(col("vec_id"), col("embedding").as("cv"))
      .withColumn("cnorm", norm(col("cv")))
    val qB = withBuckets(q, "qv", dim, planes, tables)
      .select("qid", "table", "bucket")
    val cB = withBuckets(c.select(col("vec_id"), col("cv")), "cv", dim, planes, tables)
      .select("vec_id", "table", "bucket")
    val cands = cB.join(broadcast(qB), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val pairs = cands
      .join(q.select(col("qid"), col("qv"), col("qnorm")), "qid")
      .join(c, "vec_id")
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"))
  }
}
