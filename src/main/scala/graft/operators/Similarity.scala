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
      .withColumn("qnorm", norm(col("qv"))).where(col("qnorm") > 0)
    val c = corpus.select(col("vec_id"), col("embedding").as("cv"))
      .withColumn("cnorm", norm(col("cv"))).where(col("cnorm") > 0)
    val pairs = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"))
  }

  /** Int8-quantized cosine top-k — the 4× memory lever for corpus-scale
    * search (float32 embeddings → 1 packed byte per element, so a 100 TB
    * embedding store scans and shuffles a quarter of the bytes, and a
    * broadcast query set carries 4× more vectors under the same budget).
    * Per-vector symmetric quantization; scales CANCEL in cosine, so the
    * similarity is an exact integer dot over packed bytes (codegen'd
    * [[graft.functions.VecDotI8]]) normalized by integer self-norms —
    * deterministic and engine-reproducible (round half-away-from-zero).
    * Rank error vs exact float cosine is the quantization error only
    * (recall asserted in PipelineOpsSpec).
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import graft.functions.cellfunctions.{vec_dot_i8, vec_quant_i8}
    def quantized(df: DataFrame, id: String, q: String, nrm: String): DataFrame =
      df.select(col("vec_id").as(id), vec_quant_i8(col("embedding")).as(q))
        .withColumn(nrm, sqrt(vec_dot_i8(col(q), col(q)).cast("double")))
    // zero vectors quantize to zero norms; their cosine is NaN and Spark
    // sorts NaN ABOVE every real sim — drop them instead of letting one
    // empty embedding become everyone's rank-1 neighbor
    val qs = quantized(queries, "qid", "qq", "qnorm").where(col("qnorm") > 0)
    val cs = quantized(corpus, "vec_id", "cq", "cnorm").where(col("cnorm") > 0)
    val pairs = cs.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .withColumn("sim", vec_dot_i8(col("qq"), col("cq")).cast("double") /
        (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"))
  }

  /** Derived plane matrices, memoized per (seed, dim, planes): they are
    * deterministic, and re-deriving planes×dim gaussians at every query
    * build site was pure redundant driver work. Bounded: one entry per
    * distinct LSH configuration the process ever uses. */
  private val hyperCache = scala.collection.concurrent.TrieMap
    .empty[(Long, Int, Int), Array[Array[Double]]]

  /** Random-hyperplane sign bucket (deterministic per-table seed).
    * `planes` bits -> int bucket id. The plane matrix ships to executors
    * as a codegen reference object, not inlined literals, so high
    * `planes × tables × dim` stays O(1) generated code.
    */
  def hyperplaneBucket(v: Column, dim: Int, planes: Int, seed: Long): Column = {
    val hyper = hyperCache.getOrElseUpdate((seed, dim, planes), {
      val rng = new scala.util.Random(seed)
      Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
    })
    graft.functions.cellfunctions.hyperplane_bucket(v, hyper)
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

  /** Train `nlist` coarse centroids with `iters` Lloyd iterations of
    * spherical k-means (cosine assignment, mean update). Centroids live
    * on the driver between iterations — nlist × dim doubles, a few KB —
    * while every data pass is a distributed job: assignment is an
    * argmax over codegen'd dot products, the update one
    * posexplode + (cluster, pos) average. Deterministic: seeds pick the
    * initial centers by hashed vec_id order, no RNG at runtime.
    */
  def trainCentroids(corpus: DataFrame, dim: Int, nlist: Int,
      iters: Int = 3, seed: Long = 7L): Array[Array[Double]] = {
    val base = corpus.select(col("vec_id"), col("embedding"))
    var centroids: Array[Array[Double]] = base
      .orderBy(xxhash64(col("vec_id"), lit(seed)))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    for (_ <- 0 until iters) {
      val assigned = base.withColumn("cluster",
        assignCluster(col("embedding"), centroids))
      val means = assigned
        .select(col("cluster"), posexplode(col("embedding")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val next = Array.fill(centroids.length)(new Array[Double](dim))
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      // empty clusters keep their previous center
      val counts = means.map(_.getInt(0)).toSet
      centroids = centroids.indices
        .map(i => if (counts(i)) next(i) else centroids(i)).toArray
    }
    centroids
  }

  /** Argmax-cosine cluster id for a vector column against fixed
    * centroids. Centroids are pre-normalized (cosine == dot after that;
    * the vector's own norm is constant across the argmax) and travel as
    * a codegen reference object — O(1) generated code at any nlist,
    * where inlined literals stop compiling around nlist ≈ thousands.
    */
  private[operators] def assignCluster(v: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.cellfunctions.nearest_centroid(v,
      graft.functions.CentroidOps.normalizeRows(centroids))

  /** Per-row top-`nprobe` cluster ids (for the query side of IVF). */
  private[operators] def probeClusters(v: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column =
    graft.functions.cellfunctions.top_centroids(v,
      graft.functions.CentroidOps.normalizeRows(centroids), nprobe)

  // ---- IVF index persistence --------------------------------------
  // Centroids are nlist × dim doubles — a few KB to a few MB — and the
  // expensive part of the index is the `iters` full training passes, so
  // they persist NEXT TO the data like the table descriptor does
  // (CellLogStore.writeDesc; the reference's analogue: schema knobs
  // persist in master meta, tera table_schema.proto:31-64). A reopened
  // table probes without retraining.

  private val CentroidsFile = "_graft_ivf_centroids.txt"

  /** Persist centroids under `dir` (one row per line, exact-round-trip
    * doubles via Double.toString/parseDouble). Write-then-rename, and
    * raw stream writes rather than a PrintWriter (which swallows
    * IOExceptions into an internal flag): a failed write must THROW,
    * never persist a truncated index, and never expose a half-written
    * file to a concurrent reader. */
  def writeCentroids(spark: org.apache.spark.sql.SparkSession, dir: String,
      centroids: Array[Array[Double]]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(dir, CentroidsFile)
    val tmp = new org.apache.hadoop.fs.Path(dir, CentroidsFile + ".tmp")
    val fs = path.getFileSystem(conf)
    val bytes = centroids.map(_.mkString(",")).mkString("", "\n", "\n")
      .getBytes("UTF-8")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"failed to move $tmp to $path")
  }

  def readCentroids(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[Array[Array[Double]]] = {
    val path = new org.apache.hadoop.fs.Path(dir, CentroidsFile)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        Some(src.getLines().filter(_.nonEmpty)
          .map(_.split(",").map(java.lang.Double.parseDouble)).toArray)
      } finally in.close()
    }
  }

  /** Load persisted centroids from `indexDir`, or train and persist them
    * there. Loading is a driver-side file read — no Spark jobs, no
    * training passes. The stored index must MATCH the request: a dim
    * mismatch throws (dotRow would silently truncate to the shorter
    * length and assign plausibly-wrong clusters), and an nlist mismatch
    * retrains and overwrites (the stored index answers a different
    * pruning granularity than the caller asked for).
    */
  def loadOrTrainCentroids(corpus: DataFrame, dim: Int, nlist: Int,
      iters: Int, indexDir: String): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    readCentroids(spark, indexDir) match {
      case Some(c) if c.exists(_.length != dim) =>
        throw new IllegalArgumentException(
          s"stored IVF index at $indexDir has dim ${c.head.length}, " +
            s"requested $dim — delete the index or fix the request")
      case Some(c) if c.length == nlist => c
      case _ =>
        val c = trainCentroids(corpus, dim, nlist, iters)
        writeCentroids(spark, indexDir, c)
        c
    }
  }

  /** IVF (inverted-file) cosine top-k — the coarse-quantizer ANN path:
    * the corpus is assigned once to its nearest of `nlist` centroids
    * (the inverted lists); each query probes only its `nprobe` closest
    * lists, so the scored candidates are ≈ nprobe/nlist of the corpus —
    * real pruning even at low similarity thresholds, where sign-bucket
    * LSH degrades. Candidates are scored exactly; recall measured vs
    * [[bruteForceTopK]] in tests. Index build cost = `iters` passes —
    * paid once when `indexDir` is given (centroids persist there and a
    * reopened table skips retraining).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
      indexDir: Option[String] = None): DataFrame = {
    val centroids = indexDir
      .map(loadOrTrainCentroids(corpus, dim, nlist, iters, _))
      .getOrElse(trainCentroids(corpus, dim, nlist, iters))
    val c = corpus.select(col("vec_id"), col("embedding").as("cv"))
      .withColumn("cnorm", norm(col("cv")))
      .withColumn("cluster", assignCluster(col("cv"), centroids))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qnorm", norm(col("qv")))
      .withColumn("cluster", explode(probeClusters(col("qv"), centroids, nprobe)))
    val pairs = c.join(broadcast(q), Seq("cluster"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"))
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
