package graft

import graft.operators.{Bpe, Dedup, Similarity, TextIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential lifecycle fuzz over the persisted stores: random
  * write / append / compact / erase sequences, each step checked
  * against an in-memory model of what the store must now hold. The
  * per-store specs prove the individual transitions (append ≡ rebuild,
  * compact ≡ rebuild-over-survivors, torn-commit refusal); this fuzz
  * binds arbitrary COMPOSITIONS of them — the shape a long-lived
  * corpus store actually experiences. */
class StoreLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private lazy val docs =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** 5 disjoint id-batches of the corpus. */
  private def batch(i: Int): DataFrame =
    docs.where(pmod(col("doc_id"), lit(5)) === i)

  test("minhash index: random append/compact/erase sequences track the id model") {
    val rng = new scala.util.Random(7)
    (0 until 2).foreach { trial =>
      val dir = tmp(s"fuzz-mh-$trial")
      var present = scala.collection.mutable.Set.empty[Long]
      def ids(i: Int): Set[Long] = batch(i).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      Dedup.writeMinhashIndex(batch(0), dir)
      present ++= ids(0)
      var unused = (1 until 5).toList
      (0 until 7).foreach { _ =>
        rng.nextInt(3) match {
          case 0 if unused.nonEmpty =>
            val b = unused.head; unused = unused.tail
            Dedup.appendToMinhashIndex(batch(b), dir)
            present ++= ids(b)
          case 1 if present.nonEmpty =>
            val drop = present.filter(_ => rng.nextBoolean()).toSet
            import spark.implicits._
            Dedup.compactMinhashIndex(dir,
              dropDocs = Some(drop.toSeq.toDF("doc_id")))
            present --= drop
          case _ =>
            Dedup.compactMinhashIndex(dir)
        }
        val stored = spark.read.parquet(dir)
          .select("doc_id").distinct()
          .collect().map(_.getLong(0)).toSet
        assert(stored == present.toSet, s"trial $trial minhash ids")
      }
      // the surviving store still answers: signatures of present docs
      // equal a fresh signing (append/compact never corrupt rows)
      if (present.nonEmpty) {
        val (sl, nh) = Dedup.minhashIndexParams(spark, dir)
        val fresh = Dedup.minhashSignaturesHashed(
          Dedup.shingleHashRows(
            docs.where(col("doc_id").isin(present.toSeq: _*)), sl,
            distinctRows = false), nh)
        val storedSig = spark.read.parquet(dir)
        assert(storedSig.exceptAll(fresh).isEmpty &&
          fresh.exceptAll(storedSig).isEmpty, s"trial $trial signatures")
      }
    }
  }

  test("text index: random append/compact/erase sequences track the postings model") {
    val rng = new scala.util.Random(11)
    val dir = tmp("fuzz-ti")
    val present = scala.collection.mutable.Set.empty[Long]
    def ids(i: Int): Set[Long] = batch(i).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    TextIndex.writeTextIndex(batch(0), dir)
    present ++= ids(0)
    var unused = (1 until 5).toList
    (0 until 6).foreach { step =>
      rng.nextInt(3) match {
        case 0 if unused.nonEmpty =>
          val b = unused.head; unused = unused.tail
          TextIndex.appendToTextIndex(batch(b), dir)
          present ++= ids(b)
        case 1 if present.nonEmpty =>
          val drop = present.filter(_ => rng.nextBoolean()).toSet
          import spark.implicits._
          TextIndex.compactTextIndex(dir,
            dropDocs = Some(drop.toSeq.toDF("doc_id")))
          present --= drop
        case _ =>
          TextIndex.compactTextIndex(dir)
      }
      // postings must equal a fresh tokenization of exactly the
      // present docs — terms, tfs, and docstats included
      val freshDocs = docs.where(col("doc_id").isin(present.toSeq: _*))
      val freshDir = tmp(s"fuzz-ti-fresh-$step")
      TextIndex.writeTextIndex(freshDocs, freshDir)
      val a = spark.read.parquet(s"$dir/postings")
      val b = spark.read.parquet(s"$freshDir/postings")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"step $step postings")
      val da = spark.read.parquet(s"$dir/docstats")
      val db = spark.read.parquet(s"$freshDir/docstats")
      assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
        s"step $step docstats")
    }
  }

  test("BPE dictionary: random append/compact sequences track the additive count model") {
    val rng = new scala.util.Random(13)
    val dir = tmp("fuzz-dict")
    Bpe.writeWordCounts(batch(0), dir)
    val appended = scala.collection.mutable.ArrayBuffer(0)
    var unused = (1 until 5).toList
    (0 until 6).foreach { _ =>
      if (rng.nextBoolean() && unused.nonEmpty) {
        val b = unused.head; unused = unused.tail
        Bpe.appendToWordCounts(batch(b), dir)
        appended += b
      } else Bpe.compactWordCounts(dir)
      val stored = Bpe.readWordCounts(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val model = Bpe.wordCounts(
          docs.where(pmod(col("doc_id"), lit(5)).isin(appended.toSeq: _*)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(stored == model, s"after ops over batches $appended")
    }
  }

  test("PQ index: append/compact/erase compose as pure row filters — codes bit-stable") {
    val emb = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    def vb(i: Int): DataFrame = emb.where(pmod(col("vec_id"), lit(4)) === i)
    val rng = new scala.util.Random(23)
    val dir = tmp("fuzz-pq")
    // model: vec_id -> the full stored row (binary columns normalized),
    // captured when the row first lands; every later state must be
    // exactly the model filtered to surviving ids
    def rowsOf(df: DataFrame): Map[Long, Seq[Any]] =
      df.collect().map { r =>
        val vs = r.toSeq.map {
          case b: Array[Byte] => b.toSeq
          case x => x
        }
        r.getAs[Long]("vec_id") -> vs
      }.toMap
    Similarity.writePqIndex(vb(0), dir, dim = 64, m = 8, ksub = 64,
      nlist = 8)
    var model = rowsOf(spark.read.parquet(dir))
    var unused = (1 until 4).toList
    (0 until 5).foreach { step =>
      rng.nextInt(3) match {
        case 0 if unused.nonEmpty =>
          val b = unused.head; unused = unused.tail
          Similarity.appendToPqIndex(vb(b), dir)
          val now = rowsOf(spark.read.parquet(dir))
          model = model ++ (now -- model.keySet) // adopt the new rows
        case 1 if model.nonEmpty =>
          val drop = model.keySet.filter(_ => rng.nextBoolean())
          import spark.implicits._
          Similarity.compactPqIndex(dir,
            dropVecs = Some(drop.toSeq.toDF("vec_id")))
          model = model -- drop
        case _ =>
          Similarity.compactPqIndex(dir)
      }
      val stored = rowsOf(spark.read.parquet(dir))
      assert(stored == model, s"step $step PQ rows diverged")
    }
    // the surviving index still answers queries through the stored form
    if (model.nonEmpty) {
      val ids = model.keySet
      val queries = emb.where(col("vec_id").isin(ids.toSeq.take(3): _*))
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      val got = Similarity.pqTopKOverIndex(queries, dir, k = 3, nprobe = 8)
      assert(got.count() > 0)
      // every returned candidate survives in the model
      got.select("vec_id").distinct().collect().map(_.getLong(0))
        .foreach(id => assert(ids.contains(id) || id >= 1000000))
    }
  }

  test("simhash store: random append/compact/erase sequences track the fingerprint model") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val dir = tmp("fuzz-sh")
    def ids(i: Int): Set[Long] = batch(i).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    Dedup.writeSimhashIndex(batch(0), dir)
    val present = scala.collection.mutable.Set.empty[Long]
    present ++= ids(0)
    var unused = (1 until 5).toList
    (0 until 6).foreach { step =>
      rng.nextInt(3) match {
        case 0 if unused.nonEmpty =>
          val b = unused.head; unused = unused.tail
          Dedup.appendToSimhashIndex(batch(b), dir)
          present ++= ids(b)
        case 1 if present.nonEmpty =>
          val drop = present.filter(_ => rng.nextBoolean()).toSet
          Dedup.compactSimhashIndex(dir,
            dropDocs = Some(drop.toSeq.toDF("doc_id")))
          present --= drop
        case _ =>
          Dedup.compactSimhashIndex(dir)
      }
      // stored fps equal a fresh fingerprinting of exactly the
      // present docs — values included, not just ids
      val stored = Dedup.readSimhashIndex(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fresh = docs.where(col("doc_id").isin(present.toSeq: _*))
        .select(col("doc_id"), Dedup.simhash64(Dedup.tokens(col("text"))))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stored == fresh, s"step $step simhash fps")
    }
    // torn commit refuses
    val props = new org.apache.hadoop.fs.Path(dir, "_graft_simhash.properties")
    props.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(props, false)
    val e = intercept[IllegalArgumentException](
      Dedup.readSimhashIndex(spark, dir))
    assert(e.getMessage.contains("sidecar"))
  }

  test("string store: random append/compact/erase sequences track the string model") {
    import graft.operators.StringJoin
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val dir = tmp("fuzz-str")
    def strBatch(i: Int): DataFrame = batch(i)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("s"))
    def model(i: Int): Map[Long, String] = strBatch(i)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    StringJoin.writeStringIndex(strBatch(0), dir)
    val present = scala.collection.mutable.Map.empty[Long, String]
    present ++= model(0)
    var unused = (1 until 5).toList
    (0 until 6).foreach { step =>
      rng.nextInt(3) match {
        case 0 if unused.nonEmpty =>
          val b = unused.head; unused = unused.tail
          StringJoin.appendToStringIndex(strBatch(b), dir)
          present ++= model(b)
        case 1 if present.nonEmpty =>
          val drop = present.keySet.filter(_ => rng.nextBoolean()).toSet
          StringJoin.compactStringIndex(dir,
            dropDocs = Some(drop.toSeq.toDF("doc_id")))
          present --= drop
        case _ =>
          StringJoin.compactStringIndex(dir)
      }
      val stored = StringJoin.readStringIndex(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(stored == present.toMap, s"step $step strings")
    }
    // the surviving store still answers, and exactly: an index match
    // equals the direct between-join over the surviving strings
    if (present.nonEmpty) {
      val probe = strBatch(0)
        .select((col("doc_id") + 5000000).as("doc_id"), col("s"))
      val viaStore = StringJoin.matchAgainstStringIndex(probe, dir, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val direct = StringJoin.editMatchesBetween(probe,
          present.toSeq.toDF("doc_id", "s"), 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaStore == direct)
    }
    // torn commit refuses
    val props = new org.apache.hadoop.fs.Path(dir, "_graft_strindex.properties")
    props.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(props, false)
    val e = intercept[IllegalArgumentException](
      StringJoin.readStringIndex(spark, dir))
    assert(e.getMessage.contains("sidecar"))
  }

  test("datasheet store: random append/compact/erase sequences track the report model") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val dir = tmp("fuzz-ds")
    TextAnalysis.writeDatasheetStore(batch(0), dir, batch = "s0")
    val present = scala.collection.mutable.Set(0)
    var unused = (1 until 5).toList
    def exact(df: DataFrame): Map[String, Seq[Long]] =
      df.select(col("source"), col("n_docs"), col("n_tokens"),
          col("total_chars"), col("short_docs"), col("min_chars"),
          col("max_chars"), col("n_langs"))
        .collect().map(r => r.getString(0) -> (1 to 7).map(r.getLong(_)))
        .toMap
    (0 until 6).foreach { step =>
      rng.nextInt(3) match {
        case 0 if unused.nonEmpty =>
          val b = unused.head; unused = unused.tail
          TextAnalysis.appendToDatasheetStore(batch(b), dir, batch = s"s$b")
          present += b
        case 1 if present.size > 1 =>
          val drop = present.toSeq(rng.nextInt(present.size))
          TextAnalysis.compactDatasheetStore(dir,
            dropBatches = Some(Seq(s"s$drop").toDF("batch")))
          present -= drop
        case _ =>
          TextAnalysis.compactDatasheetStore(dir)
      }
      val union = docs.where(pmod(col("doc_id"), lit(5))
        .isin(present.toSeq: _*))
      assert(exact(TextAnalysis.datasheetReport(spark, dir)) ==
        exact(TextAnalysis.corpusReport(union)), s"step $step report")
      assert(TextAnalysis.datasheetBatches(spark, dir)
        .collect().map(_.getString(0)).toSet ==
        present.map(b => s"s$b").toSet, s"step $step batches")
      // the stored length histograms track too: exact per-source median
      val med = TextAnalysis.datasheetQuantile(spark, dir, 0.5)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val model = union.select(col("source"), col("n_chars"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (s, rs) =>
          val sorted = rs.map(_._2).sorted
          s -> sorted((sorted.length + 1) / 2 - 1)
        }
      assert(med == model, s"step $step length medians")
    }
  }

  test("IVF inverted file: random append/compact/erase sequences track the vector model") {
    val emb = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    def vb(i: Int): DataFrame = emb.where(pmod(col("vec_id"), lit(4)) === i)
    def vids(i: Int): Set[Long] = vb(i).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val rng = new scala.util.Random(17)
    val dir = tmp("fuzz-ivf")
    Similarity.writeIvfIndex(vb(0), dir, dim = 64)
    val present = scala.collection.mutable.Set.empty[Long]
    present ++= vids(0)
    var unused = (1 until 4).toList
    (0 until 5).foreach { step =>
      rng.nextInt(3) match {
        case 0 if unused.nonEmpty =>
          val b = unused.head; unused = unused.tail
          Similarity.appendToIvfIndex(vb(b), dir)
          present ++= vids(b)
        case 1 if present.nonEmpty =>
          val drop = present.filter(_ => rng.nextBoolean()).toSet
          import spark.implicits._
          Similarity.compactIvfIndex(dir,
            dropVecs = Some(drop.toSeq.toDF("vec_id")))
          present --= drop
        case _ =>
          Similarity.compactIvfIndex(dir)
      }
      val stored = spark.read.parquet(dir).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(stored == present.toSet, s"step $step ivf ids")
    }
    // cells stay consistent with the stored quantizer: reassigning the
    // survivors with the same centroids reproduces the stored cells
    if (present.nonEmpty) {
      val ix = Similarity.readIvfIndex(spark, dir)
      val reassigned = emb
        .where(col("vec_id").isin(present.toSeq: _*))
        .select(col("vec_id"),
          Similarity.probeClusters(col("embedding"), ix.centroids, 1)
            .getItem(0).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val storedCells = ix.vectors.select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(storedCells == reassigned, "cells drifted across lifecycle")
    }
  }

  test("embedding store: random append/compact/erase sequences track the vector model") {
    import graft.operators.NodeEmbedding
    val tbl = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("node"),
        expr("transform(embedding, x -> CAST(x AS double))").as("emb"))
    def vb(i: Int): DataFrame = tbl.where(pmod(col("node"), lit(4)) === i)
    def vids(i: Int): Set[Long] = vb(i).select("node")
      .collect().map(_.getLong(0)).toSet
    val rng = new scala.util.Random(23)
    val dir = tmp("fuzz-emb")
    NodeEmbedding.writeEmbeddings(vb(0), dir)
    val present = scala.collection.mutable.Set.empty[Long]
    present ++= vids(0)
    var unused = (1 until 4).toList
    (0 until 6).foreach { step =>
      rng.nextInt(3) match {
        case 0 if unused.nonEmpty =>
          val b = unused.head; unused = unused.tail
          NodeEmbedding.appendToEmbeddings(vb(b), dir)
          present ++= vids(b)
        case 1 if present.nonEmpty =>
          val drop = present.filter(_ => rng.nextBoolean()).toSet
          import spark.implicits._
          NodeEmbedding.compactEmbeddings(dir,
            dropNodes = Some(drop.toSeq.toDF("node")))
          present --= drop
        case _ =>
          NodeEmbedding.compactEmbeddings(dir)
      }
      val stored = spark.read.parquet(dir).select("node")
        .collect().map(_.getLong(0)).toSet
      assert(stored == present.toSet, s"step $step embedding ids")
    }
    // surviving vectors are BIT-identical to the source rows —
    // append/compact never touch stored bytes
    if (present.nonEmpty) {
      val back = NodeEmbedding.readEmbeddings(spark, dir)
      val want = tbl.where(col("node").isin(present.toSeq: _*))
      assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
        "vectors drifted across lifecycle")
    }
  }
}
