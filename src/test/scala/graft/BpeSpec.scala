package graft

import graft.operators.{Bpe, Sampling}
import graft.operators.Bpe.BpeModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** BPE tokenizer: trainer differential vs a brute-force reference,
  * greedy-apply ≡ training segmentation, distributed count/tokenize
  * consistency, persistence round trip. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables.load(spark, sfDir, "documents")

  /** Straight-line reference trainer: recount every pair from scratch
    * each merge, pick max by (count desc, left asc, right asc). */
  private def bruteTrain(dict: Seq[(String, Long)], numMerges: Int): Array[(String, String)] = {
    var words = dict.map { case (w, c) => (Bpe.charSymbols(w).toVector, c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + c)
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .headOption.filter(_._2 >= 2).map(_._1)
      best match {
        case None => done = true
        case Some(p) =>
          merges += p
          words = words.map { case (syms, c) =>
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == p._1 && syms(i + 1) == p._2) {
                out += p._1 + p._2; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toVector, c)
          }
      }
    }
    merges.toArray
  }

  /** Segmentation of every dict word after brute training. */
  private def bruteSegment(dict: Seq[(String, Long)],
      merges: Array[(String, String)]): Map[String, Vector[String]] = {
    var words = dict.map { case (w, c) => (w, Bpe.charSymbols(w).toVector) }
    merges.foreach { p =>
      words = words.map { case (w, syms) =>
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == p._1 && syms(i + 1) == p._2) {
            out += p._1 + p._2; i += 2
          } else { out += syms(i); i += 1 }
        }
        (w, out.toVector)
      }
    }
    words.toMap
  }

  test("indexed trainer matches the brute-force reference on random dictionaries") {
    val rng = new scala.util.Random(42)
    // last trial draws from a multi-codepoint alphabet (an emoji is a
    // surrogate pair in UTF-16) — symbol splitting and merging must
    // stay codepoint-correct through training
    val alphabets = Seq("abcde", "abcde", "abcde", "abcde", "ab😀è")
    alphabets.zipWithIndex.foreach { case (alphabet, trial) =>
      val syms = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < alphabet.length) {
          val n = Character.charCount(alphabet.codePointAt(i))
          out += alphabet.substring(i, i + n); i += n
        }
        out.toSeq
      }
      val dict = (0 until 60).map { _ =>
        val len = 2 + rng.nextInt(6)
        (0 until len).map(_ => syms(rng.nextInt(syms.length))).mkString
      }.distinct.map(w => (w, (1 + rng.nextInt(20)).toLong))
      val expect = bruteTrain(dict, numMerges = 30).toSeq
      val got = Bpe.trainFromDict(dict, numMerges = 30).merges.toSeq
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("greedy encodeWord reproduces the training segmentation for dictionary words") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 4L), ("newer", 2L))
    val model = Bpe.trainFromDict(dict, numMerges = 20)
    assert(model.merges.nonEmpty)
    val seg = bruteSegment(dict, model.merges)
    dict.foreach { case (w, _) =>
      assert(Bpe.encodeWord(w, model).toVector == seg(w), s"word $w")
    }
    // an unseen word still encodes (merges apply where they can) and
    // always ends with the end-of-word marker
    val oov = Bpe.encodeWord("lowestest", model)
    assert(oov.last == Bpe.EndOfWord || oov.last.endsWith(Bpe.EndOfWord))
    assert(oov.mkString == "lowestest" + Bpe.EndOfWord)
  }

  test("charSymbols is code-point safe and training is deterministic") {
    // U+1F600 is a surrogate pair in UTF-16; a char split would tear it
    val syms = Bpe.charSymbols("a😀b")
    assert(syms.toSeq == Seq("a", "😀", "b", Bpe.EndOfWord))
    val d = Seq(("abab", 4L), ("abc", 3L), ("😀😀", 5L))
    val m1 = Bpe.trainFromDict(d, 10).merges.toSeq
    val m2 = Bpe.trainFromDict(d, 10).merges.toSeq
    assert(m1 == m2)
  }

  test("tokenCounts and tokenize agree with a driver-side replay over real docs") {
    val model = Bpe.train(docs, numMerges = 100, maxWords = 5000)
    assert(model.merges.length == 100)
    val sample = docs.where(col("doc_id") % 25 === 0)
    val counts = Bpe.tokenCounts(sample, model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seqs = Bpe.tokenize(sample, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = sample.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val words = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      val expect = words.flatMap(w => Bpe.encodeWord(w, model)).toSeq
      assert(seqs(id) == expect, s"doc $id sequence")
      assert(counts(id) == expect.length.toLong, s"doc $id count")
    }
    // real merges learned: subword count sits strictly between the
    // word count and the exact zero-merge symbol count (chars + one
    // end-of-word marker per word)
    val totToks = counts.values.sum
    val totWords = texts.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
    val noMerge = texts.map { case (_, t) =>
      val ws = t.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      ws.map(w => w.codePointCount(0, w.length).toLong + 1L).sum
    }.sum
    assert(totToks > totWords && totToks < noMerge)
  }

  test("tokenCounts and tokenize are total: a wordless document counts 0 with an empty sequence") {
    import spark.implicits._
    val model = Bpe.trainFromDict(Seq(("ab", 5L), ("abc", 3L)), 5)
    val d = Seq((1L, "ab abc"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val counts = Bpe.tokenCounts(d, model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1L, 2L, 3L))
    assert(counts(2L) == 0L && counts(3L) == 0L && counts(1L) > 0L)
    val seqs = Bpe.tokenize(d, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(seqs.keySet == Set(1L, 2L, 3L))
    assert(seqs(2L).isEmpty && seqs(3L).isEmpty)
    assert(seqs(1L).nonEmpty && counts(1L) == seqs(1L).length.toLong)
    // detokenize of the empty sequence is the empty normalization
    val rt = Bpe.tokenize(d, model)
      .select(col("doc_id"), Bpe.detokenize(col("tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt == Map(1L -> "ab abc", 2L -> "", 3L -> ""))
  }

  test("packTokenSequences: exact budget chunks, contiguous ids, shuffle-order replay, conservation") {
    val model = Bpe.train(docs, numMerges = 100, maxWords = 5000)
    val budget = 64L
    val out = Bpe.packTokenSequences(docs, model, budget, subChars = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (sub, rs) =>
      val maxSeq = rs.map(_._2).max
      assert(rs.map(_._2).sorted.toSeq == (0L to maxSeq), s"sub $sub ids")
      rs.foreach { case (_, sid, toks) =>
        if (sid < maxSeq)
          assert(toks.length == budget.toInt, s"sub $sub seq $sid short")
        else assert(toks.length <= budget.toInt && toks.nonEmpty)
      }
    }
    // replay: reading each sub-stratum's sequences in order yields its
    // documents' tokens in shuffle-key order, token for token — and
    // nothing is lost or duplicated
    val keyed = Sampling.shuffleKey(Bpe.tokenize(docs, model),
        col("doc_id"), "pack")
      .select(substring(col("shuffle_key"), 1, 1).as("sub"),
        col("shuffle_key"), col("tokens"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[String](2)))
    keyed.groupBy(_._1).foreach { case (sub, docsIn) =>
      val expect = docsIn.sortBy(_._2).flatMap(_._3).toSeq
      val got = out.filter(_._1 == sub).sortBy(_._2).flatMap(_._3).toSeq
      assert(got == expect, s"sub $sub replay")
    }
  }

  test("packProvenance tiles every sequence and locates every document's exact token slices") {
    val model = Bpe.train(docs, numMerges = 100, maxWords = 5000)
    val budget = 64L
    val packed = Bpe.packTokenSequences(docs, model, budget, subChars = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[String](2)).toMap
    val prov = Bpe.packProvenance(docs, model, budget, subChars = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val docToks = Bpe.tokenize(docs, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // every sequence is tiled exactly: slot ranges are contiguous from
    // 0 and sum to the sequence's length
    prov.groupBy(p => (p._1, p._2)).foreach { case (key, rows) =>
      val seq = packed(key)
      val spans = rows.map(p => (p._4, p._5)).sortBy(_._1).toSeq
      assert(spans.head._1 == 0L, s"$key starts at ${spans.head._1}")
      spans.sliding(2).foreach {
        case Seq((s1, n1), (s2, _)) => assert(s1 + n1 == s2, s"$key gap")
        case _ =>
      }
      assert(spans.map(_._2).sum == seq.length.toLong, s"$key length")
    }
    // every provenance row names the document's actual tokens: the
    // sequence's slice equals the document's corresponding slice
    val docCursor = scala.collection.mutable.HashMap.empty[Long, Int]
    prov.sortBy(p => (p._1, p._2, p._4)).foreach {
      case (sub, sid, docId, start, n) =>
        val seq = packed((sub, sid))
        val off = docCursor.getOrElse(docId, 0)
        assert(seq.slice(start.toInt, (start + n).toInt) ==
          docToks(docId).slice(off, off + n.toInt),
          s"doc $docId slice in $sub/$sid")
        docCursor(docId) = off + n.toInt
    }
    // conservation: every document is fully placed, wordless docs absent
    docCursor.foreach { case (id, consumed) =>
      assert(consumed == docToks(id).length, s"doc $id placed $consumed")
    }
    assert(docCursor.keySet == docToks.filter(_._2.nonEmpty).keySet)
  }

  test("word-dictionary store: append ≡ one-shot, compact folds physically, trainFromStore ≡ train") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-dict").toString
    Bpe.writeWordCounts(docs.where(col("doc_id") % 3 === 0), dir)
    Bpe.appendToWordCounts(docs.where(col("doc_id") % 3 === 1), dir)
    Bpe.appendToWordCounts(docs.where(col("doc_id") % 3 === 2), dir)
    val direct = Bpe.wordCounts(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def stored() = Bpe.readWordCounts(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored() == direct)
    // compaction folds the appended segments into one physical layout
    // without changing the logical dictionary
    Bpe.compactWordCounts(dir)
    assert(stored() == direct)
    assert(spark.read.parquet(dir).count() == direct.size.toLong)
    // the incremental retrain path: training from the store equals
    // training from the corpus (no corpus scan happens here)
    val fromStore = Bpe.trainFromStore(spark, dir, numMerges = 60,
      maxWords = 2000)
    val fromCorpus = Bpe.train(docs, numMerges = 60, maxWords = 2000)
    assert(fromStore.merges.toSeq == fromCorpus.merges.toSeq)
    // a torn commit (sidecar down) refuses instead of serving a
    // possibly half-appended dictionary
    val props = new org.apache.hadoop.fs.Path(dir, "_graft_bpe_dict.properties")
    props.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(props, false)
    val e = intercept[IllegalArgumentException](
      Bpe.readWordCounts(spark, dir).count())
    assert(e.getMessage.contains("sidecar"))
  }

  test("end-to-end assembly: curate → BPE train → token quota → pack composes with conservation") {
    import graft.operators.{Curation, Sampling, TextAnalysis}
    // 1. curate (quality/lang/exact-dedup keep)
    val keptIds = TextAnalysis.curate(docs)
    val kept = docs.join(keptIds, Seq("doc_id"))
    // 2. train the tokenizer on the curated corpus, count real tokens
    val model = Bpe.train(kept, numMerges = 100, maxWords = 5000)
    val counts = Bpe.tokenCounts(kept, model)
    val totalKept = counts.agg(sum("n_tokens")).head().getLong(0)
    // 3. token-budget selection: half the curated token mass
    val budget = totalKept / 2
    val keyed = Sampling.shuffleKey(
      kept.join(counts, Seq("doc_id")), col("doc_id"), "assemble")
    val selected = Sampling.takeTokenQuotas(keyed, lit("all"),
      col("shuffle_key"), col("n_tokens"), Map("all" -> budget))
    val selTokens = Bpe.tokenCounts(selected.select("doc_id", "text"), model)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(selTokens <= budget && selTokens > 0)
    // 4. pack the selection; packed token mass == selected token mass
    val packed = Bpe.packTokenSequences(
      selected.select("doc_id", "text"), model, budget = 64, subChars = 1)
    val packedTokens = packed.agg(sum(size(col("tokens"))))
      .head().getLong(0)
    assert(packedTokens == selTokens,
      s"packed $packedTokens != selected $selTokens")
    // 5. provenance covers exactly the selected wordful docs
    val provDocs = Bpe.packProvenance(
        selected.select("doc_id", "text"), model, budget = 64, subChars = 1)
      .select("doc_id").distinct().count()
    val wordful = selected.select("doc_id", "text")
      .where(size(graft.operators.TextIndex.terms(col("text"))) > 0)
      .count()
    assert(provDocs == wordful)
  }

  test("save/load round trip preserves the model; a bare directory refuses") {
    val model = Bpe.train(docs, numMerges = 50, maxWords = 2000)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.save(spark, model, dir)
    val back = Bpe.load(spark, dir)
    assert(back.merges.toSeq == model.merges.toSeq)
    assert(Bpe.encodeWord("merge", back).toSeq == Bpe.encodeWord("merge", model).toSeq)
    val empty = java.nio.file.Files.createTempDirectory("graft-bpe-none").toString
    val e = intercept[IllegalArgumentException](Bpe.load(spark, empty))
    assert(e.getMessage.contains("sidecar"))
  }
}
