package graft

import graft.functions.Codecs
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private def longs: Seq[Long] =
    Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue) ++ Seq.fill(200)(rng.nextLong())

  test("be64 round-trip") {
    longs.foreach(v => assert(Codecs.decodeBE64(Codecs.encodeBE64(v)) == v))
    assert(Codecs.encodeBE64(1L).toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    assert(Codecs.encodeBE64(-1L).toSeq == Seq.fill(8)(-1.toByte))
  }

  test("le64 round-trip and byte order") {
    longs.foreach(v => assert(Codecs.decodeLE64(Codecs.encodeLE64(v)) == v))
    assert(Codecs.encodeLE64(1L).toSeq == Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
    assert(Codecs.encodeLE64(0x0102030405060708L).toSeq ==
      Codecs.encodeBE64(0x0102030405060708L).reverse.toSeq)
  }

  test("f64 round-trip") {
    (Seq(0.0, -0.0, 1.5, Double.NaN, Double.PositiveInfinity, Double.MinPositiveValue) ++
        Seq.fill(200)(rng.nextDouble())).foreach { v =>
      val back = Codecs.decodeF64(Codecs.encodeF64(v))
      assert(back == v || (back.isNaN && v.isNaN))
    }
  }

  test("murmur64a basics") {
    // empty input with seed 0 folds to 0 by construction of the algorithm
    assert(Codecs.murmur64a(Array.emptyByteArray, 0L) == 0L)
    // deterministic
    val d = "hello-tera".getBytes("UTF-8")
    assert(Codecs.murmur64a(d) == Codecs.murmur64a(d))
    // seed-sensitive and content-sensitive
    assert(Codecs.murmur64a(d, 1L) != Codecs.murmur64a(d, 2L))
    assert(Codecs.murmur64a("a".getBytes) != Codecs.murmur64a("b".getBytes))
    // every tail length 0..15 hashes distinctly (exercises the tail switch)
    val hashes = (0 to 15).map(n => Codecs.murmur64a(Array.fill(n)(7.toByte)))
    assert(hashes.distinct.size == hashes.size)
  }

  test("successor is the immediate next key") {
    val k = "row1".getBytes("UTF-8")
    val s = Codecs.successor(k)
    assert(s.length == k.length + 1 && s.last == 0.toByte)
  }

  test("fixed-width LE integers: round-trips, sign/zero extension, padding") {
    for (width <- Seq(1, 2, 4, 8); v <- longs) {
      val enc = Codecs.encodeLEInt(v, width)
      assert(enc.length == width + 1, "reference pads one byte")
      val mask = if (width == 8) -1L else (1L << (8 * width)) - 1
      assert(Codecs.decodeLEInt(enc, width, signed = false) == (v & mask))
      // signed decode sign-extends the width's top bit
      val shift = 64 - 8 * width
      assert(Codecs.decodeLEInt(enc, width, signed = true) == ((v & mask) << shift >> shift))
    }
    // 0xff: as uint8 = 255 (> 1), as int8 = -1 (< 1)
    val ff = Codecs.encodeLEInt(0xffL, 1)
    assert(Codecs.decodeLEInt(ff, 1, signed = false) == 255L)
    assert(Codecs.decodeLEInt(ff, 1, signed = true) == -1L)
    // width-8 buffers without the pad byte decode too (engine-written LE64)
    assert(Codecs.decodeLEInt(Codecs.encodeLE64(-2L), 8, signed = true) == -2L)
    // short buffer is total: decodes to 0 like the other codecs
    assert(Codecs.decodeLEInt(Array[Byte](1, 2), 4, signed = false) == 0L)
    // uint64 order via sign-bit bias: the biased signed compare agrees
    // with true unsigned compare on every pair
    for (a <- longs; b <- longs.take(20)) {
      assert(((a ^ Long.MinValue) < (b ^ Long.MinValue)) ==
        (java.lang.Long.compareUnsigned(a, b) < 0))
    }
  }

  test("NFC normalization collapses decomposed sequences; composed text passes through") {
    import org.apache.spark.unsafe.types.UTF8String
    def nfc(s: String): String = Codecs.nfc(UTF8String.fromString(s)).toString
    // e + combining acute (U+0301) composes to U+00E9; already-
    // composed text returns the SAME UTF8String (fast path)
    assert(nfc("cafe\u0301") == "caf\u00e9")
    val composed = UTF8String.fromString("caf\u00e9 plain ascii")
    assert(Codecs.nfc(composed) eq composed)
    // decomposed a + combining tilde collapses to the composed form,
    // idempotently — the canonical pair fingerprints alike after it
    assert(nfc("a\u0303") == "\u00e3")
    assert(nfc(nfc("a\u0303")) == nfc("a\u0303"))
  }

  test("double sortable bits: signed image order equals IEEE total order, involution exact") {
    val vals = Seq(Double.NegativeInfinity, -1e308, -2.0, -1.0, -0.0,
      0.0, Double.MinPositiveValue, 1.0, 2.0, 1e308,
      Double.PositiveInfinity)
    val imgs = vals.map(Codecs.doubleSortableBits)
    assert(imgs == imgs.sorted, "image order broke")
    vals.foreach { v =>
      val back = Codecs.sortableBitsToDouble(Codecs.doubleSortableBits(v))
      assert(java.lang.Double.doubleToRawLongBits(back) ==
        java.lang.Double.doubleToRawLongBits(v), s"roundtrip of $v")
    }
    // NaN images sit above +Inf (excluded upstream, but ordered sanely)
    assert(Codecs.doubleSortableBits(Double.NaN) >
      Codecs.doubleSortableBits(Double.PositiveInfinity))
  }
}
