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
}
