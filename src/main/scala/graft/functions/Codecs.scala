package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-Scala byte codecs used by the cell model.
  *
  * Semantics reproduce the reference's value encodings (tera counter
  * `Add` operands are int64 big-endian, `AddInt64` operands are
  * host-endian int64 — src/io/atomic_merge_strategy.cc:39,43; typed
  * filter comparators encode fixed-width integers/doubles —
  * include/tera/filter_comparator.h:92-142). Implementations are
  * written fresh against public format descriptions.
  */
object Codecs {

  // Decoders are TOTAL: a buffer that is not exactly 8 bytes decodes to
  // 0 — a counter fold hitting a malformed/non-counter base treats it as
  // an empty base rather than failing mid-job (the reference assumes
  // well-formed 8-byte operands and would read garbage; at engine scale
  // a poison cell must not kill a scan).

  // ---- int64 big-endian (counter Add operand) ----
  def encodeBE64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(v).array()

  def decodeBE64(b: Array[Byte]): Long =
    if (b.length != 8) 0L
    else ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN).getLong

  // ---- int64 little-endian (AddInt64 operand; x86 host order) ----
  def encodeLE64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  def decodeLE64(b: Array[Byte]): Long =
    if (b.length != 8) 0L
    else ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong

  // ---- fixed-width little-endian integers (typed comparator operands,
  // tera IntegerComparator::EncodeInteger/DecodeInteger,
  // src/sdk/filter_comparator.cc:22-100: the value's low `width` bytes
  // in host (little-endian) order, plus one trailing padding byte; the
  // decoder reads only the first `width` bytes, so it tolerates both
  // padded and exact-width buffers) ----
  def encodeLEInt(v: Long, width: Int): Array[Byte] = {
    val b = new Array[Byte](width + 1) // trailing pad, like the reference
    var i = 0
    while (i < width) { b(i) = ((v >>> (8 * i)) & 0xffL).toByte; i += 1 }
    b
  }

  /** Decode the first `width` bytes little-endian; `signed` sign-extends
    * (kInt8..kInt64), otherwise zero-extends (kUint8..kUint32; kUint64
    * needs the caller to bias for unsigned ORDER, the bits are exact). */
  def decodeLEInt(b: Array[Byte], width: Int, signed: Boolean): Long = {
    if (b.length < width) return 0L
    var v = 0L
    var i = width - 1
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    if (signed && width < 8) {
      val shift = 64 - 8 * width
      (v << shift) >> shift
    } else v
  }

  // ---- double (typed decimal comparator operand) ----
  def encodeF64(v: Double): Array[Byte] = encodeBE64(java.lang.Double.doubleToLongBits(v))
  def decodeF64(b: Array[Byte]): Double = java.lang.Double.longBitsToDouble(decodeBE64(b))

  /** MurmurHash64A (MurmurHash2, 64-bit variant for 64-bit platforms).
    *
    * Public-domain algorithm by Austin Appleby
    * (https://github.com/aappleby/smhasher). The reference engine uses
    * this hash to prefix row keys for hash sharding
    * (tera: src/sdk/murmur_hash_impl.cc:14-66, table_impl.cc:98); an
    * independent implementation is required for key compatibility since
    * Spark's `hash`/`xxhash64` are different algorithms.
    */
  def murmur64a(data: Array[Byte], seed: Long = 0L): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    val len = data.length
    var h = seed ^ (len * m)
    val n = len & ~7
    var i = 0
    while (i < n) {
      var k =
        (data(i) & 0xffL) |
        ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) |
        ((data(i + 3) & 0xffL) << 24) |
        ((data(i + 4) & 0xffL) << 32) |
        ((data(i + 5) & 0xffL) << 40) |
        ((data(i + 6) & 0xffL) << 48) |
        ((data(i + 7) & 0xffL) << 56)
      k *= m
      k ^= k >>> r
      k *= m
      h ^= k
      h *= m
      i += 8
    }
    var rem = len & 7
    if (rem != 0) {
      var k = 0L
      while (rem > 0) {
        rem -= 1
        k = (k << 8) | (data(n + rem) & 0xffL)
      }
      h ^= k
      h *= m
    }
    h ^= h >>> r
    h *= m
    h ^= h >>> r
    h
  }

  /** 64-bit SimHash over pre-hashed token values: each hash bit votes
    * ±1 per token; the fingerprint takes the sign of each bit total
    * (Charikar's similarity-preserving hash, public algorithm).
    */
  def simhash64(tokenHashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Smallest byte string strictly greater than every string with prefix
    * `key` of the same length — the scan-pagination successor
    * (tera appends `\x00` to resume after a key, src/sdk/scan_impl.cc:84-89).
    */
  def successor(key: Array[Byte]): Array[Byte] = key :+ 0.toByte

  /** Seed of the reference's row-key sharding hash
    * (tera src/sdk/murmur_hash_impl.cc:62 `kSeed = 823`). */
  val KeyHashSeed: Long = 823L

  /** Hash-table storage key: 16-char zero-padded lowercase hex of
    * murmur64a(key, 823) prepended to the key — byte-identical to the
    * reference's `hash_method_` (tera src/sdk/table_impl.cc:98,
    * src/sdk/murmur_hash_impl.cc:61-67), so keys written by either
    * engine shard and sort the same way.
    */
  def hashedKey(key: String): String = {
    val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    f"${murmur64a(bytes, KeyHashSeed)}%016x" + key
  }

  /** Inverse of [[hashedKey]]: drop the 16-hex-char shard prefix. */
  def logicalKey(storedKey: String): String = storedKey.substring(16)

  /** Unicode NFC normalization (canonical composition) — the text-
    * canonicalization step a curation pipeline applies before
    * fingerprinting/dedup, so 'é' and 'e'+combining-acute hash alike.
    * UTF8String in/out keeps the expression codegen-friendly. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    // fast path: most corpus text is already composed (ASCII always is)
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Order-preserving long image of an IEEE double: signed comparison
    * of images equals numeric comparison of doubles (-0.0 sits just
    * below +0.0; NaN images above +Inf). Flipping the low 63 bits of
    * negatives reverses their bit-pattern order; positives pass
    * through. An involution — [[sortableBitsToDouble]] is the same
    * XOR. The radix-selection quantile operator walks these images 16
    * bits at a time. */
  def doubleSortableBits(d: Double): Long = {
    val l = java.lang.Double.doubleToRawLongBits(d)
    l ^ ((l >> 63) & 0x7fffffffffffffffL)
  }

  /** Inverse of [[doubleSortableBits]]. */
  def sortableBitsToDouble(y: Long): Double =
    java.lang.Double.longBitsToDouble(y ^ ((y >> 63) & 0x7fffffffffffffffL))
}
