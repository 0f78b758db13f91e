package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the cell-model codecs.
  *
  * These run inside whole-stage codegen (via `defineCodeGen` calling the
  * static [[Codecs]] methods), so codec application in scans/folds stays
  * on the codegen'd hot path — no Scala UDF boxing.
  */
abstract class CodecExpression extends UnaryExpression {
  /** Java code: fully-qualified static call on Codecs. */
  protected def staticCall(input: String): String
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, staticCall)
  override def nullable: Boolean = true
}

case class Be64Decode(child: Expression) extends CodecExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.decodeBE64(v.asInstanceOf[Array[Byte]])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.decodeBE64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Be64Encode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.encodeBE64(v.asInstanceOf[Long])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.encodeBE64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Le64Decode(child: Expression) extends CodecExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.decodeLE64(v.asInstanceOf[Array[Byte]])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.decodeLE64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Le64Encode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.encodeLE64(v.asInstanceOf[Long])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.encodeLE64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class F64Decode(child: Expression) extends CodecExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.decodeF64(v.asInstanceOf[Array[Byte]])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.decodeF64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class F64Encode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.encodeF64(v.asInstanceOf[Double])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.encodeF64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fixed-width little-endian integer decode (typed comparator widths,
  * tera filter_comparator.cc:22-100). */
case class LeIntDecode(child: Expression, width: Int, signed: Boolean)
    extends CodecExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.decodeLEInt(v.asInstanceOf[Array[Byte]], width, signed)
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.decodeLEInt($c, $width, $signed)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MurmurHash64A over binary or string input (hash-sharding key prefix). */
case class Murmur64A(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = v match {
    case b: Array[Byte] => Codecs.murmur64a(b, seed)
    case s: UTF8String  => Codecs.murmur64a(s.getBytes, seed)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Codecs.murmur64a($c, ${seed}L)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Codecs.murmur64a($c.getBytes(), ${seed}L)")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of an array<string> of tokens (murmur64a per token,
  * ±1 bit votes, sign fingerprint). A custom expression because the
  * per-bit fold is awkward and slow as DSL lambdas.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val hashes = new Array[Long](arr.numElements())
    var i = 0
    while (i < hashes.length) {
      hashes(i) = Codecs.murmur64a(arr.getUTF8String(i).getBytes)
      i += 1
    }
    Codecs.simhash64(hashes)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode NFC normalization of a string column ([[Codecs.nfc]]) —
  * canonical composition before fingerprinting/dedup, with an
  * already-normalized fast path (ASCII passes through untouched).
  * Codegen'd static call, so normalization rides the scan. */
case class NfcNormalize(child: Expression) extends CodecExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.nfc(v.asInstanceOf[UTF8String])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.nfc($c)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Order-preserving long image of a double ([[Codecs.doubleSortableBits]])
  * — the radix-selection quantile operator's scan primitive; codegen'd
  * so the per-pass bucket projection stays on the hot path. */
case class DoubleSortableBits(child: Expression) extends CodecExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.doubleSortableBits(v.asInstanceOf[Double])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.doubleSortableBits($c)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Byte-level payload helpers behind [[ByteHistogram]]. */
object ByteOps {
  /** 256-bin byte-value histogram of a binary payload. */
  def histogram(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = new Array[Long](256)
    var i = 0
    while (i < b.length) {
      h(b(i) & 0xff) += 1L
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(h)
  }
}

/** 256-bin byte histogram of a binary column — the primitive under the
  * multimodal payload screen ([[graft.operators.Multimodal.byteStats]]):
  * every byte-level statistic (size, sum, zero ratio, distinct bytes,
  * entropy) derives from it in plain column arithmetic. A custom
  * expression because the DSL equivalent (explode + 256-way aggregate,
  * or a transform/filter chain per bin) either shuffles per byte or
  * interprets lambdas per element; this is one codegen'd tight loop
  * per payload.
  */
case class ByteHistogram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ByteOps.histogram(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteOps.histogram($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** zlib helpers behind [[DeflateSize]]. */
object DeflateOps {
  /** Deflated size in bytes of a payload at a fixed compression level.
    * Deterministic for a given zlib build (the JDK bundles one); the
    * signal consumers threshold on ratios, and the gate row is
    * rows-only, so a zlib-version drift shifts a few bytes, never
    * correctness. */
  def deflatedSize(b: Array[Byte], level: Int): Int = {
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(b)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }
}

/** Deflated byte size of a binary column — the primitive under the
  * compression-ratio quality signal
  * ([[graft.operators.TextAnalysis.compressionRatio]]). A custom
  * expression because there is no built-in compressor function and a
  * UDF would box every payload; this is one static call per row. */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    DeflateOps.deflatedSize(v.asInstanceOf[Array[Byte]], level)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateOps.deflatedSize($c, $level)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Element-wise float/double vector helpers behind [[VecDot]]. */
object VecOps {
  /** Sequential left-to-right dot product in double — same fold order
    * and widening as SQL `aggregate(zip_with(...))` and DuckDB's
    * `list_sum(list_transform(list_zip(...)))`, bit-identical results.
    */
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}

/** Dot product of two numeric array columns (float or double elements),
  * evaluated as a tight loop. A custom expression because the DSL
  * equivalent — `aggregate(zip_with(..))` — is a CodegenFallback
  * higher-order function interpreting two lambdas per element: orders
  * of magnitude slower on a 12M-pair similarity join.
  */
case class VecDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Symmetric per-vector int8 quantization + exact integer dot — the 4×
  * memory lever for embedding search at corpus scale (float32 → 1 byte
  * per element as a packed BinaryType). Rounding is half-AWAY-FROM-ZERO
  * computed on the magnitude's exact fraction, so any engine's
  * `round()` (DuckDB, C round semantics) reproduces the bytes
  * bit-for-bit — `Math.round`'s half-up, `rint`'s half-even, and the
  * naive `floor(x+0.5)` (which rounds the largest double below .5
  * upward through the addition) all diverge.
  * Quantized COSINE needs no scale at all: per-vector scales cancel,
  * so the similarity is pure integer arithmetic + two sqrts.
  */
object VecQuantOps {
  def quantI8(a: org.apache.spark.sql.catalyst.util.ArrayData,
      aFloat: Boolean): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var mx = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (aFloat) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > mx) mx = x
      i += 1
    }
    if (mx == 0.0) return out
    val scale = mx / 127.0
    i = 0
    while (i < n) {
      val x = (if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)) / scale
      // exact half-away-from-zero (C/DuckDB round()): computed on the
      // magnitude's own fraction — `floor(x+0.5)` would round the
      // largest double BELOW .5 upward through the addition
      val ax = math.abs(x)
      val fl = math.floor(ax)
      val ra = if (ax - fl >= 0.5) fl + 1.0 else fl
      val r = if (x < 0) -ra else ra
      out(i) = r.toLong.toByte // |r| <= 127 by construction
      i += 1
    }
    out
  }

  def dotI8(a: Array[Byte], b: Array[Byte]): Long = {
    // a length mismatch between packed vectors is always a data bug
    // (mixed-dimension embeddings); a truncated dot would be silently,
    // plausibly wrong
    require(a.length == b.length,
      s"packed int8 vectors differ in length: ${a.length} vs ${b.length}")
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }
}

/** Quantize a float/double array column to packed signed int8 bytes. */
case class VecQuantI8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any): Any =
    VecQuantOps.quantI8(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], isFloat)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecQuantOps.quantI8($a, $isFloat)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Exact integer dot product of two packed-int8 binary columns. */
case class VecDotI8(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecQuantOps.dotI8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecQuantOps.dotI8($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Vector-vs-matrix helpers behind [[NearestCentroid]] / [[TopCentroids]] /
  * [[HyperplaneBucketExpr]]. The matrix travels to executors as a codegen
  * reference object (`ctx.addReferenceObj`), NOT as inlined literals — a
  * realistic IVF index (nlist 2^14-2^16 × dim 64+) inlined as literals is a
  * megabyte-scale generated expression that fails to compile; a reference
  * object is O(1) generated code at any nlist.
  */
object CentroidOps {
  /** Rows scaled to unit norm (zero rows kept), so argmax over plain dot
    * products == argmax over cosine. */
  def normalizeRows(m: Array[Array[Double]]): Array[Array[Double]] =
    m.map { row =>
      var s = 0.0; var i = 0
      while (i < row.length) { s += row(i) * row(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) row.clone() else row.map(_ / n)
    }

  private def dotRow(v: org.apache.spark.sql.catalyst.util.ArrayData,
      c: Array[Double], vFloat: Boolean): Double = {
    val n = math.min(v.numElements(), c.length)
    var s = 0.0; var j = 0
    while (j < n) {
      s += (if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)) * c(j)
      j += 1
    }
    s
  }

  /** Index of the max-dot row; ties keep the FIRST row (the behavior of
    * the former `array_position(arr, array_max(arr))` literal form). */
  def argmax(v: org.apache.spark.sql.catalyst.util.ArrayData,
      m: Array[Array[Double]], vFloat: Boolean): Int = {
    var best = Double.NegativeInfinity; var bi = 0; var i = 0
    while (i < m.length) {
      val s = dotRow(v, m(i), vFloat)
      if (s > best) { best = s; bi = i }
      i += 1
    }
    bi
  }

  /** Top-k row indices by (dot, index) descending — score ties prefer the
    * LARGER index, matching the former `reverse(array_sort(...))` form. */
  def topk(v: org.apache.spark.sql.catalyst.util.ArrayData,
      m: Array[Array[Double]], vFloat: Boolean, k: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val kk = math.min(k, m.length)
    val scores = new Array[Double](kk)
    val idx = new Array[Int](kk)
    // only INSERTED slots return: the previous -inf-sentinel form
    // returned its zero-initialized idx array whenever no score ranked
    // (a non-finite vector scores NaN against every row — NaN
    // comparisons are all false) — emitting centroid 0 repeated k
    // times, i.e. DUPLICATE probe cells, instead of no cells
    var filled = 0
    var i = 0
    while (i < m.length) {
      val s = dotRow(v, m(i), vFloat)
      if (!s.isNaN) {
        var p = filled
        while (p > 0 && (scores(p - 1) < s || (scores(p - 1) == s && idx(p - 1) < i)))
          p -= 1
        if (p < kk) {
          var q = math.min(filled, kk - 1)
          while (q > p) { scores(q) = scores(q - 1); idx(q) = idx(q - 1); q -= 1 }
          scores(p) = s; idx(p) = i
          if (filled < kk) filled += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(idx.take(filled))
  }

  /** Sign-bit bucket: bit i set iff dot(v, m(i)) >= 0. */
  def signBucket(v: org.apache.spark.sql.catalyst.util.ArrayData,
      m: Array[Array[Double]], vFloat: Boolean): Int = {
    var bucket = 0; var i = 0
    while (i < m.length) {
      if (dotRow(v, m(i), vFloat) >= 0) bucket |= (1 << i)
      i += 1
    }
    bucket
  }
}

/** Base for expressions scoring a vector column against a fixed matrix
  * shipped as a codegen reference object. */
abstract class MatrixExpression extends UnaryExpression {
  protected def matrix: Array[Array[Double]]
  protected def vFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  /** Java call on [[CentroidOps]]; `v` = input array, `m` = matrix ref. */
  protected def staticCall(v: String, m: String): String
  override def nullable: Boolean = true
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, v => staticCall(v, m))
  }
}

/** Argmax-dot cluster id against pre-normalized centroids (IVF assign). */
case class NearestCentroid(child: Expression, matrix: Array[Array[Double]])
    extends MatrixExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.argmax(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      matrix, vFloat)
  protected def staticCall(v: String, m: String): String =
    s"graft.functions.CentroidOps.argmax($v, $m, $vFloat)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-k nearest cluster ids (IVF probe side). */
case class TopCentroids(child: Expression, matrix: Array[Array[Double]], k: Int)
    extends MatrixExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.topk(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      matrix, vFloat, k)
  protected def staticCall(v: String, m: String): String =
    s"graft.functions.CentroidOps.topk($v, $m, $vFloat, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane sign bucket (LSH); planes as a reference object. */
case class HyperplaneBucketExpr(child: Expression, matrix: Array[Array[Double]])
    extends MatrixExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.signBucket(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      matrix, vFloat)
  protected def staticCall(v: String, m: String): String =
    s"graft.functions.CentroidOps.signBucket($v, $m, $vFloat)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization kernels behind [[PqEncode]] / [[PqLut]] /
  * [[PqAdc]] / [[PqReconNorm]] (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011). A vector
  * splits into `m` disjoint subvectors; each is replaced by the index
  * of its nearest (L2) sub-centroid out of `ksub`, so the stored form
  * is `m` BYTES instead of `dim` floats (dim=64, m=8: 32× fewer index
  * bytes than float32, 8× fewer than int8). Scoring is asymmetric
  * distance computation (ADC): the query stays exact-float, builds one
  * m×ksub lookup table of subspace dot products, and every candidate
  * scores with `m` table lookups instead of `dim` multiplies.
  * Codebooks travel as codegen reference objects like the centroid
  * matrices above.
  */
object PqOps {
  private def subDot(v: org.apache.spark.sql.catalyst.util.ArrayData,
      off: Int, c: Array[Double], vFloat: Boolean): Double = {
    var s = 0.0; var j = 0
    while (j < c.length) {
      s += (if (vFloat) v.getFloat(off + j).toDouble else v.getDouble(off + j)) * c(j)
      j += 1
    }
    s
  }

  /** Nearest-L2 sub-centroid per subspace → one byte each. Ties keep
    * the first (lowest-index) code, deterministically. */
  def encode(v: org.apache.spark.sql.catalyst.util.ArrayData,
      cb: Array[Array[Array[Double]]], vFloat: Boolean): Array[Byte] = {
    val m = cb.length
    val out = new Array[Byte](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = cb(s)
      val dsub = book(0).length
      var best = Double.PositiveInfinity; var bi = 0; var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0; var j = 0
        while (j < dsub) {
          val x = (if (vFloat) v.getFloat(off + j).toDouble
                   else v.getDouble(off + j)) - cent(j)
          d += x * x
          j += 1
        }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      out(s) = bi.toByte
      off += dsub
      s += 1
    }
    out
  }

  /** Flattened m×ksub table: entry s*ksub + c = dot(query subvector s,
    * codebook(s)(c)). Built ONCE per query row; every candidate pair
    * then scores by lookups ([[adc]]). */
  def lut(v: org.apache.spark.sql.catalyst.util.ArrayData,
      cb: Array[Array[Array[Double]]], vFloat: Boolean)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = cb.length
    val ksub = cb(0).length
    val out = new Array[Double](m * ksub)
    var s = 0; var off = 0
    while (s < m) {
      val book = cb(s)
      var c = 0
      while (c < book.length) {
        out(s * ksub + c) = subDot(v, off, book(c), vFloat)
        c += 1
      }
      off += book(0).length
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC inner product: Σ_s lut[s*ksub + codes[s]] — the approximate
    * dot(query, reconstructed candidate). `ksub` is recovered from the
    * table and code widths, so the expression carries no parameters. */
  def adc(lut: org.apache.spark.sql.catalyst.util.ArrayData,
      codes: Array[Byte]): Double = {
    val m = codes.length
    val ksub = lut.numElements() / m
    var s = 0; var acc = 0.0
    while (s < m) {
      acc += lut.getDouble(s * ksub + (codes(s) & 0xFF))
      s += 1
    }
    acc
  }

  /** Norm of the PQ reconstruction: subspaces are disjoint coordinate
    * blocks, so ‖x̂‖² = Σ_s ‖codebook(s)(code_s)‖² exactly. Computed at
    * encode time and stored, the cosine denominator never needs the
    * original floats. */
  def reconNorm(codes: Array[Byte], cb: Array[Array[Array[Double]]]): Double = {
    var s = 0; var acc = 0.0
    while (s < codes.length) {
      val cent = cb(s)(codes(s) & 0xFF)
      var j = 0
      while (j < cent.length) { acc += cent(j) * cent(j); j += 1 }
      s += 1
    }
    math.sqrt(acc)
  }
}

/** Base for expressions over a fixed per-subspace codebook tensor
  * (`double[][][]` reference object — same O(1)-generated-code
  * rationale as [[MatrixExpression]]). */
abstract class CodebookExpression extends UnaryExpression {
  protected def codebooks: Array[Array[Array[Double]]]
  protected def vFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def staticCall(v: String, cb: String): String
  override def nullable: Boolean = true
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, v => staticCall(v, cb))
  }
}

/** PQ-encode a float/double array column to `m` packed code bytes. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends CodebookExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      codebooks, vFloat)
  protected def staticCall(v: String, cb: String): String =
    s"graft.functions.PqOps.encode($v, $cb, $vFloat)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query ADC lookup table (flattened m×ksub doubles). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends CodebookExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    PqOps.lut(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      codebooks, vFloat)
  protected def staticCall(v: String, cb: String): String =
    s"graft.functions.PqOps.lut($v, $cb, $vFloat)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Reconstruction norm of a PQ code column (cosine denominator). */
case class PqReconNorm(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends CodebookExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    PqOps.reconNorm(v.asInstanceOf[Array[Byte]], codebooks)
  protected def staticCall(v: String, cb: String): String =
    s"graft.functions.PqOps.reconNorm($v, $cb)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC score: LUT array column × PQ code binary column → approximate
  * inner product. Pure lookups — no reference object needed. */
case class PqAdc(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, c: Any): Any =
    PqOps.adc(l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      c.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.functions.PqOps.adc($l, $c)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Binary successor: key ++ 0x00 (scan pagination resume point). */
case class KeySuccessor(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    Codecs.successor(v.asInstanceOf[Array[Byte]])
  protected def staticCall(c: String): String =
    s"graft.functions.Codecs.successor($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Z-order (Morton) kernels behind [[BucketRank]] / [[InterleaveBits]].
  * Multi-dimensional clustering for parquet min/max skipping: each
  * dimension quantizes to an equi-depth bucket rank (so skew can't
  * collapse the curve onto one axis), and the ranks' bits interleave
  * into one long sort key. Files written in z-key order carry tight
  * min/max boxes on EVERY clustered column, so a predicate on any of
  * them prunes row groups — the multi-dim generalization of the
  * reference's single-dimension row-key locality (tablets are row-range
  * shards, src/master/tablet_manager.cc; a scan prunes to the key range
  * it touches). Morton curves are public knowledge (G.M. Morton, 1966;
  * the equi-depth-rank + interleave composition is the one Delta Lake
  * and Iceberg document for OPTIMIZE ZORDER). */
object ZOrderOps {
  /** Rank of v among sorted bounds = #bounds <= v, via binary search.
    * Total: every IEEE compare against NaN is false, so NaN ranks 0
    * and poison values cluster at the curve's start (with NULLs)
    * instead of failing the write. */
  def rank(v: Double, bounds: Array[Double]): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave the low `bits` bits of each rank in `arr` (dimension 0
    * gets the least-significant lane). Requires bits * n <= 63. */
  def interleave(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      bits: Int): Long = {
    val n = arr.numElements()
    var out = 0L
    var b = 0
    while (b < bits) {
      var c = 0
      while (c < n) {
        out |= ((arr.getInt(c).toLong >>> b) & 1L) << (b * n + c)
        c += 1
      }
      b += 1
    }
    out
  }
}

/** Equi-depth bucket rank of a double against fixed quantile bounds
  * (one z-order dimension). Bounds ship as a codegen reference object. */
case class BucketRank(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ZOrderOps.rank(v.asInstanceOf[Double], bounds)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", bounds, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.ZOrderOps.rank($v, $b)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Morton interleave of an int-array of bucket ranks into one long. */
case class InterleaveBits(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ZOrderOps.interleave(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.ZOrderOps.interleave($v, $bits)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API surface of the codec expressions. */
object cellfunctions {
  private def c(e: Expression): Column = Shim.column(e)
  private def e(col: Column): Expression = Shim.expression(col)

  def be64_decode(col: Column): Column = c(Be64Decode(e(col)))
  def be64_encode(col: Column): Column = c(Be64Encode(e(col)))
  def le64_decode(col: Column): Column = c(Le64Decode(e(col)))
  def le64_encode(col: Column): Column = c(Le64Encode(e(col)))
  def f64_decode(col: Column): Column = c(F64Decode(e(col)))
  def f64_encode(col: Column): Column = c(F64Encode(e(col)))
  def le_int_decode(col: Column, width: Int, signed: Boolean): Column =
    c(LeIntDecode(e(col), width, signed))
  def murmur64a(col: Column, seed: Long = 0L): Column = c(Murmur64A(e(col), seed))

  /** Hash-table storage key (tera `EnableHash` sharding,
    * src/sdk/table_impl.cc:98): hex16(murmur64a(key, 823)) ++ key.
    * Composed from codegen'd built-ins — stays in whole-stage codegen.
    */
  def hashed_key(col: Column): Column = {
    import org.apache.spark.sql.functions.{concat, hex, lower, lpad}
    concat(lpad(lower(hex(murmur64a(col, Codecs.KeyHashSeed))), 16, "0"), col)
  }
  def key_successor(col: Column): Column = c(KeySuccessor(e(col)))
  def byte_histogram(col: Column): Column = c(ByteHistogram(e(col)))
  def deflate_size(col: Column, level: Int = 6): Column =
    c(DeflateSize(e(col), level))
  def double_sortable_bits(col: Column): Column = c(DoubleSortableBits(e(col)))
  def nfc_normalize(col: Column): Column = c(NfcNormalize(e(col)))
  def simhash64(col: Column): Column = c(SimHash64(e(col)))
  def vec_dot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))
  def vec_quant_i8(v: Column): Column = c(VecQuantI8(e(v)))
  def vec_dot_i8(a: Column, b: Column): Column = c(VecDotI8(e(a), e(b)))
  def nearest_centroid(v: Column, m: Array[Array[Double]]): Column =
    c(NearestCentroid(e(v), m))
  def top_centroids(v: Column, m: Array[Array[Double]], k: Int): Column =
    c(TopCentroids(e(v), m, k))
  def hyperplane_bucket(v: Column, planes: Array[Array[Double]]): Column =
    c(HyperplaneBucketExpr(e(v), planes))
  def pq_encode(v: Column, cb: Array[Array[Array[Double]]]): Column =
    c(PqEncode(e(v), cb))
  def pq_lut(v: Column, cb: Array[Array[Array[Double]]]): Column =
    c(PqLut(e(v), cb))
  def pq_recon_norm(codes: Column, cb: Array[Array[Array[Double]]]): Column =
    c(PqReconNorm(e(codes), cb))
  def pq_adc(lut: Column, codes: Column): Column = c(PqAdc(e(lut), e(codes)))
  def bucket_rank(v: Column, bounds: Array[Double]): Column =
    c(BucketRank(e(v), bounds))
  def interleave_bits(ranks: Column, bits: Int): Column =
    c(InterleaveBits(e(ranks), bits))
}
