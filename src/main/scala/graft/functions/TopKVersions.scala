package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-K-versions aggregate: keeps the newest `k` cell versions
  * per group ordered by (ts, seq) descending — the version-resolution
  * primitive (tera counts versions newest-first in-scan,
  * src/io/tablet_io.cc:1057-1061; `CompactStrategy` is the pluggable
  * fold hook this maps from, leveldb/compact_strategy.h:22-50).
  *
  * Why a custom `TypedImperativeAggregate` and not a window: a
  * `row_number` window must SORT every version of every column, and its
  * input can be unboundedly deep (the reference ships tables declared
  * `maxversions=10000000`, tpcc_schemas/). This buffer is O(k) in both
  * the partial (map-side) and final stages, spill-free by construction,
  * and shrinks the shuffle to k rows per column — the difference between
  * a sort of the full history and a streaming top-k at 100 TB.
  *
  * Input: struct(ts: long, seq: long, value: binary).
  * Output: array of that struct, newest first, length <= k.
  */
case class TopKVersions(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKVersions.Buffer] {

  import TopKVersions._

  private val elementType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("value", BinaryType, nullable = true)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elementType, containsNull = false)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.insert(row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) null else row.getBinary(2))
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.foreach((ts, seq, value) => buf.insert(ts, seq, value))
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sorted = buf.toSortedDesc
    new GenericArrayData(sorted.map { case (ts, seq, value) =>
      InternalRow(ts, seq, value)
    })
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (ts, seq, value) =>
      out.writeLong(ts)
      out.writeLong(seq)
      if (value == null) out.writeInt(-1)
      else { out.writeInt(value.length); out.write(value) }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buffer(k)
    var i = 0
    while (i < n) {
      val ts = in.readLong()
      val seq = in.readLong()
      val len = in.readInt()
      val value = if (len < 0) null else {
        val a = new Array[Byte](len); in.readFully(a); a
      }
      buf.insert(ts, seq, value)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKVersions =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKVersions =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKVersions {

  /** Bounded buffer: smallest-(ts,seq) element evicts first once `k`
    * entries are held. Simple array-backed min-tracking — k is small.
    */
  final class Buffer(k: Int) {
    private var ts = new Array[Long](math.min(k, 16))
    private var seq = new Array[Long](math.min(k, 16))
    private var value = new Array[Array[Byte]](math.min(k, 16))
    private var n = 0

    def size: Int = n

    private def less(i: Int, ts2: Long, seq2: Long): Boolean =
      ts(i) < ts2 || (ts(i) == ts2 && seq(i) < seq2)

    def insert(t: Long, s: Long, v: Array[Byte]): Unit = {
      if (n < k) {
        if (n == ts.length) {
          val cap = math.min(k.toLong, ts.length * 2L).toInt
          ts = java.util.Arrays.copyOf(ts, cap)
          seq = java.util.Arrays.copyOf(seq, cap)
          value = java.util.Arrays.copyOf(value, cap)
        }
        ts(n) = t; seq(n) = s; value(n) = v; n += 1
      } else {
        // replace the current minimum if the new element is newer
        var minI = 0
        var i = 1
        while (i < n) { if (less(i, ts(minI), seq(minI))) minI = i; i += 1 }
        if (less(minI, t, s)) { ts(minI) = t; seq(minI) = s; value(minI) = v }
      }
    }

    def foreach(f: (Long, Long, Array[Byte]) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ts(i), seq(i), value(i)); i += 1 }
    }

    def toSortedDesc: Array[(Long, Long, Array[Byte])] = {
      val out = new Array[(Long, Long, Array[Byte])](n)
      var i = 0
      while (i < n) { out(i) = (ts(i), seq(i), value(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Long, Array[Byte]), b: (Long, Long, Array[Byte])) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 > b._2))
      out
    }
  }
}
