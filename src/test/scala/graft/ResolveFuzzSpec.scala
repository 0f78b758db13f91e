package graft

import graft.functions.Codecs
import graft.model._
import graft.operators.Resolve
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz: Spark resolve vs an independent in-memory
  * reference resolver, over seeded-random logs mixing every op type,
  * delete granularity, ttl/min/max-version knobs and snapshots
  * (the property-test plan of SURVEY.md §5).
  */
class ResolveFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import OpType._

  /** Straight-line reimplementation of the documented resolve semantics
    * (SURVEY.md §2.4) — no Spark, no sharing with the production code.
    */
  private def refResolve(
      ops: Seq[CellOp],
      desc: TableDesc,
      nowUs: Long,
      snapshot: Option[Long]): Set[(String, String, String, Long, Option[Seq[Byte]])] = {

    val bounded = ops.filter(o => snapshot.forall(o.seq <= _))
    def killed(c: CellOp): Boolean = bounded.exists { d =>
      d.seq > c.seq && (d.op match {
        case DelRow => d.row_key == c.row_key && c.ts <= d.ts
        case DelColumn => d.row_key == c.row_key && d.cf == c.cf && c.ts <= d.ts
        case DelQualifiers => d.row_key == c.row_key && d.cf == c.cf &&
          d.qualifier == c.qualifier && c.ts <= d.ts
        case DelQualifier => d.row_key == c.row_key && d.cf == c.cf &&
          d.qualifier == c.qualifier && d.ts == c.ts
        case _ => false
      })
    }
    val alive = bounded.filter(c => dataOps.contains(c.op) && !killed(c))

    alive.groupBy(c => (c.row_key, c.cf, c.qualifier)).flatMap {
      case ((row, cf, qual), cells) =>
        val spec = desc.spec(cf)
        val newestFirst = cells.sortBy(c => (-c.ts, -c.seq))
        val ttlUs = spec.ttlSec * 1000000L
        val surviving = newestFirst.zipWithIndex.filter { case (c, i) =>
          ttlUs == 0L || c.ts + ttlUs > nowUs || i < spec.minVersions
        }.map(_._1)
        if (surviving.isEmpty) Nil
        else if (surviving.exists(c => atomics.contains(c.op))) {
          // chronological fold into one merged cell
          // decodeBE64/decodeLE64 are total (non-8-byte buffers -> 0),
          // so a fold over a mixed-type column treats a malformed base
          // as empty — mirrored here
          var state: Array[Byte] = null
          surviving.sortBy(c => (c.ts, c.seq)).foreach { c =>
            c.op match {
              case Value => state = c.value
              case Add => state = if (c.value == null) null
                else Codecs.encodeBE64(
                  (if (state == null) 0L else Codecs.decodeBE64(state)) +
                    Codecs.decodeBE64(c.value))
              case AddInt64 => state = if (c.value == null) null
                else Codecs.encodeLE64(
                  (if (state == null) 0L else Codecs.decodeLE64(state)) +
                    Codecs.decodeLE64(c.value))
              case PutIfAbsent => if (state == null) state = c.value
              // a null operand nulls the state (expression concat
              // propagates null) — the poison must not kill the fold
              case Append => state = if (c.value == null) null
                else (if (state == null) Array.emptyByteArray else state) ++ c.value
            }
          }
          Seq((row, cf, qual, surviving.map(_.ts).max,
            Option(state).map(_.toSeq)))
        } else {
          surviving.take(spec.maxVersions)
            .map(c => (row, cf, qual, c.ts, Option(c.value).map(_.toSeq)))
        }
    }.toSet
  }

  private def randomLog(rng: scala.util.Random, n: Int): Seq[CellOp] = {
    val seqs = rng.shuffle((1L to n.toLong).toList)
    (0 until n).map { i =>
      val row = s"r${rng.nextInt(3)}"
      val cf = s"cf${rng.nextInt(2)}"
      val qual = s"q${rng.nextInt(2)}"
      val ts = (rng.nextInt(5) + 1).toLong * 1000000L
      val op = rng.nextInt(100) match {
        case x if x < 40 => Value
        case x if x < 50 => DelRow
        case x if x < 58 => DelColumn
        case x if x < 66 => DelQualifiers
        case x if x < 72 => DelQualifier
        case x if x < 82 => Add
        case x if x < 88 => AddInt64
        case x if x < 94 => PutIfAbsent
        case _           => Append
      }
      val value: Array[Byte] = op match {
        // ~1 in 8 non-counter data ops carries a NULL operand — the
        // poison-cell class the streaming fold must survive (null
        // propagates through the fold state, as in the expression
        // semantics). Counter operands stay well-formed: an Add(null)
        // is malformed input on which the null-reset fold and the
        // map-side-sum fast path legitimately diverge (the reference
        // cannot express a null operand at all).
        case Value | PutIfAbsent | Append =>
          if (rng.nextInt(8) == 0) null else s"v$i".getBytes("UTF-8")
        case Add => Codecs.encodeBE64(rng.nextInt(100).toLong - 50)
        case AddInt64 => Codecs.encodeLE64(rng.nextInt(100).toLong - 50)
        case _ => null
      }
      CellOp(row, cf, qual, ts, op, value, seqs(i))
    }
  }

  test("spark resolve == reference resolver on 40 random logs") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    (1 to 40).foreach { trial =>
      val n = 10 + rng.nextInt(40)
      val log = randomLog(rng, n)
      val desc = TableDesc(
        CfSpec(
          maxVersions = 1 + rng.nextInt(3),
          minVersions = rng.nextInt(2),
          ttlSec = if (rng.nextBoolean()) 0L else 3L),
        cfs = if (rng.nextBoolean()) Map("cf1" -> CfSpec(maxVersions = 2)) else Map.empty)
      val nowUs = 6000000L
      val snapshot = if (rng.nextInt(4) == 0) Some(n.toLong / 2) else None

      // alternate version strategies (window / bounded top-k) and
      // tombstone strategies (window / join): all must match the
      // reference exactly
      val got = Resolve.resolve(log.toDF(), desc, nowUs, snapshot,
          useTopKAggregate = trial % 2 == 0,
          deleteStrategy = if (trial % 3 == 0) "window" else "join")
        .collect().map { r =>
          (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
            Option(r.getAs[Array[Byte]]("value")).map(_.toSeq))
        }.toSet
      val want = refResolve(log, desc, nowUs, snapshot)
      assert(got == want,
        s"trial $trial mismatch (n=$n desc=$desc snap=$snapshot)\n" +
          s"only-spark: ${got -- want}\nonly-ref: ${want -- got}")
    }
  }

  test("bucketed and flat layouts resolve identically on random logs") {
    import spark.implicits._
    val rng = new scala.util.Random(20260813L)
    (1 to 3).foreach { trial =>
      val log = randomLog(rng, 30 + rng.nextInt(30))
      val desc = TableDesc(CfSpec(maxVersions = 1 + rng.nextInt(3)))
      // split into two appends: the bucketed path must stay correct
      // across multi-commit logs (multiple files per bucket)
      val (b1, b2) = log.splitAt(log.size / 2)
      def build(desc: TableDesc): GraftTable = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"fuzz-layout$trial").toString
        val t = Graft.createTable(spark, dir, desc)
        t.put(b1.toDF()); t.put(b2.toDF())
        t
      }
      def cellSet(t: GraftTable): Set[(String, String, String, Long, Option[Seq[Byte]])] =
        t.cells(nowUs = 6000000L).collect().map { r =>
          (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
            Option(r.getAs[Array[Byte]]("value")).map(_.toSeq))
        }.toSet
      val flat = cellSet(build(desc))
      val bucketed = cellSet(build(desc.copy(buckets = 8)))
      assert(flat == bucketed, s"trial $trial layout divergence\n" +
        s"only-flat: ${flat -- bucketed}\nonly-bucketed: ${bucketed -- flat}")
    }
  }

  /** Restricted-op generator exercising the counter fold fast paths
    * (pure sum / seeded sum): mixes of {Add}, {AddInt64}, {Value, Add},
    * {Value, AddInt64}, optionally with deletes, and VALUE seeds that are
    * canonical 8-byte ints half the time and arbitrary strings the other
    * half (the general fold passes a trailing VALUE's bytes through
    * verbatim — the fast path must too).
    */
  private def counterMixLog(rng: scala.util.Random, n: Int,
      mix: Seq[Int]): Seq[CellOp] = {
    val seqs = rng.shuffle((1L to n.toLong).toList)
    (0 until n).map { i =>
      val op = mix(rng.nextInt(mix.size))
      val value: Array[Byte] = op match {
        case Value =>
          if (rng.nextBoolean()) Codecs.encodeBE64(rng.nextInt(1000).toLong)
          else s"seed$i".getBytes("UTF-8")
        case Add => Codecs.encodeBE64(rng.nextInt(100).toLong - 50)
        case AddInt64 => Codecs.encodeLE64(rng.nextInt(100).toLong - 50)
        case _ => null
      }
      CellOp(s"r${rng.nextInt(3)}", s"cf${rng.nextInt(2)}", s"q${rng.nextInt(2)}",
        (rng.nextInt(5) + 1).toLong * 1000000L, op, value, seqs(i))
    }
  }

  test("counter fast paths == reference resolver on restricted-op logs") {
    import spark.implicits._
    val rng = new scala.util.Random(826L)
    val mixes: Seq[Seq[Int]] = Seq(
      Seq(Add), Seq(AddInt64),
      Seq(Value, Add), Seq(Value, AddInt64),
      Seq(Value, Add, DelRow), Seq(Value, AddInt64, DelQualifiers))
    (1 to 30).foreach { trial =>
      val mix = mixes(trial % mixes.size)
      val n = 10 + rng.nextInt(40)
      val log = counterMixLog(rng, n, mix)
      val desc = TableDesc(CfSpec(maxVersions = 1 + rng.nextInt(3)))
      val snapshot = if (trial % 4 == 0) Some(n.toLong / 2) else None
      val got = Resolve.resolve(log.toDF(), desc, snapshotSeq = snapshot,
          opsPresent = Some(mix.toSet))
        .collect().map { r =>
          (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
            Option(r.getAs[Array[Byte]]("value")).map(_.toSeq))
        }.toSet
      val want = refResolve(log, desc, Long.MaxValue, snapshot)
      assert(got == want,
        s"trial $trial mix=$mix mismatch (n=$n snap=$snapshot)\n" +
          s"only-spark: ${got -- want}\nonly-ref: ${want -- got}")
    }
  }
}
