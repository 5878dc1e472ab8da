package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries summary: at most `k` counters plus the number of
  * updates absorbed. `decrements` tracks the cumulative per-item undercount
  * introduced by evictions/merges — 0 means the summary is EXACT (it never
  * overflowed), which the oracle gate exploits.
  */
final class MgSummary(
    val counts: mutable.HashMap[String, Long],
    var n: Long,
    var decrements: Long)

/** Heavy hitters (frequent items) as a native Catalyst
  * [[TypedImperativeAggregate]] — the Misra-Gries summary with the mergeable
  * reduction of Agarwal et al., "Mergeable Summaries" (PODS 2012): counters
  * sum across partials, then the (k+1)-th largest count is subtracted from
  * all and non-positive counters drop, keeping ≤ k entries.
  *
  * Guarantees (pinned by `HeavyHittersAggSpec`): estimates never overcount;
  * undercount ≤ n/(k+1) regardless of partitioning/merge order; every item
  * with true frequency > n/(k+1) is present in the summary.
  *
  * Scale shape: this is the frequent-items member of the mergeable-sketch
  * family beside HLL (q61) and GK quantiles (q71) — the partial aggregate
  * reduces each map partition to ≤ k counters, so the exchange carries
  * constant bytes per group where an exact term count shuffles the whole
  * vocabulary. When `k` ≥ the true vocabulary the summary never evicts and
  * degenerates to exact counting (`decrements` stays 0) — bit-identical to
  * `GROUP BY term`, which is what lets q87 run under the exact-hash oracle
  * gate while the eviction path is spec-pinned.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  require(k >= 1, s"heavy-hitters capacity must be >= 1, got $k")

  override def dataType: DataType = HeavyHittersAgg.resultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgSummary =
    new MgSummary(mutable.HashMap.empty, 0L, 0L)

  override def update(b: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      b.n += 1L
      b.counts.get(s) match {
        case Some(c) => b.counts.update(s, c + 1L)
        case None if b.counts.size < k => b.counts.update(s, 1L)
        case None =>
          // classic MG step: a full summary meets a new item → every counter
          // decays by 1 (amortized O(1): each decay round retires ≥ k count
          // mass that k prior arrivals paid for)
          b.decrements += 1L
          val kept = b.counts.iterator
            .map { case (t, c) => (t, c - 1L) }.filter(_._2 > 0L).toArray
          b.counts.clear()
          b.counts ++= kept
      }
    }
    b
  }

  override def merge(a: MgSummary, other: MgSummary): MgSummary = {
    other.counts.foreach { case (t, c) =>
      a.counts.update(t, a.counts.getOrElse(t, 0L) + c)
    }
    a.n += other.n
    a.decrements += other.decrements
    if (a.counts.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest count
      val cut = a.counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.decrements += cut
      val kept = a.counts.iterator
        .map { case (t, c) => (t, c - cut) }.filter(_._2 > 0L).toArray
      a.counts.clear()
      a.counts ++= kept
    }
    a
  }

  override def eval(b: MgSummary): Any = {
    val rows = b.counts.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), c)): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(b: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeLong(b.decrements)
    out.writeInt(b.counts.size)
    // int-length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps a term
    // at 65535 encoded bytes and would throw mid-shuffle (or mid state-store
    // write) on long values — a Column-level aggregate can't assume short keys
    b.counts.foreach { case (t, c) =>
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(tb.length)
      out.write(tb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val dec = in.readLong()
    val size = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val tb = new Array[Byte](in.readInt())
      in.readFully(tb)
      m.update(new String(tb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    new MgSummary(m, n, dec)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)

  /** Column-level entry: `heavyHitters(term, k)` → array<struct<term,
    * est_count>> sorted by estimate desc, term asc.
    */
  def apply(term: Column, k: Int): Column =
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(term), k).toAggregateExpression())
}
