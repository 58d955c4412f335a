package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items ("heavy hitters") sketch aggregate: Misra-Gries summaries
  * with the mergeable-summaries combine rule (Agarwal, Cormode, Huang,
  * Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012, §3).
  *
  * Why not `groupBy(item).count` + top-k? That shuffles one row per
  * DISTINCT item — for corpus n-grams that is billions of narrow rows and a
  * giant exchange just to read off the head of the distribution. This
  * aggregate keeps an m-counter summary per (partition, group); the map
  * side ships ≤ m entries per group TOTAL, independent of how many distinct
  * items the partition saw — the difference between shuffling the
  * vocabulary and shuffling a sketch.
  *
  * Guarantees (all survive arbitrary merge trees):
  *  - `est ≤ true` (decrement-only errors — MG is an underestimate sketch);
  *  - `true − est ≤ err`, where `err` is the summary's accumulated
  *    decrement total, ≤ n/(m+1) after any sequence of merges;
  *  - any item with `true > n/(m+1)` is guaranteed present.
  * When the TOTAL distinct count per group is ≤ m the sketch never
  * decrements: counts are EXACT, `err = 0`, and the result is deterministic
  * and oracle-checkable — that regime is the driver-facing contract; the
  * sketch regime's bounds are property-tested instead (sketch contents
  * depend on stream/merge order, like every MG implementation).
  *
  * Cost note: an eviction round scans the m counters (O(m)); the offset
  * trick makes each round pay once, and the skewed streams the operator
  * targets hit existing counters almost always. For adversarial all-distinct
  * streams at large m, the bucket-list structure (Demaine, López-Ortiz,
  * Munro 2002) is the classical O(1) refinement.
  */
object HeavyHitters {

  /** `ARRAY<STRUCT<item, est, err>>` of ≤ m retained items per group,
    * ordered est desc then item asc (byte-wise — DuckDB binary collation).
    * `err` is the group-summary decrement bound: `est ≤ true ≤ est + err`. */
  def heavyHitters(item: Column, m: Int): Column =
    Bridge.column(MisraGriesAgg(
      Bridge.expression(item.cast("string")), m).toAggregateExpression())
}

/** MG summary: stored counts are offsets from `base` (a "decrement all" is
  * base += 1 — O(1)); `rounds` carries the total decrement depth through
  * merges for the error bound. */
private[functions] final class MGBuffer(val m: Int) {
  val counts = new scala.collection.mutable.HashMap[UTF8String, Long]()
  var base: Long = 0L
  var rounds: Long = 0L

  def realCount(stored: Long): Long = stored - base

  def add(item: UTF8String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1L)
      case None =>
        if (counts.size < m) {
          // copy on admission: the UTF8String may point into a reused buffer
          counts.update(item.clone(), base + 1L)
        } else {
          // purge entries killed by previous decrements to make room...
          val dead = counts.iterator.filter(_._2 <= base).map(_._1).toArray
          if (dead.nonEmpty) {
            dead.foreach(counts.remove)
            counts.update(item.clone(), base + 1L)
          } else {
            // ...or decrement-all (item's own +1 and −1 cancel: not stored)
            base += 1L
            rounds += 1L
          }
        }
    }
  }

  /** Live (item, realCount) entries, count > 0. */
  def live: Array[(UTF8String, Long)] =
    counts.iterator.filter(_._2 > base)
      .map { case (it, c) => (it, c - base) }.toArray
}

case class MisraGriesAgg(item: Expression, m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(m >= 1, s"m must be >= 1, got $m")

  override def children: Seq[Expression] = Seq(item)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(buf: MGBuffer, row: InternalRow): MGBuffer = {
    val v = item.eval(row)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  /** Mergeable-summaries rule: item-wise sum of real counts, then truncate
    * back to m by subtracting the (m+1)-th largest combined count from
    * everything (value-based, so deterministic given the inputs) and
    * dropping non-positives. Underestimate preserved; rounds accumulate. */
  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    val combined = new scala.collection.mutable.HashMap[UTF8String, Long]()
    a.live.foreach { case (it, c) => combined.update(it, c) }
    b.live.foreach { case (it, c) =>
      combined.update(it, combined.getOrElse(it, 0L) + c)
    }
    val out = new MGBuffer(m)
    out.rounds = a.rounds + b.rounds
    if (combined.size <= m) {
      combined.foreach { case (it, c) => out.counts.update(it, c) }
    } else {
      val sorted = combined.toArray.sortWith { case ((ia, ca), (ib, cb)) =>
        if (ca != cb) ca > cb else ia.compareTo(ib) < 0
      }
      val cStar = sorted(m)._2
      out.rounds += cStar
      sorted.iterator.take(m).foreach { case (it, c) =>
        if (c - cStar > 0L) out.counts.update(it, c - cStar)
      }
    }
    out
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = buf.live.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(entries.map { case (it, c) =>
      InternalRow(it, c, buf.rounds)
    })
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.live
    out.writeLong(buf.rounds)
    out.writeInt(entries.length)
    entries.foreach { case (it, c) =>
      val bytes = it.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val buf = new MGBuffer(m)
    val in = ByteBuffer.wrap(bytes)
    buf.rounds = in.getLong
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val ib = new Array[Byte](len)
      in.get(ib)
      buf.counts.update(UTF8String.fromBytes(ib), in.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(item = newChildren(0))
}
