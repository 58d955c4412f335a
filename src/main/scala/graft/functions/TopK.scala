package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k as a real aggregate (SURVEY §2.10 relational extension).
  *
  * The `row_number().over(Window.partitionBy(g).orderBy(o))` formulation
  * shuffles and SORTS every row of every group just to keep k of them; this
  * aggregate keeps a k-bounded heap per group, so the map side ships at
  * most k entries per (partition, group) and nothing is ever globally
  * sorted — at 100 TB the difference between shuffling the dataset and
  * shuffling k·|groups| rows.
  *
  * Determinism contract: "better" = higher `ord`, ties broken by LOWER
  * `tie` — exactly `ORDER BY ord DESC, tie ASC` — so results are
  * reproducible and engine-portable when (ord, tie) is unique per row
  * (make `tie` a row id). The tie may be a LONG, a STRING, or BINARY:
  * string ties compare byte-wise (UTF8String.compareTo), identical to
  * DuckDB's default binary collation, so `ORDER BY cnt DESC, term ASC`
  * oracles mirror exactly; binary ties compare unsigned-lexicographic —
  * the [[SortKeyBytes]] memcomparable encoding rides this to rank by
  * ARBITRARY multi-key sort lists (any directions) through the single
  * (ord, tie) contract, with `ord` pinned to a constant. Null
  * `ord`/`tie`/`payload` rows are ignored, like every SQL aggregate.
  *
  * Precision contract: with a DOUBLE `ord` (the [[TopK.topKByOrd]]
  * wrapper casts) integer ords beyond 2⁵³ or decimals past 15 significant
  * digits can collide after the cast and then resolve by `tie` — which a
  * native `ORDER BY` on the original type would distinguish. Pre-scale
  * such ords, fold the low-order information into `tie`, or hand the
  * aggregate a LONG `ord` ([[TopK.topKByLongOrd]]): long ords compare in
  * native 64-bit precision, losslessly.
  */
object TopK {

  /** `ARRAY<payloadType>` of the top-k payload values per group, best
    * first; LONG tie-break. */
  def topKByOrd(payload: Column, ord: Column, tie: Column, k: Int): Column =
    Bridge.column(TopKByOrd(
      Bridge.expression(payload),
      Bridge.expression(ord.cast("double")),
      Bridge.expression(tie.cast("long")), k).toAggregateExpression())

  /** [[topKByOrd]] with a lossless LONG `ord` (native 64-bit compare —
    * no 2⁵³ double-cast collisions). */
  def topKByLongOrd(payload: Column, ord: Column, tie: Column, k: Int): Column =
    Bridge.column(TopKByOrd(
      Bridge.expression(payload),
      Bridge.expression(ord.cast("long")),
      Bridge.expression(tie.cast("long")), k).toAggregateExpression())

  /** [[topKByOrd]] with a STRING tie-break (byte-wise ascending) — for
    * groups keyed by terms/n-grams where the deterministic order is
    * `ord DESC, term ASC`. */
  def topKByOrdStrTie(payload: Column, ord: Column, tie: Column, k: Int): Column =
    Bridge.column(TopKByOrd(
      Bridge.expression(payload),
      Bridge.expression(ord.cast("double")),
      Bridge.expression(tie.cast("string")), k).toAggregateExpression())
}

/** One retained entry: goodness key + an already-copied payload value.
  * `ord` is a boxed Double or Long, matching the aggregate's ord type. */
private[functions] final case class TopKEntry(ord: Any, tie: Any, payload: Any)

/** k-bounded buffer. `worstFirst` puts the weakest entry at the heap head
  * so a better candidate can displace it in O(log k). `ordCompare` /
  * `tieCompare` are the ascending comparators for the ord type (double or
  * long) and tie type (long or UTF8String). */
private[functions] final class TopKBuffer(val k: Int,
    ordCompare: (Any, Any) => Int, tieCompare: (Any, Any) => Int) {
  // worse = lower ord, then larger tie
  private val worstFirst: Ordering[TopKEntry] = (a: TopKEntry, b: TopKEntry) => {
    val c = ordCompare(b.ord, a.ord)
    if (c != 0) c else tieCompare(a.tie, b.tie)
  }
  val heap = new scala.collection.mutable.PriorityQueue[TopKEntry]()(worstFirst)

  /** Admission test on the key alone — lets the caller skip payload
    * eval/copy for the (overwhelmingly common, once warm) rejected rows. */
  def wouldAdmit(ord: Any, tie: Any): Boolean =
    heap.size < k ||
      worstFirst.compare(TopKEntry(ord, tie, null), heap.head) < 0

  def insert(e: TopKEntry): Unit =
    if (heap.size < k) heap.enqueue(e)
    else if (worstFirst.compare(e, heap.head) < 0) { heap.dequeue(); heap.enqueue(e) }

  /** Entries best-first (ord desc, tie asc): ascending by `worstFirst`
    * puts the LEAST-worse (= best) entry first. */
  def sorted: Array[TopKEntry] = heap.toArray.sorted(worstFirst)
}

case class TopKByOrd(payload: Expression, ord: Expression, tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(payload, ord, tie)
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_ord"

  // 0 = string, 1 = binary (unsigned byte-wise — the SortKeyBytes
  // memcomparable contract), 2 = long
  private def tieKind: Int = tie.dataType match {
    case StringType => 0
    case BinaryType => 1
    case LongType => 2
    case other => throw new IllegalArgumentException(
      s"topk_by_ord tie must be LONG, STRING or BINARY, got $other")
  }
  private def tieIsString: Boolean = tieKind == 0
  private def tieIsBinary: Boolean = tieKind == 1

  private def ordIsLong: Boolean = ord.dataType match {
    case LongType => true
    case DoubleType => false
    case other => throw new IllegalArgumentException(
      s"topk_by_ord ord must be DOUBLE or LONG, got $other")
  }

  @transient private lazy val ordCompare: (Any, Any) => Int =
    if (ordIsLong)
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    else
      (a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])

  @transient private lazy val tieCompare: (Any, Any) => Int = tieKind match {
    case 0 =>
      (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case 1 =>
      (a, b) => SortKeyBytes.compareUnsigned(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case _ =>
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val payloadHolder =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, ordCompare, tieCompare)

  override def update(buf: TopKBuffer, row: InternalRow): TopKBuffer = {
    val o = ord.eval(row)
    val t = tie.eval(row)
    if (o != null && t != null) {
      // admission-test on the key BEFORE touching the payload: once a
      // group's heap is warm almost every row is rejected, and the payload
      // eval + deep copy (UTF8String clone etc.) is the per-row hot cost
      if (buf.wouldAdmit(o, t)) {
        val p = payload.eval(row)
        // the tie is stored in the heap too — copy it (an UTF8String from
        // eval may point into a reused row buffer; a binary tie's array
        // may be reused the same way)
        val tCopy = t match {
          case b: Array[Byte] => b.clone()
          case other => InternalRow.copyValue(other)
        }
        if (p != null) buf.insert(TopKEntry(o, tCopy,
          InternalRow.copyValue(p)))
      }
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.heap.foreach(a.insert)
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map(_.payload))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.heap.toArray
    out.writeInt(entries.length)
    entries.foreach { e =>
      if (ordIsLong) out.writeLong(e.ord.asInstanceOf[Long])
      else out.writeDouble(e.ord.asInstanceOf[Double])
      if (tieIsString) {
        val tb = e.tie.asInstanceOf[UTF8String].getBytes
        out.writeInt(tb.length)
        out.write(tb)
      } else if (tieIsBinary) {
        val tb = e.tie.asInstanceOf[Array[Byte]]
        out.writeInt(tb.length)
        out.write(tb)
      } else out.writeLong(e.tie.asInstanceOf[Long])
      payloadHolder.update(0, e.payload)
      val rowBytes = payloadProj(payloadHolder).getBytes
      out.writeInt(rowBytes.length)
      out.write(rowBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = new TopKBuffer(k, ordCompare, tieCompare)
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val o: Any = if (ordIsLong) in.getLong else in.getDouble
      val t: Any =
        if (tieIsString) {
          val len = in.getInt
          val tb = new Array[Byte](len)
          in.get(tb)
          UTF8String.fromBytes(tb)
        } else if (tieIsBinary) {
          val len = in.getInt
          val tb = new Array[Byte](len)
          in.get(tb)
          tb
        } else in.getLong
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val ur = new UnsafeRow(1)
      ur.pointTo(rowBytes, len)
      buf.insert(TopKEntry(o, t, InternalRow.copyValue(ur.get(0, payload.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByOrd =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByOrd =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByOrd =
    copy(payload = newChildren(0), ord = newChildren(1), tie = newChildren(2))
}
