package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Memcomparable sort-key encoding: packs a multi-column sort key (any
  * directions, any null orderings) into ONE byte array whose unsigned
  * lexicographic order equals the row order of the original `ORDER BY`.
  * This is the classic order-preserving key encoding used by byte-sorted
  * stores (HBase/MyRocks row keys, FoundationDB tuples) and by Spark's own
  * radix-sort key prefixes — here it lets the k-bounded
  * [[TopKByOrd]] aggregate, whose comparison contract is a single
  * `(ord DESC, tie ASC)` pair, rank by ARBITRARY all-atomic sort lists:
  * the rewrite passes `ord = 0L` (constant) and this encoding as the tie,
  * so ascending byte order IS the window's sort order.
  *
  * Per-key layout: one null-flag byte — `0x00` (null, NULLS FIRST),
  * `0x01` (value present), `0x02` (null, NULLS LAST); the flag encodes the
  * null ordering directly and is never inverted — followed, for non-null
  * values, by the value bytes:
  *
  *  - fixed-width types (boolean/byte/short/int/long/date/timestamps/
  *    decimal ≤ 18 digits) widen to a signed long, XOR the sign bit, and
  *    emit 8 bytes big-endian — unsigned byte order = signed long order;
  *  - float/double map through the IEEE-754 total-order bit trick
  *    (negative values flip all bits, non-negative flip the sign bit;
  *    `doubleToLongBits` canonicalizes NaN), matching
  *    `java.lang.Double.compare` — the same order Spark's SortOrder uses,
  *    including NaN-greatest and −0.0 < 0.0;
  *  - strings/binary emit their bytes with `0x00` escaped to `0x00 0xFF`
  *    and a `0x00 0x00` terminator, so a prefix sorts strictly first and
  *    key boundaries never bleed into the next key (UTF-8 byte order is
  *    exactly Spark's UTF8String order);
  *  - DESCENDING keys invert every value byte (`~b`), which reverses the
  *    unsigned comparison outcome at the first differing byte.
  *
  * The encoding is total and injective on the key tuple, so encoded-byte
  * EQUALITY also coincides with sort-tie equality (floats: all NaN bit
  * patterns collapse, −0.0 and 0.0 stay distinct — exactly
  * `Double.compare`'s tie notion).
  */
object SortKeyBytes {

  /** Types this encoding supports; everything else keeps the window form. */
  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case d: DecimalType => d.precision <= Decimal.MAX_LONG_DIGITS
    case _ => false
  }

  /** Build from an ORDER BY spec (the rewrite-rule entry point). */
  def fromSortOrder(orderSpec: Seq[SortOrder]): SortKeyBytes =
    SortKeyBytes(orderSpec.map(_.child),
      orderSpec.map(so => so.direction == org.apache.spark.sql.catalyst
        .expressions.Descending),
      orderSpec.map(so => so.nullOrdering == org.apache.spark.sql.catalyst
        .expressions.NullsFirst))

  /** Unsigned lexicographic byte compare — the order this encoding is
    * built for (also [[TopKByOrd]]'s binary-tie comparator). */
  def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}

/** See [[SortKeyBytes$]]. `descending(i)` / `nullsFirst(i)` carry key i's
  * direction and null placement (they are spec, not data — not children).
  * Evaluation is interpreted ([[CodegenFallback]]): the expression's one
  * consumer is [[TopKByOrd]], a `TypedImperativeAggregate` whose update
  * path evaluates children interpretively anyway, so codegen would never
  * be exercised. */
case class SortKeyBytes(keys: Seq[Expression], descending: Seq[Boolean],
    nullsFirst: Seq[Boolean]) extends Expression with CodegenFallback {
  require(keys.nonEmpty && keys.length == descending.length &&
    keys.length == nullsFirst.length, "one (direction, nullOrdering) per key")
  require(keys.forall(k => SortKeyBytes.supported(k.dataType)),
    s"unsupported sort-key type among ${keys.map(_.dataType)}")

  override def children: Seq[Expression] = keys
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "sort_key_bytes"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SortKeyBytes =
    copy(keys = newChildren)

  // 8-byte fixed keys dominate; size for flag + 8 bytes per key, strings grow
  @transient private lazy val initialSize = 9 * keys.length

  override def eval(input: InternalRow): Any = {
    var buf = new Array[Byte](initialSize)
    var pos = 0
    def ensure(extra: Int): Unit =
      if (pos + extra > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, pos + extra))
    def putByte(b: Byte): Unit = { ensure(1); buf(pos) = b; pos += 1 }
    def putLongBE(v: Long, invert: Boolean): Unit = {
      ensure(8)
      var shift = 56
      while (shift >= 0) {
        val b = ((v >>> shift) & 0xff).toByte
        buf(pos) = if (invert) (~b).toByte else b
        pos += 1
        shift -= 8
      }
    }
    def putEscaped(bytes: Array[Byte], invert: Boolean): Unit = {
      ensure(2 * bytes.length + 2)
      def emit(b: Byte): Unit = {
        buf(pos) = if (invert) (~b).toByte else b
        pos += 1
      }
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        emit(b)
        if (b == 0) emit(0xff.toByte) // 0x00 -> 0x00 0xFF
        i += 1
      }
      emit(0); emit(0) // terminator: a prefix sorts strictly first
    }
    var i = 0
    while (i < keys.length) {
      val k = keys(i)
      val inv = descending(i)
      val v = k.eval(input)
      if (v == null) {
        putByte(if (nullsFirst(i)) 0x00 else 0x02)
      } else {
        putByte(0x01)
        k.dataType match {
          case BooleanType =>
            putLongBE((if (v.asInstanceOf[Boolean]) 1L else 0L) ^ Long.MinValue, inv)
          case ByteType =>
            putLongBE(v.asInstanceOf[Byte].toLong ^ Long.MinValue, inv)
          case ShortType =>
            putLongBE(v.asInstanceOf[Short].toLong ^ Long.MinValue, inv)
          case IntegerType | DateType =>
            putLongBE(v.asInstanceOf[Int].toLong ^ Long.MinValue, inv)
          case LongType | TimestampType | TimestampNTZType =>
            putLongBE(v.asInstanceOf[Long] ^ Long.MinValue, inv)
          case FloatType =>
            putLongBE(ieeeSortable(v.asInstanceOf[Float].toDouble), inv)
          case DoubleType =>
            putLongBE(ieeeSortable(v.asInstanceOf[Double]), inv)
          case _: DecimalType => // fixed scale per column: unscaled preserves order
            putLongBE(v.asInstanceOf[Decimal].toUnscaledLong ^ Long.MinValue, inv)
          case StringType =>
            putEscaped(v.asInstanceOf[UTF8String].getBytes, inv)
          case BinaryType =>
            putEscaped(v.asInstanceOf[Array[Byte]], inv)
          case other =>
            throw new IllegalStateException(s"unreachable: $other")
        }
      }
      i += 1
    }
    if (pos == buf.length) buf else java.util.Arrays.copyOf(buf, pos)
  }

  /** IEEE-754 total-order bits, unsigned-comparable: negatives flip all
    * bits, non-negatives flip the sign bit; equals `Double.compare` order
    * (canonical NaN greatest, −0.0 < 0.0). Floats widen exactly. */
  private def ieeeSortable(d: Double): Long = {
    val l = java.lang.Double.doubleToLongBits(d)
    l ^ (if (l < 0) -1L else Long.MinValue)
  }
}
