package graft.functions

import java.lang.{Double => JDouble, Float => JFloat}

import graft.SparkSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The memcomparable sort-key encoding, checked pairwise on the edge
  * values of every supported type: for all (a, b) and every
  * (direction, null ordering) combination, the unsigned byte order of the
  * encodings must equal the SQL sort comparison — including the float
  * edges (NaN greatest and self-equal, −0.0 < 0.0, infinities,
  * subnormals), integral extremes, decimal negatives, UTF-8 multibyte,
  * and the string/binary prefix + embedded-NUL cases the escape +
  * terminator scheme exists for. */
class SortKeySpec extends SparkSuite {

  private def sign(i: Int): Int = Integer.signum(i)

  /** Pairwise parity: for each ordered pair, expected SQL comparison vs
    * encoded-byte comparison under all 4 (desc, nullsFirst) combos. */
  private def check(dt: DataType, values: Seq[Any], base: (Any, Any) => Int): Unit = {
    for (desc <- Seq(false, true); nullsFirst <- Seq(true, false)) {
      val enc = SortKeyBytes(Seq(Literal.create(null, dt)), Seq(desc), Seq(nullsFirst))
      def encode(v: Any): Array[Byte] =
        SortKeyBytes(Seq(Literal.create(v, dt)), Seq(desc), Seq(nullsFirst))
          .eval(null).asInstanceOf[Array[Byte]]
      assert(enc.eval(null) != null, "encoding is never null")
      val encoded = values.map(v => v -> encode(v))
      for ((a, ea) <- encoded; (b, eb) <- encoded) {
        val expected =
          if (a == null && b == null) 0
          else if (a == null) { if (nullsFirst) -1 else 1 }
          else if (b == null) { if (nullsFirst) 1 else -1 }
          else { val c = sign(base(a, b)); if (desc) -c else c }
        val actual = sign(SortKeyBytes.compareUnsigned(ea, eb))
        assert(actual == expected,
          s"$dt desc=$desc nullsFirst=$nullsFirst: cmp($a, $b) " +
            s"expected $expected got $actual")
      }
    }
  }

  test("longs: extremes and sign boundary") {
    check(LongType,
      Seq(null, Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
        Long.MaxValue - 1, Long.MaxValue),
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long]))
  }

  test("ints, shorts, bytes, dates: widen losslessly") {
    check(IntegerType, Seq(null, Int.MinValue, -1, 0, 1, Int.MaxValue),
      (a, b) => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int]))
    check(ShortType,
      Seq(null, Short.MinValue, (-1).toShort, 0.toShort, Short.MaxValue),
      (a, b) => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short]))
    check(ByteType, Seq(null, Byte.MinValue, (-1).toByte, 0.toByte, Byte.MaxValue),
      (a, b) => java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte]))
    check(DateType, Seq(null, -719162, -1, 0, 1, 2932896), // ±epoch extremes
      (a, b) => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int]))
  }

  test("booleans and timestamps") {
    check(BooleanType, Seq(null, false, true),
      (a, b) => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean]))
    check(TimestampType, Seq(null, Long.MinValue / 2, -1L, 0L, 1L, Long.MaxValue / 2),
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long]))
  }

  test("doubles: NaN greatest and self-equal, -0.0 < 0.0, infinities, subnormals") {
    check(DoubleType,
      Seq(null, Double.NegativeInfinity, -Double.MaxValue, -1.5, -0.0, 0.0,
        JDouble.MIN_VALUE, 1.5, Double.MaxValue, Double.PositiveInfinity,
        Double.NaN, JDouble.longBitsToDouble(0x7ff0000000000001L)), // NaN payload
      (a, b) => JDouble.compare(a.asInstanceOf[Double], b.asInstanceOf[Double]))
  }

  test("floats widen exactly through the double path") {
    check(FloatType,
      Seq(null, Float.NegativeInfinity, -Float.MaxValue, -0.0f, 0.0f,
        JFloat.MIN_VALUE, 2.5f, Float.MaxValue, Float.PositiveInfinity, Float.NaN),
      (a, b) => JFloat.compare(a.asInstanceOf[Float], b.asInstanceOf[Float]))
  }

  test("compact decimals: unscaled-long order at fixed scale") {
    val dt = DecimalType(18, 2)
    check(dt,
      Seq(null, BigDecimal("-9999999999999999.99"), BigDecimal("-0.01"),
        BigDecimal("0.00"), BigDecimal("0.01"), BigDecimal("12345.67"),
        BigDecimal("9999999999999999.99")),
      (a, b) => a.asInstanceOf[BigDecimal].compare(b.asInstanceOf[BigDecimal]))
    assert(!SortKeyBytes.supported(DecimalType(25, 2)),
      "wide decimals exceed the long-unscaled encoding and must not claim support")
  }

  test("strings: binary collation, prefixes, embedded NUL, multibyte UTF-8") {
    check(StringType,
      Seq(null, "", "\u0000", "\u0000a", "a", "a\u0000", "a\u0000b", "a b",
        "ab", "b", "á", "中文", "zz"),
      (a, b) => UTF8String.fromString(a.asInstanceOf[String])
        .compareTo(UTF8String.fromString(b.asInstanceOf[String])))
  }

  test("binary: unsigned lexicographic with prefix/NUL edges") {
    val vals: Seq[Any] = Seq(null, Array[Byte](), Array[Byte](0),
      Array[Byte](0, -1), Array[Byte](0, 0), Array[Byte](1),
      Array[Byte](1, 0), Array[Byte](-1), Array[Byte](-1, -1))
    // pairwise check compares by reference equality for ties, so make
    // the expected comparator structural
    for (desc <- Seq(false, true); nullsFirst <- Seq(true, false)) {
      def encode(v: Any): Array[Byte] =
        SortKeyBytes(Seq(Literal.create(v, BinaryType)), Seq(desc), Seq(nullsFirst))
          .eval(null).asInstanceOf[Array[Byte]]
      val encoded = vals.map(v => v -> encode(v))
      for ((a, ea) <- encoded; (b, eb) <- encoded) {
        val expected =
          if (a == null && b == null) 0
          else if (a == null) { if (nullsFirst) -1 else 1 }
          else if (b == null) { if (nullsFirst) 1 else -1 }
          else {
            val c = sign(SortKeyBytes.compareUnsigned(
              a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]))
            if (desc) -c else c
          }
        val actual = sign(SortKeyBytes.compareUnsigned(ea, eb))
        assert(actual == expected,
          s"binary desc=$desc nullsFirst=$nullsFirst: ${a}, $b")
      }
    }
  }

  test("multi-key: later keys never bleed across boundaries") {
    // ("a", 2) must sort before ("ab", 1) on (s ASC, n ASC) even though
    // 2 > 1 — the terminator guarantees the first key resolves first
    def enc(s: String, n: Int): Array[Byte] =
      SortKeyBytes(
        Seq(Literal.create(s, StringType), Literal.create(n, IntegerType)),
        Seq(false, false), Seq(true, true)).eval(null).asInstanceOf[Array[Byte]]
    assert(SortKeyBytes.compareUnsigned(enc("a", 2), enc("ab", 1)) < 0)
    assert(SortKeyBytes.compareUnsigned(enc("a", 1), enc("a", 2)) < 0)
    assert(SortKeyBytes.compareUnsigned(enc("a\u0000", 1), enc("a", 2)) > 0)
    assert(SortKeyBytes.compareUnsigned(enc("x", 5), enc("x", 5)) == 0)
  }
}
