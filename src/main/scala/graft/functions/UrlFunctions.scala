package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL percent-encoding normalization (RFC 3986 §6.2.2.2) — the
  * canonicalization step regex expressions can't express: `%41` and `A`
  * are THE SAME URI character, so a crawl keyed on the raw spelling
  * counts one page twice (and `%2E` is a dot, so dot-segment resolution
  * that runs before decoding misses `/%2E%2E/` traversals — a classic
  * crawler-trap spelling). Spark has no replace-with-function regex, so
  * this is a kernel expression (the [[TextFunctions.nfcKernel]] shape):
  * one byte pass, full codegen, no UDF.
  *
  * Semantics per the RFC's normalization section:
  *  - a valid escape of an UNRESERVED character (ALPHA / DIGIT / `-` /
  *    `.` / `_` / `~`) decodes to the character;
  *  - every other valid escape keeps its `%` form with UPPERCASE hex
  *    (`%2f` → `%2F`) — decoding a reserved character would change
  *    which URI the string denotes;
  *  - a `%` not followed by two hex digits is left byte-for-byte (real
  *    crawl URLs contain bare `%`; erroring would drop the row, and
  *    "normalize what is well-formed" is what crawl canonicalizers do).
  * Output stays valid UTF-8: only ASCII unreserved bytes are ever
  * decoded. */
object UrlFunctions {

  /** Percent-normalize a URL (or any URI component) column. */
  def percentNormalize(c: Column): Column =
    Bridge.column(PercentNormalize(Bridge.expression(c)))

  @inline private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else -1

  @inline private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  @inline private def upperHexDigit(b: Byte): Byte =
    if (b >= 'a' && b <= 'f') (b - 32).toByte else b

  /** Kernel: no-escape fast path returns the input untouched (the
    * overwhelmingly common case pays one scan, zero allocation). */
  def percentNormalizeKernel(s: UTF8String): UTF8String = {
    val in = s.getBytes
    var scan = 0
    var has = false
    while (scan < in.length && !has) {
      if (in(scan) == '%') has = true else scan += 1
    }
    if (!has) return s
    // output is never longer than the input (decodes shrink 3 → 1)
    val out = new Array[Byte](in.length)
    var i = 0
    var o = 0
    while (i < in.length) {
      val b = in(i)
      if (b == '%' && i + 2 < in.length &&
        hexVal(in(i + 1)) >= 0 && hexVal(in(i + 2)) >= 0) {
        val v = hexVal(in(i + 1)) * 16 + hexVal(in(i + 2))
        if (isUnreserved(v)) {
          out(o) = v.toByte; o += 1
        } else {
          out(o) = '%'
          out(o + 1) = upperHexDigit(in(i + 1))
          out(o + 2) = upperHexDigit(in(i + 2))
          o += 3
        }
        i += 3
      } else {
        out(o) = b; o += 1; i += 1
      }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

/** `percent_normalize(url)` → STRING with RFC 3986 §6.2.2.2 escapes. */
case class PercentNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "percent_normalize"

  override def nullSafeEval(input: Any): Any =
    UrlFunctions.percentNormalizeKernel(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UrlFunctions.percentNormalizeKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}
