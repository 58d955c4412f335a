package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP payload transfer/content/charset decoding kernels — the gap
  * between "parses a synthetic fixture" and "parses CommonCrawl": real
  * WARC `response` payloads are overwhelmingly `Transfer-Encoding:
  * chunked` and/or `Content-Encoding: gzip`, and a large crawl fraction
  * still ships ISO-8859-1 / windows-1252 bodies. Each kernel is a small
  * codegen'd Catalyst expression over BINARY (bytes in, bytes or text
  * out) with the corpus-ingest corrupt-row contract: bad chunk framing,
  * bad gzip, a lying charset — every malformed input decodes to NULL,
  * never a task failure (a single hostile record must not kill a
  * 100 TB ingest job).
  *
  * Deliberately byte-level, not string-level: compressed payloads are
  * not UTF-8, so they must never round-trip through a String (the JVM
  * replaces invalid sequences with U+FFFD — silent corruption). The
  * binary column flows from the scan to these kernels untouched.
  *
  * Reference behavior (what to compute): idavkaev/kafka-streams-task has
  * no crawl ingestion; this extends the SURVEY §2.10 north-star crawl
  * path (RFC 9112 §7.1 chunked framing, RFC 9110 §8.4 content codings).
  */
object HttpFunctions {

  /** 1-based BYTE position of the first occurrence of `needle` (an
    * ASCII string) in a binary column; 0 when absent. The byte-exact
    * sibling of `locate` (which is char-based and steps multi-byte lead
    * bytes, so it can jump OVER a delimiter that follows an invalid or
    * multi-byte sequence — exactly what compressed payload bytes look
    * like). */
  def binIndexOf(bin: Column, needle: String): Column =
    Bridge.column(BinIndexOf(Bridge.expression(bin), needle))

  /** De-chunk an RFC 9112 `Transfer-Encoding: chunked` payload: hex
    * chunk-size lines (extensions after `;` ignored), CRLF framing, a
    * terminal zero chunk, optional trailer lines. Strict: any framing
    * violation (bad hex, missing CRLF, truncated chunk, trailing bytes
    * after the terminator) → NULL. */
  def chunkedDecode(bin: Column): Column =
    Bridge.column(ChunkedDecode(Bridge.expression(bin)))

  /** Decompress a gzip (RFC 1952) payload; NULL on any stream error or
    * when the decompressed size exceeds `maxBytes` (the bomb guard — a
    * 10 KB hostile record must not allocate unbounded memory in an
    * executor). */
  def gunzip(bin: Column, maxBytes: Int = DefaultMaxDecodedBytes): Column =
    Bridge.column(GunzipBytes(Bridge.expression(bin), maxBytes))

  /** Decompress a `deflate` payload: zlib-wrapped (RFC 1950 — the HTTP
    * spec meaning) first, with the RAW-deflate fallback for the
    * widespread server bug that ships bare RFC 1951 streams under the
    * same token. NULL on error or past `maxBytes`. */
  def inflate(bin: Column, maxBytes: Int = DefaultMaxDecodedBytes): Column =
    Bridge.column(InflateBytes(Bridge.expression(bin), maxBytes))

  /** Decompress a `Content-Encoding: zstd` (RFC 8878) payload — live on
    * the real web since Chrome/Firefox shipped it; decoded with the
    * zstd-jni bundled in the Spark distribution (no new dependency).
    * Same contract as [[gunzip]]: NULL on any stream error or past
    * `maxBytes` (zstd's high ratios make the bomb guard MORE
    * load-bearing here, not less). */
  def zstdDecode(bin: Column, maxBytes: Int = DefaultMaxDecodedBytes): Column =
    Bridge.column(ZstdDecompressBytes(Bridge.expression(bin), maxBytes))

  /** Decode bytes to text under a named charset (a COLUMN — per-row
    * charsets, resolved from Content-Type / meta sniffing). Strict
    * decode (REPORT on malformed/unmappable): an unknown charset name or
    * bytes invalid under the named charset → NULL, never U+FFFD
    * mojibake silently entering the corpus. */
  def charsetDecode(bin: Column, charset: Column): Column =
    Bridge.column(CharsetDecodeBytes(
      Bridge.expression(bin), Bridge.expression(charset)))

  /** 256 MiB: generous for crawl payloads (CommonCrawl truncates
    * records at ~1 MB), small enough that one hostile record cannot
    * blow an executor's heap. */
  val DefaultMaxDecodedBytes: Int = 1 << 28

  // ------------------------------------------------------------------
  // kernels (static entry points for the generated code)
  // ------------------------------------------------------------------

  def binIndexOfKernel(hay: Array[Byte], needle: Array[Byte]): Int = {
    if (needle.length == 0 || hay.length < needle.length) return 0
    val limit = hay.length - needle.length
    var i = 0
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i + 1
      i += 1
    }
    0
  }

  /** Null ⇔ framing violation. Output is at most input-sized (chunked
    * framing only removes bytes), so no separate size guard. */
  def chunkedKernel(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(in.length, 1 << 16))
    var i = 0
    def crlfAt(p: Int): Boolean =
      p + 1 < in.length && in(p) == '\r' && in(p + 1) == '\n'
    while (true) {
      // chunk-size line: 1..8 hex digits, optional ;extensions, CRLF
      var size = 0L
      var nd = 0
      while (i < in.length && nd <= 8 && {
        val c = in(i) & 0xFF
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d >= 0) { size = size * 16 + d; nd += 1; true } else false
      }) i += 1
      if (nd == 0 || nd > 8) return null
      if (i < in.length && in(i) == ';') { // extensions: skip to CR
        while (i < in.length && in(i) != '\r') i += 1
      }
      if (!crlfAt(i)) return null
      i += 2
      if (size == 0L) {
        // optional trailer lines, then the final CRLF
        while (!crlfAt(i)) {
          val lineStart = i
          while (i < in.length && in(i) != '\r') i += 1
          if (!crlfAt(i) || i == lineStart) return null
          i += 2
        }
        i += 2
        return if (i == in.length) out.toByteArray else null
      }
      if (size > in.length - i) return null // truncated chunk
      out.write(in, i, size.toInt)
      i += size.toInt
      if (!crlfAt(i)) return null
      i += 2
    }
    null // unreachable
  }

  def gunzipKernel(in: Array[Byte], maxBytes: Int): Array[Byte] =
    try {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(in))
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(math.max(in.length * 4, 64), 1 << 16))
        val buf = new Array[Byte](8192)
        var n = gz.read(buf)
        while (n >= 0) {
          if (n > 0) {
            if (out.size.toLong + n > maxBytes) return null // bomb guard
            out.write(buf, 0, n)
          }
          n = gz.read(buf)
        }
        out.toByteArray
      } finally gz.close()
    } catch { case _: java.io.IOException => null }

  def inflateKernel(in: Array[Byte], maxBytes: Int): Array[Byte] = {
    val zlib = inflateWith(in, raw = false, maxBytes)
    if (zlib != null) zlib else inflateWith(in, raw = true, maxBytes)
  }

  private def inflateWith(in: Array[Byte], raw: Boolean,
      maxBytes: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(raw)
    try {
      inf.setInput(in)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(in.length * 4, 64), 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return null // truncated
        } else {
          if (out.size.toLong + n > maxBytes) return null // bomb guard
          out.write(buf, 0, n)
        }
      }
      out.toByteArray
    } catch { case _: java.util.zip.DataFormatException => null }
    finally inf.end()
  }

  def zstdKernel(in: Array[Byte], maxBytes: Int): Array[Byte] =
    try {
      val zs = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(in))
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(math.max(in.length * 4, 64), 1 << 16))
        val buf = new Array[Byte](8192)
        var n = zs.read(buf)
        while (n >= 0) {
          if (n > 0) {
            if (out.size.toLong + n > maxBytes) return null // bomb guard
            out.write(buf, 0, n)
          }
          n = zs.read(buf)
        }
        out.toByteArray
      } finally zs.close()
    } catch {
      // zstd-jni surfaces malformed frames as IOException subclasses and
      // (for some truncations) RuntimeException — either is a corrupt
      // ROW, never a task failure
      case _: java.io.IOException => null
      case _: RuntimeException => null
    }

  def charsetDecodeKernel(in: Array[Byte], name: UTF8String): UTF8String = {
    val cs =
      try java.nio.charset.Charset.forName(name.toString.trim)
      catch {
        case _: java.nio.charset.IllegalCharsetNameException => return null
        case _: java.nio.charset.UnsupportedCharsetException => return null
        case _: IllegalArgumentException => return null
      }
    // UTF-8 fast path: the column bytes ARE the output encoding — wrap
    // after validation, no transcode allocation
    if (cs == java.nio.charset.StandardCharsets.UTF_8) {
      val s = UTF8String.fromBytes(in)
      return if (s.isValid) s else null
    }
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(in)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }
}

/** `bin_index_of(bin)` — 1-based byte position of an ASCII needle. */
case class BinIndexOf(child: Expression, needle: String)
    extends UnaryExpression {
  private lazy val needleBytes =
    needle.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bin_index_of"

  override def nullSafeEval(input: Any): Any =
    HttpFunctions.binIndexOfKernel(input.asInstanceOf[Array[Byte]], needleBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("needle", needleBytes, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HttpFunctions.binIndexOfKernel($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BinIndexOf =
    copy(child = newChild)
}

/** Shared shape for the bytes-in/bytes-or-null-out decode kernels. */
abstract class NullableBytesKernel extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  /** Generated-code call producing `byte[]` or null. */
  protected def kernelCall(c: String): String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ${kernelCall(c)};
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
}

/** `chunked_decode(bin)` — RFC 9112 chunked framing removal. */
case class ChunkedDecode(child: Expression) extends NullableBytesKernel {
  override def prettyName: String = "chunked_decode"
  override def nullSafeEval(input: Any): Any =
    HttpFunctions.chunkedKernel(input.asInstanceOf[Array[Byte]])
  override protected def kernelCall(c: String): String =
    s"graft.functions.HttpFunctions.chunkedKernel($c)"
  override protected def withNewChildInternal(newChild: Expression): ChunkedDecode =
    copy(child = newChild)
}

/** `gunzip(bin)` — RFC 1952 decompression, bomb-guarded. */
case class GunzipBytes(child: Expression, maxBytes: Int)
    extends NullableBytesKernel {
  override def prettyName: String = "gunzip"
  override def nullSafeEval(input: Any): Any =
    HttpFunctions.gunzipKernel(input.asInstanceOf[Array[Byte]], maxBytes)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HttpFunctions.gunzipKernel($c, $maxBytes)"
  override protected def withNewChildInternal(newChild: Expression): GunzipBytes =
    copy(child = newChild)
}

/** `inflate(bin)` — zlib (HTTP `deflate`) with raw-stream fallback. */
case class InflateBytes(child: Expression, maxBytes: Int)
    extends NullableBytesKernel {
  override def prettyName: String = "inflate"
  override def nullSafeEval(input: Any): Any =
    HttpFunctions.inflateKernel(input.asInstanceOf[Array[Byte]], maxBytes)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HttpFunctions.inflateKernel($c, $maxBytes)"
  override protected def withNewChildInternal(newChild: Expression): InflateBytes =
    copy(child = newChild)
}

/** `zstd_decode(bin)` — RFC 8878 decompression, bomb-guarded. */
case class ZstdDecompressBytes(child: Expression, maxBytes: Int)
    extends NullableBytesKernel {
  override def prettyName: String = "zstd_decode"
  override def nullSafeEval(input: Any): Any =
    HttpFunctions.zstdKernel(input.asInstanceOf[Array[Byte]], maxBytes)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HttpFunctions.zstdKernel($c, $maxBytes)"
  override protected def withNewChildInternal(
      newChild: Expression): ZstdDecompressBytes =
    copy(child = newChild)
}

/** `charset_decode(bin, name)` — strict named-charset decode to text. */
case class CharsetDecodeBytes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "charset_decode"

  override def nullSafeEval(bin: Any, name: Any): Any =
    HttpFunctions.charsetDecodeKernel(
      bin.asInstanceOf[Array[Byte]], name.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) => s"""
      ${ev.value} = graft.functions.HttpFunctions.charsetDecodeKernel($b, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CharsetDecodeBytes =
    copy(left = newLeft, right = newRight)
}
