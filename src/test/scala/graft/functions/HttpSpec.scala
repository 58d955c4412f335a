package graft.functions

import graft.SparkSuite

/** Kernel-level goldens for the HTTP payload decode expressions
  * (chunked framing, gzip/deflate, charset) — the corrupt-row contract
  * (malformed → null, never a throw) is the load-bearing property. */
class HttpSpec extends SparkSuite {

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def zlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def rawDeflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def asciiB(s: String) = s.getBytes("US-ASCII")

  test("binIndexOf: 1-based byte position, 0 when absent") {
    assert(HttpFunctions.binIndexOfKernel(asciiB("ab\r\n\r\ncd"), asciiB("\r\n\r\n")) == 3)
    assert(HttpFunctions.binIndexOfKernel(asciiB("abcd"), asciiB("\r\n\r\n")) == 0)
    assert(HttpFunctions.binIndexOfKernel(asciiB("xx"), asciiB("xxx")) == 0)
    // byte-exact even when preceded by invalid-UTF-8 lead bytes (the
    // case char-based locate can step OVER)
    val hostile = Array[Byte](0xF0.toByte, '\r', '\n', '\r', '\n', 'z')
    assert(HttpFunctions.binIndexOfKernel(hostile, asciiB("\r\n\r\n")) == 2)
  }

  test("chunkedKernel: golden framing, extensions, trailers") {
    // "Wiki" in 2 chunks + terminal chunk
    val in = asciiB("4\r\nWiki\r\n3\r\nped\r\n0\r\n\r\n")
    assert(new String(HttpFunctions.chunkedKernel(in), "UTF-8") == "Wikiped")
    // chunk extension ignored; trailer line accepted
    val ext = asciiB("4;name=v\r\nWiki\r\n0\r\nX-T: 1\r\n\r\n")
    assert(new String(HttpFunctions.chunkedKernel(ext), "UTF-8") == "Wiki")
    // uppercase hex size
    val hexUp = asciiB("A\r\n0123456789\r\n0\r\n\r\n")
    assert(new String(HttpFunctions.chunkedKernel(hexUp), "UTF-8") == "0123456789")
  }

  test("chunkedKernel: every framing violation → null") {
    def bad(s: String) =
      assert(HttpFunctions.chunkedKernel(asciiB(s)) == null, s"input: $s")
    bad("")                                   // no size line
    bad("Z\r\nxx\r\n0\r\n\r\n")               // non-hex size
    bad("4\r\nWik")                           // truncated chunk
    bad("4\r\nWiki0\r\n\r\n")                 // missing chunk CRLF
    bad("4\r\nWiki\r\n0\r\n")                 // missing final CRLF
    bad("4\r\nWiki\r\n0\r\n\r\nextra")        // trailing bytes
    bad("FFFFFFFFF\r\nx\r\n0\r\n\r\n")        // >8 hex digits
    bad("4\nWiki\r\n0\r\n\r\n")               // LF without CR
  }

  test("gunzip/inflate: round-trip, truncation → null, bomb guard") {
    val payload = ("some payload × unicode ✓" * 10).getBytes("UTF-8")
    assert(HttpFunctions.gunzipKernel(gzip(payload), 1 << 20).sameElements(payload))
    assert(HttpFunctions.inflateKernel(zlib(payload), 1 << 20).sameElements(payload))
    // raw-deflate fallback (the widespread server bug)
    assert(HttpFunctions.inflateKernel(rawDeflate(payload), 1 << 20)
      .sameElements(payload))
    // truncated streams
    assert(HttpFunctions.gunzipKernel(gzip(payload).dropRight(4), 1 << 20) == null)
    assert(HttpFunctions.inflateKernel(zlib(payload).dropRight(4), 1 << 20) == null)
    // garbage
    assert(HttpFunctions.gunzipKernel(asciiB("not gzip"), 1 << 20) == null)
    // bomb guard: decompressed size above the cap → null, no huge alloc
    val big = gzip(new Array[Byte](1 << 20)) // 1 MiB of zeros, ~1 KB gz
    assert(HttpFunctions.gunzipKernel(big, 1 << 16) == null)
    assert(HttpFunctions.gunzipKernel(big, 1 << 21) != null)
  }

  test("zstdKernel: round-trip, truncation/garbage → null, bomb guard") {
    val payload = ("zstd payload × unicode ✓" * 10).getBytes("UTF-8")
    val z = com.github.luben.zstd.Zstd.compress(payload)
    assert(HttpFunctions.zstdKernel(z, 1 << 20).sameElements(payload))
    // truncated frame
    assert(HttpFunctions.zstdKernel(z.dropRight(4), 1 << 20) == null)
    // garbage (no zstd magic)
    assert(HttpFunctions.zstdKernel("not zstd at all".getBytes("UTF-8"),
      1 << 20) == null)
    // bomb guard: 1 MiB of zeros compresses to ~100 B — the cap must
    // stop the inflation, not the allocation
    val bomb = com.github.luben.zstd.Zstd.compress(new Array[Byte](1 << 20))
    assert(bomb.length < (1 << 12), "precondition: high-ratio input")
    assert(HttpFunctions.zstdKernel(bomb, 1 << 16) == null)
    assert(HttpFunctions.zstdKernel(bomb, 1 << 21) != null)
  }

  test("charsetDecodeKernel: strict decode per charset; lies → null") {
    import org.apache.spark.unsafe.types.UTF8String
    def dec(b: Array[Byte], cs: String): String = {
      val r = HttpFunctions.charsetDecodeKernel(b, UTF8String.fromString(cs))
      if (r == null) null else r.toString
    }
    assert(dec("café".getBytes("UTF-8"), "UTF-8") == "café")
    assert(dec("café".getBytes("ISO-8859-1"), "ISO-8859-1") == "café")
    assert(dec("€’".getBytes("windows-1252"), "windows-1252") == "€’")
    // latin-1 bytes decoded as UTF-8 → invalid sequence → null (not U+FFFD)
    assert(dec("café".getBytes("ISO-8859-1"), "UTF-8") == null)
    // unknown / illegal charset names → null
    assert(dec(asciiB("x"), "no-such-charset-xyz") == null)
    assert(dec(asciiB("x"), "???") == null)
    // cp1252 0x81 is unmappable → strict decode nulls
    assert(dec(Array[Byte](0x81.toByte), "windows-1252") == null)
  }

  test("column expressions: codegen path survives nulls and corruption") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(
      (1L, gzip(asciiB("hello")), "gzip"),
      (2L, asciiB("broken"), "gzip"),
      (3L, null, "gzip")).toDF("id", "b", "ce")
    // gunzip of row 1 decodes; rows 2 (garbage) and 3 (null) → null
    val one = rows.filter(col("id") === 1)
      .select(HttpFunctions.gunzip(col("b")).cast("string")).as[String].head()
    assert(one == "hello")
    val two = rows.filter(col("id") === 2)
      .select(HttpFunctions.gunzip(col("b")).isNull).as[Boolean].head()
    assert(two)
    val three = rows.filter(col("id") === 3)
      .select(HttpFunctions.gunzip(col("b")).isNull).as[Boolean].head()
    assert(three)
    val chunked = Seq((1L, asciiB("3\r\nabc\r\n0\r\n\r\n")))
      .toDF("id", "b")
      .select(HttpFunctions.chunkedDecode(col("b")).cast("string"))
      .as[String].head()
    assert(chunked == "abc")
    val cs = Seq((1L, "café".getBytes("windows-1252"), "windows-1252"),
        (2L, "café".getBytes("windows-1252"), "UTF-8"))
      .toDF("id", "b", "cs")
      .select(col("id"), HttpFunctions.charsetDecode(col("b"), col("cs")).as("t"))
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(cs == Seq((1L, Some("café")), (2L, None)))
  }
}
