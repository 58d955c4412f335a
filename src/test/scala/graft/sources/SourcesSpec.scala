package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.WeatherOps
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSuite {
  import spark.implicits._

  private val weatherJson = Seq(
    """{"avg_tmpr_c":19.8,"avg_tmpr_f":67.7,"lat":39.6467,"lng":-89.8455,"wthr_date":"2017-08-29"}""",
    """{"avg_tmpr_c":16.5,"avg_tmpr_f":61.7,"lat":35.7395,"lng":-78.3249,"wthr_date":"2016-10-31"}""",
    """not json""")

  test("rawLines → parseWeather: the Kafka-value file path end to end") {
    val dir = Files.createTempDirectory("src-raw")
    Files.writeString(dir.resolve("w.jsonl"), weatherJson.mkString("\n"))
    val parsed = WeatherOps.parseWeather(Sources.rawLines(spark, dir.toString))
    val keys = parsed.select("key").as[String].collect().toSet
    assert(keys == Set("dp01_2017-08-29", "dq27_2016-10-31")) // malformed dropped
  }

  test("jsonLines with explicit schema: malformed row → nulls (PERMISSIVE)") {
    val dir = Files.createTempDirectory("src-json")
    Files.writeString(dir.resolve("w.jsonl"), weatherJson.mkString("\n"))
    val df = Sources.jsonLines(spark, dir.toString, WeatherOps.weatherSchema)
    assert(df.count() == 3)
    assert(df.filter($"lat".isNull).count() == 1)
    assert(df.schema("lat").dataType == DoubleType)
  }

  test("csv with explicit schema and header") {
    val dir = Files.createTempDirectory("src-csv")
    Files.writeString(dir.resolve("d.csv"),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Sources.csv(spark, dir.toString, schema)
    assert(df.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
  }

  test("parquet reader round-trips the fixtures") {
    assert(Sources.parquet(spark, s"$sf0001/customer.parquet").count() == 150)
  }

  test("orc: round-trip content identity, filter pushed to the ORC scan") {
    val dir = s"${Files.createTempDirectory("orc")}/docs"
    val docs = graft.Tables.documents(spark, sf0001)
    Sources.writeOrc(docs, dir)
    val back = Sources.orc(spark, dir)
    assert(back.select($"doc_id", $"text").as[(Long, String)].collect().toSet ==
      docs.select($"doc_id", $"text").as[(Long, String)].collect().toSet)
    val q = back.filter($"doc_id" === 42L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"ORC scan must receive the pushed filter:\n${plan.take(1500)}")
    assert(q.count() == 1)
  }

  test("compact: many small files → few target-sized, content identical") {
    val dir = Files.createTempDirectory("compact").toString
    val in = s"$dir/in"
    val docs = graft.Tables.documents(spark, sf0001)
    docs.repartition(40).write.parquet(in)
    assert(spark.read.parquet(in).inputFiles.length == 40)
    // generous target → everything fits in one file
    val (nIn, nOut) = Sources.compact(spark, in, s"$dir/out", 1L << 30)
    assert(nIn == 40 && nOut == 1, s"got ($nIn, $nOut)")
    val before = docs.select($"doc_id", $"text").as[(Long, String)].collect().toSet
    val after = spark.read.parquet(s"$dir/out")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    assert(after == before, "compaction must not change the data")
    // tight target → several files, sized from actual bytes
    val total = spark.read.parquet(in).inputFiles.map { f =>
      new java.io.File(new java.net.URI(f)).length
    }.sum
    val target = total / 4
    val (_, nOut4) = Sources.compact(spark, in, s"$dir/out4", target)
    assert(nOut4 == ((total + target - 1) / target).toInt, s"got $nOut4")
    // coalesce path: no shuffle, same content
    val (_, nOutC) = Sources.compact(spark, in, s"$dir/outc", 1L << 30,
      shuffle = false)
    assert(nOutC == 1)
    assert(spark.read.parquet(s"$dir/outc")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet == before)
    // overwrite-the-input guard, including differently-qualified spellings
    intercept[IllegalArgumentException](Sources.compact(spark, in, in))
    intercept[IllegalArgumentException](Sources.compact(spark, in, s"file:$in"))
    // paths with URI-reserved characters (spaces) must size correctly
    val spaced = s"$dir/with space/in"
    docs.limit(10).write.parquet(spaced)
    val (_, nSp) = Sources.compact(spark, spaced, s"$dir/with space/out", 1L << 30)
    assert(nSp == 1)
  }

  test("wetRecords: record split, header parse, length-bounded body slice") {
    val dir = Files.createTempDirectory("src-wet")
    def rec(uri: String, body: String) =
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
    // body 2 contains a lone "WARC/1.0" line — the compound record
    // delimiter must NOT split on it; body 3 contains a blank line, so
    // only the Content-Length bound keeps the slice exact
    val b1 = "plain body one"
    val b2 = "tricky\r\nWARC/1.0\r\nnot a record"
    val b3 = "first para\r\n\r\nsecond para"
    Files.writeString(dir.resolve("c.wet"),
      rec("http://a.example.com/p/1", b1) +
        rec("http://b.example.com/p/2", b2) +
        rec("http://c.example.com/p/3", b3))
    val got = Sources.wetRecords(spark, dir.toString)
      .select("uri", "rec_type", "content_length", "body")
      .as[(String, String, Long, String)].collect()
      .sortBy(_._1)
    assert(got.length == 3)
    assert(got.map(_._2).toSet == Set("conversion"))
    assert(got(0) == ("http://a.example.com/p/1", "conversion", b1.length.toLong, b1))
    assert(got(1) == ("http://b.example.com/p/2", "conversion", b2.length.toLong, b2))
    assert(got(2) == ("http://c.example.com/p/3", "conversion", b3.length.toLong, b3))
  }

  test("wetRecords: Content-Length is BYTES — multibyte last record slices exactly") {
    val dir = Files.createTempDirectory("src-wet-mb")
    // 'café' = 4 chars, 5 UTF-8 bytes; as the LAST record the trailing
    // \r\n\r\n is still attached (no following separator consumes it),
    // so a char-based slice would leak a stray CR into the body
    val body = "café et thé"
    val n = body.getBytes("UTF-8").length
    Files.writeString(dir.resolve("c.wet"),
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://m/p/9\r\n" +
        s"Content-Length: $n\r\n\r\n$body\r\n\r\n")
    val got = Sources.wetRecords(spark, dir.toString)
      .select("content_length", "body").as[(Long, String)].collect()
    assert(got.toSeq == Seq((n.toLong, body)))
  }

  test("wetRecords: gzipped dumps (.wet.gz — how WET actually ships) read transparently") {
    val dir = Files.createTempDirectory("src-wet-gz")
    val recs = (1 to 4).map { i =>
      val body = s"record body number $i"
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://g/p/$i\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
    }.mkString
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("c.wet.gz")))
    gz.write(recs.getBytes("UTF-8")); gz.close()
    val got = Sources.wetRecords(spark, dir.toString)
      .select("uri", "body").as[(String, String)].collect().sortBy(_._1)
    assert(got.length == 4)
    assert(got(2) == ("http://g/p/3", "record body number 3"))
  }

  test("wetRecords: record without a header terminator yields null body") {
    val dir = Files.createTempDirectory("src-wet-corrupt")
    Files.writeString(dir.resolve("c.wet"),
      "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 5\r\nno blank line here")
    val got = Sources.wetRecords(spark, dir.toString)
      .select("body").as[String].collect()
    assert(got.toSeq == Seq(null))
  }

  test("wetRecords: raw-UTF-8 header (non-ASCII URI) must not shift the body slice") {
    val dir = Files.createTempDirectory("src-wet-u8hdr")
    // a real-world WET record may carry the target URI as raw UTF-8; the
    // blank line's CHARACTER offset then differs from its BYTE offset,
    // and a char-as-byte slice starts the body early (r17 advisory)
    val body = "exact body"
    Files.writeString(dir.resolve("c.wet"),
      s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: http://café.example/ü\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n")
    val got = Sources.wetRecords(spark, dir.toString)
      .select("body").as[String].collect()
    assert(got.toSeq == Seq(body))
  }

  test("wetRecords: mis-split (body contains the record delimiter) → null body, not silent truncation") {
    val dir = Files.createTempDirectory("src-wet-missplit")
    // the body QUOTES a WARC dump, including the full compound delimiter
    // — the text source cuts the record there, so the remaining bytes
    // undershoot Content-Length: the damage must surface as a corrupt
    // row (null body), never a silently shortened body
    val body = "quoting a dump:\r\n\r\nWARC/1.0\r\nWARC-Type: conversion\r\nrest"
    val tail = "tail body"
    Files.writeString(dir.resolve("c.wet"),
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://q/p/1\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n" +
        s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://q/p/2\r\n" +
        s"Content-Length: ${tail.getBytes("UTF-8").length}\r\n\r\n$tail\r\n\r\n")
    val got = Sources.wetRecords(spark, dir.toString)
      .select("uri", "body").as[(String, String)].collect().sortBy(_._1).toSeq
    // the quoted delimiter splits record 1 AND fabricates a bogus record
    // from its remainder — both must surface as corrupt (null body);
    // record 2 is untouched
    assert(got.map(_._2) == Seq(null, null, tail))
  }

  test("wetRecords: a Content-Length beyond Int range → null body, not an ANSI cast overflow") {
    val dir = Files.createTempDirectory("src-wet-bigcl")
    Files.writeString(dir.resolve("c.wet"),
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://b/p/1\r\n" +
        "Content-Length: 99999999999\r\n\r\ntiny actual body\r\n\r\n")
    val got = Sources.wetRecords(spark, dir.toString)
      .select("content_length", "body").as[(Long, String)].collect()
    assert(got.toSeq == Seq((99999999999L, null)))
  }

  test("wetRecords: a lying Content-Length that cuts mid-codepoint → null body, not a task failure") {
    val dir = Files.createTempDirectory("src-wet-midcp")
    val body = "café" // 'é' = 2 bytes; length 4 cuts it in half
    Files.writeString(dir.resolve("c.wet"),
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://m/p/1\r\n" +
        s"Content-Length: 4\r\n\r\n$body\r\n\r\n")
    val got = Sources.wetRecords(spark, dir.toString)
      .select("body").as[String].collect()
    assert(got.toSeq == Seq(null))
  }

  test("wetStream: file-streaming demux equals the batch reader on the same dir") {
    val dir = Files.createTempDirectory("src-wet-stream")
    val in = dir.resolve("in"); Files.createDirectories(in)
    def rec(i: Int) = {
      val body = s"stream body $i"
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://s/p/$i\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
    }
    Files.writeString(in.resolve("a.wet"), rec(1) + rec(2))
    Files.writeString(in.resolve("b.wet"), rec(3))
    val q = Sources.wetStream(spark, in.toString)
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/sink")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$dir/sink")
      .select("uri", "body").as[(String, String)].collect().toSet
    val batch = Sources.wetRecords(spark, in.toString)
      .select("uri", "body").as[(String, String)].collect().toSet
    assert(streamed == batch && batch.size == 3)
  }

  test("fuzz: corrupted WET dumps never throw — every row is parsed-or-null") {
    val dir = Files.createTempDirectory("src-wet-fuzz")
    val base = (1 to 5).map { i =>
      val body = s"fuzz body $i with café ${"x" * i}"
      val n = body.getBytes("UTF-8").length
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://f/p/$i\r\n" +
        s"Content-Length: $n\r\n\r\n$body\r\n\r\n"
    }.mkString.getBytes("UTF-8")
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 25) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(6))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      java.nio.file.Files.write(dir.resolve(s"t$trial.wet"), mutated)
      // must not throw — corrupt records surface as null/empty fields,
      // never task failures (the corrupt-row contract; a byte flip can
      // hit the separator, a header, a length digit, or the body)
      val rows = Sources.wetRecords(spark, dir.resolve(s"t$trial.wet").toString)
        .collect()
      rows.foreach { r =>
        val body = r.getAs[String]("body")
        val len = if (r.isNullAt(r.fieldIndex("content_length"))) -1L
          else r.getAs[Long]("content_length")
        // a non-null body is exactly Content-Length bytes by contract
        if (body != null)
          assert(body.getBytes("UTF-8").length == len, s"trial $trial")
      }
    }
  }

  test("fuzz: corrupted WARC response dumps never throw") {
    val dir = Files.createTempDirectory("src-warc-fuzz")
    val base = (1 to 4).map { i =>
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\npayload $i é"
      val n = http.getBytes("UTF-8").length
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://f/p/$i\r\n" +
        s"Content-Length: $n\r\n\r\n$http\r\n\r\n"
    }.mkString.getBytes("UTF-8")
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 25) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(6))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      java.nio.file.Files.write(dir.resolve(s"t$trial.warc"), mutated)
      // the flip can hit the record separator, a WARC header, the HTTP
      // status line, the header terminator, or the payload — every
      // outcome must be a row with null/degraded fields, never a throw
      Sources.warcResponses(spark, dir.resolve(s"t$trial.warc").toString)
        .collect()
    }
  }

  test("warcResponses: HTTP status/headers split from payload, byte-exact") {
    val dir = Files.createTempDirectory("src-warc")
    def rec(uri: String, status: Int, ctype: String, payload: String) = {
      val http = s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n\r\n$payload"
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n$http\r\n\r\n"
    }
    // payload 2 contains a blank line AND an http-ish line — only the
    // FIRST header terminator splits; payload 3 is multibyte
    Files.writeString(dir.resolve("c.warc"),
      rec("http://a/p/1", 200, "text/html; charset=UTF-8", "body one") +
        rec("http://b/p/2", 404, "text/plain",
          "para\r\n\r\nHTTP/1.1 999 FAKE\r\nrest") +
        rec("http://c/p/3", 200, "text/plain", "thé café"))
    val got = Sources.warcResponses(spark, dir.toString)
      .select("uri", "rec_type", "http_status", "content_type", "body")
      .as[(String, String, Int, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("http://a/p/1", "response", 200, "text/html; charset=UTF-8", "body one"),
      ("http://b/p/2", "response", 404, "text/plain",
        "para\r\n\r\nHTTP/1.1 999 FAKE\r\nrest"),
      ("http://c/p/3", "response", 200, "text/plain", "thé café")))
  }

  test("warcResponses: gzipped .warc.gz reads transparently; missing HTTP terminator → nulls") {
    val dir = Files.createTempDirectory("src-warc-gz")
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\npayload"
    val broken = "HTTP/1.1 200 OK\r\nContent-Type: text/plain" // no blank line
    val recs =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://g/p/1\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n" +
        s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://g/p/2\r\n" +
        s"Content-Length: ${broken.length}\r\n\r\n$broken\r\n\r\n"
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("c.warc.gz")))
    gz.write(recs.getBytes("UTF-8")); gz.close()
    val got = Sources.warcResponses(spark, dir.toString)
      .select("uri", "http_status", "body")
      .as[(String, Option[Int], String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("http://g/p/1", Some(200), "payload"),
      // no header terminator → the WHOLE http split nulls (status/type/
      // body) — header extraction runs over the terminated header
      // section only, so a terminator-less block is a corrupt row, and
      // a payload line spelling "content-type: …" can never be
      // misattributed as a response header
      ("http://g/p/2", None, null)))
  }

  test("warcResponses: a payload line spelling an http header is never misattributed") {
    val dir = Files.createTempDirectory("src-warc-payload-hdr")
    // real header block has NO Content-Type; the payload QUOTES one —
    // content_type must stay null (header-section-only extraction)
    val http = "HTTP/1.1 200 OK\r\nServer: x\r\n\r\n" +
      "quoted response follows:\r\ncontent-type: text/evil\r\nrest"
    val recs =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://q/p/1\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    Files.writeString(dir.resolve("c.warc"), recs)
    val got = Sources.warcResponses(spark, dir.toString)
      .select("uri", "http_status", "content_type", "body")
      .as[(String, Option[Int], Option[String], String)].collect().toSeq
    assert(got == Seq(("http://q/p/1", Some(200), None,
      "quoted response follows:\r\ncontent-type: text/evil\r\nrest")))
  }

  // ---- HTTP payload transfer/content/charset decoding ------------------

  private def gzipB(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def zlibB(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def chunkB(b: Array[Byte], sz: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.grouped(sz).foreach { c =>
      out.write(s"${c.length.toHexString}\r\n".getBytes("US-ASCII"))
      out.write(c)
      out.write("\r\n".getBytes("US-ASCII"))
    }
    out.write("0\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** Render one WARC response record with a BINARY http payload. */
  private def warcRec(out: java.io.ByteArrayOutputStream, uri: String,
      headers: Seq[String], payload: Array[Byte]): Unit = {
    val hdr = (s"HTTP/1.1 200 OK" +: headers).mkString("", "\r\n", "\r\n\r\n")
      .getBytes("US-ASCII")
    val n = hdr.length + payload.length
    out.write((s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: $n\r\n\r\n").getBytes("US-ASCII"))
    out.write(hdr); out.write(payload)
    out.write("\r\n\r\n".getBytes("US-ASCII"))
  }

  test("warcResponses: chunked / gzip / deflate / chunked+gzip payloads decode") {
    val dir = Files.createTempDirectory("src-warc-enc")
    val text = "the decoded payload — café ✓"
    val raw = text.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    warcRec(out, "http://e/p/1", Seq("Content-Type: text/plain"), raw)
    warcRec(out, "http://e/p/2",
      Seq("Content-Type: text/plain", "Transfer-Encoding: chunked"),
      chunkB(raw, 7))
    warcRec(out, "http://e/p/3",
      Seq("Content-Type: text/plain", "Content-Encoding: gzip"), gzipB(raw))
    warcRec(out, "http://e/p/4",
      Seq("Content-Type: text/plain", "Content-Encoding: deflate"), zlibB(raw))
    warcRec(out, "http://e/p/5",
      Seq("Content-Type: text/plain", "Content-Encoding: gzip",
        "Transfer-Encoding: chunked"), chunkB(gzipB(raw), 5))
    // unknown content coding: body must NULL, not leak compressed bytes
    warcRec(out, "http://e/p/6",
      Seq("Content-Type: text/plain", "Content-Encoding: br"), raw)
    java.nio.file.Files.write(dir.resolve("c.warc"), out.toByteArray)
    val got = Sources.warcResponses(spark, dir.toString)
      .select("uri", "transfer_encoding", "content_encoding", "body")
      .as[(String, Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("http://e/p/1", None, None, Some(text)),
      ("http://e/p/2", Some("chunked"), None, Some(text)),
      ("http://e/p/3", None, Some("gzip"), Some(text)),
      ("http://e/p/4", None, Some("deflate"), Some(text)),
      ("http://e/p/5", Some("chunked"), Some("gzip"), Some(text)),
      ("http://e/p/6", None, Some("br"), None)))
  }

  test("warcResponses: charset resolution — header param, meta sniff, default") {
    val dir = Files.createTempDirectory("src-warc-cs")
    val out = new java.io.ByteArrayOutputStream()
    // header charset param wins
    warcRec(out, "http://c/p/1",
      Seq("Content-Type: text/plain; charset=ISO-8859-1"),
      "café ±".getBytes("ISO-8859-1"))
    warcRec(out, "http://c/p/2",
      Seq("Content-Type: text/html; charset=windows-1252"),
      "café €’".getBytes("windows-1252"))
    // no param → meta sniff
    warcRec(out, "http://c/p/3", Seq("Content-Type: text/html"),
      "<meta charset=\"ISO-8859-1\"><p>naïve".getBytes("ISO-8859-1"))
    // nothing → UTF-8 default
    warcRec(out, "http://c/p/4", Seq("Content-Type: text/plain"),
      "plain utf-8 ✓".getBytes("UTF-8"))
    // header LIES (claims utf-8, ships latin-1 bytes) → null, not mojibake
    warcRec(out, "http://c/p/5",
      Seq("Content-Type: text/plain; charset=utf-8"),
      "café".getBytes("ISO-8859-1"))
    java.nio.file.Files.write(dir.resolve("c.warc"), out.toByteArray)
    val got = Sources.warcResponses(spark, dir.toString)
      .select("uri", "charset", "body")
      .as[(String, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("http://c/p/1", "ISO-8859-1", Some("café ±")),
      ("http://c/p/2", "windows-1252", Some("café €’")),
      ("http://c/p/3", "ISO-8859-1", Some("<meta charset=\"ISO-8859-1\"><p>naïve")),
      ("http://c/p/4", "UTF-8", Some("plain utf-8 ✓")),
      ("http://c/p/5", "utf-8", None)))
  }

  test("warcResponses: a BOM outranks any declared charset and never surfaces") {
    val dir = Files.createTempDirectory("src-warc-bom")
    val out = new java.io.ByteArrayOutputStream()
    val u8bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    // UTF-8 BOM under a LYING latin-1 header: header decode would
    // succeed (latin-1 is total) with ï»¿-prefixed mojibake
    warcRec(out, "http://b/p/1",
      Seq("Content-Type: text/plain; charset=ISO-8859-1"),
      u8bom ++ "café ✓".getBytes("UTF-8"))
    // UTF-16LE BOM, nothing declared: the UTF-8 default would hit the
    // 0xFF signature byte and NULL the body
    warcRec(out, "http://b/p/2", Seq("Content-Type: text/plain"),
      Array(0xFF, 0xFE).map(_.toByte) ++ "seize ★".getBytes("UTF-16LE"))
    // UTF-16BE BOM under a lying utf-8 claim
    warcRec(out, "http://b/p/3",
      Seq("Content-Type: text/plain; charset=utf-8"),
      Array(0xFE, 0xFF).map(_.toByte) ++ "über π".getBytes("UTF-16BE"))
    // no BOM: the declared-charset path is untouched
    warcRec(out, "http://b/p/4",
      Seq("Content-Type: text/plain; charset=ISO-8859-1"),
      "café ±".getBytes("ISO-8859-1"))
    java.nio.file.Files.write(dir.resolve("b.warc"), out.toByteArray)
    val got = Sources.warcResponses(spark, dir.toString)
      .select("uri", "charset", "body")
      .as[(String, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("http://b/p/1", "UTF-8", Some("café ✓")),
      ("http://b/p/2", "UTF-16LE", Some("seize ★")),
      ("http://b/p/3", "UTF-16BE", Some("über π")),
      ("http://b/p/4", "ISO-8859-1", Some("café ±"))))
  }

  test("fuzz: corrupted ENCODED WARC dumps (chunked+gzip+zstd) never throw") {
    val dir = Files.createTempDirectory("src-warc-enc-fuzz")
    val base = {
      val out = new java.io.ByteArrayOutputStream()
      (1 to 4).foreach { i =>
        val raw = s"fuzz payload $i café".getBytes("UTF-8")
        warcRec(out, s"http://f/p/$i",
          Seq("Content-Type: text/plain; charset=utf-8",
            "Content-Encoding: gzip", "Transfer-Encoding: chunked"),
          chunkB(gzipB(raw), 6))
        warcRec(out, s"http://f/z/$i",
          Seq("Content-Type: text/plain; charset=utf-8",
            "Content-Encoding: zstd"),
          com.github.luben.zstd.Zstd.compress(raw))
      }
      out.toByteArray
    }
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 25) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(6))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      java.nio.file.Files.write(dir.resolve(s"t$trial.warc"), mutated)
      // the flip can hit chunk framing, the gzip stream, a charset name,
      // a header, or the separator — every outcome must be a row with
      // null/degraded fields, never a task failure
      Sources.warcResponses(spark, dir.resolve(s"t$trial.warc").toString)
        .collect()
      Sources.warcResponsesBinary(spark, dir.resolve(s"t$trial.warc").toString)
        .collect()
    }
  }

  test("mixed-record WARC: request/metadata records never surface as responses") {
    val dir = Files.createTempDirectory("src-warc-mixed")
    val sb = new StringBuilder
    def rec(recType: String, uri: String, block: String): Unit = {
      val n = block.getBytes("UTF-8").length
      sb.append("WARC/1.0\r\n")
        .append(s"WARC-Type: $recType\r\n")
        .append(s"WARC-Target-URI: $uri\r\n")
        .append(s"Content-Length: $n\r\n\r\n")
        .append(block).append("\r\n\r\n")
    }
    // the CommonCrawl per-fetch triple; the request block deliberately
    // carries header-shaped lines a sloppy demux could misattribute
    rec("request", "http://m/p/1",
      "GET /p/1 HTTP/1.1\r\nHost: m\r\nAccept: text/html\r\n\r\n")
    rec("response", "http://m/p/1",
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody one")
    rec("metadata", "http://m/p/1", "fetchTimeMs: 12\r\n")
    rec("request", "http://m/p/2",
      "GET /p/2 HTTP/1.1\r\nHost: m\r\n\r\n")
    rec("response", "http://m/p/2",
      "HTTP/1.1 404 NF\r\nContent-Type: text/plain\r\n\r\nbody two")
    rec("metadata", "http://m/p/2", "outlink: http://m/x\r\n")
    Files.writeString(dir.resolve("m.warc"), sb.toString)
    val got = Sources.warcResponses(spark, dir.resolve("m.warc").toString)
      .orderBy($"uri")
      .select($"uri", $"rec_type", $"http_status", $"body")
      .as[(String, String, Int, String)].collect().toSeq
    assert(got == Seq(
      ("http://m/p/1", "response", 200, "body one"),
      ("http://m/p/2", "response", 404, "body two")))
  }

  test("sitemapEntries: kind split, entity decode, optional NULLs, malformed entry") {
    val dir = Files.createTempDirectory("graft-sitemap-spec")
    Files.writeString(dir.resolve("u.xml"),
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>http://a.com/p?x=1&amp;y=2&lt;z&gt;</loc>
        |    <lastmod>2026-01-02</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>http://a.com/q</loc></url>
        |  <url><lastmod>2026-01-03</lastmod></url>
        |</urlset>
        |""".stripMargin)
    Files.writeString(dir.resolve("i.xml"),
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>http://a.com/u.xml</loc></sitemap>
        |</sitemapindex>
        |""".stripMargin)
    val got = Sources.sitemapEntries(spark, s"$dir/*.xml")
      .select($"kind", $"loc", $"lastmod", $"changefreq", $"priority")
      .as[(String, Option[String], Option[String], Option[String], Option[String])]
      .collect().toSeq.sortBy(r => (r._1, r._2.getOrElse("")))
    assert(got == Seq(
      ("index", Some("http://a.com/u.xml"), None, None, None),
      // the loc-less malformed entry: NULL fields except the one present
      ("urlset", None, Some("2026-01-03"), None, None),
      ("urlset", Some("http://a.com/p?x=1&y=2<z>"), Some("2026-01-02"),
        Some("daily"), Some("0.8")),
      ("urlset", Some("http://a.com/q"), None, None, None)))
  }
}
