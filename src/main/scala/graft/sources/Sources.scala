package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source readers (the S-rows of SURVEY.md §2.1 beyond Kafka, plus the
  * file formats a warehouse deployment needs).
  *
  * All readers take explicit schemas where the format is schemaless — schema
  * inference costs a full extra pass at 100 TB and silently drifts; a
  * declared `StructType` keeps reads single-pass and stable.
  */
object Sources {

  /** Parquet — the columnar default; pruning/pushdown reach the footer. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — the other columnar warehouse format (native reader: same
    * predicate-pushdown / column-pruning / vectorized-scan properties as
    * parquet, so every layout argument in this file carries over). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC writer (overwrite) — for interop with ORC-standardized
    * warehouses; all graft operators are format-agnostic DataFrames. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSON-lines with an explicit schema; PERMISSIVE mode keeps the
    * reference's drop-on-error semantics (malformed → null row). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Raw lines as a single `value` string column — the Kafka-value shape the
    * reference's parsers consume (WeatherOps.parseWeather/parseAddress). */
  def rawLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path) // single column, already named `value`

  /** WET (WARC conversion) records — the CommonCrawl-style crawl-dump
    * container a pretraining pipeline ingests by the shelf-meter. The
    * demux is DECLARATIVE, not a custom record reader: the text source's
    * multi-char `lineSep` splits the stream on the record boundary
    * (`\r\n\r\nWARC/1.0\r\n` — the spec'd blank-line terminator PLUS the
    * next record's version line, so a body containing a lone "WARC/1.0"
    * cannot split a record), then header fields come out of codegen'd
    * `regexp_extract`s and the body is the `Content-Length`-bounded
    * slice after the first blank line — one scan, no shuffle, whole-file
    * parallelism across the many files of a real dump.
    *
    * Output: `(rec_type, uri, content_length, body)`. Header parse
    * failures surface as empty strings / null lengths rather than task
    * failures (the corrupt-row contract). */
  def wetRecords(spark: SparkSession, path: String): DataFrame =
    wetParse(spark.read.option("lineSep", WetRecordSep).text(path))

  /** The streamed twin: the same demux over the FILE STREAMING source —
    * the "tail a crawl bucket" ingest path (new dump files land in a
    * directory; each micro-batch parses the newly arrived files).
    * `maxFilesPerTrigger = 1` keeps per-batch work file-sized; the
    * record split + header/body parse are identical to [[wetRecords]]
    * by construction ([[wetParse]] is shared), so a checkpointed replay
    * must land on the batch face's oracle verbatim
    * (`q_wet_ingest_replay`). */
  def wetStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    wetParse(spark.readStream
      .option("lineSep", WetRecordSep)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(path))

  /** The compound record boundary: the spec'd blank-line terminator PLUS
    * the next record's version line, so a lone "WARC/1.0" inside a body
    * cannot split a record. */
  private val WetRecordSep = "\r\n\r\nWARC/1.0\r\n"

  /** Shared WET demux over the lineSep-split raw text relation — one
    * definition for the batch reader and the streaming twin. The text
    * surface: the binary core's body validated as UTF-8 (the WET spec's
    * encoding; invalid bytes → NULL, the corrupt-row contract). */
  private def wetParse(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    wetParseBinary(raw)
      .withColumn("body", try_validate_utf8(col("body_bin").cast("string")))
      .drop("body_bin")
  }

  /** The BYTES surface of the record demux: `body_bin` is the raw
    * Content-Length slice, unvalidated — the input for payloads that
    * are NOT UTF-8 text (compressed/chunked HTTP payloads, images in
    * `resource` records). The slice must never round-trip through a
    * String re-encode (invalid sequences would silently become U+FFFD),
    * so it is carved with `cast(binary)` — the raw UTF8String bytes. */
  def wetRecordsBinary(spark: SparkSession, path: String): DataFrame =
    wetParseBinary(spark.read.option("lineSep", WetRecordSep).text(path))

  private def wetParseBinary(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw
      // the FIRST record carries its own leading version line (no
      // separator precedes it); trailing empty splits drop. The strip
      // is a BYTE slice (startsWith compares bytes; the binary substr
      // is byte-positioned over the 10-byte ASCII prefix) — NEVER a
      // regexp_replace, whose String round-trip would silently rewrite
      // any invalid-UTF-8 payload byte (compressed HTTP bodies, binary
      // resources) to U+FFFD before the Content-Length slice
      .select(
        when(col("value").startsWith("WARC/1.0\r\n"),
          col("value").cast("binary")
            .substr(lit(11), octet_length(col("value"))))
          .otherwise(col("value").cast("binary")).as("recb"))
      .filter(octet_length(col("recb")) > 0)
      // the string VIEW wraps the same raw bytes (cast, not decode) —
      // header regexes/locate only ever match within the ASCII header
      // prefix, so the invalid payload bytes behind it are inert
      .withColumn("rec", col("recb").cast("string"))
      .select(
        regexp_extract(col("rec"), "(?m)^WARC-Type: (\\S+)", 1).as("rec_type"),
        regexp_extract(col("rec"), "(?m)^WARC-Target-URI: (\\S+)", 1).as("uri"),
        // the record's capture time (WARC-Date, ISO 8601) — the FETCH
        // date a recrawl scheduler ages content by (absent → null)
        nullif(regexp_extract(col("rec"), "(?m)^WARC-Date: (\\S+)", 1),
          lit("")).as("warc_date"),
        // the regexp yields digits or '' (absent header) — guard the ''
        // before casting: ANSI mode throws on it, and a headerless
        // fragment (a mis-split remainder) must be a corrupt ROW
        nullif(regexp_extract(col("rec"), "(?m)^Content-Length: (\\d+)", 1),
          lit("")).cast("long").as("content_length"),
        col("rec"), col("recb"))
      // WARC Content-Length is BYTES, so the slice runs on the raw
      // bytes (`cast(binary)` — never `encode`, whose String hop
      // replaces invalid sequences with U+FFFD and would corrupt
      // non-UTF-8 payload bytes). The blank line is found at a
      // CHARACTER offset (locate — the WARC header block is ASCII, so
      // the char scan cannot mis-step before the first terminator),
      // then converted to a BYTE offset via the encoded length of the
      // char prefix — exact even when a header field (e.g. a raw-UTF-8
      // WARC-Target-URI) carries multibyte chars.
      // Corrupt rows surface as NULL body, never a task failure:
      //  - no header terminator (locate = 0);
      //  - short slice (mis-split: a body containing the full record
      //    delimiter truncates this record — the byte count disagrees
      //    with Content-Length, so the damage is flagged, not silent).
      .withColumn("__b", {
        val hdrEnd = locate("\r\n\r\n", col("rec")) // 1-based char pos
        val bodyStart =
          octet_length(col("rec").substr(lit(1), hdrEnd + lit(3))) + lit(1)
        // clamp before the int cast: a corrupt/hostile record can claim
        // a Content-Length beyond Int range, and ANSI cast overflow is
        // a task failure — clamped, the slice just comes up short of
        // the claimed length, so the equality gate below nulls the body
        // (the corrupt-row contract)
        col("recb")
          .substr(bodyStart,
            least(col("content_length"), lit(Int.MaxValue.toLong))
              .cast("int"))
      })
      .withColumn("body_bin",
        when(locate("\r\n\r\n", col("rec")) > 0 &&
            octet_length(col("__b")) === col("content_length"),
          col("__b")))
      .drop("rec", "recb", "__b")
  }

  /** Full WARC `response` records, BYTES surface — the upstream of WET:
    * per record the WARC header block, then an HTTP response (status
    * line + headers + payload) whose total byte length is the WARC
    * `Content-Length`. The demux shares [[wetRecordsBinary]]'s
    * declarative machinery (multi-char `lineSep` record split,
    * byte-exact Content-Length slice, null-body corrupt-row contract);
    * on top of it the HTTP block is split at ITS first blank line —
    * found by the byte-exact [[graft.functions.HttpFunctions.binIndexOf]]
    * kernel, since compressed payload bytes would derail a char-based
    * `locate` — into status/headers and payload, and the payload is
    * decoded through the transfer/content codings real crawl dumps
    * actually carry: `Transfer-Encoding: chunked` framing removal, then
    * `Content-Encoding: gzip`/`deflate`/`zstd` decompression (identity/absent
    * pass through; an UNRECOGNIZED coding — br, which has no decoder in
    * the Spark distribution and is documented out of scope — nulls the body
    * rather than leaking compressed bytes downstream as if they were
    * content).
    *
    * Output: `(rec_type, uri, warc_date, content_length, http_status,
    * content_type, location, etag, last_modified, x_robots_tag,
    * transfer_encoding, content_encoding, body)` with
    * `body` BINARY (decoded payload bytes). Header extraction runs over
    * the HEADER SECTION ONLY (the prefix up to the first blank line,
    * case-insensitive names per RFC 9110) — a payload line spelling
    * "content-type: …" is never misattributed; a block with no header
    * terminator yields null status/type/encodings/body. Every decode
    * failure (bad chunk framing, bad gzip/zlib stream, a decompressed
    * size past `maxDecodedBytes` — the bomb guard) is a NULL body,
    * never a task failure. */
  def warcResponsesBinary(spark: SparkSession, path: String,
      maxDecodedBytes: Int = graft.functions.HttpFunctions.DefaultMaxDecodedBytes)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.HttpFunctions.{binIndexOf, chunkedDecode, gunzip, inflate, zstdDecode}
    def header(name: String): Column = {
      val v = regexp_extract(col("__hdr"), s"(?mi)^$name: ([^\\r\\n]+)", 1)
      when(v =!= "", v)
    }
    wetRecordsBinary(spark, path)
      // a REAL .warc interleaves request/response/metadata records per
      // fetch (the CommonCrawl layout) — this relation is the RESPONSE
      // rows by name and contract; a request's "GET / HTTP/1.1" block or
      // a metadata record's key-value body must never surface as a
      // null-status response row
      .where(col("rec_type") === "response")
      .withColumnRenamed("body_bin", "__http")
      .withColumn("__e", binIndexOf(col("__http"), "\r\n\r\n")) // 1-based byte pos
      // the header section is ASCII by spec; a fuzzed/binary prefix
      // fails UTF-8 validation and nulls all header-derived columns
      .withColumn("__hdr",
        when(col("__e") > 0, try_validate_utf8(
          col("__http").substr(lit(1), col("__e") + lit(1)).cast("string"))))
      .withColumn("http_status",
        nullif(regexp_extract(col("__hdr"), "^HTTP/1\\.[01] (\\d{3})", 1),
          lit("")).cast("int"))
      .withColumn("content_type", header("content-type"))
      // the redirect target of a 3xx response (RFC 9110 §10.2.2) — the
      // URL-aliasing evidence a crawl's canonicalization/dedup consumes
      .withColumn("location", header("location"))
      // the conditional-GET validators (RFC 9110 §8.8) — what a polite
      // recrawler persists per URL to send If-None-Match /
      // If-Modified-Since and skip unchanged pages next visit
      .withColumn("etag", header("etag"))
      .withColumn("last_modified", header("last-modified"))
      // the header-side indexing directive (Google/Bing's X-Robots-Tag
      // convention — the only noindex channel for non-HTML payloads);
      // raw value here, token semantics at the consumer (PageMeta's
      // rules, shared with the meta-tag channel)
      .withColumn("x_robots_tag", header("x-robots-tag"))
      .withColumn("transfer_encoding", lower(trim(header("transfer-encoding"))))
      .withColumn("content_encoding", lower(trim(header("content-encoding"))))
      .withColumn("__p0",
        when(col("__e") > 0,
          col("__http").substr(col("__e") + lit(4), length(col("__http")))))
      // RFC 9112: chunked is always the LAST transfer coding, so framing
      // removal precedes content decoding
      .withColumn("__p1",
        when(col("transfer_encoding").isNull, col("__p0"))
          .when(col("transfer_encoding").contains("chunked"),
            chunkedDecode(col("__p0")))
          .otherwise(col("__p0")))
      .withColumn("body",
        when(col("content_encoding").isNull ||
            col("content_encoding") === "identity", col("__p1"))
          .when(col("content_encoding").isin("gzip", "x-gzip"),
            gunzip(col("__p1"), maxDecodedBytes))
          .when(col("content_encoding") === "deflate",
            inflate(col("__p1"), maxDecodedBytes))
          .when(col("content_encoding") === "zstd",
            zstdDecode(col("__p1"), maxDecodedBytes))
          .otherwise(lit(null).cast("binary")))
      .select(col("rec_type"), col("uri"), col("warc_date"),
        col("content_length"),
        col("http_status"), col("content_type"), col("location"),
        col("etag"), col("last_modified"), col("x_robots_tag"),
        col("transfer_encoding"), col("content_encoding"), col("body"))
  }

  /** Full WARC `response` records, TEXT surface — [[warcResponsesBinary]]
    * plus charset-aware payload decode: a Unicode byte-order mark
    * (UTF-8 / UTF-16LE / UTF-16BE signature bytes) outranks everything
    * — the WHATWG encoding-sniffing precedence, because the payload's
    * own bytes beat any declaration and real servers routinely serve
    * BOM'd UTF-8 under a latin-1 Content-Type; else the charset is
    * resolved from the Content-Type `charset=` parameter, else sniffed
    * from an HTML `<meta charset=…>` /
    * `<meta http-equiv … content="…charset=…">` in the first KiB of the
    * payload (decoded as ISO-8859-1 for the sniff — total,
    * ASCII-transparent), else UTF-8 (the modern-web default). The
    * decode is STRICT per charset (a lying header → NULL body, never
    * U+FFFD mojibake silently entering the corpus); BOM bytes are the
    * signature, not content, so they are stripped before the decode
    * (Java's named UTF-16BE/LE decoders would otherwise render them as
    * a ZWNBSP and UTF-8 would keep a leading U+FEFF).
    *
    * Output: the binary surface's columns plus `charset`, with `body`
    * re-typed STRING (decoded text). */
  def warcResponses(spark: SparkSession, path: String,
      maxDecodedBytes: Int = graft.functions.HttpFunctions.DefaultMaxDecodedBytes)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.HttpFunctions.charsetDecode
    val csToken = "([A-Za-z0-9][A-Za-z0-9._:-]*)"
    warcResponsesBinary(spark, path, maxDecodedBytes)
      .withColumnRenamed("body", "__bin")
      .withColumn("__bom",
        when(col("__bin").substr(lit(1), lit(3)) ===
          lit(Array(0xEF, 0xBB, 0xBF).map(_.toByte)), lit("UTF-8"))
          .when(col("__bin").substr(lit(1), lit(2)) ===
            lit(Array(0xFE, 0xFF).map(_.toByte)), lit("UTF-16BE"))
          .when(col("__bin").substr(lit(1), lit(2)) ===
            lit(Array(0xFF, 0xFE).map(_.toByte)), lit("UTF-16LE")))
      .withColumn("__cs_hdr",
        nullif(regexp_extract(col("content_type"),
          s"""(?i)charset\\s*=\\s*["']?$csToken""", 1), lit("")))
      .withColumn("__sniff",
        charsetDecode(col("__bin").substr(lit(1), lit(1024)), lit("ISO-8859-1")))
      .withColumn("__cs_meta",
        nullif(regexp_extract(col("__sniff"),
          s"""(?i)<meta[^>]{0,200}?charset\\s*=\\s*["']?$csToken""", 1),
          lit("")))
      .withColumn("charset",
        coalesce(col("__bom"), col("__cs_hdr"), col("__cs_meta"), lit("UTF-8")))
      .withColumn("body", charsetDecode(
        when(col("__bom").isNull, col("__bin"))
          .otherwise(col("__bin").substr(
            when(col("__bom") === "UTF-8", lit(4)).otherwise(lit(3)),
            length(col("__bin")))),
        col("charset")))
      .drop("__bin", "__bom", "__cs_hdr", "__sniff", "__cs_meta")
  }

  /** CSV with an explicit schema and header control. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Write a bucketed + sorted table: the co-located-join scale path. Both
    * sides of a recurring join bucketed on the join key plan with NO
    * exchange (BucketingSpec asserts the plan) — at 100 TB this converts
    * every repeated fact⋈dim join from a full network shuffle into local
    * merges. Bucket count is a layout decision: pick so one bucket ≈
    * 128–256 MB. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], sortKeys: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty)
    val sk = if (sortKeys.nonEmpty) sortKeys else keys
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sk.head, sk.tail: _*)
      .saveAsTable(table)
  }

  /** Write hive-partitioned parquet: the partition-PRUNING layout. A read
    * filtered on a partition column never opens the other directories —
    * the scan's `PartitionFilters` (asserted in LayoutSpec) turn a full
    * corpus scan into a directory listing. Choose low-cardinality columns
    * (date, source, lang); every distinct combination becomes a directory. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty)
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Write range-clustered + sorted parquet: the row-group-PRUNING layout
    * for high-cardinality filter columns where directories don't work.
    * `repartitionByRange` gives each output file a disjoint key range and
    * the in-file sort tightens per-row-group min/max, so predicate
    * pushdown (`PushedFilters`) skips whole row groups at scan time. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int = 0): Unit = {
    require(sortCols.nonEmpty)
    val cols = sortCols.map(df.col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Morton (Z-order) value of two integer columns: bits of `a` and `b`
    * interleaved (a = even bits, b = odd bits), via the standard
    * mask-and-shift bit spreading. Inputs are masked to their low 31 bits
    * (z stays positive; offset wider domains first). Pure built-in integer
    * arithmetic — codegen'd by Spark AND bit-identical in any SQL engine,
    * so z-values are oracle-checkable. */
  def zValue(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    def spread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      var v = x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
      v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
      v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write Z-ORDER-clustered parquet: the two-dimensional row-group-pruning
    * layout. [[writeSorted]] tightens min/max on ONE high-cardinality
    * column; a range-sort on the Morton interleave localizes BOTH columns
    * per file/row group (each file covers a square-ish tile of the (a, b)
    * plane), so selective predicates on EITHER — or both — dimensions skip
    * row groups at scan time. The trade every lakehouse optimizer ships
    * (Delta/Iceberg `OPTIMIZE ZORDER BY`), here as a plain writer. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int = 0): Unit = {
    val z = zValue(df.col(colA), df.col(colB))
    val withZ = df.withColumn("__z", z)
    val ranged =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, withZ.col("__z"))
      else withZ.repartitionByRange(withZ.col("__z"))
    ranged.sortWithinPartitions(ranged.col("__z")).drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the table-maintenance pass behind every
    * streaming/incremental ingest: micro-batches and per-task writers leave
    * thousands of KB-sized files, and at 100 TB the scan's task count (and
    * the namenode/liststatus load) is governed by FILE count, not data
    * size. Rewrites `inPath` into ≈`targetBytes`-sized files at `outPath`.
    *
    * File count is sized from the actual on-disk bytes (driver-side
    * metadata listing only — no data ever reaches the driver), so output
    * sizes track input compression. `shuffle = true` (default) uses
    * round-robin `repartition` — one full exchange buys evenly-sized
    * files; `shuffle = false` uses `coalesce` — free of any exchange, but
    * file sizes inherit input skew and the scan's parallelism collapses to
    * the output count (the right trade only when the input is already
    * balanced).
    *
    * Returns (input file count, output file count). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20, shuffle: Boolean = true): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    // overwrite-the-input guard: the output write would delete the files
    // the lazy read plan is about to scan. Compare fully-qualified paths so
    // "file:/x" and "/x" (or relative spellings) can't slip past.
    def qualified(s: String) = {
      val p = new org.apache.hadoop.fs.Path(s)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(outPath) != qualified(inPath),
      s"compact cannot write onto its own input: $inPath")
    val df = spark.read.parquet(inPath)
    val files = df.inputFiles
    val totalBytes = files.map { f =>
      // inputFiles entries are URI-encoded Path.toString values (space →
      // %20), so URI is the correct decode — but Path.toString leaves some
      // URI-illegal characters unescaped, so fall back to the raw string
      // for entries URI rejects rather than failing the whole compaction
      val p =
        try new org.apache.hadoop.fs.Path(new java.net.URI(f))
        catch { case _: java.net.URISyntaxException =>
          new org.apache.hadoop.fs.Path(f) }
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val out = if (shuffle) df.repartition(n) else df.coalesce(n)
    out.write.mode("overwrite").parquet(outPath)
    (files.length, spark.read.parquet(outPath).inputFiles.length)
  }

  /** Exact option map for the bounded Kafka read (testable without a
    * broker — see KafkaContractSpec). */
  def kafkaBatchOptions(bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      endingOffsets: String = "latest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "endingOffsets" -> endingOffsets)

  /** Batch Kafka read (bounded: startingOffsets..endingOffsets) — same
    * (key, value) contract as the streaming source; needs the
    * spark-sql-kafka connector on the classpath. */
  def kafkaBatch(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      endingOffsets: String = "latest"): DataFrame =
    graft.streaming.WeatherStreams.fromKafkaWire(
      spark.read.format("kafka")
        .options(kafkaBatchOptions(
          bootstrapServers, topic, startingOffsets, endingOffsets))
        .load())

  /** XML entity decodes for sitemap `<loc>` values, `&amp;` LAST (the
    * [[graft.operators.TextPrep.HtmlEntities]] ordering rule — the
    * sitemaps.org spec REQUIRES URLs to be entity-escaped, so every
    * consumer must undo exactly these five). */
  private val XmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&apos;" -> "'", "&amp;" -> "&")

  /** Sitemap ingestion (sitemaps.org protocol) — the crawl-seed source
    * next to robots.txt: one row per `<url>` entry of a urlset sitemap
    * or per `<sitemap>` entry of a sitemap INDEX, with the fields the
    * protocol defines: `(file, kind, loc, lastmod, changefreq,
    * priority)`. `kind` is `urlset` or `index` (an index's `loc`s are
    * more sitemaps to fetch — the recursion is the caller's crawl loop,
    * not a hidden driver walk); absent optional fields are NULL;
    * `loc` is entity-decoded per the spec ([[XmlEntities]]);
    * `priority` stays the spec's decimal STRING (no float drift).
    *
    * Read shape: `wholetext` per file — the protocol caps one sitemap
    * at 50 MB uncompressed / 50k entries, so a file is always one
    * bounded row, and a crawl's many sitemaps parallelize per-file
    * exactly like the WET/WARC dumps. Parsing is one codegen'd
    * `regexp_extract_all` + explode + per-entry field extracts: no XML
    * parser state, no UDF; a malformed entry yields NULL fields, never
    * a task failure (the corrupt-row contract of the WET demux). */
  def sitemapEntries(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def field(name: String): Column = {
      val v = regexp_extract(col("__e"),
        s"(?s)<$name>\\s*(.*?)\\s*</$name>", 1)
      when(v =!= "", v)
    }
    val decodedLoc = XmlEntities.foldLeft(field("loc")) {
      case (c, (e, r)) => replace(c, lit(e), lit(r))
    }
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value"))
      .withColumn("kind",
        when(col("value").rlike("(?s)<sitemapindex[\\s>]"), lit("index"))
          .otherwise(lit("urlset")))
      .select(col("file"), col("kind"),
        explode(regexp_extract_all(col("value"),
          lit("(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1)))
          .as("__e"))
      .select(col("file"), col("kind"),
        decodedLoc.as("loc"), field("lastmod").as("lastmod"),
        field("changefreq").as("changefreq"),
        field("priority").as("priority"))
  }
}
