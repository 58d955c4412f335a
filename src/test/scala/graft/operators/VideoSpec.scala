package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** AVI container + MJPEG/RGB24 codec family (`Video`). The gate logic
  * mirrors the media-family stance: lossless RGB frames are bit-exact
  * against the closed-form rule; MJPEG is a bounded-deviation
  * contract; the demux is gated on header WORDS read back from bytes. */
class VideoSpec extends SparkSuite {

  import spark.implicits._

  /** Closed-form channel sum of one rgb24 frame. */
  private def ruleSum(w: Int, h: Int, f: Int, seed: Int): Long = {
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = Video.rgbRule(seed, x, y, f)
      sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
    }
    sum
  }

  test("encodeAvi → parseAvi round-trips every header word (both codecs)") {
    for ((codec, nf) <- Seq(Video.CodecRgb -> 3, Video.CodecMjpeg -> 5)) {
      val bytes = Video.encodeAvi(11, 7, nf, 40000L, 42, codec)
      val avi = Video.parseAvi(bytes).get
      assert(avi.width == 11 && avi.height == 7)
      assert(avi.headerFrames == nf)
      assert(avi.frames.length == nf) // counted from the movi walk
      assert(avi.fpsMicros == 40000L)
      assert(avi.codec == codec)
    }
  }

  test("rgb24 decode is bit-exact against the closed-form rule") {
    val (w, h, nf, seed) = (10, 6, 4, 97)
    val avi = Video.parseAvi(
      Video.encodeAvi(w, h, nf, 33333L, seed, Video.CodecRgb)).get
    avi.frames.zipWithIndex.foreach { case (fb, f) =>
      val img = Video.decodeFrame(avi, fb).get
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        assert(p == (0xFF000000 | Video.rgbRule(seed, x, y, f)),
          s"pixel ($x,$y) frame $f")
        sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
      }
      assert(sum == ruleSum(w, h, f, seed))
    }
  }

  test("odd-width rgb24 rows survive the 4-byte DIB stride padding") {
    // w=5 → row bytes 15, stride 16: the pad byte must not shift pixels
    val (w, h, seed) = (5, 3, 7)
    val avi = Video.parseAvi(
      Video.encodeAvi(w, h, 2, 20000L, seed, Video.CodecRgb)).get
    val img = Video.decodeFrame(avi, avi.frames(1)).get
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRGB(x, y) == (0xFF000000 | Video.rgbRule(seed, x, y, 1)))
  }

  test("mjpeg deviation is bounded across the id sweep (probe for the face gate)") {
    // Same probe protocol as the q_media_jpeg bound: worst case across
    // a sweep of the face's id-derived geometries, gate at ~3× margin.
    var worst = 0
    for (id <- 0L until 512L by 5L) {
      val w = (id % 8 + 4).toInt
      val h = (id * 3 % 8 + 4).toInt
      val nf = (id % 4 + 2).toInt
      val seed = (id % 256).toInt
      val avi = Video.parseAvi(
        Video.encodeAvi(w, h, nf, 20000L, seed, Video.CodecMjpeg)).get
      avi.frames.zipWithIndex.foreach { case (fb, f) =>
        val img = Video.decodeFrame(avi, fb).get
        for (y <- 0 until h; x <- 0 until w) {
          val got = img.getRGB(x, y)
          val want = Video.mjpegRule(seed, x, y, f)
          val dev = Seq(16, 8, 0).map(sh =>
            math.abs(((got >> sh) & 0xFF) - ((want >> sh) & 0xFF))).max
          worst = math.max(worst, dev)
        }
      }
    }
    info(s"worst mjpeg deviation across sweep: $worst")
    assert(worst <= 12, s"face gate bound (12) violated: $worst")
  }

  test("a second (audio) stream's strf must not overwrite the video header words") {
    // real-world AVIs interleave a 'vids' strl and an 'auds' strl whose
    // strf is a WAVEFORMAT — if the walk binds strf without stream
    // context, the audio block last-writer-wins garbage into
    // width/height/codec and the decode goes dark on a valid video
    val audioStrh = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("auds".getBytes("US-ASCII")); b.write(new Array[Byte](52))
      b.toByteArray
    }
    val audioStrf = new Array[Byte](40) // zeroed WAVEFORMAT-sized block
    val audioStrl = Video.list("strl",
      Video.chunk("strh", audioStrh) ++ Video.chunk("strf", audioStrf))
    val img = (0 until 2).map(f =>
      Video.parseAvi(Video.encodeAvi(6, 4, 2, 20000L, 3, Video.CodecRgb))
        .map(a => Video.decodeFrame(a, a.frames(f)).get).get)
    val bytes = Video.encodeAviFromImages(img, 20000L, Video.CodecRgb,
      extraStrl = Seq(audioStrl))
    val avi = Video.parseAvi(bytes).get
    assert(avi.width == 6 && avi.height == 4, "video strf must win")
    assert(avi.codec == Video.CodecRgb)
    assert(avi.frames.length == 2)
    assert(Video.decodeFrame(avi, avi.frames(1)).isDefined)
  }

  test("hostile strf dims are rejected before anything allocates") {
    // a corrupt/hostile container can claim arbitrary width/height; an
    // unchecked product Int-overflows past the old length check and the
    // raster allocation OOMs the task (an Error NonFatal doesn't catch)
    def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int = 0): Int =
      (from to hay.length - needle.length)
        .find(i => needle.indices.forall(j => hay(i + j) == needle(j)))
        .getOrElse(-1)
    def patchDims(w: Long, h: Long): Array[Byte] = {
      val b = Video.encodeAvi(6, 4, 2, 20000L, 3, Video.CodecRgb).clone()
      val at = indexOf(b, "strf".getBytes("US-ASCII"))
      assert(at > 0)
      def putU32(o: Int, v: Long): Unit = {
        b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
        b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
      }
      putU32(at + 12, w); putU32(at + 16, h) // strf data+4 / data+8
      b
    }
    assert(Video.parseAvi(patchDims(0x40000000L, 4L)).isEmpty) // absurd width
    assert(Video.parseAvi(patchDims(0x10000L, 4L)).isEmpty)    // > 2^16 axis
    // both axes legal but the PRODUCT Int-overflows: 65535² ≈ 4.3e9
    assert(Video.parseAvi(patchDims(0xFFFFL, 0xFFFFL)).isEmpty)
    // sanity: the unpatched container still parses
    assert(Video.parseAvi(Video.encodeAvi(6, 4, 2, 20000L, 3,
      Video.CodecRgb)).nonEmpty)
  }

  test("a second video stream's frame chunks ('01db') are not interleaved") {
    // frame chunks are named by STREAM ordinal; only the first 'vids'
    // stream's chunks belong to the decoded sequence — rebadging one
    // chunk as stream 01 must drop it from frames, not inflate them
    def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int =
      (from to hay.length - needle.length)
        .find(i => needle.indices.forall(j => hay(i + j) == needle(j)))
        .getOrElse(-1)
    val b = Video.encodeAvi(6, 4, 3, 20000L, 3, Video.CodecRgb).clone()
    val first = indexOf(b, "00db".getBytes("US-ASCII"), 0)
    val second = indexOf(b, "00db".getBytes("US-ASCII"), first + 1)
    assert(second > 0)
    b(second) = '0'.toByte; b(second + 1) = '1'.toByte // 00db → 01db
    val avi = Video.parseAvi(b).get
    assert(avi.frames.length == 2, "the rebadged chunk must be excluded")
  }

  test("corrupt payloads parse to None / zero rows, never a failure") {
    assert(Video.parseAvi(null).isEmpty)
    assert(Video.parseAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Video.parseAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // truncated mid-movi: header parses, but a well-formed Avi requires
    // the header words — cut INSIDE the hdrl so parse yields None
    val full = Video.encodeAvi(6, 6, 3, 20000L, 1, Video.CodecRgb)
    assert(Video.parseAvi(full.take(40)).isEmpty)
    // truncated AFTER the headers: frames walked up to the cut, meta kept
    val cut = Video.parseAvi(full.take(full.length - 10))
    assert(cut.nonEmpty && cut.get.frames.length < 3)
  }

  test("fuzz: byte-flipped and random containers never throw (None / partial)") {
    val rnd = new scala.util.Random(7)
    val base = Video.encodeAvi(8, 6, 3, 25000L, 5, Video.CodecMjpeg)
    for (_ <- 1 to 300) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      // must not throw; whatever parses may decode or not — also not throw
      Video.parseAvi(mutated).foreach { avi =>
        avi.frames.foreach(f => Video.decodeFrame(avi, f))
      }
      val garbage = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Video.parseAvi(garbage)
    }
  }

  test("attachAvi → decodeMeta reads header words back from the bytes") {
    val ids = Seq(0L, 1L, 5L, 12L, 33L).toDF("doc_id")
    val out = Video.decodeMeta(Video.attachAvi(ids,
      id => if (id % 2 == 0) Video.CodecRgb else Video.CodecMjpeg))
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 8 + 4).toInt, "width")
      assert(r.getInt(2) == (id * 3 % 8 + 4).toInt, "height")
      assert(r.getInt(3) == (id % 4 + 2).toInt, "header n_frames")
      assert(r.getInt(4) == r.getInt(3), "movi count == header count")
      assert(r.getLong(5) == 20000L + (id % 7) * 5000L, "fps_micros")
      assert(r.getString(6) ==
        (if (id % 2 == 0) Video.CodecRgb else Video.CodecMjpeg), "codec")
    }
  }

  test("decodeFrames stride samples exactly the 0-mod-stride movi ordinals") {
    val ids = Seq(3L, 7L).toDF("doc_id") // nf = 5 and 5
    val all = Video.decodeFrames(
      Video.attachAvi(ids, _ => Video.CodecRgb), stride = 1)
      .select("doc_id", "frame_idx").as[(Long, Int)].collect().toSet
    val sampled = Video.decodeFrames(
      Video.attachAvi(ids, _ => Video.CodecRgb), stride = 2)
      .select("doc_id", "frame_idx").as[(Long, Int)].collect().toSet
    assert(sampled == all.filter(_._2 % 2 == 0))
    assert(sampled.nonEmpty && sampled.size < all.size)
  }

  test("resizeFrames: decode→NN-resize→re-encode round-trips bit-exactly") {
    val ids = Seq(4L, 11L).toDF("doc_id")
    val out = Video.decodeFrames(Video.resizeFrames(
        Video.attachAvi(ids, _ => Video.CodecRgb), newWidth = 6, newHeight = 5))
      .orderBy("doc_id", "frame_idx").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val (w0, h0) = ((id % 8 + 4).toInt, (id * 3 % 8 + 4).toInt)
      val (seed, f) = ((id % 256).toInt, r.getInt(1))
      assert(r.getInt(2) == 6 && r.getInt(3) == 5)
      var want = 0L
      for (y <- 0 until 5; x <- 0 until 6) {
        val p = Video.rgbRule(seed, x * w0 / 6, y * h0 / 5, f)
        want += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
      }
      assert(r.getLong(4) == want, s"id=$id frame=$f")
    }
    // corrupt media passes through as null → zero decoded rows
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("media", Multimodal.mediaSchema)))
    val bad = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(9L,
          org.apache.spark.sql.Row(Array[Byte](1, 2, 3),
            org.apache.spark.sql.Row("video/x-msvideo", 4, 4)))),
      schema)
    assert(Video.decodeFrames(Video.resizeFrames(bad, 6, 5)).count() == 0)
  }

  test("decodeFrames px sums match the closed-form rule end-to-end") {
    val ids = Seq(2L, 9L, 14L).toDF("doc_id")
    val out = Video.decodeFrames(Video.attachAvi(ids, _ => Video.CodecRgb))
      .orderBy("doc_id", "frame_idx").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 8 + 4).toInt, (id * 3 % 8 + 4).toInt)
      assert(r.getInt(2) == w && r.getInt(3) == h)
      assert(r.getLong(4) == ruleSum(w, h, r.getInt(1), (id % 256).toInt))
    }
    val expected = Seq(2L, 9L, 14L).map(id => (id % 4 + 2)).sum
    assert(out.length == expected)
  }
}
