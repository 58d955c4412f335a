package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextPrepSpec extends SparkSuite {

  test("fixMojibake: classic double-encodings repair; clean and risky text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cafÃ© time"),        // é  = C3 A9
      (2L, "donâ€™t stop"),      // ’ = E2 80 99 (cp1252 extras)
      (3L, "Ã¼ber cool"),        // ü = C3 BC
      (4L, "clean ascii text"),  // no marker
      (5L, "math: Ã(x) = x²"),   // marker but C3 28 is invalid UTF-8 → keep
      (6L, "naïve — already fine ✓") // marker-free multibyte → keep
    ).toDF("doc_id", "text")
    val out = TextPrep.fixMojibake(docs)
      .select("doc_id", "text", "mojibake_fixed")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("café time", true)))
    assert(out(2L) == (("don’t stop", true)))
    assert(out(3L) == (("über cool", true)))
    assert(out(4L) == (("clean ascii text", false)))
    assert(out(5L) == (("math: Ã(x) = x²", false)), "invalid-UTF8 marker must not corrupt")
    assert(out(6L) == (("naïve — already fine ✓", false)))
  }

  test("renderPacks: sequences join in id order, boundaries are exclusive char ends") {
    import spark.implicits._
    // one group, budget 5 tokens: docs (2,3) pack 0, (4) overflows into
    // pack 1 after the boundary doc stays whole
    val docs = Seq(
      (1L, "aa bb"),      // 2 tokens, 5 chars
      (2L, "cc dd ee"),   // 3 tokens → cum_before 2 < 5, pack 0
      (3L, "f g h i")     // 4 tokens → cum_before 5 → pack 1
    ).toDF("doc_id", "text")
    val out = TextPrep.renderPacks(docs, lit("g"), budget = 5, eos = "|")
      .orderBy("pack_id")
      .select("pack_id", "n_docs", "seq_chars", "boundaries", "seq_md5")
      .as[(Long, Int, Long, String, String)].collect().toSeq
    // pack 0: "aa bb|cc dd ee" — ends at 5 and 14 (eos len 1)
    assert(out(0)._2 == 2 && out(0)._3 == 14L && out(0)._4 == "5,14")
    // pack 1: "f g h i" alone
    assert(out(1)._2 == 1 && out(1)._3 == 7L && out(1)._4 == "7")
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("aa bb|cc dd ee".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(out(0)._5 == expectedMd5)
  }

  test("fixMojibake is idempotent: a repaired corpus re-repairs to itself") {
    import spark.implicits._
    val docs = Seq("cafÃ© Ã¼ber donâ€™t", "plain").toDF("text")
    val once = TextPrep.fixMojibake(docs).select("text")
    val twice = TextPrep.fixMojibake(once).select("text", "mojibake_fixed")
      .as[(String, Boolean)].collect()
    assert(twice.forall(!_._2), s"second pass must be a no-op: ${twice.toSeq}")
  }
  import spark.implicits._

  test("chunkTokens: stride windows cover every token, last chunk short") {
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextPrep.chunkTokens(doc, chunkSize = 4, overlap = 1)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_text", $"n_chunk_tokens")
      .as[(Int, String, Int)].collect().toSeq
    // stride 3 → starts 0, 3, 6; ceil((10-4)/3)+1 = 3 chunks
    assert(got == Seq(
      (0, "t1 t2 t3 t4", 4),
      (1, "t4 t5 t6 t7", 4),
      (2, "t7 t8 t9 t10", 4)))
    // overlap: each consecutive pair shares exactly `overlap` tokens
    assert(got.sliding(2).forall { case Seq(a, b) =>
      a._2.split(" ").last == b._2.split(" ").head
    case _ => true })
  }

  test("chunkTokens: short doc yields exactly one chunk") {
    val doc = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = TextPrep.chunkTokens(doc, chunkSize = 8, overlap = 2)
      .select($"chunk_idx", $"chunk_text", $"n_chunk_tokens")
      .as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((0, "a b c", 3)))
  }

  test("chunkTokens: boundary — doc one token over chunkSize gets a second chunk") {
    val doc = Seq((1L, (1 to 9).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val got = TextPrep.chunkTokens(doc, chunkSize = 8, overlap = 4)
      .orderBy($"chunk_idx").select($"n_chunk_tokens").as[Int].collect().toSeq
    assert(got == Seq(8, 5)) // starts 0 and 4: tokens 1-8, then 5-9
  }

  test("packByBudget: exclusive cumsum cuts packs; straddler stays whole") {
    // token counts per doc (group g): 4, 4, 4 with budget 10:
    // exclusive cumsums 0, 4, 8 → packs 0, 0, 0 (8 < 10: third doc
    // straddles and stays in pack 0); fourth doc cumsum 12 → pack 1
    val docs = Seq(
      (1L, "a a a a"), (2L, "b b b b"), (3L, "c c c c"), (4L, "d d d d"))
      .toDF("doc_id", "text")
    val got = TextPrep.packByBudget(docs, lit("g"), budget = 10)
      .orderBy($"doc_id").select($"doc_id", $"pack_id", $"n_tokens")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0L, 4), (2L, 0L, 4), (3L, 0L, 4), (4L, 1L, 4)))
  }

  test("pluggable tokenCount: bpeish counts drive pack and quota budgets") {
    import graft.functions.TextFunctions.{bpeishCount, bpeishTokens}
    // "a,b,c,d" is 1 whitespace token but 7 BPE-ish pieces (4 letter runs
    // + 3 punctuation runs) — whitespace packing would never cut here
    val docs = Seq(
      (1L, "a,b,c,d"), (2L, "e,f,g,h"), (3L, "i,j,k,l")).toDF("doc_id", "text")
    val packed = TextPrep.packByBudget(docs, lit("g"), budget = 10,
      tokenCount = bpeishCount)
      .orderBy($"doc_id").select($"doc_id", $"pack_id", $"n_tokens")
      .as[(Long, Long, Int)].collect().toSeq
    // exclusive cumsums 0, 7, 14 → packs 0, 0, 1
    assert(packed == Seq((1L, 0L, 7), (2L, 0L, 7), (3L, 1L, 7)))
    val whitespace = TextPrep.packByBudget(docs, lit("g"), budget = 10)
      .select($"pack_id").as[Long].collect().toSet
    assert(whitespace == Set(0L), "default counter unchanged: 1 token/doc")

    val trimmed = TextPrep.quotaTrim(docs, lit("g"), budget = 10,
      tokenCount = bpeishCount)
      .orderBy($"doc_id").select($"doc_id", $"cum_tokens")
      .as[(Long, Long)].collect().toSeq
    // cum_before 0, 7 pass (< 10); doc 3 at 14 is cut
    assert(trimmed == Seq((1L, 7L), (2L, 14L)))

    // chunking over BPE-ish pieces: windows slice the piece array
    val chunks = TextPrep.chunkTokens(Seq((1L, "aa bb cc dd")).toDF("doc_id", "text"),
      chunkSize = 2, overlap = 0, tokenizer = bpeishTokens)
      .orderBy($"chunk_idx").select($"chunk_text", $"n_chunk_tokens")
      .as[(String, Int)].collect().toSeq
    // pieces: "aa", " bb", " cc", " dd" (space-prefixed runs) → 2 windows
    assert(chunks.map(_._2) == Seq(2, 2))
    assert(chunks.head._1.contains("aa") && chunks.head._1.contains("bb"))
  }

  test("packByBudget: groups pack independently") {
    val docs = Seq(
      (1L, "x", "a a a"), (2L, "x", "b b b"), (3L, "y", "c c c"))
      .toDF("doc_id", "grp", "text")
    val got = TextPrep.packByBudget(docs, col("grp"), budget = 4)
      .orderBy($"doc_id").select($"doc_id", $"group", $"pack_id")
      .as[(Long, String, Long)].collect().toSeq
    // x: cumsums 0, 3 → packs 0, 0; y restarts at cumsum 0 → pack 0
    assert(got == Seq((1L, "x", 0L), (2L, "x", 0L), (3L, "y", 0L)))
  }

  test("packByBudgetSharded: every doc packed once, deterministic, n shards") {
    val docs = (0L until 200L).map(i => (i, s"w$i " * ((i % 7 + 1).toInt)))
      .toDF("doc_id", "text")
    val a = TextPrep.packByBudgetSharded(docs, shards = 8, budget = 10)
      .select($"doc_id", $"group", $"pack_id").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    val b = TextPrep.packByBudgetSharded(docs, shards = 8, budget = 10)
      .select($"doc_id", $"group", $"pack_id").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    assert(a == b, "shard assignment and packing must be deterministic")
    assert(a.length == 200 && a.map(_._1).distinct.length == 200)
    assert(a.map(_._2).distinct.length == 8, "docs spread over all shards")
  }

  test("stripHtml: blocks dropped, tags stripped, entities decoded once, ws collapsed") {
    val docs = Seq(
      (1L, "<html><head><script>var x = 1 &lt; 2;</script><style>p{c}</style>" +
        "</head><body><!-- c --><p class=\"m\">Hello   <b>world</b></p>" +
        "&nbsp;&amp;amp; A &lt; B &#39;q&#39;</body></html>"),
      (2L, "plain text, no markup at all")).toDF("doc_id", "text")
    val got = TextPrep.stripHtml(docs)
      .select($"doc_id", $"text_plain").as[(Long, String)].collect().toMap
    // script/style/comment content gone; &amp;amp; decodes ONE level to
    // "&amp;" (never double-decoded to "&"); whitespace collapsed
    assert(got(1L) == "Hello world &amp; A < B 'q'", s"got '${got(1L)}'")
    assert(got(2L) == "plain text, no markup at all")
  }

  test("mainContent: chrome blocks drop whole, link-farm blocks drop by density, inline links survive") {
    val docs = Seq(
      (1L, "<html><body>" +
        "<header>Site Chrome</header>" +
        "<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav>" +
        // link farm: anchor text is ~all the visible text → drops
        "<div><a href=\"/1\">one</a> <a href=\"/2\">two</a> " +
        "<a href=\"/3\">three</a></div>" +
        // real content with one inline link — the link TEXT must survive
        "<div><p>Real body text here with an inline " +
        "<a href=\"/ref\">reference</a> kept.</p></div>" +
        "<aside>related</aside><footer>copyright</footer></body></html>"),
      // nested-attribute nav + uppercase tags fold the same way
      (2L, "<NAV class='x'><a href='/'>m1</a></NAV><p>only text</p>"),
      // page that is ALL chrome → empty main text
      (3L, "<nav><a href='/'>m</a></nav><footer>f</footer>")).toDF(
      "doc_id", "html")
    val got = TextPrep.mainContent(docs)
      .select($"doc_id", $"main_text").as[(Long, String)].collect().toMap
    assert(got(1L) == "Real body text here with an inline reference kept.",
      s"got '${got(1L)}'")
    assert(got(2L) == "only text", s"got '${got(2L)}'")
    assert(got(3L) == "", s"got '${got(3L)}'")
  }

  test("mainContent: density threshold is a dial; a backreferenced close tag matches its opener") {
    // <nav> must close at </nav>, never at the </footer> that follows —
    // a non-backreferenced alternation would eat the paragraph between
    val docs = Seq((1L,
      "<nav>m</nav><p>between</p><footer>f</footer>")).toDF("doc_id", "html")
    assert(TextPrep.mainContent(docs).select($"main_text")
      .as[String].head() == "between")
    // at maxLinkDensity = 1.0 even a pure link block survives
    val farm = Seq((1L, "<div><a href='/1'>one</a></div>")).toDF(
      "doc_id", "html")
    assert(TextPrep.mainContent(farm, maxLinkDensity = 1.0)
      .select($"main_text").as[String].head() == "one")
    assert(TextPrep.mainContent(farm, maxLinkDensity = 0.5)
      .select($"main_text").as[String].head() == "")
  }

  test("redactPii: plants are found, counted, and replaced") {
    val docs = Seq(
      (1L, "reach me at jane.doe+x@corp.example.org from 192.168.0.17 or 555-123-4567"),
      (2L, "no pii here, just a version 1.2 string and the number 42"))
      .toDF("doc_id", "text")
    val got = TextPrep.redactPii(docs)
      .select($"doc_id", $"n_email", $"n_ipv4", $"n_phone", $"text_clean")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    val (_, e1, i1, p1, t1) = got(1L)
    assert((e1, i1, p1) == ((1, 1, 1)))
    assert(t1 == "reach me at [PII] from [PII] or [PII]")
    val (_, e2, i2, p2, t2) = got(2L)
    assert((e2, i2, p2) == ((0, 0, 0)))
    assert(t2 == "no pii here, just a version 1.2 string and the number 42")
  }

  test("quotaTrim: budget cut per group, straddler kept, overflow bounded by one doc") {
    // group g, 4-token docs, budget 10: cum_before 0, 4, 8 kept (8 < 10,
    // doc 3 straddles and stays), cum_before 12 cut
    val docs = Seq(
      (1L, "a a a a"), (2L, "b b b b"), (3L, "c c c c"), (4L, "d d d d"))
      .toDF("doc_id", "text")
    val got = TextPrep.quotaTrim(docs, lit("g"), budget = 10)
      .orderBy($"doc_id").select($"doc_id", $"n_tokens", $"cum_tokens")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((1L, 4, 4L), (2L, 4, 8L), (3L, 4, 12L)))
  }

  test("quotaTrim: groups trim independently") {
    val docs = Seq(
      (1L, "x", "a a a"), (2L, "x", "b b b"), (3L, "y", "c c c"))
      .toDF("doc_id", "grp", "text")
    val got = TextPrep.quotaTrim(docs, col("grp"), budget = 4)
      .select($"doc_id").as[Long].collect().toSet
    // x: doc 1 kept (0 < 4), doc 2 cut (cum_before 3... 3 < 4 → kept!)
    // budget 4 with 3-token docs: cum_before 0, 3 → both x docs kept;
    // y restarts → kept. Tighten: budget 3 would cut doc 2.
    assert(got == Set(1L, 2L, 3L))
    val tight = TextPrep.quotaTrim(docs, col("grp"), budget = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(tight == Set(1L, 3L), "doc 2's cum_before 3 is not < 3; y unaffected")
  }

  test("trainingShards: deterministic permutation, all docs, dense in-shard positions") {
    val docs = (0L until 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val a = TextPrep.trainingShards(docs, shards = 8)
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Int)].collect().toSeq
    val b = TextPrep.trainingShards(docs, shards = 8)
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Int)].collect().toSeq
    assert(a.sortBy(_._1) == b.sortBy(_._1), "shard/pos must be deterministic")
    assert(a.map(_._1).distinct.length == 500, "a permutation loses nothing")
    assert(a.map(_._2).distinct.sorted == (0 until 8), "all shards populated")
    // positions within each shard are exactly 1..n (dense rank, no holes)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.length))
    }
    // the permutation actually shuffles: in-shard order is not id order
    val shard0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0 != shard0.sorted, "md5 ordering should not equal id order")
  }

  test("stripBoilerplate: template lines removed everywhere, per-source, content kept") {
    val docs = Seq(
      // src a: "nav bar" in 3/3 docs (share 1.0) → stripped everywhere;
      // "promo line" in 2/3 (share 0.67 ≥ 0.5) → stripped; content unique
      (1L, "a", "nav bar\ncontent one\npromo line"),
      (2L, "a", "nav bar\ncontent two"),
      (3L, "a", "promo line\nnav bar\ncontent three"),
      // src b: "nav bar" occurs in only 1/2 docs there → NOT boilerplate
      // for b (per-source scoping), "solo" unique
      (4L, "b", "nav bar\nsolo body"),
      (5L, "b", "other body")
    ).toDF("doc_id", "source", "text")
    val got = TextPrep.stripBoilerplate(docs, minShare = 0.5)
      .select($"doc_id", $"text_clean", $"n_lines", $"n_kept")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "content one", 3L, 1L)))
    assert(got(2L) == ((2L, "content two", 2L, 1L)))
    assert(got(3L) == ((3L, "content three", 3L, 1L)))
    assert(got(4L) == ((4L, "nav bar\nsolo body", 2L, 2L)), "per-source scoping")
    assert(got(5L) == ((5L, "other body", 1L, 1L)))
    // minDf floor: in a 2-doc source, a line in both has share 1.0 —
    // still needs df >= minDf; with minDf=3 nothing is stripped
    val strict = TextPrep.stripBoilerplate(
      Seq((6L, "c", "x\ny"), (7L, "c", "x\nz")).toDF("doc_id", "source", "text"),
      minShare = 0.5, minDf = 3)
      .select($"doc_id", $"text_clean").as[(Long, String)].collect().toMap
    assert(strict(6L) == "x\ny" && strict(7L) == "x\nz")
  }

  test("dedupParagraphs: first occurrence survives, rebuild ordered, empty doc kept") {
    val docs = Seq(
      (1L, "intro one\n\ncookie banner\n\nbody alpha"),
      (2L, "cookie banner\n\nbody beta"),        // banner seen in doc 1 → dropped
      (3L, "cookie banner"),                     // fully boilerplate → empty
      (4L, "body beta\n\nintro one\n\nfresh tail") // both seen → only tail stays
    ).toDF("doc_id", "text")
    val got = TextPrep.dedupParagraphs(docs)
      .select($"doc_id", $"text_dedup", $"n_paras", $"n_kept")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "intro one\n\ncookie banner\n\nbody alpha", 3L, 3L)))
    assert(got(2L) == ((2L, "body beta", 2L, 1L)))
    assert(got(3L) == ((3L, "", 1L, 0L)))
    assert(got(4L) == ((4L, "fresh tail", 3L, 1L)))
    // whitespace-only paragraphs never count
    val ws = TextPrep.dedupParagraphs(
      Seq((9L, "a\n\n \n\nb")).toDF("doc_id", "text"))
      .select($"n_paras", $"n_kept").as[(Long, Long)].head()
    assert(ws == ((2L, 2L)))
    // idempotence: running again on the deduped text changes nothing
    val once = TextPrep.dedupParagraphs(docs)
      .select($"doc_id", $"text_dedup".as("text"))
    val twice = TextPrep.dedupParagraphs(once)
      .select($"doc_id", $"text_dedup").as[(Long, String)].collect().toMap
    assert(twice == got.view.mapValues(_._2).toMap)
  }

  test("stagingDir twins: dedupParagraphs / stripBoilerplate identical, nothing pinned") {
    val docs = Seq(
      (1L, "s1", "intro one\ncookie banner\nbody alpha\n\nintro one"),
      (2L, "s1", "cookie banner\nbody beta"),
      (3L, "s1", "cookie banner\nbody gamma"),
      (4L, "s2", "intro one\n\nbody beta")
    ).toDF("doc_id", "source", "text")
    spark.catalog.clearCache()
    val dir = java.nio.file.Files.createTempDirectory("textprep_stage").toString
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val pDefault = rowsOf(TextPrep.dedupParagraphs(docs))
    val bDefault = rowsOf(TextPrep.stripBoilerplate(docs, minShare = 0.5))
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val pStaged = rowsOf(TextPrep.dedupParagraphs(docs,
      stagingDir = Some(dir)))
    val bStaged = rowsOf(TextPrep.stripBoilerplate(docs, minShare = 0.5,
      stagingDir = Some(dir)))
    // <= not ==: clearCache unpersists asynchronously, so `before` may
    // still count pins that drain while the staged runs execute — the
    // staged path itself adding a pin is what must fail
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "stagingDir path must not pin CacheManager relations")
    assert(pStaged == pDefault && bStaged == bDefault,
      "staged and persisted paths must agree")
    graft.operators.Staging.drop(spark, dir)
  }

  test("fimTransform: PSM render reassembles to the original; draws are deterministic") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i body " + ("w" * (i % 37).toInt)))
      .toDF("doc_id", "text")
    val got = TextPrep.fimTransform(docs, ratePct = 50,
      preTok = "<P>", sufTok = "<S>", midTok = "<M>")
      .select($"doc_id", $"text", $"fim", $"seq")
      .as[(Long, String, Boolean, String)].collect()
    assert(got.count(_._3) > 40 && got.count(!_._3) > 40) // both classes live
    got.foreach { case (_, text, fim, seq) =>
      if (!fim) assert(seq == text)
      else {
        // <P>prefix<S>suffix<M>middle — reassembly recovers the doc
        val m = "(?s)^<P>(.*)<S>(.*)<M>(.*)$".r
        seq match {
          case m(pre, suf, mid) => assert(pre + mid + suf == text)
          case _ => fail(s"unparseable FIM render: $seq")
        }
      }
    }
    // identical input → identical draws (pure hash arithmetic, no RNG)
    val again = TextPrep.fimTransform(docs, ratePct = 50,
      preTok = "<P>", sufTok = "<S>", midTok = "<M>")
      .select($"doc_id", $"seq").as[(Long, String)].collect().toMap
    assert(got.forall(r => again(r._1) == r._4))
  }

  test("fimTransform: rate dials and the short-doc passthrough") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, ""), (3L, "ab")).toDF("doc_id", "text")
    val all = TextPrep.fimTransform(docs, ratePct = 100)
      .select($"doc_id", $"fim").as[(Long, Boolean)].collect().toMap
    assert(!all(1L) && !all(2L)) // < 2 chars: no meaningful cut
    assert(all(3L))
    val none = TextPrep.fimTransform(docs, ratePct = 0)
      .select($"fim").as[Boolean].collect()
    assert(none.forall(!_))
  }

  test("htmlToMarkdown: full-feature golden — structure survives, chrome dies") {
    import spark.implicits._
    val html = "<html><head><script>var x=1;</script><style>.a{}</style>" +
      "<title>T</title></head><body><h1>Top</h1><h2>Sub &amp; more</h2>" +
      "<p>Intro <b>bold</b> and <em>it</em>.</p><ul><li>alpha<li>beta</ul>" +
      "<p>See <a href=\"/r/1\">link <strong>one</strong></a> now.</p>" +
      "<pre><code>x = 1</code></pre><div>tail&nbsp;line<br>end</div>" +
      "<!-- c --></body></html>"
    val out = TextPrep.htmlToMarkdown(Seq((1L, html)).toDF("doc_id", "html"))
      .select($"markdown").as[String].head()
    val expected =
      "# Top\n\n## Sub & more\n\nIntro **bold** and *it*.\n\n" +
        "- alpha\n- beta\n\nSee [link **one**](/r/1) now.\n\n" +
        "`x = 1`\n\ntail line\nend"
    assert(out == expected, s"got:\n$out")
  }

  test("htmlToMarkdown: heading levels 1-6, null html, markdown newline semantics") {
    import spark.implicits._
    val docs = (1 to 6).map(n =>
      (n.toLong, s"<h$n>t$n</h$n><p>p</p>")).toDF("doc_id", "html")
    val out = TextPrep.htmlToMarkdown(docs)
      .select($"doc_id", $"markdown").as[(Long, String)].collect().toMap
    (1 to 6).foreach(n => assert(out(n.toLong) == s"${"#" * n} t$n\n\np"))
    val nul = TextPrep.htmlToMarkdown(
      Seq((1L, null: String)).toDF("doc_id", "html"))
      .select($"markdown").as[String].head()
    assert(nul == null)
    // newlines are semantic: blank-line runs clamp to ONE blank line,
    // horizontal runs collapse, edges strip fully (incl. newlines)
    val ws = TextPrep.htmlToMarkdown(Seq((1L,
      "<div></div><div></div><p>a\t \tb</p><br><br><br>")).toDF("doc_id", "html"))
      .select($"markdown").as[String].head()
    assert(ws == "a b")
  }

  test("htmlToMarkdown: rule templates render per engine dialect") {
    assert(TextPrep.renderMarkdownTemplate("[«2»](«1»)", javaGroups = true)
      == "[$2]($1)")
    assert(TextPrep.renderMarkdownTemplate("[«2»](«1»)", javaGroups = false)
      == "[\\2](\\1)")
    // RE2's rewrite parser rejects any backslash escape other than a
    // group digit — templates must carry REAL newlines, never \+n
    TextPrep.MarkdownRules.foreach { case (_, tpl) =>
      assert(!tpl.contains("\\n"), s"template must use real newlines: $tpl")
    }
  }
}
