package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Directive/metadata semantics for [[PageMeta]]: extraction forms the
  * planted fixture can't cover (first-tag-wins, base-href interplay,
  * head-less fallback, null HTML), the robots token rules, and the
  * cluster/admission reductions on hand-written page sets. */
class PageMetaSpec extends SparkSuite {
  import spark.implicits._

  private def meta(html: String, url: String = "http://s.com/d/p.html"): Row =
    PageMeta.pageMeta(
      Seq((1L, url, html)).toDF("id", "url", "html"),
      $"url", $"html", Seq("id"))
      .select($"lang_attr", $"title", $"description", $"og_title",
        $"canonical", $"noindex", $"nofollow")
      .collect()(0)

  test("pageMeta: field extraction, case/order/quote noise, decoys") {
    val r = meta(
      """<html LANG='EN-us'><head>""" +
        """<TITLE> A   B
          |C </TITLE>""".stripMargin +
        """<meta content="desc here" NAME='description'>""" +
        """<meta property="og:title" content="og here">""" +
        """<meta name="descriptionx" content="decoy">""" +
        """</head><body><p>x</p></body></html>""")
    assert(r.getString(0) == "en-us") // BCP 47 tags fold to lowercase
    assert(r.getString(1) == "A B C") // whitespace collapsed + trimmed
    assert(r.getString(2) == "desc here") // order/case/quote free
    assert(r.getString(3) == "og here")
    assert(r.isNullAt(4) && !r.getBoolean(5) && !r.getBoolean(6))
  }

  test("pageMeta: first tag wins; empty/absent fields are null") {
    val r = meta(
      "<html><head><title>first</title><title>second</title>" +
        """<meta name="robots" content="noindex">""" +
        """<meta name="robots" content="all">""" +
        "</head><body></body></html>")
    assert(r.getString(1) == "first")
    assert(r.getBoolean(5)) // the FIRST robots meta governs
    val e = meta("<html><head><title>  </title></head><body></body></html>")
    assert(e.isNullAt(0) && e.isNullAt(1) && e.isNullAt(2) && e.isNullAt(3))
  }

  test("pageMeta: robots token semantics — none=both, token split, case") {
    def rob(content: String): (Boolean, Boolean) = {
      val r = meta("<html><head>" +
        s"""<meta name="robots" content="$content">""" +
        "</head><body></body></html>")
      (r.getBoolean(5), r.getBoolean(6))
    }
    assert(rob("NOINDEX ,  NoFollow") == (true, true))
    assert(rob("none") == (true, true))
    assert(rob("noarchive, nosnippet") == (false, false))
    // token boundaries: substring lookalikes never match
    assert(rob("noindexing nofollowup") == (false, false))
  }

  test("pageMeta: canonical resolves via <base href> then canonicalizes") {
    val r = meta(
      "<html><head><base href=\"/other/dir/\">" +
        "<link rel='canonical' href='../c/7?utm_source=x&b=1#f'>" +
        "</head><body></body></html>",
      url = "http://www.Site.com/d/p.html")
    // base /other/dir/ + ../c/7 → /other/c/7; tracking param + fragment
    // strip, host folds
    assert(r.getString(4) == "http://site.com/other/c/7?b=1")
  }

  test("pageMeta: head-less page falls back to the whole document") {
    val r = meta("<html><title>t</title>" +
      """<meta name="robots" content="nofollow"><p>body</p>""")
    assert(r.getString(1) == "t" && r.getBoolean(6))
  }

  test("pageMeta: null HTML → null metadata, false verdicts") {
    val r = meta(null)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(4))
    assert(!r.getBoolean(5) && !r.getBoolean(6))
  }

  test("noindexDirective / nofollowDirective: the header channel shares the token rules") {
    val got = Seq("noindex", "noarchive, nosnippet", "NONE",
      "nofollowup noindexing", null)
      .toDF("v")
      .select(PageMeta.noindexDirective($"v"), PageMeta.nofollowDirective($"v"))
      .as[(Boolean, Boolean)].collect().toSeq
    assert(got == Seq((true, false), (false, false), (true, true),
      (false, false), (false, false)))
  }

  test("alternates: rel token list, base resolution, hreflang fold, decoys") {
    val pages = Seq((7L, "http://www.Site.com/a/p.html",
      "<html><head>" +
        // rel is a token LIST — "alternate amphtml" qualifies
        """<link rel="alternate amphtml" hreflang="EN-us" href="../en/p">""" +
        """<link hreflang='de' href='http://site.com/de' rel='alternate'>""" +
        // no hreflang → not a language alternate
        """<link rel="alternate" type="application/rss+xml" href="/f">""" +
        // no href → nothing to point at
        """<link rel="alternate" hreflang="fr">""" +
        """<link rel="stylesheet" hreflang="en" href="/css">""" +
        "</head><body></body></html>")).toDF("doc_id", "url", "html")
    val got = PageMeta.alternates(pages, $"url", $"html", Seq("doc_id"))
      .orderBy($"hreflang")
      .select($"hreflang", $"target").as[(String, String)].collect().toSeq
    assert(got == Seq(
      "de" -> "http://site.com/de",
      "en-us" -> "http://site.com/en/p"))
  }

  test("canonicalClusters: declared targets collapse, undeclared self-cluster") {
    val pages = Seq(
      (1L, "http://a.com/p1?utm_source=x",
        """<html><head><link rel="canonical" href="http://a.com/main"></head><body></body></html>"""),
      (2L, "http://a.com/p2",
        """<html><head><link rel="canonical" href="http://a.com/main"></head><body></body></html>"""),
      (3L, "http://b.com/solo", "<html><head></head><body></body></html>"))
      .toDF("id", "url", "html")
    val got = PageMeta.canonicalClusters(pages, $"url", $"html")
      .orderBy($"canonical")
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(
      ("http://a.com/main", 2L, "http://a.com/p1"),
      ("http://b.com/solo", 1L, "http://b.com/solo")))
  }

  private def refresh(html: String, url: String = "http://s.com/d/p.html") =
    PageMeta.metaRefresh(
      Seq((1L, url, html)).toDF("id", "url", "html"),
      $"url", $"html", Seq("id"))
      .select($"delay_s", $"target").as[(Int, String)].collect().toSeq

  test("metaRefresh: quote styles, case, separators, first tag wins") {
    assert(refresh("<html><head>" +
      """<meta http-equiv="refresh" content="0; url=http://t.com/a">""" +
      """<meta http-equiv="refresh" content="9; url=http://t.com/b">""" +
      "</head><body></body></html>") == Seq(0 -> "http://t.com/a"))
    // uppercase attr/value, single quotes, comma separator, bare target
    assert(refresh("<html><head>" +
      "<meta HTTP-EQUIV='Refresh' content='30 , URL=/x/y'>" +
      "</head><body></body></html>") ==
      Seq(30 -> "http://s.com/x/y"))
    // quoted url value inside the content string
    assert(refresh("<html><head>" +
      """<meta http-equiv="refresh" content="5; url='/q?b=1&utm_id=z'">""" +
      "</head><body></body></html>") ==
      Seq(5 -> "http://s.com/q?b=1"))
  }

  test("metaRefresh: reload-only, decoys, non-http targets all drop") {
    // no url= clause → a reload, not a redirect
    assert(refresh("<html><head>" +
      """<meta http-equiv="refresh" content="30">""" +
      "</head><body></body></html>").isEmpty)
    // decoy http-equiv value; url= text in the body; refresh tag AFTER
    // </head> — none may match
    assert(refresh("<html><head>" +
      """<meta http-equiv="refreshx" content="0; url=http://evil.com/">""" +
      "</head><body><p>content=\"0; url=http://nope.com/\"</p>" +
      """<meta http-equiv="refresh" content="0; url=http://late.com/">""" +
      "</body></html>").isEmpty)
    // non-http(s) resolved target drops like every resolver here
    assert(refresh("<html><head>" +
      """<meta http-equiv="refresh" content="0; url=mailto:x@y.com">""" +
      "</head><body></body></html>").isEmpty)
  }

  test("metaRefresh: relative targets resolve via <base href>") {
    assert(refresh("<html><head><base href=\"/b/c/\">" +
      """<meta http-equiv="refresh" content="2; url=../r/7">""" +
      "</head><body></body></html>") ==
      Seq(2 -> "http://s.com/b/r/7"))
    // head-less page: whole-document fallback still finds the tag
    assert(refresh("<html>" +
      """<meta http-equiv="refresh" content="1; url=q">""" +
      "<p>x</p></html>") == Seq(1 -> "http://s.com/d/q"))
  }

  test("indexAdmission: noindex pages drop before the collapse") {
    val pages = Seq(
      (1L, "http://a.com/p1",
        """<html><head><meta name="robots" content="noindex">""" +
          """<link rel="canonical" href="http://a.com/main"></head><body></body></html>"""),
      (2L, "http://a.com/p2",
        """<html><head><link rel="canonical" href="http://a.com/main"></head><body></body></html>"""))
      .toDF("id", "url", "html")
    val got = PageMeta.indexAdmission(pages, $"url", $"html")
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("http://a.com/main", 1L, "http://a.com/p2")))
  }
}
