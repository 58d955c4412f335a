package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Extraction-form coverage for [[Links.extractLinks]] /
  * [[Links.extractAnchors]] and local references for the
  * outlink/host-graph reductions. */
class LinksSpec extends SparkSuite {
  import spark.implicits._

  private def links(html: String): Seq[String] =
    Seq(html).toDF("h").select(Links.extractLinks($"h").as("l"))
      .as[Seq[String]].collect()(0)

  test("extractLinks: quote styles, attribute order, tag case, unquoted") {
    assert(links("""<a href="/x">t</a>""") == Seq("/x"))
    assert(links("""<a href='/y'>t</a>""") == Seq("/y"))
    assert(links("""<A HREF="/up">t</A>""") == Seq("/up"))
    assert(links("""<a class="k" rel=nofollow href="/z">t</a>""") == Seq("/z"))
    // unquoted (legal HTML5): up to the first whitespace or '>'
    assert(links("""<a href=/plain>t</a>""") == Seq("/plain"))
    assert(links("""<a href=/p rel=x>t</a>""") == Seq("/p"))
    // double-quoted matches list before single-quoted (extraction-order
    // contract the q_link_extract face's link_no relies on)
    assert(links("""<a href='/b'>1</a><a href="/a">2</a>""") ==
      Seq("/a", "/b"))
    // non-anchor hrefs (link/area) are NOT <a> tags and don't match
    assert(links("""<link href="/css"><a href="/only">t</a>""") ==
      Seq("/only"))
    assert(links("<p>no links</p>") == Seq.empty)
    // null HTML propagates
    val n = Seq((1, null: String)).toDF("i", "h")
      .select(Links.extractLinks($"h")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("extractAnchors: (href, anchor_text) pairs in document order") {
    val got = Seq(
      """<a href="/a">first</a> mid <a class=k href="/b"><b>second</b></a>""")
      .toDF("h")
      .select(explode(Links.extractAnchors($"h")).as("p"))
      .select($"p.href", $"p.anchor").as[(String, String)].collect().toSeq
    assert(got == Seq("/a" -> "first", "/b" -> "<b>second</b>"))
  }

  test("outlinks: resolve + canonicalize against the page URL") {
    val pages = Seq(
      (1L, "http://www.Site.com/dir/page.html",
        """<a href="../up">u</a><a href="?v=2">q</a>""" +
          """<a href="//cdn.example.net/l">c</a>""")).toDF(
      "doc_id", "url", "html")
    val got = Links.outlinks(pages, $"url", $"html", Seq("doc_id"))
      .orderBy($"link_no")
      .select($"link_no", $"target").as[(Int, String)].collect().toSeq
    assert(got == Seq(
      0 -> "http://site.com/up",
      1 -> "http://site.com/dir/page.html?v=2",
      2 -> "http://cdn.example.net/l"))
  }

  test("hostGraph: self edges drop, host-less targets drop, counts") {
    val pages = Seq(
      // two links to ext.org, one self link, one mailto (no host)
      (1L, "http://a.com/p",
        """<a href="http://ext.org/1">x</a><a href="http://ext.org/2">y</a>""" +
          """<a href="/self">s</a><a href="mailto:z@q.com">m</a>"""),
      (2L, "http://b.com/p", """<a href="//ext.org/3">x</a>""")).toDF(
      "doc_id", "url", "html")
    val got = Links.hostGraph(pages, $"url", $"html")
      .orderBy($"src_host", $"dst_host")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a.com", "ext.org", 2L), ("b.com", "ext.org", 1L)))
    // includeSelf keeps the intra-host edge
    val self = Links.hostGraph(pages, $"url", $"html", includeSelf = true)
      .where($"src_host" === $"dst_host")
      .as[(String, String, Long)].collect().toSeq
    assert(self == Seq(("a.com", "a.com", 1L)))
  }

  test("anchorCorpus: distinct-sort-cap per target, both quote styles") {
    val pages = Seq(
      (1L, "http://a.com/p",
        """<a href="http://t.org/x">beta</a><a href='http://t.org/x'>alpha</a>""" +
          """<a href="http://t.org/x">beta</a><a href="mailto:z@q">skip</a>"""),
      (2L, "http://b.com/p",
        """<a href="http://t.org/x">gamma</a>""")).toDF(
      "doc_id", "url", "html")
    val got = Links.anchorCorpus(pages, $"url", $"html", maxAnchors = 2)
      .as[(String, Long, String)].collect().toSeq
    // 4 anchors total (mailto dropped), distinct {alpha,beta,gamma}
    // sorted then capped at 2
    assert(got == Seq(("http://t.org/x", 4L, "alpha,beta")))
  }

  test("anchorCorpus: hot target with >> maxAnchors distinct anchors stays k-bounded and exact") {
    // one target accumulating 200 distinct anchor texts (plus repeats):
    // the k-bounded heap must return the lexicographic first k of the
    // FULL distinct set and the exact total count — identical semantics
    // to sorted-distinct-then-cap, without the unbounded buffer
    val pages = (0 until 200).map { i =>
      val a = f"a$i%03d"
      (i.toLong, s"http://p$i.com/x",
        s"""<a href="http://hot.org/t">$a</a><a href="http://hot.org/t">$a</a>""")
    }.toDF("doc_id", "url", "html")
    val got = Links.anchorCorpus(pages, $"url", $"html", maxAnchors = 3)
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("http://hot.org/t", 400L, "a000,a001,a002")))
  }

  test("politeOutlinks: document-order link_no, rel token gate, page-level nofollow") {
    val pages = Seq(
      // mixed quotes: politeOutlinks numbers TRUE document order (vs
      // outlinks' quote-style-major ordinal); the href-less named
      // anchor consumes a slot; rel variants gate per token
      (1L, "http://a.com/d/p.html",
        """<a name="top">x</a><a href='/one'>1</a>""" +
          """<a rel="nofollow" href="/drop">2</a>""" +
          """<a href="/two" REL=NOFOLLOW>3</a>""" +
          """<a href="/keep" rel="nofollower">4</a>""" +
          """<a href="/ugc" rel="ugc , NoFollow">5</a>"""),
      // page-level meta nofollow: contributes nothing
      (2L, "http://b.com/p",
        """<head><meta name="robots" content="none"></head>""" +
          """<a href="/never">x</a>""")).toDF("doc_id", "url", "html")
    val got = Links.politeOutlinks(pages, $"url", $"html", Seq("doc_id"))
      .orderBy($"doc_id", $"link_no")
      .select($"doc_id", $"link_no", $"target")
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1, "http://a.com/one"),
      (1L, 4, "http://a.com/keep")))
  }

  test("frontier: dedup priority, seen anti-join, robots gate, per-host quota") {
    val mk = (n: Long, t: String) => (n, "http://src.com/p",
      s"""<a href="$t">x</a>""")
    val pages = (
      // 3 links → t.org/a, 2 → t.org/b, 1 each → t.org/c, t.org/seen,
      // blocked.org/x
      (1L to 3L).map(i => mk(i, "http://t.org/a")) ++
        (4L to 5L).map(i => mk(i, "http://t.org/b")) ++
        Seq(mk(6L, "http://t.org/c"), mk(7L, "http://t.org/seen"),
          mk(8L, "http://blocked.org/x"))).toDF("doc_id", "url", "html")
    val seen = Seq("http://t.org/seen").toDF("url")
    val robots = Seq(("blocked.org", "User-agent: *\nDisallow: /"))
      .toDF("host", "robots_txt")
    val got = Links.frontier(pages, $"url", $"html", seen, robots,
      "bot", perHostK = 2)
      .orderBy($"host", $"rank")
      .as[(String, String, Long, Int)].collect().toSeq
    // blocked.org gone (robots), /seen gone (ledger), t.org keeps its
    // top-2 by in-link count
    assert(got == Seq(
      ("t.org", "http://t.org/a", 3L, 1),
      ("t.org", "http://t.org/b", 2L, 2)))
  }

  test("frontier honorNofollow: nofollow'd links are never discovered") {
    val pages = Seq(
      (1L, "http://src.com/p",
        """<a href="http://t.org/a">x</a>""" +
          """<a rel="nofollow" href="http://t.org/hidden">y</a>"""),
      // page-level meta nofollow: its link must not become a candidate
      (2L, "http://src.com/q",
        """<head><meta name="robots" content="nofollow"></head>""" +
          """<a href="http://t.org/never">z</a>""")).toDF(
      "doc_id", "url", "html")
    val seen = Seq.empty[String].toDF("url")
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    def urls(honor: Boolean): Seq[String] =
      Links.frontierWithPolicy(pages, $"url", $"html", seen,
        Robots.agentPolicy(robots, $"host", $"robots_txt", "bot"),
        perHostK = 5, honorNofollow = honor)
        .orderBy($"url").select($"url").as[String].collect().toSeq
    assert(urls(false) == Seq("http://t.org/a", "http://t.org/hidden",
      "http://t.org/never"))
    assert(urls(true) == Seq("http://t.org/a"))
  }

  test("frontier dropTraps: the trap would take rank 1; the gate removes it") {
    val trap = "http://t.org/cal/2026/01/2026/01/2026/01/x"
    val pages = (
      // the trap target out-links every clean target 3:1 — exactly how
      // real calendar/faceted traps accrete in-link count
      (1L to 3L).map(i => (i, "http://src.com/p",
        s"""<a href="$trap">t</a>""")) ++
        Seq((4L, "http://src.com/p", """<a href="http://t.org/a">x</a>""")))
      .toDF("doc_id", "url", "html")
    val seen = Seq.empty[String].toDF("url")
    val policy = Robots.agentPolicy(
      Seq.empty[(String, String)].toDF("host", "robots_txt"),
      $"host", $"robots_txt", "bot")
    def got(drop: Boolean): Seq[(String, Int)] =
      Links.frontierWithPolicy(pages, $"url", $"html", seen, policy,
        perHostK = 2, dropTraps = drop)
        .orderBy($"rank").select($"url", $"rank")
        .as[(String, Int)].collect().toSeq
    assert(got(false) == Seq((trap, 1), ("http://t.org/a", 2)))
    assert(got(true) == Seq(("http://t.org/a", 1)))
  }

  test("base href: relative refs resolve against <base>, not the page URL") {
    val pages = Seq(
      // absolute base on another host
      (1L, "http://a.com/dir/p.html",
        """<head><base href="http://cdn.b.com/x/"></head><a href="img">i</a>"""),
      // RELATIVE base href — itself resolved against the page URL first
      (2L, "http://a.com/dir/p.html",
        """<base href='/root/'><a href="f">t</a>"""),
      // no base — page URL governs
      (3L, "http://a.com/dir/p.html", """<a href="f">t</a>""")).toDF(
      "doc_id", "url", "html")
    val got = Links.outlinks(pages, $"url", $"html", Seq("doc_id"))
      .orderBy($"doc_id").select($"doc_id", $"target")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      1L -> "http://cdn.b.com/x/img",
      2L -> "http://a.com/root/f",
      3L -> "http://a.com/dir/f"))
    // the host graph's SRC stays the page's host even under a foreign base
    val g = Links.hostGraph(pages.where($"doc_id" === 1), $"url", $"html")
      .as[(String, String, Long)].collect().toSeq
    assert(g == Seq(("a.com", "cdn.b.com", 1L)))
  }

  test("collapseRedirects: chains resolve, cycles stop at the bound") {
    val edges = Seq(
      ("a", "b", 301), ("b", "c", 302), ("c", "d", 301), // 3-hop chain
      ("e", "f", 302),                                   // 1 hop
      ("x", "y", 301), ("y", "x", 301)                   // CYCLE
    ).toDF("src", "dst", "status")
    val got = Links.collapseRedirects(edges, maxHops = 8)
      .as[(String, String, Int)].collect().toSeq.sortBy(_._1)
    assert(got.filter(_._1 != "x").filter(_._1 != "y") == Seq(
      ("a", "d", 3), ("b", "d", 2), ("c", "d", 1), ("e", "f", 1)))
    // the cycle rows are CLAMPED at maxHops — the quarantine marker —
    // instead of looping forever
    got.filter(r => r._1 == "x" || r._1 == "y").foreach { r =>
      assert(r._3 == 8, s"cycle row should clamp at maxHops, got $r")
    }
  }

  test("collapseRedirects: duplicate src captures reduce to one edge (no fanout)") {
    // real WARCs capture the same URI repeatedly — the pointer-doubling
    // map must be FUNCTIONAL or duplicates fan out 2^rounds; the
    // arg-max (status, dst) pick keeps the highest-status capture
    val edges = Seq(
      ("a", "old", 302), ("a", "b", 308), ("a", "older", 301), // 3 captures of a
      ("b", "c", 301), ("b", "c", 301)                         // exact dup
    ).toDF("src", "dst", "status")
    val got = Links.collapseRedirects(edges, maxHops = 8)
      .as[(String, String, Int)].collect().toSeq.sortBy(_._1)
    // one row per src — and a resolves THROUGH the winning 308 edge
    assert(got == Seq(("a", "c", 2), ("b", "c", 1)))
  }

  test("fetchSchedule: one-policy frontier + delay arithmetic in-row") {
    val mk = (n: Long, t: String) => (n, "http://src.com/p",
      s"""<a href="$t">x</a>""")
    val pages = (
      (1L to 3L).map(i => mk(i, "http://t.org/a")) ++
        (4L to 5L).map(i => mk(i, "http://t.org/b")) ++
        Seq(mk(6L, "http://nodelay.org/c"))).toDF("doc_id", "url", "html")
    val seen = Seq.empty[String].toDF("url")
    val policy = Robots.agentPolicy(
      Seq(("t.org", "User-agent: *\nCrawl-delay: 5"))
        .toDF("host", "robots_txt"),
      $"host", $"robots_txt", "bot")
    val got = Links.fetchSchedule(pages, $"url", $"html", seen, policy,
      perHostK = 2)
      .orderBy($"host", $"rank")
      .as[(String, String, Int, Int, Int)].collect().toSeq
    // t.org ranks by in-link count with its declared 5 s delay;
    // nodelay.org takes the 1 s default
    assert(got == Seq(
      ("nodelay.org", "http://nodelay.org/c", 1, 1, 0),
      ("t.org", "http://t.org/a", 1, 5, 0),
      ("t.org", "http://t.org/b", 2, 5, 5)))
  }

  test("frontier: robots judged on the PRE-canonicalization resolved URL") {
    // the page links to /private/ (trailing slash) — canonicalization
    // drops the trailing slash, so judging the CANONICAL form would
    // slip past 'Disallow: /private/' and fetch a robots-disallowed
    // URL (the r19 ADVICE politeness gap); the gate must see the
    // resolved spelling a fetcher would actually request
    val pages = Seq(
      (1L, "http://s.com/p",
        """<a href="http://s.com/private/">f</a>"""),
      (2L, "http://s.com/p", """<a href="http://s.com/ok">g</a>""")).toDF(
      "doc_id", "url", "html")
    val seen = Seq.empty[String].toDF("url")
    val robots = Seq(("s.com", "User-agent: *\nDisallow: /private/"))
      .toDF("host", "robots_txt")
    val got = Links.frontier(pages, $"url", $"html", seen, robots,
      "bot", perHostK = 5)
      .select($"url").as[String].collect().toSeq
    assert(got == Seq("http://s.com/ok"),
      s"the disallowed /private/ target must not enter the frontier: $got")
  }
}
