package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RFC 9309 semantics pins for [[Robots]]: group selection, longest-
  * match precedence, the allow tie-break, wildcard/`$` patterns, and
  * the permissive defaults (no file / no group / no match → allowed). */
class RobotsSpec extends SparkSuite {
  import spark.implicits._

  private def judge(robotsTxt: String, agent: String,
      paths: Seq[String]): Seq[Boolean] = {
    val robots = Seq(("h.com", robotsTxt)).toDF("host", "robots_txt")
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, s"http://h.com$p") }
      .toDF("id", "url")
    Robots.filter(urls, "id", $"url", robots, agent)
      .orderBy($"id").select($"allowed").as[Boolean].collect().toSeq
  }

  test("longest match wins; Allow overrides a shorter Disallow") {
    val txt = Seq("User-agent: *",
      "Disallow: /private/",
      "Allow: /private/pub/").mkString("\n")
    assert(judge(txt, "bot", Seq(
      "/private/x",      // Disallow len 9
      "/private/pub/y",  // Allow len 13 beats it
      "/open")) == Seq(false, true, true))
  }

  test("wildcard * and end anchor $") {
    val txt = Seq("User-agent: *",
      "Disallow: /*.pdf$",
      "Allow: /").mkString("\n")
    assert(judge(txt, "bot", Seq(
      "/doc/a.pdf",       // matches *…$
      "/doc/a.pdf?x=1",   // $ anchored: query tail breaks the match
      "/doc/a.pdfx",      // not an end match
      "/a.html")) == Seq(false, true, true, true))
  }

  test("exact-length tie goes to Allow") {
    val txt = Seq("User-agent: *",
      "Disallow: /dup",
      "Allow: /dup").mkString("\n")
    assert(judge(txt, "bot", Seq("/dup/x")) == Seq(true))
  }

  test("specific-agent group wins and the * group is then ignored") {
    val txt = Seq(
      "User-agent: GraftBot", // mixed case: product tokens fold
      "Disallow: /only-graft",
      "",
      "User-agent: *",
      "Disallow: /").mkString("\n")
    // graftbot: its own group governs — /ok is NOT blocked by the *
    // group's Disallow: /
    assert(judge(txt, "graftbot", Seq("/only-graft/x", "/ok")) ==
      Seq(false, true))
    // another agent: the * group governs, everything blocked
    assert(judge(txt, "otherbot", Seq("/ok")) == Seq(false))
  }

  test("multiple user-agent lines share one group's rules") {
    val txt = Seq(
      "User-agent: a-bot",
      "User-agent: b-bot",
      "Disallow: /x").mkString("\n")
    assert(judge(txt, "b-bot", Seq("/x/1", "/y")) == Seq(false, true))
  }

  test("permissive defaults: empty Disallow, no matching group, no robots row") {
    // the RFC's allow-all idiom: an empty Disallow value is no rule
    assert(judge("User-agent: *\nDisallow:", "bot", Seq("/any")) ==
      Seq(true))
    // a file with groups for OTHER agents only and no * group
    assert(judge("User-agent: x-bot\nDisallow: /", "bot", Seq("/any")) ==
      Seq(true))
    // no robots row for the host at all
    val robots = Seq(("other.com", "User-agent: *\nDisallow: /"))
      .toDF("host", "robots_txt")
    val urls = Seq((0L, "http://h.com/p")).toDF("id", "url")
    val got = Robots.filter(urls, "id", $"url", robots, "bot")
      .select($"allowed").as[Boolean].collect().toSeq
    assert(got == Seq(true))
  }

  test("comments, CRLF lines, and field-name case are tolerated") {
    val txt = "# policy\r\nUSER-AGENT: *\r\nDISALLOW: /x # inline\r\n"
    // inline comment is stripped, so the rule is '/x'
    assert(judge(txt, "bot", Seq("/x/1", "/y")) == Seq(false, true))
  }

  test("LIKE metacharacters in rule paths stay literal") {
    val txt = Seq("User-agent: *",
      "Disallow: /a_b",
      "Disallow: /p%q").mkString("\n")
    // '_' and '%' must not act as LIKE wildcards
    assert(judge(txt, "bot", Seq("/a_b/x", "/aXb/x", "/p%q", "/pXq")) ==
      Seq(false, true, false, true))
  }

  test("query string participates in the match") {
    val txt = Seq("User-agent: *",
      "Disallow: /search?q=").mkString("\n")
    assert(judge(txt, "bot", Seq("/search?q=beer", "/search")) ==
      Seq(false, true))
  }

  test("sitemapUrls: group-independent, case-folded field, comments stripped") {
    val robots = Seq(
      ("a.com", Seq("User-agent: x", "Disallow: /",
        "Sitemap: http://a.com/sm.xml # primary",
        "SITEMAP: http://a.com/sm2.xml").mkString("\n")),
      ("b.com", "User-agent: *\nDisallow:")).toDF("host", "robots_txt")
    val got = Robots.sitemapUrls(robots)
      .orderBy($"host", $"sitemap_url")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("a.com", "http://a.com/sm.xml"),
      ("a.com", "http://a.com/sm2.xml")))
  }

  test("crawlDelays: governing group only, ceil, max, non-numeric dropped") {
    val robots = Seq(
      // specific group (delay 3.2 → ceil 4) beats the * group's 9
      ("a.com", Seq("User-agent: graftbot", "Crawl-delay: 3.2",
        "", "User-agent: *", "Crawl-delay: 9").mkString("\n")),
      // two values in the governing group → max; junk value ignored
      ("b.com", Seq("User-agent: *", "Crawl-delay: 2",
        "Crawl-delay: 5", "Crawl-delay: fast").mkString("\n")),
      // no delay line at all → no row
      ("c.com", "User-agent: *\nDisallow: /x")).toDF("host", "robots_txt")
    val got = Robots.crawlDelays(robots, $"host", $"robots_txt", "GraftBot")
      .as[(String, Int)].collect().toMap
    assert(got == Map("a.com" -> 4, "b.com" -> 5))
  }
}
