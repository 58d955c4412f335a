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

  test("product tokens: version suffix strips, longest matching prefix governs") {
    // a robots line "graftbot/1.0" must govern the agent token
    // "graftbot" (version strip), and a caller passing "GraftBot/1.2"
    // means the token "graftbot" (caller-side strip + fold)
    val versioned = Seq("User-agent: graftbot/1.0",
      "Disallow: /private").mkString("\n")
    assert(judge(versioned, "GraftBot/1.2", Seq("/private/x", "/pub")) ==
      Seq(false, true))
    // of "graft" and "graftbot" (both case-insensitive prefixes of the
    // agent token), ONLY the longest governs — its rules replace, not
    // merge with, the shorter group's
    val twoPrefixes = Seq(
      "User-agent: graft", "Disallow: /a",
      "", "User-agent: graftbot", "Disallow: /b").mkString("\n")
    assert(judge(twoPrefixes, "graftbot", Seq("/a/x", "/b/x")) ==
      Seq(true, false))
    // a token that is NOT a prefix of the agent falls to *
    val nonPrefix = Seq(
      "User-agent: graftbot-images", "Disallow: /img",
      "", "User-agent: *", "Disallow: /star").mkString("\n")
    assert(judge(nonPrefix, "graftbot", Seq("/img/x", "/star/x")) ==
      Seq(true, false))
  }

  test("agentPolicy: rules AND delay from one parse; delay-only group yields empty rules") {
    val robots = Seq(
      ("a.com", Seq("User-agent: *", "Disallow: /x",
        "Crawl-delay: 2.5").mkString("\n")),
      ("b.com", "User-agent: *\nCrawl-delay: 7"),
      ("c.com", "User-agent: *\nDisallow: /y")).toDF("host", "robots_txt")
    val got = Robots.agentPolicy(robots, $"host", $"robots_txt", "bot")
      .select($"host", size($"rules"), $"delay_s")
      .as[(String, Int, Option[Int])].collect().toSeq
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "a.com" -> ((1, Some(3))), "b.com" -> ((0, Some(7))),
      "c.com" -> ((1, None))))
    // the delay-only host's empty rule array judges to ALLOWED
    val urls = Seq((1L, "http://b.com/anything")).toDF("id", "url")
    val verdict = Robots.gate(urls, $"url",
      Robots.agentPolicy(robots, $"host", $"robots_txt", "bot"))
      .select($"allowed").as[Boolean].collect().toSeq
    assert(verdict == Seq(true))
  }

  test("fetch-status semantics: 4xx allow-all, 5xx disallow-all, 2xx parses") {
    val robots = Seq(
      // adversarial bodies: the 404's Disallow:/ and the 503's Allow:/
      // must both be IGNORED
      ("ok.com", "User-agent: *\nDisallow: /private", 200),
      ("gone.com", "User-agent: *\nDisallow: /", 404),
      ("down.com", "User-agent: *\nAllow: /", 503)).toDF(
      "host", "robots_txt", "http_status")
    val urls = Seq(
      (0L, "http://ok.com/private/x"), (1L, "http://ok.com/pub"),
      (2L, "http://gone.com/anything"), (3L, "http://down.com/anything"),
      (4L, "http://norow.com/x")).toDF("id", "url")
    val got = Robots.filterWithStatus(urls, "id", $"url", robots, "bot")
      .orderBy($"id").select($"allowed").as[Boolean].collect().toSeq
    assert(got == Seq(false, true, true, false, true))
  }

  test("gate: caller columns and policy extras (delay_s) ride through in-row") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /x\nCrawl-delay: 3"))
      .toDF("host", "robots_txt")
    val urls = Seq((1L, "http://a.com/x/1", "payload"),
      (2L, "http://a.com/ok", "payload2")).toDF("id", "url", "extra")
    val got = Robots.gate(urls, $"url",
      Robots.agentPolicy(robots, $"host", $"robots_txt", "bot"))
      .orderBy($"id")
      .select($"id", $"extra", $"allowed", $"delay_s")
      .as[(Long, String, Boolean, Option[Int])].collect().toSeq
    assert(got == Seq((1L, "payload", false, Some(3)),
      (2L, "payload2", true, Some(3))))
  }
}
