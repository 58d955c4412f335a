package graft.operators

import graft.SparkSuite

/** Verdict pins for [[Recrawl.decide]] — every class a periodic
  * recrawler meets: never-fetched, validator-less previous fetch,
  * sitemap-says-unchanged, sitemap-says-changed, unusable dates. */
class RecrawlSpec extends SparkSuite {
  import spark.implicits._

  private val ledger = Seq(
    // full validators, fetched 2026-02-01
    ("http://s.com/a", Some("\"v1\""),
      Some("Sat, 01 Feb 2026 00:05:00 GMT")),
    // etag only — no fetch DATE, so lastmod can never prove "unchanged"
    ("http://s.com/b", Some("\"v2\""), None),
    // a ledger row with NO validators at all → unconditional fetch
    ("http://s.com/c", None, None),
    // malformed HTTP-date → unusable fetch date → revalidate
    ("http://s.com/d", Some("\"v4\""), Some("not a date"))).toDF(
    "url", "etag", "last_modified")

  private def verdicts(entries: Seq[(String, Option[String])]): Map[String, String] =
    Recrawl.decide(entries.toDF("loc", "lastmod"), ledger)
      .select($"url", $"verdict").as[(String, String)]
      .collect().toMap

  test("skip only when the sitemap lastmod is on/before the recorded copy") {
    val got = verdicts(Seq(
      ("http://s.com/a", Some("2026-01-15")), // before fetch → skip
      ("http://s.com/x", Some("2026-01-15")))) // no ledger row → fetch
    assert(got == Map("http://s.com/a" -> "skip", "http://s.com/x" -> "fetch"))
    // same-day lastmod is also a skip (on/before)
    assert(verdicts(Seq(("http://s.com/a", Some("2026-02-01")))) ==
      Map("http://s.com/a" -> "skip"))
  }

  test("revalidate when changed, when lastmod is absent, or when dates are unusable") {
    val got = verdicts(Seq(
      ("http://s.com/a", Some("2026-03-10")), // after fetch → revalidate
      ("http://s.com/a", None),               // no claim → revalidate
      ("http://s.com/b", Some("2026-01-01")), // no fetch date → revalidate
      ("http://s.com/d", Some("2026-01-01")), // malformed fetch date
      ("http://s.com/a", Some("02/30/2026"))  // malformed lastmod
    ).distinct)
    // /a appears with three entries — map collapses; check via full rows
    val rows = Recrawl.decide(Seq(
      ("http://s.com/a", Some("2026-03-10")),
      ("http://s.com/b", Some("2026-01-01")),
      ("http://s.com/d", Some("2026-01-01")),
      ("http://s.com/a", None: Option[String])).toDF("loc", "lastmod"),
      ledger)
      .select($"verdict").as[String].collect().toSeq
    assert(rows.forall(_ == "revalidate"), s"got $rows")
    assert(got("http://s.com/b") == "revalidate")
    assert(got("http://s.com/d") == "revalidate")
  }

  test("fetch when the previous response carried no validators") {
    assert(verdicts(Seq(("http://s.com/c", Some("2026-01-01")))) ==
      Map("http://s.com/c" -> "fetch"))
  }

  test("decideWithCadence: fetch-date evidence, cadence skip, validator fallback") {
    import org.apache.spark.sql.functions.{lit, to_date}
    import java.sql.Date
    val d = (s: String) => Date.valueOf(s)
    val cl = Seq(
      // fetched March 1, etag — lastmod comparisons use the FETCH date
      ("http://s.com/a", Some("\"v1\""), None: Option[String],
        Some(d("2026-03-01"))),
      // fetched March 8, NO validators — cadence can still skip it
      ("http://s.com/b", None: Option[String], None: Option[String],
        Some(d("2026-03-08"))),
      // fetched February 1, no validators
      ("http://s.com/c", None: Option[String], None: Option[String],
        Some(d("2026-02-01"))),
      // validators but NO fetch date → cadence can't hold, revalidate
      ("http://s.com/d", Some("\"v4\""), None: Option[String],
        None: Option[Date])).toDF(
      "url", "etag", "last_modified", "fetch_date")
    def got(entries: Seq[(String, Option[String], Option[String])]) =
      Recrawl.decideWithCadence(
        entries.toDF("loc", "lastmod", "changefreq"), cl,
        to_date(lit("2026-03-10")))
        .select($"url", $"verdict").as[(String, String)].collect().toMap
    assert(got(Seq(
      // lastmod before the March-1 fetch → skip (site says unchanged)
      ("http://s.com/a", Some("2026-02-20"), None),
      // lastmod AFTER the fetch → stale → revalidate via etag
      ("http://s.com/x", Some("2026-02-20"), None))) ==
      Map("http://s.com/a" -> "skip", "http://s.com/x" -> "fetch"))
    assert(got(Seq(("http://s.com/a", Some("2026-03-05"), None))) ==
      Map("http://s.com/a" -> "revalidate"))
    // cadence: weekly copy aged 2 days is fresh (skip, even with no
    // validators); the same copy under daily cadence is stale → fetch
    assert(got(Seq(("http://s.com/b", None, Some("weekly")))) ==
      Map("http://s.com/b" -> "skip"))
    assert(got(Seq(("http://s.com/b", None, Some("daily")))) ==
      Map("http://s.com/b" -> "fetch"))
    // 'never' is always fresh; unknown cadence never is
    assert(got(Seq(("http://s.com/c", None, Some("never")))) ==
      Map("http://s.com/c" -> "skip"))
    assert(got(Seq(("http://s.com/c", None, Some("sometimes")))) ==
      Map("http://s.com/c" -> "fetch"))
    // no fetch date: cadence can't hold, validators decide
    assert(got(Seq(("http://s.com/d", None, Some("yearly")))) ==
      Map("http://s.com/d" -> "revalidate"))
  }

  test("foldRevalidated: every verdict class splices the right body") {
    val prior = Seq(
      ("http://s.com/upd", "old-upd"),
      ("http://s.com/same", "old-same"),
      ("http://s.com/gone", "old-gone"),
      ("http://s.com/flaky", "old-flaky"),
      ("http://s.com/idle", "old-idle")).toDF("url", "body")
    val fresh = Seq(
      ("http://s.com/upd", 200, Some("new-upd")),
      ("http://s.com/new", 200, Some("new-new")),
      ("http://s.com/same", 304, None: Option[String]),
      ("http://s.com/orphan", 304, None: Option[String]),
      ("http://s.com/gone", 404, None: Option[String]),
      ("http://s.com/flaky", 503, None: Option[String]))
      .toDF("url", "status", "body")
    val got = Recrawl.foldRevalidated(prior, fresh)
      .as[(String, Option[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "http://s.com/upd" -> ((Some("new-upd"), "updated")),
      "http://s.com/new" -> ((Some("new-new"), "added")),
      "http://s.com/same" -> ((Some("old-same"), "unchanged")),
      // an orphan 304 has no copy to serve: surfaced for refetch
      "http://s.com/orphan" -> ((None, "refetch")),
      "http://s.com/gone" -> ((None, "retired")),
      // 5xx on revalidation keeps the old copy (transient, not change)
      "http://s.com/flaky" -> ((Some("old-flaky"), "kept")),
      // untouched URLs carry forward
      "http://s.com/idle" -> ((Some("old-idle"), "kept"))))
  }
}
