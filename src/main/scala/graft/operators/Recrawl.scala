package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recrawl scheduling — the decision a PERIODIC crawler actually makes
  * per known URL: fetch it fresh, revalidate it with a conditional GET,
  * or skip it entirely. Composes the two standing relations a polite
  * recrawler maintains:
  *  - the sitemap side ([[graft.sources.Sources.sitemapEntries]]):
  *    what the site CLAIMS about each URL's last modification;
  *  - the validator ledger (the 200-class rows of
  *    [[graft.sources.Sources.warcResponses]]): the `ETag` /
  *    `Last-Modified` validators persisted from the previous fetch
  *    (RFC 9110 §8.8), plus the fetch's own date parsed from the
  *    HTTP-date `Last-Modified`.
  *
  * One left equi-join on the canonical URL; the verdict is a
  * projection — at 100 TB both sides are corpus-scale ledgers and the
  * join is the only exchange. Reference behavior surface:
  * idavkaev/kafka-streams-task's keyed enrichment join
  * (WeatherHotelsApp.java:134-142) — here the "enrichment" is the
  * fetch-history state of each sitemap URL.
  */
object Recrawl {

  /** HTTP-date → DATE: "Sat, 01 Feb 2026 00:05:00 GMT" parses via its
    * `dd MMM yyyy` core (RFC 9110 IMF-fixdate; the weekday and clock
    * are irrelevant to a day-granularity lastmod compare). Malformed →
    * NULL, never a task failure. */
  def httpDate(c: Column): Column =
    try_to_timestamp(
      regexp_extract(c, "([0-9]{2} [A-Za-z]{3} [0-9]{4})", 1),
      lit("dd MMM yyyy")).cast("date")

  /** The fetch/revalidate/skip verdict per sitemap entry:
    *  - `fetch` — no ledger row for the URL (never fetched, or the
    *    previous response carried no validators): unconditional GET;
    *  - `skip` — the sitemap `lastmod` is on/before the date of our
    *    recorded copy: the site itself says nothing changed;
    *  - `revalidate` — everything else (lastmod after our copy, or no
    *    usable lastmod/fetch date): conditional GET with the persisted
    *    validators (`If-None-Match` / `If-Modified-Since`).
    * `entries` carries `loc` (+ optional `lastmod`, W3C date);
    * `ledger` carries `url`, `etag`, `last_modified` (HTTP-date).
    * Output: `(url, lastmod, etag, last_modified, verdict)`. */
  def decide(entries: DataFrame, ledger: DataFrame): DataFrame =
    entries
      .select(col("loc").as("url"), col("lastmod"))
      .join(
        ledger.select(col("url"), col("etag"), col("last_modified")),
        Seq("url"), "left")
      .withColumn("__have",
        col("etag").isNotNull || col("last_modified").isNotNull)
      .withColumn("__fetched", httpDate(col("last_modified")))
      .withColumn("verdict",
        when(!col("__have"), lit("fetch"))
          .when(col("lastmod").isNotNull && col("__fetched").isNotNull &&
            try_to_timestamp(col("lastmod"), lit("yyyy-MM-dd"))
              .cast("date") <= col("__fetched"), lit("skip"))
          .otherwise(lit("revalidate")))
      .drop("__have", "__fetched")
}
