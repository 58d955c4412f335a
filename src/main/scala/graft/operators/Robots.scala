package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309) — the crawl-side URL gate that runs
  * before any fetch enters the corpus: parse each host's robots.txt
  * into per-agent rule groups, select the group governing a given
  * crawler per the RFC (the most specific matching `User-agent` line;
  * `*` groups apply only when no specific group exists), and judge each
  * URL by the LONGEST matching rule, `Allow` winning length ties.
  *
  * Everything is declarative: line split + classification is one
  * projection; group assembly is a per-host window (a robots.txt is
  * capped at 500 KiB by the RFC, so a host's partition is always tiny);
  * rule-to-URL matching happens through array higher-order functions
  * after ONE host-keyed equi-join — the per-host rule set rides as a
  * struct array (bounded by the file cap), so no second shuffle and no
  * broadcast assumption (a web-scale robots ledger has ~10^8 host
  * rows — host-partitioned, never driver-collected; AQE still
  * broadcasts a small one on its own).
  *
  * Rule-matching semantics: a rule pattern matches as a PREFIX of the
  * URL's path+query; `*` matches any run of characters, a trailing `$`
  * anchors the end. Precedence length is the pattern's length excluding
  * a trailing `$` (the RFC counts matched octets; `$` matches none).
  * Patterns are literal octets otherwise (LIKE specials are escaped;
  * Spark's LIKE default escape `\` applies). Reference behavior
  * surface: the keyed lookup-then-filter shape of
  * idavkaev/kafka-streams-task's enrichment join (Main.java:63).
  */
object Robots {

  /** The applicable rule set per host for `agent`, one array row per
    * host: `(host, rules: array<struct<len:int, allow:int, pat:string>>)`
    * sorted by descending precedence length. `robots` carries one row
    * per host: `hostCol` (canonical host) and `txtCol` (the raw
    * robots.txt body). Group selection per RFC 9309 §2.2.1: groups
    * naming `agent` (case-insensitive product token match) govern when
    * any exists, else `*` groups; a host whose file has neither — or is
    * empty/unparseable — yields no row (allowed downstream). Empty
    * `Allow:`/`Disallow:` values are no rules (the RFC's allow-all
    * `Disallow:` idiom falls out naturally). */
  def agentRules(robots: DataFrame, hostCol: Column, txtCol: Column,
      agent: String): DataFrame = {
    val (grouped, groupSel) = governingGroups(robots, hostCol, txtCol, agent)
    val rules = grouped
      .where(col("__field").isin("allow", "disallow") && col("__value") =!= "")
      .select(col("host"), col("__gid"),
        (col("__field") === "allow").cast("int").as("allow"),
        col("__value").as("__p"))
      .join(groupSel, Seq("host", "__gid"))
      .select(col("host"), col("allow"),
        // precedence length: pattern octets excluding a trailing '$'
        length(regexp_replace(col("__p"), "\\$$", "")).as("len"),
        // pattern -> LIKE: escape LIKE specials first ('*' and '$' are
        // not LIKE specials, so they pass through untouched), then
        // '*' -> '%'; a trailing '$' anchors the end (drop it, no
        // trailing '%'), otherwise the rule is a prefix -> append '%'
        {
          val esc = regexp_replace(col("__p"), "([%_\\\\])", "\\\\$1")
          val star = regexp_replace(esc, "\\*", "%")
          when(col("__p").endsWith("$"), regexp_replace(star, "\\$$", ""))
            .otherwise(concat(star, lit("%"))).as("pat")
        })
    rules.groupBy(col("host"))
      .agg(reverse(array_sort(collect_list(
        struct(col("len"), col("allow"), col("pat"))))).as("rules"))
  }

  /** Shared group machinery: the classified/grouped robots lines and
    * the (host, gid) set of groups GOVERNING `agent` per RFC 9309
    * (specific groups when any exists, else `*` groups). */
  private def governingGroups(robots: DataFrame, hostCol: Column,
      txtCol: Column, agent: String): (DataFrame, DataFrame) = {
    val agentLower = agent.toLowerCase(java.util.Locale.ROOT)
    val lines = robots
      .select(hostCol.as("host"),
        posexplode(split(txtCol, "\r?\n")).as(Seq("__pos", "__raw")))
      .select(col("host"), col("__pos"),
        trim(regexp_replace(col("__raw"), "#.*$", "")).as("__line"))
      .select(col("host"), col("__pos"),
        lower(trim(regexp_extract(col("__line"), "^([^:]+):", 1)))
          .as("__field"),
        trim(regexp_extract(col("__line"), "^[^:]+:(.*)$", 1)).as("__value"))
    // group assembly: a user-agent line NOT preceded by another
    // user-agent line starts a new group; rules bind to the current one
    val w = Window.partitionBy(col("host")).orderBy(col("__pos"))
    val grouped = lines
      .withColumn("__isUa", col("__field") === "user-agent")
      .withColumn("__new",
        (col("__isUa") && !coalesce(lag(col("__isUa"), 1).over(w),
          lit(false))).cast("int"))
      .withColumn("__gid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val uas = grouped.where(col("__isUa"))
      .select(col("host"), col("__gid"), lower(col("__value")).as("__ua"))
    val groupSel = uas.groupBy(col("host"), col("__gid"))
      .agg(max((col("__ua") === agentLower).cast("int")).as("__spec"),
        max((col("__ua") === "*").cast("int")).as("__star"))
      .withColumn("__anySpec",
        max(col("__spec")).over(Window.partitionBy(col("host"))))
      .where(col("__spec") === 1 ||
        (col("__star") === 1 && col("__anySpec") === 0))
      .select(col("host"), col("__gid"))
    (grouped, groupSel)
  }

  /** Per-host `Crawl-delay` (the de-facto extension most engines except
    * Google honor) under the SAME group selection as [[agentRules]]:
    * `(host, delay_s)` for every host whose governing group carries a
    * numeric Crawl-delay; fractional values round UP (politeness errs
    * slow), several values take the MAX. Hosts with none yield no row —
    * the caller's default applies. */
  def crawlDelays(robots: DataFrame, hostCol: Column, txtCol: Column,
      agent: String): DataFrame = {
    val (grouped, groupSel) = governingGroups(robots, hostCol, txtCol, agent)
    grouped
      .where(col("__field") === "crawl-delay" &&
        col("__value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("host"), col("__gid"),
        ceil(col("__value").cast("double")).cast("int").as("__d"))
      .join(groupSel, Seq("host", "__gid"))
      .groupBy(col("host"))
      .agg(max(col("__d")).as("delay_s"))
  }

  /** `Sitemap:` lines — sitemap DISCOVERY, the robots.txt side of the
    * crawl-seed loop (RFC 9309 §2.2.4 "other records": group-INDEPENDENT,
    * so no agent parameter; a sitemap applies to every crawler). One row
    * per (host, sitemap URL); comments stripped, field name
    * case-insensitive, the URL kept verbatim (it is already absolute by
    * spec). Feed the `sitemap_url`s to
    * [[graft.sources.Sources.sitemapEntries]]. */
  def sitemapUrls(robots: DataFrame, hostCol: Column = col("host"),
      txtCol: Column = col("robots_txt")): DataFrame =
    robots
      .select(hostCol.as("host"),
        explode(split(txtCol, "\r?\n")).as("__raw"))
      .select(col("host"),
        trim(regexp_replace(col("__raw"), "#.*$", "")).as("__line"))
      .where(lower(col("__line")).rlike("^sitemap\\s*:"))
      .select(col("host"),
        trim(regexp_extract(col("__line"), "^[^:]+:(.*)$", 1))
          .as("sitemap_url"))
      .where(col("sitemap_url") =!= "")

  /** `urls` (id column `idCol`, URL in `urlCol`) judged against
    * `robots` for `agent`: output `(idCol, host, path, allowed)` where
    * `allowed` is the RFC 9309 verdict — longest matching rule wins,
    * `Allow` wins ties, no matching rule / no governing group / no
    * robots row = allowed. One equi-join on the canonical host; the
    * per-URL judgment is an array filter + max over the host's rule
    * structs (struct ordering puts the longest match first, `allow`
    * breaking length ties upward), entirely inside the join
    * projection — URL text never shuffles beyond its own host key. */
  def filter(urls: DataFrame, idCol: String, urlCol: Column,
      robots: DataFrame, agent: String,
      hostCol: Column = col("host"), txtCol: Column = col("robots_txt"))
      : DataFrame = {
    val rules = agentRules(robots, hostCol, txtCol, agent)
    val pathQuery = {
      val noFrag = regexp_replace(trim(urlCol), "#.*$", "")
      val rest = regexp_replace(noFrag,
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
      when(rest === "", lit("/")).otherwise(rest)
    }
    urls
      .select(col(idCol), Urls.canonicalHost(urlCol).as("host"),
        pathQuery.as("path"))
      .join(rules, Seq("host"), "left")
      .withColumn("__m", expr(
        "array_max(transform(filter(rules, r -> path LIKE r.pat), " +
          "r -> struct(r.len, r.allow)))"))
      .select(col(idCol), col("host"), col("path"),
        coalesce(col("__m.allow") === 1, lit(true)).as("allowed"))
  }
}
