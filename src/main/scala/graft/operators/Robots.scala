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
    * robots.txt body). Group selection per RFC 9309 §2.2.1 with the
    * specificity rule production matchers implement (Google's published
    * parser semantics): the group's `User-agent` value is reduced to
    * its leading product token (letters/digits/`-`/`_` — a `/version`
    * suffix or trailing junk drops), folded case-insensitively; a group
    * MATCHES when its token is a prefix of the crawler's token, and of
    * the matching groups the LONGEST-token ones govern; `*` groups
    * apply only when no specific group matches. A host whose file has
    * neither — or is empty/unparseable — yields no ROW here, and hosts
    * whose governing group has no allow/disallow rules yield no row
    * either (allowed downstream). Empty `Allow:`/`Disallow:` values are
    * no rules (the RFC's allow-all `Disallow:` idiom falls out
    * naturally). */
  def agentRules(robots: DataFrame, hostCol: Column, txtCol: Column,
      agent: String): DataFrame =
    agentPolicy(robots, hostCol, txtCol, agent)
      .where(size(col("rules")) > 0)
      .select(col("host"), col("rules"))

  /** The WHOLE per-host policy for `agent` from ONE parse pass:
    * `(host, rules, delay_s)` — the [[agentRules]] rule array (possibly
    * empty — e.g. a delay-only governing group) plus the governing
    * group's `Crawl-delay` ([[crawlDelays]] semantics; NULL when none).
    * [[filter]]/[[gate]] and a fetch scheduler both consume robots —
    * two separate calls would run the line-classify + window group
    * assembly twice over the same ledger (at a 10⁸-host robots table
    * that is a second full parse); this returns both relations' content
    * from a single `governingGroups` pass and one aggregate. Hosts
    * whose governing group carries neither rules nor a delay — or with
    * no governing group at all — yield no row (allowed downstream,
    * caller's default delay). */
  def agentPolicy(robots: DataFrame, hostCol: Column, txtCol: Column,
      agent: String): DataFrame = {
    val grouped = governingGroups(robots, hostCol, txtCol, agent)
    val isRule =
      col("__field").isin("allow", "disallow") && col("__value") =!= ""
    val isDelay = col("__field") === "crawl-delay" &&
      col("__value").rlike("^[0-9]+(\\.[0-9]+)?$")
    grouped
      .where(col("__gov") && (isRule || isDelay))
      .select(col("host"),
        // rule struct (null for delay rows — collect_list skips nulls):
        // precedence length is the pattern's octets excluding a trailing
        // '$'; pattern -> LIKE: escape LIKE specials first ('*' and '$'
        // are not LIKE specials, so they pass through untouched), then
        // '*' -> '%'; a trailing '$' anchors the end (drop it, no
        // trailing '%'), otherwise the rule is a prefix -> append '%'
        when(isRule, {
          val esc = regexp_replace(col("__value"), "([%_\\\\])", "\\\\$1")
          val star = regexp_replace(esc, "\\*", "%")
          struct(
            length(regexp_replace(col("__value"), "\\$$", "")).as("len"),
            (col("__field") === "allow").cast("int").as("allow"),
            when(col("__value").endsWith("$"),
              regexp_replace(star, "\\$$", ""))
              .otherwise(concat(star, lit("%"))).as("pat"))
        }).as("__r"),
        // delay value (null for rule rows): fractional rounds UP
        // (politeness errs slow), several values take the MAX
        when(isDelay, ceil(col("__value").cast("double")).cast("int"))
          .as("__d"))
      .groupBy(col("host"))
      .agg(
        reverse(array_sort(collect_list(col("__r")))).as("rules"),
        max(col("__d")).as("delay_s"))
  }

  /** [[agentPolicy]] under RFC 9309 §2.3.1 robots-FETCH-status
    * semantics — what a real crawl must do when the robots.txt request
    * itself failed: `statusCol` is the HTTP status of each host's
    * robots.txt fetch (NULL = assume a good body). 2xx parses the body;
    * 4xx ("unavailable") is ALLOW-ALL — the row contributes nothing,
    * exactly like a host with no robots.txt; 5xx ("unreachable") is
    * COMPLETE DISALLOW — the host gets the single rule `Disallow: /`,
    * so every downstream consumer ([[gate]], [[filter]],
    * [[graft.operators.Links.frontier]]) applies the verdict with zero
    * new machinery. Other classes (3xx a demux didn't follow) fall to
    * allow-all, the conservative-for-availability reading the RFC
    * permits for "unavailable". */
  def agentPolicyWithStatus(robots: DataFrame, hostCol: Column,
      txtCol: Column, statusCol: Column, agent: String): DataFrame = {
    val parsed = agentPolicy(
      robots.where(statusCol.isNull ||
        (statusCol >= 200 && statusCol < 300)),
      hostCol, txtCol, agent)
    val disallowAll = robots
      .where(statusCol >= 500 && statusCol < 600)
      .select(hostCol.as("host"),
        array(struct(lit(1).as("len"), lit(0).as("allow"),
          lit("/%").as("pat"))).as("rules"),
        lit(null).cast("int").as("delay_s"))
    parsed.unionByName(disallowAll)
  }

  /** Shared group machinery: the classified/grouped robots lines with a
    * per-line `__gov` flag — whether the line's group GOVERNS `agent`
    * per RFC 9309 (longest-prefix product-token matching — see
    * [[agentRules]]; specific groups when any matches, else `*`
    * groups). Selection is WINDOW-based over the one grouped relation
    * (per-group maxima, then the per-host best), never a self-join:
    * joining a derived group-selection relation back onto the lines
    * would put the whole parse subplan in the plan twice — at a
    * 10⁸-host robots ledger, a second full text scan + group-assembly
    * window pass. Robots files are RFC-capped at 500 KiB, so every
    * window partition here is tiny. */
  private def governingGroups(robots: DataFrame, hostCol: Column,
      txtCol: Column, agent: String): DataFrame = {
    // the crawler's own product token, folded (a caller passing
    // "GraftBot/1.2" means the token "graftbot")
    val agentLower = agent.toLowerCase(java.util.Locale.ROOT)
      .takeWhile(c => c != '/' && !c.isWhitespace)
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
    // each group's User-agent values reduced to their leading product
    // token (a '/version' suffix or trailing junk drops per RFC 9309's
    // token grammar); a group MATCHES when its token is a
    // case-insensitive prefix of the crawler's token, and specificity
    // is the matched token's length
    val ua = lower(regexp_extract(col("__value"), "^([A-Za-z0-9_-]+)", 1))
    val wg = Window.partitionBy(col("host"), col("__gid"))
    val wh = Window.partitionBy(col("host"))
    grouped
      .withColumn("__specLen",
        max(when(col("__isUa") && ua =!= "" &&
          lit(agentLower).startsWith(ua), length(ua))).over(wg))
      .withColumn("__star",
        max(when(col("__isUa") && col("__value") === "*", 1)).over(wg))
      .withColumn("__maxSpec", max(col("__specLen")).over(wh))
      .withColumn("__gov",
        (col("__specLen").isNotNull &&
          col("__specLen") === col("__maxSpec")) ||
          (col("__star") === 1 && col("__maxSpec").isNull))
  }

  /** Per-host `Crawl-delay` (the de-facto extension most engines except
    * Google honor) under the SAME group selection as [[agentRules]]:
    * `(host, delay_s)` for every host whose governing group carries a
    * numeric Crawl-delay; fractional values round UP (politeness errs
    * slow), several values take the MAX. Hosts with none yield no row —
    * the caller's default applies. */
  def crawlDelays(robots: DataFrame, hostCol: Column, txtCol: Column,
      agent: String): DataFrame =
    agentPolicy(robots, hostCol, txtCol, agent)
      .where(col("delay_s").isNotNull)
      .select(col("host"), col("delay_s"))

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
      : DataFrame =
    gate(urls, urlCol, agentPolicy(robots, hostCol, txtCol, agent))
      .select(col(idCol), col("host"), col("path"), col("allowed"))

  /** [[filter]] under robots-FETCH-status semantics
    * ([[agentPolicyWithStatus]]): `robots` additionally carries
    * `statusCol` — the HTTP status of the host's robots.txt fetch.
    * 4xx → allow-all, 5xx → disallow-all, 2xx/NULL → parse. */
  def filterWithStatus(urls: DataFrame, idCol: String, urlCol: Column,
      robots: DataFrame, agent: String,
      hostCol: Column = col("host"), txtCol: Column = col("robots_txt"),
      statusCol: Column = col("http_status")): DataFrame =
    gate(urls, urlCol,
      agentPolicyWithStatus(robots, hostCol, txtCol, statusCol, agent))
      .select(col(idCol), col("host"), col("path"), col("allowed"))

  /** In-row robots verdict against a PRE-PARSED policy relation
    * ([[agentPolicy]]/[[agentPolicyWithStatus]] output, or any
    * `(host, rules[, …])` table): every caller column rides through,
    * plus `host` (the URL's canonical host), `path` (the raw
    * path+query — judged PRE-canonicalization: RFC 9309 rules match
    * literal octets, and canonicalization rewrites exactly the octets
    * rules like `Disallow: /private/` or `Disallow: /search?q=` anchor
    * on — trailing slash, query spelling), `allowed` (longest matching
    * rule wins, `Allow` wins ties, no rule / no policy row = allowed),
    * and any EXTRA policy columns (e.g. `delay_s` — so a fetch
    * scheduler needs no second policy join). One host equi-join; the
    * judgment is an array HOF inside the join projection — URL text
    * never shuffles beyond its own host key, and because the verdict
    * lands IN-ROW the caller never re-joins its own subplan to apply
    * it. Pass the URL in its resolved, UN-canonicalized form when you
    * have one (see [[graft.operators.Links.frontier]]). */
  def gate(df: DataFrame, urlCol: Column, policy: DataFrame): DataFrame = {
    val pathQuery = {
      val noFrag = regexp_replace(trim(urlCol), "#.*$", "")
      val rest = regexp_replace(noFrag,
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
      when(rest === "", lit("/")).otherwise(rest)
    }
    df
      .withColumn("host", Urls.canonicalHost(urlCol))
      .withColumn("path", pathQuery)
      .join(policy, Seq("host"), "left")
      .withColumn("__m", expr(
        "array_max(transform(filter(rules, r -> path LIKE r.pat), " +
          "r -> struct(r.len, r.allow)))"))
      .withColumn("allowed",
        coalesce(col("__m.allow") === 1, lit(true)))
      .drop("rules", "__m")
  }
}
