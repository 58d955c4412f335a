package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Page-level HTML metadata and indexing directives — the layer a
  * production crawler/indexer consumes right after robots.txt: the
  * `<title>`/`<meta name=description>`/OpenGraph fields that describe a
  * page, the `<html lang>` declaration, the `<meta name=robots>`
  * noindex/nofollow directives that gate index admission and link
  * following, and the `<link rel=canonical>` URL-aliasing signal crawl
  * pipelines fold into dedup BEFORE content hashing ever runs (the
  * site's own statement that N spellings are one page).
  *
  * All extraction is anchored-regex + short-string attribute pulls —
  * one codegen'd narrow pass, no UDF, no shuffle. The document-width
  * work is ONE head-prefix extraction per page (everything this layer
  * reads lives in `<head>`); every field regex then scans that short
  * prefix, not the page ([[Links.effectiveBaseOf]]'s
  * projection-boundary discipline — never a doc-width regex inside a
  * conditional branch). At 100 TB the aggregating consumers
  * ([[canonicalClusters]], [[indexAdmission]]) reduce each page to
  * narrow URL rows before their single hash aggregate, so HTML never
  * crosses an exchange.
  *
  * Reference behavior surface: idavkaev/kafka-streams-task parses typed
  * fields out of raw payloads and re-keys on them
  * (WeatherHotelsApp.java:112-120 pulls fields from the raw address
  * string the way [[pageMeta]] pulls directives from raw HTML); the
  * directive semantics themselves follow the published conventions
  * (robots meta tag / rel=nofollow as used by major crawlers, RFC 6596
  * for rel=canonical).
  */
object PageMeta {

  /** The `<head>` prefix (everything through the first `</head>`), the
    * whole page when the tag is absent. Split across two projections so
    * the doc-width regex runs exactly once ([[Links.effectiveBaseOf]]'s
    * rule: the fallback conditional must see an already-extracted
    * column, never re-run the scan). */
  private val headPattern = "(?is)^(.*?</head>)"

  /** The full `<$tag … $attr="$value" …>` tag (first match — browsers
    * honor the first directive), any attribute order, any attribute
    * case, both quote styles around the value. Empty string when
    * absent. */
  private def tagByAttr(head: Column, tag: String, attr: String,
      value: String): Column =
    regexp_extract(head,
      s"(?is)<$tag\\b[^>]*?\\b$attr\\s*=\\s*[\"']${java.util.regex.Pattern.quote(value)}[\"'][^>]*>",
      0)

  /** An attribute's value out of an already-extracted tag string —
    * quoted either style, else the unquoted HTML5 form (up to the first
    * whitespace or `>`). Null when the attribute is absent. */
  private[operators] def attrOf(tag: Column, attr: String): Column =
    coalesce(
      nullif(regexp_extract(tag, s"(?is)\\b$attr\\s*=\\s*\"([^\"]*)\"", 1),
        lit("")),
      nullif(regexp_extract(tag, s"(?is)\\b$attr\\s*=\\s*'([^']*)'", 1),
        lit("")),
      nullif(regexp_extract(tag,
        s"(?is)\\b$attr\\s*=\\s*([^\\s\"'>][^\\s>]*)", 1), lit("")))

  /** Lowercased directive tokens of a raw directive string
    * (comma/whitespace separated per the published convention); empty
    * array when null. */
  private def strTokens(c: Column): Column =
    filter(split(lower(coalesce(c, lit(""))), "[,\\s]+"), x => x =!= "")

  /** Lowercased directive tokens of a robots-meta content value; empty
    * array when the tag or attribute is absent. */
  private def robotsTokens(metaTag: Column): Column =
    strTokens(attrOf(metaTag, "content"))

  /** The noindex/nofollow verdicts of a RAW directive string — the
    * HEADER channel (`X-Robots-Tag`, the only noindex signal for
    * non-HTML payloads), under the SAME token rules as the meta-tag
    * channel (`none` = both, token-split, case-free). Agent-scoped
    * forms (`googlebot: noindex`) are read as their directive tokens —
    * a caller filtering for a specific agent pre-splits on the colon. */
  def noindexDirective(c: Column): Column = hasNoindex(strTokens(c))

  def nofollowDirective(c: Column): Column = hasNofollow(strTokens(c))

  /** `nofollow` directly, or `none` (= noindex + nofollow). */
  private[operators] def hasNofollow(toks: Column): Column =
    array_contains(toks, "nofollow") || array_contains(toks, "none")

  private def hasNoindex(toks: Column): Column =
    array_contains(toks, "noindex") || array_contains(toks, "none")

  /** The page-level nofollow verdict straight off raw HTML — the gate
    * [[Links.politeOutlinks]] applies before extracting any link. ONE
    * doc-width regex (the robots meta tag pull); the token logic runs
    * on the short extracted tag. */
  private[operators] def pageNofollow(html: Column): Column =
    hasNofollow(robotsTokens(
      regexp_extract(html,
        "(?is)<meta\\b[^>]*?\\bname\\s*=\\s*[\"']robots[\"'][^>]*>", 0)))

  /** Per-page metadata/directive record:
    * `(<idCols…>, lang_attr, title, description, og_title, canonical,
    * noindex, nofollow)` —
    *  - `lang_attr`: the `<html lang>` value, lowercased (BCP 47 tags
    *    are case-insensitive); null when undeclared;
    *  - `title`: first `<title>` inner text, whitespace-collapsed and
    *    trimmed; null when absent or empty;
    *  - `description` / `og_title`: the `content` of
    *    `<meta name="description">` / `<meta property="og:title">`
    *    (first tag wins, attribute order/case free);
    *  - `canonical`: the `<link rel="canonical" href>` target, resolved
    *    against the page's effective base (`<base href>` honored, like
    *    every resolver in [[Links]]) and canonicalized
    *    ([[Urls.canonicalUrl]]) so it joins directly against the crawl's
    *    canonical URL ledger; null when undeclared;
    *  - `noindex` / `nofollow`: the robots-meta verdicts (`none` sets
    *    both). Absent tag → false (the crawler default); null HTML →
    *    null metadata but false verdicts (nothing forbids).
    *
    * Three narrow projections; the only document-width regex is the
    * head-prefix extraction. */
  def pageMeta(pages: DataFrame, urlCol: Column, htmlCol: Column,
      idCols: Seq[String]): DataFrame = {
    val s0 = pages.select(idCols.map(col) :+ urlCol.as("__u") :+
      htmlCol.as("__html") :+
      regexp_extract(htmlCol, headPattern, 1).as("__hx"): _*)
    val s1 = s0.select(idCols.map(col) :+ col("__u") :+
      when(col("__hx") === "" || col("__hx").isNull, col("__html"))
        .otherwise(col("__hx")).as("__head"): _*)
    val s2 = s1.select(idCols.map(col) ++ Seq(
      col("__u"),
      regexp_extract(col("__head"), "(?is)<title[^>]*>(.*?)</title>", 1)
        .as("__title"),
      regexp_extract(col("__head"),
        "(?is)<html\\b[^>]*?\\blang\\s*=\\s*[\"']([^\"']*)[\"']", 1)
        .as("__lang"),
      tagByAttr(col("__head"), "meta", "name", "description").as("__mdesc"),
      tagByAttr(col("__head"), "meta", "property", "og:title").as("__mog"),
      tagByAttr(col("__head"), "meta", "name", "robots").as("__mrob"),
      tagByAttr(col("__head"), "link", "rel", "canonical").as("__lcan"),
      Links.baseHref(col("__head")).as("__bh")): _*)
    // the canonical pipeline is STAGED one hop per projection — href,
    // then the resolved absolute, then the canonical form. resolveUrl
    // references its `ref` ~8x and canonicalUrl its `url` ~15x (across
    // CaseWhen branches, where subexpression elimination does not
    // reach), so inlining the composition re-evaluates every inner
    // regex per reference per row; behind these boundaries each stage
    // runs ONCE (the aliases are non-cheap and multiply-referenced, so
    // CollapseProject keeps them — measured 4x on the cluster faces).
    val s3 = s2.select(idCols.map(col) ++ Seq(
      col("__title"), col("__lang"), col("__mdesc"), col("__mog"),
      col("__mrob"),
      attrOf(col("__lcan"), "href").as("__href"),
      Links.effectiveBaseOf(col("__u"), col("__bh")).as("__cbase")): _*)
    val s4 = s3.select(idCols.map(col) ++ Seq(
      col("__title"), col("__lang"), col("__mdesc"), col("__mog"),
      col("__mrob"),
      Urls.resolveUrl(col("__cbase"), col("__href")).as("__resolved")): _*)
    val toks = robotsTokens(col("__mrob"))
    s4.select(idCols.map(col) ++ Seq(
      nullif(lower(col("__lang")), lit("")).as("lang_attr"),
      nullif(trim(regexp_replace(col("__title"), "\\s+", " ")), lit(""))
        .as("title"),
      attrOf(col("__mdesc"), "content").as("description"),
      attrOf(col("__mog"), "content").as("og_title"),
      // null href → null resolved → null canonical (concat/regex null
      // propagation — no conditional needed, which keeps the column
      // subexpression-eliminable)
      Urls.canonicalUrl(col("__resolved")).as("canonical"),
      hasNoindex(toks).as("noindex"),
      hasNofollow(toks).as("nofollow")): _*)
  }

  /** The page's `<link rel="alternate" hreflang=…>` declarations — the
    * multilingual variant map (Google's hreflang convention) a
    * multilingual corpus builder clusters language editions with: one
    * row per declaration, `(<idCols…>, hreflang, target)` with
    * `hreflang` lowercased (BCP 47 + the `x-default` sentinel) and
    * `target` resolved against the effective base and canonicalized
    * like every URL here. Tag extraction is one alternation pass over
    * `<link …>` tags (document order); the rel check is token-based
    * (`rel="alternate amphtml"` qualifies), tags without `hreflang` or
    * `href` drop. Same scale shape as [[Links.politeOutlinks]]: HTML
    * reduces to tag strings in the first projection. */
  def alternates(pages: DataFrame, urlCol: Column, htmlCol: Column,
      idCols: Seq[String]): DataFrame = {
    val s0 = pages.select(idCols.map(col) :+ urlCol.as("__u") :+
      regexp_extract_all(htmlCol, lit("(?is)<link\\b[^>]*>"), lit(0))
        .as("__tags") :+
      Links.baseHref(htmlCol).as("__bh"): _*)
    val relToks = strTokens(attrOf(col("__tag"), "rel"))
    val hl = attrOf(col("__tag"), "hreflang")
    s0
      .select(idCols.map(col) :+
        Links.effectiveBaseOf(col("__u"), col("__bh")).as("__base") :+
        col("__tags"): _*)
      .select(idCols.map(col) :+ col("__base") :+
        explode(col("__tags")).as("__tag"): _*)
      .where(array_contains(relToks, "alternate") && hl.isNotNull)
      // staged one hop per projection like [[pageMeta]]'s canonical —
      // href, resolved, canonical — so no inner regex re-runs per
      // downstream reference
      .select(idCols.map(col) :+ col("__base") :+
        lower(hl).as("hreflang") :+
        attrOf(col("__tag"), "href").as("__href"): _*)
      .select(idCols.map(col) :+ col("hreflang") :+
        Urls.resolveUrl(col("__base"), col("__href")).as("__resolved"): _*)
      // null-target drop, gated on the RESOLVED attribute behind a plan
      // barrier: canonicalUrl null-propagates (null in ↔ null out), so
      // this is exactly `target IS NOT NULL` — but stated on `target`,
      // Catalyst substitutes the canonicalize∘resolve∘attr chain into
      // the predicate multiplicatively on its way down (measured: a
      // 123 KB Filter condition carrying 1,410 regexp_extracts,
      // re-evaluated per tag row)
      .transform(Staging.planBarrier)
      .where(col("__resolved").isNotNull)
      .select(idCols.map(col) :+ col("hreflang") :+
        Urls.canonicalUrl(col("__resolved")).as("target"): _*)
  }

  /** The page's `<meta http-equiv="refresh">` redirect declaration —
    * the THIRD redirect channel a real crawl folds into its alias map
    * next to HTTP 3xx `Location` ([[Links.redirectEdges]]) and
    * `rel=canonical` ([[pageMeta]]): legacy sites and parked domains
    * redirect with it, and major crawlers treat a refresh-with-URL as a
    * redirect. One row per page that declares a refresh WITH a `url=`
    * clause (a bare `content="30"` is a reload, not a redirect — it
    * drops): `(<idCols…>, delay_s, target)` with `delay_s` the declared
    * integer delay and `target` resolved against the page's effective
    * base (`<base href>` honored) and canonicalized, joinable straight
    * against the redirect map. Content syntax per the WHATWG shared
    * declarative-refresh parser: integer delay, `;`/`,` separator,
    * case-free `url=`, the target optionally quoted either style.
    * Non-http(s) targets drop like every resolver here. First refresh
    * tag wins; the only document-width regexes are the head-prefix
    * extraction and the base-href pull ([[pageMeta]]'s discipline).
    *
    * Plan shape: unlike the [[Links]] extractors this is a pure
    * projection chain — no `explode`, so no `Generate` node blocks
    * predicate pushdown — and its row-drops sit above a deep alias
    * chain. A [[Staging.planBarrier]] therefore separates extraction
    * from filtered resolution: without it, pushing the two filters down
    * substitutes the resolve/canonicalize alias trees multiplicatively
    * into the predicates (measured 183k expression nodes / 33 MB of
    * generated Java — past janino's 64 KB method limit and into
    * interpreted fallback). */
  def metaRefresh(pages: DataFrame, urlCol: Column, htmlCol: Column,
      idCols: Seq[String]): DataFrame = {
    val s0 = pages.select(idCols.map(col) :+ urlCol.as("__u") :+
      htmlCol.as("__html") :+
      regexp_extract(htmlCol, headPattern, 1).as("__hx"): _*)
    val s1 = s0.select(idCols.map(col) :+ col("__u") :+
      when(col("__hx") === "" || col("__hx").isNull, col("__html"))
        .otherwise(col("__hx")).as("__head"): _*)
    val s2 = s1.select(idCols.map(col) ++ Seq(
      col("__u"),
      tagByAttr(col("__head"), "meta", "http-equiv", "refresh")
        .as("__mref"),
      Links.baseHref(col("__head")).as("__bh")): _*)
    // content staged in its own projection: it feeds FOUR pulls below
    // (delay + the three url= forms), and inlining its three-regex
    // coalesce into each would 4x the extraction tree
    val s2b = s2.select(idCols.map(col) ++ Seq(
      col("__u"), col("__bh"),
      attrOf(col("__mref"), "content").as("__content")): _*)
    // the url= clause, quoted either style or bare (up to the next
    // whitespace/quote/`;`); null when absent — which is the reload
    // form, not a redirect
    val s3 = s2b.select(idCols.map(col) ++ Seq(
      nullif(regexp_extract(col("__content"), "^\\s*([0-9]+)", 1), lit(""))
        .cast("int").as("delay_s"),
      coalesce(
        nullif(regexp_extract(col("__content"),
          "(?is)[;,]\\s*url\\s*=\\s*\"([^\"]*)\"", 1), lit("")),
        nullif(regexp_extract(col("__content"),
          "(?is)[;,]\\s*url\\s*=\\s*'([^']*)'", 1), lit("")),
        nullif(regexp_extract(col("__content"),
          "(?is)[;,]\\s*url\\s*=\\s*([^\\s\"';]+)", 1), lit("")))
        .as("__href"),
      Links.effectiveBaseOf(col("__u"), col("__bh")).as("__base")): _*)
    // pushdown stop: the notNull/rlike drops below stay ABOVE the
    // extraction chain (see the Scaladoc)
    val gate = Staging.planBarrier(s3)
    // staged one hop per projection like [[pageMeta]]'s canonical —
    // resolved, then canonical — so no inner regex re-runs
    val s5 = gate
      .where(col("delay_s").isNotNull && col("__href").isNotNull)
      .select(idCols.map(col) ++ Seq(col("delay_s"),
        Urls.resolveUrl(col("__base"), col("__href")).as("__abs")): _*)
    s5.where(col("__abs").rlike("(?i)^https?://"))
      .select(idCols.map(col) ++ Seq(col("delay_s"),
        Urls.canonicalUrl(col("__abs")).as("target")): _*)
  }

  /** rel=canonical clustering — the crawl-side dedup signal that runs
    * BEFORE content dedup: every page maps to its declared canonical
    * target (its own canonical URL when it declares none, RFC 6596's
    * self-referential default), and pages sharing a target collapse
    * into one cluster. Output `(canonical, n_pages, min_url)` — cluster
    * key, size, and the lexicographically-first member's canonical URL
    * as the deterministic representative.
    *
    * Scale shape: each page reduces to two canonical-URL strings before
    * the single hash aggregate (map-side combine applies); HTML never
    * crosses the exchange. */
  def canonicalClusters(pages: DataFrame, urlCol: Column,
      htmlCol: Column): DataFrame =
    clusters(pages, urlCol, htmlCol, dropNoindex = false)

  /** INDEX ADMISSION — the composed decision an indexer makes per page:
    * drop `noindex` pages (their content must not enter the index),
    * then collapse the survivors by canonical target
    * ([[canonicalClusters]]' reduction). Output
    * `(canonical, n_pages, min_url)`: one row per admitted index entry,
    * how many fetched spellings fed it, and the deterministic
    * representative. Same scale shape — the directive gate is a narrow
    * predicate ahead of the one aggregate. */
  def indexAdmission(pages: DataFrame, urlCol: Column,
      htmlCol: Column): DataFrame =
    clusters(pages, urlCol, htmlCol, dropNoindex = true)

  private def clusters(pages: DataFrame, urlCol: Column, htmlCol: Column,
      dropNoindex: Boolean): DataFrame = {
    val m = pageMeta(
      pages.withColumn("__page_cu", Urls.canonicalUrl(urlCol)),
      urlCol, htmlCol, Seq("__page_cu"))
    val admitted = if (dropNoindex) m.where(!col("noindex")) else m
    admitted
      .select(coalesce(col("canonical"), col("__page_cu")).as("canonical"),
        col("__page_cu"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_pages"), min(col("__page_cu")).as("min_url"))
  }
}
