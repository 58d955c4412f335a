package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML out-link extraction and web-graph construction — the crawl
  * stage between page fetch and frontier/ranking: pull every `<a href>`
  * from fetched HTML, resolve it against the page URL (hrefs are
  * overwhelmingly relative), canonicalize, and reduce to the host-level
  * link graph that feeds PageRank-style authority scoring and frontier
  * prioritization.
  *
  * Extraction is pure `regexp_extract_all` over the raw HTML (both
  * quote styles, attribute order independent) — one codegen'd
  * projection, no parser state, no UDF. Resolution/canonicalization is
  * [[Urls.resolveUrl]]/[[Urls.canonicalUrl]] composition. The graph
  * reduction projects each page to `(src_host, dst_host)` rows BEFORE
  * the aggregation exchange, so page HTML never shuffles: at 100 TB the
  * exchange carries host-pair rows (bounded by the edge count, and
  * map-side combine collapses repeated pairs per partition first).
  * Reference behavior surface: idavkaev/kafka-streams-task processes
  * keyed streams; link extraction is the crawl-corpus analogue of its
  * parse-and-rekey maps (AddressMapper.java:14 re-keys on a parsed
  * field the way [[hostGraph]] re-keys pages on their link hosts).
  */
object Links {

  /** Every `href` value of every `<a>` tag, document order, as an array
    * column: double- and single-quoted attributes, any attribute order
    * (`<a class=… href=…>`), case-insensitive tag/attribute names.
    * Unquoted hrefs (rare, legal HTML5) match up to the first space or
    * `>`. Null HTML → null. */
  def extractLinks(html: Column): Column = {
    val a = "(?i)<a\\b[^>]*?\\bhref\\s*=\\s*"
    concat(
      regexp_extract_all(html, lit(a + "\"([^\"]*)\""), lit(1)),
      regexp_extract_all(html, lit(a + "'([^']*)'"), lit(1)),
      regexp_extract_all(html, lit(a + "([^\\s\"'>][^\\s>]*)"), lit(1)))
  }

  /** `(href, anchor_text)` struct pairs for `<a href=…>text</a>` tags
    * (both quote styles, quote-style-major order like [[extractLinks]];
    * anchor text is the raw inner HTML up to the closing tag) — the
    * anchor-text corpus link-based quality signals and
    * query-independent relevance features train on. Two group
    * extractions per pattern, zipped — Spark's subexpression
    * elimination shares the scan. */
  def extractAnchors(html: Column): Column = {
    def pairs(q: String): Column = {
      val p = lit(
        s"(?is)<a\\b[^>]*?\\bhref\\s*=\\s*$q([^$q]*)$q[^>]*>(.*?)</a>")
      arrays_zip(
        regexp_extract_all(html, p, lit(1)).as("href"),
        regexp_extract_all(html, p, lit(2)).as("anchor"))
    }
    concat(pairs("\""), pairs("'"))
  }

  /** One row per out-link: `(<id cols…>, link_no, target)` where
    * `target` is the canonical absolute URL of the `link_no`-th href on
    * the page. `link_no` numbers EXTRACTION order, which is
    * quote-style-MAJOR like [[extractLinks]] (all double-quoted hrefs,
    * then single-quoted, then unquoted — each class in document order):
    * on a mixed-quote page it is NOT document position, it is a stable
    * per-page ordinal. Non-hierarchical/non-web refs — `mailto:`,
    * `javascript:`, `tel:`, anything whose RESOLVED form isn't
    * `http(s)://` — are dropped before canonicalization (they are not
    * fetchable link targets, and [[Urls.canonicalUrl]] is an http(s)
    * normalizer); `link_no` still numbers the ORIGINAL href positions,
    * so it stays stable under the drop. Pages with no links vanish
    * (inner explode — the out-link relation, not a page audit). HTML is
    * dropped as soon as the href array is built, before any explode. */
  def outlinks(pages: DataFrame, urlCol: Column, htmlCol: Column,
      idCols: Seq[String]): DataFrame =
    pages
      .select(idCols.map(col) :+ urlCol.as("__u") :+
        baseHref(htmlCol).as("__bh") :+
        extractLinks(htmlCol).as("__refs"): _*)
      .select(idCols.map(col) :+
        effectiveBaseOf(col("__u"), col("__bh")).as("__base") :+
        col("__refs"): _*)
      .select(idCols.map(col) :+ col("__base") :+
        posexplode(col("__refs")).as(Seq("link_no", "__ref")): _*)
      .select(idCols.map(col) :+ col("link_no") :+
        Urls.resolveUrl(col("__base"), col("__ref")).as("__abs"): _*)
      .where(col("__abs").rlike("(?i)^https?://"))
      .select(idCols.map(col) :+ col("link_no") :+
        Urls.canonicalUrl(col("__abs")).as("target"): _*)

  /** NOFOLLOW-AWARE out-links — [[outlinks]] composed with the two
    * link-following directives a polite crawler honors (the published
    * robots-meta / rel=nofollow conventions):
    *  - page-level: a `<meta name=robots>` carrying `nofollow` (or
    *    `none`) means NO link on the page may be followed — the page
    *    contributes zero rows;
    *  - anchor-level: an `<a>` whose `rel` attribute contains the
    *    `nofollow` TOKEN (comma/whitespace-separated, case-insensitive
    *    — `rel="ugc nofollow"` drops, `rel="nofollower"` does not)
    *    is skipped.
    *
    * Extraction here is one alternation pass over full `<a …>` opening
    * tags, so `link_no` is TRUE DOCUMENT ORDER (unlike [[outlinks]]'
    * quote-style-major ordinal) and numbers the original anchor
    * positions — stable under the drops, like [[outlinks]]' scheme
    * gate. Per-tag attribute pulls run on the short extracted tag
    * strings; the document-width work is three unconditional regexes in
    * one projection (tag list, robots meta, base href), after which
    * HTML is dropped — nothing wide survives to the explode. Output:
    * `(<idCols…>, link_no, target)` with `target` canonical like
    * [[outlinks]]. */
  def politeOutlinks(pages: DataFrame, urlCol: Column, htmlCol: Column,
      idCols: Seq[String]): DataFrame =
    politeResolved(pages, urlCol, htmlCol, idCols)
      .select(idCols.map(col) :+ col("link_no") :+
        Urls.canonicalUrl(col("__abs")).as("target"): _*)

  /** The shared polite-extraction core ([[politeOutlinks]] + the
    * `honorNofollow` frontier path): per followable anchor the RESOLVED
    * pre-canonicalization absolute target (`__abs`) and the
    * document-order `link_no`. Page-level meta-nofollow gate, per-anchor
    * rel-token gate, non-http(s) drop — HTML is reduced to tag strings
    * in the first projection and never survives to the explode. */
  private def politeResolved(pages: DataFrame, urlCol: Column,
      htmlCol: Column, idCols: Seq[String]): DataFrame = {
    val s0 = pages.select(idCols.map(col) :+ urlCol.as("__u") :+
      regexp_extract_all(htmlCol, lit("(?is)<a\\b[^>]*>"), lit(0))
        .as("__tags") :+
      PageMeta.pageNofollow(htmlCol).as("__nf") :+
      baseHref(htmlCol).as("__bh"): _*)
    val relToks = filter(
      split(lower(coalesce(PageMeta.attrOf(col("__tag"), "rel"), lit(""))),
        "[,\\s]+"),
      x => x =!= "")
    s0.where(!col("__nf"))
      .select(idCols.map(col) :+
        effectiveBaseOf(col("__u"), col("__bh")).as("__base") :+
        col("__tags"): _*)
      .select(idCols.map(col) :+ col("__base") :+
        posexplode(col("__tags")).as(Seq("link_no", "__tag")): _*)
      // rel is a LINK-TYPE list — only the nofollow token matters here
      // (`none` is a robots-META directive, not a rel link type)
      .where(!array_contains(relToks, "nofollow"))
      // href staged in its own projection before resolveUrl (which
      // references its `ref` ~8x across conditional branches) — the
      // pageMeta canonical-pipeline staging rule
      .select(idCols.map(col) :+ col("link_no") :+ col("__base") :+
        PageMeta.attrOf(col("__tag"), "href").as("__href"): _*)
      .select(idCols.map(col) :+ col("link_no") :+
        Urls.resolveUrl(col("__base"), col("__href")).as("__abs"): _*)
      .where(col("__abs").rlike("(?i)^https?://"))
  }

  /** The host-level link graph: `(src_host, dst_host, n_links)` —
    * src = the page URL's canonical host, dst = each out-link target's
    * canonical host, n_links = how many links point that way. Only
    * `http(s)://` targets count (the [[outlinks]] scheme gate — a
    * `mailto:` is not an edge); self edges (intra-host navigation —
    * the overwhelming majority of links on a real page) are dropped
    * unless `includeSelf`; empty hosts are always dropped. Each page
    * reduces to bare host pairs before the single hash aggregate, so
    * the exchange never carries HTML and map-side combine collapses the
    * per-page fanout first. Feed the result straight to
    * [[Graph.pageRank]]/[[Graph.kCorePeel]] — hosts are the node ids. */
  def hostGraph(pages: DataFrame, urlCol: Column, htmlCol: Column,
      includeSelf: Boolean = false): DataFrame = {
    // plan barriers between extraction | resolution | host fold: fused
    // into one whole-stage span, the chain (src-host fold + base/href
    // regexes + explode + RFC 3986 resolve + rlike gate + dst-host fold
    // + partial agg) inlines into a single generated consume method —
    // measured 60.8 KB bytecode, 93% of janino's 64 KB limit and one
    // growth step from the [[PageMeta.metaRefresh]] blowup (caught
    // sub-critical by the CodegenDump sweep). The barrier after the
    // explode keeps extraction in its own span; the one after the
    // resolve stops the rlike gate from substituting the resolve tree
    // into its predicate AND keeps the resolve span free of the
    // host-fold/agg code. One count(1) tick per link row each.
    val extracted = Staging.planBarrier(pages
      .select(Urls.canonicalHost(urlCol).as("src_host"),
        urlCol.as("__u"), baseHref(htmlCol).as("__bh"),
        extractLinks(htmlCol).as("__refs"))
      .select(col("src_host"),
        effectiveBaseOf(col("__u"), col("__bh")).as("__base"),
        col("__refs"))
      .select(col("src_host"), col("__base"),
        explode(col("__refs")).as("__ref")))
    val resolved = Staging.planBarrier(extracted
      .select(col("src_host"),
        Urls.resolveUrl(col("__base"), col("__ref")).as("__abs")))
    val pairs = resolved
      .where(col("__abs").rlike("(?i)^https?://"))
      .select(col("src_host"), Urls.canonicalHost(col("__abs")).as("dst_host"))
      .where(col("dst_host").isNotNull && col("dst_host") =!= "")
    val kept = if (includeSelf) pairs
      else pairs.where(col("src_host") =!= col("dst_host"))
    kept.groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** The anchor-text corpus: per canonical link target, how many
    * anchors point at it and the lexicographically-first `maxAnchors`
    * DISTINCT anchor texts (ascending). Anchor text is the
    * query-independent relevance/label signal link-based quality
    * scoring trains on. Same scale shape as [[hostGraph]]: pages reduce
    * to (target, anchor) pairs before any exchange; HTML never
    * shuffles; non-http(s) targets drop.
    *
    * Aggregation is TWO k-bounded levels, never an unbounded buffer: a
    * `collect_set` + slice would accrete EVERY distinct anchor of a hot
    * target (a wikipedia.org front page has ~10⁷) into ONE aggregation
    * buffer row before the cap ran — the skewed-key blowup this
    * codebase's guards exist to avoid. Instead (1) a hash aggregate on
    * (target, anchor) dedups pairs and counts — the hot key's distinct
    * anchors spread across partitions by the PAIR key; (2) the
    * k-bounded string-tie heap ([[graft.functions.TopK.topKByOrdStrTie]],
    * constant ord → pure `tie ASC` = lexicographic) ships ≤ `maxAnchors`
    * entries per (partition, target). Result is IDENTICAL to
    * sorted-distinct-then-cap — the heap keeps the k smallest of the
    * full distinct set — at bounded memory per group. */
  def anchorCorpus(pages: DataFrame, urlCol: Column, htmlCol: Column,
      maxAnchors: Int = 5): DataFrame = {
    require(maxAnchors >= 1, s"maxAnchors must be >= 1, got $maxAnchors")
    pages
      .select(urlCol.as("__u"), baseHref(htmlCol).as("__bh"),
        extractAnchors(htmlCol).as("__as"))
      .select(effectiveBaseOf(col("__u"), col("__bh")).as("__base"),
        col("__as"))
      .select(col("__base"), explode(col("__as")).as("__a"))
      .select(Urls.resolveUrl(col("__base"), col("__a.href")).as("__abs"),
        col("__a.anchor").as("__anchor"))
      .where(col("__abs").rlike("(?i)^https?://"))
      .select(Urls.canonicalUrl(col("__abs")).as("target"), col("__anchor"))
      .groupBy(col("target"), col("__anchor"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("target"))
      .agg(sum(col("__n")).as("n_anchors"),
        array_join(
          graft.functions.TopK.topKByOrdStrTie(
            col("__anchor"), lit(0), col("__anchor"), maxAnchors),
          ",").as("anchors"))
  }

  /** The page's effective resolution base per the HTML spec: the FIRST
    * `<base href>` when present (browsers honor the first), itself
    * resolved against the page URL (a RELATIVE base href is legal),
    * else the page URL. Every resolver here ([[outlinks]],
    * [[hostGraph]], [[anchorCorpus]]) resolves hrefs against this —
    * pages that set `<base>` are common enough on the real web that
    * ignoring it mis-resolves every relative link they carry. */
  def effectiveBase(urlCol: Column, htmlCol: Column): Column =
    effectiveBaseOf(urlCol, baseHref(htmlCol))

  /** The raw first `<base href>` value (empty string when absent). */
  private[operators] def baseHref(htmlCol: Column): Column =
    regexp_extract(htmlCol,
      "(?is)<base\\b[^>]*?\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1)

  /** [[effectiveBase]] over an ALREADY-EXTRACTED base-href column. The
    * operators here extract the href in its OWN projection and pass the
    * attribute in: Spark's subexpression elimination skips
    * conditionally-evaluated branches, so inlining the html regex into
    * [[Urls.resolveUrl]]'s CaseWhens re-scans the whole page ~8 times
    * per row (measured 4x on q_host_graph); behind a projection
    * boundary it runs once, and CollapseProject keeps the boundary
    * because the alias is non-cheap and multiply-referenced. */
  private[operators] def effectiveBaseOf(urlCol: Column, bh: Column): Column =
    when(bh =!= "", Urls.resolveUrl(urlCol, bh)).otherwise(urlCol)

  /** HTTP redirect edges from a WARC response relation
    * ([[graft.sources.Sources.warcResponses]] columns `uri`,
    * `http_status`, `location`): one `(src, dst, status)` row per 3xx
    * response with a Location header, both sides resolved
    * (Location is commonly RELATIVE — RFC 9110 allows it) and
    * canonicalized. This is the URL-aliasing evidence a crawl pipeline
    * folds into canonicalization: a redirect map joined against the
    * URL ledger collapses moved pages into their targets before
    * content dedup ever runs. Pure projection + filter — no shuffle;
    * chain resolution (a→b→c) is the caller's fixed-point join over
    * this relation, exactly like [[Graph.connectedComponents]] over
    * any edge list.
    *
    * The stages are SPLIT across [[Staging.planBarrier]]s: fused into
    * one whole-stage span over a WARC demux source, the demux chain +
    * resolve + canonicalizations all inline into a SINGLE generated
    * consume method (whole-stage codegen merges a narrow-projection
    * chain's consume functions when the per-operator split conditions
    * fail) — measured 57 KB bytecode, 87% of janino's 64 KB limit and
    * one growth step from the [[PageMeta.metaRefresh]] blowup. A
    * barrier BELOW the 3xx gate keeps the source demux in its own
    * span AND keeps the gate's predicate referencing demux output
    * attributes instead of substituting (and so re-deriving) the whole
    * decode chain inside the fused method; a second barrier between
    * the two canonicalizations splits the rest. Each span compiles
    * with wide headroom. */
  def redirectEdges(responses: DataFrame): DataFrame =
    Staging.planBarrier(
      Staging.planBarrier(responses)
        .where(col("http_status").isin(301, 302, 303, 307, 308) &&
          col("location").isNotNull)
        .select(col("uri"), col("http_status").as("status"),
          Urls.resolveUrl(col("uri"), col("location")).as("__abs"))
        .select(Urls.canonicalUrl(col("uri")).as("src"),
          col("__abs"), col("status")))
      .select(col("src"),
        Urls.canonicalUrl(col("__abs")).as("dst"),
        col("status"))

  /** Multi-hop redirect collapse: the FINAL target of every redirect
    * source under the [[redirectEdges]] map, by POINTER DOUBLING — each
    * round composes the map with itself (`f ∘ f`), so `k` self-joins
    * resolve chains up to `2^k` hops: log-round cost where naive
    * iteration pays one join per hop. Every join is an equi-join on
    * canonical-URL-width rows. Output `(src, dst, hops)`; a chain
    * longer than `maxHops` — or a redirect CYCLE, which real crawls do
    * contain — stops at the bound with `hops >= maxHops`, so callers
    * can quarantine unresolved rows instead of looping forever.
    *
    * Each round's result is STAGED ([[Staging.stage]] — the
    * [[Graph.pageRank]] lineage-truncation rule) before it joins with
    * itself: un-staged, round k would carry 2^k copies of the upstream
    * plan (for [[redirectEdges]] that is 2^k WARC scans), the exact
    * exponential-lineage trap iterative self-composition sets. With
    * `stagingDir` the rounds checkpoint to parquet (the 100 TB shape);
    * without it, executor-local persist. */
  def collapseRedirects(edges: DataFrame, maxHops: Int = 8,
      stagingDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val rounds = math.ceil(math.log(maxHops.toDouble) / math.log(2.0)).toInt
    // pointer doubling REQUIRES a functional edge map (one dst per src):
    // real WARCs capture the same URI repeatedly, and duplicate src rows
    // would fan out multiplicatively at each self-join round (up to
    // 2^rounds rows with conflicting outputs). Reduce to one row per src
    // first — deterministic arg-max by (status, dst): the highest-status
    // capture wins (308/307 beat 302), dst breaking ties stably.
    val functional = edges
      .groupBy(col("src"))
      .agg(max(struct(col("status"), col("dst"))).as("__m"))
      .select(col("src"), col("__m.dst").as("dst"))
    var f = Staging.stage(
      functional.select(col("src"), col("dst"), lit(1).as("hops")),
      stagingDir, "redir_0")
    for (r <- 0 until rounds) {
      // both sides renamed before the self-join so every reference is
      // name-unambiguous (the classic self-join attribute trap)
      val left = f.select(col("src").as("__ls"), col("dst").as("__ld"),
        col("hops").as("__lh"))
      val right = f.select(col("src").as("__rs"), col("dst").as("__rd"),
        col("hops").as("__rh"))
      f = Staging.stage(
        left.join(right, col("__ld") === col("__rs"), "left")
          .select(col("__ls").as("src"),
            coalesce(col("__rd"), col("__ld")).as("dst"),
            least(col("__lh") + coalesce(col("__rh"), lit(0)), lit(maxHops))
              .as("hops")),
        stagingDir, s"redir_${r + 1}")
    }
    f
  }

  /** The crawl FRONTIER: which URLs to fetch next, composed as one
    * Catalyst plan from the stages a production crawler runs —
    *  1. out-link extraction + resolution + canonicalization
    *     ([[outlinks]]; HTML never leaves the scan stage);
    *  2. URL-level dedup with in-link count as priority (ONE hash
    *     aggregate on the canonical URL — the n_refs priority is free
    *     in the same exchange);
    *  3. drop already-crawled URLs (`seen`, column `url` — canonical
    *     form; a corpus-scale ledger, so a key-partitioned LEFT ANTI
    *     equi-join, broadcast only if the optimizer decides);
    *  4. robots gate for `agent` ([[Robots.filter]] — one host-keyed
    *     join, in-projection judgment);
    *  5. per-host politeness quota: the top `perHostK` candidates per
    *     destination host by (n_refs desc, url asc) — a rank window the
    *     RewriteWindowTopK rule collapses to a k-bounded aggregate.
    * Output: `(host, url, n_refs, rank)`. */
  def frontier(pages: DataFrame, urlCol: Column, htmlCol: Column,
      seen: DataFrame, robots: DataFrame, agent: String,
      perHostK: Int = 2): DataFrame =
    frontierWithPolicy(pages, urlCol, htmlCol, seen,
      Robots.agentPolicy(robots, col("host"), col("robots_txt"), agent),
      perHostK)

  /** [[frontier]] against a PRE-PARSED robots policy
    * ([[Robots.agentPolicy]]/[[Robots.agentPolicyWithStatus]] output) —
    * the shape that shares ONE robots parse with every other policy
    * consumer (a fetch scheduler, an audit). The robots judgment runs
    * on the PRE-canonicalization resolved URL (the min resolved
    * spelling per canonical target): RFC 9309 rules match literal
    * octets, and canonicalization rewrites exactly the octets rules
    * anchor on (trailing slash, raw query) — so the gate sees what a
    * fetcher would actually request, while dedup/priority key on the
    * canonical form. The verdict lands IN-ROW ([[Robots.gate]]), so the
    * candidate aggregate appears in the plan exactly once — no
    * re-join of the `unseen` subplan against itself. `dropTraps` adds
    * the [[Urls.trapSignals]] pre-filter on the candidates: a crawler
    * trap accretes huge in-link counts exactly because every page links
    * into it, so without the gate the trap takes the host's rank
    * slots. */
  def frontierWithPolicy(pages: DataFrame, urlCol: Column, htmlCol: Column,
      seen: DataFrame, policy: DataFrame, perHostK: Int = 2,
      honorNofollow: Boolean = false,
      dropTraps: Boolean = false): DataFrame = {
    require(perHostK >= 1, s"perHostK must be >= 1, got $perHostK")
    val gated = gatedCandidates(pages, urlCol, htmlCol, seen, policy,
      honorNofollow, dropTraps)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("n_refs").desc, col("target"))
    gated.withColumn("rank", row_number().over(w))
      .where(col("rank") <= perHostK)
      .select(col("host"), col("target").as("url"), col("n_refs"),
        col("rank"))
  }

  /** The per-host FETCH SCHEDULE — [[frontierWithPolicy]] composed with
    * the governing group's `Crawl-delay` in ONE plan and ONE robots
    * parse: [[Robots.gate]] rides the full policy row, so `delay_s`
    * arrives on the same host join that judged the URL and the schedule
    * needs no second policy parse or join. Each candidate's offset is
    * `(rank − 1) × delay` with `defaultDelayS` for hosts whose
    * governing group carries no Crawl-delay (politeness floor).
    * Output: `(host, url, rank, delay_s, fetch_offset_s)`. */
  def fetchSchedule(pages: DataFrame, urlCol: Column, htmlCol: Column,
      seen: DataFrame, policy: DataFrame, perHostK: Int = 2,
      defaultDelayS: Int = 1, honorNofollow: Boolean = false): DataFrame = {
    require(perHostK >= 1, s"perHostK must be >= 1, got $perHostK")
    val gated =
      gatedCandidates(pages, urlCol, htmlCol, seen, policy, honorNofollow)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("n_refs").desc, col("target"))
    gated.withColumn("rank", row_number().over(w))
      .where(col("rank") <= perHostK)
      .withColumn("delay_s", coalesce(col("delay_s"), lit(defaultDelayS)))
      .withColumn("fetch_offset_s", (col("rank") - 1) * col("delay_s"))
      .select(col("host"), col("target").as("url"), col("rank"),
        col("delay_s"), col("fetch_offset_s"))
  }

  /** Shared frontier core: out-link extraction → canonical-URL dedup
    * with in-link priority (the per-target min RESOLVED spelling rides
    * the same aggregate — the URL a fetcher would request) →
    * already-crawled anti-join → in-row robots gate on the resolved
    * spelling. Output keeps every policy passthrough column. */
  private def gatedCandidates(pages: DataFrame, urlCol: Column,
      htmlCol: Column, seen: DataFrame, policy: DataFrame,
      honorNofollow: Boolean = false,
      dropTraps: Boolean = false): DataFrame = {
    // honorNofollow switches extraction to the polite tag-level path
    // (page meta-nofollow + per-anchor rel gate) — a production crawler
    // must not DISCOVER through links the page told it not to follow
    val resolved =
      if (honorNofollow)
        politeResolved(pages, urlCol, htmlCol, Nil).select(col("__abs"))
      else pages
        .select(urlCol.as("__u"), baseHref(htmlCol).as("__bh"),
          extractLinks(htmlCol).as("__refs"))
        .select(effectiveBaseOf(col("__u"), col("__bh")).as("__base"),
          col("__refs"))
        .select(col("__base"), explode(col("__refs")).as("__ref"))
        .select(Urls.resolveUrl(col("__base"), col("__ref")).as("__abs"))
        .where(col("__abs").rlike("(?i)^https?://"))
    val cands0 = resolved
      .select(Urls.canonicalUrl(col("__abs")).as("target"), col("__abs"))
      .groupBy(col("target"))
      .agg(count(lit(1)).as("n_refs"), min(col("__abs")).as("__fetch"))
    // dropTraps: the crawler-trap pre-filter ([[Urls.trapSignals]]) on
    // the CANONICAL candidate — a calendar/faceted trap accretes huge
    // in-link counts precisely because every page links into it, so an
    // un-gated frontier would hand its rank slots to the trap; the gate
    // runs AFTER the candidate aggregate (fewest rows) as a narrow
    // projection rider, default thresholds. The [[Staging.planBarrier]]
    // enforces that placement: the trap predicate is a function of the
    // grouping column alone, so Catalyst otherwise pushes it BELOW the
    // aggregate and substitutes the trap + canonicalization trees into
    // one per-LINK-row mega-predicate (measured: a 195 KB condition
    // with 92 RLIKEs, and a 2x face slowdown — candidates are the
    // dedup'd minority, links the corpus-scale majority)
    val cands =
      if (!dropTraps) cands0
      else Urls.trapSignals(Staging.planBarrier(cands0), col("target"))
        .where(!col("trap"))
        .drop("path_depth", "n_dup_segments", "n_params", "url_len", "trap")
    val unseen = cands.join(
      seen.select(col("url").as("target")).distinct(),
      Seq("target"), "left_anti")
    Robots.gate(unseen, col("__fetch"), policy)
      .where(col("allowed"))
      .drop("__fetch", "path", "allowed")
  }
}
