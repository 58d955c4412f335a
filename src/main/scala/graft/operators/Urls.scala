package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** URL canonicalization and domain-level corpus statistics — the
  * CommonCrawl-style pre-filter every pretraining prep pipeline runs
  * before content-level dedup/quality: fold each document's URL to a
  * canonical host, aggregate per-domain document/token volumes, surface
  * the heaviest domains, and drop documents from blocklisted domains.
  *
  * Everything here is either a pure codegen'd string expression
  * ([[canonicalHost]] — anchored regexes only, so replace-first vs
  * replace-all engines agree) or one partial-agg-friendly groupBy on the
  * canonical host; the blocklist is broadcast (a blocklist is
  * human-curated — thousands of rows, never corpus-sized). Nothing
  * shuffles document text: [[domainStats]] reduces each doc to
  * `(domain, 1, n_tokens)` before the exchange, and [[domainFilter]]'s
  * anti-join streams the corpus map-side past the broadcast list. At
  * 100 TB the per-domain relation is bounded by the number of distinct
  * registrable hosts (~10⁸ worst case — still a small table), and the
  * top-k is the k-bounded [[graft.functions.TopK]] heap, never a global
  * sort.
  *
  * Scope note: canonicalization is HOST-level (scheme/userinfo/port/
  * `www.`/trailing-dot stripping + lowercasing). Registrable-domain
  * grouping (`a.b.co.uk` → `b.co.uk`) needs the public-suffix list — a
  * versioned external artifact a cluster deployment ships as a small
  * table and joins exactly like the blocklist; it is deliberately not
  * baked in here.
  */
object Urls {

  /** Canonical host of a URL, as a single codegen'd column expression:
    * lowercase, strip the scheme (`http://`, `HTTPS://`, any
    * RFC-3986 `scheme://`), strip userinfo (`user:pw@`), cut the
    * authority at the first `/`, `?` or `#`, strip an explicit port,
    * strip ONE leading `www.`, strip trailing dots (the FQDN root-dot
    * form). Null URL → null; a URL with no host (e.g. `"/rel/path"`)
    * → empty string — both are their own stratum downstream, never
    * silently merged with a real domain.
    *
    * Every regex is anchored (`^`/`$`), so engines that replace all
    * matches (Spark) and engines that replace the first (DuckDB) compute
    * the same value — the property the oracle parity of the q_url_*
    * faces rests on. */
  def canonicalHost(url: Column): Column = {
    val lowered = lower(trim(url))
    val noScheme = regexp_replace(lowered, "^[a-z][a-z0-9+.-]*://", "")
    val noUser = regexp_replace(noScheme, "^[^/?#@]*@", "")
    val authority = regexp_extract(noUser, "^([^/?#]*)", 1)
    val noPort = regexp_replace(authority, ":[0-9]*$", "")
    val noWww = regexp_replace(noPort, "^www\\.", "")
    regexp_replace(noWww, "\\.+$", "")
  }

  /** Per-domain corpus volumes: `(domain, n_docs, n_tokens)` — the
    * domain-level ledger a corpus audit and every quota/mixing decision
    * reads. One projection reduces each document to its token count
    * before the single hash aggregate on the canonical host; document
    * text never crosses the exchange. */
  def domainStats(docs: DataFrame, urlCol: Column,
      textCol: Column = col("text")): DataFrame =
    docs.select(canonicalHost(urlCol).as("domain"),
        size(tokens(textCol)).cast("long").as("__t"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))

  /** The k heaviest domains by token volume as ONE deterministic row:
    * `top_domains` is a comma-joined `domain:n_docs:n_tokens` list in
    * (n_tokens desc, domain asc) order — the [[Profile.keySkew]]
    * string-tie TopK contract, k-bounded heap, no global sort — plus the
    * corpus-wide totals the shares are read against. */
  def domainTopK(docs: DataFrame, urlCol: Column,
      textCol: Column = col("text"), k: Int = 5): DataFrame = {
    import graft.functions.TopK
    require(k >= 1, s"k must be >= 1, got $k")
    domainStats(docs, urlCol, textCol).agg(
      count(lit(1)).as("n_domains"),
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      TopK.topKByOrdStrTie(
        concat_ws(":", col("domain"), col("n_docs"), col("n_tokens")),
        col("n_tokens"), col("domain"), k).as("__top"))
      .select(col("n_domains"), col("n_docs"), col("n_tokens"),
        concat_ws(",", col("__top")).as("top_domains"))
  }

  /** Documents whose canonical host is NOT on the blocklist — the
    * domain-level drop that runs before any content-level filter. The
    * blocklist (`domain` column, already-canonical hosts) is broadcast;
    * the corpus streams past it map-side (left_anti), so the filter
    * costs one scan and zero shuffles at any corpus size. Output = the
    * input columns plus the computed `domain` (downstream stages key on
    * it anyway — computing it once here is the shared projection). */
  def domainFilter(docs: DataFrame, urlCol: Column,
      blocklist: DataFrame): DataFrame =
    docs.withColumn("domain", canonicalHost(urlCol))
      .join(broadcast(blocklist.select(col("domain"))), Seq("domain"),
        "left_anti")
}
