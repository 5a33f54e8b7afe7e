package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** URL/domain-level curation — the FIRST stage of every published web
  * pipeline (RefinedWeb Table 2 opens with "URL filtering"; C4 gates on
  * a domain blocklist; CCNet/FineWeb dedupe by canonical URL and roll
  * quality up per domain) and, before round 16, the one stage this
  * engine could not represent: the fixtures carry no URL column.
  *
  * The fixture gap is closed by the [[urlExprSql]] DERIVATION DEVICE:
  * a deterministic messy URL built from (doc_id, source) as ONE
  * portable SQL expression string — Spark runs it through `expr(...)`,
  * the DuckDB oracles splice the identical string, so the two engines
  * cannot drift on what the URL is (the e7/e9 one-Seq discipline
  * applied to a scalar expression). Messiness is planted on purpose:
  * scheme http/https, optional `www.`, optional `news.` subdomain,
  * upper-cased host, multi-part TLDs, trailing slash, tracking params
  * in both positions, fragments — everything the canonicalizer must
  * erase, keyed on coprime doc_id moduli so the variants cross.
  *
  * Canonicalization itself is a declarative expression chain (no UDF,
  * one narrow codegen'd projection): strip scheme → split host/rest →
  * lowercase host, strip `www.` → drop fragment → drop tracking params
  * (filter over the split query-param array — order of surviving
  * params is preserved, any count/position of tracking params dies) →
  * strip trailing path slashes. The DuckDB oracle states the same
  * semantics INDEPENDENTLY (string_split/list_filter CTE chain); the
  * hash compare proves the two spellings equal.
  *
  * Scale shape: derivation + canonicalization + domain extraction +
  * blocklist gate are pure narrow maps — zero shuffles at any corpus
  * size. The only exchanges are the ones the semantics require:
  * d16's canonical-keep bit (one window keyed by canon_url — d1's
  * exact-dedup geometry on the canonical key; skew bounded by the
  * largest dup cluster) and t23's per-domain aggregate (map-side
  * combined, output bounded by domain cardinality ≪ corpus).
  *
  * Reference scope note: the reference framework (lib/MapReduce/
  * Framework/Simple.pm) has no URL handling — this operator family is
  * part of the training-data-pipeline extension tier. */
object UrlOps {

  /** The public-suffix table (round 18 — the table-driven lookup the
    * r16 regex alternation stood in for): each entry is a public suffix
    * whose registrable domain keeps (suffix labels + 1) labels; hosts
    * matching no entry keep the default two. Longest match wins (the
    * publicsuffix.org rule). A production deployment generates this Seq
    * from the published PSL (~9,500 rules) at build time — the
    * mechanism below is sized for that: the lookup rides the plan as
    * ONE literal map (~200 KB at full PSL size, the t18
    * weight-table-as-literal device), never as regex alternation.
    *
    * ONE Seq drives both engines: Spark through the [[domainCol]]
    * candidate-suffix fold over [[pslKeepMap]], DuckDB through the
    * [[pslValuesSql]] VALUES relation. The depth-3+ entries
    * (`act.edu.au`, `pvt.k12.ma.us` — real PSL rules) are exactly what
    * the r16 `DomainRe` stand-in could not express: its alternation
    * hard-coded "one label + a TWO-label suffix", so every deeper rule
    * was structurally out of reach (UrlOpsSpec pins them). */
  private[graft] val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "com.au", "co.jp", "ac.uk",         // the r16 two-label rules
    "act.edu.au", "city.kawasaki.jp",            // three-label PSL rules
    "pvt.k12.ma.us")                             // a four-label PSL rule

  /** suffix → labels to KEEP for a host under that suffix (= suffix
    * labels + 1). */
  private[graft] val pslKeepMap: Map[String, Int] =
    PublicSuffixes.map(sfx => sfx -> (sfx.count(_ == '.') + 2)).toMap

  /** Longest suffix the table knows, in labels — bounds the candidate
    * fold (grows automatically with the table). */
  private[graft] val MaxPslLabels: Int =
    PublicSuffixes.map(_.count(_ == '.') + 1).max

  /** The oracle's VALUES splice of the SAME table. */
  private[graft] val pslValuesSql: String =
    PublicSuffixes.map(sfx => s"('$sfx', ${pslKeepMap(sfx)})").mkString(", ")

  /** Query parameters that never identify content (the C4/CCNet strip
    * list): any `utm_*` campaign tag, click ids, referrer tags. Shared
    * alternation, spliced into both engines' filters. */
  private[graft] val TrackingParamRe = "utm_[a-z]+|fbclid|gclid|ref"

  /** The blocklist gate's registrable domains (the C4-style curated
    * blocklist stand-in). ONE Seq drives the d16 bit, the t23 rollup
    * column, and e9's stage-0 kill predicate in both engines. */
  private[graft] val BlockedDomains = Seq("src3-3.com", "src7-2.org", "src12-2.co.uk")

  private[graft] val blockedInSql: String =
    BlockedDomains.map(d => s"'$d'").mkString("(", ", ", ")")

  /** The derived host (messy): optional `news.` subdomain (tests that
    * registrable-domain extraction strips more than `www.`), base =
    * source + '-' + doc_id%5, TLD keyed on doc_id%3 — including a
    * two-label suffix and (round 18, the %17=5 sliver of the %3=2
    * class) the THREE-label `act.edu.au`, so the oracle-gated fixture
    * itself exercises the deep-suffix rule the r16 regex could not
    * express. Part of [[urlExprSql]]. */
  private[graft] val hostExprSql: String =
    "CASE WHEN doc_id % 7 = 0 THEN 'news.' ELSE '' END || source || '-' || " +
      "CAST(doc_id % 5 AS STRING) || " +
      "CASE WHEN doc_id % 3 = 0 THEN '.com' " +
      "WHEN doc_id % 3 = 1 THEN '.org' " +
      "WHEN doc_id % 17 = 5 THEN '.act.edu.au' ELSE '.co.uk' END"

  /** The ONE-SPELLING url derivation over (doc_id, source) — parses
    * identically in Spark SQL and DuckDB (CASE/%/||/upper/CAST AS
    * STRING are in both dialects). Coprime moduli (2, 11, 13, 7, 3, 5,
    * 50) cross the messiness axes; the canonical form depends only on
    * (source, doc_id%3, doc_id%7=0, doc_id%50, doc_id%10), so distinct
    * doc_ids collide on canon_url — real URL-level duplication for the
    * keep bit and the rollup's dup share to measure. */
  private[graft] val urlExprSql: String =
    s"""CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END
       | || CASE WHEN doc_id % 11 = 0 THEN 'www.' ELSE '' END
       | || CASE WHEN doc_id % 13 = 0 THEN upper($hostExprSql)
       |         ELSE $hostExprSql END
       | || '/p/' || CAST(doc_id % 50 AS STRING)
       | || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
       | || CASE WHEN doc_id % 3 = 0
       |         THEN '?utm_source=feed&id=' || CAST(doc_id % 10 AS STRING)
       |         WHEN doc_id % 3 = 1
       |         THEN '?id=' || CAST(doc_id % 10 AS STRING) || '&utm_campaign=x'
       |         ELSE '' END
       | || CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END"""
      // flattened to ONE line: this expression is spliced into other
      // stripMargin templates (the oracle CTE chains), where embedded
      // lines starting with `||` would lose a pipe to the outer strip
      .stripMargin.replaceAll("\\s*\n\\s*", " ")

  // ------------------------------------------- canonicalization (Spark)

  private def noScheme(url: Column): Column =
    regexp_replace(url, "(?i)^https?://", "")

  /** Canonical host: scheme stripped, lowercased, leading `www.`
    * removed. Host ends at the first of `/ ? #`. */
  private[graft] def canonHostCol(url: Column): Column =
    regexp_replace(lower(regexp_extract(noScheme(url), "^[^/?#]*", 0)),
      "^www\\.", "")

  /** Canonical path + surviving query: fragment dropped, tracking
    * params filtered out of the split param array (survivor order
    * preserved; `?` dropped when nothing survives), trailing path
    * slashes stripped. */
  private[graft] def canonRestCol(url: Column): Column = {
    val rest = regexp_replace(noScheme(url), "^[^/?#]*", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(regexp_replace(noFrag, "\\?.*$", ""), "/+$", "")
    val kept = filter(split(regexp_extract(noFrag, "\\?(.*)$", 1), "&"),
      p => p =!= "" && !p.rlike(s"^(?:$TrackingParamRe)="))
    concat(path, when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit("")))
  }

  private[graft] def canonUrlCol(url: Column): Column =
    concat(canonHostCol(url), canonRestCol(url))

  /** Registrable domain of a URL — the table-driven longest-suffix
    * match over the canonical host (round 18, replacing the r16
    * [[PublicSuffixes]] regex stand-in): split the host on '.', probe
    * each of its ≤ [[MaxPslLabels]] trailing-label candidate suffixes
    * against [[pslKeepMap]], keep = the largest matched (labels + 1)
    * — longest match wins because deeper suffixes keep more — default
    * 2; registrable = the host's last `keep` labels, or '' when the
    * host has fewer (a single label, or a host that IS a public suffix
    * — publicsuffix.org semantics: a public suffix is not registrable;
    * the r16 regex returned the suffix itself there, a divergence this
    * swap deliberately fixes, spec-pinned).
    *
    * `news.foo-3.co.uk` → `foo-3.co.uk`, `www.bar.com` → `bar.com`,
    * `news.x-1.act.edu.au` → `x-1.act.edu.au` (4 labels kept — the
    * case the regex alternation could not express).
    *
    * Scale/plan note — why a plan-literal map and NOT the
    * posexplode + broadcast-join spelling SCALING.md sketched: the
    * lookup table is static config (full PSL ≈ 9,500 rules ≈ 200 KB),
    * so `element_at(<map literal>, candidate)` ships it with the plan
    * exactly like a broadcast variable while keeping the operator a
    * PURE NARROW expression — zero new plan operators, and d16/t23's
    * one-scan/one-exchange plan pins hold verbatim. The join spelling
    * would add a BroadcastExchange + posexplode + re-group per
    * consumer for the same per-row work; measured plan shape, not
    * taste: UrlOpsSpec's exchange counts would fail under it. The
    * fold is bounded: MaxPslLabels candidate probes per row against a
    * hash map, each O(host length). */
  private[graft] def domainCol(url: Column): Column = {
    val host = canonHostCol(url)
    val labels = split(host, "\\.")
    val n = size(labels)
    val psl = typedLit(pslKeepMap)
    val candidates = (2 to MaxPslLabels).map { k =>
      when(n >= k,
        coalesce(element_at(psl,
          array_join(slice(labels, n - lit(k) + 1, lit(k)), ".")), lit(2)))
        .otherwise(lit(2))
    }
    val keep = greatest((lit(2) +: candidates): _*)
    when(n >= keep,
      array_join(slice(labels, n - keep + 1, keep), "."))
      .otherwise(lit(""))
  }

  /** The blocklist gate bit over (doc_id, source) — e9's stage-0 kill
    * signal, computed as a pure narrow expression (derivation →
    * canonical host → registrable domain → blocklist membership), so
    * wiring it into the funnel's base scan adds ZERO corpus scans. */
  private[graft] def urlBlockedCol: Column =
    domainCol(expr(urlExprSql)).isin(BlockedDomains: _*)

  // ------------------------------------------------------- d16 / t23

  /** d16: URL canonicalization + canonical-URL dedup + blocklist gate —
    * per document: the derived messy `url`, its `canon_url`, the
    * registrable `domain`, `url_canon` (this doc is the canonical
    * representative of its canon_url group — d1's min-doc_id keep rule
    * on the canonical key), and `url_blocked` (registrable domain on
    * the blocklist). The keep bit's window is the operator's only
    * exchange. */
  def d16UrlDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", expr(urlExprSql).as("url"))
      .select($"doc_id", $"url",
        canonUrlCol($"url").as("canon_url"),
        domainCol($"url").as("domain"))
      .select($"doc_id", $"url", $"canon_url", $"domain",
        ($"doc_id" === min($"doc_id").over(
          Window.partitionBy($"canon_url"))).as("url_canon"),
        $"domain".isin(BlockedDomains: _*).as("url_blocked"))
  }

  /** t23: per-domain rollup — the table a curation team reads before
    * adding a domain to the blocklist: docs, tokens, distinct canonical
    * URLs, exact-dup share in integer micro-units (the (docs − canon)
    * mass canonical-URL dedup would remove), and the current gate bit.
    * One map-side-combined aggregate keyed by domain; output bounded by
    * domain cardinality. */
  def t23DomainRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(expr(urlExprSql).as("url"),
        size(split($"text", " ")).cast("long").as("n_toks"))
      .select(domainCol($"url").as("domain"),
        canonUrlCol($"url").as("canon_url"), $"n_toks")
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"),
        countDistinct($"canon_url").as("n_canon"))
      .select($"domain", $"n_docs", $"n_tokens", $"n_canon",
        expr("((n_docs - n_canon) * 1000000L) div n_docs")
          .as("dup_share_micro"),
        $"domain".isin(BlockedDomains: _*).as("blocked"))
  }

  // ------------------------------------------------------------ oracle

  /** The oracle's canonicalization CTE chain over `documents` — the
    * INDEPENDENT DuckDB spelling (string_split/list_filter instead of
    * Spark's filter/array_join; same [[urlExprSql]] derivation and
    * [[TrackingParamRe]]/[[PublicSuffixes]] shared config). The
    * registrable domain restates the longest-suffix rule INDEPENDENTLY
    * of the Spark candidate fold: the [[pslValuesSql]] VALUES relation
    * probed by a correlated suffix-match MAX (ends-with predicate, not
    * candidate generation) — two spellings of one table, hash-proven
    * equal. Ends in `urlc` = (doc_id, source, text, url, canon_url,
    * domain). */
  private[graft] val urlCanonCtesSql: String =
    s"""pslx(suffix, keep) AS (VALUES $pslValuesSql),
       |url0 AS (
       |  SELECT doc_id, source, text, $urlExprSql AS url FROM documents),
       |url1 AS (
       |  SELECT doc_id, source, text, url,
       |    regexp_replace(url, '(?i)^https?://', '') AS ns FROM url0),
       |url2 AS (
       |  SELECT doc_id, source, text, url,
       |    regexp_extract(ns, '^[^/?#]*') AS host,
       |    regexp_replace(ns, '^[^/?#]*', '') AS rest FROM url1),
       |url3 AS (
       |  SELECT doc_id, source, text, url,
       |    regexp_replace(lower(host), '^www\\.', '') AS chost,
       |    regexp_replace(rest, '#.*$$', '') AS nofrag FROM url2),
       |url4 AS (
       |  SELECT doc_id, source, text, url, chost,
       |    regexp_replace(regexp_replace(nofrag, '\\?.*$$', ''), '/+$$', '')
       |      AS cpath,
       |    list_filter(string_split(regexp_extract(nofrag, '\\?(.*)$$', 1), '&'),
       |      p -> p <> '' AND NOT regexp_matches(p, '^(?:$TrackingParamRe)='))
       |      AS kept
       |  FROM url3),
       |url5 AS (
       |  SELECT doc_id, source, text, url, chost, cpath, kept,
       |    string_split(chost, '.') AS hls,
       |    COALESCE((SELECT MAX(p.keep) FROM pslx p
       |      WHERE u.chost = p.suffix
       |         OR u.chost LIKE '%.' || p.suffix), 2) AS keepn
       |  FROM url4 u),
       |urlc AS (
       |  SELECT doc_id, source, text, url,
       |    chost || cpath || CASE WHEN len(kept) > 0
       |      THEN '?' || array_to_string(kept, '&') ELSE '' END AS canon_url,
       |    CASE WHEN len(hls) >= keepn
       |         THEN array_to_string(hls[len(hls) - keepn + 1:], '.')
       |         ELSE '' END AS domain
       |  FROM url5)""".stripMargin

  private val d16Sql =
    s"WITH $urlCanonCtesSql\n" +
      s"""SELECT doc_id, url, canon_url, domain,
         |  doc_id = MIN(doc_id) OVER (PARTITION BY canon_url) AS url_canon,
         |  domain IN $blockedInSql AS url_blocked
         |FROM urlc""".stripMargin

  private val t23Sql =
    s"WITH $urlCanonCtesSql\n" +
      s"""SELECT domain,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_canon,
         |  CAST(((COUNT(*) - COUNT(DISTINCT canon_url)) * 1000000)
         |    // COUNT(*) AS BIGINT) AS dup_share_micro,
         |  domain IN $blockedInSql AS blocked
         |FROM urlc GROUP BY domain""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d16_url_dedup" -> d16UrlDedup _,
    "t23_domain_rollup" -> t23DomainRollup _)

  val oracleSql: Map[String, String] = Map(
    "d16_url_dedup" -> d16Sql,
    "t23_domain_rollup" -> t23Sql)
}
