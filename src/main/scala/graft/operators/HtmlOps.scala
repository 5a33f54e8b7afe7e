package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** HTML→text extraction — the step that PRECEDES everything else in a
  * published web pipeline (RefinedWeb §3.1 runs trafilatura before any
  * filter; FineWeb likewise; C4's cleaning starts from extracted lines;
  * jusText/boilerpipe built the link-density lineage this operator
  * implements), and before round 17 the one such stage the engine could
  * not represent: every d/t operator consumed already-clean `text`.
  *
  * The fixtures carry no HTML, so the round-16 derivation device
  * ([[UrlOps.urlExprSql]]'s one-spelling discipline) closes the gap:
  * [[htmlExprSql]] builds a deterministic MESSY page around each
  * document's text as ONE portable SQL expression both engines splice —
  * head chrome (title, script, style), a nav bar, the body paragraph
  * with entity-escaped characters, an optional literal-entity paragraph,
  * an optional link-list block, and a footer — keyed on coprime doc_id
  * moduli so the messiness axes cross.
  *
  * Extraction is the jusText recipe as a declarative chain, spelled
  * INDEPENDENTLY by the two engines (Spark `filter`/`transform` lambdas
  * vs DuckDB `list_filter`/`list_transform`):
  *
  *   1. drop whole non-content subtrees (`script`/`style`/`title`) —
  *      their text must never surface;
  *   2. split on block-closing tags into segments;
  *   3. per segment, the LINK-DENSITY rule: keep iff the segment has any
  *      non-whitespace text AND anchor-text characters make up < 50% of
  *      it (integer cross-multiplication, no floats) — pure-link chrome
  *      (nav, footer, link lists) dies, content paragraphs survive;
  *   4. strip tags (to spaces), decode entities (table order, `&amp;`
  *      after the other entities so `&amp;lt;` yields the literal
  *      `&lt;`, not `<` — the standard double-escape rule, spec-pinned),
  *      THEN collapse whitespace, join surviving segments. Decoding sits
  *      between the tag strip and the collapse (ADVICE r17): before the
  *      strip it would let escaped markup be eaten; after the collapse a
  *      decoded `&nbsp;` beside a literal space would leave an
  *      uncollapsed double space — the one ordering that honors both the
  *      no-markup-resurrection and the whitespace-discipline contracts.
  *
  * The contract column: for every derived page without the extra
  * entity paragraph, `recovered` = (extracted == original text) — the
  * chain provably inverts the derivation, which is the strongest
  * statement an extraction oracle can make.
  *
  * Scale shape: derivation + extraction are ONE narrow codegen'd
  * projection over the scan — zero exchanges at any corpus size
  * (plan-audited); the per-row cost is bounded by page length. The
  * output ships digests and counts, never the page. */
object HtmlOps {

  /** Non-content subtrees removed whole, BEFORE segmentation. `(?s)` +
    * non-greedy: RE2 (DuckDB) and java.util.regex (Spark) agree on
    * both. */
  private[graft] val HeadChromeRe =
    "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<title[^>]*>.*?</title>"

  /** Block-closing tags that end a segment (the paragraph unit of the
    * link-density rule). The pattern CONSUMES the delimiter — RE2 has no
    * lookbehind, so a keep-the-tag split would not port. */
  private[graft] val BlockCloseRe = "</p>|</nav>|</footer>|</ul>"

  private[graft] val TagRe = "<[^>]*>"

  /** Anchor text (group 1) for the density numerator. */
  private[graft] val LinkTextRe = "<a[^>]*>([^<]*)</a>"

  /** The fixed entity table — ONE Seq drives both engines' decode
    * chains (real extractors ship the full HTML5 table; the CHAIN is
    * what's under test). `&amp;` is deliberately LAST: decoding it
    * first would turn `&amp;lt;` into `&lt;` and then into `<`,
    * corrupting text that legitimately discusses markup. */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&#97;" -> "a", "&#101;" -> "e", "&#105;" -> "i", "&#111;" -> "o",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** The body text with entity escapes planted per doc_id class — the
    * round-trip half of the derivation (each escape decodes back to the
    * exact character it replaced). */
  private val bodyExprSql: String =
    "replace(replace(replace(text, " +
      "'e', CASE WHEN doc_id % 2 = 0 THEN '&#101;' ELSE 'e' END), " +
      "'o', CASE WHEN doc_id % 3 = 1 THEN '&#111;' ELSE 'o' END), " +
      "'i', CASE WHEN doc_id % 7 = 3 THEN '&#105;' ELSE 'i' END)"

  /** The ONE-SPELLING page derivation over (doc_id, text) — parses
    * identically in Spark SQL and DuckDB. Axes: script block (%2=0,
    * with a varying payload so a lazy extractor can't pattern-match it
    * away), style block (%5=2), a third nav link (%3=0), the
    * literal-entity paragraph (%6=3 — the only segment that ADDS text,
    * so `recovered` is exactly the ¬(%6=3) class), a link-list block
    * (%4=1), title/nav/footer always. Flattened to one line (the r16
    * stripMargin-splice trap). */
  private[graft] val htmlExprSql: String =
    "'<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title>' " +
      "|| CASE WHEN doc_id % 2 = 0 THEN " +
      "'<script type=\"text/javascript\">var page = ' || " +
      "CAST(doc_id % 97 AS STRING) || '; track(page);</script>' " +
      "ELSE '' END " +
      "|| CASE WHEN doc_id % 5 = 2 THEN " +
      "'<style>p { margin: 0; } nav a { color: red }</style>' ELSE '' END " +
      "|| '</head><body><nav><a href=\"/\">Home</a> <a href=\"/tags\">Tags</a>' " +
      "|| CASE WHEN doc_id % 3 = 0 THEN ' <a href=\"/login\">Log in</a>' ELSE '' END " +
      "|| '</nav><p>' || " + bodyExprSql + " || '</p>' " +
      "|| CASE WHEN doc_id % 6 = 3 THEN " +
      "'<p>A &amp; B &lt;x&gt; &quot;q&quot;</p>' ELSE '' END " +
      "|| CASE WHEN doc_id % 4 = 1 THEN " +
      "'<ul><li><a href=\"/rel/1\">related items</a></li>" +
      "<li><a href=\"/rel/2\">read more</a></li></ul>' ELSE '' END " +
      "|| '<footer><a href=\"/privacy\">Privacy policy</a> " +
      "<a href=\"/terms\">Terms of use</a> (c) example</footer></body></html>'"

  // ------------------------------------------------ extraction (Spark)

  private def segText(s: Column): Column = regexp_replace(s, TagRe, " ")

  /** Density denominator: non-whitespace chars of the tag-stripped
    * segment (spaces would reward padding). */
  private def nonspaceLen(s: Column): Column =
    length(regexp_replace(segText(s), "\\s", ""))

  /** Density numerator: non-whitespace chars under anchor text. */
  private def linkLen(s: Column): Column =
    length(regexp_replace(
      array_join(regexp_extract_all(s, lit(LinkTextRe), lit(1)), ""), " ", ""))

  /** Tag strip → entity decode (in table order — `&amp;` last) →
    * whitespace collapse/trim. Decode before the collapse so a decoded
    * `&nbsp;` merges with adjacent literal whitespace (ADVICE r17). */
  private def cleanSeg(s: Column): Column =
    trim(regexp_replace(
      Entities.foldLeft(segText(s)) {
        case (acc, (k, v)) => replace(acc, lit(k), lit(v))
      }, "\\s+", " "))

  /** The extraction kernel over any (…, html) relation — appends
    * `n_segs`, `n_kept`, `extracted`. Exposed so the planted-chrome
    * specs drive raw HTML through the IDENTICAL chain the registered
    * query runs. */
  private[graft] def withExtractedCols(df: DataFrame, html: Column): DataFrame =
    df.withColumn("__segs",
        split(regexp_replace(html, HeadChromeRe, " "), BlockCloseRe))
      // one conjunct, not two: 2·linkLen < nonspaceLen with linkLen ≥ 0
      // already implies nonspaceLen > 0 (empty segments drop on 0 < 0),
      // and each nonspaceLen evaluation is a full tag-strip regex pass
      .withColumn("__kept", filter(col("__segs"), s =>
        lit(2) * linkLen(s) < nonspaceLen(s)))
      .withColumn("n_segs", size(col("__segs")))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("extracted",
        array_join(transform(col("__kept"), cleanSeg(_)), " "))
      .drop("__segs", "__kept")

  /** h1: the registered derive-and-extract query. */
  def h1HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withExtractedCols(
      Tables.documents(s, dir)
        .select($"doc_id", $"text", expr(htmlExprSql).as("html")),
      $"html")
      .select($"doc_id", $"n_segs", $"n_kept",
        length($"extracted").cast("long").as("n_chars"),
        md5($"extracted").as("extracted_sig"),
        ($"extracted" === $"text").as("recovered"))
  }

  // ------------------------------------------------------------ oracle

  /** DuckDB decode chain generated from the SAME [[Entities]] Seq. */
  private def unescapeSqlOf(e: String): String =
    Entities.foldLeft(e) { case (acc, (k, v)) =>
      s"replace($acc, '$k', '${v.replace("'", "''")}')"
    }

  private def segTextSqlOf(s: String): String =
    s"regexp_replace($s, '$TagRe', ' ', 'g')"

  private def nonspaceLenSqlOf(s: String): String =
    s"length(regexp_replace(${segTextSqlOf(s)}, '\\s', '', 'g'))"

  // regexp_extract_all on a linkless segment returns []; DuckDB's
  // array_to_string of an empty list is NULL (not '' — measured), so
  // the numerator needs the COALESCE or every content paragraph's keep
  // predicate would be NULL and the page would extract empty.
  private def linkLenSqlOf(s: String): String =
    "COALESCE(length(replace(array_to_string(" +
      s"regexp_extract_all($s, '$LinkTextRe', 1), ''), ' ', '')), 0)"

  private def cleanSegSqlOf(s: String): String =
    s"trim(regexp_replace(${unescapeSqlOf(segTextSqlOf(s))}," +
      " '\\s+', ' ', 'g'))"

  private val h1Sql =
    s"""WITH hh1 AS (
       |  SELECT doc_id, text, $htmlExprSql AS html FROM documents),
       |sh1 AS (
       |  SELECT doc_id, text,
       |    regexp_replace(html, '$HeadChromeRe', ' ', 'g') AS nh
       |  FROM hh1),
       |gh1 AS (
       |  SELECT doc_id, text,
       |    string_split_regex(nh, '$BlockCloseRe') AS segs
       |  FROM sh1),
       |kh1 AS (
       |  SELECT doc_id, text, CAST(len(segs) AS INT) AS n_segs,
       |    list_filter(segs,
       |      s -> 2 * ${linkLenSqlOf("s")} < ${nonspaceLenSqlOf("s")}) AS kept
       |  FROM gh1),
       |eh1 AS (
       |  SELECT doc_id, text, n_segs, CAST(len(kept) AS INT) AS n_kept,
       |    array_to_string(list_transform(kept, s -> ${cleanSegSqlOf("s")}),
       |      ' ') AS extracted
       |  FROM kh1)
       |SELECT doc_id, n_segs, n_kept,
       |  CAST(length(extracted) AS BIGINT) AS n_chars,
       |  md5(extracted) AS extracted_sig,
       |  extracted = text AS recovered
       |FROM eh1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h1_html_extract" -> h1HtmlExtract _)

  val oracleSql: Map[String, String] = Map(
    "h1_html_extract" -> h1Sql)
}
