package graft

import graft.operators.HtmlOps
import org.apache.spark.sql.functions._

class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Run the extraction kernel over one planted page. */
  private def extract(html: String): (Int, Int, String) = {
    val r = HtmlOps.withExtractedCols(
        Seq((1L, html)).toDF("doc_id", "html"), $"html")
      .select($"n_segs", $"n_kept", $"extracted")
      .as[(Int, Int, String)].head()
    r
  }

  test("h1: script/style/title content NEVER survives — whole-subtree removal, not tag stripping") {
    val (_, _, out) = extract(
      "<html><head><title>SECRET_TITLE</title>" +
        "<script>var SECRET_JS = 1; if (a < b) run();</script>" +
        "<style>p { SECRET_CSS: red }</style></head>" +
        "<body><p>visible content paragraph here</p></body></html>")
    assert(out === "visible content paragraph here")
    assert(!out.contains("SECRET"), "chrome subtree text leaked")
    // the script body contained a bare '<' — subtree removal must not
    // trip on it (tag-stripping alone would leave 'var SECRET_JS…')
  }

  test("h1: the link-density rule — nav and link-lists die, a clean paragraph survives, a half-link paragraph dies at >= 50%") {
    val (nSegs, nKept, out) = extract(
      "<body><nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
        "<p>a genuinely content bearing paragraph with many words</p>" +
        "<ul><li><a href=\"/1\">first link</a></li>" +
        "<li><a href=\"/2\">second link</a></li></ul>" +
        "<p><a href=\"/spam\">clickbaitclickbait</a> tiny</p>" +
        "<footer><a href=\"/p\">Privacy policy</a> (c) host</footer></body>")
    assert(nSegs === 6, "nav, p, ul, spam-p, footer, trailing residue")
    assert(nKept === 1, "only the clean paragraph survives")
    assert(out === "a genuinely content bearing paragraph with many words")
  }

  test("h1: footer with mostly-link text dies; a footer that is mostly prose survives — the rule measures density, not tag names") {
    val (_, k1, _) = extract(
      "<body><footer><a href=\"/a\">Privacy policy</a>" +
        "<a href=\"/b\">Terms of use</a> (c)</footer></body>")
    assert(k1 === 0, "link-dense footer dies")
    val (_, k2, out2) = extract(
      "<body><footer>This page is maintained by the documentation team " +
        "and updated monthly <a href=\"/c\">contact</a></footer></body>")
    assert(k2 === 1, "prose-dominant block survives whatever its tag")
    assert(out2.startsWith("This page is maintained"))
  }

  test("h1: entity decode — after tag strip, table order, &amp; last (double-escape stays escaped)") {
    val (_, _, out) = extract(
      "<body><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; " +
        "x&nbsp;y literal &amp;lt; stays</p></body>")
    assert(out === "A & B <tag> \"q\" 's' x y literal &lt; stays")
  }

  test("h1: decoded &nbsp; beside a literal space collapses to ONE space (decode runs before the collapse — ADVICE r17)") {
    val (_, _, out) = extract("<body><p>x &nbsp;y a&nbsp; b&nbsp;&nbsp;c</p></body>")
    assert(out === "x y a b c",
      "adjacent decoded/literal whitespace must merge in the collapse")
  }

  test("h1: whitespace discipline — tags become spaces, runs collapse, segments join with one space") {
    val (_, _, out) = extract(
      "<body><p>alpha<b>beta</b>gamma   delta\n\nepsilon </p>" +
        "<p> second  paragraph </p></body>")
    assert(out === "alpha beta gamma delta epsilon second paragraph")
  }

  test("h1: fixture round trip — extraction inverts the derivation; recovered is exactly the no-extra-paragraph class") {
    val rows = HtmlOps.h1HtmlExtract(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val rec = r.getAs[Boolean]("recovered")
      assert(rec === (id % 6 != 3),
        s"doc $id: recovered must be exactly the ¬(%6=3) class")
      assert(r.getAs[Int]("n_kept") === (if (id % 6 == 3) 2 else 1))
      assert(r.getAs[Int]("n_segs") >= 4)
    }
    // the %6=3 docs carry the decoded literal-entity paragraph appended
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val extended = HtmlOps.withExtractedCols(
        graft.sources.Tables.documents(spark, sf)
          .where($"doc_id" % 6 === 3)
          .select($"doc_id", expr(HtmlOps.htmlExprSql).as("html")),
        $"html")
      .select($"doc_id", $"extracted").as[(Long, String)].collect()
    assert(extended.nonEmpty)
    extended.foreach { case (id, ex) =>
      assert(ex === docs(id) + " A & B <x> \"q\"", s"doc $id suffix")
    }
  }

  test("h1: the plan is a pure narrow map — ZERO exchanges at any corpus size") {
    val plan = HtmlOps.h1HtmlExtract(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"h1 must not shuffle:\n$plan")
  }
}
