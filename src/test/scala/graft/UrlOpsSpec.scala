package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

/** URL canonicalization / registrable-domain / blocklist specs (d16,
  * t23): planted messy variants through the Spark canonicalizer, an
  * INDEPENDENT Scala replay of the whole derivation + canonicalization
  * over the corpus, the rollup arithmetic, and the plan shape. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent Scala canonicalizer (restated, not shared): the
  // spec's own reading of the semantics, compared column-for-column
  private def canonRef(url: String): (String, String) = {
    val ns = url.replaceFirst("(?i)^https?://", "")
    val hostEnd = ns.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => ns.length; case i => i
    }
    val chost = ns.substring(0, hostEnd).toLowerCase
      .replaceFirst("^www\\.", "")
    val rest = ns.substring(hostEnd)
    val noFrag = rest.takeWhile(_ != '#')
    val (path0, query) = noFrag.indexOf('?') match {
      case -1 => (noFrag, "")
      case i => (noFrag.substring(0, i), noFrag.substring(i + 1))
    }
    val path = path0.reverse.dropWhile(_ == '/').reverse
    val kept = query.split("&", -1).filter(p =>
      p.nonEmpty && !p.matches("^(utm_[a-z]+|fbclid|gclid|ref)=.*"))
    val canon = chost + path + (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
    // the spec's own restatement of the PSL rule: longest matching
    // suffix keeps (its labels + 1), default 2; a host AT or BELOW the
    // keep depth (single label, or the host IS a public suffix) has no
    // registrable domain
    val psl = Seq("co.uk", "com.au", "co.jp", "ac.uk",
      "act.edu.au", "city.kawasaki.jp", "pvt.k12.ma.us")
    val labels = chost.split("\\.")
    val keep = (2 +: psl.collect {
      case m if chost == m || chost.endsWith("." + m) => m.split("\\.").length + 1
    }).max
    val dom = if (labels.length >= keep) labels.takeRight(keep).mkString(".") else ""
    (canon, dom)
  }

  // the spec's own reading of the derivation convention (doc_id moduli
  // restated from the documented fixture design, not from urlExprSql)
  private def urlRef(id: Long, source: String): String = {
    val host = (if (id % 7 == 0) "news." else "") + s"$source-${id % 5}" +
      (id % 3 match {
        case 0 => ".com"
        case 1 => ".org"
        case _ => if (id % 17 == 5) ".act.edu.au" else ".co.uk"
      })
    (if (id % 2 == 0) "https://" else "http://") +
      (if (id % 11 == 0) "www." else "") +
      (if (id % 13 == 0) host.toUpperCase else host) +
      s"/p/${id % 50}" + (if (id % 2 == 1) "/" else "") +
      (id % 3 match {
        case 0 => s"?utm_source=feed&id=${id % 10}"
        case 1 => s"?id=${id % 10}&utm_campaign=x"
        case _ => ""
      }) + (if (id % 5 == 0) "#sec" else "")
  }

  test("url: messy variants canonicalize together; tracking params die, real params survive in order") {
    // every spelling of one logical page — scheme/case/www/fragment/
    // trailing-slash/tracking variants — lands on ONE canonical form
    val variants = Seq(
      "https://example.com/a/b?x=1&y=2",
      "http://EXAMPLE.com/a/b?x=1&y=2",
      "https://www.example.com/a/b?x=1&y=2#frag",
      "https://example.com/a/b/?x=1&y=2",
      "https://example.com/a/b?utm_source=s&x=1&utm_campaign=c&y=2&gclid=g",
      "https://example.com/a/b?x=1&y=2&fbclid=z")
    val got = variants.toDF("url")
      .select(UrlOps.canonUrlCol($"url").as("c")).as[String].collect()
    assert(got.toSet === Set("example.com/a/b?x=1&y=2"))
    got.zip(variants).foreach { case (c, u) =>
      assert(c === canonRef(u)._1, s"independent replay on $u")
    }
    // all-tracking query drops the '?' entirely; bare host survives
    val edge = Seq(
      "https://www.Site.org/p/1?utm_source=a&utm_medium=b" -> "site.org/p/1",
      "http://site.org/p/1/" -> "site.org/p/1",
      "https://site.org" -> "site.org",
      "https://site.org/?ref=x#top" -> "site.org")
    edge.foreach { case (u, want) =>
      val c = Seq(u).toDF("url")
        .select(UrlOps.canonUrlCol($"url")).as[String].head()
      assert(c === want, s"canon of $u")
      assert(c === canonRef(u)._1, s"independent replay on $u")
    }
  }

  test("url: registrable domain — table-driven longest-suffix match; two labels default, suffix+1 over PSL rules") {
    val cases = Seq(
      "https://news.foo-3.co.uk/x" -> "foo-3.co.uk",
      "https://www.bar.com/x" -> "bar.com",
      "http://deep.a.b.com.au/x" -> "b.com.au",
      "https://single.io/x" -> "single.io",
      "https://a.b.c.ac.uk/" -> "c.ac.uk")
    cases.foreach { case (u, want) =>
      val d = Seq(u).toDF("url")
        .select(UrlOps.domainCol($"url")).as[String].head()
      assert(d === want, s"domain of $u")
      assert(d === canonRef(u)._2, s"independent replay on $u")
    }
  }

  test("url: depth-3+ PSL rules the r16 regex stand-in could not express — and longest-match precedence") {
    val cases = Seq(
      // 3-label suffix: keep FOUR labels (the regex alternation
      // hard-coded one-label + two-label-suffix, structurally unable
      // to say this)
      "https://news.x-1.act.edu.au/p" -> "x-1.act.edu.au",
      // longest match wins: act.edu.au (keep 4) beats com.au (keep 3)
      // for a host under both… and a host under com.au but NOT under
      // act.edu.au keeps 3
      "https://a.b.act.edu.au/" -> "b.act.edu.au",
      // edu.au alone is NOT in the stand-in table: default 2 applies
      "https://a.b.other.edu.au/" -> "edu.au",
      // 4-label suffix
      "https://www.school.pvt.k12.ma.us/x" -> "school.pvt.k12.ma.us",
      "https://city.kawasaki.jp.example.com/" -> "example.com", // suffix match is ANCHORED at the end
      // a host that IS a public suffix has no registrable domain
      // (publicsuffix.org semantics — the r16 regex wrongly returned
      // the suffix itself; the table swap fixes it deliberately)
      "https://act.edu.au/" -> "",
      "https://co.uk/" -> "",
      "https://localhost/" -> "")
    cases.foreach { case (u, want) =>
      val d = Seq(u).toDF("url")
        .select(UrlOps.domainCol($"url")).as[String].head()
      assert(d === want, s"domain of $u")
      assert(d === canonRef(u)._2, s"independent replay on $u")
    }
  }

  test("d16: full independent replay over the corpus — url, canon, domain, keep bit, gate bit") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val refUrl = docs.map { case (id, src) => id -> urlRef(id, src) }.toMap
    val refCanon = refUrl.view.mapValues(canonRef(_)._1).toMap
    val refDomain = refUrl.view.mapValues(canonRef(_)._2).toMap
    val refKeep = refCanon.groupBy(_._2).values.flatMap { g =>
      val m = g.keys.min; g.keys.map(id => id -> (id == m))
    }.toMap
    val blocked = Set("src3-3.com", "src7-2.org", "src12-2.co.uk")

    val got = UrlOps.d16UrlDedup(spark, sf)
      .as[(Long, String, String, String, Boolean, Boolean)].collect()
    assert(got.length === docs.length)
    got.foreach { case (id, url, canon, dom, keep, blk) =>
      assert(url === refUrl(id), s"doc $id url")
      assert(canon === refCanon(id), s"doc $id canon_url")
      assert(dom === refDomain(id), s"doc $id domain")
      assert(keep === refKeep(id), s"doc $id url_canon")
      assert(blk === blocked(dom), s"doc $id url_blocked")
    }
    // the corpus must actually exercise the machinery: real canonical
    // collisions, a nonempty blocked sliver, and a nonempty remainder
    assert(got.count(!_._5) > 0, "canonical dups exist")
    assert(got.count(_._6) > 0, "blocked docs exist")
    assert(got.count(!_._6) > 0, "unblocked docs exist")
  }

  test("t23: the rollup equals the per-domain recount of d16's relation") {
    val d16 = UrlOps.d16UrlDedup(spark, sf)
      .select($"doc_id", $"canon_url", $"domain", $"url_blocked")
      .as[(Long, String, String, Boolean)].collect()
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val want = d16.groupBy(_._3).map { case (dom, rows) =>
      val nDocs = rows.length.toLong
      val nCanon = rows.map(_._2).distinct.length.toLong
      dom -> ((nDocs, rows.map(r => toks(r._1)).sum, nCanon,
        (nDocs - nCanon) * 1000000L / nDocs, rows.head._4))
    }
    val got = UrlOps.t23DomainRollup(spark, sf)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length === want.size)
    got.foreach { case (dom, nd, nt, nc, share, blk) =>
      assert((nd, nt, nc, share, blk) === want(dom), s"domain $dom")
    }
  }

  test("url plan: derivation/canonicalization stay narrow — one documents scan, no cartesian; t23 aggregates map-side") {
    val d16 = UrlOps.d16UrlDedup(spark, sf).queryExecution.executedPlan.toString
    val t23 = UrlOps.t23DomainRollup(spark, sf).queryExecution.executedPlan.toString
    def scans(p: String) = "Scan parquet".r.findAllIn(p).length
    assert(scans(d16) === 1, s"d16 must read documents once:\n$d16")
    assert(scans(t23) === 1, s"t23 must read documents once:\n$t23")
    assert(!d16.contains("CartesianProduct") && !t23.contains("CartesianProduct"))
    // d16's only exchange is the canonical-key window; t23's are the
    // distinct-rewrite pair of its aggregate — nothing else shuffles
    assert("Exchange".r.findAllIn(d16).length === 1, d16)
    assert("partial".r.findAllIn(t23).nonEmpty, t23)
  }
}
