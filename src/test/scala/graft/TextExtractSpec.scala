package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketches, TextExtract}

/** HTML extraction + exact frequent items (two-pass Misra-Gries). */
class TextExtractSpec extends SparkSpec {

  test("extractHtml strips script/style/comments and decodes entities in order") {
    import spark.implicits._
    val html =
      """<html><head><title>T &amp;amp; U</title><style>p{}</style></head>
        |<body><h1>Head</h1><!-- hidden --><p>a &lt;b&gt; &amp; c</p>
        |<script>if (1 < 2) { document.write("</p>ignored"); }</script>
        |<a href="/x">go <b>now</b></a></body></html>""".stripMargin.replace("\n", "")
    val out = TextExtract.extractHtml(
      Seq((1L, html)).toDF("id", "html"), "id", "html").collect().head
    // &amp;amp; decodes to the literal "&amp;" (amp decoded LAST, once)
    assert(out.getAs[String]("title") == "T &amp; U")
    val text = out.getAs[String]("text_clean")
    assert(text.contains("a <b> & c"))
    assert(!text.contains("ignored"), "script body must not leak")
    assert(!text.contains("hidden"), "comment body must not leak")
    assert(text.contains("Head"))
    assert(out.getAs[Long]("link_chars") == "go now".length.toLong)
  }

  test("extractHtml flags link-dominated pages as boilerplate") {
    import spark.implicits._
    val nav = (1 to 20).map(i => s"""<a href="/$i">section number $i</a>""").mkString
    val df = Seq(
      (1L, s"<html><body><p>real article body with plenty of words here</p></body></html>"),
      (2L, s"<html><body>$nav</body></html>")).toDF("id", "html")
    val out = TextExtract.extractHtml(df, "id", "html", linkDensityMax = 0.5)
      .orderBy("id").collect()
    assert(!out(0).getAs[Boolean]("is_boilerplate"))
    assert(out(1).getAs[Boolean]("is_boilerplate"))
    assert(out(1).getAs[Double]("link_density") >= 0.9)
  }

  test("extractHtml survives empty and tag-free inputs") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "no tags at all"), (3L, "<p></p>"))
      .toDF("id", "html")
    val out = TextExtract.extractHtml(df, "id", "html").orderBy("id").collect()
    assert(out(0).getAs[String]("text_clean") == "")
    assert(out(0).getAs[Long]("link_chars") == 0L)
    assert(out(1).getAs[String]("text_clean") == "no tags at all")
    assert(out(2).getAs[String]("text_clean") == "")
  }

  test("parseUrls canonicalizes scheme/host/params and splits components") {
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTPS://www.Example.COM/a/b/?utm_source=x&id=7&ref=z#frag"),
      (2L, "http://sub.site.org/page?x=1&fbclid=abc&gclid=q"),
      (3L, "https://bare.net"),
      (4L, "not a url at all")).toDF("id", "url")
    val out = TextExtract.parseUrls(urls, "url").orderBy("id").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[String]("scheme") == "https")
    assert(r1.getAs[String]("host") == "example.com")
    assert(r1.getAs[String]("domain") == "example.com")
    assert(r1.getAs[String]("tld") == "com")
    assert(r1.getAs[String]("path") == "/a/b/")
    // tracking params dropped, real param kept, trailing slash stripped,
    // fragment gone
    assert(r1.getAs[String]("url_canonical") == "https://example.com/a/b?id=7")
    val r2 = out(2L)
    assert(r2.getAs[String]("host") == "sub.site.org")
    assert(r2.getAs[String]("domain") == "site.org")
    assert(r2.getAs[String]("url_canonical") == "http://sub.site.org/page?x=1")
    val r3 = out(3L)
    assert(r3.getAs[String]("path") == "")
    assert(r3.getAs[String]("url_canonical") == "https://bare.net")
    // malformed: every component empty, canonical degenerates to "://"
    assert(out(4L).getAs[String]("host") == "")
  }

  test("dedupConsecutiveLines keeps only adjacent-distinct lines") {
    import spark.implicits._
    val df = Seq(
      (1L, "a\na\nb\nb\na"),
      (2L, ""),
      (3L, "solo"),
      (4L, "x\nx\nx\nx")).toDF("id", "text")
    val out = TextExtract.dedupConsecutiveLines(df, "id", "text")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((5L, 3L, "a\nb\na")))
    assert(out(2L) == ((1L, 1L, "")))
    assert(out(3L) == ((1L, 1L, "solo")))
    assert(out(4L) == ((4L, 1L, "x")))
  }

  test("extractHtml/parseUrls never throw on adversarial garbage") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val pieces = Seq("<", ">", "</", "<a", "<script>", "</script", "&amp",
      "&#", "http://", "://", "?", "&", "#", "\n", "\t", "\u0000", "é",
      "<!--", "-->", "<style", "a", "1", " ", "\"", "'")
    val garbage = (1 to 200).map { i =>
      (i.toLong, (1 to rnd.nextInt(40)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString)
    }
    val df = garbage.toDF("id", "s")
    val html = TextExtract.extractHtml(df, "id", "s").collect()
    assert(html.length == 200)
    // invariants: counts non-negative, density in [0, ~len]
    html.foreach { r =>
      assert(r.getAs[Long]("n_chars") >= 0 && r.getAs[Long]("link_chars") >= 0)
      assert(!r.getAs[Double]("link_density").isNaN)
    }
    val urls = TextExtract.parseUrls(df, "s").collect()
    assert(urls.length == 200)
    val lines = TextExtract.dedupConsecutiveLines(df, "id", "s").collect()
    lines.foreach(r => assert(r.getLong(2) <= r.getLong(1))) // kept <= total
  }

  test("encode/decode entities round-trip") {
    import spark.implicits._
    val s0 = """x < y & y > "z" — plain"""
    val got = Seq(s0).toDF("t")
      .select(TextExtract.decodeEntities(TextExtract.encodeEntities(col("t"))).as("r"))
      .as[String].collect().head
    assert(got == s0)
  }

  test("frequentTokens is exact: differential vs full groupBy on skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Zipf-ish: token i drawn with weight ~ 1/i over 200 tokens, 20k draws
    val weights = (1 to 200).map(i => 1.0 / i)
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val totalW = cum.last
    val draws = Seq.fill(20000) {
      val u = rnd.nextDouble() * totalW
      s"tok${cum.indexWhere(_ >= u) + 1}"
    }
    val toks = draws.toDF("token").repartition(13)
    val phiNum = 1L; val phiDenom = 100L // support >= 1% of 20k = 200
    val got = Sketches.frequentTokens(toks, "token", phiNum, phiDenom, k = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = draws.size
    val expect = draws.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * phiDenom >= n * phiNum }.toMap
    assert(got == expect)
  }

  test("frequentTokens rejects an undersized sketch and handles empty input") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sketches.frequentTokens(Seq("a").toDF("token"), "token", 1, 100, k = 50)
    }
    // boundary (k+1)·num == denom must ALSO reject: at equality an item
    // with exactly phi*N occurrences can be evicted from every summary
    intercept[IllegalArgumentException] {
      Sketches.frequentTokens(Seq("a").toDF("token"), "token", 1, 100, k = 99)
    }
    val empty = Seq.empty[String].toDF("token")
    assert(Sketches.frequentTokens(empty, "token", 1, 100, k = 128).count() == 0L)
  }

  test("c4FilterLines applies word-count, terminal-punct and blocklist rules per line") {
    import spark.implicits._
    val docs = Seq(
      (1L, "this line has enough words here.\nshort one.\n" +
        "no terminal punctuation on this line\n" +
        "this has JavaScript inside it somewhere.\n" +
        "is this a kept question line too?"),
      (2L, "")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextExtract
      .c4FilterLines(docs, "doc_id", "text", minWords = 5,
        blocked = Seq("javascript"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L)._1 == 5L && got(1L)._2 == 2L)
    assert(got(1L)._3 ==
      "this line has enough words here.\nis this a kept question line too?")
    // empty doc: one empty "line", dropped by the word-count rule
    assert(got(2L) == ((1L, 0L, "")))
  }

  test("filterBlockedHosts drops exact hosts and all subdomains, never bare TLDs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tracker.com"),          // exact block
      (2L, "www.tracker.com"),      // subdomain of block
      (3L, "cdn.eu.tracker.com"),   // deep subdomain
      (4L, "nottracker.com"),       // suffix STRING but not suffix DOMAIN
      (5L, "tracker.com.evil.org"), // blocked name as a non-suffix label
      (6L, "clean.net"),
      (7L, "com")                   // bare TLD can never be blocked
    ).toDF("doc_id", "host")
    val bl = Seq("tracker.com", "com").toDF("host")
    val kept = graft.operators.TextExtract
      .filterBlockedHosts(docs, "doc_id", "host", bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L, 5L, 6L, 7L), s"got $kept")
  }

  test("filterBlockedHosts normalizes case, explicit port, and trailing dot") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Tracker.COM"),          // case evasion
      (2L, "tracker.com:8080"),     // parseUrls keeps the port in host
      (3L, "www.tracker.com."),     // FQDN trailing dot
      (4L, "clean.net:443"),
      (5L, "Tracker.COM:8080.")     // all three at once
    ).toDF("doc_id", "host")
    val bl = Seq("TRACKER.com.").toDF("host") // list itself un-normalized
    val kept = graft.operators.TextExtract
      .filterBlockedHosts(docs, "doc_id", "host", bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L), s"got $kept")
  }

  test("bandSCurve replays the s-curve math and is monotone in r at fixed t") {
    val got = graft.operators.TextDedup.bandSCurve(spark, 16, 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 4L, 8L, 16L))
    // hand arithmetic at r=4, b=4: p = 1-(1-0.8^4)^4
    val p4 = 1.0 - math.pow(1.0 - math.pow(0.8, 4), 4)
    assert(math.abs(got(4L)._2 - p4) < 1e-12)
    assert(math.abs(got(4L)._3 - math.pow(0.25, 0.25)) < 1e-12)
    // r=1,b=16 catches nearly everything; r=16,b=1 nearly nothing at t=0.8
    assert(got(1L)._2 > 0.99 && got(16L)._2 < 0.05)
  }

  test("capPerDomain keeps the cap best per domain, score desc then id asc") {
    import spark.implicits._
    val docs = Seq(
      // big.com: 4 docs, scores 5,9,9,1 → keep 11 (9), 12 (9, id tie), rank 3 drops
      (10L, "big.com", 5L), (11L, "big.com", 9L),
      (12L, "big.com", 9L), (13L, "big.com", 1L),
      // small.org: fewer than cap → keep all
      (20L, "small.org", 2L)
    ).toDF("doc_id", "domain", "n_chars")
    val got = TextExtract.capPerDomain(docs, "doc_id", "domain", "n_chars", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.toSeq == Seq(
      ("big.com", 11L, 9L, 1), ("big.com", 12L, 9L, 2),
      ("small.org", 20L, 2L, 1)))
    // the scale rule: a bounded aggregate, never a per-domain rank window
    val qe = TextExtract.capPerDomain(docs, "doc_id", "domain", "n_chars", 2)
      .queryExecution
    assert(qe.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty)
    assert(qe.analyzed.toString.contains("collect_top_k") ||
      qe.analyzed.toString.contains("graft_top_k"))
  }
}
