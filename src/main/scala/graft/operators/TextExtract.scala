package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the first stage of any web-corpus
  * (CommonCrawl-shaped) pipeline. Strips script/style/comment blocks,
  * recovers the <title>, converts block-level tags to newlines, drops
  * the remaining markup, decodes the common HTML entities, and scores
  * each page's link density (anchor-text chars / total text chars) —
  * the classic boilerplate signal from Kohlschütter et al. 2010
  * (Boilerpipe) / Pomikálek 2011 (jusText), reduced to its
  * document-level form.
  *
  * Everything is built-in codegen'd string/regexp expressions — one
  * map-only projection, no shuffle, no UDF — so the operator runs at
  * scan speed and the whole pipeline (extract → quality → dedup)
  * stays a single declarative plan. Java and RE2 regex dialects agree
  * on every pattern used here ((?is) flags, non-greedy repetition, no
  * backreferences), which keeps the DuckDB oracle exact.
  *
  * Scale: per-row work linear in page size; at 100 TB this is the
  * canonical embarrassingly-parallel stage — partition count is the
  * only knob, and the extraction composes with parquet scan pushdown
  * (only the html column is read).
  */
object TextExtract {

  /** Decode the entity set emitted by standard HTML encoders. &amp;
    * decodes LAST so "&amp;lt;" round-trips to the literal "&lt;".
    * Literal StringReplace, not regexp — same result (no metachars in
    * any pattern), no regex engine on the hot path. */
  def decodeEntities(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      call_function("replace", acc, lit(from), lit(to))
    }
  }

  private def stripBlocks(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Visible text of an HTML fragment: tags → whitespace (block tags →
    * newline so paragraph structure survives), entities decoded,
    * whitespace collapsed. */
  def visibleText(html: Column): Column = {
    val blocks = regexp_replace(stripBlocks(html),
      "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val decoded = decodeEntities(noTags)
    val oneLineWs = regexp_replace(decoded, "[ \\t]+", " ")
    val collapsed = regexp_replace(oneLineWs, " ?\\n[ \\n]*", "\n")
    trim(collapsed, " \n")
  }

  /** Extract (title, text_clean, n_chars, link_chars, link_density,
    * is_boilerplate) per page. `linkDensityMax` is the boilerplate
    * cutoff: pages whose anchor text dominates (nav/menu/link-farm
    * pages) are flagged, not dropped — the caller decides. */
  def extractHtml(pages: DataFrame, idCol: String, htmlCol: String,
      linkDensityMax: Double = 0.35): DataFrame = {
    val html = col(htmlCol)
    val titleRaw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    val title = trim(decodeEntities(regexp_replace(titleRaw, "<[^>]*>", " ")))
    // Anchor inner text: extract every <a ...>...</a> body from the
    // script-free stream, join on \n and run ONE visibleText pass over
    // the joined string — the \n-collapse rule trims and collapses each
    // anchor independently (empty anchors vanish with their separator),
    // so length-after-deleting-\n equals the sum of per-anchor cleaned
    // lengths. A per-element lambda here would run the regex engine
    // INTERPRETED per anchor (higher-order functions don't codegen) —
    // measured 2× slower on this operator.
    val anchors = regexp_extract_all(stripBlocks(html),
      lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))
    val linkChars =
      length(translate(visibleText(concat_ws("\n", anchors)), "\n", ""))
        .cast("long")
    val text = visibleText(html)
    pages.select(
      col(idCol),
      title.as("title"),
      text.as("text_clean"),
      length(text).cast("long").as("n_chars"),
      linkChars.as("link_chars"),
      (linkChars.cast("double") / greatest(length(text).cast("double"), lit(1.0)))
        .as("link_density"))
      .withColumn("is_boilerplate", col("link_density") > lit(linkDensityMax))
  }

  /** URL parsing + canonicalization: the crawl-metadata stage. Splits a
    * URL column into (scheme, host, domain, tld, path, query_string)
    * and produces `url_canonical` — scheme+host lower-cased, `www.`
    * prefix dropped, tracking parameters removed (utm_*, fbclid,
    * gclid, ref), fragment dropped, trailing slash stripped — the key
    * a crawl dedups and groups on (page content is fetched many times
    * under trivially-different URLs). Domain = last two host labels,
    * the per-site aggregation level for crawl stats and blocklists.
    *
    * All built-in regexp/string expressions except the query-parameter
    * filter, which is one higher-order `filter` over the split
    * parameter list (tiny arrays — not a hot path). Map-only. */
  def parseUrls(df: DataFrame, urlCol: String): DataFrame = {
    val url = col(urlCol)
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(hostRaw, "^www\\.", "")
    val domain = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val tld = regexp_extract(host, "\\.([^.]+)$", 1)
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    val qs = regexp_extract(url, "\\?([^#]*)", 1)
    val keptParams = filter(split(qs, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p.startsWith("ref=") || p === ""))
    val canonPath = regexp_replace(path, "/$", "")
    val canonQs = array_join(keptParams, "&")
    df.select(col("*"),
      scheme.as("scheme"),
      host.as("host"),
      domain.as("domain"),
      tld.as("tld"),
      path.as("path"),
      qs.as("query_string"),
      concat(scheme, lit("://"), host, canonPath,
        when(canonQs === "", lit("")).otherwise(concat(lit("?"), canonQs)))
        .as("url_canonical"))
  }

  /** Within-document consecutive-duplicate-line removal — the C4
    * cleaning rule (Raffel et al. 2020 strip repeated lines; boiler-
    * plate headers/footers repeat verbatim and adjacently after HTML
    * extraction). Pure per-row array work: split on `sep`, keep line i
    * iff i==0 or line i ≠ line i−1, reassemble. No shuffle; the
    * corpus-level companions are lineDedup (cross-doc) and
    * purgeDuplicateSubstrings (sub-line). */
  def dedupConsecutiveLines(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(sep))
    // element_at is 1-based, so lines[i] with the 0-based lambda index i
    // is the PREVIOUS line; the when() keeps element_at(_, 0) from ever
    // evaluating (ANSI error) — Or does not short-circuit, CaseWhen does.
    val kept = filter(lines, (x, i) =>
      when(i === 0, lit(true)).otherwise(x =!= element_at(lines, i)))
    df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, sep).as("text_clean"))
  }

  /** C4 line-level rule filter (Raffel et al. 2020 §2.2): keep only
    * lines with ≥ `minWords` words, ending in terminal punctuation
    * (. ! ? "), and containing none of `blocked` (case-insensitive) —
    * the rules that strip navigation stubs, un-sentence-like fragments
    * and code/boilerplate lines from extracted web text. Rebuilds each
    * document from its surviving lines.
    *
    * Pure per-row array work (split → filter lambda → rejoin): no
    * shuffle, no UDF — the same map-only scale shape as
    * [[dedupConsecutiveLines]], which handles the dedup half of C4's
    * line rules.
    *
    * Output: (idCol, n_lines, n_kept, text_clean). */
  def c4FilterLines(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, blocked: Seq[String] = Seq("javascript"),
      sep: String = "\n"): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(sep))
    def keep(l: Column): Column = {
      // \s+ not a bare space: tab-separated lines would undercount to
      // one "word" and space runs would count empties as words
      val okWords = size(split(l, "\\s+")) >= minWords
      val okTerm = Seq(".", "!", "?", "\"")
        .map(p => l.endsWith(p)).reduce(_ || _)
      val okBlocked = blocked
        .map(b => !contains(lower(l), lit(b.toLowerCase)))
        .foldLeft(lit(true))(_ && _)
      okWords && okTerm && okBlocked
    }
    val kept = filter(lines, keep _)
    df.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, sep).as("text_clean"))
  }

  /** Blocklist host filter — the crawl-curation gate that drops any doc
    * whose host IS a blocked domain or a SUBDOMAIN of one (the UT1 /
    * adult-blocklist semantics every CommonCrawl pipeline applies:
    * blocking `tracker.com` must drop `www.tracker.com` and
    * `cdn.eu.tracker.com`). A host with L labels is tested against its
    * L−1 dot-suffixes of ≥2 labels (bare TLDs are never blockable).
    *
    * Scale shape: the suffix set is row-local and ≤ label-count-sized
    * (explode fan-out ≤ ~5×), the membership test is one equi-join of
    * (doc, suffix) against the blocklist table (broadcast when the list
    * is small — the usual case; a shuffle join otherwise), and the
    * verdict returns to the corpus as one left_anti on the id — never a
    * per-row scan of the list, never a LIKE-cascade.
    *
    * Returns the input rows whose host survives. */
  def filterBlockedHosts(df: DataFrame, idCol: String, hostCol: String,
      blocklist: DataFrame, blockCol: String = "host"): DataFrame = {
    // normalize BOTH sides before matching: case-fold, strip the FQDN
    // trailing dot, THEN strip an explicit :port (parseUrls keeps it in
    // `host`) — each is a blocklist evasion alone, and the dot must go
    // first or 'tracker.com:8080.' keeps its port (the port anchor
    // can't see past the trailing dot)
    def canon(c: Column): Column =
      regexp_replace(regexp_replace(lower(c), "\\.$", ""), ":[0-9]+$", "")
    val labels = split(canon(col(hostCol)), "\\.")
    // single-label hosts (bare TLD / localhost) have NO blockable
    // suffixes — guard them out: Spark's sequence(0, -1) would DESCEND
    // (and slice(start=0) errors under ANSI), not return empty
    val sufs = when(size(labels) >= 2,
      transform(sequence(lit(0), size(labels) - 2),
        i => array_join(slice(labels, i + 1, size(labels)), ".")))
      .otherwise(array().cast("array<string>"))
    val blockedIds = df
      .select(col(idCol), explode(sufs).as("__suf"))
      .join(blocklist.select(canon(col(blockCol)).as("__suf")), Seq("__suf"),
        "left_semi")
      .select(idCol)
    df.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** Per-domain document cap — the crawl-curation rule that bounds any
    * one site's share of the corpus (C4 and RefinedWeb cap pages per
    * domain so boilerplate-heavy mega-sites cannot dominate training):
    * keep at most `cap` docs per domain, best-first by `scoreCol`
    * (ties: ascending id — fully deterministic).
    *
    * Scale shape: this is exactly the per-group-ranked pattern the
    * round-12 rule forbids as a rank window — a mega-domain
    * (wikipedia.org at 100 TB) would funnel its whole corpus-sized
    * partition into one window task. Instead it reuses
    * [[Similarity.topKPerQuery]]: one bounded `graft_top_k` partial
    * aggregate keyed by domain, so every map task holds a ≤cap-row
    * priority queue per domain and only ≤ tasks·cap survivors shuffle.
    *
    * Output: (domainCol, idCol, scoreCol, rn) — rn the 1-based
    * quality rank within the domain. */
  def capPerDomain(docs: DataFrame, idCol: String, domainCol: String,
      scoreCol: String, cap: Int): DataFrame =
    Similarity.topKPerQuery(
      docs.select(col(domainCol), col(idCol), col(scoreCol)),
      cap, scoreCol, scoreDesc = true, idCol = idCol, queryCol = domainCol)

  /** HTML-encode a text column (the inverse entity set, & first). Used
    * by tests and the oracle query to synthesize pages determin-
    * istically from plain-text fixtures. */
  def encodeEntities(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;", "\"" -> "&quot;")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      call_function("replace", acc, lit(from), lit(to))
    }
  }
}
