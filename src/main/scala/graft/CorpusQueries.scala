package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Sketches, TextDedup, TextQuality}

/** Corpus-hygiene coverage: exact duplicated-substring purge (Lee et
  * al. 2021 ExactSubstr), Bloom-filter cross-snapshot dedup (Bloom
  * 1970), per-document cross-corpus duplication scoring, PMI
  * collocation mining (Church & Hanks 1990), quality-aware near-dup
  * cluster collapse, and a Zipf-slope corpus diagnostic.
  *
  * All engine extensions beyond the reference's operator list. Every
  * oracle replays the identical md5-derived hashing and double
  * arithmetic in DuckDB.
  */
object CorpusQueries {

  /** Deterministic page synthesis for q_html_extract — SHARED with the
    * facade-equality spec so both always build the identical page (a
    * copy would let the two inputs drift while the spec kept passing). */
  def htmlPage: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc "), col("doc_id").cast("string"),
    lit(" &amp; "), col("source"),
    lit("</title><style>p{margin:0}</style></head><body><h1>Doc "),
    col("doc_id").cast("string"),
    lit("</h1><!-- generated --><p>"),
    graft.operators.TextExtract.encodeEntities(col("text")),
    lit("</p>"),
    call_function("repeat", lit("<a href=\"/nav\">site &amp; nav</a>"),
      (col("doc_id") % 4 + 1).cast("int")),
    lit("<script type=\"text/javascript\">if (1 < 2) { x = \"</p>\"; }</script>"),
    lit("</body></html>"))

  def registerAll(reg: (String, Option[String], (SparkSession, String) => DataFrame) => Unit): Unit = {

    def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Unit =
      reg(name, Some(oracle), fn)

    // ---- exact duplicated-substring purge -----------------------------

    // Stride-1 4-word windows; any window content occurring twice in
    // the corpus marks all but its first occurrence's positions for
    // removal, and documents are rebuilt from the surviving words.
    q("q_substring_dedup",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |wins AS (SELECT doc_id, i - 1 AS start,
        |           md5(array_to_string(ws[i:i+3], ' ')) AS h
        |         FROM (SELECT doc_id, ws,
        |                 unnest(generate_series(1, len(ws) - 3)) AS i FROM d)),
        |rk AS (SELECT doc_id, start,
        |         count(*) OVER (PARTITION BY h) AS c,
        |         row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
        |       FROM wins),
        |cov AS (SELECT DISTINCT doc_id, start + j AS pos
        |        FROM (SELECT doc_id, start, unnest(generate_series(0, 3)) AS j
        |              FROM rk WHERE c >= 2 AND rn > 1)),
        |wrd AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word
        |        FROM (SELECT doc_id, ws,
        |                unnest(generate_series(1, len(ws))) AS i FROM d)),
        |kept AS (SELECT w.doc_id, count(*) AS n_kept,
        |           string_agg(word, ' ' ORDER BY w.pos) AS text_clean
        |         FROM wrd w LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.pos = w.pos
        |         WHERE cov.doc_id IS NULL GROUP BY 1)
        |SELECT d.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(ws) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(text_clean, '') AS text_clean
        |FROM d LEFT JOIN kept USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      TextDedup.purgeDuplicateSubstrings(Tables.documents(s, dir),
          "doc_id", "text", windowWords = 4, keepFirst = true)
        .orderBy("doc_id")
    }

    // Incremental (snapshot-N+1) substring purge: the stored window-hash
    // index of "yesterday's corpus" (doc_id % 10 < 8) purges every
    // already-indexed 4-word window from the NEW batch (doc_id % 10
    // >= 8) — one asymmetric semi join, never index×index; composes
    // with q_substring_dedup for within-batch duplication (the
    // q_incremental_winnow discipline applied to the purge stage).
    q("q_purge_against_index",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents WHERE doc_id % 10 >= 8),
        |idx AS (SELECT DISTINCT md5(array_to_string(ws[i:i+3], ' ')) AS h
        |        FROM (SELECT ws, unnest(generate_series(1, len(ws) - 3)) AS i
        |              FROM (SELECT string_split(text, ' ') AS ws FROM documents
        |                    WHERE doc_id % 10 < 8))),
        |wins AS (SELECT doc_id, i - 1 AS start,
        |           md5(array_to_string(ws[i:i+3], ' ')) AS h
        |         FROM (SELECT doc_id, ws,
        |                 unnest(generate_series(1, len(ws) - 3)) AS i FROM d)),
        |cov AS (SELECT DISTINCT doc_id, start + j AS pos
        |        FROM (SELECT doc_id, start, unnest(generate_series(0, 3)) AS j
        |              FROM wins WHERE h IN (SELECT h FROM idx))),
        |wrd AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word
        |        FROM (SELECT doc_id, ws,
        |                unnest(generate_series(1, len(ws))) AS i FROM d)),
        |kept AS (SELECT w.doc_id, count(*) AS n_kept,
        |           string_agg(word, ' ' ORDER BY w.pos) AS text_clean
        |         FROM wrd w LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.pos = w.pos
        |         WHERE cov.doc_id IS NULL GROUP BY 1)
        |SELECT d.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(ws) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(text_clean, '') AS text_clean
        |FROM d LEFT JOIN kept USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val idx = TextDedup.windowHashIndex(
        docs.filter(col("doc_id") % 10 < 8), "text", windowWords = 4)
      TextDedup.purgeAgainstIndex(docs.filter(col("doc_id") % 10 >= 8),
          idx, "doc_id", "text", windowWords = 4)
        .orderBy("doc_id")
    }

    // Multi-length sweep (Lee et al. 2022 sweep substring lengths) with
    // per-level support thresholds: long runs are strong duplication
    // evidence (w=8 purges at count >= 2) while short phrases repeat by
    // chance and only go at higher support (w=4 needs count >= 5);
    // covered positions merge before a single rebuild. A single global
    // >= 2 threshold would be degenerate (the smallest window subsumes
    // every larger one) — the thresholds are what make the sweep real.
    q("q_substring_dedup_multi",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |wins AS (SELECT doc_id, w, mc, i - 1 AS start,
        |           md5(array_to_string(ws[i:i+w-1], ' ')) AS h
        |         FROM (SELECT doc_id, ws, w, mc,
        |                 unnest(generate_series(1, len(ws) - w + 1)) AS i
        |               FROM d, (VALUES (4, 5), (8, 2)) lv(w, mc))),
        |rk AS (SELECT doc_id, w, mc, start,
        |         count(*) OVER (PARTITION BY h) AS c,
        |         row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
        |       FROM wins),
        |cov AS (SELECT DISTINCT doc_id, start + j AS pos
        |        FROM (SELECT doc_id, start, unnest(generate_series(0, w - 1)) AS j
        |              FROM rk WHERE c >= mc AND rn > 1)),
        |wrd AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word
        |        FROM (SELECT doc_id, ws,
        |                unnest(generate_series(1, len(ws))) AS i FROM d)),
        |kept AS (SELECT w.doc_id, count(*) AS n_kept,
        |           string_agg(word, ' ' ORDER BY w.pos) AS text_clean
        |         FROM wrd w LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.pos = w.pos
        |         WHERE cov.doc_id IS NULL GROUP BY 1)
        |SELECT d.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(ws) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(text_clean, '') AS text_clean
        |FROM d LEFT JOIN kept USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      TextDedup.purgeDuplicateSubstringsMulti(Tables.documents(s, dir),
          "doc_id", "text", windows = Seq((4, 5L), (8, 2L)), keepFirst = true)
        .orderBy("doc_id")
    }

    // Scrub-all policy (keepFirst = false): EVERY occurrence of a
    // duplicated window goes — the boilerplate-destruction variant.
    q("q_substring_scrub",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |wins AS (SELECT doc_id, i - 1 AS start,
        |           md5(array_to_string(ws[i:i+3], ' ')) AS h
        |         FROM (SELECT doc_id, ws,
        |                 unnest(generate_series(1, len(ws) - 3)) AS i FROM d)),
        |rk AS (SELECT doc_id, start,
        |         count(*) OVER (PARTITION BY h) AS c
        |       FROM wins),
        |cov AS (SELECT DISTINCT doc_id, start + j AS pos
        |        FROM (SELECT doc_id, start, unnest(generate_series(0, 3)) AS j
        |              FROM rk WHERE c >= 2)),
        |wrd AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word
        |        FROM (SELECT doc_id, ws,
        |                unnest(generate_series(1, len(ws))) AS i FROM d)),
        |kept AS (SELECT w.doc_id, count(*) AS n_kept,
        |           string_agg(word, ' ' ORDER BY w.pos) AS text_clean
        |         FROM wrd w LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.pos = w.pos
        |         WHERE cov.doc_id IS NULL GROUP BY 1)
        |SELECT d.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(ws) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(text_clean, '') AS text_clean
        |FROM d LEFT JOIN kept USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      TextDedup.purgeDuplicateSubstrings(Tables.documents(s, dir),
          "doc_id", "text", windowWords = 4, keepFirst = false)
        .orderBy("doc_id")
    }

    // ---- Bloom-filter cross-snapshot dedup ----------------------------

    // Index snapshot = docs with doc_id % 3 < 2; probe batch = odd
    // docs, so 2/3 of probes are guaranteed members (no false
    // negatives) and the rest exercise the false-positive path.
    q("q_bloom_dedup", {
      val seedRows = TextDedup.mixConsts(4).zipWithIndex
        .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
      s"""WITH seeds(j, a, b) AS (VALUES $seedRows),
         |ik AS (SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % 3 < 2),
         |bits AS (SELECT DISTINCT
         |    ((CAST('0x' || substr(md5(k), 1, 7) AS BIGINT) * a + b)
         |      % ${TextDedup.P}) % 32768 AS bit
         |  FROM ik, seeds),
         |pk AS (SELECT doc_id, md5(text) AS k FROM documents WHERE doc_id % 2 = 1),
         |pos AS (SELECT k,
         |    ((CAST('0x' || substr(md5(k), 1, 7) AS BIGINT) * a + b)
         |      % ${TextDedup.P}) % 32768 AS p
         |  FROM (SELECT DISTINCT k FROM pk), seeds),
         |hits AS (SELECT k, count(b.bit) AS nh
         |         FROM pos LEFT JOIN bits b ON b.bit = pos.p GROUP BY k)
         |SELECT doc_id, nh = 4 AS might_dup
         |FROM pk JOIN hits USING (k) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val idx = docs.filter(col("doc_id") % 3 < 2).select(md5(col("text")).as("k"))
      val bloom = Sketches.bloomBuild(idx, "k", bits = 32768, hashes = 4)
      val probes = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), md5(col("text")).as("k"))
      probes
        .join(Sketches.bloomMightContain(bloom, probes.select("k"), "k",
          bits = 32768, hashes = 4), Seq("k"))
        .select(col("doc_id"), col("might_contain").as("might_dup"))
        .orderBy("doc_id")
    }

    // ---- cross-document duplicated n-gram fraction --------------------

    // Per-doc share of trigram instances whose content also occurs in
    // another document — the cheap scoring stage where
    // purgeDuplicateSubstrings is the rewrite stage.
    q("q_dup_gram_fraction",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
        |          1, 15) AS BIGINT) AS h
        |      FROM (SELECT doc_id, ws,
        |              unnest(generate_series(1, len(ws) - 2)) AS i FROM d)),
        |pd AS (SELECT doc_id, h, count(*) AS cd FROM g GROUP BY 1, 2),
        |wt AS (SELECT doc_id, cd, sum(cd) OVER (PARTITION BY h) AS ct FROM pd),
        |f AS (SELECT doc_id, sum(cd) AS n_grams,
        |        round(sum(CASE WHEN ct > cd THEN cd ELSE 0 END)
        |          / CAST(sum(cd) AS DOUBLE), 9) AS dup_frac
        |      FROM wt GROUP BY 1)
        |SELECT doc_id, CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
        |  coalesce(dup_frac, 0.0) AS dup_frac
        |FROM documents LEFT JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextDedup.dupGramFraction(Tables.documents(s, dir), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }

    // ---- PMI collocations ---------------------------------------------

    q("q_pmi_collocations",
      """WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2, count(*) AS cnt
        |       FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d)
        |       GROUP BY 1, 2),
        |m AS (SELECT w1, w2, cnt,
        |        sum(cnt) OVER (PARTITION BY w1) AS l,
        |        sum(cnt) OVER (PARTITION BY w2) AS r
        |      FROM bg),
        |t AS (SELECT sum(cnt) AS n FROM bg)
        |SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt,
        |  round(ln(cnt * n / CAST(l * r AS DOUBLE)), 9) AS pmi
        |FROM m, t WHERE cnt >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin) { (s, dir) =>
      TextQuality.pmiCollocations(Tables.documents(s, dir), "text",
        minCount = 5, topK = 50)
    }

    // ---- quality-aware near-dup cluster collapse ----------------------

    // Same LSH pipeline + recursive-CTE closure as q_leakage_safe_split;
    // the kept doc of each cluster is the longest (n_chars), ties to
    // the smallest doc_id.
    q("q_cluster_keep_best",
      s"""WITH RECURSIVE ${LlmQueries.minhashCtes(n = 3, k = 16, r = 4)},
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS nsh FROM shd GROUP BY 1),
         |inter AS (SELECT doc_a, doc_b, count(*) AS ni
         |          FROM cand
         |          JOIN shd sa ON sa.doc_id = doc_a
         |          JOIN shd sb ON sb.doc_id = doc_b AND sb.h0 = sa.h0
         |          GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sizes za ON za.doc_id = doc_a
         |          JOIN sizes zb ON zb.doc_id = doc_b
         |          WHERE ni / (za.nsh + zb.nsh - ni) >= 0.8),
         |edges AS (SELECT doc_a AS n, doc_b AS m FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(n, m) AS (SELECT n, m FROM edges
         |                UNION
         |                SELECT r.n, e.m FROM reach r JOIN edges e ON r.m = e.n),
         |cl AS (SELECT n AS doc_id, least(n, min(m)) AS cluster_id
         |       FROM reach GROUP BY n),
         |alldocs AS (SELECT d.doc_id, d.n_chars,
         |              coalesce(cl.cluster_id, d.doc_id) AS cluster_id
         |            FROM documents d LEFT JOIN cl USING (doc_id)),
         |rk AS (SELECT doc_id, cluster_id,
         |         count(*) OVER (PARTITION BY cluster_id) AS n_members,
         |         row_number() OVER (PARTITION BY cluster_id
         |                            ORDER BY n_chars DESC, doc_id) AS rn
         |       FROM alldocs)
         |SELECT doc_id, cluster_id, CAST(n_members AS BIGINT) AS n_members,
         |  rn = 1 AS kept
         |FROM rk ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextDedup.collapseKeepBest(Tables.documents(s, dir), "doc_id", "text",
          scoreCol = "n_chars", threshold = 0.8)
        .orderBy("doc_id")
    }

    // Bounded-slice twin of q_cluster_keep_best (sf1 strict-gate
    // protocol): universe capped at doc_id < 5000 in both engines — a
    // no-op at sf <= 0.1, tractable at sf1 where the unsliced oracle's
    // closure + all-pairs verify costs 125 s.
    q("q_cluster_keep_best_sliced",
      s"""WITH RECURSIVE ${LlmQueries.minhashCtes(n = 3, k = 16, r = 4,
            docWhere = "WHERE doc_id < 5000")},
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS nsh FROM shd GROUP BY 1),
         |inter AS (SELECT doc_a, doc_b, count(*) AS ni
         |          FROM cand
         |          JOIN shd sa ON sa.doc_id = doc_a
         |          JOIN shd sb ON sb.doc_id = doc_b AND sb.h0 = sa.h0
         |          GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sizes za ON za.doc_id = doc_a
         |          JOIN sizes zb ON zb.doc_id = doc_b
         |          WHERE ni / (za.nsh + zb.nsh - ni) >= 0.8),
         |edges AS (SELECT doc_a AS n, doc_b AS m FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(n, m) AS (SELECT n, m FROM edges
         |                UNION
         |                SELECT r.n, e.m FROM reach r JOIN edges e ON r.m = e.n),
         |cl AS (SELECT n AS doc_id, least(n, min(m)) AS cluster_id
         |       FROM reach GROUP BY n),
         |alldocs AS (SELECT d.doc_id, d.n_chars,
         |              coalesce(cl.cluster_id, d.doc_id) AS cluster_id
         |            FROM (SELECT * FROM documents WHERE doc_id < 5000) d
         |            LEFT JOIN cl USING (doc_id)),
         |rk AS (SELECT doc_id, cluster_id,
         |         count(*) OVER (PARTITION BY cluster_id) AS n_members,
         |         row_number() OVER (PARTITION BY cluster_id
         |                            ORDER BY n_chars DESC, doc_id) AS rn
         |       FROM alldocs)
         |SELECT doc_id, cluster_id, CAST(n_members AS BIGINT) AS n_members,
         |  rn = 1 AS kept
         |FROM rk ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextDedup.collapseKeepBest(
          Tables.documents(s, dir).filter(col("doc_id") < 5000),
          "doc_id", "text", scoreCol = "n_chars", threshold = 0.8)
        .orderBy("doc_id")
    }

    // ---- snapshot content diff ----------------------------------------

    // Two simulated snapshots of one corpus: old = doc_id % 7 != 0
    // (those docs get "removed"), new = doc_id % 5 != 0 ("added" docs
    // are the % 7 hits that survive % 5), and every doc_id % 3 == 0 in
    // the new snapshot is re-extracted with a trailing token
    // ("changed"). Per-doc status + the aggregate gate counts.
    q("q_snapshot_diff",
      """WITH old AS (SELECT doc_id, md5(text) AS ho FROM documents WHERE doc_id % 7 != 0),
        |new AS (SELECT doc_id,
        |          md5(CASE WHEN doc_id % 3 = 0 THEN text || ' rev2' ELSE text END) AS hn
        |        FROM documents WHERE doc_id % 5 != 0),
        |d AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |        CASE WHEN ho IS NULL THEN 'added'
        |             WHEN hn IS NULL THEN 'removed'
        |             WHEN ho = hn THEN 'unchanged' ELSE 'changed' END AS status
        |      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
        |SELECT status, count(*) AS n_docs FROM d GROUP BY status
        |ORDER BY status""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      TextQuality.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
        .groupBy("status").agg(count(lit(1)).as("n_docs"))
        .orderBy("status")
    }

    // ---- epoch-based mixture replication ------------------------------

    // The LLaMA-style data recipe: src0 2.5 epochs (two copies + a
    // deterministic content-hash half getting a third), src1 0.4
    // (down-sampled), everything else 1.0.
    q("q_epoch_mixture",
      """WITH e(source, ep) AS (VALUES ('src0', 2.5), ('src1', 0.4)),
        |d AS (SELECT doc_id, dd.source, coalesce(ep, 1.0) AS ep,
        |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
        |          / 268435456.0 AS u
        |      FROM documents dd LEFT JOIN e USING (source)),
        |c AS (SELECT doc_id, source,
        |        CAST(floor(ep) + CASE WHEN u < ep - floor(ep) THEN 1 ELSE 0 END
        |          AS INT) AS n
        |      FROM d)
        |SELECT doc_id, source, CAST(epoch AS INT) AS epoch
        |FROM (SELECT doc_id, source, unnest(generate_series(1, n)) AS epoch FROM c)
        |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      TextQuality.epochMixture(Tables.documents(s, dir), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.4))
        .orderBy("doc_id", "epoch")
    }

    // ---- rendezvous shard assignment ----------------------------------

    // Highest-random-weight hashing: doc -> argmax_j md5(id ":" j),
    // ties to the smallest shard.
    q("q_rendezvous_shards",
      """WITH c AS (SELECT doc_id, j,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(j AS VARCHAR)), 1, 7) AS BIGINT) AS h
        |  FROM documents, (SELECT unnest(generate_series(0, 7)) AS j)),
        |r AS (SELECT doc_id, j,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, j) AS rn
        |      FROM c)
        |SELECT doc_id, CAST(j AS INT) AS shard FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Packing.rendezvousShard(
          Tables.documents(s, dir).select("doc_id"), "doc_id", numShards = 8)
        .orderBy("doc_id")
    }

    // Consistent-hashing stability: growing 8 -> 9 shards, the movement
    // matrix has mass only on the diagonal and in the shard_new = 8
    // column — no row ever relocates between existing shards.
    q("q_rendezvous_stability",
      """WITH c AS (SELECT doc_id, n, j,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(j AS VARCHAR)), 1, 7) AS BIGINT) AS h
        |  FROM documents,
        |       (SELECT 8 AS n, unnest(generate_series(0, 7)) AS j
        |        UNION ALL
        |        SELECT 9 AS n, unnest(generate_series(0, 8)) AS j)),
        |r AS (SELECT doc_id, n, j,
        |        row_number() OVER (PARTITION BY doc_id, n ORDER BY h DESC, j) AS rn
        |      FROM c),
        |a AS (SELECT doc_id,
        |        max(CASE WHEN n = 8 THEN j END) AS shard_old,
        |        max(CASE WHEN n = 9 THEN j END) AS shard_new
        |      FROM r WHERE rn = 1 GROUP BY doc_id)
        |SELECT CAST(shard_old AS INT) AS shard_old,
        |  CAST(shard_new AS INT) AS shard_new, count(*) AS n_docs
        |FROM a GROUP BY 1, 2 ORDER BY shard_old, shard_new""".stripMargin) { (s, dir) =>
      import graft.operators.Packing
      val ids = Tables.documents(s, dir).select("doc_id")
      Packing.rendezvousShard(
          Packing.rendezvousShard(ids, "doc_id", 8, "shard_old"),
          "doc_id", 9, "shard_new")
        .groupBy("shard_old", "shard_new").agg(count(lit(1)).as("n_docs"))
        .orderBy("shard_old", "shard_new")
    }

    // ---- Zipf-slope corpus diagnostic ---------------------------------

    q("q_zipf_slope",
      """WITH wc AS (SELECT w, count(*) AS c
        |            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |            GROUP BY 1),
        |top AS (SELECT w, c FROM wc ORDER BY c DESC, w LIMIT 100),
        |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS x,
        |        ln(CAST(c AS DOUBLE)) AS y FROM top),
        |a AS (SELECT count(*) AS n_top, sum(x) AS sx, sum(y) AS sy,
        |        sum(x * y) AS sxy, sum(x * x) AS sxx FROM r)
        |SELECT CAST(n_top AS BIGINT) AS n_top,
        |  round((n_top * sxy - sx * sy) / (n_top * sxx - sx * sx), 9) AS slope,
        |  round((sy - ((n_top * sxy - sx * sy) / (n_top * sxx - sx * sx)) * sx)
        |    / n_top, 9) AS intercept
        |FROM a""".stripMargin) { (s, dir) =>
      TextQuality.zipfSlope(Tables.documents(s, dir), "text", topN = 100)
    }

    // ---- exact heavy hitters (two-pass Misra-Gries) -------------------

    // phi = 2/1000 of the corpus token stream; MG(512) per-partition
    // candidate pruning, then an exact recount of candidates only. The
    // result is EXACT (the sketch is a superset pruner), so the oracle
    // is the plain SQL frequent-items query.
    q("q_frequent_items",
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
        |              FROM documents),
        |t AS (SELECT token FROM toks WHERE token <> ''),
        |tot AS (SELECT count(*) AS n FROM t)
        |SELECT token, count(*) AS cnt
        |FROM t, tot GROUP BY token, n
        |HAVING count(*) * 1000 >= n * 2
        |ORDER BY cnt DESC, token""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      Sketches.frequentTokens(toks, "token", num = 2, denom = 1000, k = 512)
        .orderBy(col("cnt").desc, col("token"))
    }

    // ---- URL canonicalization + per-domain crawl stats ----------------

    // URLs synthesized deterministically per doc (mixed-case scheme and
    // host, optional www., rotating TLD, optional trailing slash,
    // tracking params, optional fragment) — both engines build the same
    // string, the oracle replays the parse regex-for-regex.
    val urlSynthSql =
      """'HTTPS://' ||
        |      CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
        |      'Site' || (doc_id % 50) || '.' ||
        |      (['com', 'org', 'net'])[CAST(doc_id % 3 AS INT) + 1] ||
        |      '/docs/' || doc_id ||
        |      CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
        |      '?id=' || doc_id || '&utm_source=feed' ||
        |      CASE WHEN doc_id % 2 = 0 THEN '&ref=abc' ELSE '' END ||
        |      CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END""".stripMargin
    val urlParseSql =
      s"""u AS (SELECT doc_id, $urlSynthSql AS url FROM documents),
         |p AS (SELECT doc_id, url,
         |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(url,
         |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\\.', '') AS host,
         |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
         |    regexp_extract(url, '\\?([^#]*)', 1) AS query_string
         |  FROM u),
         |q AS (SELECT doc_id, url, scheme, host,
         |    regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
         |    regexp_extract(host, '\\.([^.]+)$$', 1) AS tld,
         |    path, query_string,
         |    array_to_string(list_filter(string_split(query_string, '&'),
         |      x -> NOT (starts_with(x, 'utm_') OR starts_with(x, 'fbclid=')
         |        OR starts_with(x, 'gclid=') OR starts_with(x, 'ref=')
         |        OR x = '')), '&') AS cq,
         |    regexp_replace(path, '/$$', '') AS cp
         |  FROM p),
         |parsed AS (SELECT doc_id, scheme, host, domain, tld, path, query_string,
         |    scheme || '://' || host || cp ||
         |      CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS url_canonical
         |  FROM q)""".stripMargin

    def synthUrl = concat(
      lit("HTTPS://"),
      when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
      lit("Site"), (col("doc_id") % 50).cast("string"), lit("."),
      element_at(typedLit(Seq("com", "org", "net")),
        (col("doc_id") % 3 + 1).cast("int")),
      lit("/docs/"), col("doc_id").cast("string"),
      when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
      lit("?id="), col("doc_id").cast("string"), lit("&utm_source=feed"),
      when(col("doc_id") % 2 === 0, lit("&ref=abc")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))

    q("q_url_parse",
      s"""WITH $urlParseSql
         |SELECT * FROM parsed ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.TextExtract
      TextExtract.parseUrls(
          Tables.documents(s, dir).select(col("doc_id"), synthUrl.as("url")),
          "url")
        .drop("url")
        .orderBy("doc_id")
    }

    q("q_domain_stats",
      s"""WITH $urlParseSql
         |SELECT domain,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         |  CAST(count(DISTINCT tld) AS BIGINT) AS n_tlds
         |FROM parsed GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
      import graft.operators.TextExtract
      TextExtract.parseUrls(
          Tables.documents(s, dir).select(col("doc_id"), synthUrl.as("url")),
          "url")
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("host").as("n_hosts"),
          countDistinct("tld").as("n_tlds"))
        .orderBy("domain")
    }

    // ---- C4 line-level rule filter -------------------------------------

    // Lines synthesized deterministically from the word stream (6-word
    // lines; by (doc_id+i) mod: some get no terminal punctuation, some
    // get a ' javascript.' tail) so all three rules fire. Both engines
    // build the identical line text and replay the identical keep
    // predicate.
    q("q_c4_line_filter",
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |lt AS (SELECT doc_id, array_to_string(list_transform(
        |    generate_series(0, CAST(ceil(len(w) / 6.0) AS INT) - 1),
        |    i -> array_to_string(w[i*6+1 : least(i*6+6, len(w))], ' ') ||
        |         CASE WHEN (doc_id + i) % 7 = 0 THEN ' javascript.'
        |              WHEN (doc_id + i) % 3 = 0 THEN ''
        |              ELSE '.' END), chr(10)) AS ltext
        |  FROM ws),
        |f AS (SELECT doc_id, string_split(ltext, chr(10)) AS ls FROM lt),
        |k AS (SELECT doc_id, ls,
        |    list_filter(ls, l -> len(string_split_regex(l, '\s+')) >= 5
        |      AND (ends_with(l, '.') OR ends_with(l, '!')
        |        OR ends_with(l, '?') OR ends_with(l, '"'))
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM f)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(kept, chr(10)), '') AS text_clean
        |FROM k ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.TextExtract
      val wsa = col("__ws")
      val nLines = ceil(size(wsa) / lit(6.0)).cast("int")
      val lines = transform(sequence(lit(0), nLines - 1), i =>
        concat(array_join(slice(wsa, i * 6 + 1, lit(6)), " "),
          when((col("doc_id") + i) % 7 === 0, lit(" javascript."))
            .when((col("doc_id") + i) % 3 === 0, lit(""))
            .otherwise(lit("."))))
      val synth = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("__ws"))
        .select(col("doc_id"), array_join(lines, "\n").as("ltext"))
      TextExtract.c4FilterLines(synth, "doc_id", "ltext", minWords = 5,
          blocked = Seq("javascript"))
        .orderBy("doc_id")
    }

    // ---- blocklist host filter (UT1-style domain blocking) ------------

    // Hosts keep their www. prefix here (no canonicalization), so
    // blocking 'site9.com' must also drop 'www.site9.com' — the
    // subdomain-suffix semantics the operator implements. Both engines
    // build the same host string and the same ≥2-label suffix sets.
    q("q_blocklist",
      s"""WITH u AS (SELECT doc_id,
         |    lower(regexp_extract($urlSynthSql, '://([^/?#]*)', 1)) AS host
         |  FROM documents),
         |b(bh) AS (VALUES ('site9.com'), ('site10.net'), ('site11.org'),
         |                 ('site0.com')),
         |suf AS (SELECT doc_id,
         |    unnest(list_transform(
         |      generate_series(1, len(string_split(host, '.')) - 1),
         |      i -> array_to_string(string_split(host, '.')[i:], '.'))) AS s
         |  FROM u),
         |blocked AS (SELECT DISTINCT doc_id FROM suf JOIN b ON s = bh)
         |SELECT u.doc_id, u.host FROM u
         |ANTI JOIN blocked USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.TextExtract
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          lower(regexp_extract(synthUrl, "://([^/?#]*)", 1)).as("host"))
      val blocklist = Seq("site9.com", "site10.net", "site11.org",
        "site0.com").toDF("host")
      TextExtract.filterBlockedHosts(docs, "doc_id", "host", blocklist)
        .orderBy("doc_id")
    }

    // ---- per-domain document cap (C4/RefinedWeb curation rule) --------

    // Keep the `cap` longest docs per domain (n_chars as the quality
    // proxy), rank exposed. The Spark side is the bounded graft_top_k
    // aggregate per domain — never a rank window over a potentially
    // corpus-sized domain partition; the oracle replays the identical
    // (score desc, id asc) order with a window, equal by construction.
    q("q_domain_cap",
      s"""WITH $urlParseSql,
         |j AS (SELECT p.domain, p.doc_id, d.n_chars
         |      FROM parsed p JOIN documents d USING (doc_id)),
         |r AS (SELECT domain, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY domain
         |          ORDER BY n_chars DESC, doc_id) AS rn
         |      FROM j)
         |SELECT domain, doc_id, n_chars, CAST(rn AS INT) AS rn
         |FROM r WHERE rn <= 2 ORDER BY domain, rn""".stripMargin) { (s, dir) =>
      import graft.operators.TextExtract
      val parsed = TextExtract.parseUrls(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"), synthUrl.as("url")), "url")
      TextExtract.capPerDomain(parsed, "doc_id", "domain", "n_chars", cap = 2)
        .orderBy("domain", "rn")
    }

    // ---- within-doc consecutive-duplicate-line removal (C4 rule) ------

    // Input synthesized by doubling every sentence: [s1,s1,s2,s2,...];
    // the operator keeps line i iff it differs from line i-1, so the
    // output restores the original sentence stream (modulo originally-
    // adjacent identical sentences, which both engines collapse alike).
    q("q_line_dedup_consecutive",
      """WITH raw AS (SELECT doc_id,
        |    flatten(list_transform(string_split(text, '. '), x -> [x, x])) AS ls
        |  FROM documents),
        |d AS (SELECT doc_id, ls,
        |    list_filter(ls, (x, i) -> i = 1 OR x <> ls[i - 1]) AS kept
        |  FROM raw)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  array_to_string(kept, chr(10)) AS text_clean
        |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.TextExtract
      val doubled = Tables.documents(s, dir).select(col("doc_id"),
        array_join(
          flatten(transform(split(col("text"), "\\. "), x => array(x, x))),
          "\n").as("text"))
      TextExtract.dedupConsecutiveLines(doubled, "doc_id", "text")
        .orderBy("doc_id")
    }

    // ---- HTML text extraction / boilerplate scoring -------------------

    // Pages are synthesized deterministically from the documents table
    // (entity-encoded body, nav links replicated doc_id%4+1 times, a
    // script whose body contains a decoy </p>); both engines build the
    // identical page string, then the oracle replays the extraction
    // regex-for-regex. Exercises: script/style/comment stripping before
    // tag parsing, block-tag newline structure, entity decode order
    // (&amp; last), anchor-text link density.
    // Oracle CTE stack for the html extraction replay — SHARED
    // verbatim by q_html_extract and q_crawl_e2e (no copies).
    val htmlExtractCtes =
      """page AS (SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id || ' &amp; ' || source ||
        |    '</title><style>p{margin:0}</style></head><body><h1>Doc ' || doc_id ||
        |    '</h1><!-- generated --><p>' ||
        |    replace(replace(replace(replace(text,
        |      '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;') ||
        |    '</p>' ||
        |    repeat('<a href="/nav">site &amp; nav</a>', CAST(doc_id % 4 + 1 AS INT)) ||
        |    '<script type="text/javascript">if (1 < 2) { x = "</p>"; }</script>' ||
        |    '</body></html>' AS html
        |  FROM documents),
        |s AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
        |        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |        '(?s)<!--.*?-->', ' ', 'g') AS nh, html FROM page),
        |v AS (SELECT doc_id, html, nh,
        |    trim(regexp_replace(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(nh,
        |          '(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)[^>]*>',
        |          chr(10), 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |      '[ \t]+', ' ', 'g'), ' ?\n[ \n]*', chr(10), 'g'),
        |      ' ' || chr(10)) AS text_clean
        |  FROM s),
        |o AS (SELECT doc_id,
        |    trim(replace(replace(replace(replace(replace(replace(
        |      regexp_replace(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&')) AS title,
        |    text_clean,
        |    CAST(length(text_clean) AS BIGINT) AS n_chars,
        |    CAST(length(replace(
        |      trim(regexp_replace(regexp_replace(
        |        replace(replace(replace(replace(replace(replace(
        |          regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |            array_to_string(
        |              regexp_extract_all(nh, '(?is)<a[^>]*>(.*?)</a>', 1), chr(10)),
        |            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |            '(?s)<!--.*?-->', ' ', 'g'),
        |            '(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)[^>]*>',
        |            chr(10), 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |        '&nbsp;', ' '), '&amp;', '&'),
        |        '[ \t]+', ' ', 'g'), ' ?\n[ \n]*', chr(10), 'g'),
        |        ' ' || chr(10)),
        |      chr(10), '')) AS BIGINT) AS link_chars
        |  FROM v)""".stripMargin

    q("q_html_extract",
      s"""WITH $htmlExtractCtes
        |SELECT doc_id, title, text_clean, n_chars, link_chars,
        |  CAST(link_chars AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0)
        |    AS link_density,
        |  CAST(link_chars AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) > 0.05
        |    AS is_boilerplate
        |FROM o ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.TextExtract
      val d = Tables.documents(s, dir)
      val page = htmlPage
      TextExtract.extractHtml(
          d.select(col("doc_id"), page.as("html")), "doc_id", "html",
          linkDensityMax = 0.05)
        .orderBy("doc_id")
    }

    // ---- crawl front-door e2e -----------------------------------------

    // The composed ingest gate: URL parse (domain key) + HTML extraction
    // (boilerplate verdict) -> per-(domain, verdict) corpus stats. Both
    // CTE stacks are the SHARED vals above, so this oracle can never
    // drift from q_url_parse / q_html_extract.
    q("q_crawl_e2e",
      s"""WITH $urlParseSql,
         |$htmlExtractCtes,
         |gate AS (SELECT doc_id, n_chars, link_chars,
         |    CAST(link_chars AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0)
         |      > 0.05 AS is_boilerplate
         |  FROM o)
         |SELECT domain, is_boilerplate,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(link_chars) AS BIGINT) AS total_link_chars
         |FROM parsed JOIN gate USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.operators.TextExtract
      val d = Tables.documents(s, dir)
      val parsed = TextExtract.parseUrls(
          d.select(col("doc_id"), synthUrl.as("url")), "url")
        .select(col("doc_id"), col("domain"))
      val extracted = TextExtract.extractHtml(
          d.select(col("doc_id"), htmlPage.as("html")), "doc_id", "html",
          linkDensityMax = 0.05)
        .select(col("doc_id"), col("n_chars"), col("link_chars"),
          col("is_boilerplate"))
      parsed.join(extracted, Seq("doc_id"))
        .groupBy("domain", "is_boilerplate")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          sum("link_chars").as("total_link_chars"))
        .orderBy("domain", "is_boilerplate")
    }

    // ---- host-graph PageRank ------------------------------------------

    // Host-level PageRank over a deterministic doc_id-derived link
    // graph (40 hosts, 2 out-links per page, self-loops dropped):
    // operators.GraphOps.pageRank, 5 power iterations, damping 0.85,
    // dangling mass redistributed uniformly. The oracle unrolls the
    // identical 5 iterations (same IEEE constants via CAST(...AS
    // DOUBLE), same coalesce/dangling structure), so ranks agree to
    // the summation-association ulp, far inside round(6).
    {
      val one = "CAST(1.0 AS DOUBLE)"
      val dmp = "CAST(0.85 AS DOUBLE)"
      val zero = "CAST(0.0 AS DOUBLE)"
      val iterCtes = (1 to 5).map { i =>
        val p = s"r${i - 1}"
        s"""dg$i AS (SELECT coalesce(sum(pr), $zero) AS dang
           |        FROM $p WHERE odeg IS NULL),
           |c$i AS (SELECT e.dst AS node, sum($p.pr / $p.odeg) AS contrib
           |       FROM e JOIN $p ON e.src = $p.node GROUP BY 1),
           |r$i AS (SELECT deg.node, deg.odeg,
           |         ($one - $dmp) / nn.n + $dmp *
           |           (coalesce(c$i.contrib, $zero) + dg$i.dang / nn.n) AS pr
           |       FROM deg LEFT JOIN c$i ON deg.node = c$i.node, nn, dg$i)"""
          .stripMargin
      }.mkString(",\n")
      q("q_pagerank",
        s"""WITH e0 AS (SELECT doc_id % 40 AS src, (doc_id * 17 + 13) % 40 AS dst
          |           FROM documents
          |           UNION
          |           SELECT doc_id % 40, (doc_id * 17 + 26) % 40 FROM documents),
          |e AS (SELECT src, dst FROM e0 WHERE src <> dst),
          |nodes AS (SELECT DISTINCT src AS node FROM e
          |          UNION SELECT DISTINCT dst FROM e),
          |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
          |odegs AS (SELECT src, CAST(count(*) AS DOUBLE) AS odeg
          |          FROM e GROUP BY 1),
          |deg AS (SELECT node, odeg FROM nodes LEFT JOIN odegs ON node = src),
          |r0 AS (SELECT node, odeg, $one / nn.n AS pr FROM deg, nn),
          |$iterCtes
          |SELECT node, round(pr, 6) AS pr FROM r5 ORDER BY node""".stripMargin) {
        (s, dir) =>
        import graft.operators.GraphOps
        val docs = Tables.documents(s, dir)
        def link(off: Int) = docs.select((col("doc_id") % 40).as("src"),
          ((col("doc_id") * 17 + off) % 40).as("dst"))
        GraphOps.pageRank(link(13).unionByName(link(26)), "src", "dst",
            iters = 5, damping = 0.85)
          .select(col("node"), round(col("pr"), 6).as("pr"))
          .orderBy("node")
      }
    }

    // ---- categorical association report --------------------------------

    // χ² / Cramér's V / mutual information between source and lang
    // (operators.Analytics.associationReport): the mix-design sanity
    // check — is language balanced across sources, or does one source
    // carry a language? Full contingency grid incl. structural zeros;
    // margins broadcast; everything bounded by category cardinality.
    q("q_cat_association",
      """WITH c AS (SELECT source, lang, count(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |ra AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
        |ca AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    (SELECT count(*) FROM ra) AS na,
        |    (SELECT count(*) FROM ca) AS nb FROM c),
        |grid AS (SELECT ra.rt, ca.ct, coalesce(c.o, CAST(0 AS BIGINT)) AS o
        |  FROM ra CROSS JOIN ca
        |  LEFT JOIN c ON c.source = ra.source AND c.lang = ca.lang),
        |agg AS (SELECT
        |    sum((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |        / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |        / CAST(n AS DOUBLE))
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)))
        |      AS chi2r,
        |    sum(CASE WHEN o > 0 THEN
        |      CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
        |        * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
        |          / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))
        |      ELSE 0.0 END) AS mir,
        |    min(n) AS n, min(na) AS na, min(nb) AS nb
        |  FROM grid, tot)
        |SELECT round(chi2r, 9) + CAST(0 AS DOUBLE) AS chi2,
        |  CAST((na - 1) * (nb - 1) AS BIGINT) AS dof,
        |  round(sqrt(chi2r / (CAST(n AS DOUBLE)
        |    * CAST(least(na - 1, nb - 1) AS DOUBLE))), 9)
        |    + CAST(0 AS DOUBLE) AS cramers_v,
        |  round(mir, 9) + CAST(0 AS DOUBLE) AS mi_nats,
        |  CAST(n AS BIGINT) AS n_rows
        |FROM agg""".stripMargin) { (s, dir) =>
      graft.operators.Analytics.associationReport(
        Tables.documents(s, dir), "source", "lang")
    }

    // ---- prefix-filtered set-similarity join --------------------------

    // AllPairs/PPJoin prefix filter (TextDedup.prefixFilterJoin): exact
    // Jaccard ≥ t pairs where docs join only on their rarest
    // m − ⌈t·m⌉ + 1 set elements — hot elements sort last and never
    // become join keys, so candidate volume tracks rare postings, not
    // the skewed ones. Elements are word 3-gram shingles: the corpus
    // vocabulary is 31 words (every word hot — word sets would
    // degenerate to 88.8M candidates at sf0.1; shingles measured 312K).
    // The oracle replays the identical df-ordered prefix, length
    // filter, and exact set verify.
    q("q_prefix_filter_join",
      """WITH words AS (SELECT doc_id AS id, string_split(text, ' ') AS ws
        |  FROM documents),
        |sh AS (SELECT DISTINCT id,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
        |  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)),
        |toks AS (SELECT DISTINCT id,
        |    CAST('0x' || substr(md5(sh), 1, 7) AS BIGINT) AS tok FROM sh),
        |dfq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
        |ranked AS (SELECT id, tok,
        |    row_number() OVER (PARTITION BY id ORDER BY df, tok) AS p,
        |    count(*) OVER (PARTITION BY id) AS m
        |  FROM toks JOIN dfq USING (tok)),
        |prefix AS (SELECT id, tok, m FROM ranked
        |  WHERE p <= m - CAST(ceil(CAST(0.6 AS DOUBLE) * m) AS BIGINT) + 1),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.m AS m_a, b.m AS m_b
        |  FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.id < b.id
        |  WHERE CAST(0.6 AS DOUBLE) * CAST(greatest(a.m, b.m) AS DOUBLE)
        |        <= CAST(least(a.m, b.m) AS DOUBLE)),
        |sets AS (SELECT id, list(tok) AS ts FROM toks GROUP BY 1),
        |v AS (SELECT id_a, id_b, m_a, m_b,
        |    len(list_intersect(sa.ts, sb.ts)) AS inter
        |  FROM cand
        |  JOIN sets sa ON sa.id = id_a JOIN sets sb ON sb.id = id_b)
        |SELECT id_a, id_b, m_a, m_b,
        |  inter / (m_a + m_b - inter) AS jaccard
        |FROM v WHERE inter / (m_a + m_b - inter) >= CAST(0.6 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      TextDedup.prefixFilterJoin(Tables.documents(s, dir),
          "doc_id", "text", threshold = 0.6, ngram = 3)
        .orderBy("id_a", "id_b")
    }

    // Bounded-slice twin of q_prefix_filter_join (sf1 strict-gate
    // protocol): universe capped at doc_id < 5000 in both engines — a
    // no-op at sf <= 0.1, tractable at sf1 where the unsliced oracle's
    // prefix-candidate verify costs 119 s.
    q("q_prefix_filter_join_sliced",
      """WITH words AS (SELECT doc_id AS id, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id < 5000),
        |sh AS (SELECT DISTINCT id,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
        |  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)),
        |toks AS (SELECT DISTINCT id,
        |    CAST('0x' || substr(md5(sh), 1, 7) AS BIGINT) AS tok FROM sh),
        |dfq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
        |ranked AS (SELECT id, tok,
        |    row_number() OVER (PARTITION BY id ORDER BY df, tok) AS p,
        |    count(*) OVER (PARTITION BY id) AS m
        |  FROM toks JOIN dfq USING (tok)),
        |prefix AS (SELECT id, tok, m FROM ranked
        |  WHERE p <= m - CAST(ceil(CAST(0.6 AS DOUBLE) * m) AS BIGINT) + 1),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.m AS m_a, b.m AS m_b
        |  FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.id < b.id
        |  WHERE CAST(0.6 AS DOUBLE) * CAST(greatest(a.m, b.m) AS DOUBLE)
        |        <= CAST(least(a.m, b.m) AS DOUBLE)),
        |sets AS (SELECT id, list(tok) AS ts FROM toks GROUP BY 1),
        |v AS (SELECT id_a, id_b, m_a, m_b,
        |    len(list_intersect(sa.ts, sb.ts)) AS inter
        |  FROM cand
        |  JOIN sets sa ON sa.id = id_a JOIN sets sb ON sb.id = id_b)
        |SELECT id_a, id_b, m_a, m_b,
        |  inter / (m_a + m_b - inter) AS jaccard
        |FROM v WHERE inter / (m_a + m_b - inter) >= CAST(0.6 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      TextDedup.prefixFilterJoin(
          Tables.documents(s, dir).filter(col("doc_id") < 5000),
          "doc_id", "text", threshold = 0.6, ngram = 3)
        .orderBy("id_a", "id_b")
    }

    // ---- content-defined chunk dedup ----------------------------------

    // FastCDC-family chunking (TextDedup.cdcChunks): boundaries where a
    // base-2 rolling hash of the trailing 31 chars hits the 2^5 mask, so
    // shared passages re-align on the same chunks regardless of byte
    // offset; dedup attributes each chunk hash to its earliest owner.
    // Pure integer arithmetic — the oracle recomputes the identical
    // recurrence h = (2h + (unicode·2654435761 mod 2³¹)) mod 2³¹ in a
    // recursive CTE over character positions.
    q("q_cdc_chunks",
      """WITH RECURSIVE pos AS (
        |  SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE length(text) >= 1),
        |r AS (
        |  SELECT doc_id, 1 AS i,
        |    (unicode(substr(text, 1, 1)) * 2654435761) % 2147483648 AS h
        |  FROM pos
        |  UNION ALL
        |  SELECT r.doc_id, r.i + 1,
        |    ((2 * r.h) + ((unicode(substr(p.text, r.i + 1, 1)) * 2654435761)
        |      % 2147483648)) % 2147483648
        |  FROM r JOIN pos p ON p.doc_id = r.doc_id WHERE r.i < p.n),
        |cuts AS (SELECT DISTINCT doc_id, b FROM (
        |    SELECT doc_id, 0 AS b FROM pos
        |    UNION ALL SELECT doc_id, i AS b FROM r WHERE h % 32 = 0
        |    UNION ALL SELECT doc_id, n AS b FROM pos)),
        |ck AS (SELECT doc_id, b AS b0,
        |    lead(b) OVER (PARTITION BY doc_id ORDER BY b) AS b1 FROM cuts),
        |chunks AS (SELECT c.doc_id,
        |    substr(p.text, c.b0 + 1, c.b1 - c.b0) AS chunk
        |  FROM ck c JOIN pos p ON p.doc_id = c.doc_id
        |  WHERE c.b1 IS NOT NULL),
        |own AS (SELECT md5(chunk) AS ch, min(doc_id) AS owner
        |  FROM chunks GROUP BY 1),
        |j AS (SELECT doc_id, chunk, owner
        |  FROM chunks JOIN own ON md5(chunk) = own.ch)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  round(CAST(sum(CASE WHEN owner < doc_id THEN length(chunk)
        |      ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(length(chunk)) AS DOUBLE), 9) + CAST(0 AS DOUBLE)
        |    AS dup_char_frac
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextDedup.cdcDedupReport(Tables.documents(s, dir),
          "doc_id", "text", maskBits = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }
  }
}
