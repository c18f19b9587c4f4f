#!/usr/bin/env python3
"""Candidate-volume probe for the token/shingle-keyed text operators.

For a documents.parquet, reports the sizes that determine each
candidate-generating operator's cost — BEFORE running the engine
(the r12 rule: probe candidate counts in DuckDB first; the 31-word
stock vocabulary melted the word-token prefix filter to 88.8M pairs).

  shingle_postings_pairs  Σ_h C(n_h,2) over distinct 3-gram shingle
                          hashes — the shared-postings join volume that
                          exact ground truth / ngram-jaccard pay
  lsh_band_pairs          Σ_(band,sig) C(n,2) — banded MinHash
                          candidate pairs (k=16, r=4, the registry
                          configuration)
  winnow_fp_pairs         Σ_fp C(n_fp,2) over winnow fingerprints
                          (k=3, w=4) — winnowOverlap's join volume
  prefix_word_pairs       PPJoin candidate pairs at t=0.8 with WORD
                          tokens (the degenerate regime)
  prefix_sh3_pairs        same with 3-gram shingle elements (shipped)

Usage: python3 scripts/candidate_probe.py <documents.parquet> [label]
"""
import sys
import time

import duckdb

path = sys.argv[1]
label = sys.argv[2] if len(sys.argv) > 2 else path

con = duckdb.connect()
con.execute("SET threads TO 16")
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")

SH = """sh AS (SELECT DISTINCT doc_id,
         CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 7)
           AS BIGINT) AS h
       FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i
             FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)))"""


def run(name: str, sql: str) -> None:
    t0 = time.time()
    v = con.execute(sql).fetchone()[0]
    print(f"{label:12s} {name:24s} {v:>15,}   ({time.time()-t0:.1f}s)", flush=True)


run("n_docs", "SELECT count(*) FROM documents")
run("distinct_words", """SELECT count(DISTINCT w) FROM
  (SELECT unnest(string_split(text,' ')) AS w FROM documents)""")
run("shingle_postings_pairs", f"""WITH {SH}
  SELECT CAST(sum(n*(n-1)//2) AS BIGINT) FROM
  (SELECT h, count(*) AS n FROM sh GROUP BY h)""")
run("winnow_fp_pairs", """WITH ws AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
  hs AS (SELECT doc_id, list(CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 7) AS BIGINT) ORDER BY i) AS hl
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM ws)
        GROUP BY doc_id),
  fp AS (SELECT DISTINCT doc_id, list_min(hl[i:i+least(4, len(hl))-1]) AS fp
         FROM (SELECT doc_id, hl, unnest(generate_series(1, len(hl)-least(4,len(hl))+1)) AS i FROM hs))
  SELECT CAST(sum(n*(n-1)//2) AS BIGINT) FROM
  (SELECT fp, count(*) AS n FROM fp GROUP BY fp)""")
# prefix filter: canonical order = ascending global df, prefix size
# m - ceil(0.8*m) + 1
for elems, name in [
    ("SELECT DISTINCT doc_id, w AS e FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)",
     "prefix_word_pairs"),
    (f"WITH {SH} SELECT doc_id, h AS e FROM sh", "prefix_sh3_pairs")]:
    run(name, f"""WITH el AS ({elems}),
      df AS (SELECT e, count(*) AS df FROM el GROUP BY e),
      ranked AS (SELECT doc_id, el.e,
          row_number() OVER (PARTITION BY doc_id ORDER BY df, el.e) AS rk,
          count(*) OVER (PARTITION BY doc_id) AS m
        FROM el JOIN df USING (e)),
      pre AS (SELECT doc_id, e, m FROM ranked
        WHERE rk <= m - CAST(ceil(0.8*m) AS BIGINT) + 1)
      SELECT count(*) FROM pre a JOIN pre b
        ON a.e = b.e AND a.doc_id < b.doc_id
        AND 0.8 * greatest(a.m, b.m) <= least(a.m, b.m)""")
run("lsh_band_pairs", """WITH ws AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
  shd AS (SELECT DISTINCT doc_id,
            CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 7) AS BIGINT) AS h0
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM ws)),
  seeds(i, a, b) AS (SELECT r, 1000003*(r+1) % 2147483647, 998244353*(r+7) % 2147483647
                     FROM (SELECT unnest(generate_series(0,15)) AS r)),
  mh AS (SELECT doc_id, i, min((h0 * a + b) % 2305843009213693951) AS mh
         FROM shd, seeds GROUP BY 1, 2),
  bands AS (SELECT doc_id, i // 4 AS band,
              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
            FROM mh GROUP BY 1, 2)
  SELECT CAST(sum(n*(n-1)//2) AS BIGINT) FROM
  (SELECT band, sig, count(*) AS n FROM bands GROUP BY 1, 2)""")
