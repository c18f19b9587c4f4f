#!/usr/bin/env python3
"""Deterministic scale/realism test data for the round-14 validation runs.

Two outputs (both OUTSIDE the repo, regenerable at will):

  sf1   — 10x sf0.1, built by replicating each table 10 times with key
          offsets. This preserves every marginal distribution and the
          per-key group sizes exactly (each orderkey still has the same
          lineitem fan-in, each partkey the same popularity), which is
          how TPC-H itself scales: entity counts grow, per-entity shape
          doesn't. Documents get a per-copy word perturbation (so the
          near-dup structure grows instead of collapsing into 10-way
          exact-dup cliques); embeddings get a tiny deterministic
          component jitter (cluster structure preserved).

  zipf0.1 — a REALISTIC-vocabulary documents table at sf0.1 volume
          (5000 docs, same word-count distribution) over a 50k-word
          Zipf(s=1.07) vocabulary, with ~5% planted near-duplicates
          (90% word overlap with their source doc). The stock corpora
          have a 31-word vocabulary — the degenerate regime that melts
          token-keyed candidate generation (r12: 88.8M candidates);
          this corpus is the regime the candidate-count claims must
          hold in. Other tables are copied from sf0.1 so the dir is a
          drop-in SPARK_GRAFT_SF_DIR.

  xdup01 — an EXACT-duplicate bed: sf0.1 documents replicated 10x
          VERBATIM under shifted doc_ids (10-copy exact clouds). The
          r18 hygiene-funnel A/B bed: the funnel's exact-dup stage 0
          must make the pipeline FASTER here (clouds collapse before
          winnow/purge pay for them). documents.parquet only.

Usage: python3 scripts/gen_scale_data.py [outroot]   (default /tmp/graft_scale)
Seed is fixed; output is byte-stable across runs.
"""
import hashlib
import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale")
COPIES = 10
VOCAB_SIZE = 50_000
ZIPF_S = 1.07
SEED = 20260815

LETTERS = "abcdefghijklmnopqrstuvwxyz"


def det_word(rank: int) -> str:
    """Deterministic pseudo-word for vocabulary rank (len 2-12, md5-driven)."""
    h = hashlib.md5(f"w{rank}".encode()).digest()
    n = 2 + h[0] % 11
    return "".join(LETTERS[h[1 + i % 14] % 26] for i in range(n))


def gen_sf1(con: duckdb.DuckDBPyConnection) -> None:
    out = OUT / "sf1"
    out.mkdir(parents=True, exist_ok=True)
    for t in ["region", "nation"]:  # TPC-H does not scale these
        shutil.copy(SRC / f"{t}.parquet", out / f"{t}.parquet")

    def mx(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col})+1 FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]

    nc, ns, np_, no, ne, nu, nd, nv = (
        mx("customer", "c_custkey"), mx("supplier", "s_suppkey"),
        mx("part", "p_partkey"), mx("orders", "o_orderkey"),
        mx("events", "event_id"), mx("events", "user_id"),
        mx("documents", "doc_id"), mx("embeddings", "vec_id"))

    copies = f"(SELECT unnest(range({COPIES})) AS i)"

    def emit(table: str, select: str) -> None:
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet'), "
            f"{copies} ORDER BY i) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"  sf1/{table}.parquet", flush=True)

    emit("customer",
         f"c_custkey + i*{nc} AS c_custkey, "
         f"'Customer#' || lpad(CAST(c_custkey + i*{nc} AS VARCHAR), 9, '0') AS c_name, "
         "c_nationkey, c_acctbal, c_mktsegment")
    emit("supplier",
         f"s_suppkey + i*{ns} AS s_suppkey, "
         f"'Supplier#' || lpad(CAST(s_suppkey + i*{ns} AS VARCHAR), 9, '0') AS s_name, "
         "s_nationkey, s_acctbal")
    emit("part",
         f"p_partkey + i*{np_} AS p_partkey, p_name, p_brand, p_type, p_size, "
         "p_retailprice")
    emit("orders",
         f"o_orderkey + i*{no} AS o_orderkey, o_custkey + i*{nc} AS o_custkey, "
         "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    emit("lineitem",
         f"l_orderkey + i*{no} AS l_orderkey, l_partkey + i*{np_} AS l_partkey, "
         f"l_suppkey + i*{ns} AS l_suppkey, l_linenumber, l_quantity, "
         "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
         "l_shipdate")
    emit("events",
         f"event_id + i*{ne} AS event_id, ts, user_id + i*{nu} AS user_id, "
         "event_type, value, props")
    # documents: copy 0 verbatim; copies 1..9 swap one word per 16-word
    # stretch for a deterministic, position-hashed replacement — keeps
    # ~94% overlap with the original (a realistic near-dup cloud that
    # grows with SF) instead of 10-way exact-dup cliques.
    vocab31 = con.execute(
        f"SELECT list(DISTINCT w) FROM (SELECT unnest(split(text,' ')) AS w "
        f"FROM read_parquet('{SRC}/documents.parquet'))").fetchone()[0]
    vl = "[" + ",".join("'" + w + "'" for w in sorted(vocab31)) + "]"
    emit("documents",
         f"doc_id + i*{nd} AS doc_id, "
         "CASE WHEN i = 0 THEN text ELSE array_to_string("
         "  list_transform(split(text, ' '), (w, j) -> "
         f"   CASE WHEN (j + doc_id*7 + i*13) % 16 = 0 THEN {vl}[1 + (hash(doc_id*31 + i*7 + j) % 31)::INT] "
         "    ELSE w END), ' ') END AS text, "
         "lang, source, "
         "CASE WHEN i = 0 THEN n_chars ELSE NULL END AS n_chars_raw")
    # n_chars must stay consistent with the perturbed text
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, "
        f"CAST(coalesce(n_chars_raw, length(text)) AS BIGINT) AS n_chars "
        f"FROM read_parquet('{out}/documents.parquet')) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)")
    emit("embeddings",
         f"vec_id + i*{nv} AS vec_id, "
         "CASE WHEN i = 0 THEN embedding ELSE "
         "  list_transform(embedding, (x, j) -> CAST(x + "
         "    ((hash(vec_id*977 + i*31 + j) % 1000) / 1000.0 - 0.4995) * 0.02 "
         "  AS FLOAT)) END AS embedding, label")


def gen_zipf(con: duckdb.DuckDBPyConnection, factor: int = 1,
             name: str = "zipf0.1") -> None:
    """Zipf-vocabulary documents at `factor`× sf0.1 doc count; other
    tables copied from sf0.1 (factor 1) or sf1 (factor 10) so the dir
    is a drop-in SPARK_GRAFT_SF_DIR."""
    out = OUT / name
    out.mkdir(parents=True, exist_ok=True)
    tsrc = SRC if factor == 1 else OUT / "sf1"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(tsrc / f"{t}.parquet", out / f"{t}.parquet")

    # word-count distribution of the stock corpus, per doc, tiled factor×
    base = con.execute(
        f"SELECT doc_id, len(split(text,' ')), lang, source "
        f"FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id").fetchall()
    nb = len(base)
    rows = [(r[0] + c * nb, r[1], r[2], r[3])
            for c in range(factor) for r in base]
    rng = np.random.RandomState(SEED)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    probs /= probs.sum()
    vocab = np.array([det_word(r) for r in range(VOCAB_SIZE)], dtype=object)

    texts: list[str] = []
    n_docs = len(rows)
    for doc_id, n_words, lang, source in rows:
        if doc_id % nb >= nb * 0.95 and texts:
            # planted near-dup: clone an earlier doc, replace ~10% of words
            src_doc = int(rng.randint(0, len(texts)))
            words = texts[src_doc].split(" ")
            n_swap = max(1, len(words) // 10)
            pos = rng.choice(len(words), size=min(n_swap, len(words)),
                             replace=False)
            repl = vocab[rng.choice(VOCAB_SIZE, size=len(pos), p=probs)]
            for p, w in zip(pos, repl):
                words[p] = w
            texts.append(" ".join(words))
        else:
            idx = rng.choice(VOCAB_SIZE, size=max(1, n_words), p=probs)
            texts.append(" ".join(vocab[idx]))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, out / "documents.parquet")
    n_vocab_used = len({w for t in texts for w in t.split(" ")})
    print(f"  {name}/documents.parquet ({len(texts)} docs, "
          f"{n_vocab_used} distinct words)", flush=True)


def gen_xdup(con: duckdb.DuckDBPyConnection) -> None:
    out = OUT / "xdup01"
    out.mkdir(parents=True, exist_ok=True)
    nd = con.execute(
        f"SELECT max(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    con.execute(
        f"COPY (SELECT doc_id + i*{nd} AS doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{SRC}/documents.parquet'), "
        f"(SELECT unnest(range({COPIES})) AS i) ORDER BY 1) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"  xdup01/documents.parquet", flush=True)


def main() -> None:
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    print("generating sf1 ...", flush=True)
    gen_sf1(con)
    print("generating zipf0.1 ...", flush=True)
    gen_zipf(con)
    print("generating zipf1 ...", flush=True)
    gen_zipf(con, factor=10, name="zipf1")
    print("generating xdup01 ...", flush=True)
    gen_xdup(con)
    print("done", flush=True)


if __name__ == "__main__":
    main()
