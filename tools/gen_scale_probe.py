"""Scale-probe dataset generator (round-5: convert SCALE.md claims into
measurements).

Writes the same table set as TESTDATA.md at TWO scales under a
work dir (default ``/tmp/ontario_scale_probe``; never touches the
read-only ``/root/testdata``):

- ``small/`` — 1×: TPC-H tables + events copied from
  ``/root/testdata/sf0.1``; documents/embeddings REGENERATED at 1× by
  the same process as big/ (so the two probe points share one
  generating process and the ratio is clean).
- ``big/``   — 10×: TPC-H + events tiled 10 copies with key offsets
  (distribution-identical: every per-key group keeps its size, join
  fan-outs are unchanged, group-by cardinalities scale exactly 10×);
  documents/embeddings generated at 10× with IDENTICAL per-row
  duplicate / near-dup rates (pair counts scale ~linearly — the
  property a dedup benchmark must preserve; naive tiling would square
  the duplicate-pair count and measure data growth, not operator
  scaling).

Deterministic (fixed seeds). Pure duckdb + numpy + pyarrow — no Spark
session needed, runs in ~a minute.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ontario_scale_probe"
# small = 1x (sf0.1-sized), big = 10x; pass "huge" as argv[2] to also
# build the 100x tier (~2 GB of parquet, a couple of minutes)
SCALES: dict[str, int] = {"small": 1, "big": 10}
if len(sys.argv) > 2 and sys.argv[2] == "huge":
    SCALES["huge"] = 100

# (table, [key columns to offset per tile copy])
TILED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
COPIED = ["region", "nation"]  # constant dims stay constant at any sf

# key offsets must be consistent ACROSS tables (l_orderkey tiles with
# the same stride as o_orderkey etc.) so joins land within a tile copy
_STRIDE_OF = {
    "l_orderkey": ("orders", "o_orderkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "o_custkey": ("customer", "c_custkey"),
    "c_custkey": ("customer", "c_custkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def tile_tpch(con: duckdb.DuckDBPyConnection, scale: str, tile: int) -> None:
    strides = {
        key: con.sql(
            f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchone()[0]
        for key, (tbl, col) in _STRIDE_OF.items()
    }
    for tbl, keys in TILED.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i * {strides[c]} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"""COPY (SELECT {sel}
                      FROM read_parquet('{SRC}/{tbl}.parquet'), range({tile}) t(i)
                      ORDER BY i)
                TO '{OUT}/{scale}/{tbl}.parquet' (FORMAT PARQUET)"""
        )


# --- documents ----------------------------------------------------------

DUP_RATE = 0.05       # fraction of rows that are near-copies
EXACT_RATE = 0.005    # fraction of rows that are exact copies
POOL_FRAC = 0.01      # dup sources drawn from the first n*POOL_FRAC rows


def gen_documents(n: int, seed: int, path: str, con) -> None:
    rng = np.random.default_rng(seed)
    vocab_rows = con.sql(
        f"""SELECT w, count(*) c FROM (
              SELECT unnest(string_split(text, ' ')) w
              FROM read_parquet('{SRC}/documents.parquet')) GROUP BY w ORDER BY w"""
    ).fetchall()
    vocab = np.array([r[0] for r in vocab_rows])
    freq = np.array([r[1] for r in vocab_rows], dtype=float)
    freq /= freq.sum()
    wc_pop = np.array(
        [
            r[0]
            for r in con.sql(
                f"""SELECT len(string_split(text, ' '))
                    FROM read_parquet('{SRC}/documents.parquet')"""
            ).fetchall()
        ]
    )
    langs, lp = ["en", "zh", "es", "fr", "de"], [0.41, 0.15, 0.15, 0.15, 0.14]
    pool = max(int(n * POOL_FRAC), 1)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i >= pool and r < EXACT_RATE:
            texts.append(texts[rng.integers(0, pool)])
        elif i >= pool and r < EXACT_RATE + DUP_RATE:
            toks = texts[rng.integers(0, pool)].split(" ")
            for _ in range(3):  # small perturbation → near-dup
                toks[rng.integers(0, len(toks))] = vocab[
                    rng.integers(0, len(vocab))
                ]
            texts.append(" ".join(toks))
        else:
            wc = int(wc_pop[rng.integers(0, len(wc_pop))])
            texts.append(" ".join(rng.choice(vocab, size=wc, p=freq)))
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(langs, size=n, p=lp)),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def gen_embeddings(n: int, seed: int, path: str) -> None:
    rng = np.random.default_rng(seed)
    dim, n_labels = 64, 8
    X = rng.standard_normal((n, dim))
    pool = max(int(n * POOL_FRAC), 1)
    is_dup = (rng.random(n) < DUP_RATE) & (np.arange(n) >= pool)
    src = rng.integers(0, pool, n)
    X[is_dup] = X[src[is_dup]] + 0.02 * rng.standard_normal(
        (int(is_dup.sum()), dim)
    )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in X],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(rng.integers(0, n_labels, n), pa.int32()),
        }
    )
    pq.write_table(tbl, path)


def main() -> None:
    for scale in SCALES:
        os.makedirs(f"{OUT}/{scale}", exist_ok=True)
    con = duckdb.connect()
    for scale, tile in SCALES.items():
        if os.path.exists(f"{OUT}/{scale}/embeddings.parquet"):
            print(f"{scale}: exists, skipping")
            continue
        for tbl in COPIED:
            shutil.copyfile(f"{SRC}/{tbl}.parquet", f"{OUT}/{scale}/{tbl}.parquet")
        if tile == 1:
            # tiling at 1× is the identity — copy the real sf0.1 files
            for tbl in TILED:
                shutil.copyfile(
                    f"{SRC}/{tbl}.parquet", f"{OUT}/{scale}/{tbl}.parquet"
                )
        else:
            tile_tpch(con, scale, tile)
        doc_seed = {"small": 421, "big": 422, "huge": 425}[scale]
        emb_seed = {"small": 423, "big": 424, "huge": 426}[scale]
        gen_documents(
            5_000 * tile, doc_seed, f"{OUT}/{scale}/documents.parquet", con
        )
        gen_embeddings(2_000 * tile, emb_seed, f"{OUT}/{scale}/embeddings.parquet")
    for scale in SCALES:
        for f in sorted(os.listdir(f"{OUT}/{scale}")):
            p = f"{OUT}/{scale}/{f}"
            nrows = con.sql(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
            print(f"{scale}/{f}: {nrows} rows, {os.path.getsize(p) >> 10} KiB")


if __name__ == "__main__":
    main()
