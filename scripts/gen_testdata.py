"""Deterministic synthetic-testdata generator for scale experiments.

Reproduces the driver testdata's schema and value domains (see
TESTDATA.md and /root/testdata/sf0.1) at any scale factor, so the
engine can be benchmarked and oracle-checked at sizes the driver does
not ship — e.g. sf1 = 10x the driver's largest.  Row counts, column
types, category sets (mktsegments, order priorities, event types,
langs, sources), value ranges, and structural properties (lines per
order 1-7, events time-ordered over 30 days, ~0.16% exact-dup docs,
label-clustered embeddings) all match the sf0.1 profile measured with
DuckDB; seed=42 makes the output reproducible bit-for-bit.

The output is written OUTSIDE the driver's read-only /root/testdata —
default ``.scratch/sf{sf}`` under the repo root (gitignored).

Usage: python scripts/gen_testdata.py [sf] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["large", "hot", "blue", "old", "cold", "red", "small", "green"]
NOUN = ["ring", "bolt", "plate", "gear", "widget", "rod", "anvil", "cog"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]


def _write(out_dir, name, cols):
    pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"))


def generate(sf: float, out_dir: str, seed: int = 42):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS})
    _write(out_dir, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})

    _write(out_dir, "customer", {
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]})

    _write(out_dir, "supplier", {
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2)})

    _write(out_dir, "part", {
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in zip(
            rng.integers(0, len(ADJ), n_part),
            rng.integers(0, len(NOUN), n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) * 0.1, 1)})

    day = np.timedelta64(86_400_000_000, "us")
    o_date = (np.datetime64("1995-01-01", "us")
              + rng.integers(0, 2405, n_ord) * day)
    _write(out_dir, "orders", {
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": o_date,
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]})

    # lineitem: 1-7 lines per order (avg 4), shipdate = orderdate + 1-95d
    nlines = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    n_li = len(l_orderkey)
    linenumber = (np.arange(n_li, dtype=np.int64)
                  - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1)
    _write(out_dir, "lineitem", {
        "l_orderkey": l_orderkey,
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": np.repeat(o_date, nlines)
        + rng.integers(1, 96, n_li) * day})

    # events: time-ordered over 30 days, exponential inter-arrival
    gaps = rng.exponential(1.0, n_ev)
    ts = (np.datetime64("2024-01-01", "us")
          + (np.cumsum(gaps) / gaps.sum() * 30 * 86_400_000_000
             ).astype(np.int64))
    _write(out_dir, "events", {
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": ts,
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 600.0), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]})

    # documents: random word salad from the 31-word vocab, ~0.16% exact
    # dups + ~0.3% near-dups (copy with a few word substitutions) so the
    # dedup tier has real work at every scale
    vocab = np.array(VOCAB)
    texts = []
    for i in range(n_doc):
        nw = int(rng.integers(10, 116))
        words = vocab[rng.integers(0, len(vocab), nw)]
        texts.append(" ".join(words))
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.0016:
            texts[i] = texts[int(rng.integers(0, i))]
        elif i > 10 and r < 0.0046:
            w = texts[int(rng.integers(0, i))].split()
            for _ in range(max(1, len(w) // 30)):
                w[int(rng.integers(0, len(w)))] = str(
                    vocab[int(rng.integers(0, len(vocab)))])
            texts[i] = " ".join(w)
    _write(out_dir, "documents", {
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc,
                           p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})

    # embeddings: 64-dim unit vectors clustered around 10 label centers
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.6, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    _write(out_dir, "embeddings", {
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})

    return out_dir


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (sys.argv[2] if len(sys.argv) > 2
           else os.path.join(repo, ".scratch", f"sf{sf:g}"))
    generate(sf, out)
    print(out)
