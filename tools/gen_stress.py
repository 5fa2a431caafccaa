"""Generate sf1-scale stress fixtures for the dedup/similarity bench.

VERDICT.md r3 item 5: the driver ships testdata only up to sf0.1, so the
100 TB design claims rest on plan-shape tests. This script synthesizes a
10x-larger `documents` (50k rows) and `embeddings` (20k rows) with the
SAME statistical shape as `/root/testdata/sf0.1` (measured 2026-08-13:
vocab-of-~40-words texts, 44-577 chars, 5 langs, 20 sources, planted
near-duplicates; 64-dim embeddings in 10 label clusters) so
`tools/stress_bench.py` can measure sf0.1 -> sf1 scaling ratios for the
candidate-generation operators. NOT a correctness fixture — the oracle
gate always runs on the driver's own parquet.

Writes to /tmp/stress_sf1 (never /root/testdata, which is read-only).

Usage: python tools/gen_stress.py [--out /tmp/stress_sf1] [--mult 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group query table key stream filter customer window join agg "
    "vector the a of big plan stage shuffle merge read write null broadcast"
).split()
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    base_cache: list[str] = []
    for i in range(n):
        if base_cache and rng.random() < 0.03:
            # planted near-duplicate: mutate a recent doc by a few tokens
            words = base_cache[int(rng.integers(len(base_cache)))].split()
            for _ in range(max(1, len(words) // 20)):
                words[int(rng.integers(len(words)))] = VOCAB[
                    int(rng.integers(len(VOCAB)))
                ]
            txt = " ".join(words)
        else:
            k = int(rng.integers(8, 90))
            txt = " ".join(
                VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), k)
            )
            if len(base_cache) < 512:
                base_cache.append(txt)
        texts.append(txt)
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(
                [f"src{i % 20}" for i in range(n)], pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(s) for s in texts]), pa.int64()
            ),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator, dim: int = 64) -> pa.Table:
    """Match the driver fixture's similarity DISTRIBUTION (measured at
    sf0.1: p99 pairwise cos 0.287, only 144/2M pairs >= 0.45): weak
    cluster pull over near-random unit vectors, plus ~3.5% planted
    near-dups — pair density stays LINEAR in n, like the real corpus.
    (A tightly-clustered first draft made every intra-cluster pair a
    candidate: quadratic pair blow-up that no candidate generator —
    and no real dedup corpus — exhibits.)"""
    centers = rng.normal(size=(10, dim)).astype(np.float32)
    labels = rng.integers(0, 10, size=n)
    vecs = 0.3 * centers[labels] + rng.normal(size=(n, dim)).astype(
        np.float32
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    n_dup = int(n * 0.035)
    src = rng.integers(0, n, size=n_dup)
    dst = rng.integers(0, n, size=n_dup)
    for s, d in zip(src, dst):
        if s == d:
            continue
        v = vecs[s] + 0.45 * rng.normal(size=dim).astype(np.float32)
        vecs[d] = v / np.linalg.norm(v)
        labels[d] = labels[s]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int64), pa.int64()),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stress_sf1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    os.makedirs(args.out, exist_ok=True)
    docs = gen_documents(5000 * args.mult, rng)
    pq.write_table(docs, os.path.join(args.out, "documents.parquet"))
    emb = gen_embeddings(2000 * args.mult, rng)
    pq.write_table(emb, os.path.join(args.out, "embeddings.parquet"))
    print(
        f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings "
        f"-> {args.out}"
    )


if __name__ == "__main__":
    main()
