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


# Empirical basket-size histogram of sf0.1 lineitem (measured
# 2026-08-14); keys = lines per order. The co-purchase graph density —
# what graph_triangle_count / join_bipartite_projection / agg_basket_lift
# costs scale WITH — is baskets × C(size, 2) / part-pair space, so the
# honest 10x keeps this histogram fixed while growing baskets AND the
# part key space 10x (like real TPC-H sf0.1 -> sf1: per-part degree
# stays ~constant, edges grow ~linearly).
_BASKET_HIST = {
    1: 11016, 2: 21814, 3: 29500, 4: 29097, 5: 23631, 6: 15625,
    7: 8941, 8: 4407, 9: 1959, 10: 818, 11: 292, 12: 93, 13: 29,
    14: 10, 15: 1, 16: 2, 17: 1,
}

_P_ADJ = "large hot blue small red green dark light fast slow".split()
_P_NOUN = "ring bolt screw nut washer gear cap rod pin plate".split()
_P_TYPE = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]
_O_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_E_TYPES = ["signup", "click", "purchase", "error", "view"]


def gen_tpch_shape(mult: int, rng: np.random.Generator):
    """10x orders/lineitem/part with sf0.1's measured shape: basket
    sizes from the empirical histogram, partkeys uniform over a 10x key
    space (distinct within a basket), value/date/categorical columns
    spanning the same ranges as the driver fixture."""
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_cust = 15_000 * mult

    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": pa.array(
                [
                    f"{_P_ADJ[i % 10]} {_P_NOUN[(i // 10) % 10]}"
                    for i in range(n_part)
                ],
                pa.string(),
            ),
            "p_brand": pa.array(
                [f"Brand#{i % 25}" for i in range(n_part)], pa.string()
            ),
            "p_type": pa.array(
                [_P_TYPE[i % 5] for i in range(n_part)], pa.string()
            ),
            "p_size": pa.array(
                (np.arange(n_part) % 50 + 1).astype(np.int64), pa.int64()
            ),
            "p_retailprice": pa.array(
                900.0 + (np.arange(n_part) % 1000) / 10.0, pa.float64()
            ),
        }
    )

    day_us = 86_400_000_000
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate = d0 + rng.integers(0, 2404, size=n_ord) * day_us
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, size=n_ord), pa.int64()
            ),
            "o_orderstatus": pa.array(
                rng.choice(["O", "F", "P"], size=n_ord, p=[0.49, 0.49, 0.02]),
                pa.string(),
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, size=n_ord), 2),
                pa.float64(),
            ),
            "o_orderdate": pa.array(
                odate.view("datetime64[us]"), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                rng.choice(_O_PRIO, size=n_ord), pa.string()
            ),
        }
    )

    sizes_v = np.array(list(_BASKET_HIST.keys()))
    sizes_p = np.array(list(_BASKET_HIST.values()), dtype=np.float64)
    sizes_p /= sizes_p.sum()
    basket = rng.choice(sizes_v, size=n_ord, p=sizes_p)
    n_li = int(basket.sum())
    l_ok = np.repeat(np.arange(n_ord), basket)
    # distinct parts within a basket: draw, then re-draw collisions
    l_pk = rng.integers(0, n_part, size=n_li)
    off = np.concatenate(([0], np.cumsum(basket)))
    for o in range(n_ord):
        s, e = off[o], off[o + 1]
        seg = l_pk[s:e]
        while len(np.unique(seg)) < e - s:
            dup = np.ones(e - s, bool)
            _, first = np.unique(seg, return_index=True)
            dup[first] = False
            seg[dup] = rng.integers(0, n_part, size=int(dup.sum()))
        l_pk[s:e] = seg
    l_ln = np.concatenate([np.arange(1, b + 1) for b in basket])
    sdate = np.repeat(odate, basket) + rng.integers(
        1, 95, size=n_li
    ) * day_us
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_ok, pa.int64()),
            "l_partkey": pa.array(l_pk, pa.int64()),
            "l_suppkey": pa.array(
                rng.integers(0, 1000 * mult, size=n_li), pa.int64()
            ),
            "l_linenumber": pa.array(l_ln.astype(np.int64), pa.int64()),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n_li).astype(np.float64),
                pa.float64(),
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105000, size=n_li), 2),
                pa.float64(),
            ),
            "l_discount": pa.array(
                rng.integers(0, 11, size=n_li) / 100.0, pa.float64()
            ),
            "l_tax": pa.array(
                rng.integers(0, 9, size=n_li) / 100.0, pa.float64()
            ),
            "l_returnflag": pa.array(
                rng.choice(["A", "N", "R"], size=n_li), pa.string()
            ),
            "l_linestatus": pa.array(
                rng.choice(["O", "F"], size=n_li), pa.string()
            ),
            "l_shipdate": pa.array(
                sdate.view("datetime64[us]"), pa.timestamp("us")
            ),
        }
    )
    return part, orders, lineitem


def gen_graph_edges(
    mult: int, rng: np.random.Generator, zipf: float | None = None
):
    """Edges-only tpch shape (l_orderkey/l_partkey + o_orderkey/
    o_custkey) — the minimal columns the graph family reads — fully
    vectorized so mult=100 is practical (gen_tpch_shape's per-basket
    redraw loop is Python-per-order and stops at ~10x).

    Same scaling contract as gen_tpch_shape: basket histogram fixed,
    part/customer key spaces grown mult×, so per-part degree stays
    ~constant and co-purchase edges grow ~linearly. Within-basket
    duplicate parts are DROPPED instead of redrawn (collision odds per
    basket ≈ size²/2·n_part ≈ 4e-6 at mult=100 — statistically
    invisible, and dropping is a single vectorized unique on the
    composite key instead of a 15M-iteration Python loop).

    ``zipf`` (r8 VERDICT item 6) draws partkeys Zipf(s)-distributed
    instead of uniform — the realistic co-purchase shape where popular
    parts co-occur repeatedly, so ≥3-support pair ops
    (join_complement_rank, agg_basket_lift) return NON-EMPTY results
    at every scale; the uniform draw starves repeat pairs at mult=100
    (measured: 8 → 0 output rows across two decades)."""
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_cust = 15_000 * mult

    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, size=n_ord), pa.int64()
            ),
        }
    )

    sizes_v = np.array(list(_BASKET_HIST.keys()))
    sizes_p = np.array(list(_BASKET_HIST.values()), dtype=np.float64)
    sizes_p /= sizes_p.sum()
    basket = rng.choice(sizes_v, size=n_ord, p=sizes_p)
    n_li = int(basket.sum())
    l_ok = np.repeat(np.arange(n_ord), basket)
    if zipf:
        pz = 1.0 / np.power(np.arange(1, n_part + 1, dtype=np.float64), zipf)
        pz /= pz.sum()
        l_pk = rng.choice(n_part, size=n_li, p=pz)
    else:
        l_pk = rng.integers(0, n_part, size=n_li)
    # vectorized within-basket dedup: unique composite (order, part)
    key = l_ok * np.int64(n_part) + l_pk
    keep = np.sort(np.unique(key, return_index=True)[1])
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_ok[keep], pa.int64()),
            "l_partkey": pa.array(l_pk[keep], pa.int64()),
            # supplier key space also grows mult x (per-supplier degree
            # ~constant) so the supplier-part graph family scales too
            "l_suppkey": pa.array(
                rng.integers(0, 1_000 * mult, size=len(keep)), pa.int64()
            ),
        }
    )
    return orders, lineitem


def gen_skew(mult: int, rng: np.random.Generator):
    """Hot-key join stress: orders with HALF of all rows on ONE
    custkey (a ~32x-over-average reducer partition at 32 shuffle
    partitions) + the matching customer dim — the corpus for the
    salted-join / AQE-skew-split A/B. Fully vectorized."""
    n_ord = 150_000 * mult
    n_cust = 15_000 * mult
    hot = n_ord // 2
    ck = np.concatenate(
        [np.zeros(hot, np.int64), rng.integers(1, n_cust, size=n_ord - hot)]
    )
    rng.shuffle(ck)
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(ck, pa.int64()),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, size=n_ord), 2),
                pa.float64(),
            ),
        }
    )
    seg = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_mktsegment": pa.array(
                [seg[i % 5] for i in range(n_cust)], pa.string()
            ),
        }
    )
    return orders, customer


def gen_events(mult: int, rng: np.random.Generator) -> pa.Table:
    n = 100_000 * mult
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * 86_400_000_000
    ts = t0 + rng.integers(0, span, size=n)
    ts.sort()
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts.view("datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, 1500 * mult, size=n), pa.int64()
            ),
            "event_type": pa.array(rng.choice(_E_TYPES, size=n), pa.string()),
            "value": pa.array(
                np.round(rng.uniform(0, 560, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )


def gen_events_bursty(mult: int, rng: np.random.Generator) -> pa.Table:
    """Time-skewed + user-skewed events — the streaming family's
    adversarial corpus (r10 VERDICT item 6; the graph family got its
    zipf twin in r10, streaming ops had only uniform arrivals).

    Two skews, composed:

    * HOT HOURS: 50% of events land within ±30 min of 8 burst centers
      (flash-sale / incident shape) — a tumbling/sliding window at a
      burst holds ~45x the uniform window's rows, and sessionize's
      per-batch fold sees most of the corpus arrive in a few
      micro-batches;
    * HOT USERS: user_id is a Zipf(1.3) draw over 1500*mult users —
      the head user carries ~26% of ALL events (measured 0.281/0.267/
      0.261 at mult 1/10/100), so per-key state groups are radically
      unequal (the hot-key applyInPandasWithState stress) and the hot
      hour is ~43x the average hour's row count.

    Same schema/dtypes as gen_events; ts sorted so event_id remains
    time-correlated (the fixture invariant the feeds rely on).
    """
    n = 100_000 * mult
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * 86_400_000_000
    n_burst = n // 2
    centers = rng.choice(span, size=8, replace=False)
    ts_burst = centers[rng.integers(0, 8, size=n_burst)] + rng.integers(
        -1_800_000_000, 1_800_000_000, size=n_burst
    )
    ts_unif = rng.integers(0, span, size=n - n_burst)
    ts = t0 + np.clip(np.concatenate([ts_burst, ts_unif]), 0, span - 1)
    ts.sort()
    n_users = 1500 * mult
    # zipf draw, rejection-capped to the user-id range (zipf(1.3) has
    # a heavy tail; resample the overflow against the same law)
    uid = rng.zipf(1.3, size=n)
    while (uid > n_users).any():
        over = uid > n_users
        uid[over] = rng.zipf(1.3, size=int(over.sum()))
    uid -= 1  # zipf is 1-based; user ids start at 0
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts.view("datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(uid.astype(np.int64), pa.int64()),
            "event_type": pa.array(rng.choice(_E_TYPES, size=n), pa.string()),
            "value": pa.array(
                np.round(rng.uniform(0, 560, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )


def gen_documents_heaps(n: int, rng: np.random.Generator) -> pa.Table:
    """Documents whose vocabulary GROWS with corpus size (Heaps' law,
    |V| ≈ 1.8·√n, Zipf-1.05 word frequencies) — the realistic web-corpus
    shape, unlike the driver fixture's fixed 40-word vocab. On the fixed
    vocab the TRUE near-dup answer is Θ(n²) (top-5 tf-idf signatures
    collide constantly), so every tf-idf-cosine run there is
    output-bound by construction; this variant is the corpus where a
    linear-candidate claim is even POSSIBLE, and is what the
    dedup_tfidf_cosine_heaps stress row measures."""
    vocab_n = max(60, int(round(1.8 * n**0.5)))
    words = np.array([f"w{i:04d}" for i in range(vocab_n)])
    p = 1.0 / np.power(np.arange(1, vocab_n + 1), 1.05)
    p /= p.sum()
    texts: list[str] = []
    base_cache: list[str] = []
    for i in range(n):
        if base_cache and rng.random() < 0.03:
            toks = base_cache[int(rng.integers(len(base_cache)))].split()
            for _ in range(max(1, len(toks) // 20)):
                toks[int(rng.integers(len(toks)))] = words[
                    int(rng.choice(vocab_n, p=p))
                ]
            txt = " ".join(toks)
        else:
            k = int(rng.integers(8, 90))
            txt = " ".join(words[rng.choice(vocab_n, size=k, p=p)])
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


def gen_documents_web(n: int, rng: np.random.Generator) -> pa.Table:
    """Documents with a WEB-SCALE vocabulary (|V| = 200·√n, Zipf-1.05
    frequencies, 3% near-dup rate) — the corpus where
    dedup_tfidf_cosine's PREFIX+BOUND plan is the right one and must
    be measured: rare terms exist (a 512-doc head sample holds far
    more than the small-vocab gate's 2048 distinct terms), so the
    rarest-first prefix is selective and the suffix bound bites.
    Complements gen_documents_heaps (|V| = 1.8·√n), whose hub
    vocabulary routes to the single-pass plan."""
    vocab_n = max(4000, int(round(200.0 * n**0.5)))
    words = np.array([f"w{i:06d}" for i in range(vocab_n)])
    p = 1.0 / np.power(np.arange(1, vocab_n + 1), 1.05)
    p /= p.sum()
    texts: list[str] = []
    base_cache: list[str] = []
    for i in range(n):
        if base_cache and rng.random() < 0.03:
            toks = base_cache[int(rng.integers(len(base_cache)))].split()
            for _ in range(max(1, len(toks) // 20)):
                toks[int(rng.integers(len(toks)))] = words[
                    int(rng.choice(vocab_n, p=p))
                ]
            txt = " ".join(toks)
        else:
            k = int(rng.integers(8, 90))
            txt = " ".join(words[rng.choice(vocab_n, size=k, p=p)])
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stress_sf1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument(
        "--heaps-base",
        default="/tmp/stress_heaps",
        help="prefix for the two Heaps-vocab document dirs "
        "(<prefix>_1x and <prefix>_<mult>x)",
    )
    ap.add_argument(
        "--docs-only",
        action="store_true",
        help="only documents/embeddings/heaps (skip the tpch-shaped and "
        "events tables, whose per-basket generation loop is impractical "
        "past mult=10 — used for the mult=100 corpus-scaling decade)",
    )
    ap.add_argument(
        "--graph-only",
        action="store_true",
        help="only the edges-only orders/lineitem pair (vectorized, "
        "practical at mult=100) — extends the two-decade scaling table "
        "to the graph family (triangle/bipartite/degree-hist)",
    )
    ap.add_argument(
        "--zipf",
        type=float,
        default=None,
        help="with --graph-only: Zipf exponent for the partkey draw "
        "(e.g. 1.1) — realistic co-purchase skew so >=3-support pair "
        "ops return non-empty results at mult=100",
    )
    ap.add_argument(
        "--skew-only",
        action="store_true",
        help="only the hot-key orders/customer pair (half of all orders "
        "on one custkey) for the salted-join vs AQE-skew-split A/B",
    )
    ap.add_argument(
        "--webdocs-only",
        action="store_true",
        help="only the web-vocabulary document pair "
        "(<out>_1x and <out>_<mult>x; |V|=200*sqrt(n)) — the corpus "
        "that exercises dedup_tfidf_cosine's prefix+bound plan at "
        "scale (the Heaps/fixture corpora route to the single-pass "
        "small-vocab plan)",
    )
    ap.add_argument(
        "--events-only",
        action="store_true",
        help="only the events table (fully vectorized — practical at "
        "mult=100, unlike the tpch basket loop); used to push the "
        "streaming-family scaling measurement to two decades",
    )
    ap.add_argument(
        "--events-bursty",
        action="store_true",
        help="only the BURSTY events table (hot-hour arrival spikes + "
        "zipf hot users; see gen_events_bursty) — the streaming "
        "family's adversarial corpus",
    )
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    os.makedirs(args.out, exist_ok=True)
    if args.graph_only:
        orders, lineitem = gen_graph_edges(args.mult, rng, zipf=args.zipf)
        pq.write_table(orders, os.path.join(args.out, "orders.parquet"))
        pq.write_table(lineitem, os.path.join(args.out, "lineitem.parquet"))
        print(
            f"wrote {orders.num_rows} orders, {lineitem.num_rows} "
            f"lineitem (edges-only) -> {args.out}"
        )
        return
    if args.skew_only:
        orders, customer = gen_skew(args.mult, rng)
        pq.write_table(orders, os.path.join(args.out, "orders.parquet"))
        pq.write_table(customer, os.path.join(args.out, "customer.parquet"))
        print(
            f"wrote {orders.num_rows} orders (half on one custkey), "
            f"{customer.num_rows} customer -> {args.out}"
        )
        return
    if args.webdocs_only:
        for tag, nn in (("1x", 5000), (f"{args.mult}x", 5000 * args.mult)):
            wd = f"{args.out}_{tag}"
            os.makedirs(wd, exist_ok=True)
            wt = gen_documents_web(nn, np.random.default_rng(11))
            pq.write_table(wt, os.path.join(wd, "documents.parquet"))
            print(f"wrote {wt.num_rows} web-vocab documents -> {wd}")
        return
    if args.events_only:
        ev = gen_events(args.mult, rng)
        pq.write_table(ev, os.path.join(args.out, "events.parquet"))
        print(f"wrote {ev.num_rows} events -> {args.out}")
        return
    if args.events_bursty:
        ev = gen_events_bursty(args.mult, rng)
        pq.write_table(ev, os.path.join(args.out, "events.parquet"))
        print(f"wrote {ev.num_rows} bursty events -> {args.out}")
        return
    docs = gen_documents(5000 * args.mult, rng)
    pq.write_table(docs, os.path.join(args.out, "documents.parquet"))
    for tag, nn in (("1x", 5000), (f"{args.mult}x", 5000 * args.mult)):
        hd = f"{args.heaps_base}_{tag}"
        os.makedirs(hd, exist_ok=True)
        ht = gen_documents_heaps(nn, np.random.default_rng(7))
        pq.write_table(ht, os.path.join(hd, "documents.parquet"))
        print(f"wrote {ht.num_rows} heaps-vocab documents -> {hd}")
    emb = gen_embeddings(2000 * args.mult, rng)
    pq.write_table(emb, os.path.join(args.out, "embeddings.parquet"))
    if args.docs_only:
        print(
            f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings "
            f"-> {args.out}"
        )
        return
    part, orders, lineitem = gen_tpch_shape(args.mult, rng)
    pq.write_table(part, os.path.join(args.out, "part.parquet"))
    pq.write_table(orders, os.path.join(args.out, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(args.out, "lineitem.parquet"))
    ev = gen_events(args.mult, rng)
    pq.write_table(ev, os.path.join(args.out, "events.parquet"))
    print(
        f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings, "
        f"{part.num_rows} part, {orders.num_rows} orders, "
        f"{lineitem.num_rows} lineitem, {ev.num_rows} events "
        f"-> {args.out}"
    )


if __name__ == "__main__":
    main()
