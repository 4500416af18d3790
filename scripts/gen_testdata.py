"""Generate extra scale factors of the driver's synthetic star schema.

/root/testdata holds only sf0.001/0.01/0.1 (and is read-only), so the
fourth scaling decade (sf1) that SCALING.md needs has to be generated
locally. This mirrors the observed schemas and distribution shapes of
the driver's tables (profiled from /root/testdata/sf0.1 — row-count
scaling rules, key ranges, value ranges, category mixes); it is NOT
bit-compatible with the driver's generator and is used only for
scaling/bench measurements, never for oracle-correctness gating.

Observed scaling rules (rows at scale factor `sf`):
  region 5, nation 25 (fixed);  customer 150k*sf;  supplier 10k*sf;
  part 200k*sf;  orders 1.5M*sf;  lineitem ~6M*sf (Poisson-ish lines
  per order, mean ~4.07, 1..7 linenumbers);  events 1M*sf over 30 days
  of 2024-01 with 15k*sf users;  documents max(500, 50k*sf) word-salad
  docs (31-word vocab, 10-100 words, 5 langs skewed to en, 20 sources,
  ~0.2% exact dups);  embeddings max(500, 20k*sf) 64-dim unit vectors
  in 10 label clusters.

Usage: python scripts/gen_testdata.py --sf 1 --out testdata_big
       -> writes <out>/sf1/*.parquet  (sf1 ~ 170 MB)
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
PART_ADJ = ["large", "small", "hot", "cold", "blue", "red", "green", "shiny"]
PART_NOUN = ["ring", "bolt", "screw", "panel", "gear", "wheel", "pipe", "rod"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "fr", "de", "es", "zh"]
LANG_P = [0.42, 0.145, 0.145, 0.145, 0.145]
DAY_US = 86_400_000_000  # microseconds


def _ts_col(days_epoch: np.ndarray) -> pa.Array:
    return pa.array(days_epoch.astype("datetime64[us]"))


def gen(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"  {name}: {table.num_rows:,} rows -> {path}")

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
    }))

    n_supp = int(10_000 * sf)
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    adj = rng.choice(PART_ADJ, n_part)
    noun = rng.choice(PART_NOUN, n_part)
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(rng.choice(PART_TYPES, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }))

    n_ord = int(1_500_000 * sf)
    d0 = np.datetime64("1995-01-01").astype("datetime64[D]").astype(np.int64)
    d1 = np.datetime64("2001-08-01").astype("datetime64[D]").astype(np.int64)
    odate_days = rng.integers(d0, d1 + 1, n_ord)
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(STATUSES, n_ord)),
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2),
        "o_orderdate": _ts_col(odate_days * DAY_US),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord)),
    }))

    # lineitem: per-order line counts ~ 1 + Poisson(3.1) clipped to 7
    # (matches the observed mean ~4.07, max 7 linenumbers, and ~2% of
    # orders with no lines at all).
    lines = np.clip(1 + rng.poisson(3.1, n_ord), 1, 7)
    lines[rng.random(n_ord) < 0.02] = 0
    l_orderkey = np.repeat(np.arange(n_ord), lines)
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate(
        [np.arange(1, c + 1) for c in lines if c > 0]
    ) if n_li else np.array([], np.int64)
    ship_off = rng.integers(1, 96, n_li)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": _ts_col((odate_days.take(l_orderkey) + ship_off) * DAY_US),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
    span = 30 * DAY_US
    ev_ts = np.sort(t0 + rng.integers(0, span, n_ev))
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_col(ev_ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, n_ev)),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    n_doc = max(500, int(50_000 * sf))
    vocab = np.array(DOC_VOCAB)
    wc = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), c)]) for c in wc]
    # exact duplicates: ~0.2% of docs copy an earlier doc's text
    for i in rng.choice(np.arange(1, n_doc), max(1, n_doc // 500), replace=False):
        texts[i] = texts[rng.integers(0, i)]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = max(500, int(20_000 * sf))
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32))),
        "label": pa.array(labels, pa.int32()),
    }))
    return vecs


def gen_planted_embeddings(
    sf: float, out_dir: str, base: np.ndarray, seed: int = 20260816
) -> None:
    """OPT-IN additional table `embeddings_planted.parquet` (r12, for
    the r13 ANN-knob work): the base corpus's true pairs sit at cosine
    0.40-0.60 (SCALING.md, r11 refutation), where no (n_tables,
    n_planes) setting can trade candidates for recall — so sign-LSH
    amplification is untestable on `embeddings` at Spark scale. This
    writes base ∪ planted near-dup clusters (per target cosine c in
    {0.90, 0.95, 0.99}: sf-scaled cluster count, 4 vectors each; dup =
    c·v + sqrt(1-c²)·g⊥, exact by construction) plus the pair ground
    truth `embeddings_planted_truth.parquet` (vec_a, vec_b, cosine).
    Same schema as `embeddings` (planted label = 100+target index), so
    every ANN query can be pointed at it unchanged. ADDITIVE ONLY:
    `embeddings.parquet` is untouched, so no existing sf1 evidence is
    invalidated — registering planted-regime queries (and burning the
    window slots that implies) stays an explicit r13 decision."""
    rng = np.random.default_rng(seed)
    n_clusters = max(10, int(500 * sf))
    vecs = [base.astype(np.float64)]
    ids = [np.arange(len(base))]
    labels = [np.full(len(base), -1, np.int32)]
    truth_a, truth_b, truth_c = [], [], []
    next_id = len(base)
    for ti, c in enumerate((0.90, 0.95, 0.99)):
        seeds = rng.standard_normal((n_clusters, 64))
        seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
        for s in seeds:
            cluster = [s]
            for _ in range(3):
                g = rng.standard_normal(64)
                g -= g.dot(s) * s
                g /= np.linalg.norm(g)
                cluster.append(c * s + np.sqrt(1 - c * c) * g)
            cid = np.arange(next_id, next_id + 4)
            next_id += 4
            vecs.append(np.array(cluster))
            ids.append(cid)
            labels.append(np.full(4, 100 + ti, np.int32))
            for i in range(4):
                for j in range(i + 1, 4):
                    truth_a.append(cid[i])
                    truth_b.append(cid[j])
                    truth_c.append(float(np.dot(cluster[i], cluster[j])))
    allv = np.vstack(vecs)
    path = os.path.join(out_dir, "embeddings_planted.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(ids), pa.int64()),
        "embedding": pa.array(list(allv.astype(np.float32))),
        "label": pa.array(np.concatenate(labels), pa.int32()),
    }), path)
    print(f"  embeddings_planted: {len(allv):,} rows -> {path}")
    tpath = os.path.join(out_dir, "embeddings_planted_truth.parquet")
    pq.write_table(pa.table({
        "vec_a": pa.array(np.array(truth_a), pa.int64()),
        "vec_b": pa.array(np.array(truth_b), pa.int64()),
        "cosine": pa.array(np.array(truth_c), pa.float64()),
    }), tpath)
    print(f"  embeddings_planted_truth: {len(truth_a):,} pairs -> {tpath}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default="testdata_big",
                    help="root dir; tables land in <out>/sf<sf>/")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--planted-embeddings", action="store_true",
        help="ALSO write embeddings_planted.parquet (+truth table): "
        "base corpus plus high-cosine near-dup clusters for ANN-knob "
        "measurement. Additive — never touches embeddings.parquet.",
    )
    ap.add_argument(
        "--base-dir", default=None,
        help="r13: with --planted-embeddings, read the BASE "
        "embeddings.parquet from this directory (e.g. the read-only "
        "/root/testdata/sf0.01) instead of from --out/sf<sf>/ — lets "
        "the committed gate-SF planted tables plant onto the driver's "
        "own corpus without copying it.",
    )
    args = ap.parse_args()
    sf_name = f"sf{args.sf:g}"
    out = os.path.join(args.out, sf_name)
    emb_path = os.path.join(args.base_dir or out, "embeddings.parquet")
    if args.planted_embeddings and os.path.exists(emb_path):
        # planted-only mode: the base tables already exist — read the
        # shipped embeddings as the base instead of regenerating
        # anything (keeps every existing sf1 measurement valid)
        print(f"planting onto existing {emb_path}")
        base = np.array(
            pq.read_table(emb_path, columns=["embedding"])
            .column("embedding").to_pylist(),
            dtype=np.float64,
        )
        os.makedirs(out, exist_ok=True)
        gen_planted_embeddings(args.sf, out, base)
        return
    print(f"generating {sf_name} -> {out}")
    base = gen(args.sf, out, args.seed)
    if args.planted_embeddings:
        gen_planted_embeddings(args.sf, out, base)


if __name__ == "__main__":
    main()
