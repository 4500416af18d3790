"""r12 (VERDICT item 5): make the embedding-LSH (n_tables, n_planes)
knobs MEASURABLE in the regime they were built for.

The r11 frontier sweep refuted AND-amplification on the real synthetic
corpus because its true pairs sit at cosine 0.40-0.60 (sign-LSH
rho ~ 0.65 — no knob setting can cut candidates 5x at held recall
there). This script builds a PLANTED high-cosine regime — deterministic
near-duplicate clusters at cosine ~ {0.90, 0.95, 0.99} on top of the
real sf0.1 embeddings — and sweeps the exact same md5-derived
sign-bucket LSH the engine uses (queries/similarity.py:_hyperplanes,
replicated in numpy; float sign instead of the engine's 1e-9
fixed-point sign — identical except within 5e-10 of a plane, measured
0 flipped bits on this corpus).

Planted-vs-testdata decision (r12): the verdict offered planting the
clusters in scripts/gen_testdata.py itself, which would change the
embeddings TABLE and force every embeddings-family query into the
driver window in one round — directly crowding out the r4/r5 staleness
backlog the same verdict ranks first ("staleness wins"). This script
delivers the measurable part NOW without touching any registered
query's input; migrating the planted family into gen_testdata.py is
r13 work once the window has capacity.

Deterministic end to end (md5 planes, seeded numpy RNG). Output: the
recall/candidate table recorded in SCALING.md.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_CLUSTERS = 50
CLUSTER_SIZE = 4  # 1 seed + 3 planted dups -> 6 true pairs per cluster
TARGET_COS = (0.90, 0.95, 0.99)


def hyperplanes(n_planes: int, table: int, dim: int = DIM) -> np.ndarray:
    """Numpy twin of queries/similarity.py:_hyperplanes with the
    per-table prefix dedup_embedding_lsh uses (tbl{t})."""
    prefix = f"tbl{table}"
    rows = []
    for j in range(n_planes):
        row = [
            int(hashlib.md5(f"{prefix}:{j}:{i}".encode()).hexdigest()[:8], 16)
            / float(1 << 32)
            - 0.5
            for i in range(dim)
        ]
        rows.append(row)
    return np.array(rows)


def plant(base: np.ndarray, rng: np.random.Generator):
    """Append N_CLUSTERS deterministic near-dup clusters per target
    cosine. A dup of unit seed v at target cosine c is
    normalize(c*v + sqrt(1-c^2)*g_perp) — exact by construction."""
    vecs = [base]
    true_pairs: list[tuple[int, int, float]] = []
    next_id = len(base)
    for c in TARGET_COS:
        seeds = rng.standard_normal((N_CLUSTERS, DIM))
        seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
        for s in seeds:
            ids = [next_id]
            cluster = [s]
            next_id += 1
            for _ in range(CLUSTER_SIZE - 1):
                g = rng.standard_normal(DIM)
                g -= g.dot(s) * s
                g /= np.linalg.norm(g)
                v = c * s + np.sqrt(1 - c * c) * g
                cluster.append(v)
                ids.append(next_id)
                next_id += 1
            vecs.append(np.array(cluster))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cos = float(cluster[i].dot(cluster[j]))
                    true_pairs.append((ids[i], ids[j], cos))
    return np.vstack(vecs), true_pairs


def sweep(vecs: np.ndarray, true_pairs, tables: int, planes: int):
    """Candidate pairs = OR over T tables of exact sign-bucket match;
    returns (n_candidates, recall over pairs with cosine >= 0.9)."""
    n = len(vecs)
    cand: set[tuple[int, int]] = set()
    for t in range(tables):
        h = hyperplanes(planes, t)
        bits = (vecs @ h.T >= 0).astype(np.uint8)
        keys = [row.tobytes() for row in np.packbits(bits, axis=1)]
        buckets: dict[bytes, list[int]] = {}
        for i, k in enumerate(keys):
            buckets.setdefault(k, []).append(i)
        for members in buckets.values():
            if len(members) < 2:
                continue
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    cand.add((members[a], members[b]))
    hi = [(a, b) for a, b, c in true_pairs if c >= 0.9]
    hit = sum((a, b) in cand or (b, a) in cand for a, b in hi)
    return len(cand), hit / len(hi), n * (n - 1) // 2


def main() -> None:
    emb_path = os.environ.get(
        "SPARK_GRAFT_EMB", "/root/testdata/sf0.1/embeddings.parquet"
    )
    tbl = pq.read_table(emb_path, columns=["embedding"])
    base = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    base /= np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(20260816)
    vecs, true_pairs = plant(base, rng)
    print(
        f"corpus: {len(base)} real + {len(vecs) - len(base)} planted = "
        f"{len(vecs)} vectors; {len(true_pairs)} planted true pairs "
        f"(cosines {min(c for _, _, c in true_pairs):.3f}.."
        f"{max(c for _, _, c in true_pairs):.3f})"
    )
    print(f"{'T':>2} {'p':>3} {'cands':>9} {'recall@0.9':>10} {'prune_x':>8}")
    shipped = None
    for tables, planes in [
        (3, 4), (1, 8), (2, 8), (4, 8), (1, 12), (2, 12), (4, 12),
        (1, 16), (2, 16), (4, 16), (6, 16), (4, 20), (6, 20),
    ]:
        cands, recall, allp = sweep(vecs, true_pairs, tables, planes)
        if (tables, planes) == (3, 4):
            shipped = cands
        prune = (shipped or cands) / max(cands, 1)
        print(f"{tables:>2} {planes:>3} {cands:>9} {recall:>10.3f} {prune:>8.1f}")
    # per-target-cosine recall at the headline knob (4, 16)
    for target in TARGET_COS:
        sub = [(a, b, c) for a, b, c in true_pairs if abs(c - target) < 0.03]
        cands_set: set[tuple[int, int]] = set()
        for t in range(4):
            h = hyperplanes(16, t)
            bits = (vecs @ h.T >= 0).astype(np.uint8)
            keys = ["".join(map(str, row)) for row in bits]
            buckets: dict[str, list[int]] = {}
            for i, k in enumerate(keys):
                buckets.setdefault(k, []).append(i)
            for members in buckets.values():
                for x in range(len(members)):
                    for y in range(x + 1, len(members)):
                        cands_set.add((members[x], members[y]))
        hit = sum((a, b) in cands_set or (b, a) in cands_set for a, b, _ in sub)
        print(f"recall@(T=4,p=16) for planted cos~{target}: "
              f"{hit}/{len(sub)} = {hit / max(len(sub), 1):.3f}")


if __name__ == "__main__":
    main()
