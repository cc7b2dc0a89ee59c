"""ANN recall@k against independent brute-force ground truth.

The IVF/LSH queries are oracle-verified against the SAME algorithm in
DuckDB — that proves the implementation, not the retrieval. This test
proves retrieval: on a deterministic clustered corpus (80 tight clusters
of 6 points, sigma=0.03 around unit centers — noise norm ~0.24 vs unit
inter-center distance), the approximate searches must recover the true
cosine top-k (computed in numpy, a fully independent path) above stated
floors, and IVF recall must rise monotonically with nprobe.

On STRUCTURELESS data ANN recall is inherently ~selectivity (the sf0.01
embeddings table is uniform random — mean pairwise cosine 0.000 — where
nprobe/16 cells ≈ nprobe/16 recall; measured in BENCH.md §r5). That is a
property of the data, not the index: recall guarantees only exist when
neighbors are closer than random, which this fixture plants.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

N_CLUSTERS, PER_CLUSTER, DIM = 80, 6, 64
K = 5
QUERY_IDS = list(range(0, N_CLUSTERS * PER_CLUSTER, 24))  # 20 queries


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vecs = [], []
    vid = 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + 0.03 * rng.normal(size=DIM)
            vecs.append(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    E = np.array(vecs)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, E


def _gt_topk(E: np.ndarray, qi: int, k: int) -> set:
    norms = np.linalg.norm(E, axis=1)
    sims = np.round(E @ E[qi] / (norms * norms[qi]), 3)  # engine rounds to 3
    sims[qi] = -np.inf
    return set(sorted(range(len(E)), key=lambda i: (-sims[i], i))[:k])


def test_ivf_batch_recall_rises_with_nprobe(clustered):
    from warcbase_spark.operators.similarity import ivf_topk_batch

    df, E = clustered
    floors = {1: 0.40, 2: 0.70, 4: 0.90}
    means = {}
    for nprobe in (1, 2, 4):
        res = ivf_topk_batch(
            df, F.col("vec_id").isin(QUERY_IDS), k=K,
            n_cells=16, nprobe=nprobe, dim=DIM, seed=13,
        ).collect()
        per_q: dict = {}
        for r in res:
            per_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        rec = [len(per_q.get(q, set()) & _gt_topk(E, q, K)) / K for q in QUERY_IDS]
        means[nprobe] = float(np.mean(rec))
        assert means[nprobe] >= floors[nprobe], (
            f"IVF recall@{K} at nprobe={nprobe}: {means[nprobe]:.3f} < floor "
            f"{floors[nprobe]} (measured 0.57/0.85/1.00 on this seeded fixture)"
        )
    assert means[1] <= means[2] <= means[4], f"recall not monotone in nprobe: {means}"


def test_lsh_topk_recall(clustered):
    from warcbase_spark.operators.similarity import ann_topk

    df, E = clustered
    rec = []
    for q in QUERY_IDS[:8]:
        got = {
            r["vec_id"]
            for r in ann_topk(df, query_id=q, k=K, n_bits=4, dim=DIM, seeds=(7, 101)).collect()
        }
        rec.append(len(got & _gt_topk(E, q, K)) / K)
    mean = float(np.mean(rec))
    # 4-bit two-table probing on tight clusters: measured 1.00; floor 0.9.
    # (8 bits over-partitions this 480-vector corpus — bits must scale
    # with corpus size; that trade-off is recorded in BENCH.md §r5.)
    assert mean >= 0.9, f"LSH recall@{K}: {mean:.3f} < 0.9"


def test_ivf_trained_centroids_beat_random(clustered):
    """ivf_train_kmeans: data-dependent centroids must align cells with the
    planted clusters — recall@5 at nprobe=1 jumps from 0.57 (seeded random
    quantizer) to ~1.0, because a cluster's members land in ONE cell
    instead of being sprayed across arbitrary random-hyperplane cells."""
    from warcbase_spark.operators.similarity import ivf_topk_batch, ivf_train_kmeans

    df, E = clustered
    cents = ivf_train_kmeans(df, n_cells=16, iters=4, dim=DIM, seed=13)
    res = ivf_topk_batch(
        df, F.col("vec_id").isin(QUERY_IDS), k=K,
        n_cells=16, nprobe=1, dim=DIM, seed=13, centroids=cents,
    ).collect()
    per_q: dict = {}
    for r in res:
        per_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = [len(per_q.get(q, set()) & _gt_topk(E, q, K)) / K for q in QUERY_IDS]
    mean = float(np.mean(rec))
    assert mean >= 0.85, (
        f"trained-IVF recall@{K} at nprobe=1: {mean:.3f} — expected ≥0.85 "
        "(random centroids measure 0.57 here)"
    )
    # and training must be deterministic (pure function of data + seed)
    cents2 = ivf_train_kmeans(df, n_cells=16, iters=4, dim=DIM, seed=13)
    assert cents == cents2
