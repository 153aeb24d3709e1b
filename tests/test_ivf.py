"""IVF coarse quantization + embedding dedup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from sparkcollector.operators.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    ivf_assign,
    ivf_topk,
    train_ivf_centroids,
)

DIM = 16
N = 300


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(23)
    # clustered data: 4 true centers so IVF has structure to find
    centers = rng.standard_normal((4, DIM)) * 3
    vecs = np.array([centers[i % 4] + rng.standard_normal(DIM) for i in range(N)])
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N)], schema
    )
    return df, vecs


def test_ivf_assign_deterministic_and_bounded(emb):
    df, _ = emb
    cents = train_ivf_centroids(df, k=8, sample=N)
    a1 = {r["vec_id"]: r["cluster"] for r in ivf_assign(df, cents).collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in ivf_assign(df, cents).collect()}
    assert a1 == a2
    assert set(a1.values()) <= set(range(8))


def test_ivf_full_probe_equals_exact(emb):
    df, vecs = emb
    cents = train_ivf_centroids(df, k=8, sample=N)
    q = list(vecs[7])
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    full = [r["vec_id"] for r in ivf_topk(df, cents, q, k=10, nprobe=8).collect()]
    assert full == exact


def test_ivf_partial_probe_recall(emb):
    df, vecs = emb
    cents = train_ivf_centroids(df, k=8, sample=N)
    q = list(vecs[7])
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(df, cents, q, k=10, nprobe=2).collect()}
    # clustered data: nprobe=2 of 8 should recall most true neighbors
    assert len(exact & approx) >= 7


def test_embedding_dup_pairs_matches_numpy(emb):
    df, vecs = emb
    X = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = np.round(X @ X.T, 4)
    exp = {
        (i, j)
        for i in range(N)
        for j in range(i + 1, N)
        if S[i, j] >= 0.9
    }
    got = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(df, 0.9).collect()}
    assert got == exp and len(exp) > 0
