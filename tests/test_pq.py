"""Product quantization (pq_train / pq_assign / pq_adc_topk)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from sparkcollector.operators.similarity import (
    pq_adc_topk,
    pq_assign,
    pq_train,
)

DIM = 16
M = 4
N = 240


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((6, DIM)) * 4
    vecs = np.array(
        [centers[i % 6] + rng.standard_normal(DIM) * 0.5 for i in range(N)]
    )
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


def test_pq_assign_shape_and_determinism(emb):
    df, _ = emb
    books = pq_train(df, m=M, k=8, sample=N, iters=3)
    assert len(books) == M and len(books[0]) == 8
    a = pq_assign(df, books).select("vec_id", "codes").collect()
    b = pq_assign(df, books).select("vec_id", "codes").collect()
    assert sorted(map(tuple, ((r[0], tuple(r[1])) for r in a))) == sorted(
        map(tuple, ((r[0], tuple(r[1])) for r in b))
    )
    for r in a:
        assert len(r["codes"]) == M
        assert all(0 <= c < 8 for c in r["codes"])


def test_pq_exact_when_vectors_are_centroids(spark):
    # a vector that IS a centroid in every subspace has ADC distance to
    # itself exactly 0 and reconstructs losslessly
    vecs = [[float(i * 10 + j) for j in range(DIM)] for i in range(4)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    dsub = DIM // M
    books = [
        [v[j * dsub : (j + 1) * dsub] for v in vecs] for j in range(M)
    ]
    codes = pq_assign(df, books)
    got = pq_adc_topk(codes, books, vecs[2], topk=1).collect()
    assert got[0]["vec_id"] == 2 and got[0]["adc_dist"] == 0.0


def test_pq_adc_recall_vs_exact(emb):
    df, vecs = emb
    books = pq_train(df, m=M, k=16, sample=N, iters=5)
    codes = pq_assign(df, books)
    q = [float(x) for x in vecs[7]]
    got = [r["vec_id"] for r in pq_adc_topk(codes, books, q, topk=40).collect()]
    exact = np.argsort(((vecs - np.array(q)) ** 2).sum(axis=1))[:10]
    # within a tight cluster PQ cannot rank finer than the quantization
    # cell, so the honest criteria are: (a) every ADC hit is from the
    # query's true cluster, (b) recall@40 over the exact top-10 is high,
    # (c) the query's own vector ranks first
    assert all(v % 6 == 7 % 6 for v in got), got
    overlap = len(set(got) & set(int(i) for i in exact))
    assert overlap >= 8, (overlap, got, exact)
    assert got[0] == 7
