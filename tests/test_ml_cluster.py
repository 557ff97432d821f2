"""k-means cross-check: the Spark/oracle fixpoint must equal an
independent numpy reimplementation of the same quantized recipe."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from p4_mapreduce_spark.operators.ml_cluster import _ITERS, _K, _SCALE
from p4_mapreduce_spark.registry import load_all


def _fq(x):
    return np.floor(x * _SCALE + 0.5) / _SCALE


def _numpy_kmeans(vecs: np.ndarray) -> np.ndarray:
    cents = vecs[:_K].copy()
    for _ in range(_ITERS):
        # quantized squared distance, argmin ties -> lowest centroid id
        d = _fq(((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
        assign = d.argmin(axis=1)  # argmin returns first minimum
        for j in range(_K):
            mask = assign == j
            if mask.any():
                cents[j] = np.array(
                    [
                        math.floor(s / mask.sum() * _SCALE + 0.5) / _SCALE
                        for s in vecs[mask].sum(axis=0)
                    ]
                )
    d = _fq(((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    return d.argmin(axis=1)


def test_kmeans_matches_numpy(spark, sf_dir):
    pdf = (
        load_all()["kmeans_embedding_clusters"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    expected = _numpy_kmeans(vecs)
    assert (pdf.cluster.to_numpy() == expected).all()
    # sanity: more than one cluster actually used
    assert pdf.cluster.nunique() > 1
