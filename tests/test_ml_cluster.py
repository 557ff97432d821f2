"""k-means cross-check: the Spark/oracle fixpoint must equal an
independent numpy reimplementation of the same quantized recipe."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from p4_mapreduce_spark.operators.ml_cluster import (
    _FIT_SAMPLE,
    _ITERS,
    _K,
    _SCALE,
)
from p4_mapreduce_spark.registry import load_all


def _fq(x):
    return np.floor(x * _SCALE + 0.5) / _SCALE


def _numpy_kmeans(ids: np.ndarray, vecs: np.ndarray) -> np.ndarray:
    """Independent reimplementation of the sampled-fit recipe: init =
    the _K lowest vec_ids (rows arrive vec_id-sorted), update
    iterations over the _FIT_SAMPLE rows with the lowest
    md5(str(vec_id)) (tie-break vec_id), final assignment over all."""
    import hashlib

    cents = vecs[:_K].copy()
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(str(int(ids[i])).encode()).hexdigest(),
            int(ids[i]),
        ),
    )[:_FIT_SAMPLE]
    sample = vecs[order]
    for _ in range(_ITERS):
        # quantized squared distance, argmin ties -> lowest centroid id
        d = _fq(((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
        assign = d.argmin(axis=1)  # argmin returns first minimum
        for j in range(_K):
            mask = assign == j
            if mask.any():
                su = (
                    np.floor(sample[mask] * _SCALE + 0.5)
                    .astype(np.int64)
                    .sum(axis=0)
                )
                cents[j] = np.array(
                    [
                        math.floor(
                            (s / _SCALE) / mask.sum() * _SCALE + 0.5
                        )
                        / _SCALE
                        for s in su
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
    expected = _numpy_kmeans(emb.vec_id.to_numpy(), vecs)
    assert (pdf.cluster.to_numpy() == expected).all()
    # sanity: more than one cluster actually used
    assert pdf.cluster.nunique() > 1
