"""Distributed k-means (Lloyd) over an embedding column — the trained
codebook counterpart to ``similarity.ivf_build``'s deterministic
centroids (an IVF index in production wants data-dependent lists).

Scale shape per iteration: centroids broadcast once (``ray.put``, fetched
per worker), assignment is one matmul per batch, and each batch emits at
most k partial rows (count + per-dimension running sum as a list column)
— the classic combiner form, so the shuffle moves k × n_batches tiny
rows no matter how many vectors stream through.  The driver holds only
the (k × dim) codebook.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .similarity import _to_matrix


def _assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid by squared L2; ties → lowest centroid id
    (np.argmin's first-index rule — matches the oracle's
    ORDER BY (d2, centroid))."""
    # ||v-c||² = ||v||² - 2 v·c + ||c||², computed per (v, c) pair the
    # same way the SQL oracle does (explicit difference) to keep the
    # float rounding comparable
    d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_fit(
    embeddings: ray.data.Dataset,
    k: int = 4,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd's algorithm; returns (centroids (k, dim), member counts (k,))
    after ``n_iter`` assignment+update rounds.

    Init is Forgy on a deterministic choice: the k vectors with the
    SMALLEST ids (distributed sort + limit — no RNG, reproducible at any
    parallelism).  An empty cluster keeps its previous centroid (the
    standard convention).  Updates use exact partial sums, so the result
    is partition-invariant up to float associativity in the final k-row
    reduce — and that reduce is over ≤ k × n_batches rows combined in
    sorted batch order, deterministic for a fixed block count."""
    first = embeddings.sort(id_col).limit(k).take_all()
    cents = np.asarray([r[vec_col] for r in first], dtype=np.float64)
    dim = cents.shape[1] if cents.size else 0
    counts = np.zeros(k, dtype=np.int64)

    for _ in range(n_iter):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            from ..state.broadcast import fetch

            cc = fetch(_ref)
            vecs = _to_matrix(batch.column(vec_col))
            if vecs.size == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "bkey": pa.array([], pa.int64()),
                })
            lab = _assign(vecs, cc)
            rows_c, rows_n, rows_s = [], [], []
            for c in np.unique(lab):
                sel = vecs[lab == c]
                rows_c.append(int(c))
                rows_n.append(int(sel.shape[0]))
                rows_s.append(sel.sum(axis=0).tolist())
            bkey = int(batch.column(id_col)[0].as_py())
            return pa.table({
                "cluster": pa.array(rows_c, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "vsum": pa.array(rows_s, pa.list_(pa.float64())),
                "bkey": pa.array([bkey] * len(rows_c), pa.int64()),
            })

        parts = embeddings.map_batches(
            partial, batch_format="pyarrow").take_all()
        # deterministic reduce order: by (cluster, first id of the batch)
        parts.sort(key=lambda r: (r["cluster"], r["bkey"]))
        new_c = cents.copy()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim))
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["n"]
        for c in range(k):
            if counts[c]:
                new_c[c] = sums[c] / counts[c]
        cents = new_c
    return cents, counts


def kmeans_table(
    embeddings: ray.data.Dataset,
    k: int = 4,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """(cluster, dim, mean_q, n_members) long-form codebook — the
    SQL-comparable rendering of ``kmeans_fit`` (means rounded to 6 dp)."""
    cents, counts = kmeans_fit(embeddings, k=k, n_iter=n_iter,
                               id_col=id_col, vec_col=vec_col)
    dim = cents.shape[1] if cents.size else 0
    return pa.table({
        "cluster": pa.array(np.repeat(np.arange(k), dim).astype(np.int64)),
        "dim": pa.array(np.tile(np.arange(1, dim + 1), k).astype(np.int64)),
        "mean_q": pa.array(np.round(cents, 6).ravel()),
        "n_members": pa.array(np.repeat(counts, dim).astype(np.int64)),
    })
