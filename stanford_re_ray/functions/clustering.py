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


def forgy_min_ids(
    embeddings: ray.data.Dataset,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """The k vectors with the SMALLEST ids, without sorting the table:
    each batch emits its own ≤ k candidate rows (np.argpartition — no
    all-to-all Sort operator in the plan), then a driver-side merge over
    ≤ k × n_batches rows picks the global min-k.  Same output as
    ``sort(id_col).limit(k)`` at any parallelism; same pattern as
    ``similarity.brute_force_topk``'s per-batch partial top-k."""

    def partial(batch: pa.Table) -> pa.Table:
        sel = batch.select([id_col, vec_col])
        if batch.num_rows <= k:
            return sel
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        idx = np.argpartition(ids, k - 1)[:k]
        return sel.take(pa.array(np.sort(idx), pa.int64()))

    rows = embeddings.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return np.asarray([r[vec_col] for r in rows[:k]], dtype=np.float64)


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
    SMALLEST ids (per-batch partial min-k + tiny driver merge — no RNG,
    no all-to-all sort, reproducible at any parallelism).  An empty
    cluster keeps its previous centroid (the standard convention).
    Updates use exact partial sums, so the result is partition-invariant
    up to float associativity in the final k-row reduce — and that reduce
    is over ≤ k × n_batches rows combined in sorted batch order,
    deterministic for a fixed block count."""
    cents = forgy_min_ids(embeddings, k, id_col=id_col, vec_col=vec_col)
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


def semdedup(
    embeddings: ray.data.Dataset,
    k: int = 4,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means clustering + within-cluster cosine near-dup
    removal.  Clustering bounds the quadratic: pairwise similarity is only
    ever computed INSIDE a cluster, so at corpus scale k grows with the
    data and per-cluster work stays constant — that bounding is the
    paper's entire point.

    Deterministic, SQL-checkable variant: cluster assignment is nearest
    Forgy centroid (the k smallest-id vectors, squared-L2, ties to the
    lower centroid — identical to ``kmeans_fit``'s init / the q41 oracle),
    and a vector is dropped iff ANY lower-id vector in its cluster has
    cosine ≥ threshold (keep-earliest, non-recursive; the paper keeps the
    member closest to the centroid — an arbitrary representative choice
    this variant replaces with the id order so the oracle needs no
    recursion).

    Scale shape: centroids broadcast via ``ray.put``; assignment is one
    matmul per batch; the per-cluster verify runs under
    ``groupby("cluster").map_groups`` so only same-cluster vectors ever
    meet.  Returns (vec_id, cluster, keep).

    ``centroids``: pass a trained codebook (e.g. ``kmeans_fit(...)[0]``)
    for production use — clusters become data-dependent and k scales with
    the corpus.  Default (None) is the deterministic Forgy min-id init
    the q55 oracle pins.
    """
    if centroids is None:
        cents = forgy_min_ids(embeddings, k, id_col=id_col, vec_col=vec_col)
    else:
        cents = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(cents)

    def assign_batch(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..state.broadcast import fetch

        cc = fetch(_ref)
        vecs = _to_matrix(batch.column(vec_col))
        lab = (_assign(vecs, cc) if vecs.size
               else np.zeros(0, dtype=np.int64))
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(lab, pa.int64()),
            vec_col: batch.column(vec_col),
        })

    assigned = embeddings.map_batches(assign_batch, batch_format="pyarrow")

    def dedup_cluster(df: pd.DataFrame) -> pa.Table:
        from ..schema import pd_to_arrow

        df = df.sort_values(id_col).reset_index(drop=True)
        vecs = np.array(df[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        nv = vecs / norms
        # keep[i] ⇔ no j < i with cosine ≥ threshold.  Blockwise rows ×
        # earlier-rows matmul: peak memory is block × n floats, never the
        # full n × n similarity matrix (a 50k-vector cluster would need
        # 20 GB dense) — same comparisons, identical output
        n = len(df)
        keep = np.ones(n, dtype=bool)
        block = 512
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            sim = nv[i0:i1] @ nv[:i1].T          # (block, i1)
            hit = sim >= threshold
            # mask j >= i within the block's own columns
            local = np.arange(i0, i1)
            hit[:, i0:i1] &= local[None, :] < local[:, None]
            keep[i0:i1] = ~hit.any(axis=1)
        return pd_to_arrow(pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "cluster": df["cluster"].astype("int64"),
            "keep": keep,
        }))

    return assigned.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pandas")


def embedding_moments(emb: ray.data.Dataset, dim: int,
                      vec_col: str = "embedding",
                      quantum: int = 1_000_000) -> ray.data.Dataset:
    """Distributed second-moment (Gram) matrix of an embedding column —
    the shuffle-free building block for PCA / whitening / covariance at
    corpus scale.

    Each batch quantizes its vectors to integers
    (``floor(x·quantum + 0.5)``, the engine's half-up convention) and
    emits ONE combiner partial of at most dim·(dim+1)/2 rows
    (``i <= j``): the exact int64 products ``Σ x_qi·x_qj`` plus the
    per-dimension sums ``Σ x_qi`` (as the ``j = -1`` rows) and the row
    count (``i = j = -1``).  The global reduce is an associative integer
    SUM, so the matrix is bit-identical at any parallelism and the SQL
    twin reproduces it from the same quantized values.  Consumers derive
    covariance as ``(n·sxy − sx·sy) / (n·(n−1)·quantum²)`` — bigint
    arithmetic at the (tiny) matrix level, never over the data.

    Overflow headroom: |x_q| ≈ quantum, so each product is ≤ quantum²
    = 1e12 and int64 holds ~9.2e6 accumulated rows per dimension pair
    PER PARTIAL; the global Sum is over per-batch partials, so the bound
    applies to total rows ~9e6 at quantum=1e6.  For 100 TB corpora pass
    a smaller quantum (1e3 → 9e12 rows) — the oracle scales with it."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "sxy": pa.array([], pa.int64())})
        m = _to_matrix(batch.column(vec_col))
        q = np.floor(m * float(quantum) + 0.5).astype(np.int64)
        gram = q.T @ q  # (dim, dim) exact int64
        iu, ju = np.triu_indices(dim)
        s = q.sum(axis=0)
        i = np.concatenate([iu, np.arange(dim), [-1]]).astype(np.int64)
        j = np.concatenate([ju, np.full(dim, -1), [-1]]).astype(np.int64)
        v = np.concatenate([gram[iu, ju], s, [np.int64(len(q))]])
        return pa.table({"i": pa.array(i), "j": pa.array(j),
                         "sxy": pa.array(v.astype(np.int64))})

    from ray.data.aggregate import Sum

    return (emb.map_batches(partial, batch_format="pyarrow")
            .groupby(["i", "j"]).aggregate(Sum("sxy", alias_name="sxy")))


def pq_train(
    embeddings: ray.data.Dataset,
    m: int = 4,
    k: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks: split each vector into ``m``
    contiguous subvectors and run the distributed ``kmeans_fit`` on
    each subspace independently — returns ``(m, k, dim // m)``
    centroids.  Training cost is m sweeps of the k-means combiner
    (each itself shuffle-free: ≤ k partial rows per batch); production
    practice trains codebooks on a sample, encodes the full corpus —
    the encode side (``pq_encode``) is the one that must stream.
    Determinism: inherits kmeans_fit's (Forgy min-id init, fixed
    reduce order)."""
    subs = []
    for j in range(m):

        def slice_j(batch: pa.Table, _j=j) -> pa.Table:
            vecs = _to_matrix(batch.column(vec_col))
            dsub = vecs.shape[1] // m if vecs.size else 0
            part = vecs[:, _j * dsub:(_j + 1) * dsub]
            return pa.table({
                id_col: batch.column(id_col),
                vec_col: pa.array(list(part), pa.list_(pa.float64())),
            })

        sub_ds = embeddings.map_batches(slice_j, batch_format="pyarrow")
        cents, _ = kmeans_fit(sub_ds, k=k, n_iter=n_iter,
                              id_col=id_col, vec_col=vec_col)
        subs.append(cents)
    return np.stack(subs)


def pq_encode(
    embeddings: ray.data.Dataset,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    err_scale: int = 1_000_000,
    keep_cols: "list[str] | None" = None,
) -> ray.data.Dataset:
    """Encode each vector as ``m`` codebook indices (one per subspace,
    nearest centroid by squared L2, ties → lowest code) plus the total
    squared reconstruction error quantized to ``err_scale`` — the
    16-byte-per-vector compressed form an IVF-PQ index scans instead of
    raw floats.  One broadcast of the ``(m, k, dsub)`` codebooks
    (``ray.put`` once, fetched per worker), one matmul-shaped distance
    per subspace per batch, zero shuffles; output columns ``code_0 ..
    code_{m-1}`` ride per-row so a later exact re-rank can rehydrate.
    ``keep_cols``: extra input columns to carry through unchanged
    (e.g. an ``ivf_list`` assignment for ``similarity.ivfpq_topk``).
    """
    ref = ray.put(np.ascontiguousarray(codebooks, dtype=np.float64))
    m = codebooks.shape[0]

    def encode(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..state.broadcast import fetch

        cb = fetch(_ref)
        vecs = _to_matrix(batch.column(vec_col))
        n = vecs.shape[0]
        dsub = cb.shape[2]
        cols = {id_col: batch.column(id_col)}
        for kc in keep_cols or ():
            cols[kc] = batch.column(kc)
        err = np.zeros(n, dtype=np.float64)
        for j in range(m):
            sub = vecs[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            code = np.argmin(d2, axis=1)
            err += d2[np.arange(n), code]
            cols[f"code_{j}"] = pa.array(code.astype(np.int64))
        cols["err_q"] = pa.array(
            np.floor(err * err_scale + 0.5).astype(np.int64))
        return pa.table(cols)

    return embeddings.map_batches(encode, batch_format="pyarrow")


def pq_topk(
    codes: ray.data.Dataset,
    codebooks: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    dist_scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes: each
    query precomputes an ``(m, k_cent)`` lookup table of subspace
    distances to every centroid ONCE; scanning a coded vector is then m
    table lookups + adds — no float vector math per row.  The LUT stack
    broadcasts via ``ray.put``; each batch emits ≤ k partial rows per
    query; one ``grouped_topk`` folds the partials.  Determinism: the
    m-term sum runs in fixed subspace order, ties break on the id
    column; distances ship quantized to ``dist_scale``."""
    from .relational import grouped_topk

    m, _, dsub = codebooks.shape
    q = np.asarray(query_vecs, dtype=np.float64)
    lut = np.stack([
        ((q[:, j * dsub:(j + 1) * dsub][:, None, :]
          - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        for j in range(m)
    ], axis=1)                                # (nq, m, k_cent)
    ref = ray.put(lut)
    nq = lut.shape[0]

    def scan(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..state.broadcast import fetch

        lt = fetch(_ref)
        n = batch.num_rows
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        code_mat = np.stack([
            batch.column(f"code_{j}").to_numpy(zero_copy_only=False)
            for j in range(m)
        ], axis=1)                            # (n, m)
        out_q, out_v, out_d = [], [], []
        for qi in range(nq):
            dist = np.zeros(n, dtype=np.float64)
            for j in range(m):                # fixed order: deterministic
                dist += lt[qi, j][code_mat[:, j]]
            # quantize BEFORE the partial selection and order by
            # (dist_q, id) — the same total order grouped_topk applies
            # globally, so a sub-quantum float tie at the rank-k
            # boundary can't make a batch drop the row the global
            # tie-break would have kept
            dq = np.floor(dist * dist_scale + 0.5).astype(np.int64)
            take = np.lexsort((ids, dq))[:k]
            out_q.append(np.full(len(take), qi, np.int64))
            out_v.append(ids[take])
            out_d.append(dq[take])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_col: pa.array(np.concatenate(out_v), pa.int64()),
            "dist_q": pa.array(np.concatenate(out_d), pa.int64()),
        })

    partials = codes.map_batches(scan, batch_format="pyarrow")
    return grouped_topk(partials, key="query_id", order_by="dist_q",
                        k=k, descending=False, tiebreak=[id_col])
