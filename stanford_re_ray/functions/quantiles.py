"""Exact distributed quantiles for quantized value domains.

``q30_median_by_flag`` documents the caveat of the gather-based median:
every group's raw rows land in one task.  For values with a bounded
quantization (money in cents, timestamps in seconds, token counts — most
columns a data pipeline takes percentiles of), the scalable exact shape
is a HISTOGRAM: count per (group, quantized value).  The shuffle then
moves one row per distinct (group, value) — bounded by the value domain,
not the row count — and the per-group interpolation walk is over that
same bounded histogram.  10^12 rows of prices still reduce to ≤ a few
million histogram cells per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def exact_quantiles(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    scale: int = 100,
) -> ray.data.Dataset:
    """Per-``key`` exact interpolated quantiles of ``value_col``, assuming
    values are exact multiples of ``1/scale`` (e.g. ``scale=100`` for
    prices in cents — the round-trip ``round(v*scale)/scale`` must be
    identity, which callers own).

    Interpolation follows SQL ``quantile_cont`` / numpy ``linear``:
    ``pos=(n-1)q``; result ``lo + (pos-⌊pos⌋)(hi-lo)``.

    Shape: per-batch Arrow group_by (key, quantized) combiner → one
    (key, quantized) groupby SUM → per-key cumulative walk over the
    histogram.  Exact at any parallelism; no group ever gathers raw rows.
    """
    from ray.data.aggregate import Sum

    def combine(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        q = pc.round(pc.multiply(pc.cast(v, pa.float64()), float(scale)))
        t = pa.table({key: batch.column(key),
                      "__q": pc.cast(q, pa.int64())})
        g = t.group_by([key, "__q"]).aggregate([([], "count_all")])
        cnt = g.column(g.schema.names[-1])
        return pa.table({key: g.column(key), "__q": g.column("__q"),
                         "n": pc.cast(cnt, pa.int64())})

    hist = (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby([key, "__q"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def walk(g: pd.DataFrame) -> pa.Table:
        from ..schema import pd_to_arrow

        g = g.sort_values("__q", kind="mergesort")
        vals = g["__q"].to_numpy(dtype=np.float64) / scale
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        out = {key: [g[key].iloc[0]], "n_rows": np.array([n], dtype=np.int64)}
        for q in quantiles:
            pos = (n - 1) * q
            lo_i = int(np.floor(pos))
            hi_i = int(np.ceil(pos))
            # index into the expanded sorted sequence via the histogram
            lo = vals[np.searchsorted(cum, lo_i + 1)]
            hi = vals[np.searchsorted(cum, hi_i + 1)]
            out[f"p{int(round(q * 100)):02d}"] = [
                round(float(lo + (pos - lo_i) * (hi - lo)), 6)]
        return pd_to_arrow(pd.DataFrame(out))

    return hist.groupby(key).map_groups(walk, batch_format="pandas")


def mad_outliers(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    scale: int = 100,
    k_mad: int = 3,
) -> pa.Table:
    """Robust per-group outlier statistics: lower median, median absolute
    deviation (MAD), and the count of rows beyond ``k_mad``·MAD — the
    data-cleaning primitive that doesn't blow up on the outliers it is
    hunting (unlike mean/std).

    All integer arithmetic on quantized values (half-up cents), so the
    result is bit-deterministic and exactly SQL-checkable.  Shape: two
    histogram passes (count per (group, cents), then count per (group,
    |cents − median|)) — each shuffles one row per DISTINCT cell, never
    raw rows; medians are rank ``(n+1)//2`` walks over the bounded
    histograms; the group→median map between passes is a groups-sized
    broadcast."""
    from ray.data.aggregate import Sum

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy().astype(np.float64)
        c = np.floor(v * float(scale) + 0.5).astype(np.int64)
        t = pa.table({key: batch.column(key), "__c": pa.array(c)})
        g = t.group_by([key, "__c"]).aggregate([([], "count_all")])
        return pa.table({key: g.column(key), "__c": g.column("__c"),
                         "n": pc.cast(g.column(g.schema.names[-1]),
                                      pa.int64())})

    hist1 = (ds.map_batches(cents, batch_format="pyarrow")
             .groupby([key, "__c"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())

    med_map: dict = {}
    for gval, sub in hist1.groupby(key, sort=False):
        sub = sub.sort_values("__c")
        cum = sub["n"].cumsum().to_numpy()
        r = (int(cum[-1]) + 1) // 2
        med_map[gval] = int(sub["__c"].to_numpy()[
            np.searchsorted(cum, r)])
    med_ref = ray.put(med_map)

    def devs(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import fetch

        mm = fetch(med_ref)
        v = batch.column(value_col).to_numpy().astype(np.float64)
        c = np.floor(v * float(scale) + 0.5).astype(np.int64)
        med = np.array([mm[g] for g in batch.column(key).to_pylist()],
                       dtype=np.int64)
        d = np.abs(c - med)
        t = pa.table({key: batch.column(key), "__d": pa.array(d)})
        g = t.group_by([key, "__d"]).aggregate([([], "count_all")])
        return pa.table({key: g.column(key), "__d": g.column("__d"),
                         "n": pc.cast(g.column(g.schema.names[-1]),
                                      pa.int64())})

    hist2 = (ds.map_batches(devs, batch_format="pyarrow")
             .groupby([key, "__d"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())

    rows = []
    for gval, sub in sorted(hist2.groupby(key, sort=False),
                            key=lambda kv: kv[0]):
        sub = sub.sort_values("__d")
        dv = sub["__d"].to_numpy(dtype=np.int64)
        nn = sub["n"].to_numpy(dtype=np.int64)
        cum = nn.cumsum()
        total = int(cum[-1])
        mad = int(dv[np.searchsorted(cum, (total + 1) // 2)])
        n_out = int(nn[dv > k_mad * mad].sum())
        rows.append((gval, med_map[gval], mad, n_out, total))
    return pa.table({
        key: pa.array([r[0] for r in rows]),
        "median_q": pa.array([r[1] for r in rows], pa.int64()),
        "mad_q": pa.array([r[2] for r in rows], pa.int64()),
        "n_outliers": pa.array([r[3] for r in rows], pa.int64()),
        "n_rows": pa.array([r[4] for r in rows], pa.int64()),
    })


def equi_depth_histogram(
    ds: "ray.data.Dataset",
    value_col: str,
    n_bins: int = 10,
) -> pa.Table:
    """Exact equi-depth (equal-frequency) histogram of an integer
    column: ``n_bins`` bins of (near-)equal ROW counts with their value
    ranges — the statistics a range partitioner / sort-based shuffle
    planner needs, where q123's equi-WIDTH bins mislead under skew.

    Bin sizes follow SQL NTILE exactly: ``n // B`` rows per bin, the
    first ``n mod B`` bins one larger.  Ties never matter — a bin's
    (count, min, max) depends only on the sorted multiset, not on how
    equal values split across the boundary — so the NTILE oracle is
    deterministic.  Shape: per-batch (value → count) combiner partials,
    ONE value-domain-bounded groupby SUM (the histogram contract of
    this module: shuffle rows = distinct values, never data rows), and
    a closed-form walk — bin edges are just value-at-position lookups
    (``searchsorted`` over the cumulative counts), so the final step
    reads one sorted histogram, not the data.  Returns
    (bin, n_rows, min_val, max_val)."""
    from ray.data.aggregate import Sum

    from ..schema import pd_to_arrow

    def combine(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    hist = (ds.map_batches(combine, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("cnt", alias_name="cnt")))

    def walk(g: pd.DataFrame):
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        base, extra = divmod(n, n_bins)
        sizes = np.full(n_bins, base, np.int64)
        sizes[:extra] += 1
        sizes = sizes[sizes > 0]
        lo = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        hi = np.cumsum(sizes) - 1          # inclusive last position
        min_v = v[np.searchsorted(cum, lo, side="right")]
        max_v = v[np.searchsorted(cum, hi, side="right")]
        return pd_to_arrow(pd.DataFrame({
            "bin": np.arange(len(sizes), dtype=np.int64),
            "n_rows": sizes,
            "min_val": min_v,
            "max_val": max_v}))

    # single-group walk: input is the value-domain histogram (bounded),
    # never row-scale — the module's documented contract
    out = (hist.map_batches(
               lambda t: t.append_column("__g", pa.array(
                   np.zeros(t.num_rows, np.int32))),
               batch_format="pyarrow")
           .groupby("__g")
           .map_groups(lambda g: walk(g.drop(columns="__g")),
                       batch_format="pandas"))
    return out.to_pandas().sort_values("bin").reset_index(drop=True)
