"""Sketch operators (functions/sketch.py): count-min, Bloom, HLL —
merge associativity (partition invariance), one-sided error guarantees,
and estimate math pinned against brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from stanford_re_ray.functions.sketch import (
    bloom_build,
    bloom_membership,
    cms_build,
    cms_estimate,
    hll_distinct_tokens,
    hll_estimate_q,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]


def _docs(blocks: int) -> rd.Dataset:
    # deterministic Zipf-ish corpus: word i appears ~ 2^(10-i) times
    texts = []
    for d in range(30):
        toks = [WORDS[i] for i in range(10)
                for _ in range(max(1, (1 << (9 - i)) // 30))]
        texts.append(" ".join(toks[d % 7:]))
    tbl = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    return rd.from_arrow(tbl).repartition(blocks)


def _exact_counts() -> dict[str, int]:
    import collections
    c: collections.Counter = collections.Counter()
    for t in _docs(1).take_all():
        c.update(t["text"].split())
    return dict(c)


def test_cms_overestimates_and_partition_invariant(ray_session):
    exact = _exact_counts()
    s1 = cms_build(_docs(1))
    s4 = cms_build(_docs(4))
    # merge is an associative SUM → identical sketch at any parallelism
    np.testing.assert_array_equal(s1, s4)
    toks = sorted(exact)
    est = cms_estimate(s1, toks)
    for t, e in zip(toks, est):
        assert e >= exact[t]          # one-sided guarantee
    # total mass conserved per row
    assert (s1.sum(axis=1) == sum(exact.values())).all()


def test_bloom_no_false_negatives(ray_session):
    build = _docs(2)
    bitmap = bloom_build(build, "text")
    # probing the build set itself must return every row
    out = bloom_membership(_docs(3), bitmap, "text").to_pandas()
    assert len(out) == 30
    # a disjoint probe set mostly misses (FP possible but bounded)
    other = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array([f"unseen text number {i}" for i in range(50)],
                         pa.string())}))
    fp = bloom_membership(other, bitmap, "text").to_pandas()
    assert len(fp) <= 5


def test_hll_partition_invariant_and_close(ray_session):
    q1, regs1 = hll_distinct_tokens(_docs(1))
    q4, regs4 = hll_distinct_tokens(_docs(4))
    assert q1 == q4 and regs1 == regs4     # MAX merge is associative
    n_true = len(_exact_counts())          # 10 distinct words
    est = q1 / 1000.0
    # 256 registers on 10 distinct values → linear counting, very tight
    assert abs(est - n_true) / n_true < 0.15


def test_hll_estimate_matches_brute_force():
    from stanford_re_ray.functions.hashing import stable_u64

    vals = [f"item{i}" for i in range(5000)]
    regs: dict[int, int] = {}
    for v in vals:
        h = stable_u64(v)
        b, rest = h % 256, h // 256
        rho = 57 - rest.bit_length() if rest else 57
        if regs.get(b, 0) < rho:
            regs[b] = rho
    est = hll_estimate_q(regs) / 1000.0
    assert abs(est - 5000) / 5000 < 0.10   # ~1.04/sqrt(256) ≈ 6.5% std


@pytest.mark.parametrize("blocks", [1, 4])
def test_pagerank_matches_serial_and_partition_invariant(ray_session,
                                                         blocks):
    """Integer fixed-point PageRank == a serial numpy reference with the
    same floors, at any partitioning."""
    from stanford_re_ray.pipelines.graph_ops import pagerank

    # ring + one hub: node 0 receives from everyone
    edges = [(i, (i + 1) % 10) for i in range(10)] + \
            [(i, 0) for i in range(1, 10)]
    tbl = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(blocks)
    out = pagerank(ds, n_iter=3).to_pandas()

    SCALE, N = 1_000_000_000, 10
    deg = {i: (2 if i else 1) for i in range(10)}
    r = {i: SCALE // N for i in range(10)}
    base = (15 * SCALE) // (100 * N)
    for _ in range(3):
        s = {i: 0 for i in range(10)}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {i: base + 85 * s[i] // 100 for i in range(10)}
    assert dict(zip(out["node"], out["rank_q"])) == r
    # the hub out-ranks every ring node
    assert r[0] == max(r.values())
    # the fully-distributed join path (rank vector "too big" to
    # broadcast) must be bit-identical to the broadcast fast path
    import stanford_re_ray.pipelines.graph_ops as go
    old = go.BROADCAST_RANK_LIMIT
    go.BROADCAST_RANK_LIMIT = 0
    try:
        out2 = pagerank(ds, n_iter=3).to_pandas()
    finally:
        go.BROADCAST_RANK_LIMIT = old
    assert dict(zip(out2["node"], out2["rank_q"])) == r


@pytest.mark.parametrize("blocks", [1, 4])
def test_pagerank_dangling_redistribution(ray_session, blocks):
    """redistribute_dangling=True == a serial reference that floor-splits
    the dangling-node rank sum into every damped update; broadcast and
    Pregel paths bit-identical."""
    from stanford_re_ray.pipelines.graph_ops import pagerank

    # chain into two sinks: 3 and 4 have no out-edges (dangling)
    edges = [(0, 1), (1, 2), (2, 3), (0, 4), (1, 4)]
    tbl = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(blocks)
    out = pagerank(ds, n_iter=3, redistribute_dangling=True).to_pandas()

    SCALE, N = 1_000_000_000, 5
    deg = {0: 2, 1: 2, 2: 1}
    r = {i: SCALE // N for i in range(5)}
    base = (15 * SCALE) // (100 * N)
    for _ in range(3):
        s = {i: 0 for i in range(5)}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        share = (r[3] + r[4]) // N
        r = {i: base + 85 * (s[i] + share) // 100 for i in range(5)}
    assert dict(zip(out["node"], out["rank_q"])) == r
    # dangling mass actually moved: ranks differ from the dropped-mass mode
    out_drop = pagerank(ds, n_iter=3).to_pandas()
    assert dict(zip(out_drop["node"], out_drop["rank_q"])) != r

    import stanford_re_ray.pipelines.graph_ops as go
    old = go.BROADCAST_RANK_LIMIT
    go.BROADCAST_RANK_LIMIT = 0
    try:
        out2 = pagerank(ds, n_iter=3, redistribute_dangling=True).to_pandas()
    finally:
        go.BROADCAST_RANK_LIMIT = old
    assert dict(zip(out2["node"], out2["rank_q"])) == r


@pytest.mark.parametrize("dangling", [False, True])
def test_pagerank_personalized(ray_session, dangling):
    """seeds=: teleport (and dangling mass) floor-split over the seed
    set only; serial reference; broadcast and Pregel paths identical."""
    from stanford_re_ray.pipelines.graph_ops import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (0, 4)]
    tbl = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(2)
    seeds = [1, 4, 99]            # 99 not in graph -> ignored
    out = pagerank(ds, n_iter=3, seeds=seeds,
                   redistribute_dangling=dangling).to_pandas()

    SCALE, N = 1_000_000_000, 5
    S = {1, 4}
    deg = {0: 2, 1: 1, 2: 2, 3: 1}
    base = (15 * SCALE) // (100 * len(S))
    r = {i: SCALE // N for i in range(5)}
    for _ in range(3):
        s = {i: 0 for i in range(5)}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        share = (r[4] // len(S)) if dangling else 0   # node 4 dangles
        r = {i: (base if i in S else 0)
             + 85 * (s[i] + (share if i in S else 0)) // 100
             for i in range(5)}
    assert dict(zip(out["node"], out["rank_q"])) == r

    import stanford_re_ray.pipelines.graph_ops as go
    old = go.BROADCAST_RANK_LIMIT
    go.BROADCAST_RANK_LIMIT = 0
    try:
        out2 = pagerank(ds, n_iter=3, seeds=seeds,
                        redistribute_dangling=dangling).to_pandas()
    finally:
        go.BROADCAST_RANK_LIMIT = old
    assert dict(zip(out2["node"], out2["rank_q"])) == r

    with pytest.raises(ValueError):
        pagerank(ds, n_iter=1, seeds=[1234])


def test_hdr_quantiles_error_bound(ray_session):
    """The HDR sketch's p50/p90/p99 must sit within the guaranteed 1/8
    relative error of the exact quantiles."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stanford_re_ray.functions.sketch import hdr_quantiles

    rng = np.random.default_rng(3)
    vals = (rng.lognormal(8, 1.2, size=20_000) * 100).astype(np.int64) + 1
    grp = np.where(np.arange(len(vals)) % 2 == 0, "a", "b")
    ds = rd.from_arrow(pa.table({"g": pa.array(grp),
                                 "v": pa.array(vals)})).repartition(8)
    out = hdr_quantiles(ds, value_col="v", group_col="g").to_pandas()
    assert len(out) == 6
    for gval in ("a", "b"):
        sub = vals[grp == gval]
        for q_ppt in (500, 900, 990):
            exact = np.quantile(sub, q_ppt / 1000)
            got = out[(out["g"] == gval)
                      & (out["q_ppt"] == q_ppt)]["approx_q"].iloc[0]
            assert got <= exact * 1.0 + 1          # lower bound of bin
            assert got >= exact * (1 - 0.125) - 1  # 1/8 relative error


@pytest.mark.parametrize("blocks", [1, 4])
def test_cms_join_size_bounds_and_exactness(ray_session, blocks):
    import numpy as np

    from stanford_re_ray.functions.sketch import (cms_build_keys,
                                                  cms_join_size)

    a_keys = [1, 1, 1, 2, 2, 3, 5, 5, 5, 5]
    b_keys = [1, 2, 2, 2, 3, 3, 4]
    exact = sum(a_keys.count(k) * b_keys.count(k) for k in set(a_keys))
    ta = pa.table({"k": pa.array(a_keys, pa.int64())})
    tb = pa.table({"k": pa.array(b_keys, pa.int64())})
    sa = cms_build_keys(rd.from_arrow(ta).repartition(blocks), "k",
                        width=64, depth=4)
    sb = cms_build_keys(rd.from_arrow(tb).repartition(blocks), "k",
                        width=64, depth=4)
    est = cms_join_size(sa, sb)
    # CMS inner product never underestimates; at width 64 with 5 keys
    # a collision-free row exists, so the estimate is exact
    assert est == exact
    # degenerate width forces collisions: still an upper bound
    sa1 = cms_build_keys(rd.from_arrow(ta), "k", width=2, depth=2)
    sb1 = cms_build_keys(rd.from_arrow(tb), "k", width=2, depth=2)
    assert cms_join_size(sa1, sb1) >= exact
    # partition invariance
    sa2 = cms_build_keys(rd.from_arrow(ta).repartition(3), "k",
                         width=64, depth=4)
    np.testing.assert_array_equal(sa, sa2)
