"""Mergeable approximate sketches: count-min, Bloom filter, HyperLogLog.

At 100 TB the exact counterparts of these operators (global token counts,
membership joins, COUNT(DISTINCT)) all need a vocabulary- or corpus-sized
shuffle; a sketch replaces that with fixed-size state whose merge is
associative, so it composes with the engine's combiner-then-reduce
pattern: every batch emits a sparse partial (slot, value) table, one
small groupby merges them (SUM for count-min/Bloom bits, MAX for HLL
registers), and the driver folds the final KB-sized sketch.

Every sketch here is DETERMINISTIC cross-engine: slots/registers derive
from the md5 convention shared with DuckDB (``hashing.stable_u64(x)`` ==
``md5_number_upper(x)``), so each has an exact SQL oracle — the sketch
STATE and estimates are value-checked against DuckDB, not just bounded
by tests (the q47/q48/q49 entries in ``__ray_entry__``).

Per-token hashing is memoized per worker process (Zipf: the same tokens
recur in every batch), so steady-state cost is a dict probe per distinct
token per batch, not an md5.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .corpus import _tokenize_column
from .hashing import stable_u64

# --- count-min sketch -------------------------------------------------------

CMS_WIDTH = 1024
CMS_DEPTH = 4

_CMS_SLOT_CACHE: dict[str, tuple[int, ...]] = {}


def _cms_slots(token: str, depth: int, width: int) -> tuple[int, ...]:
    v = _CMS_SLOT_CACHE.get(token)
    if v is None:
        if len(_CMS_SLOT_CACHE) > (1 << 20):
            _CMS_SLOT_CACHE.clear()
        v = _CMS_SLOT_CACHE[token] = tuple(
            stable_u64(f"{j}\x00{token}") % width for j in range(depth))
    return v


def cms_build(docs: ray.data.Dataset, text_col: str = "text",
              width: int = CMS_WIDTH, depth: int = CMS_DEPTH) -> np.ndarray:
    """Count-min sketch of the corpus token stream → ``(depth, width)``
    int64 matrix.

    Shape: per-batch ``value_counts`` (distinct tokens only) → ``depth``
    (j, slot, n) rows per distinct token → one (j, slot) groupby SUM —
    the shuffle carries at most ``depth × batch_vocab`` int rows per
    batch and the merged sketch is ``depth × width`` ints regardless of
    corpus size.  Point estimates (min over rows) are upper bounds on
    the true counts with the classic (ε=e/width, δ=e^-depth) guarantee.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, flat = _tokenize_column(batch.column(text_col))
        if len(flat) == 0:
            return pa.table({"j": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vc = flat.value_counts()
        toks = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_pylist()
        js, slots, ns = [], [], []
        for t, c in zip(toks, cnts):
            for j, s in enumerate(_cms_slots(t, depth, width)):
                js.append(j)
                slots.append(s)
                ns.append(c)
        return pa.table({"j": pa.array(js, pa.int64()),
                         "slot": pa.array(slots, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    cells = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby(["j", "slot"]).aggregate(Sum("n", alias_name="cn"))
             .take_all())
    sketch = np.zeros((depth, width), dtype=np.int64)
    for r in cells:
        sketch[r["j"], r["slot"]] = r["cn"]
    return sketch


def cms_estimate(sketch: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point-query the sketch: ``min_j sketch[j, slot_j(token)]``."""
    depth, width = sketch.shape
    out = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        out[i] = min(sketch[j, s]
                     for j, s in enumerate(_cms_slots(t, depth, width)))
    return out


# --- Bloom filter -----------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_K = 3

_BLOOM_BIT_CACHE: dict[str, tuple[int, ...]] = {}


def _bloom_bits(key: str, k: int, m: int) -> tuple[int, ...]:
    v = _BLOOM_BIT_CACHE.get(key)
    if v is None:
        if len(_BLOOM_BIT_CACHE) > (1 << 20):
            _BLOOM_BIT_CACHE.clear()
        v = _BLOOM_BIT_CACHE[key] = tuple(
            stable_u64(f"{i}\x00{key}") % m for i in range(k))
    return v


def bloom_build(ds: ray.data.Dataset, col: str,
                m: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Bloom filter over a column → bool bitmap of length ``m``.

    Per batch only the DISTINCT set bit indices move (≤ ``k × batch
    distinct``, deduped again by the global ``unique``); the merged
    filter is ``m`` bits however large the build side is.  Use as the
    broadcast pre-pass of a dedup/membership join: no false negatives,
    false-positive rate ≈ ``(1 - e^{-kn/m})^k``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals = pc.unique(batch.column(col).combine_chunks()).to_pylist()
        bits = sorted({b for v in vals if v is not None
                       for b in _bloom_bits(v, k, m)})
        return pa.table({"bit": pa.array(bits, pa.int64())})

    set_bits = ds.map_batches(partial, batch_format="pyarrow").unique("bit")
    bitmap = np.zeros(m, dtype=bool)
    bitmap[np.asarray(sorted(set_bits), dtype=np.int64)] = True
    return bitmap


def bloom_membership(probe: ray.data.Dataset, bitmap: np.ndarray, col: str,
                     k: int = BLOOM_K) -> ray.data.Dataset:
    """Filter ``probe`` to rows whose ``col`` value MAY be in the filter
    (all ``k`` bits set).  The bitmap is broadcast once via ``ray.put``;
    each batch is one vectorized lookup — the probe side never shuffles.
    """
    m = len(bitmap)
    ref = ray.put(bitmap)

    def maybe(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..state.broadcast import fetch

        bm = fetch(_ref)
        vals = batch.column(col).to_pylist()
        mask = [v is not None and all(bm[b] for b in _bloom_bits(v, k, m))
                for v in vals]
        return batch.filter(pa.array(mask, pa.bool_()))

    return probe.map_batches(maybe, batch_format="pyarrow")


# --- HyperLogLog ------------------------------------------------------------

HLL_M = 256          # registers (bucket = low 8 bits of the 64-bit hash)
_HLL_REST_BITS = 56  # remaining bits scanned for the leading-zero rank


def _hll_rho(rest: int) -> int:
    """Rank of the first set bit of the 56-bit remainder (1-based), 57 if
    zero — ``57 - bit_length`` exactly mirrors the SQL oracle's
    ``length(format('{:b}', rest))``."""
    return (_HLL_REST_BITS + 1 - rest.bit_length()) if rest else \
        _HLL_REST_BITS + 1


_HLL_REG_CACHE: dict[str, tuple[int, int]] = {}


def _hll_register(value: str) -> tuple[int, int]:
    v = _HLL_REG_CACHE.get(value)
    if v is None:
        if len(_HLL_REG_CACHE) > (1 << 20):
            _HLL_REG_CACHE.clear()
        h = stable_u64(value)
        v = _HLL_REG_CACHE[value] = (h % HLL_M, _hll_rho(h // HLL_M))
    return v


def hll_distinct_tokens(docs: ray.data.Dataset, text_col: str = "text"
                        ) -> tuple[int, dict[int, int]]:
    """HyperLogLog estimate of the corpus's distinct token count →
    (quantized estimate ``floor(est·1000 + 0.5)``, register map).

    Shape: per-batch partial registers (≤ ``HLL_M`` (bucket, rho) rows —
    MAX is associative so partials merge in any order) → one tiny
    groupby MAX → driver formula.  The estimate is bit-deterministic
    cross-engine: the register sum is carried as the exact integer
    ``Σ 2^(57 - rho_j)`` (no float accumulation-order dependence), and
    the bias constant / linear-counting branch mirror the SQL oracle
    term for term.
    """
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        _, flat = _tokenize_column(batch.column(text_col))
        toks = pc.unique(flat).to_pylist()
        regs: dict[int, int] = {}
        for t in toks:
            b, r = _hll_register(t)
            if regs.get(b, 0) < r:
                regs[b] = r
        return pa.table({"bucket": pa.array(list(regs), pa.int64()),
                         "rho": pa.array(list(regs.values()), pa.int64())})

    rows = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Max("rho", alias_name="rho"))
            .take_all())
    regs = {r["bucket"]: r["rho"] for r in rows}
    return hll_estimate_q(regs), regs


def hll_estimate_q(regs: dict[int, int], m: int = HLL_M) -> int:
    """Registers → ``floor(estimate·1000 + 0.5)``.  Integer-exact sum
    ``S = Σ 2^(57 - rho)`` (empty registers contribute ``2^57``), then
    one double division — the identical expression the oracle runs."""
    top = 1 << (_HLL_REST_BITS + 1)
    s = sum(top >> regs.get(b, 0) for b in range(m))
    zeros = sum(1 for b in range(m) if b not in regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(top) / float(s)
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = raw
    return int(math.floor(est * 1000.0 + 0.5))


def hll_grouped_distinct(docs: ray.data.Dataset, group_col: str,
                         text_col: str = "text") -> pa.Table:
    """Per-group HyperLogLog distinct-token estimates — the grouped form
    of ``hll_distinct_tokens`` (e.g. vocabulary richness per source /
    domain without a per-group DISTINCT shuffle).

    Shape: each batch emits at most |groups-in-batch| x HLL_M sparse
    (group, bucket, rho) partials (MAX-mergeable in any order), one
    small groupby MAX co-partitions registers, and the driver folds the
    n_groups x HLL_M table (provably small — the whole point of the
    sketch).  Estimates use the exact-integer register sum of
    ``hll_estimate_q``, so the value is bit-deterministic and
    SQL-oracle-checkable like q49."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        parent, flat = _tokenize_column(batch.column(text_col))
        src = batch.column(group_col).take(parent)
        pairs = (pa.table({"g": src, "t": flat})
                 .group_by(["g", "t"]).aggregate([]))
        regs: dict[tuple, int] = {}
        for gval, tok in zip(pairs.column("g").to_pylist(),
                             pairs.column("t").to_pylist()):
            b, r = _hll_register(tok)
            key = (gval, b)
            if regs.get(key, 0) < r:
                regs[key] = r
        keys = list(regs)
        return pa.table({
            group_col: pa.array([k[0] for k in keys], pa.string()),
            "bucket": pa.array([k[1] for k in keys], pa.int64()),
            "rho": pa.array(list(regs.values()), pa.int64()),
        })

    rows = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "bucket"])
            .aggregate(Max("rho", alias_name="rho"))
            .take_all())
    by_group: dict[str, dict[int, int]] = {}
    for r in rows:
        by_group.setdefault(r[group_col], {})[r["bucket"]] = r["rho"]
    groups = sorted(by_group)
    return pa.table({
        group_col: pa.array(groups, pa.string()),
        "n_est_q": pa.array([hll_estimate_q(by_group[g]) for g in groups],
                            pa.int64()),
    })


def hdr_bin(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """HDR-histogram-style integer binning for positive int64 values:
    shift = max(bit_length(v) - 4, 0), bucket = v >> shift (a 4-bit
    mantissa), bin id = shift·16 + bucket, lower bound = bucket << shift.
    Pure integer ops — bit-replicable in SQL via
    ``length(format('{:b}', v))`` — with relative error ≤ 1/8 per bin."""
    v = v.astype(np.int64)
    nbits = np.zeros_like(v)
    x = v.copy()
    while (x > 0).any():                 # bit_length, vectorized
        nbits[x > 0] += 1
        x >>= 1
    shift = np.maximum(nbits - 4, 0)
    bucket = v >> shift
    return shift * 16 + bucket, bucket << shift


def hdr_quantiles(ds: ray.data.Dataset, value_col: str, group_col: str,
                  qs: tuple[float, ...] = (0.5, 0.9, 0.99)
                  ) -> pa.Table:
    """Mergeable-histogram approximate quantiles per group — p50/p99 at
    corpus scale WITHOUT a distributed sort: each batch emits one
    (group, bin, n) combiner row per distinct bin (≤ ~16·64 bins total,
    Zipf-irrelevant), one small groupby SUM merges, and the quantile is
    the lower bound of the first bin whose cumulative count reaches
    ``ceil(q·n)`` — all integer arithmetic, so the result is
    bit-deterministic and exactly SQL-oracle-checkable (relative error
    ≤ 1/8 by construction).  ``value_col`` must be positive int64
    (quantize floats to cents first, the q61 policy)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = batch.column(value_col).to_numpy().astype(np.int64)
        g = batch.column(group_col)
        ids, lbs = hdr_bin(v)
        t = pa.table({group_col: g,
                      "bin": pa.array(ids),
                      "lb": pa.array(lbs)})
        agg = (t.group_by([group_col, "bin", "lb"])
               .aggregate([([], "count_all")]))
        return pa.table({
            group_col: agg.column(group_col),
            "bin": agg.column("bin"),
            "lb": agg.column("lb"),
            "n": pc.cast(agg.column(agg.schema.names[-1]), pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "bin", "lb"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())                 # groups x bins rows: tiny

    rows = []
    for gval, sub in hist.groupby(group_col, sort=True):
        sub = sub.sort_values("bin")
        cum = sub["n"].cumsum().to_numpy()
        total = int(cum[-1])
        lbs = sub["lb"].to_numpy()
        for q in qs:
            q_ppt = int(q * 1000)
            rank = (q_ppt * total + 999) // 1000   # ceil, positive ints
            idx = int(np.searchsorted(cum, max(rank, 1)))
            rows.append((gval, int(q * 1000), int(lbs[idx]), total))
    return pa.table({
        group_col: pa.array([r[0] for r in rows]),
        "q_ppt": pa.array([r[1] for r in rows], pa.int64()),
        "approx_q": pa.array([r[2] for r in rows], pa.int64()),
        "n_rows": pa.array([r[3] for r in rows], pa.int64()),
    })


def cms_build_keys(ds: ray.data.Dataset, key_col: str,
                   width: int = CMS_WIDTH,
                   depth: int = CMS_DEPTH) -> np.ndarray:
    """Count-min sketch over an integer KEY column — the join-side
    input to ``cms_join_size``.  Same combiner shape as ``cms_build``
    (per-batch distinct-key counts → depth × vocab partial rows → one
    (row, slot) groupby SUM); hashing is the shared vectorized FNV-1a
    mix with a per-row salt, so two sketches built from different
    tables are slot-compatible by construction."""
    from ray.data.aggregate import Sum

    from .hashing import fnv1a_u64_vec

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(k) == 0:
            return pa.table({"j": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq, counts = np.unique(k, return_counts=True)
        js, slots, ns = [], [], []
        for j in range(depth):
            salt = np.uint64((0x9E3779B97F4A7C15 * (j + 1))
                             & 0xFFFFFFFFFFFFFFFF)
            h = fnv1a_u64_vec(uniq.astype(np.uint64) ^ salt)
            js.append(np.full(len(uniq), j, np.int64))
            slots.append((h % np.uint64(width)).astype(np.int64))
            ns.append(counts.astype(np.int64))
        return pa.table({"j": pa.array(np.concatenate(js)),
                         "slot": pa.array(np.concatenate(slots)),
                         "n": pa.array(np.concatenate(ns))})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["j", "slot"]).aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    sketch = np.zeros((depth, width), dtype=np.int64)
    sketch[rows["j"].to_numpy(np.int64),
           rows["slot"].to_numpy(np.int64)] = rows["n"].to_numpy(np.int64)
    return sketch


def cms_join_size(sketch_a: np.ndarray, sketch_b: np.ndarray) -> int:
    """Inner-product join-cardinality estimate: ``min_j Σ_s a[j,s]·b[j,s]``
    — an upper bound on ``|A ⋈ B|`` that is exact when no two keys
    collide in some row, with the classic ε·|A|·|B| overestimate bound.
    The sketch-mode sibling of ``analytics.q126_join_size``'s exact
    probe: at 100 TB each side's sketch is a few MB built with one
    combiner pass, and the estimate is a driver-side dot product."""
    if sketch_a.shape != sketch_b.shape:
        raise ValueError(f"shape mismatch {sketch_a.shape} "
                         f"vs {sketch_b.shape}")
    return int(min(int(np.dot(ra, rb))
                   for ra, rb in zip(sketch_a, sketch_b)))
