"""S5/S6 — one-vs-all logistic-regression relation classification.

Rebuilt from ``kbp/sf/classify/OneVsAllRelationExtractor.java:76-229`` (the
default model, ``LR_INC`` — kbp/sf/common/Props.java:144-145):

- one binary LR per relation, trained on mention-level datums with
  distant-supervision bag labels;
- at inference, each mention is scored under every (type-compatible)
  relation; the best non-NIL label with p > 0.5 is kept, softmax-normalized
  (gamma = 1.0, Props.java:500-501);
- per bag (= KBPair group), per-label scores are summed over mentions and
  L1-normalized → P(rel | subj, obj).

Ray-Data-first physical plan (deliberately reordered vs the reference,
results identical because mention scoring is pointwise):

    pairs ──map_batches(MentionScorer, broadcast weights)──►  scored mentions
          (mentions with no label at p>0.5 are DROPPED here — the huge
           data reduction happens *before* the shuffle)
    scored ──groupby(subj,subj_type,obj,obj_type).map_groups(bag_agg)──► triples

Features are hashed to ``D = 2**18`` buckets with a stable content hash
(process-independent; replaces KBPDataset's featureIndex interner —
kbp/sf/classify/KBPDataset.java:16-120).  Weights are a dense float32
``(R, D)`` matrix, broadcast once via ``ray.put`` and shared zero-copy by
every scorer task.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..relations import RELATION_NAMES, RELATION_BY_NAME

D_FEATURES = 1 << 18
_REL_INDEX = {r: i for i, r in enumerate(RELATION_NAMES)}


def hash_features(feats: list[str]) -> np.ndarray:
    """Stable hashed feature ids (uint32 < D_FEATURES) for one datum."""
    return np.fromiter(
        (zlib.crc32(f.encode("utf-8")) % D_FEATURES for f in feats),
        dtype=np.int64,
        count=len(feats),
    )


# (subj_type, obj_type) -> boolean mask over relations, built lazily.
# Applying the RespectRelationTypes compatibility here (instead of only in
# S7) skips provably-invalid classifier evaluations; semantics are unchanged
# because those fills would be filtered anyway
# (kbp/sf/evaluate/SlotfillPostProcessor.java:83-118).
TYPE_MASKS: dict[tuple[str, str], np.ndarray] = {}


def type_mask(subj_type: str, obj_type: str) -> np.ndarray:
    key = (subj_type, obj_type)
    m = TYPE_MASKS.get(key)
    if m is None:
        m = np.zeros(len(RELATION_NAMES), dtype=bool)
        for i, name in enumerate(RELATION_NAMES):
            r = RELATION_BY_NAME[name]
            if r.subject_type == subj_type and obj_type in r.object_types:
                m[i] = True
        TYPE_MASKS[key] = m
    return m


@dataclass
class LRModel:
    """Per-relation LR weights.  ``weights``: (R, D) float32, ``bias``: (R,)."""

    weights: np.ndarray
    bias: np.ndarray

    def to_table(self) -> pa.Table:
        """Serialize to a Parquet-able weight table (the model artifact;
        replaces Java .ser files — RelationClassifier.java:94-107)."""
        nz_rel, nz_dim = np.nonzero(self.weights)
        return pa.table(
            {
                "rel_idx": pa.array(nz_rel.astype(np.int32)),
                "dim": pa.array(nz_dim.astype(np.int32)),
                "weight": pa.array(self.weights[nz_rel, nz_dim].astype(np.float32)),
                "bias": pa.array(self.bias[nz_rel].astype(np.float32)),
            }
        )

    @staticmethod
    def from_table(t: pa.Table) -> "LRModel":
        w = np.zeros((len(RELATION_NAMES), D_FEATURES), dtype=np.float32)
        b = np.zeros(len(RELATION_NAMES), dtype=np.float32)
        rel = t.column("rel_idx").to_numpy()
        dim = t.column("dim").to_numpy()
        w[rel, dim] = t.column("weight").to_numpy()
        # bias repeated per nz row; last write wins (identical values)
        b[rel] = t.column("bias").to_numpy()
        return LRModel(w, b)

    def save(self, path: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(self.to_table(), path)

    @staticmethod
    def load(path: str) -> "LRModel":
        import pyarrow.parquet as pq

        return LRModel.from_table(pq.read_table(path))


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

#: residuals are quantized to this grid before the gradient sum, making
#: the per-epoch gradient an INTEGER sum — associative + commutative, so
#: the distributed sharded fit (pipelines.train.fit_from_labeled with the
#: actor path) is bit-identical to this in-memory fit under any datum
#: partitioning (same trick as the bag-score SCORE_SCALE).
GRAD_SCALE = 1 << 20


def dedup_datums(
    datum_features: list[np.ndarray],
    labels: list[set[str]],
) -> tuple[list[np.ndarray], list[set[str]], np.ndarray]:
    """Collapse EXACT-duplicate datums (same ordered feature-id list, same
    label set) into one weighted instance.  Bit-parity: every copy of a
    datum contributes the identical quantized residual, so count × rq
    equals the per-copy sum regardless of where the dedup happens (global
    in-memory, or per shard)."""
    seen: dict[tuple, int] = {}
    feats_u: list[np.ndarray] = []
    labels_u: list[set[str]] = []
    cnt: list[int] = []
    for f, l in zip(datum_features, labels):
        key = (f.tobytes(), tuple(sorted(l)))
        idx = seen.get(key)
        if idx is None:
            seen[key] = len(feats_u)
            feats_u.append(f)
            labels_u.append(l)
            cnt.append(1)
        else:
            cnt[idx] += 1
    return feats_u, labels_u, np.asarray(cnt, dtype=np.int64)


def datum_block_arrays(
    datum_features: list[np.ndarray],
    labels: list[set[str]],
    valid: np.ndarray,
    dims: np.ndarray,
    active: np.ndarray,
    ex_pos: np.ndarray,
    ex_neg: np.ndarray,
):
    """Build the CSR-ish arrays for one datum block: compact feature ids,
    segment ids, per-active-relation label row and example weights.
    Shared by the in-memory fit (one block = everything) and the sharded
    actors (one block per shard)."""
    n = len(datum_features)
    filtered = [ids[valid[ids]] for ids in datum_features]
    lens = np.fromiter((len(x) for x in filtered), dtype=np.int64, count=n)
    flat = (
        np.concatenate(filtered) if n and lens.sum() > 0
        else np.empty(0, dtype=np.int64)
    )
    remap = np.zeros(D_FEATURES, dtype=np.int64)
    if len(dims):
        remap[dims] = np.arange(len(dims))
    flat_c = remap[flat]
    seg = np.repeat(np.arange(n), lens)
    y_blk = np.zeros((len(active), n), dtype=np.float64)
    act_pos = {int(r): j for j, r in enumerate(active)}
    for i, labs in enumerate(labels):
        for rel in labs:
            r = _REL_INDEX.get(rel)
            if r is not None and r in act_pos:
                y_blk[act_pos[r], i] = 1.0
    ex_w = np.where(y_blk > 0, ex_pos[:, None], ex_neg[:, None])
    return flat_c, seg, n, y_blk, ex_w


def grad_block(flat_c, seg, n_local, y_blk, ex_w, Wc, bias, d_c,
               cnt: np.ndarray | None = None):
    """Quantized-integer gradient partial over one datum block for every
    active relation: per-datum residuals are rounded to the GRAD_SCALE grid
    and summed as ints, so partials from different blocks add associatively
    (bit-identical final gradient under any partitioning).

    ``cnt`` (optional int64 per datum) carries exact-duplicate multiplicity
    (see ``dedup_datums``): count × quantized-residual equals the per-copy
    sum exactly."""
    n_active = Wc.shape[0]
    gq = np.zeros((n_active, d_c), dtype=np.int64)
    bq = np.zeros(n_active, dtype=np.int64)
    for j in range(n_active):
        s = np.bincount(seg, weights=Wc[j][flat_c], minlength=n_local)
        s = s + bias[j]
        p = 1.0 / (1.0 + np.exp(-s))
        resid = (y_blk[j] - p) * ex_w[j]
        rq = np.rint(resid * GRAD_SCALE)
        if cnt is not None:
            rq = rq * cnt
        if len(flat_c):
            gq[j] = np.bincount(
                flat_c, weights=rq[seg], minlength=d_c
            ).astype(np.int64)
        bq[j] = np.int64(rq.sum())
    return gq, bq


def lr_optimize(grad_fn, n_active, d_c, n, epochs, lr, l2):
    """Shared deterministic momentum-GD driver: ``grad_fn(Wc, bias)`` must
    return the GLOBAL quantized gradient (int64) for the current weights —
    either computed locally (train_lr) or as a sum of actor partials
    (pipelines.train.fit_from_labeled)."""
    Wc = np.zeros((n_active, d_c), dtype=np.float64)
    bias = np.zeros(n_active, dtype=np.float64)
    vel_w = np.zeros_like(Wc)
    vel_b = np.zeros(n_active, dtype=np.float64)
    for _ in range(epochs):
        gq, bq = grad_fn(Wc, bias)
        grad = gq.astype(np.float64) / GRAD_SCALE - l2 * Wc
        vel_w = 0.9 * vel_w + grad / max(n, 1)
        vel_b = 0.9 * vel_b + (bq.astype(np.float64) / GRAD_SCALE) / max(n, 1)
        Wc += lr * vel_w
        bias += lr * vel_b
    return Wc, bias


def class_weights(n: int, pos_counts: np.ndarray, pos_weight_cap: float):
    """Per-active-relation example weights in closed form (n_pos·pos_w +
    n_neg, NOT a float sum over datums — the closed form is what keeps the
    sharded fit bit-identical to the in-memory one).

    Class-balanced: rare relations (per:charges at prior 4e-4 vs
    org:top_members at 0.09 — RelationType.java priors) would otherwise
    sit under the p>0.5 keep-threshold forever."""
    ex_pos = np.empty(len(pos_counts), dtype=np.float64)
    ex_neg = np.empty(len(pos_counts), dtype=np.float64)
    for j, n_pos in enumerate(pos_counts):
        n_pos = float(n_pos)
        pos_w = min(pos_weight_cap, max(1.0, (n - n_pos) / max(n_pos, 1.0)))
        scale = n / (n_pos * pos_w + (n - n_pos)) if n else 1.0
        ex_pos[j] = pos_w * scale
        ex_neg[j] = scale
    return ex_pos, ex_neg


def train_lr(
    datum_features: list[np.ndarray],
    labels: list[set[str]],
    epochs: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
    feature_count_threshold: int = 5,
    pos_weight_cap: float = 30.0,
) -> LRModel:
    """Deterministic full-batch GD fit of R one-vs-all LRs.

    ``datum_features[i]`` = hashed feature ids of mention i; ``labels[i]`` =
    its (distant-supervision) relation labels, empty set = pure negative.

    Determinism: full-batch gradients are order-independent QUANTIZED
    integer sums over a fixed datum list; no RNG.  Feature-count threshold
    (drop features seen < 5 times — Props.FEATURE_COUNT_THRESHOLD,
    Props.java:146-147, KBPTrainer.java:414-416) is applied on hashed ids.

    Scale path: ``pipelines.train.fit_from_labeled`` computes the SAME
    gradient as a sum of per-shard integer partials held in Ray actors —
    bit-identical to this in-memory fit (tests/test_train_distributed.py).
    """
    n = len(datum_features)  # TOTAL datum count (with multiplicity)
    R = len(RELATION_NAMES)
    feats_u, labels_u, cnt = dedup_datums(datum_features, labels)
    counts = np.zeros(D_FEATURES, dtype=np.int64)
    for ids, c in zip(feats_u, cnt):
        counts[ids] += c
    valid = counts >= feature_count_threshold
    y_pos = np.zeros(R, dtype=np.int64)
    for labs, c in zip(labels_u, cnt):
        for rel in labs:
            j = _REL_INDEX.get(rel)
            if j is not None:
                y_pos[j] += c
    # only fit relations with at least one positive
    active = np.nonzero(y_pos > 0)[0]
    filtered_flat = [ids[valid[ids]] for ids in feats_u]
    flat_all = (
        np.concatenate(filtered_flat) if filtered_flat
        else np.empty(0, dtype=np.int64)
    )
    dims = np.unique(flat_all) if flat_all.size else np.empty(0, dtype=np.int64)
    d_c = max(len(dims), 1)
    ex_pos, ex_neg = class_weights(n, y_pos[active], pos_weight_cap)
    flat_c, seg, n_local, y_blk, ex_w = datum_block_arrays(
        feats_u, labels_u, valid, dims, active, ex_pos, ex_neg
    )
    Wc, bias = lr_optimize(
        lambda W_, b_: grad_block(flat_c, seg, n_local, y_blk, ex_w,
                                  W_, b_, d_c, cnt=cnt),
        len(active), d_c, n, epochs, lr, l2,
    )
    return assemble_model(active, dims, Wc, bias)


def assemble_model(active: np.ndarray, dims: np.ndarray,
                   Wc: np.ndarray, bias: np.ndarray) -> LRModel:
    """Expand compact (n_active, d_c) fitted weights into the dense
    (R, D) LRModel container."""
    R = len(RELATION_NAMES)
    W = np.zeros((R, D_FEATURES), dtype=np.float32)
    b = np.zeros(R, dtype=np.float32)
    for j, r in enumerate(active):
        W[r, dims] = Wc[j].astype(np.float32)
        b[r] = bias[j]
    return LRModel(W, b)


def build_training_datums(
    pairs_df: pd.DataFrame,
    kb: dict[tuple[str, str], set[str]],
    negative_subsample: float = 0.10,
) -> tuple[list[np.ndarray], list[set[str]]]:
    """Distant-supervision labeling (KBPTrainer.makeDataset analog,
    kbp/sf/train/KBPTrainer.java:252-460).

    ``kb`` maps (subj_lower, obj_lower) → relation names — the
    broadcast-small-side join (KnowledgeBase.java:35-44).  Bags with no KB
    relation become all-negative datums, kept with deterministic
    content-hash probability 0.10 (replaces ``new Random(0)`` at
    KBPTrainer.java:258,278).
    """
    from ..functions.hashing import hash_sample_keep

    feats_out: list[np.ndarray] = []
    labels_out: list[set[str]] = []
    for row in pairs_df.itertuples(index=False):
        key = (row.subj.lower(), row.obj.lower())
        rels = kb.get(key, ())
        if rels:
            labs = set(rels)
        else:
            if not hash_sample_keep(row.subj + "\x00" + row.obj,
                                    negative_subsample, salt="neg"):
                continue
            labs = set()
        feats_out.append(hash_features(list(row.features)))
        labels_out.append(labs)
    return feats_out, labels_out


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------

class MentionScorer:
    """``map_batches`` callable over PAIRS → per-mention best-label scores.

    Instantiated on the driver with a broadcast weights handle and passed
    as an INSTANCE to ``map_batches`` → elastic task pool; each worker
    process fetches the (R, D) weight matrix zero-copy from the object
    store once (``state.broadcast.fetch`` cache).  Emits only mentions
    whose best type-compatible relation has p > 0.5
    (OneVsAllRelationExtractor.classifyMentions semantics,
    OneVsAllRelationExtractor.java:81-97); everything else is dropped here,
    before the bag shuffle.
    """

    def __init__(self, model_ref, keep_threshold: float = 0.5):
        self._ref = model_ref
        self._keep_threshold = keep_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.broadcast import fetch

        model = fetch(self._ref)
        # compact row-major weights over the NONZERO feature dims only:
        # after the count-≥5 threshold the (R, D) matrix is ~99% zeros, so
        # the compact (n_dims, R) table usually fits in L2.  The dense
        # transposed gather (43 MB private per worker) was measured to
        # anti-scale 6.8x from 8 → 32 workers (shared-LLC thrash).
        compact = getattr(model, "_compact", None)
        if compact is None:
            nz = np.nonzero(np.any(model.weights != 0, axis=0))[0]
            Wc = np.ascontiguousarray(model.weights[:, nz].T)  # (n_dims, R)
            compact = (nz.astype(np.int64), Wc)
            try:
                model._compact = compact  # cached per worker process
            except Exception:
                pass
        dims, Wc = compact
        b = model.bias
        n = batch.num_rows
        if n == 0:
            return batch.drop_columns(["features"]).append_column(
                "rel", pa.array([], pa.string())
            ).append_column("sum_q", pa.array([], pa.int64())).append_column(
                "best_q", pa.array([], pa.int64())
            )
        subj_t = batch.column("subj_type").to_pylist()
        obj_t = batch.column("obj_type").to_pylist()
        # zero-copy flatten of the list<int64> feature-id column
        feat_col = batch.column("features").combine_chunks()
        offsets = feat_col.offsets.to_numpy().astype(np.int64)
        flat = feat_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        bounds = offsets[:-1] - offsets[0]
        lens = np.diff(offsets)
        if len(flat) and len(dims):
            # map hashed ids -> compact rows; out-of-vocab ids get weight 0
            pos = np.searchsorted(dims, flat)
            pos_c = np.clip(pos, 0, len(dims) - 1)
            hit = (pos < len(dims)) & (dims[pos_c] == flat)
            gathered = Wc[pos_c]
            gathered[~hit] = 0.0
            if bounds.size and bounds[-1] == gathered.shape[0]:
                # trailing empty-feature rows make the last reduceat index
                # out of range; pad one zero row (its segment sums to 0 and
                # is re-zeroed by the lens==0 mask below)
                gathered = np.vstack(
                    [gathered,
                     np.zeros((1, gathered.shape[1]), dtype=gathered.dtype)]
                )
            S = np.add.reduceat(gathered, bounds, axis=0)
        else:
            S = np.zeros((n, len(b)), dtype=np.float32)
        S = S.astype(np.float64) + b
        S[lens == 0] = 0.0
        masks = np.stack([type_mask(st, ot) for st, ot in zip(subj_t, obj_t)])
        P = 1.0 / (1.0 + np.exp(-S))
        P = np.where(masks, P, 0.0)
        best = P.argmax(axis=1)
        best_p = P[np.arange(n), best]
        keep = best_p > self._keep_threshold
        # softmax-normalize over compatible relations (gamma=1.0)
        Z = np.where(masks, S, -np.inf)
        zmax = Z.max(axis=1, keepdims=True)
        zmax[~np.isfinite(zmax)] = 0.0  # all-masked rows: avoid inf - inf
        Z = Z - zmax
        E = np.exp(Z)
        denom = E.sum(axis=1)
        denom[denom == 0] = 1.0
        sm_best = E[np.arange(n), best] / denom
        keep_idx = np.nonzero(keep)[0]
        rels = [RELATION_NAMES[j] for j in best[keep_idx]]
        q_vals = np.rint(sm_best[keep_idx] * SCORE_SCALE).astype(np.int64)
        kept = batch.take(pa.array(keep_idx)).drop_columns(["features"])
        q = pa.array(q_vals, pa.int64())
        return (
            kept.append_column("rel", pa.array(rels, pa.string()))
            .append_column("sum_q", q)   # quantized score, summed per bag
            .append_column("best_q", q)  # same value; argmax-merged per bag
        )


# ---------------------------------------------------------------------------
# Bag aggregation (shuffle #1) — combiner + reducer
# ---------------------------------------------------------------------------
# Per-bag label aggregation semantics (OneVsAllRelationExtractor.java:81-97,
# classifyRelations): sum per-label mention scores over the bag's mentions,
# L1-normalize per bag, keep argmax-score provenance per label.
#
# Physical plan: a MAP-SIDE COMBINER collapses each scored batch to one row
# per (pair, rel) BEFORE the shuffle, then a bucket-keyed reduce merges the
# partials.  Mention scores are quantized to the SCORE_SCALE grid and summed
# as int64 — integer addition is associative + commutative, so the result is
# bit-identical under ANY batch/block partitioning (float partial sums would
# depend on accumulation order — SURVEY.md §4 "Ordering").

PAIR_KEY = ["subj", "subj_type", "obj", "obj_type"]
SCORE_SCALE = 1_000_000_000
_PROV_COLS = ["doc_id", "sent_idx", "subj_begin", "subj_end",
              "obj_begin", "obj_end"]
_TIE_COLS = ["best_q", "doc_id", "sent_idx", "subj_begin", "obj_begin"]


def _combine_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Merge bag partials per (pair, rel): sum_q adds; the best-provenance
    row is the max of the (best_q, doc_id, sent_idx, spans) tuple — a true
    associative max, so combine rounds compose in any order."""
    keys = PAIR_KEY + ["rel"]
    df = df.sort_values(keys + _TIE_COLS,
                        ascending=[True] * len(keys) + [False] * len(_TIE_COLS),
                        kind="mergesort")
    sums = df.groupby(keys, sort=False)["sum_q"].sum()
    best = df.drop_duplicates(keys, keep="first").set_index(keys)
    return best.drop(columns=["sum_q"]).join(sums).reset_index()


def partial_bag_combine(df: pd.DataFrame, n_buckets: int = 64) -> pa.Table:
    """Map-side combiner (the 'pre-aggregate inside map_batches' pattern):
    one row per (pair, rel) per batch, tagged with the shuffle bucket."""
    import zlib

    from ..schema import pd_to_arrow

    if not len(df):
        empty = df.iloc[0:0].copy()
        empty["__bucket"] = pd.Series([], dtype="int32")
        cols = [c for c in PAIR_KEY + ["rel", "sum_q", "best_q"]
                + _PROV_COLS + ["__bucket"] if c in empty.columns]
        return pd_to_arrow(empty[cols])
    out = _combine_partials(df)
    bucket = [
        zlib.crc32("\x00".join(t).encode("utf-8", "surrogatepass")) % n_buckets
        for t in zip(*(out[c] for c in PAIR_KEY))
    ]
    out["__bucket"] = pd.Series(bucket, dtype="int32")
    return pd_to_arrow(out[PAIR_KEY + ["rel", "sum_q", "best_q"]
                           + _PROV_COLS + ["__bucket"]])


def bag_reduce_bucket(df: pd.DataFrame) -> pa.Table:
    """Reduce side: merge partials, then L1-normalize per pair → TRIPLES
    rows with float score = sum_q(rel) / sum_q(pair)."""
    from ..schema import pd_to_arrow

    if not len(df):
        empty = df.iloc[0:0].drop(columns=["__bucket"], errors="ignore")
        empty = empty.rename(columns={"rel": "pred"})
        empty["score"] = pd.Series([], dtype="float64")
        cols = [c for c in ["subj", "subj_type", "pred", "obj", "obj_type",
                            "score"] + _PROV_COLS if c in empty.columns]
        return pd_to_arrow(empty[cols])
    out = _combine_partials(df.drop(columns=["__bucket"]))
    totals = out.groupby(PAIR_KEY, sort=False)["sum_q"].transform("sum")
    out["score"] = out["sum_q"] / totals
    out = out.rename(columns={"rel": "pred"})
    cols = ["subj", "subj_type", "pred", "obj", "obj_type", "score"] + _PROV_COLS
    return pd_to_arrow(out[cols])


# ---------------------------------------------------------------------------
# Model zoo beyond the default LR (ModelType registry analog,
# kbp/sf/classify/ModelType.java:12-92)
# ---------------------------------------------------------------------------

def gold_lookup_from_triples(gold_tbl: pa.Table) -> dict:
    """Gold (subj, pred, obj) table → (subj_lower, obj_lower) → {rels}."""
    out: dict[tuple[str, str], set[str]] = {}
    for s, p, o in zip(gold_tbl.column("subj").to_pylist(),
                       gold_tbl.column("pred").to_pylist(),
                       gold_tbl.column("obj").to_pylist()):
        out.setdefault((s.lower(), o.lower()), set()).add(p)
    return out


class GoldScorer:
    """GOLD debug model (ModelType.GOLD, kbp/sf/classify/ModelType.java:
    12-92 — a memorizer of gold slot fills): a mention scores 1.0 for
    relation r iff its (subj, r, obj) is in the gold set.  Drop-in for
    ``MentionScorer`` (emits the scored-mention schema), so bag and
    consistency stages are shared; used to debug the rest of the pipeline
    with a perfect classifier."""

    def __init__(self, gold_ref):
        self._ref = gold_ref  # ray.put of gold_lookup_from_triples(...)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.broadcast import fetch

        gold = fetch(self._ref)
        keep_idx: list[int] = []
        rels: list[str] = []
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        for i in range(batch.num_rows):
            for rel in sorted(gold.get((subj[i].lower(), obj[i].lower()),
                                       ())):
                keep_idx.append(i)
                rels.append(rel)
        kept = batch.take(pa.array(keep_idx, pa.int64())).drop_columns(
            ["features"])
        q = pa.array([SCORE_SCALE] * len(keep_idx), pa.int64())
        return (kept.append_column("rel", pa.array(rels, pa.string()))
                .append_column("sum_q", q)
                .append_column("best_q", q))


def train_perceptron(
    datum_features: list[np.ndarray],
    labels: list[set[str]],
    epochs: int = 10,
    feature_count_threshold: int = 5,
) -> LRModel:
    """Averaged one-vs-all perceptron (PerceptronExtractor analog,
    kbp/sf/classify/PerceptronExtractor.java): deterministic fixed-order
    passes, averaged weights returned in the same LRModel container so the
    scorer stage is shared."""
    n = len(datum_features)
    R = len(RELATION_NAMES)
    counts = np.zeros(D_FEATURES, dtype=np.int64)
    for ids in datum_features:
        counts[ids] += 1
    valid = counts >= feature_count_threshold
    filtered = [ids[valid[ids]] for ids in datum_features]
    y = np.zeros((R, n), dtype=np.int8)
    for i, labs in enumerate(labels):
        for rel in labs:
            j = _REL_INDEX.get(rel)
            if j is not None:
                y[j, i] = 1
    W = np.zeros((R, D_FEATURES), dtype=np.float64)
    Wsum = np.zeros((R, D_FEATURES), dtype=np.float64)
    b = np.zeros(R, dtype=np.float64)
    bsum = np.zeros(R, dtype=np.float64)
    steps = 0
    for _ in range(epochs):
        for i, ids in enumerate(filtered):
            if not len(ids):
                continue
            s = W[:, ids].sum(axis=1) + b
            pred = (s > 0).astype(np.int8)
            wrong = pred != y[:, i]
            if wrong.any():
                delta = (y[:, i].astype(np.float64) * 2 - 1) * wrong
                W[:, ids] += delta[:, None]
                b += delta
            Wsum += W
            bsum += b
            steps += 1
    if steps:
        W, b = Wsum / steps, bsum / steps
    # calibrate to the p>0.5 keep rule: scale so margins map through
    # sigmoid sensibly (margin 1 → ~0.73)
    return LRModel(W.astype(np.float32), b.astype(np.float32))


def ensemble_scores(batches: list[pa.Table], mode: str = "agree_any") -> pa.Table:
    """Combine scored-mention outputs of N component scorers
    (EnsembleRelationExtractor test-time combination,
    kbp/sf/classify/EnsembleRelationExtractor.java:38-90; modes
    AGREE_ANY / AGREE_MOST / AGREE_ALL — Props.java:344-346).

    Input tables share the scored-mention schema (pair + rel + sum_q/...).
    Vote key = (mention provenance, rel); AGREE_ANY keeps the union with
    max score, AGREE_MOST keeps keys ≥ half the components, AGREE_ALL
    keys present in every component."""
    import pandas as pd

    from ..schema import pd_to_arrow

    n_models = len(batches)
    dfs = []
    for k, t in enumerate(batches):
        df = t.to_pandas()
        df["__model"] = k
        dfs.append(df)
    allr = pd.concat(dfs, ignore_index=True)
    if not len(allr):
        return batches[0]
    key = ["doc_id", "sent_idx", "subj_begin", "obj_begin", "rel"]
    votes = allr.groupby(key)["__model"].nunique().rename("votes")
    allr = allr.sort_values(key + ["sum_q"], ascending=[True] * len(key) + [False],
                            kind="mergesort")
    best = allr.drop_duplicates(key, keep="first").set_index(key).join(votes)
    need = {"agree_any": 1, "agree_most": (n_models + 1) // 2,
            "agree_all": n_models}[mode]
    keep = best[best["votes"] >= need].reset_index()
    return pd_to_arrow(keep.drop(columns=["__model", "votes"]))


@dataclass
class HoffmannModel:
    """Averaged latent-perceptron weights (HoffmannExtractor.LabelWeights,
    HoffmannExtractor.java:26-114) over the compact observed-feature space:
    ``avg_weights`` (R+1, d_c) with row R = NIL, ``dims`` the sorted global
    feature ids mapping the compact columns."""

    avg_weights: np.ndarray
    dims: np.ndarray

    def to_table(self) -> pa.Table:
        """Parquet-able weight table (label, global dim, weight) — the
        same artifact shape as LRModel (RelationClassifier.java:94-107);
        dims re-derive from the stored global ids on load."""
        nz_l, nz_c = np.nonzero(self.avg_weights)
        return pa.table({
            "label": pa.array(nz_l.astype(np.int32)),
            "dim": pa.array(self.dims[nz_c].astype(np.int64)),
            "weight": pa.array(self.avg_weights[nz_l, nz_c].astype(np.float64)),
        })

    @staticmethod
    def from_table(t: pa.Table) -> "HoffmannModel":
        lab = t.column("label").to_numpy()
        dim = t.column("dim").to_numpy()
        w = t.column("weight").to_numpy()
        dims = np.unique(dim)
        remap = {d: i for i, d in enumerate(dims.tolist())}
        avg = np.zeros((len(RELATION_NAMES) + 1, max(len(dims), 1)))
        for l_, d_, v in zip(lab, dim, w):
            avg[int(l_), remap[int(d_)]] = v
        return HoffmannModel(avg_weights=avg, dims=dims)

    def save(self, path: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(self.to_table(), path)

    @staticmethod
    def load(path: str) -> "HoffmannModel":
        import pyarrow.parquet as pq

        return HoffmannModel.from_table(pq.read_table(path))

    def _compact(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        if not len(ids) or not len(self.dims):
            return np.empty(0, dtype=np.int64)
        pos = np.searchsorted(self.dims, ids)
        pos_c = np.clip(pos, 0, len(self.dims) - 1)
        hit = (pos < len(self.dims)) & (self.dims[pos_c] == ids)
        return pos_c[hit]

    def mention_scores(self, ids: np.ndarray) -> np.ndarray:
        """avgDotProduct for every label incl. NIL (:88-96); unseen
        features are dropped like featureIndex.indexOf < 0."""
        c = self._compact(ids)
        if not len(c):
            return np.zeros(self.avg_weights.shape[0])
        return self.avg_weights[:, c].sum(axis=1)

    def classify_bag(self, datums: list[np.ndarray]) -> dict[str, float]:
        """classifyMentions (:489-514): per mention take the top label
        (ties → higher label index, sortPredictions :446-462); NIL is not
        propagated; per relation keep the best mention score
        (deterministic OR in the Y layer)."""
        nil = len(RELATION_NAMES)
        best: dict[int, float] = {}
        for ids in datums:
            s = self.mention_scores(ids)
            top = int(np.flatnonzero(s == s.max()).max())
            if top != nil and (top not in best or best[top] < s[top]):
                best[top] = float(s[top])
        return {RELATION_NAMES[j]: v for j, v in best.items()}


def _hoffmann_z_update(S: np.ndarray, gold: set[int], nil: int) -> list[set]:
    """Conditional inference = the weighted-edge-cover approximation of
    (Hoffmann et al., 2011) (generateZUpdate,
    HoffmannExtractor.java:328-401): more golds than mentions → greedy
    cover of Ys by best edges; else assign each gold its best unassigned
    mention, then leftover mentions take their own best non-NIL label.
    Tie-breaks are deterministic (edges enumerated mention-major, labels
    ascending, NIL last; stable sorts) where the Java HashMap iteration
    was not."""
    n_m = S.shape[0]
    gold_sorted = sorted(gold)
    cand = gold_sorted + [nil]
    z_update: list[set] = [set() for _ in range(n_m)]
    edges = [(m, y, S[m, y]) for m in range(n_m) for y in cand]
    if len(gold) > n_m:
        covered: set[int] = set()
        for m, y, s in sorted(edges, key=lambda e: -e[2]):
            if y == nil:
                continue
            if y not in covered and not z_update[m]:
                z_update[m].add(y)
                covered.add(y)
        return z_update
    for y in gold_sorted:
        for m, s in sorted(((m, s) for m, yy, s in edges if yy == y),
                           key=lambda e: -e[1]):
            if not z_update[m]:
                z_update[m].add(y)
                break
    for m in range(n_m):
        if not z_update[m]:
            es = sorted(((y, s) for mm, y, s in edges if mm == m),
                        key=lambda e: -e[1])
            if es and es[0][0] != nil:
                z_update[m].add(es[0][0])
    return z_update


def _hoffmann_bag_step(W, group, gold, nil, upd):
    """One bag of the MultiR perceptron (HoffmannExtractor.java:158-176):
    local Z scores → argmax predictions → deterministic-OR Y; on Y
    mismatch, conditional inference picks latent labels and ``upd``
    receives the ±1 sparse updates.  Shared verbatim by the in-memory
    trainer and the sharded (iterative-parameter-mixing) trainer so the
    two cannot drift."""
    n_classes = W.shape[0]
    S = np.stack([
        W[:, ids].sum(axis=1) if len(ids) else np.zeros(n_classes)
        for ids in group
    ])
    z_pred = [int(np.flatnonzero(row == row.max()).max())
              for row in S]
    y_pred = {z for z in z_pred if z != nil}
    if y_pred != gold:
        z_upd = _hoffmann_z_update(S, gold, nil)
        for m, ids in enumerate(group):
            g, p = z_upd[m], z_pred[m]
            if p != nil and p not in g:
                upd(p, ids, -1.0)
            if p == nil and g:
                upd(nil, ids, -1.0)
            for l in sorted(g):
                if l != nil and l != p:
                    upd(l, ids, +1.0)
            if not g and p != nil:
                upd(nil, ids, +1.0)


def _hoffmann_epoch_order(bag_names, epoch: int) -> list[str]:
    """Deterministic per-epoch bag shuffle — content hash of
    (epoch, bag_id), the RNG-free analog of ``dataset.randomize(t)``
    (HoffmannExtractor.java:151-153)."""
    return sorted(bag_names, key=lambda b: (
        zlib.crc32(f"hoffmann:{epoch}:{b}".encode("utf-8",
                                                  "surrogatepass")), b))


def train_hoffmann(
    datum_features: list[np.ndarray],
    labels: list[set[str]],
    bag_ids: list[str],
    epochs: int = 10,
) -> HoffmannModel:
    """The real MultiR latent averaged perceptron (Hoffmann et al., 2011),
    ported from kbp/sf/classify/HoffmannExtractor.java:133-311:

    per bag: local Z scores → argmax predictions → deterministic-OR Y;
    when the predicted Y set differs from the bag's gold set, conditional
    inference (edge cover) picks latent mention labels and the perceptron
    takes ±1 sparse updates; weight vectors are survival-weighted into the
    average (LabelWeights.addToAverage) — implemented lazily with
    per-label timestamps, mathematically identical to the reference's
    O(D)-per-update accounting.

    Determinism: bags shuffle per epoch by a content hash of
    (epoch, bag_id) — the analog of ``dataset.randomize(t)``'s fixed seed
    (:151-153) without RNG state; all tie-breaks are ordered.
    """
    nil = len(RELATION_NAMES)
    n_classes = nil + 1
    flat_all = (np.concatenate([np.asarray(f, dtype=np.int64)
                                for f in datum_features])
                if datum_features else np.empty(0, dtype=np.int64))
    dims = np.unique(flat_all) if flat_all.size else np.empty(0, np.int64)
    d_c = max(len(dims), 1)
    remap = np.zeros(D_FEATURES, dtype=np.int64)
    if len(dims):
        remap[dims] = np.arange(len(dims))
    feats_c = [remap[np.asarray(f, dtype=np.int64)] for f in datum_features]

    bags: dict[str, list[int]] = {}
    for i, b in enumerate(bag_ids):
        bags.setdefault(b, []).append(i)
    gold_pos = {
        b: {j for i in idxs for rel in labels[i]
            if (j := _REL_INDEX.get(rel)) is not None}
        for b, idxs in bags.items()
    }

    W = np.zeros((n_classes, d_c))
    AVG = np.zeros((n_classes, d_c))
    last_t = np.zeros(n_classes, dtype=np.int64)
    t = 0

    def upd(label: int, ids: np.ndarray, w: float):
        # lazy addToAverage: the vector survived (t - last_t) groups
        AVG[label] += W[label] * (t - last_t[label])
        last_t[label] = t
        np.add.at(W[label], ids, w)

    bag_names = sorted(bags)
    for epoch in range(epochs):
        for b in _hoffmann_epoch_order(bag_names, epoch):
            idxs = bags[b]
            group = [feats_c[i] for i in idxs]
            _hoffmann_bag_step(W, group, gold_pos[b], nil, upd)
            t += 1
    for label in range(n_classes):      # final addToAverage (:177-178)
        AVG[label] += W[label] * (t - last_t[label])
    return HoffmannModel(avg_weights=AVG, dims=dims)


class _HoffmannShardImpl:
    """Shard actor for the distributed MultiR trainer: holds its bags
    (deterministic crc32(bag_id) assignment, same rule as the MIML
    shards), remaps features onto the global compact dims once, and runs
    one perceptron epoch per driver round from the mixed weights."""

    def __init__(self, source, shard_id: int, n_shards: int):
        import os

        import pandas as _pd
        import ray as _ray

        if isinstance(source, str):
            import pyarrow.parquet as _pq

            part = os.path.join(source, f"__shard={shard_id}")
            tables = [_pq.read_table(
                part, columns=["sort_key", "features", "labels", "bag_id"])] \
                if os.path.isdir(part) else []
            prefiltered = True
        else:
            tables = _ray.get(list(source))
            prefiltered = False
        rows: list[tuple[str, np.ndarray, set, str]] = []
        for tbl in tables:
            if isinstance(tbl, _pd.DataFrame):
                if not len(tbl.columns):
                    continue
                tbl = pa.Table.from_pandas(tbl, preserve_index=False)
            for k, f, l, b in zip(tbl.column("sort_key").to_pylist(),
                                  tbl.column("features").to_pylist(),
                                  tbl.column("labels").to_pylist(),
                                  tbl.column("bag_id").to_pylist()):
                if not prefiltered and \
                        zlib.crc32(f"shard:{b}".encode()) % n_shards \
                        != shard_id:
                    continue
                rows.append((k, np.asarray(f, dtype=np.int64), set(l), b))
        rows.sort(key=lambda r: r[0])   # canonical datum order
        self.feats = [r[1] for r in rows]
        self.bags: dict[str, list[int]] = {}
        for i, r in enumerate(rows):
            self.bags.setdefault(r[3], []).append(i)
        self.gold_pos = {}
        for b, idxs in self.bags.items():
            self.gold_pos[b] = {
                j for i in idxs for rel in rows[i][2]
                if (j := _REL_INDEX.get(rel)) is not None}
        self.bag_names = sorted(self.bags)

    def dims(self) -> np.ndarray:
        flat = (np.concatenate(self.feats) if self.feats
                else np.empty(0, dtype=np.int64))
        return np.unique(flat) if flat.size else np.empty(0, np.int64)

    def prepare(self, dims: np.ndarray):
        remap = np.zeros(D_FEATURES, dtype=np.int64)
        if len(dims):
            remap[dims] = np.arange(len(dims))
        self.feats_c = [remap[f] for f in self.feats]
        self.n_bags = len(self.bag_names)
        return self.n_bags

    def run_epoch(self, W_mixed: np.ndarray, epoch: int):
        """One perceptron epoch from the mixed weights; returns the
        shard's end-of-epoch weights and its within-epoch averaged-weight
        accumulation (Σ over this epoch's bag steps of the live W —
        exact-integer float arithmetic, so the 1-shard case reproduces
        the in-memory trainer bit-for-bit)."""
        n_classes = W_mixed.shape[0]
        nil = n_classes - 1
        W = W_mixed.copy()
        AVG = np.zeros_like(W)
        last_t = np.zeros(n_classes, dtype=np.int64)
        t = 0

        def upd(label: int, ids: np.ndarray, w: float):
            AVG[label] += W[label] * (t - last_t[label])
            last_t[label] = t
            np.add.at(W[label], ids, w)

        for b in _hoffmann_epoch_order(self.bag_names, epoch):
            group = [self.feats_c[i] for i in self.bags[b]]
            _hoffmann_bag_step(W, group, self.gold_pos[b], nil, upd)
            t += 1
        for label in range(n_classes):
            AVG[label] += W[label] * (t - last_t[label])
        return W, AVG


def train_hoffmann_sharded(
    labeled,
    n_shards: int = 4,
    epochs: int = 10,
    ingest: str = "auto",
    spill_dir: str | None = None,
) -> HoffmannModel:
    """Distributed MultiR training over a labeled Dataset (columns
    sort_key / features / labels / bag_id) via ITERATIVE PARAMETER MIXING
    (McDonald, Hall & Mann, NAACL 2010, "Distributed Training Strategies
    for the Structured Perceptron"): bags shard across actors by content
    hash; each epoch every shard runs one sequential perceptron epoch
    from the uniformly-mixed weights, then the driver mixes
    ``W ← (1/S)·Σ W_s`` and accumulates the averaged-weight sum
    ``AVG += Σ AVG_s`` (the paper's averaged-IPM; the uniform 1/S on AVG
    is dropped — a global positive scale never changes per-mention
    argmax).  Driver memory is O(weights); datums stay in actors.

    Semantics: NOT bit-identical to ``train_hoffmann`` for n_shards > 1
    (perceptron updates are inherently sequential; IPM is the published
    convergence-preserving relaxation — McDonald et al. Theorem 2).  For
    n_shards=1 it IS bit-identical (verified in
    tests/test_hoffmann_sharded.py): per-epoch AVG flushes telescope to
    the in-memory trainer's continuous lazy accounting, exactly, because
    W is integer-valued so every product/sum is exact in float64.

    ``ingest`` as in ``train_mimlre_sharded``: ``refs`` ships block refs
    (object-store resident), ``parquet`` spills partitioned by shard so
    each actor reads only its 1/n_shards slice; ``auto`` picks by size.
    """
    import ray as _ray

    labeled = labeled.materialize()
    if ingest == "auto":
        from .miml import PARQUET_INGEST_THRESHOLD

        ingest = ("parquet" if labeled.count() > PARQUET_INGEST_THRESHOLD
                  else "refs")
    if ingest == "parquet":
        import tempfile

        spill_dir = spill_dir or tempfile.mkdtemp(prefix="hoffmann_shards_")

        def add_shard(batch: pa.Table) -> pa.Table:
            sh = [zlib.crc32(f"shard:{b}".encode()) % n_shards
                  for b in batch.column("bag_id").to_pylist()]
            return batch.append_column("__shard", pa.array(sh, pa.int32()))

        labeled.map_batches(add_shard, batch_format="pyarrow") \
            .write_parquet(spill_dir, partition_cols=["__shard"])
        sources = [spill_dir] * n_shards
    else:
        refs = list(labeled.to_arrow_refs())
        sources = [refs] * n_shards
    Shard = _ray.remote(_HoffmannShardImpl)
    actors = [Shard.remote(sources[i], i, n_shards)
              for i in range(n_shards)]
    n_classes = len(RELATION_NAMES) + 1
    try:
        shard_dims = _ray.get([a.dims.remote() for a in actors])
        nonempty = [d for d in shard_dims if len(d)]
        dims = (np.unique(np.concatenate(nonempty)) if nonempty
                else np.empty(0, dtype=np.int64))
        d_c = max(len(dims), 1)
        _ray.get([a.prepare.remote(dims) for a in actors])
        W = np.zeros((n_classes, d_c))
        AVG = np.zeros((n_classes, d_c))
        for epoch in range(epochs):
            ref = _ray.put(W)
            results = _ray.get([a.run_epoch.remote(ref, epoch)
                                for a in actors])
            W = np.mean([r[0] for r in results], axis=0)
            for _, avg_s in results:
                AVG += avg_s
        return HoffmannModel(avg_weights=AVG, dims=dims)
    finally:
        for a in actors:
            _ray.kill(a)


class HoffmannScorer:
    """Distributed test-time scoring for ``HoffmannModel`` (the MultiR
    classify path, HoffmannExtractor.java:489-523): per mention, avg-dot
    scores for every label; the top label (ties → HIGHER index, matching
    sortPredictions) is kept iff non-NIL, with its RAW averaged-perceptron
    score quantized into ``best_q``.  Emits the scored-mention schema the
    Hoffmann bag stage consumes (``sum_q`` mirrors best_q for schema
    compatibility; the bag reduce uses MAX, the deterministic-OR of the
    reference's Y layer)."""

    def __init__(self, model_ref):
        self._ref = model_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.broadcast import fetch

        model: HoffmannModel = fetch(self._ref)
        n = batch.num_rows
        n_classes = model.avg_weights.shape[0]
        nil = n_classes - 1
        if n == 0:
            out = batch.drop_columns(["features"])
            return (out.append_column("rel", pa.array([], pa.string()))
                    .append_column("sum_q", pa.array([], pa.int64()))
                    .append_column("best_q", pa.array([], pa.int64())))
        feat_col = batch.column("features").combine_chunks()
        offsets = feat_col.offsets.to_numpy().astype(np.int64)
        flat = feat_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        bounds = offsets[:-1] - offsets[0]
        dims = model.dims
        if len(flat) and len(dims):
            pos = np.searchsorted(dims, flat)
            pos_c = np.clip(pos, 0, len(dims) - 1)
            hit = (pos < len(dims)) & (dims[pos_c] == flat)
            gathered = np.ascontiguousarray(model.avg_weights.T)[pos_c]
            gathered[~hit] = 0.0
            if bounds.size and bounds[-1] == gathered.shape[0]:
                gathered = np.vstack(
                    [gathered,
                     np.zeros((1, n_classes), dtype=gathered.dtype)])
            S = np.add.reduceat(gathered, bounds, axis=0)
        else:
            S = np.zeros((n, n_classes))
        lens = np.diff(offsets)
        S[lens == 0] = 0.0          # featureless → all-zero → NIL via ties
        # argmax with ties to the HIGHER label index (sortPredictions)
        top = n_classes - 1 - np.argmax(S[:, ::-1], axis=1)
        keep = np.nonzero(top != nil)[0]
        rels = [RELATION_NAMES[t] for t in top[keep]]
        q = np.rint(S[keep, top[keep]] * SCORE_SCALE).astype(np.int64)
        kept = batch.take(pa.array(keep)).drop_columns(["features"])
        return (kept.append_column("rel", pa.array(rels, pa.string()))
                .append_column("sum_q", pa.array(q))
                .append_column("best_q", pa.array(q)))


def hoffmann_bag_reduce(df: pd.DataFrame) -> pa.Table:
    """Reduce side of the Hoffmann bag stage: per (pair, rel) keep the
    MAX-score mention (deterministic OR over the bag — classifyMentions'
    bestZScores) with its provenance; score = raw averaged-perceptron
    score (unbounded, NOT a probability — documented Hoffmann
    semantics)."""
    from ..schema import pd_to_arrow

    keys = PAIR_KEY + ["rel"]
    if not len(df):
        empty = df.iloc[0:0].drop(columns=["__bucket"], errors="ignore")
        empty = empty.rename(columns={"rel": "pred"})
        empty["score"] = pd.Series([], dtype="float64")
        cols = [c for c in ["subj", "subj_type", "pred", "obj", "obj_type",
                            "score"] + _PROV_COLS if c in empty.columns]
        return pd_to_arrow(empty[cols])
    df = df.drop(columns=["__bucket"], errors="ignore")
    df = df.sort_values(keys + _TIE_COLS,
                        ascending=[True] * len(keys) + [False] * len(_TIE_COLS),
                        kind="mergesort")
    out = df.drop_duplicates(keys, keep="first").copy()
    out["score"] = out["best_q"] / SCORE_SCALE
    out = out.rename(columns={"rel": "pred"})
    cols = ["subj", "subj_type", "pred", "obj", "obj_type", "score"] + _PROV_COLS
    return pd_to_arrow(out[cols])


def train_atleast_once(
    datum_features: list[np.ndarray],
    labels: list[set[str]],
    bag_ids: list[str],
    em_iters: int = 3,
    **lr_kwargs,
) -> LRModel:
    """At-least-once EM — a simplified cousin of the MultiR family over
    the shared LR learner (JointBayesRelationExtractor's E/M shape,
    JointBayesRelationExtractor.java:607-760).  For the EXACT Hoffmann
    latent averaged perceptron (HoffmannExtractor.java:133-311) use
    ``train_hoffmann`` — its edge-cover inference assigns distinct
    mentions to distinct labels, which this EM's independent per-label
    argmax cannot (see test_hoffmann_beats_em_on_ambiguous_bags):

    - init: naive distant supervision (every mention carries its bag's
      labels) → fit;
    - E-step: for each (bag, label), keep the label ONLY on the bag's
      current argmax-scoring mention (at least one mention expresses the
      relation; the rest become negatives) — deterministic argmax with
      first-mention-in-canonical-order tie-break;
    - M-step: refit.

    Distributed shape at scale: the E-step is a scoring ``map_batches``
    over bag-grouped datums and the M-step a gradient sum — the same
    machinery as the main pipeline (SURVEY.md §7.5 MIML note).
    """
    model = train_lr(datum_features, labels, **lr_kwargs)
    n = len(datum_features)
    bags: dict[str, list[int]] = {}
    for i, b in enumerate(bag_ids):
        bags.setdefault(b, []).append(i)
    for _ in range(em_iters):
        W, b_vec = model.weights, model.bias
        new_labels: list[set[str]] = [set() for _ in range(n)]
        for bag in sorted(bags):
            idxs = bags[bag]
            bag_labels = set().union(*(labels[i] for i in idxs))
            for rel in sorted(bag_labels):
                r = _REL_INDEX.get(rel)
                if r is None:
                    continue
                best_i, best_s = idxs[0], -np.inf
                for i in idxs:
                    ids = datum_features[i]
                    s = float(W[r, ids].sum() + b_vec[r]) if len(ids) else -np.inf
                    if s > best_s:
                        best_i, best_s = i, s
                new_labels[best_i].add(rel)
        model = train_lr(datum_features, new_labels, **lr_kwargs)
    return model
