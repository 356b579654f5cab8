"""MIML-RE / JOINT_BAYES — the reference's headline model (Surdeanu et al.
EMNLP 2012), rebuilt from
``kbp/sf/classify/JointBayesRelationExtractor.java:36-156`` (structure),
``:480-760`` (EM loop), ``:1528-1633`` (stable ICM inference),
``:1796-1869`` (y meta-features) and ``:1985-2100`` (test-time
classification).

Model structure:

- **z layer** — one multiclass (relations + NIL) softmax LR per FOLD,
  trained on out-of-fold bags (jackknifing so a bag's z inference never
  uses a classifier that saw its own mentions), plus a final single z
  classifier over all datums (``makeSingleZClassifier``).
- **y layer** — one tiny binary LR per relation over meta-features of the
  bag's z-label multiset: NONE, ATLEAST_ONCE, UNIQUE, COOC(y, z_other)
  (default feature set {ATLEAST_ONCE, COOC} + NONE per Props.java:188;
  UNIQUE available via ``y_features``).  Initialized with a BIG_WEIGHT on
  ATLEAST_ONCE (``initializeYClassifiersWithAtLeastOnce``, :1401-1447).
- **EM** — E-step: stable ICM over each bag's latent z labels
  (``inferZLabelsStable``): for each mention, each candidate z label is
  scored as logP(z|x) + Σ_pos logP(y=1|φ) + Σ_neg logP(y=0|φ); flips are
  counted and EM stops early when an epoch changes nothing.  M-step:
  refit fold z classifiers on the inferred z labels and y classifiers on
  the per-bag meta-feature datums.

Determinism (repo policy, replaces the reference's epoch-seeded
``randomizeGroup``): bags process in sorted bag_id order, mentions in
original order, ties in ICM break by z-label index; fold assignment is a
content hash of the bag id, not an array index.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..relations import RELATION_NAMES
from .classify import D_FEATURES, _REL_INDEX

NIL = "_NR"  # RelationMention.UNRELATED analog
Z_LABELS = list(RELATION_NAMES) + [NIL]
NIL_IDX = len(RELATION_NAMES)
R = len(RELATION_NAMES)

#: y meta-feature layout: [none, atleastonce, unique, cooc_0..cooc_{R-1}]
Y_DIM = 3 + R
_F_NONE, _F_ATLEAST, _F_UNIQUE = 0, 1, 2
BIG_WEIGHT = 10.0  # initializeYClassifiersWithAtLeastOnce, :1420


@dataclass
class MimlModel:
    """z fold classifiers are a training artifact; the serialized model is
    the single z classifier + the y layer (what test-time inference uses,
    JointBayesRelationExtractor.classifyRelations)."""

    z_weights: np.ndarray          # (R+1, D) float32 — multiclass softmax
    z_bias: np.ndarray             # (R+1,)
    y_weights: np.ndarray          # (R, Y_DIM) float32 — binary LR per rel
    y_bias: np.ndarray             # (R,)
    y_features: tuple = ("atleast_once", "cooc")

    def to_table(self) -> pa.Table:
        nz_r, nz_d = np.nonzero(self.z_weights)
        ny_r, ny_d = np.nonzero(self.y_weights)
        return pa.table({
            "layer": pa.array(["z"] * len(nz_r) + ["y"] * len(ny_r)
                              + ["zb"] * len(self.z_bias)
                              + ["yb"] * len(self.y_bias)),
            "row": pa.array(
                np.concatenate([nz_r, ny_r,
                                np.arange(len(self.z_bias)),
                                np.arange(len(self.y_bias))]).astype(np.int32)),
            "col": pa.array(
                np.concatenate([nz_d, ny_d,
                                np.zeros(len(self.z_bias)),
                                np.zeros(len(self.y_bias))]).astype(np.int32)),
            "value": pa.array(np.concatenate([
                self.z_weights[nz_r, nz_d], self.y_weights[ny_r, ny_d],
                self.z_bias, self.y_bias]).astype(np.float32)),
        })

    @staticmethod
    def from_table(t: pa.Table) -> "MimlModel":
        zw = np.zeros((R + 1, D_FEATURES), dtype=np.float32)
        yw = np.zeros((R, Y_DIM), dtype=np.float32)
        zb = np.zeros(R + 1, dtype=np.float32)
        yb = np.zeros(R, dtype=np.float32)
        layer = t.column("layer").to_pylist()
        row = t.column("row").to_numpy()
        col = t.column("col").to_numpy()
        val = t.column("value").to_numpy()
        for L, r_, c_, v in zip(layer, row, col, val):
            if L == "z":
                zw[int(r_), int(c_)] = v
            elif L == "y":
                yw[int(r_), int(c_)] = v
            elif L == "zb":
                zb[int(r_)] = v
            else:
                yb[int(r_)] = v
        return MimlModel(zw, zb, yw, yb)

    def save(self, path: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(self.to_table(), path)

    @staticmethod
    def load(path: str) -> "MimlModel":
        import pyarrow.parquet as pq

        return MimlModel.from_table(pq.read_table(path))


def y_feature_vector(y_idx: int, z_counts: np.ndarray,
                     y_features: tuple) -> np.ndarray:
    """extractYFeatures (:1796-1869): meta-features of the bag's z-label
    multiset for relation y.  ``z_counts``: (R+1,) counts of inferred z
    labels over the bag's mentions."""
    v = np.zeros(Y_DIM, dtype=np.float64)
    count = z_counts[y_idx]
    others = [k for k in range(R) if k != y_idx and z_counts[k] > 0]
    if count == 0:
        v[_F_NONE] = 1.0
    if count > 0 and "atleast_once" in y_features:
        v[_F_ATLEAST] = 1.0
    if count > 0 and "cooc" in y_features:
        for k in others:
            v[3 + k] = 1.0
    if count > 0 and "unique" in y_features and not others:
        v[_F_UNIQUE] = 1.0
    return v


def _y_log_probs(model_yw, model_yb, y_idx: int, vec: np.ndarray):
    """Binary LR: returns (logP(y=1|φ), logP(y=0|φ)) via log-sigmoid."""
    s = float(model_yw[y_idx] @ vec + model_yb[y_idx])
    # numerically stable log σ(s), log σ(-s)
    lp = -np.logaddexp(0.0, -s)
    ln = -np.logaddexp(0.0, s)
    return lp, ln


def y_joint_logprob(yW, yB, counts, active_idx, pos_mask,
                    y_features) -> float:
    """Σ_{y∈pos} logP(y=1|φ(y,z)) + Σ_{y∈neg} logP(y=0|φ(y,z)), computed
    for every active relation at once (vectorized equivalent of calling
    ``y_feature_vector`` + ``_y_log_probs`` per label — the ICM sweep's
    hot path)."""
    nz = np.nonzero(counts[:R] > 0)[0]
    W = yW[active_idx]
    cnt_a = counts[active_idx]
    atleast = cnt_a > 0
    s = yB[active_idx] + np.where(~atleast, W[:, _F_NONE], 0.0)
    if "atleast_once" in y_features:
        s = s + np.where(atleast, W[:, _F_ATLEAST], 0.0)
    if "cooc" in y_features:
        in_nz = np.isin(active_idx, nz)
        cooc = (W[:, 3 + nz].sum(axis=1) if len(nz)
                else np.zeros(len(active_idx)))
        self_c = np.where(in_nz,
                          W[np.arange(len(active_idx)), 3 + active_idx],
                          0.0)
        s = s + np.where(atleast, cooc - self_c, 0.0)
    if "unique" in y_features:
        in_nz = np.isin(active_idx, nz)
        n_others = len(nz) - in_nz.astype(np.int64)
        s = s + np.where(atleast & (n_others == 0), W[:, _F_UNIQUE], 0.0)
    lp1 = -np.logaddexp(0.0, -s)
    lp0 = -np.logaddexp(0.0, s)
    return float(np.where(pos_mask, lp1, lp0).sum())


def _fit_softmax(flat_c, seg, n, z_labels, n_classes, d_c,
                 epochs=80, lr=0.5, l2=1e-4):
    """Deterministic full-batch softmax (multinomial) LR over the compact
    feature space — the LinearClassifierFactory analog for the z layer."""
    Wc = np.zeros((n_classes, d_c), dtype=np.float64)
    bias = np.zeros(n_classes, dtype=np.float64)
    vel_w = np.zeros_like(Wc)
    vel_b = np.zeros(n_classes)
    onehot = np.zeros((n_classes, n), dtype=np.float64)
    if n:
        onehot[z_labels, np.arange(n)] = 1.0
    for _ in range(epochs):
        S = np.empty((n_classes, n), dtype=np.float64)
        for k in range(n_classes):
            S[k] = np.bincount(seg, weights=Wc[k][flat_c], minlength=n)
        S += bias[:, None]
        S -= S.max(axis=0, keepdims=True)
        E = np.exp(S)
        P = E / E.sum(axis=0, keepdims=True)
        resid = onehot - P               # (n_classes, n)
        for k in range(n_classes):
            grad = np.bincount(flat_c, weights=resid[k][seg], minlength=d_c)
            grad -= l2 * Wc[k]
            vel_w[k] = 0.9 * vel_w[k] + grad / max(n, 1)
            vel_b[k] = 0.9 * vel_b[k] + resid[k].sum() / max(n, 1)
        Wc += lr * vel_w
        bias += lr * vel_b
    return Wc, bias


def _fit_binary(X: np.ndarray, y: np.ndarray, epochs=150, lr=0.5, l2=1e-4):
    """Tiny dense binary LR (the y-layer trainer): full-batch, deterministic."""
    d = X.shape[1]
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    vw = np.zeros(d)
    vb = 0.0
    n = len(y)
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        resid = y - p
        grad = X.T @ resid - l2 * w
        vw = 0.9 * vw + grad / max(n, 1)
        vb = 0.9 * vb + resid.sum() / max(n, 1)
        w += lr * vw
        b += lr * vb
    return w, b


class _ZData:
    """Compact CSR view of the datums with per-bag grouping + fold ids."""

    def __init__(self, datum_features, labels, bag_ids, n_folds):
        self.n = len(datum_features)
        self.feats = [np.asarray(f, dtype=np.int64) for f in datum_features]
        flat_all = (np.concatenate(self.feats) if self.feats
                    else np.empty(0, dtype=np.int64))
        self.dims = (np.unique(flat_all) if flat_all.size
                     else np.empty(0, dtype=np.int64))
        self.d_c = max(len(self.dims), 1)
        remap = np.zeros(D_FEATURES, dtype=np.int64)
        if len(self.dims):
            remap[self.dims] = np.arange(len(self.dims))
        lens = np.fromiter((len(f) for f in self.feats), np.int64,
                           count=self.n)
        self.flat_c = remap[np.concatenate(self.feats)] if flat_all.size \
            else np.empty(0, dtype=np.int64)
        self.seg = np.repeat(np.arange(self.n), lens)
        self.indptr = np.concatenate(([0], np.cumsum(lens)))
        self.bags: dict[str, list[int]] = {}
        for i, b in enumerate(bag_ids):
            self.bags.setdefault(b, []).append(i)
        self.bag_order = sorted(self.bags)
        self.fold_of = {
            b: zlib.crc32(f"fold:{b}".encode()) % n_folds
            for b in self.bag_order
        }
        # positive y labels per bag = union of member DS labels
        self.pos: dict[str, list[int]] = {}
        for b, idxs in self.bags.items():
            labs = set()
            for i in idxs:
                labs |= {j for rel in labels[i]
                         if (j := _REL_INDEX.get(rel)) is not None}
            self.pos[b] = sorted(labs)

    def z_scores(self, Wc, bias, idxs):
        """Softmax log-probs of the fold classifier for the given datums:
        returns (len(idxs), n_classes) log P(z|x)."""
        out = np.empty((len(idxs), Wc.shape[0]), dtype=np.float64)
        for j, i in enumerate(idxs):
            ids = self.flat_c[self.indptr[i]:self.indptr[i + 1]]
            s = Wc[:, ids].sum(axis=1) + bias
            s = s - s.max()
            lse = np.log(np.exp(s).sum())
            out[j] = s - lse
        return out


def train_mimlre(
    datum_features: list[np.ndarray],
    labels: list[set[str]],
    bag_ids: list[str],
    n_folds: int = 3,
    em_epochs: int = 8,
    y_features: tuple = ("atleast_once", "cooc"),
    z_epochs: int = 80,
    only_local: bool = False,
) -> MimlModel:
    """Full MIML-RE trainer (JointBayesRelationExtractor.train, :443-790).

    Defaults follow scripts/config/base.conf (folds=3, epochs=8) rather
    than the code defaults (5/10).  ``only_local=True`` reproduces
    ``onlyLocalTraining`` — init without the EM loop.

    Scale note: the labeled-bag table is the TRAINING set (≪ corpus; the
    same object the sharded LR fit consumes).  This trainer is in-memory
    like the reference; the per-fold z fits reuse the quantization-free
    softmax on compact dims, and the E-step is bag-local (would shard by
    bag hash — each bag's ICM touches only its own mentions).
    """
    zd = _ZData(datum_features, labels, bag_ids, n_folds)
    n_classes = R + 1

    # --- init z: naive DS (first sorted bag label; NIL for negatives) ----
    z_lab = np.full(zd.n, NIL_IDX, dtype=np.int64)
    for b in zd.bag_order:
        if zd.pos[b]:
            z_lab[zd.bags[b]] = zd.pos[b][0]
    naive_lab = z_lab.copy()

    def fit_fold_classifiers(z_lab_now):
        folds = []
        for f in range(n_folds):
            keep = np.zeros(zd.n, dtype=bool)
            for b in zd.bag_order:
                if zd.fold_of[b] != f:     # train on OUT-of-fold bags
                    keep[zd.bags[b]] = True
            sel = np.nonzero(keep)[0]
            mask = keep[zd.seg]
            # re-segment the kept datums
            old_to_new = -np.ones(zd.n, dtype=np.int64)
            old_to_new[sel] = np.arange(len(sel))
            folds.append(_fit_softmax(
                zd.flat_c[mask], old_to_new[zd.seg[mask]], len(sel),
                z_lab_now[sel], n_classes, zd.d_c, epochs=z_epochs))
        return folds

    fold_clf = fit_fold_classifiers(z_lab)

    # initializeZLabels: replace naive init with own-fold predictions
    for b in zd.bag_order:
        Wc, bias = fold_clf[zd.fold_of[b]]
        lp = zd.z_scores(Wc, bias, zd.bags[b])
        z_lab[zd.bags[b]] = lp.argmax(axis=1)

    # --- init y: BIG_WEIGHT on atleastonce ------------------------------
    yW = np.zeros((R, Y_DIM), dtype=np.float64)
    yB = np.zeros(R, dtype=np.float64)
    yW[:, _F_ATLEAST] = BIG_WEIGHT
    yW[:, _F_NONE] = -BIG_WEIGHT

    active = sorted({j for p in zd.pos.values() for j in p})

    if not only_local and zd.n:
        for _epoch in range(em_epochs):
            flips = 0
            y_X: dict[int, list[np.ndarray]] = {j: [] for j in active}
            y_y: dict[int, list[float]] = {j: [] for j in active}
            active_idx = np.asarray(active, dtype=np.int64)
            for b in zd.bag_order:
                idxs = zd.bags[b]
                Wc, bias = fold_clf[zd.fold_of[b]]
                lp = zd.z_scores(Wc, bias, idxs)
                pos = zd.pos[b]
                pos_mask = np.isin(active_idx, pos)
                counts = np.bincount(z_lab[idxs], minlength=n_classes)
                # stable ICM sweep (inferZLabelsStable, :1528-1633)
                for s, i in enumerate(idxs):
                    orig = z_lab[i]
                    best_c, best_lp = orig, -np.inf
                    for c in range(n_classes):
                        counts[orig] -= 1
                        counts[c] += 1
                        logp = lp[s, c] + y_joint_logprob(
                            yW, yB, counts, active_idx, pos_mask, y_features)
                        counts[c] -= 1
                        counts[orig] += 1
                        if logp > best_lp:
                            best_lp, best_c = logp, c
                    if best_c != orig:
                        counts[orig] -= 1
                        counts[best_c] += 1
                        z_lab[i] = best_c
                        flips += 1
                # y datums from the inferred z multiset (addYDatum)
                for ylab in active:
                    y_X[ylab].append(y_feature_vector(ylab, counts,
                                                      y_features))
                    y_y[ylab].append(1.0 if ylab in pos else 0.0)
            if flips == 0:
                break  # before the M step, like the reference (:699-704)
            # M step
            fold_clf = fit_fold_classifiers(z_lab)
            for j in active:
                if y_X[j]:
                    w, b_ = _fit_binary(np.stack(y_X[j]),
                                        np.asarray(y_y[j]))
                    yW[j], yB[j] = w, b_

    # final single z classifier over ALL datums (makeSingleZClassifier);
    # only_local keeps the naive-DS labels — the reference returns before
    # EM ever relabels, so its local model is trained on raw DS labels
    final_lab = naive_lab if only_local else z_lab
    Wc_all, bias_all = _fit_softmax(
        zd.flat_c, zd.seg, zd.n, final_lab, n_classes, zd.d_c,
        epochs=z_epochs)
    zw = np.zeros((n_classes, D_FEATURES), dtype=np.float32)
    zw[:, zd.dims] = Wc_all.astype(np.float32)
    return MimlModel(zw, bias_all.astype(np.float32),
                     yW.astype(np.float32), yB.astype(np.float32),
                     y_features=y_features)


# ---------------------------------------------------------------------------
# Distributed inference (Ray Data stages)
# ---------------------------------------------------------------------------
# Same physical plan as the LR path (classify.py): a mention-scoring
# map_batches with broadcast weights that DROPS NIL mentions before the
# shuffle, a map-side combiner collapsing each batch to one row per
# (pair, rel), and a bucket-keyed bag reduce that applies the y layer.
# The per-mention noisy-or factors ride as QUANTIZED log(1-p) int64 sums —
# associative, so results are bit-identical under any partitioning.

MIML_LOG_SCALE = 1_000_000_000

_MIML_PAIR_KEY = ["subj", "subj_type", "obj", "obj_type"]
_MIML_PROV = ["doc_id", "sent_idx", "subj_begin", "subj_end",
              "obj_begin", "obj_end"]


class MimlScorer:
    """map_batches over PAIRS → per-mention z* rows (non-NIL only).

    Task-pool instance with a broadcast model handle; the compact z-weight
    gather is cached per worker process (same pattern as MentionScorer)."""

    def __init__(self, model_ref):
        self._ref = model_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.broadcast import fetch

        model = fetch(self._ref)
        compact = getattr(model, "_compact", None)
        if compact is None:
            nz = np.nonzero(np.any(model.z_weights != 0, axis=0))[0]
            Wc = np.ascontiguousarray(model.z_weights[:, nz].T)  # (d, R+1)
            compact = (nz.astype(np.int64), Wc)
            try:
                model._compact = compact
            except Exception:
                pass
        dims, Wc = compact
        b = model.z_bias.astype(np.float64)
        n = batch.num_rows
        if n == 0:
            out = batch.drop_columns(["features"])
            return (out.append_column("rel", pa.array([], pa.string()))
                    .append_column("n_mentions", pa.array([], pa.int64()))
                    .append_column("log1m_q", pa.array([], pa.int64()))
                    .append_column("best_q", pa.array([], pa.int64())))
        feat_col = batch.column("features").combine_chunks()
        offsets = feat_col.offsets.to_numpy().astype(np.int64)
        flat = feat_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        bounds = offsets[:-1] - offsets[0]
        lens = np.diff(offsets)
        if len(flat) and len(dims):
            pos = np.searchsorted(dims, flat)
            pos_c = np.clip(pos, 0, len(dims) - 1)
            hit = (pos < len(dims)) & (dims[pos_c] == flat)
            gathered = Wc[pos_c]
            gathered[~hit] = 0.0
            if bounds.size and bounds[-1] == gathered.shape[0]:
                gathered = np.vstack(
                    [gathered,
                     np.zeros((1, gathered.shape[1]), dtype=gathered.dtype)])
            S = np.add.reduceat(gathered, bounds, axis=0)
        else:
            S = np.zeros((n, len(b)), dtype=np.float64)
        S = S.astype(np.float64) + b
        S[lens == 0] = 0.0
        S = S - S.max(axis=1, keepdims=True)
        E = np.exp(S)
        P = E / E.sum(axis=1, keepdims=True)
        zstar = P.argmax(axis=1)
        pstar = P[np.arange(n), zstar]
        keep_idx = np.nonzero(zstar != NIL_IDX)[0]
        rels = [Z_LABELS[z] for z in zstar[keep_idx]]
        log1m = np.log(np.clip(1.0 - pstar[keep_idx], 1e-15, 1.0))
        log1m_q = np.rint(log1m * MIML_LOG_SCALE).astype(np.int64)
        best_q = np.rint(pstar[keep_idx] * MIML_LOG_SCALE).astype(np.int64)
        kept = batch.take(pa.array(keep_idx)).drop_columns(["features"])
        return (
            kept.append_column("rel", pa.array(rels, pa.string()))
            .append_column("n_mentions",
                           pa.array(np.ones(len(keep_idx), np.int64)))
            .append_column("log1m_q", pa.array(log1m_q))
            .append_column("best_q", pa.array(best_q))
        )


def _miml_combine(df, n_buckets: int | None):
    """Per-(pair, rel) partial merge: n_mentions and log1m_q add; the best
    provenance row is the max of (best_q, provenance) — associative."""
    import pandas as pd
    import zlib as _z

    from ..schema import pd_to_arrow

    keys = _MIML_PAIR_KEY + ["rel"]
    tie = ["best_q", "doc_id", "sent_idx", "subj_begin", "obj_begin"]
    if not len(df):
        empty = df.iloc[0:0].copy()
        if n_buckets is not None and "__bucket" not in empty.columns:
            empty["__bucket"] = pd.Series([], dtype="int32")
        return pd_to_arrow(empty)
    df = df.sort_values(keys + tie,
                        ascending=[True] * len(keys) + [False] * len(tie),
                        kind="mergesort")
    sums = df.groupby(keys, sort=False)[["n_mentions", "log1m_q"]].sum()
    best = df.drop_duplicates(keys, keep="first").set_index(keys)
    out = best.drop(columns=["n_mentions", "log1m_q"]).join(sums).reset_index()
    if n_buckets is not None:
        bucket = [
            _z.crc32("\x00".join(t).encode("utf-8", "surrogatepass"))
            % n_buckets
            for t in zip(*(out[c] for c in _MIML_PAIR_KEY))
        ]
        out["__bucket"] = pd.Series(bucket, dtype="int32")
    cols = (_MIML_PAIR_KEY + ["rel", "n_mentions", "log1m_q", "best_q"]
            + _MIML_PROV + (["__bucket"] if n_buckets is not None else []))
    return pd_to_arrow(out[[c for c in cols if c in out.columns]])


def miml_bag_reduce(df, y_weights: np.ndarray, y_bias: np.ndarray,
                    y_features: tuple, threshold: float = 0.5):
    """Bag reduce: merge partials, then apply the y layer per pair —
    Y_THEN_NOISY_OR output (classifyRelations, :2085-2094)."""
    import pandas as pd

    from ..schema import pd_to_arrow

    def _empty(frame):
        empty = frame.iloc[0:0].drop(columns=["__bucket"], errors="ignore")
        empty = empty.rename(columns={"rel": "pred"})
        empty["score"] = pd.Series([], dtype="float64")
        cols = [c for c in ["subj", "subj_type", "pred", "obj", "obj_type",
                            "score"] + _MIML_PROV if c in empty.columns]
        return pd_to_arrow(empty[cols])

    if not len(df):
        return _empty(df)
    merged = _miml_combine(df.drop(columns=["__bucket"], errors="ignore"),
                           None).to_pandas()
    rows = []
    for _, g in merged.groupby(_MIML_PAIR_KEY, sort=True):
        counts = np.zeros(R + 1, dtype=np.int64)
        rel_rows = {}
        for rec in g.to_dict("records"):
            j = _REL_INDEX.get(rec["rel"])
            if j is None:
                continue
            counts[j] = rec["n_mentions"]
            rel_rows[j] = rec
        for j, rec in sorted(rel_rows.items()):
            v = y_feature_vector(j, counts, y_features)
            s = float(y_weights[j] @ v + y_bias[j])
            p_y = 1.0 / (1.0 + np.exp(-s))
            if p_y <= threshold:
                continue
            score = 1.0 - np.exp(rec["log1m_q"] / MIML_LOG_SCALE)
            row = {k: rec[k] for k in _MIML_PAIR_KEY + _MIML_PROV}
            row["pred"] = rec["rel"]
            row["score"] = float(min(max(score, 0.0), 1.0))
            rows.append(row)
    if not rows:
        return _empty(merged)
    out = pd.DataFrame(rows)
    cols = ["subj", "subj_type", "pred", "obj", "obj_type", "score"] + _MIML_PROV
    return pd_to_arrow(out[cols])


def miml_score_stage(pairs, model: MimlModel):
    """S5 (MIML variant): broadcast the model once, score mentions, drop
    NIL before the shuffle."""
    import ray

    model_ref = ray.put(model)
    return pairs.map_batches(MimlScorer(model_ref), batch_format="pyarrow",
                             batch_size=1024)


def miml_bag_stage(scored, model: MimlModel, n_buckets: int = 64,
                   threshold: float = 0.5):
    """S6 (MIML variant): map-side combiner → bucket shuffle → y-layer bag
    reduce.  The y weights are tiny ((R, 3+R) floats) and ride in the
    reduce closure."""
    yw = model.y_weights.astype(np.float64)
    yb = model.y_bias.astype(np.float64)
    yf = model.y_features
    partials = scored.map_batches(
        lambda df, _n=n_buckets: _miml_combine(df, _n),
        batch_format="pandas",
    )
    return partials.groupby("__bucket").map_groups(
        lambda g: miml_bag_reduce(g, yw, yb, yf, threshold),
        batch_format="pandas",
    )


def classify_bags(model: MimlModel,
                  bag_datums: dict[str, list[np.ndarray]],
                  threshold: float = 0.5) -> dict[str, dict[str, float]]:
    """Test-time Y_THEN_NOISY_OR classification (classifyRelations,
    :1985-2100, Props.TRAIN_JOINTBAYES_OUTDISTRIBUTION default): per
    mention take z* = argmax P(z|x); per relation keep it iff
    P(y=1 | φ(y, z*)) > threshold; score = noisy-or of the P(z*|x) of the
    mentions predicted as that relation."""
    out: dict[str, dict[str, float]] = {}
    for bag, datums in bag_datums.items():
        counts = np.zeros(R + 1, dtype=np.int64)
        noisy: dict[int, float] = {}
        for ids in datums:
            ids = np.asarray(ids, dtype=np.int64)
            s = model.z_weights[:, ids].sum(axis=1) + model.z_bias
            s = s - s.max()
            p = np.exp(s)
            p /= p.sum()
            zstar = int(p.argmax())
            counts[zstar] += 1
            if zstar != NIL_IDX:
                noisy[zstar] = noisy.get(zstar, 1.0) * (1.0 - float(p[zstar]))
        preds: dict[str, float] = {}
        for j in range(R):
            if counts[j] == 0:
                continue
            v = y_feature_vector(j, counts, model.y_features)
            s = float(model.y_weights[j] @ v + model.y_bias[j])
            p_y = 1.0 / (1.0 + np.exp(-s))
            if p_y > threshold:
                preds[RELATION_NAMES[j]] = 1.0 - noisy.get(j, 1.0)
        out[bag] = preds
    return out
