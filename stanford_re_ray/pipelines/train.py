"""Distant-supervision training pipeline (KBPTrainer analog,
kbp/sf/train/KBPTrainer.java:252-483).

Reuses S1–S4 of the KG pipeline, then:

    pairs ── map_batches(label via broadcast KB + hash-subsampled negatives)
          ── (driver) deterministic one-vs-all LR fit → LRModel parquet

The KB is the broadcast small side of the distant-supervision left join
(KnowledgeBase.java:35-44; KBPTrainer.java:266-334).  Labeled datums are a
tiny fraction of pages; the in-memory fit is deterministic (sorted datum
order, full-batch gradients — see ``classify.train_lr``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.classify import LRModel, build_training_datums, hash_features, train_lr
from ..stages.nlp import Dictionaries
from .kg import extract_stage, nlp_stage, pairs_stage


def kb_to_lookup(kb_tbl: pa.Table) -> dict[tuple[str, str], set[str]]:
    """KB table (entity_id, entity_name, rel, slot_value — KBPIR.java:141-188)
    → (subj_lower, obj_lower) → {relations} broadcast dict."""
    out: dict[tuple[str, str], set[str]] = {}
    for name, rel, val in zip(
        kb_tbl.column("entity_name").to_pylist(),
        kb_tbl.column("rel").to_pylist(),
        kb_tbl.column("slot_value").to_pylist(),
    ):
        out.setdefault((name.lower(), val.lower()), set()).add(rel)
    return out


def label_pairs_stage(
    pairs: ray.data.Dataset,
    kb: dict[tuple[str, str], set[str]],
    negative_subsample: float = 0.10,
    emit_bag_id: bool = False,
) -> ray.data.Dataset:
    """Distant-supervision labeling as a map_batches with broadcast KB.
    Emits only labeled positives + hash-sampled negatives (the training
    set is ≪ the pair stream).  ``emit_bag_id=True`` adds the KBPair bag
    key (needed by the MIML-RE trainer)."""
    kb_ref = ray.put(kb)

    class Labeler:
        """Task-pool stateless labeler; KB fetched once per worker process
        (state.broadcast.fetch cache)."""

        def __init__(self):
            self._ref = kb_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.hashing import hash_sample_keep
            from ..state.broadcast import fetch

            self.kb = fetch(self._ref)
            self.keep = hash_sample_keep
            subj = batch.column("subj").to_pylist()
            obj = batch.column("obj").to_pylist()
            feats = batch.column("features").to_pylist()
            docs = batch.column("doc_id").to_pylist()
            sidx = batch.column("sent_idx").to_pylist()
            sb = batch.column("subj_begin").to_pylist()
            ob = batch.column("obj_begin").to_pylist()
            rows_f, rows_l, rows_k, rows_b = [], [], [], []
            for i in range(len(subj)):
                rels = self.kb.get((subj[i].lower(), obj[i].lower()))
                if rels:
                    labs = sorted(rels)
                elif self.keep(subj[i] + "\x00" + obj[i], negative_subsample,
                               salt="neg"):
                    labs = []
                else:
                    continue
                rows_f.append(feats[i])
                rows_l.append(labs)
                # content-based sort key: the fit's float accumulation order
                # must not depend on batch/block boundaries
                rows_k.append(
                    f"{docs[i]}\x00{sidx[i]:06d}\x00{sb[i]:04d}\x00{ob[i]:04d}"
                )
                if emit_bag_id:
                    rows_b.append(subj[i].lower() + "\x00" + obj[i].lower())
            cols = {
                "sort_key": pa.array(rows_k, pa.string()),
                "features": pa.array(rows_f, pa.list_(pa.int64())),
                "labels": pa.array(rows_l, pa.list_(pa.string())),
            }
            if emit_bag_id:
                cols["bag_id"] = pa.array(rows_b, pa.string())
            return pa.table(cols)

    return pairs.map_batches(Labeler(), batch_format="pyarrow")


@ray.remote
class _GradShard:
    """Stateful gradient shard: holds one partition of the labeled datums
    (pulled straight from the object store — the driver never sees them)
    and answers per-epoch quantized-integer gradient calls.

    Raw Ray actor by design: an iterative optimizer with persistent
    per-shard state across epochs is the one shape the Dataset API cannot
    express (the map_batches callable would re-deserialize the CSR arrays
    every epoch)."""

    def __init__(self, block_refs: list):
        import pyarrow as _pa

        from ..stages.classify import hash_features  # noqa: F401 (worker import warm-up)

        tables = ray.get(list(block_refs))
        feats: list[np.ndarray] = []
        labels: list[set[str]] = []
        for t in tables:
            if isinstance(t, pd.DataFrame):
                if not len(t.columns):
                    continue
                t = _pa.Table.from_pandas(t, preserve_index=False)
            for f in t.column("features").to_pylist():
                feats.append(np.asarray(f, dtype=np.int64))
            for l in t.column("labels").to_pylist():
                labels.append(set(l))
        from ..stages.classify import dedup_datums

        self.n_total = len(feats)
        self.feats, self.labels, self.cnt = dedup_datums(feats, labels)

    def feature_counts(self):
        from ..relations import RELATION_NAMES
        from ..stages.classify import D_FEATURES, _REL_INDEX

        counts = np.zeros(D_FEATURES, dtype=np.int64)
        for ids, c in zip(self.feats, self.cnt):
            counts[ids] += c
        y_pos = np.zeros(len(RELATION_NAMES), dtype=np.int64)
        for labs, c in zip(self.labels, self.cnt):
            for rel in labs:
                j = _REL_INDEX.get(rel)
                if j is not None:
                    y_pos[j] += c
        return counts, y_pos, self.n_total

    def local_dims(self, valid: np.ndarray) -> np.ndarray:
        filtered = [ids[valid[ids]] for ids in self.feats]
        flat = (np.concatenate(filtered) if filtered
                else np.empty(0, dtype=np.int64))
        return np.unique(flat) if flat.size else np.empty(0, dtype=np.int64)

    def prepare(self, valid, dims, active, ex_pos, ex_neg) -> None:
        from ..stages.classify import datum_block_arrays

        (self.flat_c, self.seg, self.n_local,
         self.y_blk, self.ex_w) = datum_block_arrays(
            self.feats, self.labels, valid, dims, active, ex_pos, ex_neg)
        self.d_c = max(len(dims), 1)

    def grad(self, wb):
        from ..stages.classify import grad_block

        Wc, bias = wb
        return grad_block(self.flat_c, self.seg, self.n_local, self.y_blk,
                          self.ex_w, Wc, bias, self.d_c, cnt=self.cnt)


def fit_sharded(
    labeled: ray.data.Dataset,
    n_shards: int = 8,
    epochs: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
    feature_count_threshold: int = 5,
    pos_weight_cap: float = 30.0,
) -> LRModel:
    """Distributed LR fit: labeled-datum blocks stay in the object store,
    each ``_GradShard`` actor builds its CSR block once, and every epoch
    sums quantized-INTEGER per-shard gradient partials — associative, so
    the result is bit-identical to ``train_lr`` on the same datums under
    ANY partitioning (tests/test_train_distributed.py), with no
    driver-side datum materialization."""
    from ..stages.classify import assemble_model, class_weights, lr_optimize

    refs = [r for r in labeled.to_arrow_refs()]
    groups = [refs[i::n_shards] for i in range(n_shards)]
    groups = [g for g in groups if g]
    if not groups:
        return train_lr([], [], epochs=epochs, lr=lr, l2=l2,
                        feature_count_threshold=feature_count_threshold,
                        pos_weight_cap=pos_weight_cap)
    actors = [_GradShard.remote(g) for g in groups]
    try:
        parts = ray.get([a.feature_counts.remote() for a in actors])
        counts = parts[0][0].copy()
        y_pos = parts[0][1].copy()
        n = parts[0][2]
        for c2, y2, n2 in parts[1:]:
            counts += c2
            y_pos += y2
            n += n2
        valid = counts >= feature_count_threshold
        active = np.nonzero(y_pos > 0)[0]
        dims_parts = ray.get([a.local_dims.remote(valid) for a in actors])
        nonempty = [d for d in dims_parts if len(d)]
        dims = (np.unique(np.concatenate(nonempty)) if nonempty
                else np.empty(0, dtype=np.int64))
        d_c = max(len(dims), 1)
        ex_pos, ex_neg = class_weights(n, y_pos[active], pos_weight_cap)
        ray.get([a.prepare.remote(valid, dims, active, ex_pos, ex_neg)
                 for a in actors])

        def grad_fn(Wc, bias):
            wref = ray.put((Wc, bias))
            gparts = ray.get([a.grad.remote(wref) for a in actors])
            gq = gparts[0][0].copy()
            bq = gparts[0][1].copy()
            for g2, b2 in gparts[1:]:
                gq += g2
                bq += b2
            return gq, bq

        Wc, bias = lr_optimize(grad_fn, len(active), d_c, n, epochs, lr, l2)
    finally:
        for a in actors:
            ray.kill(a)
    return assemble_model(active, dims, Wc, bias)


#: above this many labeled datums, fit_from_labeled switches from the
#: in-memory collect to the sharded actor fit (identical result — the
#: gradient is an integer sum either way)
SHARDED_FIT_THRESHOLD = 200_000


def fit_from_labeled(labeled: ray.data.Dataset, mode: str = "auto",
                     n_shards: int = 8, **fit_kwargs) -> LRModel:
    """Fit the one-vs-all LR from the labeled-datum dataset.

    ``mode``: "auto" (sharded when the datum count exceeds
    SHARDED_FIT_THRESHOLD), "memory" (driver-side collect — small data),
    "sharded" (force the distributed path).  Both paths produce
    bit-identical models (quantized-integer gradients are associative)."""
    labeled = labeled.materialize()
    if mode == "sharded" or (
        mode == "auto" and labeled.count() > SHARDED_FIT_THRESHOLD
    ):
        return fit_sharded(labeled, n_shards=n_shards, **fit_kwargs)
    dfs = [b for b in labeled.iter_batches(batch_size=8192, batch_format="pandas")]
    if not dfs:
        return train_lr([], [], **fit_kwargs)
    df = pd.concat(dfs, ignore_index=True)
    df = df.sort_values("sort_key", kind="mergesort").reset_index(drop=True)
    feats = [np.asarray(f, dtype=np.int64) for f in df["features"]]
    labels = [set(l) for l in df["labels"]]
    return train_lr(feats, labels, **fit_kwargs)


def train_model(
    pages: ray.data.Dataset,
    kb_tbl: pa.Table,
    dicts: Dictionaries | None = None,
    clusters: dict[str, str] | None = None,
    negative_subsample: float = 0.10,
    kb_slot_matching: bool = True,
    **fit_kwargs,
) -> LRModel:
    """End-to-end: pages + KB → trained LRModel.

    ``kb_slot_matching`` (default on, as in the reference train path)
    string-matches known KB fills — including alternate values: year-only
    dates, first+last person names — directly into sentences during pair
    generation, recovering distant-supervision positives NER missed
    (RelationMentionAnnotator.java:104-205,407-466)."""
    from ..stages.pairs import kb_fills_lookup

    docs = extract_stage(pages)
    sentences = nlp_stage(docs, dicts)
    pairs = pairs_stage(
        sentences, clusters,
        kb_fills=kb_fills_lookup(kb_tbl) if kb_slot_matching else None)
    labeled = label_pairs_stage(pairs, kb_to_lookup(kb_tbl), negative_subsample)
    return fit_from_labeled(labeled, **fit_kwargs)


def train_model_mimlre(
    pages: ray.data.Dataset,
    kb_tbl: pa.Table,
    dicts: Dictionaries | None = None,
    clusters: dict[str, str] | None = None,
    negative_subsample: float = 0.10,
    mode: str = "auto",
    n_shards: int = 4,
    kb_slot_matching: bool = True,
    **miml_kwargs,
):
    """End-to-end MIML-RE training: pages + KB → MimlModel
    (KBPTrainer with ModelType.JOINT_BAYES).  The S1–S4 labeling runs
    distributed; the EM trainer runs in-memory for small labeled sets and
    switches to the bag-sharded actor trainer above
    ``SHARDED_FIT_THRESHOLD`` datums (``mode``: auto | memory | sharded —
    both paths are bit-identical, tests/test_miml_sharded.py)."""
    from ..stages.miml import train_mimlre, train_mimlre_sharded
    from ..stages.pairs import kb_fills_lookup

    docs = extract_stage(pages)
    sentences = nlp_stage(docs, dicts)
    pairs = pairs_stage(
        sentences, clusters,
        kb_fills=kb_fills_lookup(kb_tbl) if kb_slot_matching else None)
    labeled = label_pairs_stage(pairs, kb_to_lookup(kb_tbl),
                                negative_subsample,
                                emit_bag_id=True).materialize()
    if mode == "sharded" or (
        mode == "auto" and labeled.count() > SHARDED_FIT_THRESHOLD
    ):
        return train_mimlre_sharded(labeled, n_shards=n_shards,
                                    **miml_kwargs)
    dfs = [b for b in labeled.iter_batches(batch_size=8192,
                                           batch_format="pandas")]
    if not dfs:
        return train_mimlre([], [], [], **miml_kwargs)
    df = pd.concat(dfs, ignore_index=True)
    df = df.sort_values("sort_key", kind="mergesort").reset_index(drop=True)
    feats = [np.asarray(f, dtype=np.int64) for f in df["features"]]
    labels = [set(l) for l in df["labels"]]
    bags = list(df["bag_id"])
    return train_mimlre(feats, labels, bags, **miml_kwargs)


def train_model_hoffmann(
    pages: ray.data.Dataset,
    kb_tbl: pa.Table,
    dicts: Dictionaries | None = None,
    clusters: dict[str, str] | None = None,
    negative_subsample: float = 0.10,
    epochs: int = 10,
    kb_slot_matching: bool = True,
    mode: str = "auto",
    n_shards: int = 4,
):
    """End-to-end Hoffmann (MultiR) training: pages + KB → HoffmannModel
    (KBPTrainer with ModelType.AT_LEAST_ONCE).  S1–S4 + distant
    supervision run distributed; the latent averaged perceptron runs
    in-memory for small labeled sets (like the reference's single-JVM
    HoffmannExtractor.train) and switches to the iterative-parameter-
    mixing shard trainer (``classify.train_hoffmann_sharded``) above
    ``SHARDED_FIT_THRESHOLD`` datums (``mode``: auto | memory |
    sharded).  Unlike MIML, sharded-vs-memory is NOT bit-identical for
    n_shards > 1 — perceptron updates are sequential; IPM is the
    published relaxation (see train_hoffmann_sharded)."""
    from ..stages.classify import train_hoffmann, train_hoffmann_sharded
    from ..stages.pairs import kb_fills_lookup

    docs = extract_stage(pages)
    sentences = nlp_stage(docs, dicts)
    pairs = pairs_stage(
        sentences, clusters,
        kb_fills=kb_fills_lookup(kb_tbl) if kb_slot_matching else None)
    labeled = label_pairs_stage(pairs, kb_to_lookup(kb_tbl),
                                negative_subsample, emit_bag_id=True)
    if mode == "sharded" or (
        mode == "auto"
        and labeled.materialize().count() > SHARDED_FIT_THRESHOLD
    ):
        return train_hoffmann_sharded(labeled, n_shards=n_shards,
                                      epochs=epochs)
    dfs = [b for b in labeled.iter_batches(batch_size=8192,
                                           batch_format="pandas")]
    if not dfs:
        return train_hoffmann([], [], [], epochs=epochs)
    df = pd.concat(dfs, ignore_index=True)
    df = df.sort_values("sort_key", kind="mergesort").reset_index(drop=True)
    feats = [np.asarray(f, dtype=np.int64) for f in df["features"]]
    labels = [set(l) for l in df["labels"]]
    bags = list(df["bag_id"])
    return train_hoffmann(feats, labels, bags, epochs=epochs)


def feature_vocab(pairs: ray.data.Dataset,
                  threshold: int = 5) -> np.ndarray:
    """Distributed feature-count threshold — shuffle #2 of SURVEY.md §7.4
    (KBPDataset.applyFeatureCountThreshold; KBPTrainer.java:414-416).

    Combiner-style: each batch emits one (feature_id, partial_count) row
    per distinct id (np.unique per batch), then a single small
    groupby-sum; ids with global count ≥ threshold form the vocabulary
    (returned as a sorted id array — ≤ D_FEATURES ints, broadcastable).
    """
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        feat = batch.column("features").combine_chunks()
        flat = feat.flatten().to_numpy(zero_copy_only=False)
        ids, counts = np.unique(flat, return_counts=True)
        return pa.table({
            "feature_id": pa.array(ids.astype(np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        })

    counted = (
        pairs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("feature_id")
        .aggregate(Sum("n", alias_name="n"))
    )
    df = counted.to_pandas()
    keep = df[df["n"] >= threshold]["feature_id"].to_numpy()
    return np.sort(keep.astype(np.int64))
