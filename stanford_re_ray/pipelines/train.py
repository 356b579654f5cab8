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
) -> ray.data.Dataset:
    """Distant-supervision labeling as a map_batches with broadcast KB.
    Emits only labeled positives + hash-sampled negatives (the training
    set is ≪ the pair stream)."""
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
            rows_f, rows_l, rows_k = [], [], []
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
            return pa.table(
                {
                    "sort_key": pa.array(rows_k, pa.string()),
                    "features": pa.array(rows_f, pa.list_(pa.int64())),
                    "labels": pa.array(rows_l, pa.list_(pa.string())),
                }
            )

    return pairs.map_batches(Labeler(), batch_format="pyarrow")


def fit_from_labeled(labeled: ray.data.Dataset, **fit_kwargs) -> LRModel:
    """Collect labeled datums (sorted for determinism) and fit.

    Scale path: replace the collect with per-partition gradient partials
    summed in partition-id order (see train_lr docstring)."""
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
    **fit_kwargs,
) -> LRModel:
    """End-to-end: pages + KB → trained LRModel."""
    docs = extract_stage(pages)
    sentences = nlp_stage(docs, dicts)
    pairs = pairs_stage(sentences, clusters)
    labeled = label_pairs_stage(pairs, kb_to_lookup(kb_tbl), negative_subsample)
    return fit_from_labeled(labeled, **fit_kwargs)


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
