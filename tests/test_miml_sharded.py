"""Bag-sharded MIML-RE training must be BIT-identical to the in-memory
trainer: z gradients are quantized-integer sums, the ICM E-step is
bag-local, and y-layer datums sort canonically by bag id."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def labeled_bags(ray_session):
    import ray.data as rd

    from stanford_re_ray.fixtures import gen_corpus
    from stanford_re_ray.pipelines.kg import (extract_stage, nlp_stage,
                                              pairs_stage)
    from stanford_re_ray.pipelines.train import (kb_to_lookup,
                                                 label_pairs_stage)

    train = gen_corpus(70, per_lo=0, per_hi=60, org_lo=0, org_hi=30)
    pages = rd.from_arrow(train.pages).repartition(5)
    labeled = label_pairs_stage(
        pairs_stage(nlp_stage(extract_stage(pages), train.dicts),
                    train.clusters),
        kb_to_lookup(train.kb), negative_subsample=1.0, emit_bag_id=True)
    return labeled.materialize()


def _collect(labeled):
    import pandas as pd

    dfs = [b for b in labeled.iter_batches(batch_size=8192,
                                           batch_format="pandas")]
    df = pd.concat(dfs, ignore_index=True)
    df = df.sort_values("sort_key", kind="mergesort").reset_index(drop=True)
    feats = [np.asarray(f, dtype=np.int64) for f in df["features"]]
    labels = [set(l) for l in df["labels"]]
    bags = list(df["bag_id"])
    return feats, labels, bags


def _digest(m) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(m.z_weights.tobytes())
    h.update(m.z_bias.tobytes())
    h.update(m.y_weights.tobytes())
    h.update(m.y_bias.tobytes())
    return h.hexdigest()


def test_sharded_miml_bit_identical(labeled_bags):
    from stanford_re_ray.stages.miml import (train_mimlre,
                                             train_mimlre_sharded)

    feats, labels, bags = _collect(labeled_bags)
    kw = dict(em_epochs=2, z_epochs=30)
    mem = train_mimlre(feats, labels, bags, **kw)
    sh2 = train_mimlre_sharded(labeled_bags, n_shards=2, **kw)
    sh3 = train_mimlre_sharded(labeled_bags, n_shards=3, **kw)
    d = _digest(mem)
    assert _digest(sh2) == d
    assert _digest(sh3) == d
    assert np.abs(mem.z_weights).sum() > 0


def test_sharded_miml_only_local(labeled_bags):
    from stanford_re_ray.stages.miml import (train_mimlre,
                                             train_mimlre_sharded)

    feats, labels, bags = _collect(labeled_bags)
    mem = train_mimlre(feats, labels, bags, only_local=True, z_epochs=20)
    sh = train_mimlre_sharded(labeled_bags, n_shards=2, only_local=True,
                              z_epochs=20)
    assert _digest(mem) == _digest(sh)


def test_sharded_miml_parquet_ingest(labeled_bags, tmp_path):
    """Partition-pruned Parquet ingest: each shard actor reads only its
    __shard=i partition, and the trained model is bit-identical to the
    refs ingest and the in-memory trainer."""
    import os

    from stanford_re_ray.stages.miml import (train_mimlre,
                                             train_mimlre_sharded)

    feats, labels, bags = _collect(labeled_bags)
    kw = dict(em_epochs=2, z_epochs=30)
    mem = train_mimlre(feats, labels, bags, **kw)
    spill = str(tmp_path / "shards")
    sh = train_mimlre_sharded(labeled_bags, n_shards=3, ingest="parquet",
                              spill_dir=spill, **kw)
    assert _digest(sh) == _digest(mem)
    # the spill really is partitioned by shard id
    parts = sorted(d for d in os.listdir(spill) if d.startswith("__shard="))
    assert parts == ["__shard=0", "__shard=1", "__shard=2"]
