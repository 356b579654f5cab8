"""Distributed Hoffmann (MultiR) training via iterative parameter mixing
(classify.train_hoffmann_sharded): 1-shard bit-identity to the in-memory
trainer, multi-shard determinism, and rule recovery."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from stanford_re_ray.relations import RELATION_NAMES
from stanford_re_ray.stages.classify import (
    train_hoffmann,
    train_hoffmann_sharded,
)

REL_A, REL_B = RELATION_NAMES[0], RELATION_NAMES[1]
# feature ids chosen to be distinctive per planted relation
F_A, F_B, F_COMMON = 1001, 2002, 3003


def _labeled_rows():
    """24 bags, 2 datums each: bags 0..9 carry REL_A datums with feature
    F_A, bags 10..19 REL_B with F_B, bags 20..23 negatives (NIL)."""
    rows = []
    for b in range(24):
        if b < 10:
            labels, f = [REL_A], F_A
        elif b < 20:
            labels, f = [REL_B], F_B
        else:
            labels, f = [], 4000 + b
        for m in range(2):
            rows.append({
                "sort_key": f"{b:04d}:{m}",
                "features": [f, F_COMMON, 5000 + (b * 2 + m) % 7],
                "labels": labels,
                "bag_id": f"bag{b:04d}",
            })
    return rows


def _labeled_ds(blocks: int) -> rd.Dataset:
    rows = _labeled_rows()
    tbl = pa.table({
        "sort_key": pa.array([r["sort_key"] for r in rows], pa.string()),
        "features": pa.array([r["features"] for r in rows],
                             pa.list_(pa.int64())),
        "labels": pa.array([r["labels"] for r in rows],
                           pa.list_(pa.string())),
        "bag_id": pa.array([r["bag_id"] for r in rows], pa.string()),
    })
    return rd.from_arrow(tbl).repartition(blocks)


def _inmemory_model(epochs=10):
    rows = sorted(_labeled_rows(), key=lambda r: r["sort_key"])
    return train_hoffmann(
        [np.asarray(r["features"], dtype=np.int64) for r in rows],
        [set(r["labels"]) for r in rows],
        [r["bag_id"] for r in rows],
        epochs=epochs,
    )


def test_one_shard_bit_identical_to_inmemory(ray_session):
    ref = _inmemory_model()
    sharded = train_hoffmann_sharded(_labeled_ds(3), n_shards=1, epochs=10)
    np.testing.assert_array_equal(ref.dims, sharded.dims)
    np.testing.assert_array_equal(ref.avg_weights, sharded.avg_weights)


@pytest.mark.parametrize("ingest", ["refs", "parquet"])
def test_multi_shard_deterministic_and_recovers_rule(ray_session, ingest,
                                                     tmp_path):
    kw = dict(n_shards=3, epochs=10, ingest=ingest)
    if ingest == "parquet":
        kw["spill_dir"] = str(tmp_path / "shards")
    m1 = train_hoffmann_sharded(_labeled_ds(4), **kw)
    if ingest == "parquet":
        kw["spill_dir"] = str(tmp_path / "shards2")
    m2 = train_hoffmann_sharded(_labeled_ds(2), **kw)
    # deterministic: same rows → same weights regardless of block layout
    np.testing.assert_array_equal(m1.dims, m2.dims)
    np.testing.assert_array_equal(m1.avg_weights, m2.avg_weights)
    # recovers the planted feature→relation rule
    nil = len(RELATION_NAMES)
    ia, ib = (RELATION_NAMES.index(REL_A), RELATION_NAMES.index(REL_B))
    for f, expect in ((F_A, ia), (F_B, ib)):
        ids = m1._compact(np.array([f, F_COMMON]))
        scores = m1.avg_weights[:, ids].sum(axis=1)
        top = int(np.flatnonzero(scores == scores.max()).max())
        assert top == expect, (f, scores)
    # a negative-only feature vector must stay NIL
    ids = m1._compact(np.array([4020, F_COMMON]))
    scores = m1.avg_weights[:, ids].sum(axis=1)
    assert int(np.flatnonzero(scores == scores.max()).max()) == nil
