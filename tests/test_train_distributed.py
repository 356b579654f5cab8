"""The sharded actor fit must be BIT-identical to the in-memory fit —
quantized-integer gradients make the per-epoch gradient an associative sum,
so datum partitioning cannot change the model."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def labeled_fixture(ray_session):
    import ray.data as rd

    from stanford_re_ray.fixtures import gen_corpus
    from stanford_re_ray.pipelines.kg import (extract_stage, nlp_stage,
                                              pairs_stage)
    from stanford_re_ray.pipelines.train import (kb_to_lookup,
                                                 label_pairs_stage)

    train = gen_corpus(80, per_lo=0, per_hi=80, org_lo=0, org_hi=40)
    pages = rd.from_arrow(train.pages).repartition(6)
    sentences = nlp_stage(extract_stage(pages), train.dicts)
    pairs = pairs_stage(sentences, train.clusters)
    labeled = label_pairs_stage(pairs, kb_to_lookup(train.kb),
                                negative_subsample=1.0)
    return labeled.materialize()


def _model_digest(model) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(model.weights.tobytes())
    h.update(model.bias.tobytes())
    return h.hexdigest()


def test_sharded_fit_bit_identical_to_memory(labeled_fixture):
    from stanford_re_ray.pipelines.train import fit_from_labeled, fit_sharded

    kw = dict(epochs=30, feature_count_threshold=2)
    mem = fit_from_labeled(labeled_fixture, mode="memory", **kw)
    sh3 = fit_sharded(labeled_fixture, n_shards=3, **kw)
    sh5 = fit_sharded(labeled_fixture, n_shards=5, **kw)
    d = _model_digest(mem)
    assert _model_digest(sh3) == d
    assert _model_digest(sh5) == d
    assert np.abs(mem.weights).sum() > 0  # a real model, not all-zeros


def test_fit_auto_dispatch(labeled_fixture):
    from stanford_re_ray.pipelines import train as T

    kw = dict(epochs=10, feature_count_threshold=2)
    auto = T.fit_from_labeled(labeled_fixture, mode="auto", **kw)
    forced = T.fit_from_labeled(labeled_fixture, mode="sharded", **kw)
    assert _model_digest(auto) == _model_digest(forced)
