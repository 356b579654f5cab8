"""Model zoo (perceptron, ensemble), config-driven pipeline, salted
canonicalization equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from stanford_re_ray.fixtures import gen_corpus


def test_perceptron_separates_simple_data():
    from stanford_re_ray.stages.classify import train_perceptron

    # datums: feature 1 ⇒ per:spouse, feature 2 ⇒ negative
    feats = [np.array([1]), np.array([2]), np.array([1]), np.array([2])] * 3
    labels = [{"per:spouse"}, set(), {"per:spouse"}, set()] * 3
    m = train_perceptron(feats, labels, epochs=5, feature_count_threshold=1)
    from stanford_re_ray.relations import RELATION_NAMES

    r = RELATION_NAMES.index("per:spouse")
    assert m.weights[r, 1] > 0
    assert m.weights[r, 1] > m.weights[r, 2]


def _scored(rows, model_tag):
    return pa.table({
        "subj": [r[0] for r in rows], "subj_type": ["PERSON"] * len(rows),
        "obj": [r[1] for r in rows], "obj_type": ["PERSON"] * len(rows),
        "doc_id": ["d"] * len(rows),
        "sent_idx": pa.array([0] * len(rows), pa.int32()),
        "subj_begin": pa.array([0] * len(rows), pa.int32()),
        "subj_end": pa.array([1] * len(rows), pa.int32()),
        "obj_begin": pa.array([r[3] for r in rows], pa.int32()),
        "obj_end": pa.array([r[3] + 1 for r in rows], pa.int32()),
        "rel": [r[2] for r in rows],
        "sum_q": pa.array([r[4] for r in rows], pa.int64()),
        "best_q": pa.array([r[4] for r in rows], pa.int64()),
    })


def test_ensemble_vote_modes():
    from stanford_re_ray.stages.classify import ensemble_scores

    m1 = _scored([("A", "B", "per:spouse", 2, 900), ("A", "C", "per:siblings", 5, 700)], 0)
    m2 = _scored([("A", "B", "per:spouse", 2, 800)], 1)
    any_ = ensemble_scores([m1, m2], "agree_any").to_pandas()
    assert len(any_) == 2
    # max score wins for the agreed key
    assert any_[any_["rel"] == "per:spouse"]["sum_q"].iloc[0] == 900
    all_ = ensemble_scores([m1, m2], "agree_all").to_pandas()
    assert len(all_) == 1 and all_["rel"].iloc[0] == "per:spouse"


@pytest.fixture(scope="module")
def trained(ray_session):
    import ray.data as rd

    from stanford_re_ray.pipelines.train import train_model

    train = gen_corpus(250, per_lo=0, per_hi=200, org_lo=0, org_hi=100)
    model = train_model(rd.from_arrow(train.pages).repartition(4), train.kb,
                        dicts=train.dicts, clusters=train.clusters,
                        negative_subsample=1.0, epochs=100)
    test = gen_corpus(120, per_lo=200, per_hi=400, org_lo=100, org_hi=200,
                      base_url="https://t.example")
    return model, test


def test_cfg_pipeline_with_rules_and_competition(ray_session, trained):
    import ray.data as rd

    from stanford_re_ray.config import PipelineConfig
    from stanford_re_ray.evaluate import score_triples
    from stanford_re_ray.pipelines.kg import dataset_to_table, run_kg_pipeline_cfg

    model, test = trained
    cfg = PipelineConfig(use_rules=True, sentence_competition=False,
                        add_inverses=True)
    res = run_kg_pipeline_cfg(rd.from_arrow(test.pages).repartition(4),
                              model, cfg, dicts=test.dicts,
                              clusters=test.clusters)
    tri = dataset_to_table(res["triples"])
    s = score_triples(tri, test.gold)
    assert s.precision >= 0.95 and s.recall >= 0.95
    edges = res["edges"].to_pandas()
    assert len(edges) > 0


def test_salted_canonicalization_matches_unsalted(ray_session, trained):
    import ray.data as rd

    from stanford_re_ray.pipelines.kg import (consistency_stage, bag_stage,
                                              dataset_to_table, extract_stage,
                                              nlp_stage, nodes_stage,
                                              pairs_stage, score_stage)

    model, test = trained
    scored = score_stage(
        pairs_stage(
            nlp_stage(extract_stage(rd.from_arrow(test.pages).repartition(4)),
                      test.dicts),
            test.clusters),
        model)
    triples = consistency_stage(bag_stage(scored)).materialize()
    plain = dataset_to_table(nodes_stage(triples, n_salt=1)).to_pandas()
    salted = dataset_to_table(nodes_stage(triples, n_salt=4)).to_pandas()
    # identical surfaces always colocate → same entity ids either way for
    # exact-name entities (the fixture world has no cross-page variants
    # beyond coref, which is resolved pre-canonicalization)
    assert set(plain["entity_id"]) == set(salted["entity_id"])


def test_atleast_once_em_denoises_bags():
    from stanford_re_ray.relations import RELATION_NAMES
    from stanford_re_ray.stages.classify import train_atleast_once, train_lr

    # bags of 2 mentions: one true trigger (feat 10), one bag-noise mention
    # (feat 20) that ALSO appears in pure-negative bags.  Naive DS labels
    # both; at-least-once should concentrate the label on the trigger.
    feats, labels, bag_ids = [], [], []
    for k in range(12):
        feats += [np.array([10]), np.array([20])]
        labels += [{"per:spouse"}, {"per:spouse"}]
        bag_ids += [f"pos{k}", f"pos{k}"]
        feats.append(np.array([20]))
        labels.append(set())
        bag_ids.append(f"neg{k}")
    naive = train_lr(feats, labels, epochs=80, feature_count_threshold=1)
    alo = train_atleast_once(feats, labels, bag_ids, em_iters=2,
                             epochs=80, feature_count_threshold=1)
    r = RELATION_NAMES.index("per:spouse")
    # EM strictly reduces the noise feature's weight relative to naive DS
    assert alo.weights[r, 20] < naive.weights[r, 20]
    assert alo.weights[r, 10] > 0
