"""S8: entity linking / canonicalization + noisy-OR edge merge."""

import pandas as pd

from stanford_re_ray.stages.canonicalize import (
    block_key,
    link_cluster,
    noisy_or_merge,
    same_entity,
)


def test_same_entity_semantics():
    assert same_entity("John Smith", "Smith", "PERSON")        # token overlap 1.0
    assert same_entity("John Smith", "john smith", "PERSON")
    assert same_entity("John Smith", "J. Smith", "PERSON")     # initial match
    assert not same_entity("John Smith", "Mary Jones", "PERSON")
    # tightened global rule: different first names never merge
    assert not same_entity("John Lee", "Karen Lee", "PERSON")
    assert same_entity("ACM", "Association for Computing Machinery",
                       "ORGANIZATION")  # acronym
    # ORG threshold is stricter than PER
    assert not same_entity("Acme Bank", "Zenith Bank", "ORGANIZATION")


def test_block_key():
    assert block_key("John Smith", "PERSON") == "p:smith"
    assert block_key("Acme Corporation", "ORGANIZATION") == "o:corporation"


def test_link_cluster_merges_variants():
    df = pd.DataFrame([
        {"name": "John Smith", "type": "PERSON", "n_mentions": 10},
        {"name": "Smith", "type": "PERSON", "n_mentions": 2},
        {"name": "Mary Smith", "type": "PERSON", "n_mentions": 5},
        {"name": "J. Smith", "type": "PERSON", "n_mentions": 1},
    ])
    out = link_cluster(df)
    # bare "Smith" + initialed "J. Smith" merge into the dominant
    # "John Smith"; "Mary Smith" (different first name) stays separate
    assert len(out) == 2
    rep = out[out["name"] == "John Smith"]
    assert len(rep) == 1
    members = rep["members"].iloc[0]
    assert "Smith" in members and "J. Smith" in members
    assert "Mary Smith" not in members


def test_noisy_or_merge():
    df = pd.DataFrame([
        {"src_id": "a", "pred": "p", "dst_id": "b", "score": 0.5,
         "doc_id": "d1", "sent_idx": 0},
        {"src_id": "a", "pred": "p", "dst_id": "b", "score": 0.8,
         "doc_id": "d2", "sent_idx": 1},
    ])
    out = noisy_or_merge(df)
    assert len(out) == 1
    assert abs(out["score"].iloc[0] - (1 - 0.5 * 0.2)) < 1e-9
    assert out["doc_id"].iloc[0] == "d2"       # argmax provenance
    assert out["n_support"].iloc[0] == 2
