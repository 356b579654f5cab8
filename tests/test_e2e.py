"""End-to-end conformance: fixture corpus → Ray train pipeline → Ray KG
pipeline → P/R ≥ 0.95 gate (BASELINE.json correctness gate; mirrors the
reference's golden-scoring harness, SURVEY.md §5)."""

import pytest

from stanford_re_ray.evaluate import score_triples
from stanford_re_ray.fixtures import gen_corpus


@pytest.fixture(scope="module")
def corpora(ray_session):
    train = gen_corpus(400, per_lo=0, per_hi=200, org_lo=0, org_hi=100)
    test = gen_corpus(200, per_lo=200, per_hi=400, org_lo=100, org_hi=200,
                      base_url="https://t.example")
    return train, test


@pytest.fixture(scope="module")
def model(ray_session, corpora):
    import ray.data as rd

    from stanford_re_ray.pipelines.train import train_model

    train, _ = corpora
    pages = rd.from_arrow(train.pages)
    return train_model(pages, train.kb, dicts=train.dicts,
                       clusters=train.clusters, negative_subsample=1.0,
                       epochs=150)


@pytest.fixture(scope="module")
def kg_result(ray_session, corpora, model):
    import ray.data as rd

    from stanford_re_ray.pipelines.kg import dataset_to_table, run_kg_pipeline

    _, test = corpora
    pages = rd.from_arrow(test.pages)
    res = run_kg_pipeline(pages, model, dicts=test.dicts,
                          clusters=test.clusters)
    return {
        "triples": dataset_to_table(res["triples"]),
        "nodes": dataset_to_table(res["nodes"]),
        "edges": dataset_to_table(res["edges"]),
    }


def test_pr_gate(kg_result, corpora):
    _, test = corpora
    s = score_triples(kg_result["triples"], test.gold)
    print(f"\nP={s.precision:.4f} R={s.recall:.4f} F1={s.f1:.4f} "
          f"guess={s.n_guess} gold={s.n_gold}")
    if s.precision < 0.95 or s.recall < 0.95:
        print("FP:", s.false_positives[:20])
        print("FN:", s.false_negatives[:20])
    assert s.precision >= 0.95
    assert s.recall >= 0.95


def test_triples_schema_and_provenance(kg_result):
    t = kg_result["triples"]
    cols = set(t.column_names)
    assert {"subj", "subj_type", "pred", "obj", "obj_type", "score",
            "doc_id", "sent_idx"} <= cols
    assert t.num_rows > 0
    # every triple carries provenance (threaded through, never recovered
    # post-hoc — SURVEY.md §7.5)
    assert all(d for d in t.column("doc_id").to_pylist())


def test_graph_outputs(kg_result):
    nodes, edges = kg_result["nodes"], kg_result["edges"]
    assert nodes.num_rows > 0 and edges.num_rows > 0
    ids = set(nodes.column("entity_id").to_pylist())
    assert len(ids) == nodes.num_rows  # unique node ids
    # every edge endpoint resolves to some id (subjects always; object
    # literals get synthesized ids)
    assert all(s for s in edges.column("src_id").to_pylist())
    scores = edges.column("score").to_pylist()
    assert all(0.0 < s <= 1.0 for s in scores)


def test_coref_variants_extracted(kg_result, corpora):
    """Pronoun/surname subject variants must still yield full-name subjects
    (the coref surrogate feeds canonical names into pairs)."""
    t = kg_result["triples"]
    subjects = set(t.column("subj").to_pylist())
    # no bare pronouns or single surnames as subjects
    assert not any(s in ("He", "She", "It") for s in subjects)


def test_fused_chain_task_granularity(ray_session, corpora, model):
    """Regression gate for the round-4 2x-headline bug class:
    ``map_batches(batch_size=N)`` doubles as Ray Data's
    min_rows_per_bundled_input and a FUSED chain takes the max across
    its stages, so one oversized stage silently serializes the whole
    S1-S5 chain (observed: 4,000 pages -> 4 tasks on 32 CPUs).  Pin:
    with 400 pages in 8 blocks and MAP_BATCH_SIZE=64, healthy bundling
    gives ceil(400 / (64 bundled + 50-row block)) ~ 4 fused tasks; the
    bug regime (one stage at batch_size=1024) collapses to 1.  Pin >= 3
    — well above the failure mode, below healthy-bundling variance."""
    import re

    import ray.data as rd

    from stanford_re_ray.pipelines.kg import dataset_to_table, run_kg_pipeline

    train, test = corpora
    pages = rd.from_arrow(train.pages).repartition(8)
    res = run_kg_pipeline(pages, model, dicts=train.dicts,
                          clusters=train.clusters)
    dataset_to_table(res["triples"])          # consume
    stats = res["triples"].stats()
    fused = re.findall(
        r"Operator \d+ ([^\n:]*MapBatches[^\n:]*): (\d+) tasks executed",
        stats)
    assert fused, f"no MapBatches operators in stats:\n{stats[:2000]}"
    offenders = [(name, n) for name, n in fused
                 if "extract" in name.lower() or "scorer" in name.lower()
                 or "featurizer" in name.lower()]
    checked = offenders or fused
    bad = [(name, int(n)) for name, n in checked if int(n) < 3]
    assert not bad, f"fused chain under-parallelized: {bad}"
