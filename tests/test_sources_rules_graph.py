"""Sources (readers/writers), rule extractor, graph operators."""

import os

import pyarrow as pa
import pytest

from stanford_re_ray.fixtures import corpus_dictionaries


def test_kb_tsv_roundtrip(tmp_path):
    from stanford_re_ray.sources.readers import read_kb_tsv

    p = tmp_path / "kb.tsv"
    p.write_text(
        "E1\tJohn Smith\tper:spouse\tMary Smith\n"
        "E2\tAcme Corp\torg:founded\t1950\n"
        "E3\tBad Row\tnot:a_relation\tx\n"
        "short\tline\n"
    )
    t = read_kb_tsv(str(p))
    assert t.num_rows == 2
    assert t.column("rel").to_pylist() == ["per:spouse", "org:founded"]
    t2 = read_kb_tsv(str(p), max_rows=1)
    assert t2.num_rows == 1


def test_query_xml(tmp_path):
    from stanford_re_ray.sources.readers import read_query_xml

    p = tmp_path / "q.xml"
    p.write_text(
        """<?xml version="1.0"?>
        <kbpslotfill>
          <query id="SF_T001">
            <name>John Smith</name><docid>doc1</docid>
            <enttype>PER</enttype><nodeid>E0001</nodeid>
            <ignore>per:age per:religion</ignore>
          </query>
          <query id="SF_T002">
            <name>Acme Corp</name><docid>doc2</docid>
            <enttype>ORG</enttype>
          </query>
        </kbpslotfill>"""
    )
    t = read_query_xml(str(p))
    assert t.num_rows == 2
    assert t.column("query_id").to_pylist() == ["SF_T001", "SF_T002"]
    assert t.column("ignored_slots").to_pylist()[0] == ["per:age",
                                                        "per:religion"]


def test_official_output_writer(tmp_path):
    from stanford_re_ray.sources.writers import write_official_output

    triples = pa.table({
        "subj": ["John Smith"], "subj_type": ["PERSON"],
        "pred": ["per:member_of"], "obj": ["Acme Corp"],
        "obj_type": ["ORGANIZATION"], "score": [0.9],
        "doc_id": ["d1"], "sent_idx": pa.array([0], pa.int32()),
        "subj_begin": pa.array([0], pa.int32()),
        "subj_end": pa.array([2], pa.int32()),
        "obj_begin": pa.array([5], pa.int32()),
        "obj_end": pa.array([7], pa.int32()),
    })
    out = tmp_path / "official.tsv"
    n = write_official_output(str(out), triples,
                              {("John Smith", "PERSON"): "SF_T001"})
    lines = out.read_text().strip().split("\n")
    assert n == len(lines)
    # 2013 merged surface name for per:member_of
    fill = [l for l in lines if "\tNIL" not in l]
    assert len(fill) == 1
    assert fill[0].startswith("SF_T001\tper:employee_or_member_of\tray_kg_1\td1")
    # NIL rows for the other PER relations
    assert any(l.endswith("NIL") for l in lines)


def test_rule_extractor(ray_session):
    import ray.data as rd

    from stanford_re_ray.pipelines.kg import extract_stage, nlp_stage
    from stanford_re_ray.stages.rules import RuleExtractor

    html = (b"<html><body><p>John Smith is married to Mary Johnson."
            b"</p></body></html>")
    pages = rd.from_arrow(pa.table({
        "url": ["u1"], "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": [html], "text": [""], "lang": ["en"],
    }))
    sents = nlp_stage(extract_stage(pages), corpus_dictionaries())
    out = sents.map_batches(RuleExtractor(), batch_format="pyarrow").to_pandas()
    assert len(out) == 1
    assert out["rel"].iloc[0] == "per:spouse"
    assert out["subj"].iloc[0] == "John Smith"
    assert out["obj"].iloc[0] == "Mary Johnson"
    from stanford_re_ray.stages.classify import SCORE_SCALE

    assert out["sum_q"].iloc[0] == SCORE_SCALE


def _edges_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src_id": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "dst_id": [r[2] for r in rows],
        "score": pa.array([r[3] for r in rows], pa.float64()),
        "n_support": pa.array([1] * len(rows), pa.int64()),
        "doc_id": ["d"] * len(rows),
        "sent_idx": pa.array([0] * len(rows), pa.int32()),
    }))


def test_symmetrize_and_inverses(ray_session):
    from stanford_re_ray.pipelines.graph_ops import add_inverses, symmetrize

    edges = _edges_ds([("a", "per:spouse", "b", 0.9),
                       ("c", "per:parents", "d", 0.8)])
    sym = symmetrize(edges).to_pandas()
    spouse = sym[sym["pred"] == "per:spouse"]
    assert {(r.src_id, r.dst_id) for r in spouse.itertuples()} == {
        ("a", "b"), ("b", "a")
    }
    inv = add_inverses(edges).to_pandas()
    assert ("d", "per:children", "c") in {
        (r.src_id, r.pred, r.dst_id) for r in inv.itertuples()
    }


def test_horn_rules(ray_session):
    from stanford_re_ray.pipelines.graph_ops import apply_horn_rules

    # x member_of y ∧ y member_of z ⇒ x member_of z (toy transitivity)
    edges = _edges_ds([("a", "org:member_of", "b", 0.9),
                       ("b", "org:member_of", "c", 0.9)])
    out = apply_horn_rules(
        edges, [(0.8, "org:member_of", "org:member_of", "org:member_of")],
        max_depth=1,
    ).to_pandas()
    derived = out[(out["src_id"] == "a") & (out["dst_id"] == "c")]
    assert len(derived) == 1
    assert abs(derived["score"].iloc[0] - 0.8 * 0.9 * 0.9) < 1e-9


def test_subgraph_bfs(ray_session):
    from stanford_re_ray.pipelines.graph_ops import subgraph_bfs

    edges = _edges_ds([("a", "p", "b", 0.9), ("b", "p", "c", 0.9),
                       ("c", "p", "d", 0.9), ("x", "p", "y", 0.9)])
    out = subgraph_bfs(edges, {"a"}, depth=2).to_pandas()
    got = {(r.src_id, r.dst_id) for r in out.itertuples()}
    assert got == {("a", "b"), ("b", "c")}  # depth 2, no x→y island


def test_subgraph_bfs_budget_lexicographic(ray_session):
    """entity_budget caps each layer's frontier to the lexicographically
    smallest ids — now selected distributed (per-batch partials + global
    sort/limit), never by collecting the raw frontier to the driver."""
    from stanford_re_ray.pipelines.graph_ops import subgraph_bfs

    fan = [("s", "p", f"n{i:02d}", 0.9) for i in range(10)]
    second = [(f"n{i:02d}", "p", f"m{i:02d}", 0.9) for i in range(10)]
    edges = _edges_ds(fan + second)
    out = subgraph_bfs(edges, {"s"}, depth=2, entity_budget=3).to_pandas()
    got = {(r.src_id, r.dst_id) for r in out.itertuples()}
    # layer 1 keeps all fan edges; layer 2 only expands the 3 smallest ids
    assert {(a, b) for a, _, b, _ in fan} <= got
    assert ("n00", "m00") in got and ("n02", "m02") in got
    assert not any(a == f"n{i:02d}" for a, _ in got for i in range(3, 10))


# --- RelationFilter components (RelationFilter.java:297-480) ----------------

def _scored_table():
    """One doc, two subjects, shared slot values, assorted scores."""
    rows = [
        # subj        obj       rel                  best_q
        ("Ann Lee",   "Acme",   "per:employee_of",   90),
        ("Ann Lee",   "Acme",   "per:employee_of",   70),   # weaker chain dup
        ("Ann Lee",   "Acme",   "per:member_of",     80),
        ("Bob Ray",   "Acme",   "per:employee_of",   95),
        ("Bob Ray",   "Paris",  "per:cities_of_residence", 60),
    ]
    import pyarrow as pa

    n = len(rows)
    return pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "subj_type": pa.array(["PERSON"] * n),
        "obj": pa.array([r[1] for r in rows]),
        "obj_type": pa.array(["ORGANIZATION"] * 4 + ["CITY"]),
        "doc_id": pa.array(["d1"] * n),
        "sent_idx": pa.array(list(range(n)), pa.int32()),
        "subj_begin": pa.array([0] * n, pa.int32()),
        "subj_end": pa.array([2] * n, pa.int32()),
        "obj_begin": pa.array([5] * n, pa.int32()),
        "obj_end": pa.array([6] * n, pa.int32()),
        "rel": pa.array([r[2] for r in rows]),
        "sum_q": pa.array([r[3] for r in rows], pa.int64()),
        "best_q": pa.array([r[3] for r in rows], pa.int64()),
    })


def _keyset(df):
    return {(s, o, r, q) for s, o, r, q in
            zip(df["subj"], df["obj"], df["rel"], df["best_q"])}


def test_coref_filter_component():
    from stanford_re_ray.stages.rules import coref_filter_component

    df = _scored_table().to_pandas()
    out = coref_filter_component(df)
    # per (subj, obj) only the max survives; other subjects untouched
    assert _keyset(out) == {
        ("Ann Lee", "Acme", "per:employee_of", 90),
        ("Bob Ray", "Acme", "per:employee_of", 95),
        ("Bob Ray", "Paris", "per:cities_of_residence", 60),
    }


def test_per_reltype_competition_component():
    from stanford_re_ray.stages.rules import per_reltype_competition_component

    df = _scored_table().to_pandas()
    out = per_reltype_competition_component(df)
    # per (obj, rel) across subjects: Bob's 95 beats Ann's employee_of rows;
    # Ann's member_of survives as its own rel type
    assert _keyset(out) == {
        ("Bob Ray", "Acme", "per:employee_of", 95),
        ("Ann Lee", "Acme", "per:member_of", 80),
        ("Bob Ray", "Paris", "per:cities_of_residence", 60),
    }


def test_cross_reltype_competition_component():
    from stanford_re_ray.stages.rules import cross_reltype_competition_component

    df = _scored_table().to_pandas()
    out = cross_reltype_competition_component(df)
    # per obj regardless of rel or subject: only the single best for Acme
    assert _keyset(out) == {
        ("Bob Ray", "Acme", "per:employee_of", 95),
        ("Bob Ray", "Paris", "per:cities_of_residence", 60),
    }


def test_relation_filter_stage_chain(ray_session):
    """Distributed stage: per-doc scope, chained components, selectable via
    PipelineConfig; ties at the max all survive."""
    import ray.data as rd

    from stanford_re_ray.stages.rules import relation_filter_stage

    scored = rd.from_arrow(_scored_table())
    # coref drops Ann's weaker rows per (subj, obj) — incl. member_of 80 <
    # employee_of 90; per_reltype then lets Bob's 95 beat Ann's 90
    out = relation_filter_stage(
        scored, ("coref", "per_reltype")).to_pandas()
    assert _keyset(out) == {
        ("Bob Ray", "Acme", "per:employee_of", 95),
        ("Bob Ray", "Paris", "per:cities_of_residence", 60),
    }
    # per_reltype alone preserves Ann's member_of as its own rel type
    out2 = relation_filter_stage(scored, ("per_reltype",)).to_pandas()
    assert _keyset(out2) == {
        ("Bob Ray", "Acme", "per:employee_of", 95),
        ("Ann Lee", "Acme", "per:member_of", 80),
        ("Bob Ray", "Paris", "per:cities_of_residence", 60),
    }


def test_relation_filter_config_knob(ray_session):
    import ray.data as rd

    from stanford_re_ray.config import PipelineConfig

    cfg = PipelineConfig()
    assert cfg.relation_filter_components == ()   # off by default
