"""Checkpoint/resume: per-partition manifests, lineage invalidation,
poison-shard isolation."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from stanford_re_ray.fixtures import gen_corpus

OUT = "/tmp/kgtest_ckpt/out"
SHARDS = "/tmp/kgtest_ckpt/shards"


@pytest.fixture(scope="module")
def model(ray_session):
    import ray.data as rd

    from stanford_re_ray.pipelines.train import train_model

    train = gen_corpus(200, per_lo=0, per_hi=200, org_lo=0, org_hi=100)
    return train_model(rd.from_arrow(train.pages).repartition(4), train.kb,
                       dicts=train.dicts, clusters=train.clusters,
                       negative_subsample=1.0, epochs=80), train.dicts, train.clusters


@pytest.fixture(scope="module")
def shards():
    shutil.rmtree("/tmp/kgtest_ckpt", ignore_errors=True)
    os.makedirs(SHARDS, exist_ok=True)
    test = gen_corpus(120, per_lo=200, per_hi=400, org_lo=100, org_hi=200,
                      base_url="https://t.example")
    tbl = test.pages
    paths = []
    for i in range(3):
        part = tbl.slice(i * 40, 40)
        p = f"{SHARDS}/shard-{i:02d}.parquet"
        pq.write_table(part, p)
        paths.append(p)
    return paths


def test_run_then_resume_skips_completed(ray_session, model, shards):
    from stanford_re_ray.state.checkpoint import run_kg_checkpointed

    m, dicts, clusters = model
    r1 = run_kg_checkpointed(shards, m, OUT, dicts=dicts, clusters=clusters)
    assert sorted(r1["processed"]) == ["shard-00", "shard-01", "shard-02"]
    assert r1["failed"] == []
    # outputs are partitioned parquet with rows
    for t in ("triples", "nodes", "edges"):
        parts = sorted(os.listdir(os.path.join(OUT, t)))
        assert parts == ["part=shard-00", "part=shard-01", "part=shard-02"]
    # resume: nothing reprocessed
    r2 = run_kg_checkpointed(shards, m, OUT, dicts=dicts, clusters=clusters)
    assert r2["processed"] == []
    assert sorted(r2["completed_previously"]) == [
        "shard-00", "shard-01", "shard-02"
    ]


def test_lineage_invalidation_reprocesses_one_shard(ray_session, model, shards):
    from stanford_re_ray.state.checkpoint import run_kg_checkpointed

    m, dicts, clusters = model
    # touch one shard: its fingerprint (mtime) changes
    os.utime(shards[1])
    r = run_kg_checkpointed(shards, m, OUT, dicts=dicts, clusters=clusters)
    assert r["processed"] == ["shard-01"]
    assert sorted(r["completed_previously"]) == ["shard-00", "shard-02"]


def test_counters_and_manifest_contents(ray_session, model, shards):
    from stanford_re_ray.state.checkpoint import CheckpointManager

    mgr = CheckpointManager(OUT)
    ms = mgr.manifests()
    assert len(ms) == 3
    for man in ms:
        assert man["status"] == "complete"
        assert man["counters"]["pages"] == 40
        assert man["counters"]["triples"] > 0
        assert "extractor" in man["versions"]
    ctr = mgr.counters_table()
    assert ctr.num_rows == 3


def test_poison_shard_isolated(ray_session, model, shards):
    from stanford_re_ray.state.checkpoint import run_kg_checkpointed

    m, dicts, clusters = model
    bad = f"{SHARDS}/shard-99.parquet"
    with open(bad, "wb") as f:
        f.write(b"this is not parquet")
    r = run_kg_checkpointed(shards + [bad], m, OUT, dicts=dicts,
                            clusters=clusters)
    assert r["failed"] == ["shard-99"]
    assert sorted(r["completed_previously"]) == [
        "shard-00", "shard-01", "shard-02"
    ]
    man = json.load(open(os.path.join(OUT, "_manifest", "part-shard-99.json")))
    assert man["status"].startswith("failed")


def test_cli_train_then_kg_resume(ray_session, tmp_path, capsys):
    """The ray-job-submit surface: `train` fits and saves weights from
    Parquet pages + a KB TSV; `kg` runs the checkpointed per-shard
    pipeline; a second `kg` invocation skips every completed shard."""
    import json

    import pyarrow.parquet as pq

    from stanford_re_ray.cli import main
    from stanford_re_ray.fixtures import gen_corpus

    train = gen_corpus(120, per_lo=0, per_hi=80, org_lo=0, org_hi=40)
    test = gen_corpus(60, per_lo=200, per_hi=260, org_lo=100, org_hi=130,
                      base_url="https://t.example")
    pq.write_table(train.pages, str(tmp_path / "train_pages.parquet"))
    n = test.pages.num_rows
    pq.write_table(test.pages.slice(0, n // 2),
                   str(tmp_path / "shard_a.parquet"))
    pq.write_table(test.pages.slice(n // 2),
                   str(tmp_path / "shard_b.parquet"))
    kb_lines = [
        f"{i}\t{name}\t{rel}\t{val}"
        for i, (name, rel, val) in enumerate(zip(
            train.kb.column("entity_name").to_pylist(),
            train.kb.column("rel").to_pylist(),
            train.kb.column("slot_value").to_pylist()))
    ]
    (tmp_path / "kb.tsv").write_text("\n".join(kb_lines) + "\n")

    rc = main(["train", "--pages", str(tmp_path / "train_pages.parquet"),
               "--kb", str(tmp_path / "kb.tsv"),
               "--out", str(tmp_path / "model.parquet"),
               "--epochs", "60", "--negative-subsample", "1.0"])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["nonzero_weights"] > 0

    rc = main(["kg", "--pages", str(tmp_path / "shard_*.parquet"),
               "--model", str(tmp_path / "model.parquet"),
               "--out", str(tmp_path / "kg_out")])
    assert rc == 0
    run1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert run1["processed"] == 2 and run1["skipped"] == 0
    assert (tmp_path / "kg_out" / "triples" / "part=shard_a").is_dir()
    assert (tmp_path / "kg_out" / "edges" / "part=shard_b").is_dir()

    # resubmit: both shards skip via manifests
    rc = main(["kg", "--pages", str(tmp_path / "shard_*.parquet"),
               "--model", str(tmp_path / "model.parquet"),
               "--out", str(tmp_path / "kg_out")])
    assert rc == 0
    run2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert run2["skipped"] == 2 and run2["processed"] == 0


def test_cli_curate(ray_session, tmp_path, capsys):
    """`curate` runs the composed quality/dedup/decontaminate/balance
    chain over a documents shard and writes surviving rows (with PII
    scrubbed) as Parquet."""
    import glob
    import json

    import pyarrow.parquet as pq

    from stanford_re_ray.cli import main

    src = "/root/testdata/sf0.001/documents.parquet"
    rc = main(["curate", "--docs", src,
               "--out", str(tmp_path / "curated"), "--pii"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < stats["docs_out"] < stats["docs_in"]
    files = glob.glob(str(tmp_path / "curated" / "*.parquet"))
    assert files
    t = pq.read_table(files[0])
    assert {"doc_id", "text", "lang"} <= set(t.column_names)


def test_cli_dedup_ingest(ray_session, tmp_path, capsys):
    """`dedup-ingest` keeps new docs whose fingerprint is absent from
    the reference and writes full surviving rows."""
    import glob
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from stanford_re_ray.cli import main

    ref_texts = [f"stored doc {i} body {i*3}" for i in range(40)]
    new_texts = ref_texts[:10] + [f"novel doc {i}" for i in range(15)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(ref_texts)}), tmp_path / "ref.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(100, 125), pa.int64()),
        "text": pa.array(new_texts),
        "lang": pa.array(["en"] * 25)}), tmp_path / "new.parquet")

    rc = main(["dedup-ingest", "--new", str(tmp_path / "new.parquet"),
               "--ref", str(tmp_path / "ref.parquet"),
               "--out", str(tmp_path / "kept")])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"out": str(tmp_path / "kept"),
                     "docs_in": 25, "docs_out": 15}
    files = glob.glob(str(tmp_path / "kept" / "*.parquet"))
    t = pq.read_table(files)
    assert sorted(t.column("doc_id").to_pylist()) == list(range(110, 125))
    assert {"doc_id", "text", "lang"} <= set(t.column_names)


def test_cli_profile(ray_session, tmp_path, capsys):
    """`profile` prints one JSON line per scalar column (exact distinct,
    null counts, min/max) plus hot-key lines for the named columns."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from stanford_re_ray.cli import main

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "grp": pa.array(["a", "a", "a", "b", "c", None], pa.string()),
        "score": pa.array([0.5, 0.5, 1.5, None, 2.5, 2.5], pa.float64()),
        "payload": pa.array([[1], [2], [3], [4], [5], [6]],
                            pa.list_(pa.int64())),   # skipped: nested
    })
    pq.write_table(tbl, str(tmp_path / "t.parquet"))
    rc = main(["profile", "--table", str(tmp_path / "t.parquet"),
               "--hot-keys", "grp", "-k", "2"])
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    cols = {r["col_name"]: r for r in lines if r["kind"] == "column"}
    assert set(cols) == {"id", "grp", "score"}      # payload skipped
    assert cols["id"]["n_rows"] == 6
    assert cols["id"]["n_distinct"] == 6
    assert cols["grp"]["n_null"] == 1
    assert cols["grp"]["n_distinct"] == 3
    assert cols["grp"]["min_str"] == "a"
    assert cols["grp"]["max_str"] == "c"
    assert cols["score"]["n_null"] == 1
    assert cols["score"]["n_distinct"] == 3
    assert cols["score"]["min_num"] == 0.5
    assert cols["score"]["max_num"] == 2.5
    hot = [r for r in lines if r["kind"] == "hot_key"]
    assert [(r["col_name"], r["rnk"], r["key_str"], r["cnt"])
            for r in hot] == [("grp", 1, "a", 3), ("grp", 2, "b", 1)]
    assert hot[0]["share_ppm"] == 3 * 1_000_000 // 6
