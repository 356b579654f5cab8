"""Data-mixing operators (functions/mixing.py): decontamination,
stratified sampling, sequence packing — partition invariance and
hand-checkable semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from stanford_re_ray.functions.hashing import stable_u64
from stanford_re_ray.functions.mixing import (
    decontaminate,
    ngrams_arrow,
    sequence_packing,
    stratified_sample,
)

# doc 0 is the "eval split" (0 % 3 == 0 with eval_mod=3); docs 1 and 2
# each share a distinct 3-gram run with it; doc 4 shares nothing
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "she saw the quick brown fox near the river bank"),
    (2, "he said the lazy dog tonight was very sleepy indeed"),
    (4, "completely different words appear in this document body"),
    (5, "the quick brown fox appeared again and again here"),
]


def _ds(blocks: int, rows=DOCS) -> rd.Dataset:
    tbl = pa.table({"doc_id": pa.array([d for d, _ in rows], pa.int64()),
                    "text": pa.array([t for _, t in rows], pa.string())})
    return rd.from_arrow(tbl).repartition(blocks)


def test_ngrams_arrow_respects_row_boundaries():
    from stanford_re_ray.functions.corpus import _tokenize_column

    texts = pa.array(["a b c", "d e", "", "f g h i"])
    parent, flat = _tokenize_column(texts)
    gp, ng = ngrams_arrow(parent, flat, 3)
    assert ng.to_pylist() == ["a b c", "f g h", "g h i"]
    assert gp.to_pylist() == [0, 3, 3]
    # n longer than every row → empty, not an error
    gp2, ng2 = ngrams_arrow(parent, flat, 5)
    assert len(ng2) == 0 and len(gp2) == 0


@pytest.mark.parametrize("blocks", [1, 4])
def test_decontaminate_hits(ray_session, blocks):
    out = decontaminate(_ds(blocks), n=3, eval_mod=3).to_pandas()
    hits = dict(zip(out["doc_id"], out["n_hits"]))
    # doc 1: "the quick brown" + "quick brown fox"; doc 2: "the lazy dog"
    # + "lazy dog tonight"; doc 5: the same two as doc 1 (distinct count);
    # doc 4: clean → absent
    assert hits == {1: 2, 2: 2, 5: 2}
    assert list(out["doc_id"]) == sorted(out["doc_id"])


def test_decontaminate_partition_invariant(ray_session):
    a = decontaminate(_ds(1), n=3, eval_mod=3).to_pandas()
    b = decontaminate(_ds(4), n=3, eval_mod=3).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


@pytest.mark.parametrize("blocks", [1, 4])
def test_stratified_sample_semantics(ray_session, blocks):
    rows = [(i, "s" + str(i % 3)) for i in range(300)]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in rows], pa.int64()),
                    "lang": pa.array([s for _, s in rows], pa.string())})
    # skew: drop most of stratum s2 so rates differ per stratum
    tbl = tbl.filter(pa.array([not (s == "s2" and d > 30)
                               for d, s in rows]))
    ds = rd.from_arrow(tbl).repartition(blocks)
    out = stratified_sample(ds, stratum_col="lang").to_pandas()
    counts = pd.Series([s for _, s in rows])[
        [not (s == "s2" and d > 30) for d, s in rows]].value_counts()
    mc = counts.min()
    thr = {s: (1_000_000 * mc) // c for s, c in counts.items()}
    # membership is exactly the content-hash rule, per stratum
    for _, r in out.iterrows():
        assert stable_u64(str(r["doc_id"])) % 1_000_000 < thr[r["lang"]]
    # every qualifying row is kept (no over/under sampling)
    expected = sum(
        stable_u64(str(d)) % 1_000_000 < thr[s]
        for d, s in rows if not (s == "s2" and d > 30))
    assert len(out) == expected


def test_stratified_sample_partition_invariant(ray_session):
    rows = [(i, "s" + str(i % 2)) for i in range(100)]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in rows], pa.int64()),
                    "lang": pa.array([s for _, s in rows], pa.string())})
    a = (stratified_sample(rd.from_arrow(tbl).repartition(1))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (stratified_sample(rd.from_arrow(tbl).repartition(5))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("blocks,n_buckets", [(1, 16), (4, 3), (4, 16)])
def test_sequence_packing_matches_serial_scan(ray_session, blocks,
                                              n_buckets):
    rows = [(i, " ".join(["w"] * ((i * 37) % 23 + 1))) for i in range(60)]
    out = sequence_packing(_ds(blocks, rows), seq_len=50, n_rows=60,
                           n_buckets=n_buckets).to_pandas()
    # serial reference scan
    ntok = np.array([(i * 37) % 23 + 1 for i in range(60)])
    cum_before = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    ref = (pd.DataFrame({"pack_id": cum_before // 50, "n_tok": ntok})
           .groupby("pack_id").agg(n_docs=("n_tok", "size"),
                                   n_tokens=("n_tok", "sum"))
           .reset_index())
    pd.testing.assert_frame_equal(
        out.astype("int64"), ref.astype("int64"))
    assert out["n_tokens"].sum() == ntok.sum()
    assert out["n_docs"].sum() == 60


@pytest.mark.parametrize("blocks", [1, 4])
def test_mixture_upsample_semantics(ray_session, blocks):
    from stanford_re_ray.functions.mixing import mixture_upsample

    rows = [(i, "big" if i < 60 else "small") for i in range(75)]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in rows], pa.int64()),
                    "lang": pa.array([s for _, s in rows], pa.string())})
    ds = rd.from_arrow(tbl).repartition(blocks)
    out = (mixture_upsample(ds).to_pandas()
           .sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    # big stratum (the max): exactly once each, epoch 0
    big = out[out.lang == "big"]
    assert len(big) == 60 and (big["epoch"] == 0).all()
    # small stratum: 60/15 = 4.0 → exactly 4 copies each, epochs 0..3
    small = out[out.lang == "small"]
    assert len(small) == 60
    per_doc = small.groupby("doc_id")["epoch"].agg(["size", "max"])
    assert (per_doc["size"] == 4).all() and (per_doc["max"] == 3).all()
    # partition invariance
    ref = (mixture_upsample(rd.from_arrow(tbl)).to_pandas()
           .sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref)


def test_curate_corpus_partition_invariant(ray_session):
    from stanford_re_ray.functions.mixing import curate_corpus

    # long DISTINCT docs (pass quality), one exact dup pair, doc 0 is
    # eval; docs 1 and 2 alone share a 4-gram run with doc 0
    def body(d):
        return " ".join(f"w{d}x{i % 29} t{d}y{i % 13}" for i in range(30))

    overlap = "shared quiz phrase run"
    rows = [(0, "l0", body(0) + " " + overlap)]
    for d in range(1, 12):
        extra = (" " + overlap) if d in (1, 2) else ""
        rows.append((d, "l" + str(d % 2), body(d) + extra))
    rows.append((12, "l0", rows[3][2]))          # exact dup of doc 3
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "lang": pa.array([r[1] for r in rows], pa.string()),
                    "text": pa.array([r[2] for r in rows], pa.string())})
    outs = []
    for blocks in (1, 4):
        ds = rd.from_arrow(tbl).repartition(blocks)
        outs.append(curate_corpus(ds, n=4, eval_mod=97)
                    .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    ids = set(outs[0]["doc_id"])
    assert 12 not in ids          # dup loses to min-id representative
    assert ids <= set(range(12))
