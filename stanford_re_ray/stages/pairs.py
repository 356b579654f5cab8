"""S4 — relation-mention candidate pair generation + featurization.

Sentence-local, stateless ``map_batches`` over SENTENCES → PAIRS.  Fuses
S3 mention detection (same pure functions as ``mentions.py``) so no join is
needed between mentions and sentence annotations — both are functions of the
same row (SURVEY.md §7.1: S3/S4 are narrow, sentence-local stages).

Semantics rebuilt from kbp/sf/process/RelationMentionAnnotator.java:95-345:

- pair every entity mention (PERSON/ORGANIZATION, the discovered subject)
  with every other mention in the sentence;
- spans must not overlap; subject ≠ object after canonicalization;
- token distance between the spans ≤ 25 (``closeEnough``);
- sentences longer than 150 tokens are skipped entirely
  (kbp/sf/process/PreFeaturizerAnnotator.java:99);
- one pair per extracted (subj, obj) per sentence, first span order wins
  (dedupe at RelationMentionAnnotator.java:109,176-184,277-289).
"""

from __future__ import annotations

import pyarrow as pa

from .classify import hash_features
from .features import featurize, featurize_ids
from .mentions import find_mentions

MAX_PAIR_DISTANCE = 25     # RelationMentionAnnotator.closeEnough
MAX_SENT_TOKENS = 150      # PreFeaturizerAnnotator.java:99


def pairs_for_sentence(tokens, lemmas, pos, ner, antecedents,
                       clusters: dict[str, str] | None = None,
                       hashed: bool = False,
                       max_pair_distance: int = MAX_PAIR_DISTANCE,
                       max_sent_tokens: int = MAX_SENT_TOKENS) -> list[dict]:
    """``hashed=True`` (the production path) emits crc-combined feature ids
    directly (features.featurize_ids) — no feature strings are built."""
    if len(tokens) > max_sent_tokens:
        return []
    mentions = find_mentions(tokens, pos, ner, antecedents)
    subjects = [m for m in mentions if m.is_entity]
    out: list[dict] = []
    seen: set[tuple[str, str]] = set()
    for s in subjects:
        for o in mentions:
            if o is s:
                continue
            # no overlap
            if not (o.end <= s.begin or s.end <= o.begin):
                continue
            # distance cap
            dist = (o.begin - s.end) if s.end <= o.begin else (s.begin - o.end)
            if dist > max_pair_distance:
                continue
            if s.canonical == o.canonical:
                continue
            key = (s.canonical, o.canonical)
            if key in seen:
                continue
            seen.add(key)
            fz = featurize_ids if hashed else featurize
            feats = fz(tokens, lemmas, pos, ner,
                       (s.begin, s.end), (o.begin, o.end),
                       s.ner, o.ner, clusters)
            out.append(
                {
                    "subj": s.canonical,
                    "subj_type": s.ner,
                    "obj": o.canonical,
                    "obj_type": o.ner,
                    "subj_begin": s.begin,
                    "subj_end": s.end,
                    "obj_begin": o.begin,
                    "obj_end": o.end,
                    "features": feats,
                }
            )
    return out


class PairFeaturizer:
    """``map_batches`` callable: SENTENCES → PAIRS.

    Usable two ways: as a plain stateless function (instantiate on the
    driver with the broadcast ref and pass the INSTANCE to ``map_batches``
    → elastic task pool, the word→cluster map is fetched zero-copy and
    cached per worker process by ``state.broadcast.fetch``), or as an actor
    pool (pass the class + ``fn_constructor_kwargs``).  The task-pool form
    is the default in ``pipelines.kg`` — cheap-init stages must not pin
    CPUs the way fixed actor pools do (a 3-pool chain deadlocks a small
    cluster; observed at num_cpus=4).
    """

    def __init__(self, clusters_ref=None,
                 max_pair_distance: int = MAX_PAIR_DISTANCE,
                 max_sent_tokens: int = MAX_SENT_TOKENS):
        self._ref = clusters_ref
        self._max_pair_distance = max_pair_distance
        self._max_sent_tokens = max_sent_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schema import PAIRS
        from ..state.broadcast import fetch

        clusters = fetch(self._ref)
        cols = {k: [] for k in ("subj", "subj_type", "obj", "obj_type",
                                "doc_id", "sent_idx", "subj_begin", "subj_end",
                                "obj_begin", "obj_end", "features")}
        doc_ids = batch.column("doc_id").to_pylist()
        sent_idxs = batch.column("sent_idx").to_pylist()
        toks = batch.column("tokens").to_pylist()
        lems = batch.column("lemmas").to_pylist()
        poss = batch.column("pos").to_pylist()
        ners = batch.column("ner").to_pylist()
        antes = batch.column("antecedents").to_pylist()
        for did, sidx, tk, lm, ps, nr, an in zip(
            doc_ids, sent_idxs, toks, lems, poss, ners, antes
        ):
            for p in pairs_for_sentence(
                tk, lm, ps, nr, an, clusters, hashed=True,
                max_pair_distance=self._max_pair_distance,
                max_sent_tokens=self._max_sent_tokens,
            ):
                cols["subj"].append(p["subj"])
                cols["subj_type"].append(p["subj_type"])
                cols["obj"].append(p["obj"])
                cols["obj_type"].append(p["obj_type"])
                cols["doc_id"].append(did)
                cols["sent_idx"].append(sidx)
                cols["subj_begin"].append(p["subj_begin"])
                cols["subj_end"].append(p["subj_end"])
                cols["obj_begin"].append(p["obj_begin"])
                cols["obj_end"].append(p["obj_end"])
                cols["features"].append(p["features"])
        return pa.table(
            {
                "subj": pa.array(cols["subj"], pa.string()),
                "subj_type": pa.array(cols["subj_type"], pa.string()),
                "obj": pa.array(cols["obj"], pa.string()),
                "obj_type": pa.array(cols["obj_type"], pa.string()),
                "doc_id": pa.array(cols["doc_id"], pa.string()),
                "sent_idx": pa.array(cols["sent_idx"], pa.int32()),
                "subj_begin": pa.array(cols["subj_begin"], pa.int32()),
                "subj_end": pa.array(cols["subj_end"], pa.int32()),
                "obj_begin": pa.array(cols["obj_begin"], pa.int32()),
                "obj_end": pa.array(cols["obj_end"], pa.int32()),
                # hashed feature ids, not strings: feature strings are
                # transient inside featurize(); materializing tens of
                # millions of them through Arrow was a measured memory-
                # bandwidth bottleneck at high core counts
                "features": pa.array(cols["features"], pa.list_(pa.int64())),
            },
            schema=PAIRS,
        )


def pairs_batch(batch: pa.Table) -> pa.Table:
    """Stateless variant (no cluster features)."""
    return PairFeaturizer(None)(batch)
