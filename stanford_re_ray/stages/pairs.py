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

import re

import pyarrow as pa

from .classify import hash_features
from .features import featurize, featurize_ids
from .mentions import find_mentions

MAX_PAIR_DISTANCE = 25     # RelationMentionAnnotator.closeEnough
MAX_SENT_TOKENS = 150      # PreFeaturizerAnnotator.java:99

# --- KB-fill alternate-value matching --------------------------------------
# Train-time slot matching that bypasses NER: known KB fills (and their
# alternate renderings) are string-matched directly into the sentence,
# longest-span-first with token absorption
# (RelationMentionAnnotator.java:104-205, 301-348, 407-466).

YEAR_RE = re.compile(r"[12]\d\d\d")          # RelationMentionAnnotator.YEAR
PERSON_PREFIXES = frozenset(
    ("mr", "mr.", "ms", "ms.", "mrs", "mrs.", "miss", "mister", "sir",
     "dr", "dr."))
PERSON_SUFFIXES = frozenset(("jr", "jr.", "sr", "sr.", "i", "ii", "iii", "iv"))


def alternate_slot_values(value: str, is_date_slot: bool,
                          is_person_slot: bool) -> list[str]:
    """Alternate renderings of a KB slot value
    (``findAlternateSlotValues``, RelationMentionAnnotator.java:413-435):
    for date slots, the bare 4-digit year if the full value carries more;
    for person-name slots, "First Last" with titles/suffixes stripped and
    the middle name dropped (``findPersonAlternateNames``, :437-465)."""
    alts: list[str] = []
    if is_date_slot:
        m = YEAR_RE.search(value)
        if m and len(m.group()) < len(value):
            alts.append(m.group())
    if is_person_slot:
        toks = value.split()
        start, end = 0, len(toks) - 1
        while start < end and toks[start].lower() in PERSON_PREFIXES:
            start += 1
        while end > start and toks[end].lower() in PERSON_SUFFIXES:
            end -= 1
        if start < end - 1:
            alts.append(toks[start] + " " + toks[end])
    return alts


def match_fill_in_tokens(tokens: list[str], entity_mask: list[bool],
                         value: str, is_date_slot: bool,
                         is_person_slot: bool) -> list[tuple[int, int, bool]]:
    """All token spans where a slot fill (or one of its alternates)
    string-matches, longest name first, matched tokens absorbed within the
    call (``matchSlotInSentence``, RelationMentionAnnotator.java:301-348;
    including its no-restart-after-reset scan quirk).  Returns
    (begin, end, exact) with exact = the match used the full value, not an
    alternate."""
    value_toks = value.split()
    names = [value_toks] + [
        a.split()
        for a in alternate_slot_values(value, is_date_slot, is_person_slot)
    ]
    names.sort(key=len, reverse=True)
    used = list(entity_mask)
    out: list[tuple[int, int, bool]] = []
    for name in names:
        if not name:
            continue
        ni = 0
        for i, tok in enumerate(tokens):
            if used[i]:
                ni = 0
                continue
            if name[ni] == tok:
                ni += 1
            else:
                ni = 0
            if ni >= len(name):
                begin = i + 1 - ni
                for k in range(begin, i + 1):
                    used[k] = True
                out.append((begin, i + 1, name == value_toks))
                ni = 0
    return out


def kb_fills_lookup(kb_tbl: pa.Table) -> dict[str, list[tuple[str, bool, bool]]]:
    """KB table → subj_lower → sorted [(slot_value, is_date, is_person)]
    for the train-time slot matcher.  Date/person-ness comes from the
    relation's valid object NER tags (RelationType.isDateRelation /
    isPersonNameRelation, RelationType.java:111-113); a value filling
    several relations is date/person if ANY of them is."""
    from ..relations import RELATION_BY_NAME

    acc: dict[str, dict[str, tuple[bool, bool]]] = {}
    for name, rel, val in zip(
        kb_tbl.column("entity_name").to_pylist(),
        kb_tbl.column("rel").to_pylist(),
        kb_tbl.column("slot_value").to_pylist(),
    ):
        r = RELATION_BY_NAME.get(rel)
        is_date = bool(r and "DATE" in r.object_types)
        is_person = bool(r and "PERSON" in r.object_types)
        d = acc.setdefault(name.lower(), {})
        od, op = d.get(val, (False, False))
        d[val] = (od or is_date, op or is_person)
    return {
        subj: sorted(((v, d, p) for v, (d, p) in vals.items()),
                     key=lambda t: (-len(t[0].split()), t[0]))
        for subj, vals in acc.items()
    }


def _kb_pairs_for_subject(tokens, lemmas, pos, ner, subj_mentions, fills,
                          clusters, hashed, max_pair_distance):
    """KB-known pairs for one subject: match every fill, sort matched
    spans longest-first, absorb, distance-gate, vote an NE type per span
    (``voteOnSpanNEType``, :372-382; MISC fallback like :163), emit one
    pair per (subj, normalized value).  Returns (pairs, absorbed_token_set)
    — the caller skips discovery objects overlapping absorbed tokens
    (step (2) of the annotator, :188-201)."""
    entity_mask = [False] * len(tokens)
    for m in subj_mentions:
        for k in range(m.begin, m.end):
            entity_mask[k] = True
    span_matches: dict[tuple[int, int], list[tuple[bool, str]]] = {}
    for value, is_date, is_person in fills:
        for b, e, exact in match_fill_in_tokens(
                tokens, entity_mask, value, is_date, is_person):
            span_matches.setdefault((b, e), []).append((exact, value))
    fz = featurize_ids if hashed else featurize
    absorbed: set[int] = set()
    pairs = []
    for b, e in sorted(span_matches,
                       key=lambda s: (-(s[1] - s[0]), s[0])):
        if any(k in absorbed for k in range(b, e)):
            continue
        # closeEnough vs any mention of the subject
        dists = [
            (b - m.end) if m.end <= b else (m.begin - e)
            for m in subj_mentions
            if m.end <= b or e <= m.begin
        ]
        if not dists or min(dists) > max_pair_distance:
            continue
        absorbed.update(range(b, e))
        cands = span_matches[(b, e)]
        norm_value = next((v for exact, v in cands if exact), cands[0][1])
        votes: dict[str, int] = {}
        for k in range(b, e):
            if ner[k] != "O":
                votes[ner[k]] = votes.get(ner[k], 0) + 1
        obj_ner = (max(sorted(votes), key=lambda t: votes[t])
                   if votes else "MISC")
        # pair with the nearest subject mention (the reference pairs every
        # entity mention then keeps the first by pair dedup; nearest is
        # the deterministic equivalent with better features)
        s = min(
            (m for m in subj_mentions if m.end <= b or e <= m.begin),
            key=lambda m: ((b - m.end) if m.end <= b else (m.begin - e),
                           m.begin),
        )
        feats = fz(tokens, lemmas, pos, ner, (s.begin, s.end), (b, e),
                   s.ner, obj_ner, clusters)
        pairs.append(
            {
                "subj": s.canonical,
                "subj_type": s.ner,
                "obj": norm_value,
                "obj_type": obj_ner,
                "subj_begin": s.begin,
                "subj_end": s.end,
                "obj_begin": b,
                "obj_end": e,
                "features": feats,
            }
        )
    return pairs, absorbed


def _pairs_rows(tokens, lemmas, pos, ner, antecedents,
                clusters, hashed, max_pair_distance, max_sent_tokens,
                kb_fills) -> list[tuple]:
    """Single implementation of candidate-pair generation.  Returns
    ``(subj, subj_type, obj, obj_type, sb, se, ob, oe, features)`` tuples
    — no per-pair dict allocation on the hot path (``PairFeaturizer``
    unpacks the tuples straight into column buffers; the dict form exists
    only in the thin ``pairs_for_sentence`` wrapper below)."""
    if len(tokens) > max_sent_tokens:
        return []
    mentions = find_mentions(tokens, pos, ner, antecedents)
    subjects = [m for m in mentions if m.is_entity]
    out: list[tuple] = []
    seen: set[tuple[str, str]] = set()
    absorbed_by_subj: dict[str, set[int]] = {}
    if kb_fills:
        for canon in dict.fromkeys(s.canonical for s in subjects):
            fills = kb_fills.get(canon.lower())
            if not fills:
                continue
            subj_mentions = [m for m in subjects if m.canonical == canon]
            kb_pairs, absorbed = _kb_pairs_for_subject(
                tokens, lemmas, pos, ner, subj_mentions, fills, clusters,
                hashed, max_pair_distance)
            absorbed_by_subj[canon] = absorbed
            for p in kb_pairs:
                key = (p["subj"], p["obj"])
                if key not in seen:
                    seen.add(key)
                    out.append((p["subj"], p["subj_type"], p["obj"],
                                p["obj_type"], p["subj_begin"],
                                p["subj_end"], p["obj_begin"], p["obj_end"],
                                p["features"]))
    fz = featurize_ids if hashed else featurize
    for s in subjects:
        s_absorbed = absorbed_by_subj.get(s.canonical)
        s_begin = s.begin
        s_end = s.end
        s_canon = s.canonical
        for o in mentions:
            if s_absorbed and any(
                    k in s_absorbed for k in range(o.begin, o.end)):
                continue
            if o is s:
                continue
            # no overlap
            if not (o.end <= s_begin or s_end <= o.begin):
                continue
            # distance cap
            dist = (o.begin - s_end) if s_end <= o.begin else (s_begin - o.end)
            if dist > max_pair_distance:
                continue
            if s_canon == o.canonical:
                continue
            key = (s_canon, o.canonical)
            if key in seen:
                continue
            seen.add(key)
            feats = fz(tokens, lemmas, pos, ner,
                       (s_begin, s_end), (o.begin, o.end),
                       s.ner, o.ner, clusters)
            out.append((s_canon, s.ner, o.canonical, o.ner,
                        s_begin, s_end, o.begin, o.end, feats))
    return out


def pairs_for_sentence(tokens, lemmas, pos, ner, antecedents,
                       clusters: dict[str, str] | None = None,
                       hashed: bool = False,
                       max_pair_distance: int = MAX_PAIR_DISTANCE,
                       max_sent_tokens: int = MAX_SENT_TOKENS,
                       kb_fills: dict | None = None) -> list[dict]:
    """``hashed=True`` (the production path) emits crc-combined feature ids
    directly (features.featurize_ids) — no feature strings are built.

    ``kb_fills`` (train path only): subj_lower → [(slot_value, is_date,
    is_person)] from ``kb_fills_lookup``.  Known fills are string-matched
    into the sentence FIRST — including alternate values (year-only dates,
    first+last person names) — longest-span-first with absorption; the
    NER-discovery loop then skips object spans a KB match absorbed
    (RelationMentionAnnotator.java:104-205).

    Dict-per-pair convenience wrapper over ``_pairs_rows`` (the tuple form
    ``PairFeaturizer`` consumes directly)."""
    return [
        {
            "subj": t[0], "subj_type": t[1], "obj": t[2], "obj_type": t[3],
            "subj_begin": t[4], "subj_end": t[5],
            "obj_begin": t[6], "obj_end": t[7], "features": t[8],
        }
        for t in _pairs_rows(tokens, lemmas, pos, ner, antecedents, clusters,
                             hashed, max_pair_distance, max_sent_tokens,
                             kb_fills)
    ]


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
                 max_sent_tokens: int = MAX_SENT_TOKENS,
                 kb_fills_ref=None):
        self._ref = clusters_ref
        self._max_pair_distance = max_pair_distance
        self._max_sent_tokens = max_sent_tokens
        self._kb_fills_ref = kb_fills_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..schema import PAIRS, str_lists
        from ..state.broadcast import fetch

        clusters = fetch(self._ref)
        kb_fills = fetch(self._kb_fills_ref)
        from array import array

        subjs: list[str] = []
        subj_types: list[str] = []
        objs: list[str] = []
        obj_types: list[str] = []
        spans = array("i")             # (sb, se, ob, oe) interleaved
        flat_feats = array("q")        # flat feature-id buffer; array.array
        feat_lens = array("i")         # extend is C-speed and np.frombuffer
        n_per_sent = array("i")        # is zero-copy (np.asarray on a large
                                       # Python int list measured ~0.5µs/elem)

        toks = str_lists(batch, "tokens")
        lems = str_lists(batch, "lemmas")
        poss = str_lists(batch, "pos")
        ners = str_lists(batch, "ner")
        antes = str_lists(batch, "antecedents")
        mpd = self._max_pair_distance
        mst = self._max_sent_tokens
        for tk, lm, ps, nr, an in zip(toks, lems, poss, ners, antes):
            rows = _pairs_rows(tk, lm, ps, nr, an, clusters, True,
                               mpd, mst, kb_fills)
            n_per_sent.append(len(rows))
            for (subj, styp, obj, otyp, sb, se, ob, oe, feats) in rows:
                subjs.append(subj)
                subj_types.append(styp)
                objs.append(obj)
                obj_types.append(otyp)
                spans.append(sb)
                spans.append(se)
                spans.append(ob)
                spans.append(oe)
                flat_feats.extend(feats)
                feat_lens.append(len(feats))
        # doc_id / sent_idx: one zero-copy take per column instead of a
        # per-pair Python append
        idx = pa.array(
            np.repeat(np.arange(len(n_per_sent), dtype=np.int64),
                      np.frombuffer(n_per_sent, dtype=np.int32)
                      if n_per_sent else np.empty(0, dtype=np.int32)))
        span_arr = (np.frombuffer(spans, dtype=np.int32)
                    if spans else np.empty(0, dtype=np.int32)).reshape(-1, 4)
        lens_arr = (np.frombuffer(feat_lens, dtype=np.int32)
                    if feat_lens else np.empty(0, dtype=np.int32))
        offsets = np.empty(len(feat_lens) + 1, dtype=np.int32)
        offsets[0] = 0
        np.cumsum(lens_arr, out=offsets[1:])
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "subj_type": pa.array(subj_types, pa.string()),
                "obj": pa.array(objs, pa.string()),
                "obj_type": pa.array(obj_types, pa.string()),
                "doc_id": batch.column("doc_id").take(idx),
                "sent_idx": batch.column("sent_idx").take(idx),
                "subj_begin": pa.array(span_arr[:, 0]),
                "subj_end": pa.array(span_arr[:, 1]),
                "obj_begin": pa.array(span_arr[:, 2]),
                "obj_end": pa.array(span_arr[:, 3]),
                # hashed feature ids, not strings: feature strings are
                # transient inside featurize(); materializing tens of
                # millions of them through Arrow was a measured memory-
                # bandwidth bottleneck at high core counts.  Flat buffer +
                # offsets → ListArray without per-sublist conversion.
                "features": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(np.frombuffer(flat_feats, dtype=np.int64)
                             if flat_feats else np.empty(0, dtype=np.int64))),
            },
            schema=PAIRS,
        )


def pairs_batch(batch: pa.Table) -> pa.Table:
    """Stateless variant (no cluster features)."""
    return PairFeaturizer(None)(batch)
