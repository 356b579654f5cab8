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
    (RelationMentionAnnotator.java:104-205)."""
    if len(tokens) > max_sent_tokens:
        return []
    mentions = find_mentions(tokens, pos, ner, antecedents)
    subjects = [m for m in mentions if m.is_entity]
    out: list[dict] = []
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
                    out.append(p)
    fz = featurize_ids if hashed else featurize
    for s in subjects:
        s_absorbed = absorbed_by_subj.get(s.canonical)
        for o in mentions:
            if s_absorbed and any(
                    k in s_absorbed for k in range(o.begin, o.end)):
                continue
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
                 max_sent_tokens: int = MAX_SENT_TOKENS,
                 kb_fills_ref=None):
        self._ref = clusters_ref
        self._max_pair_distance = max_pair_distance
        self._max_sent_tokens = max_sent_tokens
        self._kb_fills_ref = kb_fills_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schema import PAIRS
        from ..state.broadcast import fetch

        clusters = fetch(self._ref)
        kb_fills = fetch(self._kb_fills_ref)
        cols = {k: [] for k in ("subj", "subj_type", "obj", "obj_type",
                                "doc_id", "sent_idx", "subj_begin", "subj_end",
                                "obj_begin", "obj_end", "features")}
        doc_ids = batch.column("doc_id").to_pylist()
        sent_idxs = batch.column("sent_idx").to_pylist()
        from ..schema import str_lists

        toks = str_lists(batch, "tokens")
        lems = str_lists(batch, "lemmas")
        poss = str_lists(batch, "pos")
        ners = str_lists(batch, "ner")
        antes = str_lists(batch, "antecedents")
        for did, sidx, tk, lm, ps, nr, an in zip(
            doc_ids, sent_idxs, toks, lems, poss, ners, antes
        ):
            for p in pairs_for_sentence(
                tk, lm, ps, nr, an, clusters, hashed=True,
                max_pair_distance=self._max_pair_distance,
                max_sent_tokens=self._max_sent_tokens,
                kb_fills=kb_fills,
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
