"""S3 — entity + slot-candidate mention detection (stateless, sentence-local).

Semantics rebuilt from the reference:

- Entity mentions: every PERSON / ORGANIZATION NER run is an entity mention.
  The reference matches a *given* query entity
  (kbp/sf/process/EntityMentionAnnotator.java:49-130); at web scale the
  pipeline *discovers* subjects instead (SURVEY.md §2.5 "Query → candidate
  sentences"), so every PER/ORG mention is a potential subject.
- Coref mentions: tokens whose antecedent annotation is set (pronouns, bare
  surnames) yield mentions whose ``canonical`` is the antecedent —
  EntityMentionAnnotator's antecedent-span path (lines 92-130).
- Slot-candidate mentions: maximal runs of one non-O NER tag, with POS
  sanity at the edges (no IN/DT at span edges) —
  kbp/sf/process/SlotMentionAnnotator.java:75-243.  Person-pronoun NER
  override via antecedents (SlotMentionAnnotator pronoun logic).

Everything here is a pure function of one SENTENCES row; the batch wrapper
is a stateless ``map_batches``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

ENTITY_NER = ("PERSON", "ORGANIZATION")
_BAD_EDGE_POS = {"IN", "DT", "CC", "."}
_PRONOUN_PER = {"he", "she", "him", "her", "his", "hers"}
_PRONOUN_ANY = {"it", "its", "they", "them", "their", "theirs"}
_NOMINAL_ORG = {"company", "firm", "organization", "corporation", "group",
                "agency"}


@dataclass(frozen=True)
class Mention:
    begin: int          # half-open token span (Span semantics, KBPair keys)
    end: int
    surface: str
    canonical: str      # antecedent-resolved representative surface
    ner: str
    is_entity: bool     # potential subject (PERSON/ORGANIZATION)


def find_mentions(tokens: list[str], pos: list[str], ner: list[str],
                  antecedents: list[str]) -> list[Mention]:
    """All mentions of one sentence, ordered by span begin."""
    n = len(tokens)
    out: list[Mention] = []
    i = 0
    while i < n:
        tag = ner[i]
        if tag == "O":
            # pronoun with an antecedent -> coref mention
            low = tokens[i].lower()
            ante = antecedents[i]
            if ante and (low in _PRONOUN_PER or low in _PRONOUN_ANY):
                ptype = "PERSON" if low in _PRONOUN_PER else "ORGANIZATION"
                out.append(Mention(i, i + 1, tokens[i], ante, ptype, True))
            elif ante and low in _NOMINAL_ORG:
                # "the company" resolved to the last org by the NLP pass
                out.append(Mention(i, i + 1, tokens[i], ante,
                                   "ORGANIZATION", True))
            i += 1
            continue
        j = i
        while j < n and ner[j] == tag:
            j += 1
        b, e = i, j
        # POS sanity at edges (SlotMentionAnnotator.java:{edge checks})
        while b < e and pos[b] in _BAD_EDGE_POS:
            b += 1
        while e > b and pos[e - 1] in _BAD_EDGE_POS:
            e -= 1
        if e > b:
            surface = " ".join(tokens[b:e])
            canonical = antecedents[b] if antecedents[b] else surface
            out.append(Mention(b, e, surface, canonical, tag,
                               tag in ENTITY_NER))
        i = j
    return out


def mentions_batch(batch: pa.Table) -> pa.Table:
    """Stateless ``map_batches`` over SENTENCES → MENTIONS rows."""
    from ..schema import MENTIONS

    cols = {k: [] for k in ("doc_id", "sent_idx", "span_begin", "span_end",
                            "surface", "canonical", "ner", "is_entity")}
    from ..schema import str_lists

    doc_ids = batch.column("doc_id").to_pylist()
    sent_idxs = batch.column("sent_idx").to_pylist()
    toks = str_lists(batch, "tokens")
    poss = str_lists(batch, "pos")
    ners = str_lists(batch, "ner")
    antes = str_lists(batch, "antecedents")
    for did, sidx, tk, ps, nr, an in zip(doc_ids, sent_idxs, toks, poss, ners, antes):
        for m in find_mentions(tk, ps, nr, an):
            cols["doc_id"].append(did)
            cols["sent_idx"].append(sidx)
            cols["span_begin"].append(m.begin)
            cols["span_end"].append(m.end)
            cols["surface"].append(m.surface)
            cols["canonical"].append(m.canonical)
            cols["ner"].append(m.ner)
            cols["is_entity"].append(m.is_entity)
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "sent_idx": pa.array(cols["sent_idx"], pa.int32()),
            "span_begin": pa.array(cols["span_begin"], pa.int32()),
            "span_end": pa.array(cols["span_end"], pa.int32()),
            "surface": pa.array(cols["surface"], pa.string()),
            "canonical": pa.array(cols["canonical"], pa.string()),
            "ner": pa.array(cols["ner"], pa.string()),
            "is_entity": pa.array(cols["is_entity"], pa.bool_()),
        },
        schema=MENTIONS,
    )
