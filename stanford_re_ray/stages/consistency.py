"""S7 — slot-fill consistency: unary filters/rewrites + per-entity greedy
global filter.

Rebuilt from the reference's consistency engine (SURVEY.md §2.8):

- unary pass (stateless ``map_batches``):
  * RespectRelationTypes — object NER type must be valid for the relation
    (SlotfillPostProcessor.java:83-118);
  * SanityCheckFilter — value length ≤ 80, subj ≠ obj
    (same table, "SanityCheckFilter");
  * slot-value rewrites — Timex padding (``1983`` → ``1983-XX-XX``), number
    extraction, URL base extraction
    (HeuristicSlotfillPostProcessors.java:186-241, 298-367);
- global pass (``triples.groupby(subj_key).map_groups``; entity-local, the
  greedy set is bounded by fills-per-entity — SURVEY.md §2.8 mapping):
  * canonical KBPSlotFill ordering — score desc, slot-token-count desc,
    name-length desc, lexicographic (KBPSlotFill.compareTo,
    KBPSlotFill.java:58-80);
  * greedy enable while consistent (HeuristicSlotfillPostProcessor
    .filterStep/greedyEnableSlotsInPlace, lines 187-310):
      - NoDuplicates: one fill per (pred, normalized obj)
        (HeuristicSlotfillPostProcessors.java:506-515);
      - SINGLE-cardinality relations keep only the best object
        (DuplicateRelationOnlyInListRelations, lines 576-598);
      - RespectDeclaredIncompatibilities: a (subj, obj) pair may carry two
        relations only if ``plausibly_cooccurs`` allows it
        (RelationType.plausibleOverlappingRelations).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ..relations import RELATION_BY_NAME, plausibly_cooccurs

_MONTHS = {
    "january": "01", "february": "02", "march": "03", "april": "04",
    "may": "05", "june": "06", "july": "07", "august": "08",
    "september": "09", "october": "10", "november": "11", "december": "12",
}
_YEAR = re.compile(r"^(1[6-9]\d\d|20\d\d)$")
_ISO = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_NUM = re.compile(r"\d+(?:[.,]\d+)*")
MAX_SLOT_LEN = 80  # SanityCheckFilter


def normalize_date(value: str) -> str:
    """Timex normalization with XX wildcards
    (HeuristicSlotfillPostProcessors.java:186-241)."""
    v = value.strip()
    if _ISO.match(v):
        return v
    if _YEAR.match(v):
        return f"{v}-XX-XX"
    parts = v.split()
    if len(parts) == 2 and parts[0].lower() in _MONTHS and _YEAR.match(parts[1]):
        return f"{parts[1]}-{_MONTHS[parts[0].lower()]}-XX"
    if (
        len(parts) == 3
        and parts[0].lower() in _MONTHS
        and parts[1].rstrip(",").isdigit()
        and _YEAR.match(parts[2])
    ):
        return f"{parts[2]}-{_MONTHS[parts[0].lower()]}-{int(parts[1].rstrip(',')):02d}"
    return v


def normalize_number(value: str) -> str:
    """Number extraction (HeuristicSlotfillPostProcessors.java:332-350)."""
    m = _NUM.search(value)
    return m.group(0).replace(",", "") if m else value


def normalize_url(value: str) -> str:
    """URL base extraction (HeuristicSlotfillPostProcessors.java:255-295)."""
    v = value.strip().rstrip("/.")
    v = re.sub(r"^https?://", "", v)
    return v.split("/")[0].lower()


def rewrite_value(pred: str, obj: str, obj_type: str) -> str:
    rel = RELATION_BY_NAME.get(pred)
    if rel is None:
        return obj
    if "DATE" in rel.object_types and obj_type == "DATE":
        return normalize_date(obj)
    if "NUMBER" in rel.object_types and obj_type == "NUMBER":
        return normalize_number(obj)
    if "URL" in rel.object_types and obj_type == "URL":
        return normalize_url(obj)
    return obj


def unary_filter_batch(batch: pa.Table,
                       max_slot_len: int = MAX_SLOT_LEN) -> pa.Table:
    """Stateless unary pass over TRIPLES: type check + sanity + rewrites."""
    preds = batch.column("pred").to_pylist()
    subjs = batch.column("subj").to_pylist()
    subj_ts = batch.column("subj_type").to_pylist()
    objs = batch.column("obj").to_pylist()
    obj_ts = batch.column("obj_type").to_pylist()
    keep: list[int] = []
    new_obj: list[str] = []
    for i, pred in enumerate(preds):
        rel = RELATION_BY_NAME.get(pred)
        if rel is None:
            continue
        if rel.subject_type != subj_ts[i] or obj_ts[i] not in rel.object_types:
            continue
        if not objs[i] or len(objs[i]) > max_slot_len:
            continue
        if objs[i].lower() == subjs[i].lower():
            continue
        keep.append(i)
        new_obj.append(rewrite_value(pred, objs[i], obj_ts[i]))
    out = batch.take(pa.array(keep, pa.int64()))
    return out.set_column(out.schema.get_field_index("obj"), "obj",
                          pa.array(new_obj, pa.string()))


def _fill_sort_key(row) -> tuple:
    """KBPSlotFill.compareTo total order (KBPSlotFill.java:58-80), expressed
    for ascending sort: score desc, obj token count desc, subj length desc,
    then lexicographic.  Extended with obj_type + provenance columns so the
    order is TOTAL over post-bag rows — two fills whose objs rewrite to the
    same value (e.g. '1983' and '1983-XX-XX' both → '1983-XX-XX') must not
    fall back to nondeterministic post-shuffle arrival order."""
    return (
        -row["score"],
        -len(str(row["obj"]).split()),
        -len(str(row["subj"])),
        row["pred"],
        row["obj"],
        str(row.get("obj_type", "")),
        str(row.get("doc_id", "")),
        int(row.get("sent_idx", 0) or 0),
        int(row.get("subj_begin", 0) or 0),
        int(row.get("obj_begin", 0) or 0),
    )


GEO_CHECK_PAIRS = (
    # (city relation, country relation) pairs that must geo-agree
    ("per:city_of_birth", "per:country_of_birth"),
    ("per:city_of_death", "per:country_of_death"),
    ("org:city_of_headquarters", "org:country_of_headquarters"),
)


def geo_filter(rows: list[dict], city_to_country: dict[str, str]) -> list[dict]:
    """WorldKnowledgePostProcessor geo-consistency
    (kbp/sf/evaluate/WorldKnowledgePostProcessor.java:30-115): when an
    entity carries both a city and a country fill of the same event and
    the gazetteer maps the city to a DIFFERENT country, drop the
    lower-scoring fill of the pair."""
    if not city_to_country:
        return rows
    by_pred: dict[str, dict] = {}
    for r in rows:
        cur = by_pred.get(r["pred"])
        if cur is None or r["score"] > cur["score"]:
            by_pred[r["pred"]] = r
    drop: set[int] = set()
    for city_rel, country_rel in GEO_CHECK_PAIRS:
        c = by_pred.get(city_rel)
        k = by_pred.get(country_rel)
        if c is None or k is None:
            continue
        mapped = city_to_country.get(c["obj"])
        if mapped is not None and mapped != k["obj"]:
            loser = c if c["score"] <= k["score"] else k
            drop.add(id(loser))
    return [r for r in rows if id(r) not in drop]


def greedy_consistency_bucket(df: pd.DataFrame,
                              city_to_country: dict[str, str] | None = None,
                              enforce_cardinality: bool = True,
                              enforce_incompatibilities: bool = True,
                              ) -> pd.DataFrame:
    """Bucketed wrapper: one Ray group = one hash bucket of subjects; the
    per-entity greedy runs in a plain loop inside (same semantics, ~B Ray
    groups instead of one per entity)."""
    from ..schema import pd_to_arrow

    if not len(df):
        return pd_to_arrow(df.iloc[0:0].drop(columns=["__bucket"],
                                             errors="ignore"))
    df = df.drop(columns=["__bucket"], errors="ignore")
    outs = [
        greedy_consistency(g, city_to_country,
                           enforce_cardinality=enforce_cardinality,
                           enforce_incompatibilities=enforce_incompatibilities)
        for _, g in df.groupby(["subj", "subj_type"], sort=True)
    ]
    outs = [o for o in outs if len(o)]
    return pd_to_arrow(pd.concat(outs, ignore_index=True) if outs else df.iloc[0:0])


def greedy_consistency(group: pd.DataFrame,
                       city_to_country: dict[str, str] | None = None,
                       enforce_cardinality: bool = True,
                       enforce_incompatibilities: bool = True,
                       ) -> pd.DataFrame:
    """Entity-local greedy filter — ``groupby([subj, subj_type])
    .map_groups(greedy_consistency, batch_format="pandas")``."""
    rows = group.to_dict("records")
    rows.sort(key=_fill_sort_key)
    if city_to_country:
        rows = geo_filter(rows, city_to_country)
    active: list[dict] = []
    seen_pred_obj: set[tuple[str, str]] = set()
    single_taken: set[str] = set()
    pair_rels: dict[str, list[str]] = {}
    out = []
    for r in rows:
        pred, obj = r["pred"], r["obj"]
        key = (pred, obj.lower())
        if key in seen_pred_obj:
            continue
        rel = RELATION_BY_NAME[pred]
        if enforce_cardinality and rel.is_single and pred in single_taken:
            continue
        # NoDuplicatesApproximate (HeuristicSlotfillPostProcessors.java:
        # 518-573): an entity-valued fill whose value entity-links to an
        # already-accepted value of the SAME relation is a near-duplicate;
        # the earlier (higher-scoring) fill wins
        if r["obj_type"] in ("PERSON", "ORGANIZATION"):
            from .canonicalize import same_entity

            dup = False
            for p2, o2 in seen_pred_obj:
                if p2 == pred and same_entity(obj, o2, r["obj_type"]):
                    dup = True
                    break
            if dup:
                continue
        ok = True
        if enforce_incompatibilities:
            prev = pair_rels.get(obj.lower(), [])
            for p2 in prev:
                if not plausibly_cooccurs(pred, p2):
                    ok = False
                    break
        if not ok:
            continue
        seen_pred_obj.add(key)
        if rel.is_single:
            single_taken.add(pred)
        pair_rels.setdefault(obj.lower(), []).append(pred)
        active.append(r)
        out.append(r)
    return pd.DataFrame(out, columns=group.columns) if out else group.iloc[0:0]
