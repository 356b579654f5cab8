"""Input readers (SURVEY.md §2.1 sources).

- KB triples TSV → KB dataset (KBPIR.readKBTriples analog,
  kbp/sf/ir/KBPIR.java:141-188): ``entityId \\t entityName \\t relationName
  \\t slotValue``; subject type inferred from the relation prefix; optional
  row cap.
- TAC query XML → queries table (TaskXMLParser analog,
  kbp/sf/spec/TaskXMLParser.java:25-212): ``<query id=...><name>...
  <docid>... <enttype>... <nodeid>... <ignore>...``.
- Gazetteer tab files → Dictionaries fields (WorldKnowledgePostProcessor
  loaders, kbp/sf/evaluate/WorldKnowledgePostProcessor.java:27-55).
- Word-cluster file ``word \\t clusterId`` (FeatureFactory.java:65-78 —
  the egw4-reut.512.clusters format).
- Trigger keywords ``relation \\t phrase``, sorted by phrase length desc
  (PreFeaturizerAnnotator.java:61-87).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from ..relations import RELATION_BY_NAME, subject_type_for_relation


def read_kb_tsv(path: str, max_rows: int | None = None) -> pa.Table:
    """KB TSV → KB table; rows with unknown relation names are dropped
    (the reference fatals — we record and skip, erring streaming-friendly)."""
    ids, names, rels, vals = [], [], [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) < 4:
                continue
            eid, name, rel, val = parts[0], parts[1], parts[2], parts[3]
            if rel not in RELATION_BY_NAME:
                continue
            ids.append(eid)
            names.append(name)
            rels.append(rel)
            vals.append(val)
            if max_rows is not None and len(ids) >= max_rows:
                break
    from ..schema import KB

    return pa.table(
        {"entity_id": pa.array(ids), "entity_name": pa.array(names),
         "rel": pa.array(rels), "slot_value": pa.array(vals)},
        schema=KB,
    )


def kb_dataset(path: str, max_rows: int | None = None):
    """KB TSV as a Ray dataset (driver-side read is fine — the KB is the
    broadcast small side of the DS join)."""
    import ray.data as rd

    return rd.from_arrow(read_kb_tsv(path, max_rows))


def read_query_xml(path: str) -> pa.Table:
    """TAC 2013-format query XML → queries table
    (query_id, name, enttype, doc_id, node_id, ignored_slots)."""
    tree = ET.parse(path)
    root = tree.getroot()
    rows = {k: [] for k in ("query_id", "name", "enttype", "doc_id",
                            "node_id", "ignored_slots")}
    for q in root.findall("query"):
        rows["query_id"].append(q.get("id", ""))

        def _txt(tag):
            el = q.find(tag)
            return el.text.strip() if el is not None and el.text else ""

        rows["name"].append(_txt("name"))
        rows["enttype"].append(_txt("enttype"))
        rows["doc_id"].append(_txt("docid"))
        rows["node_id"].append(_txt("nodeid") or None)
        ign = _txt("ignore")
        rows["ignored_slots"].append(ign.split() if ign else [])
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.string()),
            "name": pa.array(rows["name"], pa.string()),
            "enttype": pa.array(rows["enttype"], pa.string()),
            "doc_id": pa.array(rows["doc_id"], pa.string()),
            "node_id": pa.array(rows["node_id"], pa.string()),
            "ignored_slots": pa.array(rows["ignored_slots"],
                                      pa.list_(pa.string())),
        }
    )


def read_clusters_tsv(path: str) -> dict[str, str]:
    """``word \\t clusterId`` → dict (broadcast)."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                out[parts[0]] = parts[1]
    return out


def read_triggers_tsv(path: str) -> dict[str, list[str]]:
    """``relation \\t phrase`` → relation → phrases sorted by length desc
    (PreFeaturizerAnnotator keyword ordering)."""
    out: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                out.setdefault(parts[0], []).append(parts[1])
    for rel in out:
        out[rel].sort(key=lambda p: (-len(p), p))
    return out


def read_gazetteer_tab(path: str) -> list[tuple[str, ...]]:
    """Generic tab file (e.g. ``city \\t region_code \\t country_code \\t
    population`` — resources/.../kbp/gazetteers format)."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                rows.append(tuple(line.split("\t")))
    return rows


def kb_lookup_from_table(kb_tbl: pa.Table) -> dict[tuple[str, str], set[str]]:
    """(subj_lower, obj_lower) → relations — the broadcast DS-join side."""
    from ..pipelines.train import kb_to_lookup

    return kb_to_lookup(kb_tbl)


def infer_kb_subject_types(kb_tbl: pa.Table) -> pa.Table:
    """Add subj_type column by relation prefix (findTrueNERTag semantics)."""
    types = [subject_type_for_relation(r)
             for r in kb_tbl.column("rel").to_pylist()]
    return kb_tbl.append_column("subj_type", pa.array(types, pa.string()))
