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


# ---------------------------------------------------------------------------
# KB XML (DOM) reader — KBPDomReader.java:88-449
# ---------------------------------------------------------------------------

_BAND_BACKGROUNDS = {"group_or_band", "classical_ensemble"}  # BANDS, :137
_PARENS = __import__("re").compile(r"\s*\([^)]*\)\s*")
_YEARISH = __import__("re").compile(
    r"^(1[6-9]\d\d|20\d\d)$|^[A-Z][a-z]+ \d{1,2},? (1[6-9]\d\d|20\d\d)$")
_NUMERICISH = __import__("re").compile(r"^[\d,\.]+$")


def _remove_parentheses(name: str) -> str:
    """removeParentheses (KBPDomReader.java:484-497)."""
    return _PARENS.sub(" ", name).strip()


def _value_type_guess(value: str) -> str:
    """Cheap filler-type heuristic standing in for the reference's NER-type
    tables (readNERTypes, :554-596): DATE / NUMBER / other."""
    if _YEARISH.match(value.strip()):
        return "DATE"
    if _NUMERICISH.match(value.strip()):
        return "NUMBER"
    return "OTHER"


def read_kb_xml(
    path: str,
    infobox_map: dict[tuple[str, str], set[str]],
    per_classes: set[str],
    org_classes: set[str],
) -> pa.Table:
    """KB specification XML (Wikipedia-infobox dump) → KB table —
    KBPDomReader.parse/parseEntity/extractAllRelations semantics
    (KBPDomReader.java:88-243):

    - ``<entity name id><facts class=C><fact name=F>…`` per entity;
    - entity type: C in ``per_classes`` → PERSON unless the ``background``
      fact names a band (:137-139, 158-166); C in ``org_classes`` →
      ORGANIZATION; anything else is skipped (counted as missed);
    - "List of …" entities are skipped (:151-154);
    - fact name F maps through ``infobox_map[(C, F)]`` → candidate KBP
      relations; facts with no mapping are skipped (:181-186);
    - fillers: each ``<link>`` child is one filler; a fact without links
      contributes its whole text (getTextWithLinks, :455-468);
    - unambiguous (single-relation) facts emit directly; ambiguous sets
      are resolved by matching a cheap filler-type heuristic against each
      relation's declared object types (extractAmbiguousRelations,
      :330-385, with the NER table replaced by ``_value_type_guess``).

    Output schema matches ``read_kb_tsv`` so everything downstream
    (kb_to_lookup, the DS join) is shared.
    """
    tree = ET.parse(path)
    root = tree.getroot()
    ids, names, rels, vals = [], [], [], []

    def emit(eid, ename, rel, val):
        val = val.strip()
        if not val or rel not in RELATION_BY_NAME:
            return
        ids.append(eid)
        names.append(ename)
        rels.append(rel)
        vals.append(val)

    for entity in root.iter("entity"):
        ename = _remove_parentheses(entity.get("name", "")).strip()
        eid = entity.get("id")
        if not eid or not ename or ename.startswith("List of"):
            continue
        facts = entity.find("facts")
        if facts is None:
            continue
        eclass = (facts.get("class") or "").lower()
        background = None
        for fact in facts.findall("fact"):
            if (fact.get("name") or "").lower() == "background":
                background = "".join(fact.itertext()).strip().lower()
        if eclass in per_classes:
            if background in _BAND_BACKGROUNDS:
                continue
        elif eclass not in org_classes:
            continue
        for fact in facts.findall("fact"):
            fname = fact.get("name") or ""
            candidates = infobox_map.get((eclass, fname))
            if not candidates:
                continue
            links = [("".join(l.itertext())).strip()
                     for l in fact.findall("link")]
            fillers = [l for l in links if l] or \
                [("".join(fact.itertext())).strip()]
            for filler in fillers:
                filler = _remove_parentheses(filler)
                if not filler:
                    continue
                if len(candidates) == 1:
                    emit(eid, ename, next(iter(candidates)), filler)
                else:
                    vt = _value_type_guess(filler)
                    for rel in sorted(candidates):
                        r = RELATION_BY_NAME.get(rel)
                        if r is None:
                            continue
                        if vt in ("DATE", "NUMBER"):
                            if vt in r.object_types:
                                emit(eid, ename, rel, filler)
                        elif not ({"DATE", "NUMBER"} >= set(r.object_types)):
                            emit(eid, ename, rel, filler)
    from ..schema import KB

    return pa.table(
        {"entity_id": pa.array(ids, pa.string()),
         "entity_name": pa.array(names, pa.string()),
         "rel": pa.array(rels, pa.string()),
         "slot_value": pa.array(vals, pa.string())},
        schema=KB,
    )


def kb_xml_dataset(paths: list[str], infobox_map, per_classes, org_classes):
    """Directory-of-XML form of the KB reader as a Ray dataset: one task
    per file (the reference loops files sequentially, :101-107)."""
    import ray.data as rd

    files = rd.from_items([{"path": p} for p in paths])

    def parse(row):
        t = read_kb_xml(row["path"], infobox_map, per_classes, org_classes)
        return t.to_pylist()

    return files.flat_map(parse)
