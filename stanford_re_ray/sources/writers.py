"""Output writers (SURVEY.md §2.1 sinks).

- Official TAC slot-filling output (OfficialOutputWriter analog,
  kbp/sf/evaluate/OfficialOutputWriter.java:46-107,144-198,250-260):
  per-query TSV ``queryId \\t relation \\t runId \\t docId \\t slotValue``
  (2013 adds offsets + confidence), NIL rows for unfilled slots, sorted by
  queryId, year-merged relation surface names.
- Parquet graph sinks: partitioned directories (resumable layout — one
  directory per partition, never one giant file).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..relations import RELATIONS, official_relation_name


def official_output_lines(
    triples: pa.Table,
    query_map: dict[tuple[str, str], str],
    run_id: str = "ray_kg_1",
    year: int = 2013,
    emit_nils: bool = True,
) -> list[str]:
    """Render triples as official-format lines.

    ``query_map``: (entity name, entity type) → queryId — the driver-side
    join of discovered subjects against the evaluation queries table.
    NIL rows are emitted for every (query, relation) with no fill
    (OfficialOutputWriter.java:96-107), relation names use the year's
    official surface (officialRelationName, lines 144-198).
    """
    df = triples.to_pandas()
    df["query_id"] = [
        query_map.get((s, t), "") for s, t in zip(df["subj"], df["subj_type"])
    ]
    df = df[df["query_id"] != ""]
    lines: list[str] = []
    filled: set[tuple[str, str]] = set()
    df = df.sort_values(["query_id", "pred", "obj"], kind="mergesort")
    for r in df.itertuples(index=False):
        rel_name = official_relation_name(r.pred, year)
        filled.add((r.query_id, rel_name))
        base = f"{r.query_id}\t{rel_name}\t{run_id}\t{r.doc_id}\t{r.obj}"
        if year >= 2013:
            base += f"\t{r.sent_idx}:{r.subj_begin}-{r.subj_end}" \
                    f"\t{r.sent_idx}:{r.obj_begin}-{r.obj_end}" \
                    f"\t{r.score:.4f}"
        lines.append(base)
    if emit_nils:
        by_type: dict[str, list[str]] = {}
        for rel in RELATIONS:
            by_type.setdefault(rel.subject_type, []).append(
                official_relation_name(rel.name, year)
            )
        for (name, etype), qid in sorted(query_map.items(),
                                         key=lambda kv: kv[1]):
            for rel_name in sorted(set(by_type.get(etype, []))):
                if (qid, rel_name) not in filled:
                    lines.append(f"{qid}\t{rel_name}\t{run_id}\tNIL")
    lines.sort(key=lambda ln: ln.split("\t", 1)[0])
    return lines


def write_official_output(path: str, triples: pa.Table,
                          query_map: dict[tuple[str, str], str],
                          run_id: str = "ray_kg_1", year: int = 2013) -> int:
    lines = official_output_lines(triples, query_map, run_id, year)
    with open(path, "w", encoding="utf-8") as f:
        for ln in lines:
            f.write(ln + "\n")
    return len(lines)


def write_graph_parquet(out_dir: str, triples, nodes, edges,
                        min_rows_per_file: int = 500_000) -> None:
    """Partitioned Parquet sinks for the three logical outputs (streaming
    write; each becomes a directory of part files)."""
    for name, ds in (("triples", triples), ("nodes", nodes),
                     ("edges", edges)):
        try:
            ds.write_parquet(f"{out_dir}/{name}",
                             min_rows_per_file=min_rows_per_file)
        except TypeError:  # older Ray releases use num_rows_per_file
            ds.write_parquet(f"{out_dir}/{name}",
                             num_rows_per_file=min_rows_per_file)
