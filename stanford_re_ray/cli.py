"""Command-line entrypoints — the ``ray job submit`` surface.

On a cluster::

    ray job submit --working-dir . -- \\
        python -m stanford_re_ray train --pages 's3://.../pages/*.parquet' \\
            --kb kb.tsv --out model.parquet
    ray job submit --working-dir . -- \\
        python -m stanford_re_ray kg --pages 'shards/*.parquet' \\
            --model model.parquet --out /data/kg_out

``kg`` runs the checkpointed per-shard pipeline
(``state.checkpoint.run_kg_checkpointed``): triples/nodes/edges land as
partitioned Parquet under ``--out``, one partition per input shard with a
lineage manifest, so a resubmitted job skips completed shards and a
poison shard fails alone.

Ray session ownership: inside ``ray job submit`` (or any caller that
already initialized Ray) the existing session is reused; standalone
invocations init local Ray themselves.  The driver-contract module
(``__ray_entry__``) never reaches this code path.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init()          # honors RAY_ADDRESS (ray job submit) or local


def _load_clusters(path: str | None):
    if not path:
        return None
    from .sources.readers import read_clusters_tsv

    return read_clusters_tsv(path)


def cmd_train(args) -> int:
    _ensure_ray()
    import ray.data as rd

    from .pipelines.train import train_model
    from .sources.readers import read_kb_tsv

    pages = rd.read_parquet(sorted(glob.glob(args.pages)) or args.pages)
    kb = read_kb_tsv(args.kb)
    model = train_model(pages, kb,
                        clusters=_load_clusters(args.clusters),
                        negative_subsample=args.negative_subsample,
                        epochs=args.epochs)
    model.save(args.out)
    print(json.dumps({"model": args.out,
                      "nonzero_weights": int((model.weights != 0).sum())}))
    return 0


def cmd_kg(args) -> int:
    _ensure_ray()
    from .stages.classify import LRModel
    from .state.checkpoint import run_kg_checkpointed

    shards = sorted(glob.glob(args.pages))
    if not shards:
        print(f"no shards match {args.pages}", file=sys.stderr)
        return 2
    reader, lang = None, args.lang
    if args.format == "warc":
        from .sources.warc import read_warc

        reader = lambda p: read_warc([p])  # noqa: E731
        if lang == "en":
            lang = ""       # WARC has no language metadata to filter on
    elif args.format == "jsonl":
        from .sources.warc import read_pages_jsonl

        reader = read_pages_jsonl
    model = LRModel.load(args.model)
    res = run_kg_checkpointed(shards, model, args.out,
                              clusters=_load_clusters(args.clusters),
                              reader=reader, lang=lang)
    print(json.dumps({
        "out": args.out,
        "skipped": len(res["completed_previously"]),
        "processed": len(res["processed"]),
        "failed": res["failed"],
    }))
    return 1 if res["failed"] else 0


def cmd_curate(args) -> int:
    """One-command corpus curation: quality → exact dedup →
    decontamination → stratum balance (``mixing.curate_corpus``, the
    q54-oracled composition), surviving documents optionally
    PII-scrubbed and written as partitioned Parquet.

    Unlike ``kg`` (per-shard checkpointing), curation is one GLOBAL job
    by nature — dedup and decontamination are cross-shard decisions —
    so resume = rerun; the write streams, nothing materializes on the
    driver."""
    _ensure_ray()
    import ray.data as rd

    from .functions.mixing import curate_corpus
    from .functions.relational import hash_join

    shards = sorted(glob.glob(args.docs))
    if not shards:
        print(f"no shards match {args.docs}", file=sys.stderr)
        return 2
    import os

    if os.path.isdir(args.out) and os.listdir(args.out):
        # write_parquet ADDS files: rerunning into a populated dir would
        # mix two corpora and double doc_ids
        print(f"--out {args.out} already exists and is not empty",
              file=sys.stderr)
        return 2
    docs = rd.read_parquet(shards)
    n_in = docs.count()                   # Parquet metadata, no scan
    keep = curate_corpus(docs, stratum_col=args.stratum,
                         est_rows=n_in)
    ids = keep.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    survivors = hash_join(docs, ids, on="doc_id", how="semi",
                          est_rows=n_in)
    if args.pii:
        from .functions.textstats import pii_scrub_batch

        cols = [c for c in docs.schema().names
                if c not in ("doc_id", "text")]

        def scrub(batch):
            import pyarrow as pa

            s = pii_scrub_batch(batch)
            keep_cols = {c: batch.column(c) for c in cols}
            return pa.table({"doc_id": s.column("doc_id"),
                             "text": s.column("text"), **keep_cols})

        survivors = survivors.map_batches(scrub, batch_format="pyarrow")
    survivors.write_parquet(args.out)
    n_out = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "docs_in": n_in,
                      "docs_out": n_out}))
    return 0


def cmd_dedup_ingest(args) -> int:
    """Ingest-time dedup: keep the NEW shard's documents whose content
    key is absent from the stored REFERENCE corpus
    (``dedup.incremental_dedup`` — Bloom prefilter + exact anti-join
    verify), then write survivors as Parquet.  The steady-state shape
    of corpus growth: the reference is only ever reduced to (id, key)
    hashes; new content is mostly Bloom misses that never shuffle."""
    _ensure_ray()
    import os

    import ray.data as rd

    from .functions.dedup import incremental_dedup
    from .functions.relational import hash_join

    new_shards = sorted(glob.glob(args.new))
    ref_shards = sorted(glob.glob(args.ref))
    if not new_shards or not ref_shards:
        print(f"no shards match --new {args.new} / --ref {args.ref}",
              file=sys.stderr)
        return 2
    if os.path.isdir(args.out) and os.listdir(args.out):
        print(f"--out {args.out} already exists and is not empty",
              file=sys.stderr)
        return 2
    new = rd.read_parquet(new_shards)
    ref = rd.read_parquet(ref_shards, columns=["doc_id", "text"])
    n_new = new.count()                  # Parquet metadata, no scan
    kept = incremental_dedup(new, ref, prefix=args.prefix,
                             est_rows=n_new)
    survivors = hash_join(new, kept, on="doc_id", how="semi",
                          est_rows=n_new)
    survivors.write_parquet(args.out)
    n_out = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "docs_in": n_new,
                      "docs_out": n_out}))
    return 0


def cmd_profile(args) -> int:
    """Table audit: per-column stats (``profiling.profile_table``) and,
    with ``--hot-keys``, the top-k heaviest keys per named column
    (``profiling.hot_keys``) — the pre-flight run before picking
    partition/shuffle keys on a new corpus.  Prints one JSON line per
    profiled column, then one per hot key."""
    _ensure_ray()
    import ray.data as rd

    from .functions.profiling import hot_keys, infer_spec, profile_table

    shards = sorted(glob.glob(args.table))
    if not shards:
        print(f"no shards match --table {args.table}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(shards)
    spec = infer_spec(ds.schema().base_schema)
    if not spec:
        print("no scalar columns to profile", file=sys.stderr)
        return 2
    prof = profile_table(ds, spec).to_pylist()
    for row in prof:
        print(json.dumps({"kind": "column", **row}))
    if args.hot_keys:
        total = prof[0]["n_rows"] if prof else 0
        cols = [c.strip() for c in args.hot_keys.split(",") if c.strip()]
        for row in hot_keys(ds, cols, total_rows=max(total, 1),
                            k=args.k).to_pylist():
            print(json.dumps({"kind": "hot_key", **row}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="stanford_re_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="distant-supervision LR training")
    t.add_argument("--pages", required=True,
                   help="pages Parquet path or glob")
    t.add_argument("--kb", required=True, help="KB triples TSV")
    t.add_argument("--out", required=True, help="model weight Parquet out")
    t.add_argument("--clusters", default=None, help="word-cluster TSV")
    t.add_argument("--epochs", type=int, default=150)
    t.add_argument("--negative-subsample", type=float, default=0.10)
    t.set_defaults(fn=cmd_train)

    k = sub.add_parser("kg", help="checkpointed pages → triples/nodes/edges")
    k.add_argument("--pages", required=True, help="pages shard glob")
    k.add_argument("--model", required=True, help="model weight Parquet")
    k.add_argument("--out", required=True, help="output root directory")
    k.add_argument("--clusters", default=None, help="word-cluster TSV")
    k.add_argument("--format", choices=["parquet", "warc", "jsonl"],
                   default="parquet",
                   help="shard format (warc implies no language filter)")
    k.add_argument("--lang", default="en",
                   help='language filter; "" keeps all pages')
    k.set_defaults(fn=cmd_kg)

    c = sub.add_parser(
        "curate",
        help="quality/dedup/decontaminate corpus curation → Parquet")
    c.add_argument("--docs", required=True,
                   help="documents Parquet path or glob "
                        "(doc_id, text, <stratum> columns)")
    c.add_argument("--out", required=True, help="output directory")
    c.add_argument("--stratum", default="lang",
                   help="stratum column for the balancing sample")
    c.add_argument("--pii", action="store_true",
                   help="scrub emails/IPs/phone-like runs from "
                        "surviving text")
    c.set_defaults(fn=cmd_curate)

    d = sub.add_parser(
        "dedup-ingest",
        help="keep new-shard docs absent from a reference corpus "
             "(Bloom prefilter + exact anti-join verify)")
    d.add_argument("--new", required=True,
                   help="glob of new-shard parquet (doc_id, text, ...)")
    d.add_argument("--ref", required=True,
                   help="glob of reference-corpus parquet")
    d.add_argument("--out", required=True, help="output directory")
    d.add_argument("--prefix", type=int, default=None,
                   help="fingerprint on the first N chars (default: "
                        "whole text)")
    d.set_defaults(fn=cmd_dedup_ingest)

    pr = sub.add_parser(
        "profile",
        help="per-column stats + optional hot-key audit of a Parquet "
             "table (JSON lines)")
    pr.add_argument("--table", required=True,
                    help="parquet path or glob to profile")
    pr.add_argument("--hot-keys", default=None,
                    help="comma-separated columns for the top-k "
                         "hot-key audit")
    pr.add_argument("-k", type=int, default=10,
                    help="hot keys per column (default 10)")
    pr.set_defaults(fn=cmd_profile)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
