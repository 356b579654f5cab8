"""WARC → pages: read Common-Crawl-style web archives into the pipeline's
input schema (url, warc_ts, html, text, lang).

The actual at-scale input format: Common Crawl ships `*.warc.gz` shards
(WARC/1.0 records, each gzip member one record).  The Ray-Data-first
shape: ``read_warc`` lists the shard paths and builds a Dataset with ONE
ROW PER SHARD PATH, then a flat ``map_batches`` parses each shard into
its page rows — shards parse in parallel across the cluster, records
stream out as Arrow rows, and no WARC bytes ever pass through the driver.

Parsing is dependency-free: WARC header block + HTTP response envelope
are split manually; gzip members decode via a streaming zlib loop
(Common Crawl concatenates one gzip member per record — plain
``gzip.decompress`` handles that too, but the loop bounds peak memory to
one record).  Only ``response`` records with an HTTP payload become
pages; ``warcinfo``/``request``/``metadata`` records are skipped.
"""

from __future__ import annotations

import io
import zlib
from datetime import datetime, timezone

import pyarrow as pa

import ray.data

#: pages schema the rest of the engine consumes (BASELINE.json input_hint)
PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _gzip_members(raw: bytes):
    """Yield decompressed gzip members from concatenated-member data
    (the Common Crawl layout: one member per WARC record).  Plain data
    (no gzip magic) yields itself once."""
    if not raw.startswith(b"\x1f\x8b"):
        yield raw
        return
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        yield d.decompress(raw[pos:])
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _split_records(data: bytes):
    """Split one decompressed WARC stream into records on the
    ``WARC/1.0`` version line (a member may hold several records)."""
    start = 0
    while True:
        nxt = data.find(b"WARC/1.", start + 1)
        if data[start:start + 6] == b"WARC/1":
            yield data[start:nxt if nxt != -1 else len(data)]
        if nxt == -1:
            return
        start = nxt


def _parse_warc_ts(value: str) -> int:
    """WARC-Date (ISO 8601, UTC) → epoch microseconds; malformed → 0."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return 0


def parse_warc_shard(raw: bytes) -> pa.Table:
    """One WARC(.gz) shard's bytes → pages rows (response records only)."""
    urls, tss, htmls = [], [], []
    for member in _gzip_members(raw):
        for rec in _split_records(member):
            head_end = rec.find(b"\r\n\r\n")
            if head_end == -1:
                continue
            headers = {}
            for line in rec[:head_end].decode("latin-1").split("\r\n")[1:]:
                if ":" in line:
                    k, v = line.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri", "")
            if not url:
                continue
            try:
                length = int(headers.get("content-length", "0"))
            except ValueError:
                length = 0
            body = rec[head_end + 4:head_end + 4 + length] if length \
                else rec[head_end + 4:]
            # strip the HTTP response envelope when present
            if body[:5] in (b"HTTP/",):
                http_end = body.find(b"\r\n\r\n")
                if http_end != -1:
                    body = body[http_end + 4:]
            urls.append(url)
            tss.append(_parse_warc_ts(headers.get("warc-date", "")))
            htmls.append(body.rstrip(b"\r\n"))
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array([""] * n, pa.string()),
        "lang": pa.array([""] * n, pa.string()),
    }, schema=PAGES_SCHEMA)


def read_warc(paths: list[str] | str,
              shards_per_task: int = 1) -> ray.data.Dataset:
    """WARC shard paths → pages Dataset.

    A row per path fans out through ``map_batches``; each task reads and
    parses its shard(s) locally — the standard read-parallelism shape for
    a format Ray Data has no datasource for.  At Common-Crawl scale one
    shard is ~1 GB compressed: ``shards_per_task=1`` keeps a task's peak
    memory at one decompressed record batch."""
    if isinstance(paths, str):
        paths = [paths]
    shard_ds = ray.data.from_items(
        [{"path": p} for p in sorted(paths)]
    ).repartition(max(1, len(paths) // shards_per_task))

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                tables.append(parse_warc_shard(f.read()))
        return (pa.concat_tables(tables) if tables
                else PAGES_SCHEMA.empty_table())

    return shard_ds.map_batches(parse, batch_format="pyarrow")


def annotate_lang(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Fill the ``lang`` column on EXTRACTED docs via the stopword
    language identifier — WARC records carry no language metadata, so the
    flow for an unknown-language crawl is::

        docs = extract_stage(read_warc(paths), lang="")   # keep all
        docs = annotate_lang(docs)                        # lang-id on text
        docs = docs.map_batches(lambda t: filter_lang(t, "en"), ...)
    """
    from ..functions.textstats import LangId

    lid = LangId()

    def fill(batch: pa.Table) -> pa.Table:
        langs = [lid.predict(t or "")
                 for t in batch.column("text").to_pylist()]
        i = batch.column_names.index("lang")
        return batch.set_column(i, "lang", pa.array(langs, pa.string()))

    return docs.map_batches(fill, batch_format="pyarrow")


def read_pages_jsonl(paths: list[str] | str) -> ray.data.Dataset:
    """JSONL web-corpus shards (url/html/text/lang keys, Dolma/CC-derived
    layouts) → the pages schema; missing columns null-fill, ``warc_ts``
    accepts epoch seconds or ISO strings."""
    ds = ray.data.read_json(paths)

    def conform(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        cols = {}
        names = set(batch.column_names)
        cols["url"] = (batch.column("url").cast(pa.string())
                       if "url" in names else pa.nulls(n, pa.string()))
        if "warc_ts" in names:
            c = batch.column("warc_ts")
            if pa.types.is_timestamp(c.type):
                ts = c.cast(pa.timestamp("us"))
            elif pa.types.is_integer(c.type) or pa.types.is_floating(c.type):
                ts = pc.multiply(c.cast(pa.int64()),
                                 1_000_000).cast(pa.timestamp("us"))
            else:
                ts = pa.array(
                    [_parse_warc_ts(v or "") for v in c.to_pylist()],
                    pa.timestamp("us"))
        else:
            ts = pa.nulls(n, pa.timestamp("us"))
        cols["warc_ts"] = ts
        if "html" in names:
            h = batch.column("html")
            cols["html"] = (h.cast(pa.binary()) if pa.types.is_binary(h.type)
                            else pa.array([(v or "").encode()
                                           for v in h.to_pylist()],
                                          pa.binary()))
        else:
            cols["html"] = pa.nulls(n, pa.binary())
        cols["text"] = (batch.column("text").cast(pa.string())
                        if "text" in names else pa.array([""] * n))
        cols["lang"] = (batch.column("lang").cast(pa.string())
                        if "lang" in names else pa.array([""] * n))
        return pa.table(cols, schema=PAGES_SCHEMA)

    return ds.map_batches(conform, batch_format="pyarrow")
